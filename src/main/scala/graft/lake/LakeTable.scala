package graft.lake

import java.util
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering, V1Scan}
import org.apache.spark.sql.connector.read.partitioning.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.classic.ClassicConversions._
import Meta._

/** DSv2 `Table` for a lake table pinned at a snapshot (SURVEY.md §7.1).
  *
  * Read path: `ScanBuilder` receives pushed filters + required columns,
  * prunes the FILE LIST driver-side (snapshot interval + hidden-partition
  * values + per-file min/max stats — reference A2), then hands Spark a
  * `V1Scan` whose relation materializes the merge-on-read DataFrame
  * composition from [[LakeRead]]. Filters are also reported back as
  * residuals, so Catalyst re-applies them on rows AND pushes them into the
  * underlying parquet scan — files we can't prove prunable still get
  * row-group-level skipping for free.
  *
  * Write path: `V1Write`/`InsertableRelation` routes into
  * [[LakeWrite.append]] — Spark's own distributed parquet writer does the
  * data movement; the commit is our optimistic snapshot protocol.
  *
  * `SupportsDelete.deleteWhere` implements ROW-level deletes (positional
  * delete files), not just file drops — reference A3/dml semantics.
  */
class LakeTable(
    val store: MetadataStore,
    val schemaName: String,
    val tableName: String,
    val snapshot: Long,
    private[lake] val st: CatalogState,
    /** extra FILE-PRUNE-ONLY predicates on synthetic stat names (variant
      * paths like "v.$.price", attached by [[LakeVariantPruning]]); never
      * pushed to parquet or applied to rows — Spark's own Filter above the
      * scan keeps row-level semantics */
    val variantPrune: Seq[Filter] = Nil) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsMetadataColumns {

  /** copy with variant file-prune predicates (LakeVariantPruning) */
  private[lake] def withVariantPrune(fs: Seq[Filter]): LakeTable =
    new LakeTable(store, schemaName, tableName, snapshot, st, fs)

  /** the upstream-DuckLake `rowid` virtual column as a DSv2 metadata
    * column: `SELECT _row_id, * FROM lake.main.t` surfaces stable row
    * lineage (implicit ids = file.firstRowId + position; survivors keep
    * their id across UPDATE rewrites). Referencing it routes the scan to
    * the composed tier, which already materializes row identity. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = LakeTable.RowIdMetaCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "stable lake row id (row lineage)"
    })

  val entry: TableEntry = st.tableAt(schemaName, tableName, snapshot)
    .getOrElse(throw new NoSuchElementException(s"no table $schemaName.$tableName@$snapshot"))
  private val cols = st.columnsAt(entry.tableId, snapshot)

  override def name(): String = s"$schemaName.$tableName"

  override def schema(): StructType = {
    // column comments (scope col:<tid>:<colId>, freeze: ducklake_column_tag)
    // ride the StructField metadata so DESCRIBE surfaces them
    val base = LakeRead.structFor(cols)
    StructType(base.fields.zip(cols).map { case (f, c) =>
      st.tagAt(s"col:${entry.tableId}:${c.columnId}", "comment", snapshot)
        .map(f.withComment).getOrElse(f)
    })
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def partitioning(): Array[Transform] =
    st.partitionKeysAt(entry.tableId, snapshot).map { pk =>
      pk.transform match {
        case "identity" => Expressions.identity(pk.column)
        case "year" => Expressions.years(pk.column)
        case "month" => Expressions.months(pk.column)
        case "day" => Expressions.days(pk.column)
        case "hour" => Expressions.hours(pk.column)
        case BucketTransform(n) => Expressions.bucket(n, pk.column)
        case other => Expressions.apply(other, Expressions.column(pk.column))
      }
    }.toArray

  override def properties(): util.Map[String, String] = {
    val tags = st.tags.filter(t => t.scope == entry.tableId.toString &&
      liveAt(t.begin, t.end, snapshot)).map(t => t.key -> t.value).toMap
    (tags + ("provider" -> "graft-lake")).asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(this)

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => Pruning.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(Pruning.filterToColumn)
      .reduceOption(_ && _).getOrElse(org.apache.spark.sql.functions.lit(true))
    LakeWrite.delete(SparkSession.active, store, schemaName, tableName, cond)
  }

  /** fresh snapshot-scoped DataFrame (used by the scan and by LakeOps);
    * variantPrune joins the pushed filters for FILE pruning only (scanDF
    * uses filters solely to prune the file list) */
  def scanDF(spark: SparkSession, filters: Seq[Filter] = Nil,
      withRowMeta: Boolean = false): DataFrame =
    LakeRead.scanDF(spark, store.state(), entry.tableId, snapshot,
      filters ++ variantPrune, withRowMeta = withRowMeta)

  /** Physical footprint from metadata (exact for parquet, estimated for
    * inline JSON rows). Reported as the V1 relation's `sizeInBytes` so the
    * join planner can auto-broadcast a small lake table — without it a V1
    * relation defaults to `defaultSizeInBytes` (effectively infinite) and a
    * lake dim table would never be the broadcast side. The native tiers
    * already report this through `MetadataFileIndex.sizeInBytes`. */
  private[lake] def estimatedSizeInBytes: Long = {
    val tid = entry.tableId
    st.filesAt(tid, snapshot).map(_.fileSizeBytes).sum +
      st.inlinedAt(tid, snapshot).map(_.rowsJson.map(_.length.toLong).sum).sum
  }

  /** Columns on which runtime (DPP) filters can prune files: hidden
    * partition source columns (pruned via recorded per-file values) and
    * plain-column sort keys (a sorted table's per-file min/max ranges are
    * tight, so zone-map pruning of a runtime IN is selective). Other
    * columns also carry stats, but with no layout clustering a runtime
    * filter would rarely eliminate a file — not worth the subquery. */
  private[lake] def runtimeFilterColumns: Array[String] = {
    val names = cols.map(_.name).toSet
    (st.partitionKeysAt(entry.tableId, snapshot).map(_.column) ++
      st.sortKeysAt(entry.tableId, snapshot).map(_.expr).filter(names))
      .distinct.toArray
  }

  /** type widenings Spark's parquet reader performs natively (probed on
    * 4.1: int32 physical reads as int/long/double, float as double), so an
    * ALTER TYPE widening keeps old epochs on the native tier */
  private def widensTo(from: String, to: String): Boolean =
    (from.toLowerCase, to.toLowerCase) match {
      case ("tinyint", "smallint" | "int" | "bigint") => true
      case ("smallint", "int" | "bigint") => true
      case ("int", "bigint" | "double") => true
      case ("float", "double") => true
      case _ => false
    }

  /** storage-partitioned-join value of one stored partition string, typed
    * for an InternalRow; None = type/value not SPJ-safe → don't report */
  private def spjValue(raw: String, dt: DataType): Option[Any] = {
    if (raw.contains("HIVE_DEFAULT_PARTITION") || raw.contains("%")) return None
    try dt match {
      case IntegerType => Some(raw.toInt)
      case LongType => Some(raw.toLong)
      case ShortType => Some(raw.toShort)
      case ByteType => Some(raw.toByte)
      case BooleanType => Some(raw.toBoolean)
      case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(raw))
      case DateType => Some(java.time.LocalDate.parse(raw).toEpochDay.toInt)
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Sort keys the key-grouped scan may REPORT as its per-partition output
    * ordering (DSv2 SupportsReportOrdering → SMJ sort elision), plus the
    * groups with each group's files REORDERED so the report is physically
    * true: the longest prefix of the table's sort spec whose columns all
    * survive into the scan output (V2ExpressionUtils.resolveRef throws on
    * a miss — same lesson as filterAttributes), provided EVERY scanned
    * file is stamped internally sorted by at least that prefix (full key:
    * expr + direction + null order — files sorted under a superseded
    * setSort spec must not satisfy a flipped one) and every key group is
    * either a SINGLE file or a set of files whose ranges on the LEADING
    * sort key are pairwise DISJOINT (per-file min/max stats, already in
    * the catalog). A fused partition concatenates its files in array
    * order, so emitting a disjoint group range-ordered makes the
    * concatenation ordered — eligibility survives chunked appends and
    * bounded file sizes at 100 TB instead of demanding one unbounded file
    * per bucket, and it composes with the per-file skew split (each split
    * partition is one stamped sorted file, ordered by construction).
    *
    * Boundary ties (max(fileᵢ) == min(fileᵢ₊₁) on the leading key) keep a
    * single-key report valid but break deeper keys (rows tied on k1 that
    * straddle files need not be ordered by k2) → the report truncates to
    * the leading key. NULLs in the leading key (r14, VERDICT r13 #7): at
    * most ONE file of a multi-file group may bear NULLs — its null run is
    * contiguous at that file's own null end (the file is internally sorted
    * under the same stamp), so placing that file at the concatenation's
    * null-order end keeps the report physically true. A mixed file must
    * also land at that end of the range order; an all-NULL file (min/max
    * absent, nullCount > 0) is pinned there outside the range chain. Two
    * null-bearing files forfeit the report (both runs can't sit at the
    * end). NULL ties never straddle files (one bearer), so no extra
    * truncation beyond the boundary-tie rule. */
  private[lake] def reportableOrdering(
      files: Vector[DataFileEntry],
      groups: Seq[(InternalRow, Seq[(String, Long)])],
      read: StructType)
      : (Array[Meta.SortKey], Seq[(InternalRow, Seq[(String, Long)])]) = {
    val sks = st.sortKeysAt(entry.tableId, snapshot)
    if (sks.isEmpty || files.isEmpty) return (Array.empty, groups)
    // safety valve / A-B gate
    if (!SparkSession.active.conf
        .getOption("spark.graft.lake.reportOrdering").forall(_.toBoolean))
      return (Array.empty, groups)
    val avail = read.fieldNames.toSet
    val prefix = sks.takeWhile(k => avail(k.expr) && cols.exists(_.name == k.expr))
    if (prefix.isEmpty) return (Array.empty, groups)
    val labels = prefix.map(Meta.SortKey.stamp)
    if (!files.forall(_.sortedBy.exists(_.startsWith(labels))))
      return (Array.empty, groups)
    if (groups.forall(_._2.lengthCompare(1) <= 0))
      return (prefix.toArray, groups)

    val k1 = prefix.head
    val dt = cols.find(_.name == k1.expr).map(_.dataType)
      .getOrElse(return (Array.empty, groups))
    val byPath = files.map(f => f.path -> f).toMap
    // stats names normalized to the scan snapshot (renames; see nativePlan)
    val statsAt = st.statsForAt(entry.tableId, snapshot, files)
    def statsOf(path: String): Option[Meta.FileColumnStats] =
      byPath.get(path).flatMap(f =>
        statsAt(f.fileId).find(_.columnName == k1.expr))
    def cmp(a: String, b: String): Option[Int] = Pruning.cmpTyped(dt, a, b)

    var tied = false // a boundary tie truncates the report to the leading key
    val ordered = groups.map { case (key, fs) =>
      if (fs.lengthCompare(1) <= 0) Some((key, fs))
      else {
        val stats = fs.map(f => statsOf(f._1).map(s => (f, s)))
        if (stats.exists(_.isEmpty)) None
        else {
          val known = stats.flatten
          val nullBearing = known.filter(_._2.nullCount > 0)
          // all-NULL file: stats exclude NULLs so min/max are absent —
          // pinned to the null end, exempt from the range chain below
          val allNull = nullBearing.filter(p =>
            p._2.minValue.isEmpty || p._2.maxValue.isEmpty)
          if (nullBearing.lengthCompare(1) > 0) None
          else {
            val ranged = known.filterNot(p => allNull.exists(_._1 == p._1))
              .map(p => for {
                mn <- p._2.minValue; mx <- p._2.maxValue
                _ <- cmp(mn, mn) // leading-key type must be comparable
              } yield (p._1, (mn, mx)))
            if (ranged.exists(_.isEmpty)) None
            else {
              val rs = ranged.flatten
              // range order follows the sort DIRECTION: ascending
              // concatenates low→high by min; descending high→low by max
              val sorted =
                if (k1.ascending) rs.sortWith((a, b) => cmp(a._2._1, b._2._1).get < 0)
                else rs.sortWith((a, b) => cmp(a._2._2, b._2._2).get > 0)
              val disjoint = sorted.sliding(2).forall {
                case Seq(a, b) =>
                  val c = if (k1.ascending) cmp(a._2._2, b._2._1).get
                          else -cmp(a._2._1, b._2._2).get
                  if (c == 0) tied = true
                  c <= 0
                case _ => true
              }
              // a MIXED null-bearing file must itself sit at the null end
              // of the range order (its null run is at its own null end)
              val mixedOk = nullBearing.headOption.forall { nb =>
                allNull.nonEmpty || {
                  val idx = sorted.indexWhere(_._1 == nb._1)
                  if (k1.nullsFirst) idx == 0 else idx == sorted.size - 1
                }
              }
              if (!disjoint || !mixedOk) None
              else {
                val chain = sorted.map(_._1)
                val out =
                  if (allNull.isEmpty) chain
                  else if (k1.nullsFirst) allNull.head._1 +: chain
                  else chain :+ allNull.head._1
                Some((key, out))
              }
            }
          }
        }
      }
    }
    if (ordered.exists(_.isEmpty)) (Array.empty, groups)
    else {
      val out = if (tied) prefix.take(1) else prefix
      (out.toArray, ordered.map(_.get))
    }
  }

  /** Storage-partitioned-join grouping: Some((keyColumns, partitionKey →
    * files)) when the table's live partition spec is identity-only over
    * SPJ-safe column types and EVERY given file carries a parseable
    * recorded value for every key (files written before set_partition
    * have none → the whole scan stays ungrouped; hidden partitioning is
    * retroactive-safe, partition.sql:43-57). Groups are sorted by key for
    * deterministic partition order. */
  private[lake] def keyGroups(files: Vector[DataFileEntry])
      : Option[(Array[Meta.PartitionKey], Seq[(InternalRow, Seq[(String, Long)])])] = {
    val pks = st.partitionKeysAt(entry.tableId, snapshot)
    // SPJ-groupable transforms: identity, and bucket[N] (key value = the
    // bucket ordinal — two co-bucketed tables report the same
    // bucket(n, col) transform and join with no exchange, the shape
    // identity keys cannot give on high-cardinality columns)
    def groupable(pk: PartitionKey): Boolean =
      pk.transform == "identity" || BucketTransform.unapply(pk.transform).isDefined
    if (files.isEmpty || pks.isEmpty || !pks.forall(groupable))
      return None
    val keyTypes: List[DataType] = pks.map {
      case pk if pk.transform == "identity" =>
        cols.find(_.name == pk.column)
          .map(c => LakeRead.sparkType(c.dataType)).getOrElse(return None)
      case _ => IntegerType // bucket ordinal
    }
    val parsed: Vector[(Vector[Any], (String, Long))] = files.map { f =>
      val vs = pks.zip(keyTypes).map { case (pk, dt) =>
        f.partitionValues.get(pk.label).flatMap(spjValue(_, dt))
          .getOrElse(return None)
      }
      (vs.toVector, (f.path, f.fileSizeBytes))
    }
    // element-wise tuple ordering: a joined-string sort needs a separator
    // that can't appear in a value (a space can, for string keys) or two
    // distinct composite keys could collide and make the partition order
    // nondeterministic across co-bucketed tables — worst case Spark sees
    // misaligned partition values and silently shuffles instead of SPJ
    val grouped = parsed.groupBy(_._1).toSeq
      .sortBy(_._1.map(String.valueOf(_)))(
        scala.math.Ordering.Implicits.seqOrdering[Vector, String])
      .map { case (key, fs) =>
        (new GenericInternalRow(key.toArray): InternalRow, fs.map(_._2): Seq[(String, Long)])
      }
    Some((pks.toArray, grouped))
  }

  /** live row count from metadata (upper bound: delete files subtracted,
    * but un-pruned filters aren't modeled) */
  private[lake] def estimatedRowCount: Long = {
    val tid = entry.tableId
    (st.filesAt(tid, snapshot).map(_.rowCount).sum +
      st.inlinedAt(tid, snapshot).map(_.rowsJson.length.toLong).sum -
      st.deleteFilesAt(tid, snapshot).map(_.deleteCount).sum).max(0L)
  }

  /** Native-scan eligibility: no inlined batches, and every live file's
    * schema epoch is readable by Spark's BY-NAME parquet reader under the
    * scan snapshot's schema, resolving by COLUMN ID across renames:
    *   - every current column maps to an epoch column by columnId with an
    *     equal or natively-widening type — under its epoch name when it
    *     was renamed since (the scan reads that epoch's files with the
    *     translated name; rows are positional, so downstream is
    *     name-blind), or
    *   - it is genuinely NEW (columnId unseen in the epoch), nullable
    *     with no existence default (null-fills natively; a DEFAULT needs
    *     the composed plan's fill), and its name shadows no epoch column
    *     (a dropped-and-readded name must not leak predecessor data).
    * DROPPED epoch columns are simply ignored by the reader.
    * Non-widening type changes keep the old epoch ineligible (the reader
    * doesn't cast). Then the scan runs on Spark's own DSv2 parquet path:
    * columnar when the snapshot also has no delete files, or the
    * delete-aware row path (executor-local position skipping — the delete
    * set never travels) when it does. Inline rows or incompatible epochs
    * keep the composed V1 plan.
    * Returns the stats/partition-pruned live files (layout metadata
    * normalized to current names), per-file delete parts, and the
    * per-epoch current→old read renames (schemaVersion → map; identity
    * epochs omitted). */
  private[lake] def nativePlan(filters: Seq[Filter])
      : Option[(Vector[DataFileEntry], Map[String, Seq[String]], Map[Long, Map[String, String]])] = {
    val tid = entry.tableId
    if (st.inlinedAt(tid, snapshot).nonEmpty) return None
    val sig = cols.map(c => (c.columnId, c.name, c.dataType))
    // Per-epoch eligibility BY COLUMN ID (VERDICT r14 #2): matching by
    // name alone made a renamed nullable column look like drop+add, and
    // the by-name reader silently null-filled its old files. Each current
    // column must resolve in the epoch by columnId (name may differ →
    // recorded as a current→old READ rename the native readers apply
    // per epoch; type must be equal or natively widening), or be
    // genuinely NEW (columnId unseen) and nullable with no existence
    // default — and its name must not collide with any epoch column
    // (a dropped-and-readded name would leak predecessor data by-name).
    // Epoch columns absent from the current set were dropped; the by-name
    // reader ignores them, and they cannot shadow a translated read name
    // (translated names are the epoch's own, unique within it).
    def epochRename(sv: Long): Option[Map[String, String]] = {
      val old = st.columnsAt(tid, sv)
      if (old.map(c => (c.columnId, c.name, c.dataType)) == sig)
        return Some(Map.empty)
      val oldById = old.map(c => c.columnId -> c).toMap
      val oldNames = old.map(_.name).toSet
      var renames = Map.empty[String, String]
      cols.foreach { c =>
        oldById.get(c.columnId) match {
          case Some(o) =>
            if (o.dataType != c.dataType && !widensTo(o.dataType, c.dataType))
              return None
            if (o.name != c.name) renames += (c.name -> o.name)
          case None =>
            if (c.existsDefault.nonEmpty || !c.nullable || oldNames.contains(c.name))
              return None
        }
      }
      Some(renames)
    }
    val files = st.filesAt(tid, snapshot)
    val epochs = scala.collection.mutable.Map.empty[Long, Map[String, String]]
    files.map(_.schemaVersion).distinct.foreach { sv =>
      epochRename(sv) match {
        case Some(m) => if (m.nonEmpty) epochs(sv) = m
        case None => return None
      }
    }
    // layout metadata normalized to the scan snapshot's names (pruning,
    // SPJ grouping and the ordering report all match on CURRENT names)
    val normed = files.map(st.fileNamesAt(tid, snapshot))
    val pruned = Pruning.prune(normed, st.statsForAt(tid, snapshot, normed),
      cols.map(c => c.name -> c.dataType).toMap,
      st.partitionKeysAt(tid, snapshot), filters ++ variantPrune)
    val epochMap = epochs.toMap
    val deletes = st.deleteFilesAt(tid, snapshot)
    if (deletes.isEmpty) return Some((pruned, Map.empty, epochMap))
    // per-file delete parts come straight from metadata (recorded at write
    // time, VERDICT r4 #5) — zero filesystem RPCs per scan. The listStatus
    // fallback only fires for entries written before `parts` existed
    // (e.g. a thawed external catalog).
    lazy val hc = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val nameById = files.map(f => f.fileId.toString -> f.fileName).toMap
    val byFile = scala.collection.mutable.Map.empty[String, Vector[String]]
    deletes.foreach { d =>
      val parts =
        if (d.parts.nonEmpty) d.parts
        else {
          val dir = new org.apache.hadoop.fs.Path(d.path)
          dir.getFileSystem(hc).listStatus(dir).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString).toList
        }
      if (parts.nonEmpty) d.countsByFile.keys.foreach { fid =>
        nameById.get(fid).foreach { fn =>
          byFile(fn) = byFile.getOrElse(fn, Vector.empty) ++ parts
        }
      }
    }
    Some((pruned, byFile.toMap, epochMap))
  }
}

object LakeTable {
  /** name of the row-lineage metadata column (upstream DuckLake `rowid`) */
  val RowIdMetaCol = "_row_id"
}

private[lake] class LakeScanBuilder(table: LakeTable) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: we prune files, Spark re-checks rows
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    val session = SparkSession.active
    // tier-independent SELECT gate: the native parquet tiers bypass
    // LakeRead.scanDF, so the DSv2 check lives at scan build (current
    // ACL, like the scanDF choke point — see LakeAcl)
    LakeAcl.requirePriv(session, table.st, "SELECT", table.schemaName,
      table.tableName, table.st.currentSnapshotId)
    LakeEncryption.ensureReadConfFor(session, table.st, table.entry.tableId,
      table.snapshot)
    // the _row_id metadata column only exists on the composed tier
    val wantsRowId = required.exists(_.fieldNames.contains(LakeTable.RowIdMetaCol))
    val native = !wantsRowId && session.conf
      .getOption("spark.graft.lake.nativeScan").forall(_.toBoolean)
    (if (native) table.nativePlan(pushed.toSeq) else None) match {
      case Some(initial) => new LakeNativeScan(session, table, pushed, required, initial)
      case None => new LakeScan(table, pushed, required)
    }
  }
}

/** Native-tier scan with runtime file pruning (dynamic partition pruning).
  *
  * Wraps the tier-1/2 parquet scans and implements
  * `SupportsRuntimeFiltering` over the HIDDEN partition source columns:
  * when the optimizer derives a DPP subquery from a join (fact joined to a
  * filtered dim on a partition column), the runtime `In` filter re-runs
  * the same metadata pruning the compile-time filters use — recorded
  * per-file partition values plus min/max stats — and the batch re-plans
  * over the surviving file list. Spark's own DPP only prunes hive-style
  * directory partitions, which lake tables deliberately don't have
  * (Iceberg-style hidden partitioning, SURVEY.md §2 A21); this restores
  * the same at-scale behavior: a 100 TB fact scan joined to `dim WHERE
  * region = 'ASIA'` reads only the matching partition files.
  *
  * Also re-exports metadata statistics (the wrapper would otherwise hide
  * the inner `FileScan`'s stats exactly like Spark's V1ScanWrapper does).
  */
private[graft] class LakeNativeScan(
    session: SparkSession,
    table: LakeTable,
    pushed: Array[Filter],
    required: Option[StructType],
    initial: (Vector[DataFileEntry], Map[String, Seq[String]], Map[Long, Map[String, String]]))
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics
  with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  private var files: Vector[DataFileEntry] = initial._1
  private var deletesByFile: Map[String, Seq[String]] = initial._2
  private var epochRenames: Map[Long, Map[String, String]] = initial._3
  private var inner: Scan = buildInner()

  /** rename-epoch read plan (see [[NativeParquet.EpochReads]]): intern the
    * distinct current→old maps, index each file by its schemaVersion's map;
    * the common rename-free table short-circuits to the trivial plan */
  private def epochReads: org.apache.spark.sql.graft.NativeParquet.EpochReads = {
    import org.apache.spark.sql.graft.NativeParquet.EpochReads
    if (epochRenames.isEmpty) EpochReads.none
    else {
      val distinct = epochRenames.values.toVector.distinct
      val idxOf = distinct.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap
      EpochReads((Map.empty[String, String] +: distinct).toIndexedSeq,
        files.iterator.flatMap(f =>
          epochRenames.get(f.schemaVersion).map(m => f.path -> idxOf(m))).toMap)
    }
  }

  private def buildInner(): Scan = {
    val sizes = files.map(f => (f.path, f.fileSizeBytes))
    val epochs = epochReads
    // storage-partitioned join eligibility: opt-in conf + identity keys
    // with recorded values on every file → key-grouped partitions, so a
    // co-partitioned lake-lake join plans with no shuffle at all — on the
    // columnar tier AND the delete-aware tier (a live overlay must not
    // re-introduce the join shuffle; vacuum is not an SPJ prerequisite)
    val spj = session.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      .exists(_.toBoolean)
    val grouped = if (spj) table.keyGroups(files) else None
    // per-TABLE skew-vs-ordering choice (catalog option, table > schema >
    // global): "ordering" keeps this table's key groups fused (sort
    // elision) even while the session conf opts other tables into the
    // per-file skew split — VERDICT r13 #2's mixed-workload rule
    val spjMode = table.st.optionAt(table.entry.tableId, "spj.mode",
      table.snapshot)
    if (deletesByFile.isEmpty) grouped match {
      case Some((keyCols, groups)) =>
        // ordering eligibility may also RANGE-REORDER files inside each
        // group (multi-file disjoint-range groups) — scan the ordered view
        val (ordering, orderedGroups) =
          table.reportableOrdering(files, groups, readSchema())
        org.apache.spark.sql.graft.NativeParquet.keyGroupedScan(
          session, orderedGroups, keyCols, table.schema(), readSchema(), pushed,
          ordering, spjMode, epochs)
      case None =>
        org.apache.spark.sql.graft.NativeParquet.parquetScan(
          session, sizes, table.schema(), readSchema(), pushed, epochs)
    }
    else {
      // the delete-aware tier keeps the ordering report too (r14, VERDICT
      // r13 stretch #9): position skipping preserves file order, so a
      // sorted bucket's SMJ stays sort-free while a merge-on-read overlay
      // is live — vacuum is a cost optimization, not a planning gate
      val (ordering, orderedKeyed) = grouped match {
        case Some((keyCols, groups)) =>
          val (o, og) = table.reportableOrdering(files, groups, readSchema())
          (o, Some((keyCols, og)))
        case None => (Array.empty[Meta.SortKey], None)
      }
      org.apache.spark.sql.graft.NativeParquet.deleteAwareScan(
        session, sizes, deletesByFile, table.schema(), readSchema(), pushed,
        keyed = orderedKeyed, spjMode = spjMode, ordering = ordering,
        epochs = epochs)
    }
  }

  override def outputPartitioning(): Partitioning = inner match {
    case s: SupportsReportPartitioning => s.outputPartitioning()
    case _ => new UnknownPartitioning(0)
  }

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    inner match {
      case o: org.apache.spark.sql.connector.read.SupportsReportOrdering =>
        o.outputOrdering()
      case _ => Array.empty
    }

  override def readSchema(): StructType = required.getOrElse(table.schema())

  override def toBatch: Batch = inner.toBatch

  override def description(): String =
    s"graft-lake native scan ${table.name()}@${table.snapshot} " +
      s"(${files.size} files, ${deletesByFile.count(_._2.nonEmpty)} with deletes)"

  override def filterAttributes(): Array[NamedReference] = {
    // only columns present in THIS scan's (pruned) output: Spark's
    // PartitionPruning resolves filterAttributes against the relation
    // output with V2ExpressionUtils.resolveRef, which THROWS on a miss —
    // declaring a partition/sort column the query projected away would
    // crash any join over the pruned scan (found by the q05b leg probe:
    // "Unable to resolve l_orderkey given [l_suppkey]")
    val avail = readSchema().fieldNames.toSet
    table.runtimeFilterColumns.filter(avail)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  }

  override def filter(runtime: Array[Filter]): Unit =
    // same conservative pruner as compile-time filters; eligibility is
    // snapshot-static, so nativePlan can only return Some here
    table.nativePlan(pushed.toSeq ++ runtime).foreach { case (fs, dbf, eps) =>
      files = fs
      deletesByFile = dbf
      epochRenames = eps
      inner = buildInner()
    }

  /** current file count after pruning (test observability) */
  private[graft] def currentFileCount: Int = files.size

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.fileSizeBytes).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.rowCount).sum)
  }
}

private[lake] class LakeScan(table: LakeTable, filters: Array[Filter],
    required: Option[StructType]) extends Scan with V1Scan
    with SupportsReportStatistics {

  override def readSchema(): StructType = required.getOrElse(table.schema())

  /** metadata footprint for [[LakeJoinHint]] (the V1ScanWrapper Spark puts
    * around this scan hides `estimateStatistics` from the planner) */
  private[lake] def sizeHint: Long = table.estimatedSizeInBytes

  // metadata-exact footprint (kept even though the current V1 fallback
  // wrapper doesn't consult it — LakeJoinHint covers join planning)
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(table.estimatedSizeInBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(table.estimatedRowCount)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = readSchema()
      override def sizeInBytes: Long = table.estimatedSizeInBytes
      // the composed plan already produces InternalRows in exactly
      // `readSchema()` order — hand them over as-is (needConversion=false
      // makes Spark treat the RDD[Row] as RDD[InternalRow]), skipping the
      // per-row external-Row round trip `.rdd` would pay on every read
      override def needConversion: Boolean = false
      override def buildScan(): RDD[org.apache.spark.sql.Row] = {
        val wantsRowId = readSchema().fieldNames.contains(LakeTable.RowIdMetaCol)
        var df = table.scanDF(context.sparkSession, filters.toSeq,
          withRowMeta = wantsRowId)
        if (wantsRowId) df = df
          .withColumn(LakeTable.RowIdMetaCol,
            org.apache.spark.sql.functions.col(LakeRead.RowIdCol))
          .drop(LakeRead.FileCol, LakeRead.PosCol, LakeRead.RowIdCol)
        // apply the translatable pushed filters INSIDE the composed plan so
        // Catalyst drives them into the underlying parquet scan (row-group
        // skipping) — Spark still re-applies all residuals above, so a
        // filter we can't translate only loses the pushdown, not rows
        filters.toSeq.flatMap(Pruning.filterToColumn)
          .reduceOption(_ && _).foreach(c => df = df.filter(c))
        val projected = readSchema().fieldNames match {
          case names if names.nonEmpty => df.select(names.map(org.apache.spark.sql.functions.col).toSeq: _*)
          case _ => df
        }
        projected.queryExecution.toRdd
          .asInstanceOf[RDD[org.apache.spark.sql.Row]]
      }
    }.asInstanceOf[T]

  override def description(): String =
    s"graft-lake ${table.name()}@${table.snapshot} filters=[${filters.mkString(", ")}]"
}

private[lake] class LakeWriteBuilder(table: LakeTable) extends WriteBuilder
    with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, ovr: Boolean): Unit =
        LakeWrite.append(data.sparkSession, table.store, table.schemaName,
          table.tableName, data, overwrite = overwrite || ovr)
    }
  }
}
