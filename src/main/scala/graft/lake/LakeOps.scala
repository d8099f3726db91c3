package graft.lake

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Meta._

/** Maintenance jobs + metadata TVFs + change data feed — the `ducklake.*`
  * function surface (SURVEY.md §2.A A12-A28; sql/pg_ducklake--0.1.0.sql).
  * Everything metadata-shaped returns a DataFrame so the surface composes
  * with Spark SQL exactly like the reference's TVFs compose with PG SQL.
  */
class Lake(val spark: SparkSession, val root: String) {
  val store = new MetadataStore(root)

  def schemaOf(table: String): (String, String) = table.split('.') match {
    case Array(s, t) => (s, t)
    case Array(t) => ("main", t)
    case _ => throw new IllegalArgumentException(s"bad table name: $table")
  }

  private def resolve(table: String, st: CatalogState): TableEntry = {
    val (sn, tn) = schemaOf(table)
    st.tableAt(sn, tn, st.currentSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"no table $table"))
  }

  // ---------------------------------------------------------------- DDL/DML

  def createTable(table: String, schema: StructType,
      partitionKeys: List[PartitionKey] = Nil,
      sortKeys: List[SortKey] = Nil,
      props: Map[String, String] = Map.empty): Long = {
    val (sn, tn) = schemaOf(table)
    store.commitWithRetry() { (st, sid) =>
      require(st.tableAt(sn, tn, st.currentSnapshotId).isEmpty, s"table $table exists")
      val tid = st.nextTableId
      CommitDelta(
        snapshot = Snapshot(sid, System.currentTimeMillis(), sid,
          List(s"created_table:$sn.$tn")),
        newTables = List(TableEntry(tid, sn, tn, sid, None)),
        newColumns = schema.fields.zipWithIndex.map { case (f, i) =>
          ColumnEntry(tid, i + 1, i, f.name,
            LakeRead.relaxNullability(f.dataType).sql, f.nullable, None, sid, None)
        }.toList,
        newPartitionInfo =
          if (partitionKeys.nonEmpty) List(PartitionInfoEntry(tid, partitionKeys, sid, None)) else Nil,
        newSortInfo =
          if (sortKeys.nonEmpty) List(SortInfoEntry(tid, sortKeys, sid, None)) else Nil,
        newTags = props.map { case (k, v) => TagEntry(tid.toString, k, v, sid, None) }.toList)
    }
  }

  def append(table: String, df: DataFrame, overwrite: Boolean = false): Long = {
    val (sn, tn) = schemaOf(table)
    LakeWrite.append(spark, store, sn, tn, df, overwrite = overwrite)
  }

  /** CTAS (reference src/pgducklake_table.cpp:679-699) */
  def createTableAs(table: String, df: DataFrame,
      partitionKeys: List[PartitionKey] = Nil): Long = {
    createTable(table, df.schema, partitionKeys)
    append(table, df)
  }

  def insertRows(table: String, rows: Seq[Seq[Any]]): Long = {
    val (sn, tn) = schemaOf(table)
    LakeWrite.insertRows(spark, store, sn, tn, rows)
  }

  def delete(table: String, cond: Column): (Long, Long) = {
    val (sn, tn) = schemaOf(table)
    LakeWrite.delete(spark, store, sn, tn, cond)
  }

  def update(table: String, cond: Column, set: Map[String, Column]): (Long, Long) = {
    val (sn, tn) = schemaOf(table)
    LakeWrite.update(spark, store, sn, tn, cond, set)
  }

  // ---------------------------------------------------------------- reads

  /** snapshot-scoped scan; version None = current (or session as-of conf) */
  def table(name: String, version: Option[Long] = None): DataFrame = {
    val st = store.state()
    val entry = resolve(name, st)
    val s = version
      .orElse(spark.conf.getOption("spark.graft.lake.asOfSnapshot").map(_.toLong))
      .orElse(spark.conf.getOption("spark.graft.lake.asOfTimestampMs")
        .flatMap(ms => st.snapshotAtTime(ms.toLong)))
      .getOrElse(st.currentSnapshotId)
    require(liveAt(entry.begin, entry.end, s) ||
      st.tableById(entry.tableId, s).isDefined, s"table $name not live at $s")
    LakeRead.scanDF(spark, st, entry.tableId, s)
  }

  /** scan surfacing the hidden meta columns (_graft_file, _graft_pos,
    * _graft_row_id) — lets callers observe physical row order (sorted
    * tables) and stable row identity. */
  def tableWithRowMeta(name: String): DataFrame = {
    val st = store.state()
    val e = resolve(name, st)
    LakeRead.scanDF(spark, st, e.tableId, st.currentSnapshotId, Nil, withRowMeta = true)
  }

  /** time travel by wall-clock ms (reference time_travel(tbl, ts)) */
  def tableAsOfTime(name: String, tsMs: Long): DataFrame = {
    val st = store.state()
    val s = st.snapshotAtTime(tsMs)
      .getOrElse(throw new NoSuchElementException(s"no snapshot at or before $tsMs"))
    table(name, Some(s))
  }

  // ------------------------------------------------------------- metadata TVFs

  /** snapshots() TVF (reference src/pgducklake_functions.cpp:93-103) */
  def snapshots(): DataFrame = {
    val st = store.state()
    val rows = st.snapshots.map(s =>
      Row(s.snapshotId, new java.sql.Timestamp(s.snapshotTimeMs), s.schemaVersion,
        s.changes.mkString(",")))
    spark.createDataFrame(rows.toList.asJava, StructType(Seq(
      StructField("snapshot_id", LongType), StructField("snapshot_time", TimestampType),
      StructField("schema_version", LongType), StructField("changes", StringType))))
  }

  def currentSnapshot(): Long = store.state().currentSnapshotId

  /** list_files TVF (reference sql/pg_ducklake--0.1.0.sql:312-323) */
  def listFiles(table: String): DataFrame = {
    val st = store.state()
    val e = resolve(table, st)
    val rows = st.filesAt(e.tableId, st.currentSnapshotId).map(f =>
      Row(f.fileId, f.fileName, f.rowCount, f.fileSizeBytes,
        mapAsString(f.partitionValues), f.begin))
    spark.createDataFrame(rows.toList.asJava, StructType(Seq(
      StructField("file_id", LongType), StructField("file_name", StringType),
      StructField("row_count", LongType), StructField("file_size", LongType),
      StructField("partition_values", StringType), StructField("begin_snapshot", LongType))))
  }

  private def mapAsString(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** table_info TVF */
  def tableInfo(): DataFrame = {
    val st = store.state()
    val cur = st.currentSnapshotId
    val rows = st.tables.filter(t => liveAt(t.begin, t.end, cur)).map { t =>
      val files = st.filesAt(t.tableId, cur)
      val inl = st.inlinedAt(t.tableId, cur)
      val dels = st.deleteFilesAt(t.tableId, cur)
      Row(t.tableId, t.schemaName, t.tableName, files.length.toLong,
        files.map(_.rowCount).sum + inl.map(_.rowsJson.length.toLong).sum,
        files.map(_.fileSizeBytes).sum, dels.length.toLong,
        inl.map(_.rowsJson.length.toLong).sum)
    }
    spark.createDataFrame(rows.toList.asJava, StructType(Seq(
      StructField("table_id", LongType), StructField("schema_name", StringType),
      StructField("table_name", StringType), StructField("file_count", LongType),
      StructField("row_count", LongType), StructField("file_size_bytes", LongType),
      StructField("delete_file_count", LongType), StructField("inlined_row_count", LongType))))
  }

  // ------------------------------------------------------------ change feed

  /** table_changes(tbl, s0, s1]: insert / delete / update_preimage /
    * update_postimage rows (reference sql/pg_ducklake--0.1.0.sql:344-449,
    * docs/sql_objects.md §table_changes, data_change_feed.sql). */
  def tableChanges(table: String, startExclusive: Long, endInclusive: Long): DataFrame = {
    val st = store.state()
    val e = resolve(table, st)
    val tid = e.tableId
    val cols = st.columnsAt(tid, endInclusive)
    val metaSchema = Seq(StructField("_change_type", StringType),
      StructField("_snapshot_id", LongType), StructField("_row_id", LongType))
    val outSchema = StructType(LakeRead.structFor(cols) ++ metaSchema)
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)

    val parts = st.snapshots
      .filter(s => s.snapshotId > startExclusive && s.snapshotId <= endInclusive)
      .flatMap { snap =>
        val sid = snap.snapshotId
        val delta = store.delta(sid)
        val tag = snap.changes.headOption.getOrElse("")
        val isLogicalWrite = tag.startsWith("inserted:") || tag.startsWith("inlined:") ||
          tag.startsWith("deleted:") || tag.startsWith("updated:")
        if (!isLogicalWrite) Nil
        else {
          val isUpdate = tag.startsWith("updated:")
          // inserted rows: new files / new inline batches of this snapshot
          val ins = insertedRows(st, delta, tid, sid,
            if (isUpdate) "update_postimage" else "insert")
          // deleted rows: new delete files + inline batch shrinkage
          val del = deletedRows(st, delta, tid, sid,
            if (isUpdate) "update_preimage" else "delete")
          ins.toSeq ++ del.toSeq
        }
      }
    parts.foldLeft(empty)(_ unionByName _)
  }

  def tableInsertions(table: String, s0: Long, s1: Long): DataFrame =
    tableChanges(table, s0, s1).filter(col("_change_type").isin("insert", "update_postimage"))

  def tableDeletions(table: String, s0: Long, s1: Long): DataFrame =
    tableChanges(table, s0, s1).filter(col("_change_type").isin("delete", "update_preimage"))

  /** scope a state view to an explicit file/batch set: intervals are opened
    * so the scan keeps them regardless of the snapshot used for schema */
  private def scopedState(st: CatalogState, files: Seq[DataFileEntry],
      batches: Seq[InlinedBatch]): CatalogState =
    st.copy(
      files = files.map(_.copy(begin = 0L, end = None)).toVector,
      deleteFiles = Vector.empty,
      inlined = batches.map(_.copy(begin = 0L, end = None)).toVector)

  private def tagChanges(df: DataFrame, changeType: String, sid: Long): DataFrame =
    df.withColumn("_change_type", lit(changeType))
      .withColumn("_snapshot_id", lit(sid))
      .withColumn("_row_id", col(LakeRead.RowIdCol))
      .drop(LakeRead.FileCol, LakeRead.PosCol, LakeRead.RowIdCol)

  /** old-row JSON by row id from the batches this snapshot replaced */
  private def priorInlineJson(st: CatalogState, delta: CommitDelta, tid: Long): Map[Long, String] =
    st.inlined.filter(b => b.tableId == tid && delta.endedInlined.contains(b.batchId))
      .flatMap(b => b.rowsJson.zip(b.ids).map { case (j, rid) => rid -> j }).toMap

  private def insertedRows(st: CatalogState, delta: CommitDelta, tid: Long,
      sid: Long, changeType: String): Option[DataFrame] = {
    val files = delta.newFiles.filter(_.tableId == tid)
    val fresh = delta.newInlined.filter(b => b.tableId == tid && b.rowIds.isEmpty)
    // rewritten batches contribute only rows whose content CHANGED (update
    // post-images); untouched survivors are not changes
    val oldJson = priorInlineJson(st, delta, tid)
    val changed = delta.newInlined.filter(b => b.tableId == tid && b.rowIds.isDefined)
      .map { b =>
        val kept = b.rowsJson.zip(b.ids)
          .filter { case (j, rid) => oldJson.get(rid).exists(_ != j) }
        b.copy(rowsJson = kept.map(_._1), rowIds = Some(kept.map(_._2)))
      }.filter(_.rowsJson.nonEmpty)
    if (files.isEmpty && fresh.isEmpty && changed.isEmpty) return None
    val scoped = scopedState(st, files, fresh ++ changed)
    Some(tagChanges(
      LakeRead.scanDF(spark, scoped, tid, sid, Nil, withRowMeta = true),
      changeType, sid))
  }

  private def deletedRows(st: CatalogState, delta: CommitDelta, tid: Long,
      sid: Long, changeType: String): Option[DataFrame] = {
    val delFiles = delta.newDeleteFiles.filter(_.tableId == tid)

    // parquet pre-images: the deleted (file,pos) rows read from exactly the
    // files the delete file targets (countsByFile keys = data file ids)
    val parquetPart: Option[DataFrame] = if (delFiles.isEmpty) None else {
      val targetIds = delFiles.flatMap(_.countsByFile.keys.map(_.toLong)).toSet
      val targets = st.files.filter(f => targetIds.contains(f.fileId))
      val pre = LakeRead.scanDF(spark, scopedState(st, targets, Nil), tid, sid,
        Nil, withRowMeta = true)
      val delStruct = StructType(Seq(StructField("file", StringType),
        StructField("pos", LongType), StructField("row_id", LongType)))
      val dd = spark.read.schema(delStruct).parquet(delFiles.map(_.path): _*)
        .select(col("file").as(LakeRead.FileCol), col("pos").as(LakeRead.PosCol))
      Some(pre.join(broadcast(dd), Seq(LakeRead.FileCol, LakeRead.PosCol), "left_semi"))
    }

    // inline pre-images: rows of replaced batches that vanished or changed
    val endedBatches = st.inlined.filter(b => b.tableId == tid &&
      delta.endedInlined.contains(b.batchId))
    val replacement: Map[Long, String] = delta.newInlined.filter(_.tableId == tid)
      .flatMap(b => b.rowsJson.zip(b.ids).map { case (j, rid) => rid -> j }).toMap
    val inlinePart: Option[DataFrame] = {
      val removed = endedBatches.map { b =>
        val gone = b.rowsJson.zip(b.ids)
          .filter { case (j, rid) => replacement.get(rid).forall(_ != j) }
        b.copy(rowsJson = gone.map(_._1), rowIds = Some(gone.map(_._2)))
      }.filter(_.rowsJson.nonEmpty)
      if (removed.isEmpty) None
      else Some(LakeRead.scanDF(spark, scopedState(st, Nil, removed), tid, sid,
        Nil, withRowMeta = true))
    }

    val both = parquetPart.toSeq ++ inlinePart.toSeq
    if (both.isEmpty) None
    else Some(tagChanges(both.reduce(_ unionByName _), changeType, sid))
  }

  // ------------------------------------------------------------ maintenance

  /** merge small files (VACUUM step 2, src/pgducklake_vacuum.cpp:73-86):
    * rewrites the table's live parquet rows (minus deletes) into coalesced
    * file(s) with explicit row ids; one snapshot swaps the file entries. */
  def mergeAdjacentFiles(table: String, targetFileCount: Int = 1): Long = {
    val (sn, tn) = schemaOf(table)
    val st = store.state()
    val e = resolve(table, st)
    val live = st.filesAt(e.tableId, st.currentSnapshotId)
    if (live.length <= targetFileCount) return st.currentSnapshotId
    val df = LakeRead.scanDF(spark, st.copy(inlined = Vector.empty), e.tableId,
      st.currentSnapshotId, Nil, withRowMeta = true)
      .drop(LakeRead.FileCol, LakeRead.PosCol)
      .coalesce(targetFileCount)
    LakeWrite.append(spark, store, sn, tn, df, explicitRowIds = true,
      changeTag = "compacted", sorted = true,
      extraEnded = stNow => (
        stNow.filesAt(e.tableId, stNow.currentSnapshotId).map(_.fileId).toList,
        stNow.deleteFilesAt(e.tableId, stNow.currentSnapshotId).map(_.deleteFileId).toList,
        Nil))
  }

  /** rewrite files whose deleted fraction ≥ threshold (VACUUM step 1,
    * src/pgducklake_vacuum.cpp:45-66; default threshold from GUC
    * ducklake.vacuum_delete_threshold = 0.1). */
  def rewriteDataFiles(table: String, threshold: Double = 0.1): Long = {
    val (sn, tn) = schemaOf(table)
    val st = store.state()
    val e = resolve(table, st)
    val cur = st.currentSnapshotId
    val tid = e.tableId
    val deleted: Map[Long, Long] = st.deleteFilesAt(tid, cur)
      .flatMap(_.countsByFile.toSeq.map { case (fid, c) => fid.toLong -> c })
      .groupBy(_._1).map { case (fid, cs) => fid -> cs.map(_._2).sum }
    val victims = st.filesAt(tid, cur).filter(f =>
      f.rowCount > 0 && deleted.getOrElse(f.fileId, 0L).toDouble / f.rowCount >= threshold)
    if (victims.isEmpty) return cur
    // rows of the victim files minus their deletes, row ids preserved
    val scoped = st.copy(files = victims, inlined = Vector.empty)
    val df = LakeRead.scanDF(spark, scoped, tid, cur, Nil, withRowMeta = true)
      .drop(LakeRead.FileCol, LakeRead.PosCol)
    val victimIds = victims.map(_.fileId).toSet
    LakeWrite.append(spark, store, sn, tn, df, explicitRowIds = true,
      changeTag = "rewrote", sorted = true,
      extraEnded = stNow => {
        val curN = stNow.currentSnapshotId
        val endDel = stNow.deleteFilesAt(tid, curN).filter(d =>
          d.countsByFile.keys.forall(k => victimIds.contains(k.toLong)))
        (victimIds.toList, endDel.map(_.deleteFileId).toList, Nil)
      })
  }

  /** full VACUUM = rewrite past threshold, then merge small files
    * (reference src/pgducklake_vacuum.cpp:24-101 + A28 VACUUM hook). */
  def vacuum(table: String, threshold: Double = 0.1): Long = {
    rewriteDataFiles(table, threshold)
    mergeAdjacentFiles(table)
  }

  /** flush_inlined_data (reference src/pgducklake_functions.cpp:213-266):
    * move inline-log rows into parquet, preserving row ids. */
  def flushInlinedData(table: String): Long = {
    val (sn, tn) = schemaOf(table)
    val st = store.state()
    val e = resolve(table, st)
    val batches = st.inlinedAt(e.tableId, st.currentSnapshotId)
    if (batches.isEmpty) return st.currentSnapshotId
    val scoped = st.copy(files = Vector.empty, deleteFiles = Vector.empty)
    val df = LakeRead.scanDF(spark, scoped, e.tableId, st.currentSnapshotId,
      Nil, withRowMeta = true)
      .drop(LakeRead.FileCol, LakeRead.PosCol)
    LakeWrite.append(spark, store, sn, tn, df, explicitRowIds = true,
      changeTag = "flushed", sorted = true,
      extraEnded = stNow =>
        (Nil, Nil, stNow.inlinedAt(e.tableId, stNow.currentSnapshotId).map(_.batchId).toList))
  }

  /** cleanup_old_files (reference src/pgducklake_functions.cpp:142-203):
    * physically delete files scheduled for deletion. */
  def cleanupOldFiles(olderThanMs: Option[Long] = None): Long = {
    val st = store.state()
    val now = System.currentTimeMillis()
    val victims = st.scheduledDeletions.filter(sd =>
      olderThanMs.forall(ms => sd.scheduledAtMs <= now - ms))
    victims.foreach { sd =>
      val p = Paths.get(sd.path)
      if (Files.isDirectory(p)) LakeWrite.deleteRecursively(sd.path)
      else Files.deleteIfExists(p)
    }
    if (victims.isEmpty) return st.currentSnapshotId
    store.commitWithRetry() { (stN, sid) =>
      CommitDelta(
        snapshot = Snapshot(sid, System.currentTimeMillis(),
          stN.snapshots.lastOption.map(_.schemaVersion).getOrElse(0L),
          List(s"cleanup:${victims.length}")),
        removedScheduledDeletions = victims.map(_.path).toList)
    }
  }

  // ------------------------------------------------------------- options

  /** set_option (reference docs/settings.md, sql/pg_ducklake--0.1.0.sql:150-176) */
  def setOption(key: String, value: String, table: Option[String] = None): Long = {
    val st0 = store.state()
    val scope = table.map(t => resolve(t, st0).tableId.toString).getOrElse("global")
    store.commitWithRetry() { (st, sid) =>
      CommitDelta(
        snapshot = Snapshot(sid, System.currentTimeMillis(),
          st.snapshots.lastOption.map(_.schemaVersion).getOrElse(0L),
          List(s"option:$key")),
        endedTags = List(s"$scope:$key"),
        newTags = List(TagEntry(scope, key, value, sid, None)))
    }
  }

  def options(): DataFrame = {
    val st = store.state()
    val cur = st.currentSnapshotId
    val rows = st.tags.filter(t => liveAt(t.begin, t.end, cur))
      .sortBy(t => (t.scope, t.key))
      .map(t => Row(t.scope, t.key, t.value))
    spark.createDataFrame(rows.toList.asJava, StructType(Seq(
      StructField("scope", StringType), StructField("key", StringType),
      StructField("value", StringType))))
  }

  /** set_partition (reference src/pgducklake_partition.cpp:31-74): applies
    * to FUTURE files; existing files keep their recorded values
    * (partition.sql:43-57 retroactive safety). */
  def setPartition(table: String, keys: List[PartitionKey]): Long = {
    val st0 = store.state()
    val tid = resolve(table, st0).tableId
    store.commitWithRetry() { (st, sid) =>
      CommitDelta(
        snapshot = Snapshot(sid, System.currentTimeMillis(),
          st.snapshots.lastOption.map(_.schemaVersion).getOrElse(0L),
          List(s"partition:$tid")),
        endedPartitionInfo = List(tid),
        newPartitionInfo = if (keys.isEmpty) Nil
          else List(PartitionInfoEntry(tid, keys, sid, None)))
    }
  }

  /** set_sort (reference src/pgducklake_sorted_by.cpp:186-268): sort
    * applied on compaction/flush, not direct inserts. */
  def setSort(table: String, keys: List[SortKey]): Long = {
    val st0 = store.state()
    val tid = resolve(table, st0).tableId
    store.commitWithRetry() { (st, sid) =>
      CommitDelta(
        snapshot = Snapshot(sid, System.currentTimeMillis(),
          st.snapshots.lastOption.map(_.schemaVersion).getOrElse(0L),
          List(s"sort:$tid")),
        endedSortInfo = List(tid),
        newSortInfo = if (keys.isEmpty) Nil else List(SortInfoEntry(tid, keys, sid, None)))
    }
  }

  /** freeze/export (reference src/pgducklake_freeze.cpp:81-140) */
  def freeze(target: String): Unit = store.freeze(target)

  /** Incremental change-feed consumption: tracks the last snapshot seen and
    * returns (changesSinceLastPoll, newCursor) per call — the snapshot-range
    * batch surface the reference exposes (A16) lifted into a poll loop,
    * which is exactly how its consumers drive `table_changes` (the
    * reference has no push/streaming surface either; SURVEY.md §1.1). */
  def changeFeedPoller(table: String): ChangeFeedPoller =
    new ChangeFeedPoller(this, table, currentSnapshot())

  private implicit class ListAsJava[A](l: List[A]) {
    def asJava: java.util.List[A] = {
      val jl = new java.util.ArrayList[A](l.size)
      l.foreach(jl.add)
      jl
    }
  }
}

/** Stateful cursor over a table's change feed. Each poll() returns the
  * changes committed strictly after the previous poll (exclusive) up to the
  * current snapshot (inclusive). */
class ChangeFeedPoller(lake: Lake, table: String, startAt: Long) {
  @volatile private var cursor: Long = startAt
  def lastSeenSnapshot: Long = cursor
  def poll(): DataFrame = synchronized {
    val upTo = lake.currentSnapshot()
    val df = lake.tableChanges(table, cursor, upTo)
    cursor = upTo
    df
  }
}

/** DuckLake type name ↔ Catalyst type mapping (SURVEY.md §1.2, reference
  * src/pgducklake_table.cpp:955-1036 DuckLakeTypeToPgType) — used for
  * freeze interop so an external DuckLake reader agrees on column types. */
object TypeMap {
  val duckToSpark: Map[String, DataType] = Map(
    "boolean" -> BooleanType, "int8" -> ByteType, "int16" -> ShortType,
    "int32" -> IntegerType, "int64" -> LongType,
    "uint8" -> ShortType, "uint16" -> IntegerType, "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0), "hugeint" -> DecimalType(38, 0),
    "float32" -> FloatType, "float64" -> DoubleType,
    "varchar" -> StringType, "blob" -> BinaryType,
    "date" -> DateType, "time" -> LongType /* micros-since-midnight */,
    "timestamp" -> TimestampNTZType, "timestamptz" -> TimestampType,
    "uuid" -> StringType, "json" -> StringType,
    "variant" -> VariantType /* semi-structured (variant.sql; Spark 4 native) */)

  def sparkToDuck(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "varchar"
    case BinaryType => "blob"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case _: VariantType => "variant"
    case ArrayType(e, _) => s"${sparkToDuck(e)}[]"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${sparkToDuck(f.dataType)}").mkString("struct(", ", ", ")")
    case MapType(k, v, _) => s"map(${sparkToDuck(k)}, ${sparkToDuck(v)})"
    case other => "varchar" // unknown types fall back to text (table.cpp:1028-1035)
  }
}
