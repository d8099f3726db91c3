package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.StreamingBatch
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.lake.Lake

/** Structured Streaming source over a lake table's change data feed.
  *
  * The reference's only incremental-consumption surface is the
  * snapshot-range `table_changes` TVF (SURVEY.md §1.1;
  * sql/pg_ducklake--0.1.0.sql:344-449) — consumers poll it with a cursor.
  * This source lifts that exact contract into Spark's micro-batch loop:
  * offsets ARE snapshot ids, and every micro-batch is
  * `tableChanges(lastOffset, newOffset)` — a fully distributed plan
  * (parquet scans + anti-joins), never a driver-side collect. Rows carry
  * the table's columns plus `_change_type` (insert / delete /
  * update_preimage / update_postimage), `_snapshot_id`, `_row_id`.
  *
  * {{{
  *   spark.readStream.format("graft-changes")
  *     .option("root", "/lake/root").option("table", "main.t")
  *     .option("startSnapshot", "3")          // optional, exclusive; default -1
  *     .option("maxSnapshotsPerTrigger", "5") // optional backlog rate cap
  *     .option("maxBytesPerTrigger", "1g-ish-bytes") // optional volume cap
  *     .load()
  * }}}
  *
  * Checkpoint-restartable: offsets serialize as the snapshot id. The stream
  * pins the table's column set at start; a backlog spanning an ADD COLUMN
  * still drains — every micro-batch is conformed to the declared schema
  * (pre-ADD rows NULL-fill the new column, the reference's historical-
  * schema semantics). Columns added after start need a restart to be
  * served (the same contract as Delta's CDF stream).
  *
  * `maxSnapshotsPerTrigger` bounds how many snapshots one micro-batch may
  * cover. Without it a stream cold-starting against a table with a deep
  * snapshot history replays the WHOLE backlog in a single trigger — at
  * 100 TB that first batch is unbounded state. Delta (`maxFilesPerTrigger`)
  * and Iceberg (`streaming-max-files-per-micro-batch`) cap triggers for the
  * same reason. Implemented the way FileStreamSource does its cap: the
  * source implements `SupportsTriggerAvailableNow` (so MicroBatchExecution
  * uses it directly instead of wrapping it in `AvailableNowSourceWrapper`,
  * whose one-shot end capture would TRUNCATE a capped drain) and applies
  * the cap inside `latestOffset`, advancing an admission cursor at most N
  * snapshots past the planned start each call. The engine then naturally
  * schedules ceil(backlog/N) micro-batches; `Trigger.AvailableNow` drains
  * to the end captured by `prepareForTriggerAvailableNow`, in capped steps.
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def lakeFor(sqlContext: SQLContext,
      parameters: Map[String, String]): (Lake, String, Long, Option[Long], Option[Long]) = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-changes: option 'root' required"))
    val table = p.getOrElse("table",
      throw new IllegalArgumentException("graft-changes: option 'table' required"))
    val start = p.get("startsnapshot").map(_.toLong).getOrElse(-1L)
    val cap = p.get("maxsnapshotspertrigger").map(_.toLong)
    cap.foreach(c => require(c > 0,
      s"graft-changes: maxSnapshotsPerTrigger must be positive, got $c"))
    val byteCap = p.get("maxbytespertrigger").map(_.toLong)
    byteCap.foreach(c => require(c > 0,
      s"graft-changes: maxBytesPerTrigger must be positive, got $c"))
    // option jdbc=<url>: the lake's catalog lives in a shared database
    // (same option as the DSv2 catalog) — without it a stream against a
    // JDBC-cataloged lake would silently read an empty file log
    val lake = p.get("jdbc") match {
      case Some(url) => new Lake(sqlContext.sparkSession, root,
        Some(new graft.lake.JdbcMetadataStore(root, url)))
      case None => new Lake(sqlContext.sparkSession, root)
    }
    (lake, table, start, cap, byteCap)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (lake, table, _, _, _) = lakeFor(sqlContext, parameters)
    // schema inference opens its own store — close it here (a
    // jdbc-cataloged store holds a live DB connection; Source.stop only
    // closes the store createSource built)
    try {
      val cur = lake.currentSnapshot()
      (shortName(), lake.tableChanges(table, cur, cur).schema)
    } finally lake.store match {
      case j: graft.lake.JdbcMetadataStore => j.close()
      case _ => ()
    }
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (lake, table, start, cap, byteCap) = lakeFor(sqlContext, parameters)
    new ChangeFeedSource(lake, table, start, cap, byteCap)
  }
}

class ChangeFeedSource(lake: Lake, table: String, startExclusive: Long,
    maxSnapshotsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow {

  /** snapshot the declared schema was captured at — batches ending after
    * a RENAME translate their columns back to these names by columnId */
  private val declaredSnap: Long = lake.currentSnapshot()

  override val schema: StructType =
    lake.tableChanges(table, declaredSnap, declaredSnap).schema

  /** Highest snapshot id already offered to the engine. Advanced by
    * latestOffset as batches are planned; ALSO advanced by getBatch/commit
    * so a checkpoint restart (where the engine replays or acknowledges the
    * restored offset before polling) never re-plans the drained range. The
    * restored offset also arrives as latestOffset's `startOffset`, which is
    * folded in first — either path keeps the cursor monotone. */
  @volatile private var cursor: Long = startExclusive

  /** End snapshot captured at AvailableNow start: the drain stops here even
    * if other writers keep committing, matching AvailableNow's contract. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = Some(lake.currentSnapshot())
  }

  /** The cap is applied here, not via a ReadLimit: the option is a source
    * property (FileStreamSource does the same with maxFilesPerTrigger). */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Latest admissible snapshot, or null for "no new data". The metadata
    * store re-lists the log on each call, so commits from OTHER
    * writers/processes surface here too. With a rate cap, advances at most
    * `maxSnapshotsPerTrigger` past the planned start per call — the engine
    * then schedules one micro-batch per step until the backlog drains. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(startOffset).map(snapV2).getOrElse(startExclusive)
    if (from > cursor) cursor = from
    // ONE metadata listing per poll: admitTo's byte branch reuses it —
    // a second full log list per poll is the exact cost r10 removed from
    // reportLatestOffset (+0.3-0.6 s on the stream entries)
    val stOpt =
      if (availableNowEnd.isEmpty || maxBytesPerTrigger.isDefined)
        Some(lake.store.state())
      else None
    val bound = availableNowEnd.getOrElse(stOpt.get.currentSnapshotId)
    if (bound > lastSeenHead) lastSeenHead = bound
    if (bound > cursor) cursor = admitTo(cursor, bound, stOpt)
    if (cursor <= startExclusive) null else LongOffset(cursor)
  }

  /** Admission: end snapshot of the next micro-batch, bounded by BOTH caps.
    * `maxSnapshotsPerTrigger` bounds the count; `maxBytesPerTrigger` bounds
    * the summed change volume — per admitted snapshot, the data-file bytes
    * plus inlined-row JSON committed AT that snapshot (Delta/Iceberg pair
    * their count caps with a byte cap for the same reason: a snapshot
    * window of wildly uneven sizes — one 2 TB compaction vs a thousand
    * small appends — still admits an unbounded batch under a count cap
    * alone; the sizes are already in the `ducklake_data_file` metadata, so
    * admission is O(files) driver-side with no filesystem calls). Always
    * admits at least one snapshot: a single fat snapshot is admitted ALONE
    * rather than stalling the stream. Snapshots of OTHER tables contribute
    * zero bytes and flow through freely. */
  private def admitTo(from: Long, bound: Long,
      listed: Option[graft.lake.Meta.CatalogState]): Long = {
    if (maxSnapshotsPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) return bound
    val nCap = maxSnapshotsPerTrigger.getOrElse(Long.MaxValue)
    maxBytesPerTrigger match {
      case None => math.min(bound, from + nCap)
      case Some(bCap) =>
        val st = listed.getOrElse(lake.store.state())
        val (sn, tn) = lake.schemaOf(table)
        val tid = st.tableAt(sn, tn, st.currentSnapshotId).map(_.tableId)
          .getOrElse(return math.min(bound, from + nCap))
        // one pass over the catalog builds sid → bytes for the admission
        // window; walking the file list per candidate snapshot would be
        // O(backlog × files) on a deep cold-start backlog
        val bySid = new scala.collection.mutable.HashMap[Long, Long]()
        def add(sid: Long, b: Long): Unit =
          bySid.update(sid, bySid.getOrElse(sid, 0L) + b)
        st.files.iterator
          .filter(f => f.tableId == tid && f.begin > from && f.begin <= bound)
          .foreach(f => add(f.begin, f.fileSizeBytes))
        st.inlined.iterator
          .filter(ib => ib.tableId == tid && ib.begin > from && ib.begin <= bound)
          .foreach(ib => add(ib.begin, ib.rowsJson.iterator.map(_.length.toLong).sum))
        // DELETE snapshots write only delete files, but serving their
        // preimage rows RESCANS the affected data files — charge those
        // files' sizes, or a backlog of large deletes would admit as zero
        // bytes and blow the first trigger anyway
        lazy val sizeByFileId = st.files.iterator
          .filter(_.tableId == tid).map(f => f.fileId.toString -> f.fileSizeBytes)
          .toMap
        st.deleteFiles.iterator
          .filter(d => d.tableId == tid && d.begin > from && d.begin <= bound)
          .foreach(d => add(d.begin,
            d.countsByFile.keysIterator.map(sizeByFileId.getOrElse(_, 0L)).sum))
        var end = from
        var n = 0L
        var bytes = 0L
        while (end < bound && n < nCap) {
          val sid = end + 1
          val b = bySid.getOrElse(sid, 0L)
          if (n > 0 && bytes + b > bCap) return end
          bytes += b
          n += 1
          end = sid
        }
        end
    }
  }

  /** Head of the feed as of the last poll — surfaces backlog depth in
    * progress reports while latestOffset admits it in capped steps. Serves
    * the CACHED head rather than re-listing the metadata log: the engine
    * calls this once per micro-batch right after latestOffset, and the
    * extra full log list per batch measured +0.3-0.6 s on the s06/s07
    * stream entries (r10 round-over-round catch). Progress metadata may
    * be one poll stale; planning never uses it. */
  @volatile private var lastSeenHead: Long = startExclusive
  override def reportLatestOffset(): OffsetV2 = {
    if (lastSeenHead <= startExclusive) null else LongOffset(lastSeenHead)
  }

  /** Unused: with SupportsAdmissionControl present the engine always plans
    * via latestOffset. Kept functional (uncapped head) for direct callers. */
  override def getOffset: Option[V1Offset] = {
    val cur = lake.currentSnapshot()
    if (cur <= startExclusive) None else Some(LongOffset(cur))
  }

  private def snapV2(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  private def snap(o: V1Offset): Long = snapV2(o)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val s0 = start.map(snap).getOrElse(startExclusive)
    val e = snap(end)
    cursor = math.max(cursor, e)
    StreamingBatch.asStreaming(conform(lake.tableChanges(table, s0, e), e))
  }

  /** Serve every micro-batch under the source's DECLARED schema. A backlog
    * range that ends before an ADD COLUMN returns the historical column set
    * (tableChanges resolves columns at the range's end snapshot — the
    * reference's per-snapshot historical schema, time_travel.sql:14-19);
    * the stream's contract is the schema captured at start, so columns the
    * batch lacks are NULL-filled (exactly what a time-travel read of a
    * pre-ADD snapshot returns for the new column) and types are cast
    * through ALTER TYPE widenings. Columns ADDED after stream start are
    * not served — restart the stream to pick up new DDL (Delta CDF's
    * contract). */
  private def conform(df0: DataFrame, endSnap: Long): DataFrame = {
    if (df0.schema == schema) return df0
    import org.apache.spark.sql.functions.{col, lit}
    // RENAME translation (r15): the batch carries the range-end snapshot's
    // names; translate them back to the DECLARED names by columnId before
    // the by-name conform — without this a renamed column silently
    // NULL-fills in every post-rename micro-batch (the by-name miss looked
    // exactly like a column added after stream start)
    val st = lake.store.state()
    val df = {
      val (sn, tn) = lake.schemaOf(table)
      st.tableAt(sn, tn, endSnap)
        .flatMap(t => st.nameShift(t.tableId, endSnap, declaredSnap)) match {
        case Some(shift) if shift.nonEmpty =>
          // ONE atomic projection (r16, ADVICE) — a chained
          // withColumnRenamed fold breaks on swap renames (a→b, b→a) or a
          // new column reusing a renamed column's old declared name:
          // mid-fold duplicates make the following select ambiguous. The
          // alignColumns pattern (single select with aliases) is immune;
          // on a name collision the columnId-matched shift entry wins and
          // the post-start ADD is dropped (it is not served anyway).
          val targets = df0.columns.toSeq.map(c => c -> shift.getOrElse(c, c))
          val shiftedTo = shift.values.toSet
          df0.select(targets.collect {
            case (c, n) if shift.contains(c) || !shiftedTo(n) => col(c).as(n)
          }: _*)
        case _ => df0
      }
    }
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  override def commit(end: V1Offset): Unit = { cursor = math.max(cursor, snap(end)) }
  override def commit(end: OffsetV2): Unit = { cursor = math.max(cursor, snapV2(end)) }
  override def stop(): Unit = lake.store match {
    // a JDBC-cataloged stream holds one live DB connection for its
    // lifetime — release it with the query
    case j: graft.lake.JdbcMetadataStore => j.close()
    case _ => ()
  }
  override def toString: String = s"GraftChangeFeedSource[$table @ ${lake.root}]"
}
