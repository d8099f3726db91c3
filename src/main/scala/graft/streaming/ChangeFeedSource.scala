package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
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
  *     .option("startSnapshot", "3")        // optional, exclusive; default -1
  *     .load()
  * }}}
  *
  * Checkpoint-restartable: offsets serialize as the snapshot id. The stream
  * pins the table's column set at start (schema evolution mid-stream
  * requires a restart — the same contract as Delta's CDF stream).
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def lakeFor(sqlContext: SQLContext,
      parameters: Map[String, String]): (Lake, String, Long) = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-changes: option 'root' required"))
    val table = p.getOrElse("table",
      throw new IllegalArgumentException("graft-changes: option 'table' required"))
    val start = p.get("startsnapshot").map(_.toLong).getOrElse(-1L)
    (new Lake(sqlContext.sparkSession, root), table, start)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (lake, table, _) = lakeFor(sqlContext, parameters)
    val cur = lake.currentSnapshot()
    (shortName(), lake.tableChanges(table, cur, cur).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (lake, table, start) = lakeFor(sqlContext, parameters)
    new ChangeFeedSource(lake, table, start)
  }
}

class ChangeFeedSource(lake: Lake, table: String, startExclusive: Long)
    extends Source {

  override val schema: StructType = {
    val cur = lake.currentSnapshot()
    lake.tableChanges(table, cur, cur).schema
  }

  /** latest committed snapshot; None until something newer than the start
    * cursor exists (the metadata store re-lists the log on each call, so
    * commits from OTHER writers/processes surface here too) */
  override def getOffset: Option[V1Offset] = {
    val cur = lake.currentSnapshot()
    if (cur <= startExclusive) None else Some(LongOffset(cur))
  }

  private def snap(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val s0 = start.map(snap).getOrElse(startExclusive)
    StreamingBatch.asStreaming(lake.tableChanges(table, s0, snap(end)))
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftChangeFeedSource[$table @ ${lake.root}]"
}
