package graft.queries

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.lake._

/** Structured Streaming surface: the change data feed consumed as a
  * micro-batch stream (graft.streaming.ChangeFeedSourceProvider). The
  * reference's incremental surface is poll-driven `table_changes`
  * (SURVEY.md §1.1, A16); this runs the same contract through Spark's
  * streaming engine — Trigger.AvailableNow drains all committed snapshots
  * then stops, so the entry is deterministic and oracle-comparable.
  */
object StreamOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- change feed via readStream: inserts then a delete, drained ------
    "s01_stream_changes" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val nation = t(s, dir, "nation")
      lake.createTable("main.n", nation.schema)
      lake.append("main.n", nation)
      lake.delete("main.n", col("n_regionkey") === 1)
      val sink = s"graft_s01_${UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.format("graft-changes")
        .option("root", lake.root).option("table", "main.n").load()
        .writeStream.format("memory").queryName(sink)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).select("_change_type", "n_nationkey", "n_name")
        .orderBy("_change_type", "n_nationkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s01_stream_changes" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change_type, n_nationkey, n_name FROM nation
        |  UNION ALL
        |  SELECT 'delete', n_nationkey, n_name FROM nation WHERE n_regionkey = 1) t
        |ORDER BY _change_type, n_nationkey""".stripMargin
  )
}
