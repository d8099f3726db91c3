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
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.n").load()
        .writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).select("_change_type", "n_nationkey", "n_name")
        .orderBy("_change_type", "n_nationkey")
    }),

    // ---- CDC replication pipeline: CDF source → exactly-once lake sink ---
    // readStream the change feed of a mutating source table, keep the live
    // image (inserts + update post-images of rows never later deleted),
    // writeStream into a SECOND lake table — the full streaming loop runs
    // on the lake format end to end with snapshot-tagged exactly-once.
    "s02_stream_pipeline" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val nation = t(s, dir, "nation")
      lake.createTable("main.src", nation.schema)
      lake.append("main.src", nation)
      lake.delete("main.src", col("n_regionkey") === 3)
      lake.update("main.src", col("n_regionkey") === 1,
        Map("n_name" -> concat(col("n_name"), lit("_v2"))))
      lake.createTable("main.dst", nation.schema)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_s02_ckpt").toString
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.src").load()
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(nation.columns.map(col).toIndexedSeq: _*)
        .writeStream.format("graft-lake")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.dst")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // dst holds every row version that was ever inserted (CDC append log)
      lake.table("main.dst").orderBy("n_nationkey", "n_name")
    }),

    // ---- event-time tumbling window + watermark over the CDF stream ------
    // The state-bounding contract a 100-TB stream needs: the watermark caps
    // window state at (max event time - delay) while late data inside the
    // delay still lands in its window. Complete-mode drain makes the entry
    // deterministic (every window emits once the feed is exhausted);
    // Spark's windows are epoch-aligned, which the oracle reproduces.
    "s03_stream_window" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .filter(col("o_orderkey") < 20000)
      lake.createTable("main.ev", orders.schema)
      lake.append("main.ev", orders)
      val sink = s"graft_s03_${UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.ev").load()
        .filter(col("_change_type") === "insert")
        .withColumn("ts", col("o_orderdate").cast("timestamp"))
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "30 days"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .select(col("window.start").cast("date").as("w_start"),
          col("n_orders"), col("min_key"), col("max_key"))
        .writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy("w_start")
    }),

    // ---- event-time SLIDING windows over the CDF stream -------------------
    // The remaining standard window shape after tumbling (s03) and session
    // (s04): overlapping epoch-aligned windows (30-day span sliding by 10)
    // — every event lands in exactly span/slide = 3 windows. The oracle
    // reproduces the assignment by expanding each event into its 3 windows
    // (floor-to-slide minus k·slide, k in 0..2).
    "s05_stream_sliding" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .filter(col("o_orderkey") < 20000)
      lake.createTable("main.sw", orders.schema)
      lake.append("main.sw", orders)
      val sink = s"graft_s05_${UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.sw").load()
        .filter(col("_change_type") === "insert")
        .withColumn("ts", col("o_orderdate").cast("timestamp"))
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "30 days", "10 days"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .select(col("window.start").cast("date").as("w_start"),
          col("n_orders"), col("min_key"), col("max_key"))
        .writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy("w_start")
    }),

    // ---- event-time SESSION windows over the CDF stream -------------------
    // The remaining stateful shape after tumbling (s03): gap-based
    // sessionization via Spark's native session_window — state merges
    // events whose inter-arrival is under the gap, the standard user-
    // activity segmentation. Complete-mode drain keeps the entry
    // deterministic; the oracle reproduces the identical semantics with
    // gaps-and-islands SQL (new session when ts - lag(ts) >= gap).
    "s04_stream_session" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val ev = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("ts"))
      lake.createTable("main.sev", ev.schema)
      lake.append("main.sev", ev)
      val sink = s"graft_s04_${UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.sev").load()
        .filter(col("_change_type") === "insert")
        .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("min_event"), max(col("event_id")).as("max_event"))
        .select(col("user_id"), col("session_window.start").as("s_start"),
          col("n_events"), col("min_event"), col("max_event"))
        .writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy("user_id", "s_start")
    }),

    // ---- stream-stream inner join between two CDF streams -----------------
    // The last core stateful shape: two live change feeds joined on key
    // with an event-time RANGE condition (ship within [order, order+150d]).
    // The range + both-side watermarks is the 100 TB contract — it lets
    // Spark evict buffered rows once the other side's watermark passes the
    // reachable window, so join state is bounded by the time band instead
    // of growing with the stream. Raw matches land in the sink (append
    // mode, the only mode stream-stream joins support); the deterministic
    // per-order rollup happens batch-side on the drained sink.
    "s06_stream_join" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val ord = t(s, dir, "orders").filter(col("o_orderkey") < 4000)
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 4000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("timestamp").as("l_ts"))
      lake.createTable("main.sjo", ord.schema)
      lake.append("main.sjo", ord)
      lake.createTable("main.sjl", li.schema)
      lake.append("main.sjl", li)
      val left = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.sjo").load()
        .filter(col("_change_type") === "insert")
        .select("o_orderkey", "o_ts")
        .withWatermark("o_ts", "1 day")
      val right = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.sjl").load()
        .filter(col("_change_type") === "insert")
        .select("l_orderkey", "l_linenumber", "l_ts")
        .withWatermark("l_ts", "1 day")
      val joined = left.join(right,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_ts") >= col("o_ts") &&
          col("l_ts") <= col("o_ts") + expr("INTERVAL 150 DAYS"))
      val sink = s"graft_s06_${UUID.randomUUID().toString.replace("-", "")}"
      // stream-stream join state cost is per (state partition × 2 sides ×
      // 4 store instances); at demo volume the fixed store setup dominates,
      // so pin the stateful shuffle narrow for this query (the conf is
      // captured at query start; restored right after the drain)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        joined.writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      q.awaitTermination()
      s.table(sink).groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          min(col("l_linenumber")).as("min_line"),
          max(col("l_linenumber")).as("max_line"),
          max(col("l_ts")).cast("date").as("last_ship"))
        .orderBy("o_orderkey")
    }),

    // ---- streaming deduplication over the CDF stream ----------------------
    // THE streaming op of a training-data ingest pipeline: exact dedup on a
    // key while the data arrives, state bounded by the event-time watermark
    // (a key's dedup entry is dropped once the watermark passes it — at
    // 100 TB/day the state holds one watermark-window of keys, not the
    // corpus). The source table carries genuine duplicates (the same batch
    // committed twice); identical payloads make keep-first deterministic.
    "s07_stream_dedup" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val ev = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
      lake.createTable("main.dd", ev.schema)
      lake.append("main.dd", ev)
      lake.append("main.dd", ev) // exact duplicates, second snapshot
      val sink = s"graft_s07_${UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.dd").load()
        .filter(col("_change_type") === "insert")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .writeStream.format("memory").queryName(sink)
        // explicit checkpoint: a temp one makes Spark WARN unconditionally
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy("event_id")
    }),

    // ---- MV auto-refresh via the streaming sink (r12): the CDF stream of
    // the source drives refreshMaterializedView per micro-batch under the
    // existing watermark CAS — the continuous version of l57's manual
    // refresh; no foreachBatch, no manual refresh calls -------------------
    "s08_mv_autorefresh" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      lake.createTable("main.src", orders.schema)
      lake.append("main.src", orders.filter(col("o_orderkey") % 2 === 0))
      lake.createMaterializedView("main.mv", "main.src",
        groupCols = Seq("o_orderpriority"), sumCols = Seq("o_custkey"))
      // history past the MV's creation watermark, drained by the stream
      lake.append("main.src", orders.filter(col("o_orderkey") % 2 === 1))
      lake.delete("main.src", col("o_orderkey") % 10 === 3)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_s08_ckpt").toString
      val q = s.readStream.format("graft-changes")
        .options(LakeQueries.lakeOpts(lake)).option("table", "main.src")
        .option("maxSnapshotsPerTrigger", "1") // several refresh batches
        .load()
        .writeStream.format("graft-mv-refresh")
        .options(LakeQueries.lakeOpts(lake)).option("view", "main.mv")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      lake.table("main.mv").orderBy(col("o_orderpriority"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // MV content after the stream drains == full GROUP BY of the final
    // source state (evens + odds, minus the deleted slice)
    "s08_mv_autorefresh" ->
      """SELECT o_orderpriority, COUNT(*) AS n_rows,
        |  COALESCE(CAST(SUM(o_custkey) AS BIGINT), 0) AS sum_o_custkey
        |FROM orders
        |WHERE NOT (o_orderkey % 10 = 3)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "s01_stream_changes" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change_type, n_nationkey, n_name FROM nation
        |  UNION ALL
        |  SELECT 'delete', n_nationkey, n_name FROM nation WHERE n_regionkey = 1) t
        |ORDER BY _change_type, n_nationkey""".stripMargin,

    "s02_stream_pipeline" ->
      """SELECT * FROM (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name || '_v2', n_regionkey
        |  FROM nation WHERE n_regionkey = 1) t
        |ORDER BY n_nationkey, n_name""".stripMargin,

    // Spark tumbling windows are aligned to the unix epoch: window start =
    // 1970-01-01 + floor(days_since_epoch / 30) * 30 days
    "s03_stream_window" ->
      """SELECT DATE '1970-01-01'
        |    + CAST(FLOOR(datediff('day', DATE '1970-01-01', o_orderdate) / 30) * 30
        |           AS INTEGER) AS w_start,
        |  count(*) AS n_orders,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey < 20000
        |GROUP BY 1 ORDER BY w_start""".stripMargin,

    // sliding windows expanded per event: the 3 containing windows of an
    // event are floor-to-10-days(ts) - k*10 days, k = 0..2 (epoch-aligned,
    // exactly Spark's assignment for window(ts, '30 days', '10 days'))
    "s05_stream_sliding" ->
      """WITH ev AS (
        |  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey < 20000),
        |x AS (
        |  SELECT o_orderkey,
        |    DATE '1970-01-01'
        |      + CAST(FLOOR(datediff('day', DATE '1970-01-01', o_orderdate) / 10) * 10
        |             - k.range * 10 AS INTEGER) AS w_start
        |  FROM ev CROSS JOIN range(0, 3) k)
        |SELECT w_start, count(*) AS n_orders,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM x GROUP BY w_start ORDER BY w_start""".stripMargin,

    // gaps-and-islands sessionization with the same gap rule Spark's
    // session_window applies: a new session starts when the inter-event
    // gap is >= 12 hours; session start = first event's ts
    "s04_stream_session" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts FROM events WHERE user_id < 50),
        |m AS (SELECT *, CASE WHEN ts - lag(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts) >= INTERVAL 12 HOUR
        |  THEN 1 ELSE 0 END AS brk FROM e),
        |sgrp AS (SELECT *, sum(brk) OVER
        |    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n_events,
        |  min(event_id) AS min_event, max(event_id) AS max_event
        |FROM sgrp GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    // same key + event-time-range join, computed as a plain batch join
    "s06_stream_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  min(l_linenumber) AS min_line, max(l_linenumber) AS max_line,
        |  CAST(max(l_shipdate) AS DATE) AS last_ship
        |FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 150 DAY
        |WHERE o_orderkey < 4000 AND l_orderkey < 4000
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,

    // duplicates are exact copies, so keep-first == DISTINCT
    "s07_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, ts
        |FROM events WHERE user_id < 40
        |ORDER BY event_id""".stripMargin
  )
}
