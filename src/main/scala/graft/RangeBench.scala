package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-join decomposition value measured (BASELINE.md round-7): the
  * q24 interval-containment join (events × 1-hour marker windows) run
  * two ways on the same data —
  *   (a) NAIVE: join on the range predicate alone. With no equi key
  *       Catalyst can only plan BroadcastNestedLoopJoin: every event row
  *       evaluates the predicate against every interval, O(|events| ×
  *       |intervals|).
  *   (b) BINNED (the q24 shape): quantize the time axis to hour buckets,
  *       explode each interval into the ≤ 2 buckets it covers, equi-join
  *       on the bucket, refine exactly. Work is O(|events| + matches).
  * Equality of both results is asserted before timing. The gap grows
  * linearly with the interval count — at 100 TB the naive plan is not
  * slow, it is impossible.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.RangeBench */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.queries.Tables.load(spark, sfDir, "events")
    val markers = e.filter(col("user_id") === 0)
      .select(col("event_id").as("m_id"), col("ts").as("m_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("m_end"))

    def finish(joined: DataFrame): DataFrame = joined
      .groupBy(col("m_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))

    val naive = finish(
      markers.join(e.select(col("event_id"), col("ts")),
        col("ts") >= col("m_start") && col("ts") < col("m_end")))

    val binned = finish(
      markers.withColumn("bucket",
          explode(sequence(date_trunc("hour", col("m_start")),
            date_trunc("hour", col("m_end")), expr("INTERVAL 1 HOUR"))))
        .join(e.select(col("event_id"), col("ts"),
            date_trunc("hour", col("ts")).as("bucket")), Seq("bucket"))
        .filter(col("ts") >= col("m_start") && col("ts") < col("m_end")))

    val nPlan = naive.queryExecution.executedPlan.toString
    require(nPlan.contains("BroadcastNestedLoop") || nPlan.contains("CartesianProduct"),
      s"naive variant unexpectedly avoided the quadratic plan:\n$nPlan")
    val bPlan = binned.queryExecution.executedPlan.toString
    require(!bPlan.contains("BroadcastNestedLoop") && !bPlan.contains("CartesianProduct"),
      "binned variant fell back to a quadratic plan")

    val a = naive.collect().map(_.toSeq).sortBy(_.head.toString)
    val c = binned.collect().map(_.toSeq).sortBy(_.head.toString)
    require(a.toSeq == c.toSeq, s"variants disagree: ${a.length} vs ${c.length} rows")

    def time(df: DataFrame): Double = {
      df.count() // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }
    val tBinned = time(binned)
    val tNaive = time(naive)
    val nEvents = e.count(); val nIntervals = markers.count()
    println(f"""{"bench":"range_join","events":$nEvents,"intervals":$nIntervals,""" +
      f""""naive_nlj_s":$tNaive%.3f,"binned_s":$tBinned%.3f,""" +
      f""""speedup":${tNaive / tBinned}%.1f}""")
    spark.stop()
  }
}
