package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing scratchpad (not part of the shipped surface). */
object Scratch {
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
    val df = SparkEntry.queries("v03_knn_lsh")(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    println("[plan] total length: " + plan.length)
    println("[plan] lambdafunction occurrences: " + "lambdafunction".r.findAllIn(plan).length)
    println("[plan] aggregate( occurrences: " + "aggregate\\(".r.findAllIn(plan).length)
    val t0 = System.nanoTime()
    df.count()
    println(f"[plan] run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
