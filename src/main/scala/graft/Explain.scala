package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the executed plan (after AQE final re-plan) of
  * selected SparkEntry queries on SPARK_GRAFT_SF_DIR. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/gsf10 sbt "runMain graft.Explain q03_top_revenue_orders"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE settles on the final plan
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
