package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing scratchpad (not part of the shipped surface).
  * `runMain graft.Scratch q01` prints the formatted plan; prepend `--show`
  * to print query results instead. */
object Scratch {
  def main(rawArgs: Array[String]): Unit = {
    val show = rawArgs.headOption.contains("--show")
    val args = if (show) rawArgs.drop(1) else rawArgs
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (show) df.show(100, false)
      else println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
