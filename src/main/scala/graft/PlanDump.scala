package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper for the optimization rounds: writes the FORMATTED
  * explain output (`df.explain("formatted")` equivalent) of selected
  * SparkEntry queries to one file per query, so before/after plan claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.PlanDump plans/r17 _before q01_pricing_summary ..."
  *
  * Args: <outDir> <suffix> <query...>. With no query names, dumps every
  * declared q* query (the t/v/m/l/s entries run op sequences whose final
  * frame is the interesting plan only sometimes; name them explicitly).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r17")
    val suffix = args.drop(1).headOption.getOrElse("_before")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.filter(_.startsWith("q")).toSeq.sorted
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // formatted initial plan (shows PushedFilters/ReadSchema per scan) +
      // the AQE-final executed plan after one materialization
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.count()
      val finalPlan = df.queryExecution.executedPlan.toString
      val out = s"==== $name (explain formatted, initial) ====\n" + formatted +
        s"\n==== $name (executed plan after AQE) ====\n" + finalPlan + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
        out.getBytes("UTF-8"))
      println(s"wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
