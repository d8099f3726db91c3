package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{Lake, LakeCatalog}

/** Scan-tax microbench (BASELINE.md "Lake layer at data scale"): the same
  * filtered aggregation over sf lineitem through (a) a plain parquet view,
  * (b) the DSv2 catalog SQL path, (c) the Scala facade scan — measures the
  * per-row cost the catalog path adds over the raw scan. */
object ScanBench {
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

    val root = java.nio.file.Files.createTempDirectory("scanbench").toString
    val lake = new Lake(spark, root)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t0 = System.nanoTime()
    lake.createTableAs("main.li", li)
    println(f"[scan-bench] ctas_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.conf.set("spark.sql.catalog.sb", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.sb.root", root)
    li.createOrReplaceTempView("li_plain")

    def agg(from: String) =
      s"""SELECT l_returnflag, sum(l_quantity) AS q, count(*) AS n
         |FROM $from WHERE l_shipdate <= DATE '1998-09-02'
         |GROUP BY l_returnflag""".stripMargin

    def time(label: String)(f: => Unit): Double = {
      (1 to 2).foreach(_ => f) // warm
      val runs = (1 to 5).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }.sorted
      val med = runs(runs.length / 2)
      println(f"[scan-bench] $label%-14s median_sec=$med%.3f")
      med
    }

    // the three paths must agree before their times mean anything
    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toString).sorted.toSeq
    val expect = canon(spark.sql(agg("li_plain")).collect())
    require(canon(spark.sql(agg("sb.main.li")).collect()) == expect,
      "dsv2 catalog path disagrees with plain parquet")

    val plain = time("plain_parquet") { spark.sql(agg("li_plain")).collect() }
    val dsv2 = time("dsv2_sql") { spark.sql(agg("sb.main.li")).collect() }
    val facade = time("scala_facade") {
      lake.table("main.li").filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n")).collect()
    }
    println(f"[scan-bench] dsv2_vs_plain=${dsv2 / plain}%.2fx facade_vs_plain=${facade / plain}%.2fx")
    graft.lake.LakeWrite.deleteRecursively(root)
    spark.stop()
  }
}
