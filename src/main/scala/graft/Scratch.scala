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
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val root = java.nio.file.Files.createTempDirectory("big_lake").toString
    val lake = new graft.lake.Lake(spark, root)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("CTAS lineitem 600k") { lake.createTableAs("main.li", li) }
    time("facade scan agg") {
      lake.table("main.li").filter(org.apache.spark.sql.functions.col("l_quantity") > 25)
        .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).collect()(0)
    }
    val cat = "bigcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.lake.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    time("catalog V1 scan agg") {
      spark.sql(s"SELECT sum(l_extendedprice) FROM $cat.main.li WHERE l_quantity > 25").collect()(0)
    }
    time("catalog V1 scan agg again") {
      spark.sql(s"SELECT sum(l_extendedprice) FROM $cat.main.li WHERE l_quantity > 25").collect()(0)
    }
    time("plain parquet agg (baseline)") {
      li.filter(org.apache.spark.sql.functions.col("l_quantity") > 25)
        .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).collect()(0)
    }
    // DML at scale
    time("delete 1/7 of rows") { lake.delete("main.li", org.apache.spark.sql.functions.expr("l_orderkey % 7 = 0")) }
    time("scan after delete") { lake.table("main.li").count() }
    time("vacuum") { lake.vacuum("main.li") }
    time("scan after vacuum") { lake.table("main.li").count() }
    spark.stop()
  }
}
