package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** one-shot A/B: mergeAdjacentFiles cost with range-aware vs fileId packing
  * (scratch measurement for BASELINE.md r14; not part of the shipped API) */
object CompactAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gsf10")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def build(name: String): graft.lake.Lake = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_cab$name").toString
      val lake = new graft.lake.Lake(spark, root)
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      lake.createTable("main.f", orders.schema,
        sortKeys = List(graft.lake.Meta.SortKey("o_orderkey", ascending = true, nullsFirst = true)))
      // 8 sorted RANGE-chunked appends in shuffled range order
      // (out-of-order ingest: fileId order != range order)
      val mx = orders.agg(max(col("o_orderkey"))).head.getLong(0)
      val w = mx / 8 + 1
      val chunks = Seq(5L, 1L, 7L, 3L, 0L, 6L, 2L, 4L)
      val (sn, tn) = lake.schemaOf("main.f")
      chunks.foreach { c =>
        graft.lake.LakeWrite.append(spark, lake.store, sn, tn,
          orders.filter(col("o_orderkey") >= c * w &&
            col("o_orderkey") < (c + 1) * w), sorted = true)
      }
      lake.setOption("target_file_size", "64MB", Some("main.f"))
      lake
    }
    Seq(("warmup", "true"), ("fileId", "false"), ("rangeAware", "true"), ("fileId2", "false"), ("rangeAware2", "true")).foreach { case (tag, conf) =>
      val lake = build(tag)
      spark.conf.set("spark.graft.lake.rangeAwareCompaction", conf)
      val t0 = System.nanoTime()
      lake.mergeAdjacentFiles("main.f")
      println(f"COMPACT_AB $tag%-10s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
