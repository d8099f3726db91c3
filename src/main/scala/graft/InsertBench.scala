package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.lake.Lake

/** Direct-insert latency benchmark mirroring the reference harness
  * (/root/reference/test/benchmark/bench_direct_insert.sh:17-19,99):
  * batch sizes {100, 1000, 10000}, 2 warmup + 5 timed iterations, table
  * (id INT, val TEXT), comparing the inline fast path (`Lake.insertRows`
  * with data_inlining_row_limit set — metadata-only commit, no Spark job)
  * against the distributed append path (limit 0 — staged parquet write +
  * stats job + commit). Prints one line per (batch, mode): avg_ms and
  * rows/sec, plus a speedup summary per batch size. */
object InsertBench {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("val", StringType)))
    val batchSizes = Seq(100, 1000, 10000)
    val warmup = 2
    val iters = 5
    val results = scala.collection.mutable.Map[(Int, String), Double]()
    for (batch <- batchSizes; mode <- Seq("direct", "engine")) {
      val lake = new Lake(spark, java.nio.file.Files.createTempDirectory("ib").toString)
      lake.createTable("main.t", schema)
      if (mode == "direct") lake.setOption("data_inlining_row_limit", "100000")
      val rows = (0 until batch).map(i => Seq(i, s"val_$i"))
      (0 until warmup).foreach(_ => lake.insertRows("main.t", rows))
      val t0 = System.nanoTime()
      (0 until iters).foreach(_ => lake.insertRows("main.t", rows))
      val avgMs = (System.nanoTime() - t0) / 1e6 / iters
      results((batch, mode)) = avgMs
      println(f"[insert-bench] batch=$batch%6d mode=$mode%-7s avg_ms=$avgMs%9.1f rows_per_sec=${batch / avgMs * 1000}%12.0f")
    }
    batchSizes.foreach { bs =>
      println(f"[insert-bench] batch=$bs%6d speedup(direct vs engine)=${results((bs, "engine")) / results((bs, "direct"))}%6.1fx")
    }
    spark.stop()
  }
}
