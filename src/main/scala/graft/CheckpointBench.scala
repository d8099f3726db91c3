package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.lake.{Lake, MetadataStore}

/** Cold-open cost with and without a metadata checkpoint: builds a catalog
  * with N inline commits (the direct-insert fast path — no Spark jobs), then
  * times `new MetadataStore(root).state()` cold, checkpoints, and times the
  * cold open again. Usage: runMain graft.CheckpointBench [nCommits] */
object CheckpointBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_ckptbench").toString
    val lake = new Lake(spark, root)
    lake.createTable("main.t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType))))
    lake.setOption("data_inlining_row_limit", "1000")
    (0 until n).foreach(i => lake.insertRows("main.t", Seq(Seq(i, i))))

    def coldOpenMs(): Double = {
      val t0 = System.nanoTime()
      new MetadataStore(root).state()
      (System.nanoTime() - t0) / 1e6
    }
    val noCkpt = Seq.fill(3)(coldOpenMs()).min
    lake.checkpoint()
    val withCkpt = Seq.fill(3)(coldOpenMs()).min
    println(f"""{"commits":$n,"cold_open_no_ckpt_ms":$noCkpt%.1f,"cold_open_with_ckpt_ms":$withCkpt%.1f}""")
    spark.stop()
  }
}
