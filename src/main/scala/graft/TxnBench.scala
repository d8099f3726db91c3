package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.lake.Lake

/** Transaction staging-state micro-bench (VERDICT r5 #8): a many-statement
  * transaction exercises `StagingStore.state()` once per op. Before the
  * incremental fold cache that was O(ops²) total — a 10k-statement batch
  * load re-folded every staged delta on every statement. Prints one JSON
  * line with the wall time for a 10k-op `lake.transaction {}` built from
  * inline inserts (no Spark jobs, so the fold cost IS the measurement).
  */
object TxnBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_txnbench").toString
    val lake = new Lake(spark, root)
    lake.createTable("main.t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType))))
    // keep every op on the inline fast path
    lake.setOption("data_inlining_row_limit", "8", Some("main.t"))
    val t0 = System.nanoTime()
    lake.transaction { tx =>
      var i = 0
      while (i < n) { tx.insertRows("main.t", Seq(Seq(i, i * 2))); i += 1 }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val count = lake.table("main.t").count()
    println(s"""{"metric":"txn_10k_ops","ops":$n,"value":$sec,"unit":"sec","rows":$count}""")
    spark.stop()
  }
}
