package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 rejects
  * outright. We read it via `spark.sql.legacy.parquet.nanosAsLong` (int64
  * nanos) and rebuild a microsecond TimestampType column with integer
  * arithmetic (`DIV`, not `/` — ns-since-epoch overflows double precision).
  * Day/week-level semantics match DuckDB's native ns handling exactly.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
