package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 rejects
  * outright. Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * at build time (Verify/Bench/TestSession do — the loader deliberately does
  * NOT mutate session conf per call, which would race under concurrent
  * queries); the int64-nanos column is rebuilt into a microsecond
  * TimestampType with integer arithmetic (`DIV`, not `/` — ns-since-epoch
  * overflows double precision). Day/week-level semantics match DuckDB's
  * native ns handling exactly.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf required to read the `events` table (nanos timestamps)
    * plus the lake TVF SQL sugar; apply at session build. */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.lake.GraftExtensions")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
