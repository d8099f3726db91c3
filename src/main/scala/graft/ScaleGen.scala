package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the job-floor amortization bench (VERDICT r4 #1).
  *
  * The driver ships sf up to 0.1 only; proving that the sub-second Spark/DuckDB
  * ratios are fixed job-floor (not plan debt) needs data 10-100x larger. This
  * main replicates an existing sf directory N times with disjoint key ranges --
  * the same star-schema shape and value distributions, N x the volume -- so the
  * identical query text runs on both engines at the larger scale.
  *
  * Key handling per table (dimension AND fact keys shift together, so join
  * fan-in per key stays identical to the source sf -- replicas never join to
  * each other): customer/supplier/part/orders/lineitem keys += replica*OFFSET;
  * nation/region stay fixed (TPC-H semantics: they are constant-size).
  * documents.text gets a replica-distinct suffix so replicated docs are
  * near-dups, not exact dups (keeps dedup workloads honest); n_chars is
  * recomputed. embeddings keep their vectors (timing is distance-math-bound,
  * ties are irrelevant to wall time).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <replicas> [tables]
  * The optional 4th arg (comma-separated table names) restricts output to
  * those tables — e.g. `documents,embeddings` for an sf100 pipeline-probe
  * fixture without paying for a 15 GB lineitem nobody will scan.
  */
object ScaleGen {
  private val OFFSET = 100000000L // > any key in sf0.1 by 100x

  def main(args: Array[String]): Unit = {
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val builder = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scalegen")
    // sessionConf carries nanosAsLong for LEGACY nanos-encoded events
    // fixtures; current fixtures ship timestamp[us], which passes through
    // here unchanged. Either way the replica preserves the source encoding
    // and Tables.load sniffs it (see Tables.scala).
    graft.queries.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, shiftCols: Seq[String], extra: DataFrame => DataFrame = identity): Unit = {
      if (!wanted(table)) return
      val base0 = spark.read.parquet(s"$src/$table.parquet")
      // 16 output files per fact table: big enough row groups for honest
      // scan timing, parallel enough for local[32]. Repartition the SOURCE
      // (megabytes) before the ×n explosion, never the replica (the r13
      // build caught the original post-explosion repartition spilling a
      // 49 GB shuffle for an 11 MB lineitem source — the map-only
      // explosion preserves partitioning, so shuffling first yields the
      // identical output layout for 4000× less shuffle I/O).
      val parts = if (base0.count() > 100000) 16 else 4
      val base = base0.repartition(parts)
      val reps = spark.range(n).select(col("id").as("__rep"))
      var df = base.crossJoin(broadcast(reps))
      for (c <- shiftCols) df = df.withColumn(c, col(c) + col("__rep") * OFFSET)
      df = extra(df).drop("__rep")
      df.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"wrote $table x$n")
    }

    // constant-size dims: single copy
    for (t <- Seq("region", "nation") if wanted(t)) {
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate(
      "documents",
      Seq("doc_id"),
      df =>
        df.withColumn(
            "text",
            when(col("__rep") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" r"), col("__rep")))
          )
          .withColumn("n_chars", length(col("text")).cast("long"))
    )
    replicate("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
