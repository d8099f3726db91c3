package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-local constant folding (org.apache.spark.sql.graft.LocalFold):
  * bounded Range / Sort / Generate / Aggregate chains over local data must
  * collapse to a LocalRelation — answering without submitting a single
  * Spark job — while producing byte-identical results to the distributed
  * plan, and every unsafe shape (nondeterminism, distinct aggregates,
  * over-budget cardinality) must be left untouched. */
class LocalFoldSpec extends AnyFunSuite {
  import TestSession.{spark, sf}

  private def optimized(df: DataFrame) = df.queryExecution.optimizedPlan

  private def isFullyLocal(df: DataFrame): Boolean =
    optimized(df).isInstanceOf[LocalRelation]

  /** Rows from `df` with the fold disabled — the distributed ground truth. */
  private def unfolded(df: => DataFrame): Seq[String] = {
    spark.conf.set("spark.graft.localFold.enabled", "false")
    try df.collect().map(_.toString).toSeq
    finally spark.conf.unset("spark.graft.localFold.enabled")
  }

  private def countJobs(body: => Unit): Int = {
    val group = "localfold-" + System.nanoTime()
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("range + aggregate folds to LocalRelation and runs zero jobs") {
    def q = spark.range(1, 10001).agg(
      sum(col("id")).as("total"), count(lit(1)).as("n"),
      sum(when(col("id") % 7 === 0, col("id"))).as("total_mod7"))
    assert(isFullyLocal(q), optimized(q).toString)
    val rows = q.collect()
    assert(rows.map(_.toString).toSeq == unfolded(q).toSeq)
    assert(rows.head.getLong(0) == 50005000L)
    assert(countJobs(q.collect()) == 0, "a folded constant query must not submit jobs")
  }

  test("grouped aggregate with FILTER clause folds and matches distributed") {
    def q = spark.range(0, 1000)
      .select((col("id") % 10).as("g"), col("id").as("v"))
      .groupBy(col("g"))
      .agg(sum(col("v")).as("s"),
        count(when(col("v") > 500, 1)).as("big"),
        avg(col("v")).as("a"),
        max(col("v")).as("mx"))
      .orderBy(col("g"))
    assert(isFullyLocal(q), optimized(q).toString)
    assert(q.collect().map(_.toString).toSeq == unfolded(q))
  }

  test("generate (posexplode over zip_with) and sort fold") {
    def q = spark.range(0, 50).selectExpr("id",
        """posexplode(transform(sequence(1, 3), i -> id * 10 + i)) AS (pos, v)""")
      .orderBy(col("v").desc)
    assert(isFullyLocal(q), optimized(q).toString)
    assert(q.collect().map(_.toString).toSeq == unfolded(q))
  }

  test("outer generate emits null rows for empty generators") {
    def q = spark.range(0, 10).selectExpr("id",
        "explode_outer(CASE WHEN id % 2 = 0 THEN array(id, id+1) ELSE array() END) AS e")
    assert(isFullyLocal(q), optimized(q).toString)
    assert(q.collect().map(_.toString).toSeq == unfolded(q))
  }

  test("unsafe shapes are left distributed but stay correct") {
    // nondeterministic projection cannot fold
    val nd = spark.range(0, 100).select(rand(7).as("r")).agg(count(lit(1)).as("n"))
    assert(!isFullyLocal(nd) || nd.collect().head.getLong(0) == 100L)
    assert(nd.collect().head.getLong(0) == 100L)
    // distinct aggregate is not supported by the interpreter — must bail
    val d = spark.range(0, 100).select((col("id") % 5).as("g"))
      .agg(countDistinct(col("g")).as("n"))
    assert(!isFullyLocal(d), optimized(d).toString)
    assert(d.collect().head.getLong(0) == 5L)
    // over-budget Range keeps the distributed scan
    val big = spark.range(0, 10000000L).agg(count(lit(1)).as("n"))
    assert(!isFullyLocal(big), "10M-row range must not materialize on the driver")
    assert(big.collect().head.getLong(0) == 10000000L)
  }

  test("LocalDim.parquet localizes a tiny dim and memoizes across calls") {
    val path = s"$sf/region.parquet"
    val local = org.apache.spark.sql.graft.LocalDim.parquet(spark, path)
    assert(optimized(local).isInstanceOf[LocalRelation], optimized(local).toString)
    val viaScan = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(local.collect().map(_.toString).sorted.toSeq == viaScan)
    // memoized second read: zero jobs end-to-end (plan is already local)
    assert(countJobs {
      org.apache.spark.sql.graft.LocalDim.parquet(spark, path).collect()
    } == 0)
    // a file larger than the bound falls back to a distributed scan
    val lineitem = org.apache.spark.sql.graft.LocalDim.parquet(
      spark, s"$sf/lineitem.parquet", maxBytes = 1024)
    assert(!optimized(lineitem).isInstanceOf[LocalRelation])
  }

  test("union of local relations folds; join folds inner/cross only") {
    // r14 (VERDICT r13 #8): finish the constant-plan story — a constant
    // probe unioning or joining driver-local relations must not launch a
    // broadcast job
    def u = spark.range(0, 10).select(col("id"))
      .union(spark.range(100, 110).select(col("id")))
      .orderBy(col("id"))
    assert(isFullyLocal(u), optimized(u).toString)
    assert(u.collect().map(_.toString).toSeq == unfolded(u))

    def j = spark.range(0, 20).select(col("id").as("a"))
      .join(spark.range(0, 30).select((col("id") * 2).as("b")),
        col("a") === col("b"))
      .orderBy(col("a"))
    assert(isFullyLocal(j), optimized(j).toString)
    assert(j.collect().map(_.toString).toSeq == unfolded(j))
    assert(countJobs(j.collect()) == 0)

    // outer joins are NOT folded (null-extension semantics stay distributed)
    val lo = spark.range(0, 5).select(col("id").as("a"))
      .join(spark.range(0, 3).select(col("id").as("b")), col("a") === col("b"), "left")
    assert(!isFullyLocal(lo), optimized(lo).toString)
    assert(lo.count() == 5)

    // over-budget product must not fold (the work bound, not output bound)
    val big = spark.range(0, 1000).select(col("id").as("a"))
      .join(spark.range(0, 1000).select(col("id").as("b")), col("a") === col("b"))
    assert(!isFullyLocal(big), "1M-pair nested loop must stay on executors")
  }

  test("dim⋈dim constant probe folds end-to-end: zero jobs") {
    import org.apache.spark.sql.graft.LocalDim
    def q = {
      val r = LocalDim.parquet(spark, s"$sf/region.parquet")
      val n = LocalDim.parquet(spark, s"$sf/nation.parquet")
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }
    assert(isFullyLocal(q), optimized(q).toString)
    assert(q.collect().map(_.toString).toSeq == unfolded(q))
    assert(countJobs(q.collect()) == 0,
      "a folded dim⋈dim probe must not submit jobs (broadcast included)")
  }

  test("prepared constants serve across sessions (session-free LocalRelation)") {
    // r14 (ADVICE): the cache holds only attributes + rows — a SECOND
    // session must be served the same folded result without pinning or
    // leaking the first session, and still at zero jobs
    val first = SparkEntry.queries("q21_unnest_zip")(spark, sf)
      .collect().map(_.toString).toSeq
    val s2 = spark.newSession()
    val viaS2 = SparkEntry.queries("q21_unnest_zip")(s2, sf)
    assert(optimized(viaS2).isInstanceOf[LocalRelation], optimized(viaS2).toString)
    assert(viaS2.collect().map(_.toString).toSeq == first)
    assert(countJobs(viaS2.collect()) == 0)
  }

  test("q21/q22 registry entries fold fully and match their unfolded rows") {
    def q21 = SparkEntry.queries("q21_unnest_zip")(spark, sf)
    def q22 = SparkEntry.queries("q22_generate_series")(spark, sf)
    assert(isFullyLocal(q21), optimized(q21).toString)
    assert(isFullyLocal(q22), optimized(q22).toString)
    // the disabled-fold ground truth must actually plan distributed: the
    // prepared cache is bypassed when the fold conf is off, so unfolded()
    // cannot be served the folded LocalRelation it is meant to check
    spark.conf.set("spark.graft.localFold.enabled", "false")
    try {
      assert(!isFullyLocal(q21), "fold-disabled q21 must plan distributed: " +
        optimized(q21).toString)
      assert(!isFullyLocal(q22), "fold-disabled q22 must plan distributed: " +
        optimized(q22).toString)
    } finally spark.conf.unset("spark.graft.localFold.enabled")
    assert(q21.collect().map(_.toString).toSeq == unfolded(q21))
    assert(q22.collect().map(_.toString).toSeq == unfolded(q22))
    assert(countJobs { q21.collect(); q22.collect() } == 0)
  }
}
