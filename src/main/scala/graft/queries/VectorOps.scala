package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.lake.Meta

/** Embedding similarity-search operators over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * Cross-engine determinism: vectors are quantized to integer milli-units
  * via `floor(x*1000 + 0.5)` — float→double cast, multiply, add, floor are
  * identical IEEE operations in Spark and DuckDB, so dot products and
  * squared norms are EXACT int64 arithmetic; cosine then divides identical
  * doubles. The floor form equals HALF_UP round() on every FLOAT-sourced
  * input (an exact .5 tie needs x·1000 = k+1/2, i.e. a 1/2000 binary
  * fraction — impossible) while skipping Round's per-row-per-ELEMENT
  * BigDecimal: v01 at sf30 measured 6.84 → 3.4 s (PerfLab
  * v01_cur/v01_qfloor, r9), and every v-entry shares the scan.
  *
  * Scale design (100 TB): the brute-force variant is the correctness
  * baseline (query-set × corpus broadcast join); the LSH variant buckets
  * the corpus by sign-random-projection so each query only scans its
  * bucket — the shuffle is keyed by (bucket), not all-pairs.
  */
object VectorOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The bench fixtures ship embeddings as a handful of single-row-group
    * parquet files; an unsplittable scan caps parallelism at the file
    * count (4 tasks on 32 cores — measured 2.3× on v05 at sf100, PerfLab
    * v05_cur/v05_repart). Spread to machine width before the per-row
    * kernels when the scan is narrower than the default parallelism; at
    * production scale file counts exceed cores and this is a no-op. */
  private def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism)
    else df
  }

  /** integer milli-quantization of the float vector */
  private val QVEC =
    "transform(embedding, x -> floor(cast(x as double) * 1000 + 0.5d))"
  private val SQNORM = "graft_vec_dot(q, q)"

  /** Rows whose milli-quantized vector is nonzero — semantically identical
    * to `SQNORM > 0` after quantization (floor(x·1000 + 0.5) ≠ 0 for
    * some element ⟺ |x|·1000 ≥ 0.5, and |x|·1000 = |x·1000| exactly in
    * IEEE), but expressed on the SOURCE column. Filtering on the aliased
    * `nsq` lets PushDownPredicates substitute the whole quantization
    * expression tree into the pushed scan filter and re-compute it per
    * row (the t11/v03 trap, see PLANS.md — on v08 at sf10 this filter
    * alone was 41.5 → 11.3 s, and the whole vector family sped up:
    * v01 4.1 → 2.6 s, v03 6.7 → 4.8 s, v05 3.5 → 2.8 s); this cheap
    * exists() pushes instead. */
  private def nonzeroQ(emb: DataFrame): DataFrame =
    emb.filter(expr("exists(embedding, x -> abs(cast(x as double)) * 1000d >= 0.5d)"))

  // --- LSH hyperplane family (shared by the Spark plan and the oracle) -----
  // 12 tables × 4 sign bits; each hyperplane is SPARSE (±1 on 16 of the 64
  // dims — Achlioptas-style sparse random projection), generated once on the
  // driver. The planes are passed as ONE nested literal array (each entry a
  // signed 1-based dim index: +d means +q[d], -d means -q[d]) — Catalyst
  // constant-folds it to a single Literal node, so the plan tree stays tiny
  // (an earlier fully-expanded ±q[d] chain cost ~9 s of one-time
  // optimizer + janino work). Both the Spark expression and the DuckDB
  // oracle SQL are printed from the same in-memory constants, so
  // cross-engine agreement holds by construction.
  /** name of the kNN-LSH observation carrying bucket-cap metrics (same
    * (capped_buckets, dropped_members) contract as TextOps.LshCapMetrics) */
  val LshCapMetrics = "vec_lsh_caps"

  private val N_TABLES = 12
  private val BITS_PER_TABLE = 4

  /** deterministic sparse hyperplane family; plane h is seeded 9000+h so a
    * larger family extends a smaller one prefix-wise */
  private[queries] def planesFor(n: Int): IndexedSeq[Seq[Int]] =
    (0 until n).map { h =>
      val rnd = new scala.util.Random(9000 + h)
      val dims = rnd.shuffle((1 to 64).toList).take(16).sorted
      dims.map(d => if (rnd.nextBoolean()) d else -d)
    }

  private[queries] val planes: IndexedSeq[Seq[Int]] = planesFor(N_TABLES * BITS_PER_TABLE)

  /** a plane family as a nested array literal, `array(...)`/`[...]` style */
  private def planesLitOf(pl: IndexedSeq[Seq[Int]], open: String, close: String): String =
    pl.map(_.mkString(open, ", ", close)).mkString(open, ", ", close)

  private def planesLit(open: String, close: String): String = planesLitOf(planes, open, close)

  /** array<int> of the sign bits of `q` (bigint vector column) — the
    * codegen'd [[graft.functions.LshBits]] expression; the once-per-row
    * signature build is the dominant LSH indexing cost at corpus scale */
  private def bitsExpr(lit: String): String =
    s"graft_lsh_bits(q, $lit)"

  /** array<int> of per-table bucket ids from a `bits` column */
  private def bucketsFromBitsFor(nTables: Int, bits: Int): String =
    (0 until nTables).map { tb =>
      (0 until bits).map { j =>
        s"element_at(bits, ${tb * bits + j + 1}) * ${1 << (bits - 1 - j)}"
      }.mkString(" + ")
    }.mkString("array(", ", ", ")")

  private val bucketsFromBits: String = bucketsFromBitsFor(N_TABLES, BITS_PER_TABLE)

  private val candCmp =
    """(l, r) -> CASE
      |  WHEN cast(l.dot as double) / (sqrt(cast(l.na as double)) * sqrt(cast(l.nb as double)))
      |     > cast(r.dot as double) / (sqrt(cast(r.na as double)) * sqrt(cast(r.nb as double))) THEN -1
      |  WHEN cast(l.dot as double) / (sqrt(cast(l.na as double)) * sqrt(cast(l.nb as double)))
      |     < cast(r.dot as double) / (sqrt(cast(r.na as double)) * sqrt(cast(r.nb as double))) THEN 1
      |  WHEN l.neighbor_id < r.neighbor_id THEN -1
      |  WHEN l.neighbor_id > r.neighbor_id THEN 1 ELSE 0 END""".stripMargin

  /** Parameterized multi-table sign-LSH top-k ANN over an embeddings
    * DataFrame (vec_id BIGINT, embedding ARRAY<FLOAT>): the scale knobs
    * (tables × bits, bucket cap) tune the recall/candidate trade-off to the
    * corpus — more bits for bigger corpora. Used by the v03 query entry
    * (12×4 for the tiny near-random test corpus) and by the crossover
    * benchmark spec (8×8 on a 30k clustered corpus). */
  def knnLsh(emb: DataFrame, nTables: Int = N_TABLES,
      bitsPerTable: Int = BITS_PER_TABLE, bucketCap: Int = 512,
      nQueries: Int = 10, topK: Int = 5,
      carryPayload: Boolean = true): DataFrame = {
    val pl = planesFor(nTables * bitsPerTable)
    // NOTE: `bits` stays a materialized column and the (cheap) per-table
    // bucket packing is inlined into each branch's posexplode — aliasing the
    // bucket array in its own projection lets the optimizer substitute it
    // into the generator, which re-expands the 48-plane bits computation
    // once per element_at reference (a measured 30× blowup).
    val bucketsExpr = bucketsFromBitsFor(nTables, bitsPerTable)
    val e = nonzeroQ(emb)
      .selectExpr("vec_id", s"$QVEC AS q")
      .selectExpr("vec_id", "q", s"$SQNORM AS nsq",
        s"${bitsExpr(planesLitOf(pl, "array(", ")"))} AS bits")

    val scoredCands: DataFrame = if (carryPayload) {
      // small-corpus shape: vectors travel WITH their bucket row, scoring is
      // bucket-local, zero joins. Shuffle volume = nTables × corpus payload,
      // so use this only when the per-row payload is cheap vs join overhead.
      e.selectExpr("vec_id", "q", "nsq", s"posexplode($bucketsExpr) AS (tab, bucket)")
        .groupBy("tab", "bucket")
        .agg(collect_list(struct(col("vec_id"), col("q"), col("nsq"))).as("ms"))
        .observe(VectorOps.LshCapMetrics,
          sum(when(size(col("ms")) > bucketCap, 1L).otherwise(0L)).as("capped_buckets"),
          sum(when(size(col("ms")) > bucketCap, size(col("ms")).cast("long"))
            .otherwise(0L)).as("dropped_members"))
        .filter(expr(s"graft_cap_gate(size(ms), $bucketCap, '${VectorOps.LshCapMetrics}')")
          && size(col("ms")) >= 2)
        .selectExpr(s"filter(ms, m -> m.vec_id < $nQueries) AS qs", "ms")
        .filter(size(col("qs")) > 0)
        .selectExpr(
          // per (query, bucket): score members and keep only the in-bucket
          // top-k — any GLOBAL top-k neighbor of q is in the top-k of every
          // bucket containing it, so merging per-bucket top-ks is exact
          s"""explode(flatten(transform(qs, a ->
             |  slice(array_sort(transform(filter(ms, m -> m.vec_id != a.vec_id), m ->
             |    struct(a.vec_id AS query_id, m.vec_id AS neighbor_id,
             |      graft_vec_dot(a.q, m.q) AS dot,
             |      a.nsq AS na, m.nsq AS nb)),
             |    $candCmp), 1, $topK)))) AS p""".stripMargin)
        .select(col("p.query_id").as("query_id"),
          struct(col("p.neighbor_id").as("neighbor_id"), col("p.dot").as("dot"),
            col("p.na").as("na"), col("p.nb").as("nb")).as("cand"))
    } else {
      // scale shape: buckets carry ONLY ids — shuffle volume is O(nTables ×
      // ids); candidate pairs re-join the (persisted) vectors, query side
      // broadcast. This is the 100 TB path: nothing all-pairs, the big
      // payload moves once per CANDIDATE, not once per (table, row).
      val ep = CacheScope.track(e)
      val cand = candidateStage(ep, bucketsExpr, bucketCap, nQueries)
      val qv = ep.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
      val cv = ep.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("nsq").as("nb"))
      cand.join(broadcast(qv), Seq("query_id")).join(cv, Seq("neighbor_id"))
        .withColumn("dot",
          expr("graft_vec_dot(qa, qb)"))
        .select(col("query_id"),
          struct(col("neighbor_id"), col("dot"), col("na"), col("nb")).as("cand"))
    }

    scoredCands
      .groupBy("query_id")
      .agg(collect_set(col("cand")).as("cands"))
      .selectExpr("query_id",
        s"posexplode(slice(array_sort(cands, $candCmp), 1, $topK)) AS (pos, c)")
      .selectExpr("query_id", "cast(pos + 1 as bigint) AS rank",
        "c.neighbor_id AS neighbor_id",
        "cast(c.dot as double) / (sqrt(cast(c.na as double)) * sqrt(cast(c.nb as double))) AS cosine")
      .orderBy(col("query_id"), col("rank"))
  }

  /** the distinct (query_id, neighbor_id) pairs LSH bucketing selects for
    * scoring — the stage whose row count IS the work/recall trade-off */
  private def candidateStage(ep: DataFrame, bucketsExpr: String,
      bucketCap: Int, nQueries: Int): DataFrame =
    ep.selectExpr("vec_id", s"posexplode($bucketsExpr) AS (tab, bucket)")
      .groupBy("tab", "bucket")
      .agg(sort_array(collect_list(col("vec_id"))).as("ms"))
      // dropped-bucket observability — same metric contract as TextOps t11;
      // the gate's accumulators survive AQE re-planning (observe() doesn't)
      .observe(VectorOps.LshCapMetrics,
        sum(when(size(col("ms")) > bucketCap, 1L).otherwise(0L)).as("capped_buckets"),
        sum(when(size(col("ms")) > bucketCap, size(col("ms")).cast("long"))
          .otherwise(0L)).as("dropped_members"))
      .filter(expr(s"graft_cap_gate(size(ms), $bucketCap, '${VectorOps.LshCapMetrics}')")
        && size(col("ms")) >= 2)
      .selectExpr(s"filter(ms, m -> m < $nQueries) AS qs", "ms")
      .filter(size(col("qs")) > 0)
      .selectExpr(
        """explode(flatten(transform(qs, a ->
          |  transform(ms, m -> struct(a AS query_id, m AS neighbor_id))))) AS p""".stripMargin)
      .select(col("p.query_id").as("query_id"), col("p.neighbor_id").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()

  /** candidate pairs for an embeddings DataFrame (test/diagnostic surface:
    * `count()` of this vs `nQueries × (corpus-1)` measures how much scoring
    * work LSH pruning saves over brute force at a given recall). */
  def lshCandidates(emb: DataFrame, nTables: Int = N_TABLES,
      bitsPerTable: Int = BITS_PER_TABLE, bucketCap: Int = 512,
      nQueries: Int = 10): DataFrame = {
    val pl = planesFor(nTables * bitsPerTable)
    val e = nonzeroQ(emb)
      .selectExpr("vec_id", s"$QVEC AS q")
      .selectExpr("vec_id", "q", s"$SQNORM AS nsq",
        s"${bitsExpr(planesLitOf(pl, "array(", ")"))} AS bits")
    candidateStage(e, bucketsFromBitsFor(nTables, bitsPerTable), bucketCap, nQueries)
  }

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Exact, embarrassingly parallel (query side broadcast, corpus side
    * partition-local), and O(nQueries × corpus) work — the correctness
    * baseline LSH is measured against, and the better plan when the query
    * batch is small (a handful of probes never amortizes building
    * signatures for the whole corpus). */
  def knnBrute(emb: DataFrame, nQueries: Int = 10, topK: Int = 5): DataFrame = {
    val e = nonzeroQ(emb)
      .selectExpr("vec_id", s"$QVEC AS q")
      .selectExpr("vec_id", "q", s"$SQNORM AS nsq")
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
      col("nsq").as("nb"))
    val rnk = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        expr("graft_vec_dot(qa, qb)"))
      .withColumn("cosine", col("dot").cast("double")
        / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .withColumn("rank", row_number().over(rnk).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --- IVF (inverted-file) ANN constants — the second scale path next to
  // LSH. Deterministic seeded centroids (quantized to the same int64
  // milli-units as the vectors) are shared between the Spark plan and the
  // DuckDB oracle, so assignment and probing agree exactly cross-engine.
  private val IVF_K = 16
  private val IVF_NPROBE = 4

  private[queries] val ivfCentroids: IndexedSeq[Seq[Long]] =
    (0 until IVF_K).map { c =>
      val rnd = new scala.util.Random(7100 + c)
      Seq.fill(64)(math.round(rnd.nextGaussian() * 1000))
    }

  /** centroid family literal; `suffix` renders int64 elements ("L" for
    * Spark SQL, "" for DuckDB) */
  private def centroidsLit(open: String, close: String, suffix: String): String =
    ivfCentroids.map(_.map(v => s"$v$suffix").mkString(open, ", ", close))
      .mkString(open, ", ", close)

  /** IVF top-k ANN: assign every vector to its argmax-dot centroid (one
    * pass, codegen'd dots), probe each query's top-`nprobe` clusters, and
    * score exactly within the probed inverted lists.
    *
    * Scale shape (100 TB): the corpus is PARTITIONED BY CLUSTER at index
    * time, so a query batch touches nprobe/K of the data — candidate
    * volume is bounded by cluster sizes, the query side broadcasts, and
    * nothing is all-pairs. Versus LSH: IVF gives contiguous
    * cluster-pruned scans (better locality, natural partition pruning if
    * the table is partitioned by `cl`), LSH gives finer per-row buckets;
    * both are served by the same codegen'd dot kernel. */
  def knnIvf(emb: DataFrame, nQueries: Int = 10, topK: Int = 5,
      nprobe: Int = IVF_NPROBE): DataFrame = {
    val cents = centroidsLit("array(", ")", "L")
    val e = nonzeroQ(emb)
      .selectExpr("vec_id", s"$QVEC AS q")
      .selectExpr("vec_id", "q", s"$SQNORM AS nsq")
      .selectExpr("vec_id", "q", "nsq",
        s"transform($cents, c -> graft_vec_dot(q, c)) AS ds")
      .selectExpr("vec_id", "q", "nsq", "ds",
        "array_position(ds, array_max(ds)) AS cl")
      // persist the assignment: three consumers branch off (query probes,
      // the probe-set collect, the corpus side) and without materialization
      // each re-runs the K-centroid dot sweep over the whole corpus —
      // worse, CollapseProject re-inlines `ds` into every reference
      // (measured 4× at 2M vectors; the v06 re-evaluation trap).
      // uses = 2: the probe-set collect below consumes it once, the
      // caller's action is the second (and last) consumer
      .transform(CacheScope.track(_, uses = 2))
    val qs = e.filter(col("vec_id") < nQueries).selectExpr(
      "vec_id AS query_id", "q AS qa", "nsq AS na",
      // top-nprobe clusters by dot desc, index asc on ties — the struct
      // sort is lexicographic (-dot, index) in Spark and DuckDB alike
      s"""slice(transform(array_sort(
         |  zip_with(ds, sequence(1L, ${IVF_K}L), (d, i) -> struct(-d AS nd, i AS i))),
         |  s -> s.i), 1, $nprobe) AS probes""".stripMargin)
    // pre-filter the corpus to the query batch's probe-cluster union BEFORE
    // the nested-loop probe join — the broadcast join's array_contains
    // condition can't prune the scan by itself, so without this every
    // vector is tested against every query (measured 4× slower at 2M
    // vectors). Driver-side collect is O(queries × nprobe) ids.
    val probeSet = qs.selectExpr("explode(probes) AS c").distinct()
      .collect().map(_.getLong(0))
    val cv = e.filter(col("cl").isin(probeSet.toIndexedSeq: _*))
      .selectExpr("vec_id AS neighbor_id", "q AS qb", "nsq AS nb", "cl")
    val rnk = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cv.join(broadcast(qs),
        expr("array_contains(probes, cl)") && col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_vec_dot(qa, qb)"))
      .withColumn("cosine", col("dot").cast("double")
        / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .withColumn("rank", row_number().over(rnk).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (the v04 operator, parameterized
    * for the equality spec). Both paths produce identical results from the
    * identical capped buckets:
    *   - carryPayload=true (small corpus): vectors travel with their bucket
    *     rows; in-bucket pair scoring is join-free.
    *   - carryPayload=false (the 100 TB shape, VERDICT r5 #4): the 12-table
    *     banding shuffle carries ONLY vec_ids — with 1-4 KB embeddings the
    *     payload-through-shuffle width is the scale bottleneck — and the
    *     candidate pairs re-join the persisted vectors by id, moving each
    *     payload once per CANDIDATE instead of once per (table, row). */
  def embeddingNearDup(emb: DataFrame, carryPayload: Boolean,
      threshold: Double = 0.35): DataFrame = {
    val nT = 12; val bits = 8
    val pl = planesFor(nT * bits)
    val bucketsExpr = bucketsFromBitsFor(nT, bits)
    val e = nonzeroQ(emb)
      .selectExpr("vec_id", s"$QVEC AS q")
      .selectExpr("vec_id", "q", s"$SQNORM AS nsq",
        s"${bitsExpr(planesLitOf(pl, "array(", ")"))} AS bits")
    val scored: DataFrame = if (carryPayload) {
      e.selectExpr("vec_id", "q", "nsq",
          s"posexplode($bucketsExpr) AS (tab, bucket)")
        .groupBy("tab", "bucket")
        .agg(sort_array(collect_list(struct(col("vec_id"), col("q"), col("nsq")))).as("ms"))
        .observe("v04_lsh_caps",
          sum(when(size(col("ms")) > 256, 1L).otherwise(0L)).as("capped_buckets"),
          sum(when(size(col("ms")) > 256, size(col("ms")).cast("long"))
            .otherwise(0L)).as("dropped_members"))
        .filter(expr("graft_cap_gate(size(ms), 256, 'v04_lsh_caps')")
          && size(col("ms")) >= 2)
        .selectExpr(
          """explode(flatten(transform(ms, (a, i) ->
            |  transform(slice(ms, i + 2, size(ms)), m ->
            |    struct(a.vec_id AS vec_a, m.vec_id AS vec_b,
            |      graft_vec_dot(a.q, m.q) AS dot,
            |      a.nsq AS na, m.nsq AS nb))))) AS p""".stripMargin)
        .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
          (col("p.dot").cast("double")
            / (sqrt(col("p.na").cast("double")) * sqrt(col("p.nb").cast("double")))).as("cosine"))
    } else {
      val ep = CacheScope.track(e)
      val pairs = ep.selectExpr("vec_id", s"posexplode($bucketsExpr) AS (tab, bucket)")
        .groupBy("tab", "bucket")
        .agg(sort_array(collect_list(col("vec_id"))).as("ms"))
        .observe("v04_lsh_caps",
          sum(when(size(col("ms")) > 256, 1L).otherwise(0L)).as("capped_buckets"),
          sum(when(size(col("ms")) > 256, size(col("ms")).cast("long"))
            .otherwise(0L)).as("dropped_members"))
        .filter(expr("graft_cap_gate(size(ms), 256, 'v04_lsh_caps')")
          && size(col("ms")) >= 2)
        .selectExpr(
          """explode(flatten(transform(ms, (a, i) ->
            |  transform(slice(ms, i + 2, size(ms)), m ->
            |    struct(a AS vec_a, m AS vec_b))))) AS p""".stripMargin)
        .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"))
        .distinct()
      val va = ep.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nsq").as("na"))
      val vb = ep.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nsq").as("nb"))
      pairs.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (expr("graft_vec_dot(qa, qb)").cast("double")
            / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cosine"))
    }
    scored
      .filter(col("cosine") >= threshold)
      .distinct()
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- brute-force cosine top-k (correctness baseline) -------------------
    "v01_knn_brute" -> ((s, dir) => knnBrute(spread(t(s, dir, "embeddings")))),

    // ---- IVF ANN (centroid inverted lists, cluster-pruned probe) ----------
    "v05_knn_ivf" -> ((s, dir) => knnIvf(spread(t(s, dir, "embeddings")))),

    // ---- IVF over the PRODUCTION layout: a lake table hidden-partitioned
    // by cluster. Index build = assign centroids and store the quantized
    // vectors partitioned by `cl`; probe = the query batch's probe-cluster
    // set becomes a pushed `cl IN (...)` filter, which the lake's
    // hidden-partition pruning turns into FILE pruning — at 100 TB the
    // probe physically reads nprobe/K of the index, the at-scale claim
    // v05's doc makes, demonstrated end to end. Results are identical to
    // v05 (same assignment, same probes, same exact re-rank). ------------
    "v07_ivf_partitioned" -> ((s, dir) => {
      val lake = LakeQueries.freshLake(s)
      val cents = centroidsLit("array(", ")", "L")
      val indexed = nonzeroQ(spread(t(s, dir, "embeddings")))
        .selectExpr("vec_id", s"$QVEC AS q")
        .selectExpr("vec_id", "q", s"$SQNORM AS nsq")
        .selectExpr("vec_id", "q", "nsq",
          s"array_position(transform($cents, c -> graft_vec_dot(q, c)), " +
            s"array_max(transform($cents, c -> graft_vec_dot(q, c)))) AS cl")
      lake.createTable("main.ivf", indexed.schema,
        partitionKeys = List(Meta.PartitionKey("identity", "cl")))
      lake.append("main.ivf", indexed)

      val stored = lake.table("main.ivf")
      val qs = stored.filter(col("vec_id") < 10)
        .selectExpr("vec_id", "q", "nsq",
          s"transform($cents, c -> graft_vec_dot(q, c)) AS ds")
        .selectExpr("vec_id AS query_id", "q AS qa", "nsq AS na",
          s"""slice(transform(array_sort(
             |  zip_with(ds, sequence(1L, ${IVF_K}L), (d, i) -> struct(-d AS nd, i AS i))),
             |  s -> s.i), 1, $IVF_NPROBE) AS probes""".stripMargin)
      // the query batch's union of probe clusters — O(queries × nprobe)
      // driver-side, the partition-pruning predicate of the index scan
      val probeSet = qs.selectExpr("explode(probes) AS c").distinct()
        .collect().map(_.getLong(0))
      val cand = stored.filter(col("cl").isin(probeSet.toIndexedSeq: _*))
        .selectExpr("vec_id AS neighbor_id", "q AS qb", "nsq AS nb", "cl")
      val rnk = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cand.join(broadcast(qs),
          expr("array_contains(probes, cl)") && col("query_id") =!= col("neighbor_id"))
        .withColumn("dot", expr("graft_vec_dot(qa, qb)"))
        .withColumn("cosine", col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rank", row_number().over(rnk).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- LSH-bucketed ANN (sign random projection, the 100 TB scale path) --
    // Multi-table LSH: 12 tables × 4 sign bits from the precomputed sparse
    // hyperplane family above. The whole probe is TWO keyed shuffles:
    //   1. groupBy (table, bucket): collect each bucket's members (with
    //      vector payload), capped at 512 so a hot bucket can never go
    //      quadratic; buckets containing a query score query × member
    //      cosines bucket-locally (exact int64 dot via the codegen'd
    //      graft_vec_dot expression - no per-pair array allocation).
    //   2. groupBy query_id: collect_set dedups candidates seen in several
    //      tables, then an array_sort comparator takes the top-5 — no
    //      window, no self-join, no broadcast build.
    // Nothing is ever all-pairs. On clustered real-world embeddings the
    // near-neighbor collision rate far exceeds the random-pair rate, so the
    // candidate fraction shrinks as the corpus grows; on this synthetic
    // near-random data 12×4 still reaches recall ≥ 0.8 (QueriesSpec).
    // payload-vs-id-only chosen from corpus stats (metadata-only): small
    // corpora ship vectors with their bucket rows (zero joins); big ones
    // ship ids only and re-join candidates — 12 tables × a big payload
    // through the explode shuffle is the thing that doesn't scale. Both
    // paths produce the identical exact top-k given the same candidates.
    "v03_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val small = emb.queryExecution.optimizedPlan.stats.sizeInBytes < 16L * 1024 * 1024
      knnLsh(spread(emb), carryPayload = small)
    }),

    // ---- embedding-cosine near-duplicate pairs (dedup modality) ------------
    // All-pairs-free near-dup mining over vectors: 12 tables × 8 sign bits
    // (256 buckets/table — finer than the ANN probe because BOTH sides of a
    // pair must co-bucket), candidate pairs only within a bucket (capped),
    // exact int64 cosine re-rank, threshold filter. For true near-dups
    // (cos ≥ 0.9) the 12×8 family catches ≈98%; the 0.35 threshold makes
    // the output non-empty on this synthetic near-random corpus.
    // payload-vs-id-only chosen from corpus stats like v03: big corpora
    // must not ship the full vector through the 12-table banding shuffle.
    "v04_embedding_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val small = emb.queryExecution.optimizedPlan.stats.sizeInBytes < 16L * 1024 * 1024
      embeddingNearDup(spread(emb), carryPayload = small)
    }),

    // ---- per-label corpus stats --------------------------------------------
    // ---- int8 quantization (storage compression for training corpora) ----
    // Per-vector symmetric quantization: scale = max |x|, q = floor(x*127/
    // scale + 0.5). floor(x+0.5) instead of round() because the two engines
    // disagree on round-half modes; all math in float64 so both compute
    // bit-identical values. `mx` is referenced twice (lambda + scale
    // output), which keeps CollapseProject from inlining the array_max into
    // the lambda body — inlined it would re-evaluate per ELEMENT (the v03
    // generator-substitution trap, see PLANS.md).
    "v06_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
        .selectExpr("vec_id", "e",
          "greatest(array_max(transform(e, x -> abs(x))), 1e-30d) AS mx")
        .selectExpr("vec_id",
          "cast(floor(mx * 1000000 + 0.5d) as bigint) AS scale_ppm",
          "concat_ws('|', transform(e, x -> cast(cast(floor(x * 127.0d / mx + 0.5d) as bigint) as string))) AS q8")
        .orderBy(col("vec_id"))
        .limit(300)
    }),

    // ---- two-stage quantized scan + exact re-rank --------------------------
    // The production ANN memory-bandwidth shape: stage 1 scans the int8
    // codes (v06's exact quantization scheme — at scale ¼ the bytes of the
    // float corpus, SIMD int dot products) and keeps the top-C=50
    // candidates per query by QUANTIZED cosine (scales cancel in cosine,
    // so ranking needs only the integer code dot and code norms); stage 2
    // re-fetches ONLY those Q×C rows by vec_id — point lookups against
    // the full-precision corpus, not a second scan — and re-ranks exactly.
    // The rank <= C filter plans a map-side WindowGroupLimit, so the
    // stage-1 exchange carries O(tasks·Q·C) rows regardless of corpus
    // size. Recall vs v01 asserted in QueriesSpec. Both stages take the
    // corpus from the one nonzeroQ precondition (nsq > 0 makes the int8
    // max code 127, so code-norm positivity is implied — the oracle
    // filters the same way).
    "v08_quantized_rerank" -> ((s, dir) => {
      val emb = nonzeroQ(spread(t(s, dir, "embeddings")))
      // ONE corpus pass computes both representations — the int8 code
      // (stage 1 ranks on it) and the exact milli-quantized vector
      // (stage 2 needs it). Carrying the exact payload through stage 1
      // is free: the map-side WindowGroupLimit caps the exchange at
      // tasks·Q·C rows, so the wide rows never ship corpus-sized.
      // The int8 code is the codegen'd [[graft.functions.Int8Code]] (one
      // primitive two-pass loop, bit-identical to the lambda formulation
      // the oracle mirrors) — the interpreted transform/array_max chain
      // it replaces kept the whole coarse scan outside whole-stage
      // codegen and dominated the runtime (11.9 s with lambdas at sf10).
      val base = emb
        .selectExpr("vec_id", "embedding", s"$QVEC AS q")
        .selectExpr("vec_id", "q", s"$SQNORM AS nsq",
          "graft_int8_code(embedding) AS c8")
        .selectExpr("vec_id", "q", "nsq", "c8",
          "graft_vec_dot(c8, c8) AS n8")
      val qcodes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("c8").as("qa8"),
          col("n8").as("na8"), col("q").as("qa"), col("nsq").as("na"))
      val w1 = Window.partitionBy(col("query_id"))
        .orderBy(col("acos").desc, col("neighbor_id"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      base
        .select(col("vec_id").as("neighbor_id"), col("c8").as("nb8"),
          col("n8").as("nb8n"), col("q").as("qb"), col("nsq").as("nb"))
        .join(broadcast(qcodes), col("query_id") =!= col("neighbor_id"))
        .withColumn("acos", expr("graft_vec_dot(qa8, nb8)").cast("double")
          / (sqrt(col("na8").cast("double")) * sqrt(col("nb8n").cast("double"))))
        .withColumn("crank", row_number().over(w1))
        .filter(col("crank") <= 50)
        .withColumn("cosine", expr("graft_vec_dot(qa, qb)").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rank", row_number().over(w2).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "v02_label_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .selectExpr("label", s"$QVEC AS q")
        .selectExpr("label", s"$SQNORM AS nsq")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("nsq")).cast("string").cast("double").as("total_sqnorm"),
          (sum(col("nsq")).cast("string").cast("double") / count(lit(1)))
            .as("avg_sqnorm"))
        .orderBy(col("label"))
    })
  )

  def oracleSql: Map[String, String] = {
    val qvecD =
      "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
    val base = Map(
      "v01_knn_brute" ->
        s"""WITH e AS (
           |  SELECT vec_id, $qvecD AS q FROM embeddings
           |), n AS (
           |  SELECT vec_id, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq
           |  FROM e
           |), pairs AS (
           |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |    CAST(list_sum(list_transform(generate_series(1, len(a.q)),
           |      i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
           |    a.nsq AS na, b.nsq AS nb
           |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
           |  WHERE a.vec_id < 10 AND a.nsq > 0 AND b.nsq > 0
           |)
           |SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT query_id, neighbor_id,
           |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           |      CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
           |      neighbor_id) AS BIGINT) AS rank
           |  FROM pairs) t
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "v05_knn_ivf" -> {
        val centsD = centroidsLit("[", "]", "")
        s"""WITH e0 AS (
           |  SELECT vec_id, $qvecD AS q FROM embeddings
           |), n AS (
           |  SELECT vec_id, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq
           |  FROM e0
           |), a AS (
           |  SELECT vec_id, q, nsq,
           |    list_transform($centsD, c ->
           |      CAST(list_sum(list_transform(generate_series(1, len(q)),
           |        i -> q[i] * c[i])) AS BIGINT)) AS ds
           |  FROM n WHERE nsq > 0
           |), b AS (
           |  SELECT vec_id, q, nsq, ds,
           |    CAST(list_position(ds, list_max(ds)) AS BIGINT) AS cl
           |  FROM a
           |), qs AS (
           |  SELECT vec_id AS query_id, q AS qa, nsq AS na,
           |    list_transform(list_sort(list_transform(generate_series(1, $IVF_K),
           |      i -> {'nd': -ds[i], 'i': CAST(i AS BIGINT)})), s -> s.i)[1:$IVF_NPROBE] AS probes
           |  FROM b WHERE vec_id < 10
           |), cand AS (
           |  SELECT qs.query_id, b.vec_id AS neighbor_id,
           |    CAST(list_sum(list_transform(generate_series(1, len(qs.qa)),
           |      i -> qs.qa[i] * b.q[i])) AS BIGINT) AS dot,
           |    qs.na AS na, b.nsq AS nb
           |  FROM qs JOIN b ON list_contains(qs.probes, b.cl)
           |    AND b.vec_id <> qs.query_id
           |)
           |SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT query_id, neighbor_id,
           |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           |      CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
           |      neighbor_id) AS BIGINT) AS rank
           |  FROM cand) t
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      },

      "v03_knn_lsh" -> {
        val bitsD =
          s"""list_transform(${planesLit("[", "]")}, p -> CASE WHEN
             |  list_sum(list_transform(p, t ->
             |    CASE WHEN t > 0 THEN q[t] ELSE -q[-t] END)) >= 0
             |  THEN 1 ELSE 0 END)""".stripMargin
        val bucketsD = (0 until N_TABLES).map { tb =>
          (0 until BITS_PER_TABLE).map { j =>
            s"bits[${tb * BITS_PER_TABLE + j + 1}] * ${1 << (BITS_PER_TABLE - 1 - j)}"
          }.mkString(" + ")
        }.mkString("[", ", ", "]")
        val dotD =
          "list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i]))"
        s"""WITH e0 AS (
           |  SELECT vec_id, $qvecD AS q FROM embeddings
           |), e1 AS (
           |  SELECT vec_id, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq,
           |    $bitsD AS bits
           |  FROM e0
           |), e AS (
           |  SELECT vec_id, q, nsq, $bucketsD AS buckets FROM e1
           |), ee AS (SELECT * FROM e WHERE nsq > 0
           |), tabs AS (
           |  SELECT vec_id, r.range AS tab, buckets[r.range + 1] AS bucket
           |  FROM ee CROSS JOIN range(0, $N_TABLES) r
           |), capped AS (
           |  SELECT vec_id, tab, bucket FROM tabs
           |  QUALIFY count(*) OVER (PARTITION BY tab, bucket) <= 512
           |), cand AS (
           |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           |  FROM capped q JOIN capped c ON q.tab = c.tab AND q.bucket = c.bucket
           |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
           |), pairs AS (
           |  SELECT query_id, neighbor_id,
           |    CAST($dotD AS BIGINT) AS dot,
           |    a.nsq AS na, b.nsq AS nb
           |  FROM cand JOIN ee a ON query_id = a.vec_id JOIN ee b ON neighbor_id = b.vec_id
           |)
           |SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT query_id, neighbor_id,
           |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           |      CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
           |      neighbor_id) AS BIGINT) AS rank
           |  FROM pairs) t
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      },

      "v02_label_stats" ->
        s"""SELECT label, COUNT(*) AS n_vectors,
           |  CAST(CAST(SUM(nsq) AS VARCHAR) AS DOUBLE) AS total_sqnorm,
           |  CAST(CAST(SUM(nsq) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_sqnorm
           |FROM (SELECT label,
           |    CAST(list_sum(list_transform($qvecD, x -> x * x)) AS BIGINT) AS nsq
           |  FROM embeddings) t
           |GROUP BY label ORDER BY label""".stripMargin,

      "v06_quantize" ->
        """SELECT vec_id,
          |  CAST(floor(mx * 1000000 + 0.5) AS BIGINT) AS scale_ppm,
          |  array_to_string(list_transform(e,
          |    x -> CAST(CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT) AS VARCHAR)), '|') AS q8
          |FROM (
          |  SELECT vec_id, e,
          |    greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) AS mx
          |  FROM (SELECT vec_id,
          |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          |    FROM embeddings) a) b
          |ORDER BY vec_id LIMIT 300""".stripMargin,

      "v04_embedding_neardup" -> {
        val nT = 12; val bits = 8
        val pl = planesFor(nT * bits)
        val bitsD =
          s"""list_transform(${planesLitOf(pl, "[", "]")}, p -> CASE WHEN
             |  list_sum(list_transform(p, t ->
             |    CASE WHEN t > 0 THEN q[t] ELSE -q[-t] END)) >= 0
             |  THEN 1 ELSE 0 END)""".stripMargin
        val bucketsD = (0 until nT).map { tb =>
          (0 until bits).map { j =>
            s"bits[${tb * bits + j + 1}] * ${1 << (bits - 1 - j)}"
          }.mkString(" + ")
        }.mkString("[", ", ", "]")
        s"""WITH e0 AS (
           |  SELECT vec_id, $qvecD AS q FROM embeddings
           |), e1 AS (
           |  SELECT vec_id, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq,
           |    $bitsD AS bits
           |  FROM e0
           |), e AS (
           |  SELECT vec_id, q, nsq, $bucketsD AS buckets FROM e1 WHERE nsq > 0
           |), tabs AS (
           |  SELECT vec_id, q, nsq, r.range AS tab, buckets[r.range + 1] AS bucket
           |  FROM e CROSS JOIN range(0, $nT) r
           |), capped AS (
           |  SELECT * FROM tabs
           |  QUALIFY count(*) OVER (PARTITION BY tab, bucket) <= 256
           |), pairs AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |    CAST(list_sum(list_transform(generate_series(1, len(a.q)),
           |      i -> a.q[i] * b.q[i])) AS DOUBLE)
           |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
           |  FROM capped a JOIN capped b
           |    ON a.tab = b.tab AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           |)
           |SELECT vec_a, vec_b, cosine FROM pairs
           |WHERE cosine >= 0.35
           |ORDER BY cosine DESC, vec_a, vec_b LIMIT 100""".stripMargin
      },

      "v08_quantized_rerank" ->
        s"""WITH eq AS (
           |  SELECT vec_id, embedding, $qvecD AS q FROM embeddings
           |), en AS (
           |  SELECT vec_id, embedding, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq
           |  FROM eq
           |), ee AS (SELECT * FROM en WHERE nsq > 0
           |), e0 AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM ee
           |), m AS (
           |  SELECT vec_id, e,
           |    greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) AS mx
           |  FROM e0
           |), codes AS (
           |  SELECT vec_id,
           |    list_transform(e, x -> CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT)) AS c8
           |  FROM m
           |), n8 AS (
           |  SELECT vec_id, c8,
           |    CAST(list_sum(list_transform(c8, x -> x * x)) AS BIGINT) AS n8
           |  FROM codes
           |), stage1 AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
           |        CAST(CAST(list_sum(list_transform(generate_series(1, len(a.c8)),
           |          i -> a.c8[i] * b.c8[i])) AS BIGINT) AS DOUBLE)
           |        / (sqrt(CAST(a.n8 AS DOUBLE)) * sqrt(CAST(b.n8 AS DOUBLE))) DESC,
           |        b.vec_id) AS crank
           |    FROM n8 a JOIN n8 b ON a.vec_id <> b.vec_id
           |    WHERE a.vec_id < 10) t
           |  WHERE crank <= 50
           |), pairs AS (
           |  SELECT query_id, neighbor_id,
           |    CAST(list_sum(list_transform(generate_series(1, len(a.q)),
           |      i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
           |    a.nsq AS na, b.nsq AS nb
           |  FROM stage1 JOIN ee a ON query_id = a.vec_id
           |    JOIN ee b ON neighbor_id = b.vec_id
           |)
           |SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT query_id, neighbor_id,
           |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           |      CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
           |      neighbor_id) AS BIGINT) AS rank
           |  FROM pairs) t
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    )
    // v07 stores the same assignment in a cluster-partitioned lake table
    // and probes it with file pruning — the RESULT is identical to v05,
    // so the oracle is shared
    base + ("v07_ivf_partitioned" -> base("v05_knn_ivf"))
  }
}
