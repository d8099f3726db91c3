package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity-search operators over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * Cross-engine determinism: vectors are quantized to integer milli-units
  * (round(x*1000) — float→double cast and rounding are identical IEEE
  * operations in Spark and DuckDB), so dot products and squared norms are
  * EXACT int64 arithmetic; cosine then divides identical doubles.
  *
  * Scale design (100 TB): the brute-force variant is the correctness
  * baseline (query-set × corpus broadcast join); the LSH variant buckets
  * the corpus by sign-random-projection so each query only scans its
  * bucket — the shuffle is keyed by (bucket), not all-pairs.
  */
object VectorOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** integer milli-quantization of the float vector */
  private val QVEC =
    "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
  private val SQNORM = "aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- brute-force cosine top-k (correctness baseline) -------------------
    "v01_knn_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .selectExpr("vec_id", s"$QVEC AS q")
        .selectExpr("vec_id", "q", s"$SQNORM AS nsq")
        .filter(col("nsq") > 0)
      val qs = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nsq").as("na"))
      val cand = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("nsq").as("nb"))
      val rnk = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cand.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .withColumn("cosine", col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rank", row_number().over(rnk).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- LSH-bucketed ANN (sign random projection, the 100 TB scale path) --
    // Multi-table LSH: 8 deterministic ±1 hyperplanes (parity of md5(h:i)),
    // 4 tables × 2 sign bits. Candidates = co-bucketed in ANY table, deduped,
    // then exact cosine + top-k. At scale each shuffle is keyed by
    // (table, bucket) — candidate generation never goes all-pairs, and the
    // per-table bucket fan-in is corpus/4 on average.
    "v03_knn_lsh" -> ((s, dir) => {
      val bits = (0 until 8).map { h =>
        s"""CASE WHEN aggregate(transform(sequence(1, size(q)), i ->
           |  element_at(q, i) * (2 * ((instr('0123456789abcdef',
           |    substring(md5(concat('$h', ':', cast(i as string))), 1, 1)) - 1) % 2) - 1)),
           |  0L, (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END""".stripMargin
      }.mkString("array(", ", ", ")")
      val e = t(s, dir, "embeddings")
        .selectExpr("vec_id", s"$QVEC AS q")
        .selectExpr("vec_id", "q", s"$SQNORM AS nsq", s"$bits AS bits")
        .filter(col("nsq") > 0)
      // one row per (vector, table): bucket = 2 bits of that table
      val tabs = e.selectExpr("vec_id",
        """explode(transform(sequence(0, 3), t ->
          |  struct(t AS tab, element_at(bits, 2 * t + 1) * 2
          |              + element_at(bits, 2 * t + 2) AS bucket))) AS tb""".stripMargin)
        .select(col("vec_id"), col("tb.tab").as("tab"), col("tb.bucket").as("bucket"))
      val qtabs = tabs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("tab"), col("bucket"))
      val candPairs = tabs.join(broadcast(qtabs), Seq("tab", "bucket"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .distinct()
      val qv = e.select(col("vec_id").as("query_id"), col("q").as("qa"),
        col("nsq").as("na"))
      val cv = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("nsq").as("nb"))
      val rnk = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      candPairs.join(broadcast(qv), Seq("query_id")).join(cv, Seq("neighbor_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .withColumn("cosine", col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rank", row_number().over(rnk).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- per-label corpus stats --------------------------------------------
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
      "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    Map(
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

      "v03_knn_lsh" -> {
        val bitsD = (0 until 8).map { h =>
          s"""CASE WHEN list_sum(list_transform(generate_series(1, len(q)), i ->
             |  q[i] * (2 * ((strpos('0123456789abcdef',
             |    substring(md5('$h' || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) % 2) - 1)))
             |  >= 0 THEN 1 ELSE 0 END""".stripMargin
        }.mkString("[", ", ", "]")
        s"""WITH e0 AS (
           |  SELECT vec_id, $qvecD AS q FROM embeddings
           |), e AS (
           |  SELECT vec_id, q,
           |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq,
           |    $bitsD AS bits
           |  FROM e0
           |), ee AS (SELECT * FROM e WHERE nsq > 0
           |), tabs AS (
           |  SELECT vec_id, r.range AS tab,
           |    bits[2 * r.range + 1] * 2 + bits[2 * r.range + 2] AS bucket
           |  FROM ee CROSS JOIN range(0, 4) r
           |), cand AS (
           |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           |  FROM tabs q JOIN tabs c ON q.tab = c.tab AND q.bucket = c.bucket
           |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
           |), pairs AS (
           |  SELECT query_id, neighbor_id,
           |    CAST(list_sum(list_transform(generate_series(1, len(a.q)),
           |      i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
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
           |GROUP BY label ORDER BY label""".stripMargin
    )
  }
}
