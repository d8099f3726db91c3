package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal-column query surface: media as opaque binary columns with
  * typed metadata (see graft.ops.Multimodal for the batch-decode plumbing).
  *
  * m01 keeps the whole fake-decode in pure SQL expressions so it is
  * oracle-checkable against DuckDB; m02 exercises the real typed
  * mapPartitions path — its stub decode is deterministic md5 arithmetic,
  * so it carries a SQL oracle too.
  */
object MultimodalOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- binary columns + metadata (decode stub in pure SQL) --------------
    "m01_binary_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .selectExpr("doc_id", "cast(text as binary) AS payload", "md5(text) AS h")
        .selectExpr("doc_id",
          "cast(octet_length(payload) as bigint) AS byte_len",
          "cast((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) as bigint) AS v1",
          "cast((instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(h, 4, 1)) - 1) as bigint) AS v2")
        .selectExpr("doc_id", "byte_len",
          "64 + 8 * (v1 % 48) AS width",
          "64 + 8 * (v2 % 48) AS height",
          "element_at(array('jpeg', 'png', 'webp'), cast(v1 % 3 as int) + 1) AS format",
          "1 + v2 % 30 AS n_frames")
        .orderBy(col("doc_id"))
        .limit(500)
    }),

    // ---- typed batch decode + frame sampling (mapPartitions path) ---------
    "m02_frame_sample" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .selectExpr("doc_id", "cast(text as binary) AS payload")
      Multimodal.sampleFrames(s, media, stride = 4).toDF()
        .select(col("doc_id"), col("frame_idx"), col("frame_sig"), col("luma"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ---- media near-dup: decode → per-frame features → signature →
    // bucket JOIN (never all-pairs). The end-to-end multimodal dedup
    // shape: two byte-identical uploads (here: the same media under two
    // ids) land in one feature bucket and surface as a pair; at 100 TB
    // the signature groupBy + equi-join is one shuffle each, state
    // O(corpus), exactly the t04 exact-dedup plan lifted onto decoded
    // media features instead of raw text ---------------------------------
    // ---- stubbed resize / re-encode (typed mapPartitions, binary in/out) --
    "m04_resize" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .selectExpr("doc_id", "cast(text as binary) AS payload")
      Multimodal.resizeStub(s, media, target = 128).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("new_w"),
          col("new_h"), col("new_byte_len"), col("out_sig"))
        .orderBy(col("doc_id"))
    }),

    "m03_media_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .selectExpr("doc_id", "cast(text as binary) AS payload")
      val copies = docs.selectExpr("doc_id + 100000 AS doc_id", "payload")
      val frames = Multimodal.sampleFrames(s, docs.union(copies), stride = 4).toDF()
      // per-doc signature: ordered quantized luma sequence (luma is
      // hexdigit/16, so *16 is exactly integral — no rounding hazards)
      val sig = frames.groupBy("doc_id").agg(expr(
        "concat_ws(',', transform(array_sort(collect_list(struct(frame_idx, luma))), " +
          "x -> cast(cast(x.luma * 16 as int) as string)))").as("sig"))
      sig.as("a").join(sig.as("b"),
          col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .orderBy("doc_a", "doc_b")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // mirrors Multimodal.decodeStub (n_frames from md5 hex digits 3-4) and
    // sampleFrames (stride 4; sig = md5(payload || ':' || idx))
    "m02_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id, text,
        |    CAST((strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1) AS BIGINT) AS v2
        |  FROM documents WHERE doc_id < 200
        |), f AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(v2 % 30 AS BIGINT), 4)) AS frame_idx
        |  FROM meta
        |)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sig,
        |  CAST(strpos('0123456789abcdef',
        |    substring(md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 1)) - 1 AS DOUBLE) / 16.0 AS luma
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m01_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  64 + 8 * (v1 % 48) AS width,
        |  64 + 8 * (v2 % 48) AS height,
        |  (['jpeg', 'png', 'webp'])[CAST(v1 % 3 AS INTEGER) + 1] AS format,
        |  1 + v2 % 30 AS n_frames
        |FROM (SELECT doc_id, text,
        |    CAST((strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) AS BIGINT) AS v1,
        |    CAST((strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1) AS BIGINT) AS v2
        |  FROM documents) t
        |ORDER BY doc_id LIMIT 500""".stripMargin,

    // mirrors Multimodal.resizeStub: aspect-preserving integer rescale of
    // the m01 stub dims, fake re-encode = md5(text || ':resize') hex
    // repeated to the new length
    "m04_resize" ->
      """WITH meta AS (
        |  SELECT doc_id, text,
        |    CAST(64 + 8 * (((strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1)) % 48) AS BIGINT) AS width,
        |    CAST(64 + 8 * (((strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1)) % 48) AS BIGINT) AS height
        |  FROM documents WHERE doc_id < 200
        |), dims AS (
        |  SELECT doc_id, text, width, height,
        |    width * 128 // greatest(width, height) AS new_w,
        |    height * 128 // greatest(width, height) AS new_h
        |  FROM meta
        |), enc AS (
        |  SELECT doc_id, width, height, new_w, new_h,
        |    substr(repeat(md5(text || ':resize'),
        |        CAST((new_w * new_h // 64 + 16) // 32 + 1 AS BIGINT)),
        |      1, CAST(new_w * new_h // 64 + 16 AS BIGINT)) AS body
        |  FROM dims
        |)
        |SELECT doc_id, width, height, CAST(new_w AS BIGINT) AS new_w,
        |  CAST(new_h AS BIGINT) AS new_h,
        |  CAST(octet_length(encode(body)) AS BIGINT) AS new_byte_len,
        |  md5(body) AS out_sig
        |FROM enc ORDER BY doc_id""".stripMargin,

    // same decode-stub luma formula as m02, aggregated into the ordered
    // quantized signature, paired on signature equality
    "m03_media_neardup" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |media AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 100000, text FROM base),
        |meta AS (
        |  SELECT doc_id, text,
        |    CAST((strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1) AS BIGINT) AS v2
        |  FROM media),
        |f AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(v2 % 30 AS BIGINT), 4)) AS frame_idx
        |  FROM meta),
        |sig AS (
        |  SELECT doc_id,
        |    string_agg(CAST(strpos('0123456789abcdef',
        |      substring(md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 1)) - 1
        |      AS VARCHAR), ',' ORDER BY frame_idx) AS sig
        |  FROM f GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM sig a JOIN sig b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}
