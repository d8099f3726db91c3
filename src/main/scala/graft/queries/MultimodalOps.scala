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
        |ORDER BY doc_id LIMIT 500""".stripMargin
  )
}
