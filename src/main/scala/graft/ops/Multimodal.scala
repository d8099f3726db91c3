package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs as partition-local batch transforms
  * (`mapPartitions` over a typed Dataset — the Scala analogue of
  * `mapInPandas`: one JVM-side batch iterator per partition, no
  * per-row serialization round trips).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake metadata from the
  * payload's md5. Everything around it — schema, binary column handling,
  * partitioning, the batch-iterator shape, frame-sampling explode — is the
  * real Spark structure a production decode would drop into.
  */
object Multimodal {

  /** Typed media record: payload is an opaque binary column. */
  case class Media(doc_id: Long, payload: Array[Byte])

  /** Decoded (stub) metadata for one media payload. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      format: String, n_frames: Int)

  /** One sampled frame: deterministic signature + fake luma feature. */
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_sig: String,
      luma: Double)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private val HEX = "0123456789abcdef"

  /** STUB decode: deterministic fake metadata from the payload hash.
    * A real implementation would parse the container header here. */
  def decodeStub(payload: Array[Byte]): (Int, Int, String, Int) = {
    val h = md5Hex(payload)
    val v1 = HEX.indexOf(h.charAt(0)) * 16 + HEX.indexOf(h.charAt(1))
    val v2 = HEX.indexOf(h.charAt(2)) * 16 + HEX.indexOf(h.charAt(3))
    val width = 64 + 8 * (v1 % 48)
    val height = 64 + 8 * (v2 % 48)
    val format = Seq("jpeg", "png", "webp")(v1 % 3)
    val nFrames = 1 + v2 % 30
    (width, height, format, nFrames)
  }

  /** Decode metadata for a binary-payload DataFrame (doc_id, payload).
    * Runs partition-local; one decoder instance per partition (the
    * batch shape a native codec needs). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      // per-partition setup (a real codec would init its context here)
      it.map { m =>
        val (w, h, fmt, nf) = decodeStub(m.payload)
        MediaMeta(m.doc_id, m.payload.length, w, h, fmt, nf)
      }
    }
  }

  /** One resized media item: original and new dims plus the re-encoded
    * payload's length and signature (the payload itself stays binary and
    * partition-local — only derived metadata leaves the transform). */
  case class Resized(doc_id: Long, width: Long, height: Long, new_w: Long,
      new_h: Long, new_byte_len: Long, out_sig: String)

  /** STUB resize: scale dims to fit `target` preserving aspect ratio
    * (integer arithmetic), "re-encode" to a deterministic fake payload
    * (the payload-hash hex repeated to the new length — SQL-expressible,
    * so the whole transform carries a DuckDB oracle). A real
    * implementation would swap the body for a codec call; the Spark
    * plumbing — binary in/out, typed mapPartitions batch, per-partition
    * codec-context slot, zero shuffles — is the production shape. */
  def resizeStub(spark: SparkSession, media: DataFrame, target: Int = 128): Dataset[Resized] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      // per-partition setup (a real codec would init its context here)
      it.map { m =>
        val (w, h, _, _) = decodeStub(m.payload)
        val mx = math.max(w, h)
        val nw = w * target / mx
        val nh = h * target / mx
        val newLen = nw * nh / 64 + 16
        val hex = md5Hex(m.payload ++ ":resize".getBytes("UTF-8"))
        val body = (hex * (newLen / 32 + 1)).substring(0, newLen).getBytes("UTF-8")
        Resized(m.doc_id, w, h, nw, nh, body.length, md5Hex(body))
      }
    }
  }

  /** Sample every `stride`-th frame of each media item; emits one row per
    * sampled frame with a deterministic per-frame signature. Frame
    * extraction is per-row (each media item carries everything its frames
    * need), so no repartition: the flatMap runs wherever the scan put the
    * row — zero extra shuffle at any scale. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.flatMap { m =>
        val (_, _, _, nFrames) = decodeStub(m.payload)
        (0 until nFrames by stride).iterator.map { idx =>
          // sig = md5(payload || ':' || idx) — SQL-expressible (the oracle
          // computes md5(text || ':' || idx) over the same UTF-8 bytes)
          val sig = md5Hex(m.payload ++ s":$idx".getBytes("UTF-8"))
          val luma = HEX.indexOf(sig.charAt(0)) / 16.0
          FrameSample(m.doc_id, idx, sig, luma)
        }
      }
    }
  }
}
