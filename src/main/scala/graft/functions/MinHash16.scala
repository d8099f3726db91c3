package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd 16-permutation MinHash signature of an ARRAY<STRING> shingle
  * set — the fused form of the t11 declarative chain
  *
  *   hs = transform(sh, x -> md5(x))
  *   ha = transform(hs, m -> cast(conv(substring(m, 1, 14), 16, 10) as bigint))
  *   hb = transform(hs, m -> cast(conv(substring(m, 15, 14), 16, 10) as bigint))
  *   sg = transform(sequence(0, 15), j ->
  *          array_min(zip_with(ha, hb, (x, y) -> x + j * y)))
  *
  * computed value-identically: the first/second 14 hex chars of an md5 are
  * its bytes 0-6 / 7-13 read big-endian (each < 2^56, so the `conv` parse
  * is the same non-negative long), `h1 + j*h2` stays below 2^61 (no
  * overflow in either formulation), and null shingles are skipped exactly
  * like array_min skips the nulls md5(null) propagates (an all-null or
  * empty input yields 16 null minima). The DuckDB oracle keeps the string
  * formulation; results agree by construction.
  *
  * Why an Expression: the lambda chain walks five interpreted higher-order
  * transforms per row and materializes three intermediate arrays (hex
  * strings + two long arrays) per shingle set, outside whole-stage codegen
  * (the v08/graft_int8_code lesson, PLANS.md). This kernel is one primitive
  * loop — md5 bytes to two longs to a 16-way running min — with no
  * intermediate allocation beyond the 16-long result. Registered as SQL
  * `graft_minhash16` by [[graft.lake.GraftExtensions]].
  *
  * Reference behavior contract: the reference has no dedup surface; MinHash
  * banding mirrors standard training-corpus near-dup practice (SURVEY.md §2
  * pipeline inventory, t11).
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash16 expects ARRAY<STRING>, got ${other.sql}")
  }

  // 16 nulls when the shingle set is empty/all-null (array_min semantics)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    MinHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHash16.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash16"
}

object MinHash16 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** one primitive pass: per non-null shingle, md5 → (h1, h2) from bytes
    * 0-6 / 7-13 big-endian → fold `h1 + j*h2` into 16 running minima */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val mins = new Array[Long](16)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val digest = digests.get()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        digest.reset()
        val b = digest.digest(a.getUTF8String(i).getBytes)
        var h1 = 0L
        var h2 = 0L
        var k = 0
        while (k < 7) {
          h1 = (h1 << 8) | (b(k) & 0xffL)
          h2 = (h2 << 8) | (b(k + 7) & 0xffL)
          k += 1
        }
        var v = h1 // h1 + j*h2, incrementally
        var j = 0
        while (j < 16) {
          if (v < mins(j)) mins(j) = v
          v += h2
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](16))
    else new GenericArrayData(mins)
  }
}
