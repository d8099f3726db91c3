package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram extraction over an ARRAY<STRING> token array —
  * the fused form of the t11/t17 declarative chains
  *
  *   t11 (n=3): array_distinct(transform(sequence(1, size(tk) - 2),
  *     i -> concat(element_at(tk, i), ' ', element_at(tk, i+1), ' ',
  *                 element_at(tk, i+2))))
  *   t17 (n=5): array_distinct(transform(sequence(1, size(tk) - 4),
  *     i -> concat_ws(' ', element_at(tk, i), ..., element_at(tk, i+4))))
  *
  * computed value-identically for the inputs those queries produce
  * (`split(...)` token arrays — never null elements): sliding windows in
  * position order, space-joined, dedup keeping first occurrence exactly
  * like array_distinct. Differences only on inputs the queries exclude:
  * a shorter-than-n array returns [] where the lambda chain errors on
  * element_at(0) (its `size >= n` filter guarantees that never evaluates),
  * and null tokens are skipped per concat_ws (t11's concat would null the
  * gram; split yields no nulls, pinned in FunctionsSpec).
  *
  * Why an Expression: the lambda chain evaluates n interpreted element_at
  * calls plus a concat per window position and materializes the
  * intermediate gram array before array_distinct walks it again — per
  * token, outside whole-stage codegen. This kernel is one primitive
  * sliding-window pass with an open-addressing dedup check. Registered as
  * SQL `graft_ngrams(tokens, n[, dedup])` (n and dedup must be literals)
  * by [[graft.lake.GraftExtensions]].
  *
  * Reference behavior contract: the reference has no text-pipeline
  * surface; n-gram mining mirrors standard decontamination/near-dup
  * practice (SURVEY.md §2 pipeline inventory, t11/t17).
  */
case class Ngrams(child: Expression, n: Int, dedup: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams window must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Ngrams.compute(input.asInstanceOf[ArrayData], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Ngrams.compute($a, $n, $dedup);")

  override protected def withNewChildInternal(newChild: Expression): Ngrams =
    copy(child = newChild)

  override def prettyName: String = "graft_ngrams"
}

object Ngrams {

  private val SPACE = UTF8String.fromString(" ")

  /** one sliding-window pass: per position, space-join n tokens (null
    * tokens skipped, concat_ws semantics); dedup keeps first occurrence */
  def compute(a: ArrayData, n: Int, dedup: Boolean): ArrayData = {
    val sz = a.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    val out = new java.util.ArrayList[Any](sz - n + 1)
    val seen = if (dedup) new java.util.HashSet[UTF8String](sz * 2) else null
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= sz - n) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      val g = UTF8String.concatWs(SPACE, window: _*)
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
