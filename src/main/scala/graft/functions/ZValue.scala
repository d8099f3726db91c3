package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton) key over 2-4 double-valued dimensions: each value is
  * quantile-bucketed against precomputed per-column cut points, and the
  * bucket bits are interleaved MSB-first into one long. Rows close in the
  * z-key are close in EVERY dimension, so range-clustering files by this
  * key tightens per-file min/max zone maps on all participating columns
  * at once — the multi-column file-pruning shape a single-column sort
  * can't give (see [[graft.lake.Lake.rewriteZOrder]]).
  *
  * Quantile buckets (not uniform width) keep the interleave balanced
  * under skew: every bucket holds ~1/N of the data, so no dimension's
  * bits degenerate into constants. Nulls map to bucket 0 (cluster
  * together, first files).
  *
  * Hot-path discipline as [[VecDotLong]]/[[LshBits]]: a primitive
  * binary-search + bit loop inside whole-stage codegen, no boxing, no
  * fallback — this runs once per row over the entire table being
  * rewritten.
  */
case class ZValue(children: Seq[Expression], cuts: Array[Array[Double]])
  extends Expression {

  require(children.nonEmpty && children.length == cuts.length,
    "graft_zvalue: one cut array per input column")

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue expects DOUBLE inputs, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  /** bits per dimension: enough for bucket ids 0..max(cuts length) */
  private val bits: Int = {
    val maxBucket = cuts.map(_.length).max // buckets range over 0..len
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(maxBucket.toLong))
  }

  override def eval(input: InternalRow): Any = {
    val bs = new Array[Int](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      bs(i) =
        if (v == null) 0
        else ZValue.bucketOf(cuts(i), v.asInstanceOf[Double])
      i += 1
    }
    ZValue.interleave(bs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("zcuts", cuts, "double[][]")
    val bs = ctx.freshName("zbs")
    val childCodes = children.zipWithIndex.map { case (c, i) =>
      val cc = c.genCode(ctx)
      code"""
            |${cc.code}
            |$bs[$i] = ${cc.isNull} ? 0
            |  : graft.functions.ZValue.bucketOf($cutsRef[$i], ${cc.value});
            |""".stripMargin
    }
    ev.copy(
      code = code"""
        |int[] $bs = new int[${children.length}];
        |${childCodes.reduce(_ + _)}
        |long ${ev.value} = graft.functions.ZValue.interleave($bs, $bits);
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZValue {
  /** quantile bucket of `v`: the insertion point in the sorted cut array
    * (0 .. cuts.length) */
  def bucketOf(cuts: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i + 1 else -i - 1
  }

  /** MSB-first bit interleave of the bucket ids, `bits` bits each */
  def interleave(bs: Array[Int], bits: Int): Long = {
    var z = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < bs.length) {
        z = (z << 1) | ((bs(i) >> b) & 1)
        i += 1
      }
      b -= 1
    }
    z
  }
}
