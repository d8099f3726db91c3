package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd per-vector symmetric int8 quantization of an ARRAY<FLOAT> /
  * ARRAY<DOUBLE> embedding: `code_i = floor(x_i · 127 / max|x| + 0.5)` with
  * the scale floored at 1e-30 (all-zero vectors quantize to all-zero codes).
  *
  * Bit-identical to the declarative formulation the oracle SQL mirrors —
  *   `transform(e, x -> cast(floor(x * 127.0d / greatest(array_max(
  *      transform(e, x -> abs(x))), 1e-30d) + 0.5d) as bigint))`
  * — every step is the same IEEE double operation in the same order, so a
  * plan may mix the two freely. The lambda version walks three interpreted
  * higher-order transforms plus an array_max per row (closure dispatch and
  * boxed doubles, outside whole-stage codegen); this expression is one
  * primitive two-pass loop inside codegen, which is what the stage-1
  * coarse scan of the two-stage ANN (v08) spends its time on at corpus
  * scale. Registered as SQL `graft_int8_code` by
  * [[graft.lake.GraftExtensions]].
  *
  * Reference behavior contract: the reference has no ANN surface; int8
  * storage quantization mirrors the common training-corpus practice (see
  * SURVEY.md §2 pipeline inventory, v06/v08).
  */
case class Int8Code(child: Expression) extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_int8_code expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }

  // Null elements propagate exactly as in the lambda formulation: the
  // scale comes from array_max over non-null |x| (array_max skips nulls)
  // and a null x yields a null code. Parquet-read embeddings carry
  // containsNull=true schemas even when no element is ever null, so the
  // type is mirrored from the child rather than rejected, and the no-null
  // common case keeps the primitive long[] path (one predictable
  // isNullAt branch per element); only a row that actually contains a
  // null element pays for a boxed result array.
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    var mx = 1e-30d
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { hasNull = true }
      else {
        val v = math.abs(if (isF) a.getFloat(i).toDouble else a.getDouble(i))
        if (v > mx) mx = v
      }
      i += 1
    }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(x * 127.0d / mx + 0.5d).toLong
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
          out(i) = math.floor(x * 127.0d / mx + 0.5d).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val boxed = ctx.freshName("boxed")
      val hasNull = ctx.freshName("hasNull")
      val get = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      s"""
         |int $n = $a.numElements();
         |double $mx = 1e-30D;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; continue; }
         |  double $v = java.lang.Math.abs($get($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |if (!$hasNull) {
         |  long[] $out = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) java.lang.Math.floor($get($i) * 127.0D / $mx + 0.5D);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $boxed[$i] = (long) java.lang.Math.floor($get($i) * 127.0D / $mx + 0.5D);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Code =
    copy(child = newChild)

  override def prettyName: String = "graft_int8_code"
}
