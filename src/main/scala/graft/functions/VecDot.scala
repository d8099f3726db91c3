package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two ARRAY<BIGINT> vectors.
  *
  * The vector-similarity hot paths (brute-force kNN, LSH candidate
  * scoring, embedding near-dup mining) quantize embeddings to bigint
  * arrays and dot them per candidate pair. Expressing that as
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` walks
  * two higher-order lambdas per pair — an allocation (the zipped array)
  * plus per-element closure dispatch. This expression compiles to a tight
  * primitive loop inside whole-stage codegen: no intermediate array, no
  * boxing, one multiply-add per element — the same loop a hand-written
  * native engine runs, which is what makes the candidate-scoring stage
  * competitive at 100 TB candidate volumes.
  *
  * Null semantics match the lambda formulation: null input → null; length
  * mismatch takes the common prefix (callers always pass equal-length
  * vectors). Registered as SQL `graft_vec_dot` by
  * [[graft.lake.GraftExtensions]]; `graft_vec_dot(v, v)` is the squared
  * norm.
  */
case class VecDotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot expects (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_dot"
}
