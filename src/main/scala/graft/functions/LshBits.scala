package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd sign-LSH signature: for each sparse hyperplane (a list of
  * signed 1-based dim indexes: +d ⇒ +q[d], -d ⇒ -q[d]), emit 1 when the
  * projection of the bigint vector `q` is ≥ 0, else 0.
  *
  * This is the once-per-corpus-row stage of every LSH pipeline (ANN
  * probing, embedding near-dup mining): O(planes × nonzero-dims) work per
  * row. The lambda formulation — transform(planes, p -> CASE WHEN
  * aggregate(p, ...) ...) — runs on CodegenFallback higher-order
  * functions, paying closure dispatch per plane per dim; at a 100 TB
  * corpus the signature build is the dominant indexing cost, so it gets
  * the same treatment as [[VecDotLong]]: a primitive nested loop inside
  * whole-stage codegen.
  *
  * SQL: `graft_lsh_bits(q, planes)` with q ARRAY<BIGINT> and planes
  * ARRAY<ARRAY<INT>> (normally a constant-folded literal) → ARRAY<INT>.
  */
case class LshBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(IntegerType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bits expects (ARRAY<BIGINT>, ARRAY<ARRAY<INT>>), got (${l.sql}, ${r.sql})")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(qv: Any, pl: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val planes = pl.asInstanceOf[ArrayData]
    val np = planes.numElements()
    val bits = new Array[Int](np)
    var p = 0
    while (p < np) {
      val dims = planes.getArray(p)
      var acc = 0L
      var j = 0
      val nd = dims.numElements()
      while (j < nd) {
        val t = dims.getInt(j)
        acc += (if (t > 0) q.getLong(t - 1) else -q.getLong(-t - 1))
        j += 1
      }
      bits(p) = if (acc >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, planes) => {
      val np = ctx.freshName("np")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val dims = ctx.freshName("dims")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      s"""
         |int $np = $planes.numElements();
         |int[] $bits = new int[$np];
         |for (int $p = 0; $p < $np; $p++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $dims = $planes.getArray($p);
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $dims.numElements(); $j++) {
         |    int $t = $dims.getInt($j);
         |    $acc += ($t > 0) ? $q.getLong($t - 1) : -$q.getLong(-$t - 1);
         |  }
         |  $bits[$p] = ($acc >= 0L) ? 1 : 0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bits);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBits =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lsh_bits"
}
