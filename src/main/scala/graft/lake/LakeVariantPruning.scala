package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources
import org.apache.spark.unsafe.types.UTF8String

/** File pruning for variant predicates (VERDICT r4 #6; reference
  * `ducklake_file_variant_stats`, src/pgducklake_freeze.cpp:60,
  * test/regression/sql/variant.sql).
  *
  * `variant_get(v, '$.price', 'bigint') > 5` can never reach the DSv2
  * pushdown surface — it is not a translatable source Filter — so without
  * help a variant predicate scans every file. The write path records
  * per-file min/max of each top-level scalar variant path under synthetic
  * stat names ("v.$.price", LakeWrite.append); this rule runs while the
  * plan still holds the raw `DataSourceV2Relation`, extracts
  * variant_get-vs-literal comparisons from a Filter directly above a lake
  * relation, and re-attaches them to the [[LakeTable]] as FILE-PRUNE-ONLY
  * predicates on those synthetic names. Spark keeps the original Filter,
  * so row-level semantics are untouched — pruning is a pure file-list
  * reduction, conservative like all of [[Pruning]].
  */
class LakeVariantPruning(spark: SparkSession) extends Rule[LogicalPlan] {

  private def pathOf(vg: VariantGet): Option[String] = vg.path match {
    case Literal(p, _) if p != null =>
      Some(p.toString).filter(s => s.startsWith("$.") && s.length > 2)
    case _ => None
  }

  /** synthetic stat name for attribute + path + REQUESTED extraction type:
    * "v" + "$.price" as bigint → "v.$.price#bigint". The "#type" suffix is
    * stripped by [[Pruning]] before matching the stat row (whose name is
    * LakeWrite.append's "v.$.price") and compared against the stat's
    * write-time inferred type: bounds recorded under one extraction type
    * do not transfer to a query requesting another (double→bigint
    * truncates, numeric-vs-string orders differently), so a mismatch makes
    * the stat incomparable and the file is kept. */
  private def statName(attr: String, path: String, vg: VariantGet): String =
    s"$attr.$path#${vg.dataType.catalogString.toLowerCase}"

  private def litValue(l: Literal): Option[Any] = l.value match {
    case null => None
    case u: UTF8String => Some(u.toString)
    case n: java.lang.Number => Some(n)
    case b: java.lang.Boolean => Some(b)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case _ => None
  }

  /** one conjunct → a synthetic source Filter, when it is a comparison of
    * variant_get over a plain attribute against a literal */
  private def toSource(e: Expression): Option[sources.Filter] = {
    def name(vg: VariantGet): Option[String] = vg.child match {
      case a: AttributeReference => pathOf(vg).map(statName(a.name, _, vg))
      case _ => None
    }
    e match {
      case EqualTo(vg: VariantGet, l: Literal) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.EqualTo(n, v)
      case EqualTo(l: Literal, vg: VariantGet) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.EqualTo(n, v)
      case GreaterThan(vg: VariantGet, l: Literal) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.GreaterThan(n, v)
      case GreaterThan(l: Literal, vg: VariantGet) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.LessThan(n, v)
      case GreaterThanOrEqual(vg: VariantGet, l: Literal) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.GreaterThanOrEqual(n, v)
      case GreaterThanOrEqual(l: Literal, vg: VariantGet) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.LessThanOrEqual(n, v)
      case LessThan(vg: VariantGet, l: Literal) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.LessThan(n, v)
      case LessThan(l: Literal, vg: VariantGet) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.GreaterThan(n, v)
      case LessThanOrEqual(vg: VariantGet, l: Literal) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.LessThanOrEqual(n, v)
      case LessThanOrEqual(l: Literal, vg: VariantGet) =>
        for (n <- name(vg); v <- litValue(l)) yield sources.GreaterThanOrEqual(n, v)
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ LFilter(cond, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[LakeTable] &&
          rel.table.asInstanceOf[LakeTable].variantPrune.isEmpty =>
      val extracted = conjuncts(cond).flatMap(toSource)
      if (extracted.isEmpty) f
      else f.copy(child =
        rel.copy(table = rel.table.asInstanceOf[LakeTable].withVariantPrune(extracted)))
  }
}
