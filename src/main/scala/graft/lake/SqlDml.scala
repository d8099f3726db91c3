package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.LongType

/** SQL `UPDATE lake.ns.t SET ... WHERE ...` support (SURVEY.md §2.B DML;
  * reference contract: test/regression/sql/dml_row_count.sql asserts the
  * `UPDATE n` tag).
  *
  * The analyzer resolves the statement to a [[UpdateTable]] plan; this rule
  * lowers it onto [[LakeWrite.update]] — the same single-snapshot
  * positional-delete + post-image write the Scala API uses, so SQL updates
  * get identical semantics (exact row counts, preserved row ids, change-feed
  * pre/post images) for free. Spark's own row-level framework
  * (`SupportsRowLevelOperations`) would instead drive a group-based rewrite
  * of whole files through a generic scan/replace cycle; lowering to the
  * native update keeps the merge-on-read write shape (only delta files +
  * post-image rows are written, never untouched rows).
  *
  * Resolved expressions are carried as SQL text and re-parsed against the
  * scan DataFrame — the column namespace is identical on both sides (the
  * relation IS the scan), so round-tripping is lossless for the
  * deterministic-expression surface UPDATE supports.
  */
class ResolveLakeUpdate(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      u.table.collectFirst { case r: DataSourceV2Relation => r.table } match {
        // frozen mounts carry no store → fall through to Spark's
        // unsupported-operation error path
        case Some(lt: LakeTable) if lt.store != null =>
          // strip catalog.ns.table qualifiers: the SQL re-parses against the
          // scan DataFrame, whose columns are unqualified
          def unqualifiedSql(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
            e.transform {
              case ar: AttributeReference => ar.withQualifier(Seq.empty)
            }.sql
          val set = u.assignments.map { a =>
            val name = a.key match {
              case ar: AttributeReference => ar.name
              case other => unqualifiedSql(other)
            }
            name -> unqualifiedSql(a.value)
          }.toMap
          UpdateLakeTableCommand(lt.store.root, lt.schemaName, lt.tableName,
            set, u.condition.map(unqualifiedSql))
        case _ => u
      }
    case other => other
  }
}

/** Executes the lowered UPDATE; returns the affected-row count (the
  * reference's `UPDATE n` command tag). */
case class UpdateLakeTableCommand(
    root: String,
    schemaName: String,
    tableName: String,
    setSql: Map[String, String],
    condSql: Option[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, n) = LakeWrite.update(spark, new MetadataStore(root),
      schemaName, tableName,
      condSql.map(expr).getOrElse(lit(true)),
      setSql.map { case (k, v) => k -> expr(v) })
    Seq(Row(n))
  }
}
