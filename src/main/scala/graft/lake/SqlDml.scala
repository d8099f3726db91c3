package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ClassicConversions._
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
          UpdateLakeTableCommand(lt.store, lt.schemaName, lt.tableName,
            set, u.condition.map(unqualifiedSql))
        case _ => u
      }
    case other => other
  }
}

/** Executes the lowered UPDATE; returns the affected-row count (the
  * reference's `UPDATE n` command tag). */
case class UpdateLakeTableCommand(
    store: MetadataStore, // the resolved table's OWN store (file or JDBC)
    schemaName: String,
    tableName: String,
    setSql: Map[String, String],
    condSql: Option[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, n) = LakeWrite.update(spark, store,
      schemaName, tableName,
      condSql.map(expr).getOrElse(lit(true)),
      setSql.map { case (k, v) => k -> expr(v) })
    Seq(Row(n))
  }
}

/** SQL `MERGE INTO lake.ns.t USING src ON ... WHEN ...` support.
  *
  * Same lowering strategy as [[ResolveLakeUpdate]]: the analyzer resolves
  * the statement to a [[MergeIntoTable]]; this rule captures the (resolved)
  * source plan plus the clause expressions as SQL text and hands them to
  * [[LakeWrite.merge]]. Source attributes are renamed `_src_<name>` in the
  * carried SQL, and the command renames the source DataFrame's columns the
  * same way before the join — the two column namespaces can never collide,
  * so `ON t.id = s.id` round-trips losslessly even when both sides share
  * column names (the common case). */
class ResolveLakeMerge(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved && !m.withSchemaEvolution =>
      m.targetTable.collectFirst { case r: DataSourceV2Relation => r.table } match {
        case Some(lt: LakeTable) if lt.store != null =>
          val srcAttrs = AttributeSet(m.sourceTable.output)
          def sqlOf(e: Expression): String = e.transform {
            case ar: AttributeReference if srcAttrs.contains(ar) =>
              ar.withName(s"_src_${ar.name}").withQualifier(Seq.empty)
            case ar: AttributeReference => ar.withQualifier(Seq.empty)
          }.sql
          def keyName(e: Expression): String = e match {
            case ar: AttributeReference => ar.name
            case other => sqlOf(other)
          }
          val targetCols = lt.schema().fieldNames.toSeq
          def matchedOf(as: Seq[MergeAction]): Seq[(Option[String], Option[Map[String, String]])] =
            as.map {
              case UpdateAction(c, assigns, _) =>
                (c.map(sqlOf), Some(assigns.map(a => keyName(a.key) -> sqlOf(a.value)).toMap))
              case UpdateStarAction(c) =>
                (c.map(sqlOf), Some(targetCols.map(n => n -> s"`_src_$n`").toMap))
              case DeleteAction(c) => (c.map(sqlOf), None)
              case other => throw new UnsupportedOperationException(
                s"MERGE matched action: $other")
            }
          val notMatched = m.notMatchedActions.map {
            case InsertAction(c, assigns) =>
              (c.map(sqlOf), assigns.map(a => keyName(a.key) -> sqlOf(a.value)).toMap)
            case InsertStarAction(c) =>
              (c.map(sqlOf), targetCols.map(n => n -> s"`_src_$n`").toMap)
            case other => throw new UnsupportedOperationException(
              s"MERGE not-matched action: $other")
          }
          MergeLakeTableCommand(lt.store, lt.schemaName, lt.tableName,
            m.sourceTable, sqlOf(m.mergeCondition),
            matchedOf(m.matchedActions), notMatched,
            matchedOf(m.notMatchedBySourceActions))
        case _ => m
      }
    case other => other
  }
}

/** Executes the lowered MERGE; returns (updated, deleted, inserted) row
  * counts (the reference's MERGE command tag is the affected total). */
case class MergeLakeTableCommand(
    store: MetadataStore, // the resolved table's OWN store (file or JDBC)
    schemaName: String,
    tableName: String,
    sourcePlan: LogicalPlan,
    onSql: String,
    matched: Seq[(Option[String], Option[Map[String, String]])],
    notMatched: Seq[(Option[String], Map[String, String])],
    notMatchedBySource: Seq[(Option[String], Option[Map[String, String]])])
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("num_updated_rows", LongType, nullable = false)(),
    AttributeReference("num_deleted_rows", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src0 = org.apache.spark.sql.graft.StreamingBatch.ofRows(spark, sourcePlan)
    val src = src0.toDF(src0.columns.map("_src_" + _).toIndexedSeq: _*)
    def cols(m: Map[String, String]) = m.map { case (k, v) => k -> expr(v) }
    val (_, u, d, i) = LakeWrite.merge(spark, store,
      schemaName, tableName, src, expr(onSql),
      matched.map { case (c, s) =>
        LakeWrite.MergeMatched(c.map(expr), s.map(cols)) },
      notMatched.map { case (c, v) =>
        LakeWrite.MergeInsert(c.map(expr), cols(v)) },
      notMatchedBySource.map { case (c, s) =>
        LakeWrite.MergeMatched(c.map(expr), s.map(cols)) })
    Seq(Row(u, d, i))
  }
}
