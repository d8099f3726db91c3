package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.CatalogAccess
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** SQL DDL statements for the stored-view / stored-macro surface
  * (VERDICT r7 #4): the Scala API ([[Lake.createView]] /
  * [[Lake.createMacro]]) and the execution surface (`graft_view` TVF with
  * AS-OF-consistent resolution, macro FunctionRegistry expansion) shipped
  * in r7 — this file adds the statement forms on top of the SAME
  * machinery, so SQL-created definitions are byte-identical catalog rows
  * to API-created ones (versioned tags → ducklake_view / ducklake_macro*
  * on freeze).
  *
  *  - `CREATE [OR REPLACE] VIEW <lakecat>.<schema>.<name> AS <select>`,
  *    `DROP VIEW [IF EXISTS]` and `SHOW VIEWS IN <lakecat>.<schema>`
  *    ride Spark's native parse tree ([[CreateView]] / [[DropView]] /
  *    [[ShowViews]]) and are lowered by [[GraftSqlParser]] right at the
  *    parse boundary when — and only when — the target catalog is a
  *    [[LakeCatalog]] (Spark 4.1's ResolveSessionCatalog categorically
  *    rejects view DDL on non-session catalogs before any injected
  *    resolution rule runs); session-catalog statements pass through
  *    verbatim. Reads resolve via [[ResolveLakeViewRead]].
  *  - `CREATE [OR REPLACE] MACRO [cat.][schema.]name(p, …) AS <expr>` and
  *    `DROP MACRO [IF EXISTS] [cat.][schema.]name` have no Spark grammar
  *    at all (they are the reference/DuckDB dialect,
  *    docs/ducklake_feature_coverage.md:31-33), so [[GraftSqlParser]] —
  *    injected via `injectParser` — recognizes these two statements and
  *    delegates every other string to Spark's parser untouched.
  *
  * Time travel composes unchanged: a definition created here is an
  * interval-versioned tag, so `graft_view(root, name, version)` and the
  * session as-of confs resolve BOTH the definition and the data at the
  * requested snapshot ([[Lake.view]]).
  */
/** Resolves `SELECT ... FROM <lakecat>.<schema>.<view>` reads: Spark 4.1
  * has the DSv2 ViewCatalog interface but no analyzer rule that reads
  * through it, so a catalog-qualified view name stays an
  * [[UnresolvedRelation]] all the way to CheckAnalysis — this injected
  * rule substitutes the stored view's resolved plan first (the same
  * snapshot-consistent resolution the `graft_view` TVF uses, so the
  * session as-of confs apply to both the definition and the data).
  * Tables are untouched (they resolve through loadTable before this
  * fires); a name that is neither stays unresolved for Spark's own
  * error. Frozen mounts resolve views via `graft_view` over the frozen
  * root. */
class ResolveLakeViewRead(session: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}

  /** the view's resolved plan at `version` (None → session as-of/current),
    * or None when the name is not a stored view of a live lake catalog */
  private def viewPlan(parts: Seq[String], version: Option[Long]): Option[LogicalPlan] =
    (try SqlViews.target(session, parts) catch { case _: Exception => None })
      .flatMap { case (lc, schema, name) =>
        if (lc.metaStore == null) None
        else {
          val lake = new Lake(session, lc.metaStore.root, Some(lc.metaStore))
          val st = lc.metaStore.state()
          val at = version.getOrElse(st.currentSnapshotId)
          if (LakeViewDefs.viewAt(st, schema, name, at).isDefined)
            Some(lake.view(s"$schema.$name", version).queryExecution.analyzed)
          else None
        }
      }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v)) =>
      // `VERSION AS OF v` on a stored view: both the definition and the
      // data resolve at snapshot v (timestamp form stays on Spark's
      // table path — views are versioned by snapshot id)
      (try Some(v.toLong) catch { case _: NumberFormatException => None })
        .flatMap(ver => viewPlan(u.multipartIdentifier, Some(ver)))
        .getOrElse(tt)
    case u: UnresolvedRelation =>
      viewPlan(u.multipartIdentifier, None).getOrElse(u)
  }
}

private[lake] object SqlViews {

  /** (lake catalog, schema, object name) when `parts` lands in a
    * registered LakeCatalog (explicit leading catalog segment, else the
    * session's current catalog). None → not lake-owned, leave to Spark. */
  def target(session: SparkSession,
      parts: Seq[String]): Option[(LakeCatalog, String, String)] = {
    // a bare name that matches a session temp view belongs to Spark even
    // when the current catalog is a lake (temp views shadow catalogs)
    if (parts.length == 1 && CatalogAccess.isTempView(session, parts.head))
      return None
    val (cat, rest) =
      if (parts.length > 1 && CatalogAccess.isRegistered(session, parts.head))
        (parts.head, parts.tail)
      else (CatalogAccess.currentCatalogName(session), parts)
    try CatalogAccess.catalog(session, cat) match {
      case lc: LakeCatalog =>
        rest match {
          case Seq(name) => Some((lc, "main", name))
          case Seq(schema, name) => Some((lc, schema, name))
          case _ => None
        }
      case _ => None
    } catch { case _: Exception => None }
  }
  /** the Lake behind a registered LakeCatalog (shares its live store) */
  def lakeOf(spark: SparkSession, catalogName: String): Lake = {
    CatalogAccess.catalog(spark, catalogName) match {
      case lc: LakeCatalog =>
        val store = lc.metaStore
        require(store != null, s"catalog $catalogName is a read-only frozen mount")
        new Lake(spark, store.root, Some(store))
      case other => throw new IllegalArgumentException(
        s"catalog $catalogName is not a lake catalog (${other.getClass.getName})")
    }
  }
}

case class CreateLakeViewCommand(catalogName: String, viewName: String,
    sql: String, aliases: Seq[String], replace: Boolean,
    allowExisting: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = SqlViews.lakeOf(spark, catalogName)
    if (allowExisting && lake.views().filter(
        s"schema_name || '.' || view_name = '$viewName'").count() > 0)
      Seq(Row(-1L))
    else
      Seq(Row(lake.createView(viewName, sql, aliases, orReplace = replace)))
  }
}

case class DropLakeViewCommand(catalogName: String, viewName: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = SqlViews.lakeOf(spark, catalogName)
    val exists = lake.views().filter(
      s"schema_name || '.' || view_name = '$viewName'").count() > 0
    if (!exists && ifExists) Seq(Row(-1L))
    else Seq(Row(lake.dropView(viewName)))
  }
}

/** `SHOW VIEWS IN <lakecat>.<schema> [LIKE pattern]` — same output
  * columns as Spark's session-catalog ShowViewsCommand. */
case class ShowLakeViewsCommand(catalogName: String, schemaName: String,
    pattern: Option[String]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("namespace", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("viewName", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("isTemporary", org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = SqlViews.lakeOf(spark, catalogName)
    val names = lake.views().filter(s"schema_name = '$schemaName'")
      .select("view_name").collect().map(_.getString(0)).toSeq.sorted
    val matched = pattern match {
      case Some(p) =>
        // SHOW ... LIKE patterns: '*' any chars, '|' alternation
        val rx = p.split("\\|").map(a =>
          a.replace(".", "\\.").replace("*", ".*")).mkString("^(", "|", ")$").r
        names.filter(n => rx.findFirstIn(n).isDefined)
      case None => names
    }
    matched.map(n => Row(schemaName, n, false))
  }
}

case class CreateLakeMacroCommand(nameParts: Seq[String], params: Seq[String],
    body: String, replace: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, rest) =
      if (nameParts.length > 1 && CatalogAccess.isRegistered(spark, nameParts.head))
        (nameParts.head, nameParts.tail)
      else (CatalogAccess.currentCatalogName(spark), nameParts)
    val lake = SqlViews.lakeOf(spark, cat)
    Seq(Row(lake.createMacro(rest.mkString("."), params, body, orReplace = replace)))
  }
}

case class DropLakeMacroCommand(nameParts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, rest) =
      if (nameParts.length > 1 && CatalogAccess.isRegistered(spark, nameParts.head))
        (nameParts.head, nameParts.tail)
      else (CatalogAccess.currentCatalogName(spark), nameParts)
    val lake = SqlViews.lakeOf(spark, cat)
    val name = rest.mkString(".")
    val exists = lake.macros().filter(
      s"schema_name || '.' || macro_name = '$name' or macro_name = '$name'").count() > 0
    if (!exists && ifExists) Seq(Row(-1L))
    else Seq(Row(lake.dropMacro(name)))
  }
}

/** Delegating parser that adds the two reference-dialect MACRO statements;
  * everything else — including every CREATE VIEW form — flows to the
  * delegate (Spark's own parser) verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val CreateMacroRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MACRO\s+([\w.`]+)\s*\(([^)]*)\)\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropMacroRe =
    """(?is)\s*DROP\s+MACRO\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*""".r

  private def parts(qualified: String): Seq[String] =
    delegate.parseMultipartIdentifier(qualified)

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateMacroRe(orReplace, name, params, body) =>
      // validate the body is a parseable expression NOW — a broken macro
      // should fail its CREATE statement, not the first use
      delegate.parseExpression(body)
      val ps = params.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      CreateLakeMacroCommand(parts(name), ps, body, orReplace != null)
    case DropMacroRe(ifExists, name) =>
      DropLakeMacroCommand(parts(name), ifExists != null)
    case other => delegate.parsePlan(other) match {
      // CREATE/DROP VIEW aimed at a lake catalog lowers HERE, at the
      // parse boundary: Spark 4.1's ResolveSessionCatalog categorically
      // rejects view DDL on non-session catalogs (MISSING_CATALOG_ABILITY
      // regardless of the ViewCatalog interface), so no resolution rule
      // gets a chance — session-catalog statements pass through untouched
      case cv: CreateView =>
        val lakeTarget = cv.child match {
          case UnresolvedIdentifier(nameParts, _) =>
            SqlViews.target(session, nameParts)
          case _ => None
        }
        lakeTarget match {
          case Some((lc, schema, name)) =>
            val sql = cv.originalText.getOrElse(
              throw new IllegalArgumentException("CREATE VIEW without query text"))
            CreateLakeViewCommand(lc.name(), s"$schema.$name", sql,
              cv.userSpecifiedColumns.map(_._1), cv.replace, cv.allowExisting)
          case None => cv
        }
      case dv: DropView =>
        val lakeTarget = dv.child match {
          case UnresolvedIdentifier(nameParts, _) =>
            SqlViews.target(session, nameParts)
          case _ => None
        }
        lakeTarget match {
          case Some((lc, schema, name)) =>
            DropLakeViewCommand(lc.name(), s"$schema.$name", dv.ifExists)
          case None => dv
        }
      case sv: ShowViews =>
        val ns = sv.namespace match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace =>
            Some(u.multipartIdentifier)
          case _ => None
        }
        // `SHOW VIEWS IN <lakecat>.<schema>` — appending a sentinel name
        // lets target() do the same catalog/schema split as the DDL paths
        ns.flatMap(parts => SqlViews.target(session, parts :+ "_")) match {
          case Some((lc, schema, _)) =>
            ShowLakeViewsCommand(lc.name(), schema, sv.pattern)
          case None => sv
        }
      case other => other
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
