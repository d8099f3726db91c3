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
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.TimestampType

  /** the view's resolved plan at `version` (else at the snapshot current
    * at `tsMillis`, else session as-of/current), or None when the name is
    * not a stored view of a live lake catalog. A timestamp that precedes
    * the first snapshot raises (the name IS a view; silently falling
    * through would report "table not found"). */
  private def viewPlan(parts: Seq[String], version: Option[Long],
      tsMillis: Option[Long] = None): Option[LogicalPlan] =
    (try SqlViews.target(session, parts) catch { case _: Exception => None })
      .flatMap { case (lc, schema, name) =>
        // resolveViewDF works over the CatalogState directly, so this
        // serves frozen mounts too (read-only), not just live stores
        val st = lc.catalogState()
        val resolved: Option[Long] =
          version.orElse(tsMillis.flatMap { ms =>
            val s = st.snapshotAtTime(ms)
            if (s.isEmpty && LakeViewDefs.viewAt(st, schema, name,
                st.currentSnapshotId).isDefined)
              throw new NoSuchElementException(
                s"view $schema.$name: no snapshot exists at or before the " +
                  "requested TIMESTAMP AS OF")
            s
          })
        val at = resolved
          .orElse(lc.sessionAsOf(st)).getOrElse(st.currentSnapshotId)
        if (LakeViewDefs.viewAt(st, schema, name, at).isDefined &&
            !st.snapshots.exists(_.snapshotId == at))
          throw new NoSuchElementException(
            s"view $schema.$name: snapshot $at does not exist or has been expired")
        if (LakeViewDefs.viewAt(st, schema, name, at).isDefined)
          Some(LakeViewDefs.resolveViewDF(session, st, s"$schema.$name", at)
            .queryExecution.analyzed)
        else None
      }

  /** foldable `TIMESTAMP AS OF` expression → epoch millis (the literal
    * forms the reference's time_travel(tbl, ts) overload accepts,
    * src/pgducklake_time_travel.cpp:36-73); non-foldable stays on
    * Spark's table path */
  private def evalTsMillis(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Long] =
    try {
      if (!e.resolved || !e.foldable) None
      else {
        val zone = session.sessionState.conf.sessionLocalTimeZone
        Option(Cast(e, TimestampType, Some(zone)).eval(null))
          .map(_.asInstanceOf[Long] / 1000L)
      }
    } catch { case _: Exception => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v)) =>
      // `VERSION AS OF v` on a stored view: both the definition and the
      // data resolve at snapshot v
      (try Some(v.toLong) catch { case _: NumberFormatException => None })
        .flatMap(ver => viewPlan(u.multipartIdentifier, Some(ver)))
        .getOrElse(tt)
    case tt @ RelationTimeTravel(u: UnresolvedRelation, Some(ts), None) =>
      // `TIMESTAMP AS OF ts` on a stored view: map the timestamp to the
      // snapshot current at that instant — the same resolution tables get
      // in LakeCatalog.loadTable(ident, timestampMicros) — then resolve
      // definition AND data there, matching the reference's dual
      // time_travel overloads (src/pgducklake_time_travel.cpp:36-73)
      evalTsMillis(ts)
        .flatMap(ms => viewPlan(u.multipartIdentifier, None, Some(ms)))
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
  /** Column-equality existence checks (ADVICE r8: interpolated filter
    * strings break on legal backtick-quoted identifiers containing
    * quotes — filter-string injection via identifier). `qualified` is
    * always `<schema>.<name>` with a dot-free schema (target() only
    * matches 1- or 2-part names). */
  def viewExists(lake: Lake, qualified: String): Boolean = {
    val (sn, vn) = lake.schemaOf(qualified)
    lake.views().filter(org.apache.spark.sql.functions.col("schema_name")
        === sn and org.apache.spark.sql.functions.col("view_name") === vn)
      .count() > 0
  }

  def macroExists(lake: Lake, name: String): Boolean = {
    import org.apache.spark.sql.functions.col
    val m = lake.macros()
    val matched = name.split('.') match {
      case Array(sn, mn) =>
        m.filter(col("schema_name") === sn and col("macro_name") === mn)
      case _ => m.filter(col("macro_name") === name)
    }
    matched.count() > 0
  }

  /** split a BEGIN-block body into statements on ';' outside quoted
    * regions and comments (r16, ADVICE): single-quoted strings ('' escapes
    * toggle twice, which nets out), backtick / double-quoted identifiers,
    * `--` line comments and nesting-free `/* */` block comments are all
    * skipped — a ';' inside any of them no longer splits a statement.
    * Comment text is preserved in the statement (Spark's parser accepts
    * it); only the split points change. */
  private[lake] def splitStatements(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var mode: Char = ' ' // ' '=code, '\''=str, '`'=ident, '"'=ident, '-'=line, '*'=block
    var blockEnteredAt = -1
    while (i < body.length) {
      val c = body.charAt(i)
      mode match {
        case ' ' =>
          if (c == ';') { out += sb.toString; sb.clear() }
          else {
            sb.append(c)
            if (c == '\'' || c == '`' || c == '"') mode = c
            else if (c == '-' && i + 1 < body.length && body.charAt(i + 1) == '-') mode = '-'
            else if (c == '/' && i + 1 < body.length && body.charAt(i + 1) == '*') {
              mode = '*'; blockEnteredAt = i
            }
          }
        case q @ ('\'' | '`' | '"') =>
          sb.append(c)
          // backslash escape inside a single-quoted string (ADVICE r16):
          // Spark's default non-ANSI parser honors \' — without this the
          // escaped quote exits string mode and a ';' inside the literal
          // splits the statement
          if (q == '\'' && c == '\\' && i + 1 < body.length) {
            sb.append(body.charAt(i + 1)); i += 1
          } else if (c == q) mode = ' '
        case '-' => sb.append(c); if (c == '\n') mode = ' '
        case '*' =>
          sb.append(c)
          // the closing '/' must sit past the opener's "/*" (reject "/*/")
          if (c == '/' && i >= blockEnteredAt + 3 &&
              body.charAt(i - 1) == '*') mode = ' '
      }
      i += 1
    }
    out += sb.toString
    // a fragment that is nothing but comments/whitespace is not a statement
    def hasCode(s: String): Boolean =
      s.replaceAll("(?s)/\\*.*?\\*/", " ").split('\n')
        .exists(l => l.trim.nonEmpty && !l.trim.startsWith("--"))
    out.result().map(_.trim).filter(hasCode)
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

/** Executes a SQL BEGIN…COMMIT/ROLLBACK block: every statement runs with
  * the catalog's effective store swapped to the transaction's staging
  * store (reads-your-own-writes, nothing visible outside), then the staged
  * deltas merge into ONE snapshot via [[graft.lake.Lake.transaction]] — or
  * are discarded wholesale for ROLLBACK (staged data files deleted).
  * Returns the committed snapshot id (-1 for rollback / empty blocks).
  * Statements addressing OTHER catalogs run immediately and
  * non-transactionally (PG semantics cover one database at a time);
  * maintenance ops inside the block are rejected by their existing
  * staging-store guard. One block at a time per catalog. */
case class LakeTransactionBlockCommand(catalogName: String,
    statements: Seq[String], commit: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // the block's lake catalog: the session's current catalog when it IS
    // one (USE <cat> flows), else the first catalog-qualified identifier
    // in the statements that resolves to a registered lake catalog
    def isLake(n: String): Boolean =
      scala.util.Try(CatalogAccess.catalog(spark, n)).toOption
        .exists(_.isInstanceOf[LakeCatalog])
    val lcName = (Seq(catalogName) ++ statements.flatMap(st =>
        """\b([A-Za-z_]\w*)\s*\.""".r.findAllMatchIn(st).map(_.group(1))))
      .distinct.find(isLake).getOrElse(throw new IllegalArgumentException(
        "BEGIN block: no lake catalog in scope (USE <catalog> or qualify table names)"))
    val lc = CatalogAccess.catalog(spark, lcName).asInstanceOf[LakeCatalog]
    val lake = SqlViews.lakeOf(spark, lcName)
    object Rollback extends RuntimeException
    try {
      val (_, sid) = lake.transaction { tx =>
        lc.beginTxOverride(tx.store) // thread-scoped; rejects nesting
        try {
          statements.foreach(stmt => spark.sql(stmt).collect())
          if (!commit) throw Rollback
        } finally lc.endTxOverride()
      }
      Seq(Row(sid))
    } catch { case Rollback => Seq(Row(-1L)) }
  }
}

case class CreateLakeViewCommand(catalogName: String, viewName: String,
    sql: String, aliases: Seq[String], replace: Boolean,
    allowExisting: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = SqlViews.lakeOf(spark, catalogName)
    if (allowExisting && SqlViews.viewExists(lake, viewName)) Seq(Row(-1L))
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
    if (!SqlViews.viewExists(lake, viewName) && ifExists) Seq(Row(-1L))
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
    val names = lake.views()
      .filter(org.apache.spark.sql.functions.col("schema_name") === schemaName)
      .select("view_name").collect().map(_.getString(0)).toSeq.sorted
    val matched = pattern match {
      case Some(p) =>
        // SHOW ... LIKE patterns: '*' any chars, '|' alternation; every
        // non-wildcard segment is quoted (ADVICE r8: '+', '(' etc. are
        // regex metachars) and matching is case-insensitive, matching
        // Spark's StringUtils.filterPattern semantics
        val rx = ("(?i)^(" + p.split("\\|").map(alt =>
          alt.split("\\*", -1).map(java.util.regex.Pattern.quote)
            .mkString(".*")).mkString("|") + ")$").r
        names.filter(n => rx.findFirstIn(n).isDefined)
      case None => names
    }
    matched.map(n => Row(schemaName, n, false))
  }
}

case class CreateLakeMacroCommand(nameParts: Seq[String], params: Seq[String],
    body: String, replace: Boolean, kind: String = "scalar")
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, rest) =
      if (nameParts.length > 1 && CatalogAccess.isRegistered(spark, nameParts.head))
        (nameParts.head, nameParts.tail)
      else (CatalogAccess.currentCatalogName(spark), nameParts)
    val lake = SqlViews.lakeOf(spark, cat)
    Seq(Row(lake.createMacro(rest.mkString("."), params, body,
      orReplace = replace, kind = kind)))
  }
}

case class DropLakeMacroCommand(nameParts: Seq[String], ifExists: Boolean,
    kind: String = "scalar") extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, rest) =
      if (nameParts.length > 1 && CatalogAccess.isRegistered(spark, nameParts.head))
        (nameParts.head, nameParts.tail)
      else (CatalogAccess.currentCatalogName(spark), nameParts)
    val lake = SqlViews.lakeOf(spark, cat)
    val name = rest.mkString(".")
    if (!SqlViews.macroExists(lake, name) && ifExists) Seq(Row(-1L))
    else Seq(Row(lake.dropMacro(name, kind)))
  }
}

/** Delegating parser that adds the two reference-dialect MACRO statements;
  * everything else — including every CREATE VIEW form — flows to the
  * delegate (Spark's own parser) verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val CreateMacroRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MACRO\s+([\w.`]+)\s*\(([^)]*)\)\s+AS\s+(TABLE\s+)?(.+?)\s*;?\s*""".r
  private val DropMacroRe =
    """(?is)\s*DROP\s+MACRO\s+(TABLE\s+)?(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*""".r
  // ---- access-control DDL (A30; reference access_control.md + PG role
  // grammar). Spark has no ROLE/GRANT grammar at all, so these match at
  // the parse boundary and run against the session's CURRENT catalog
  // (must be a lake catalog — commands error otherwise).
  private val CreateRoleRe =
    """(?is)\s*CREATE\s+ROLE\s+(\w+)\s*;?\s*""".r
  private val DropRoleRe =
    """(?is)\s*DROP\s+ROLE\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  private val CreateUserRe =
    """(?is)\s*CREATE\s+USER\s+(\w+)(?:\s+IN\s+ROLE\s+([\w,\s]+?))?\s*;?\s*""".r
  private val DropUserRe =
    """(?is)\s*DROP\s+USER\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  private val GrantTableRe =
    """(?is)\s*GRANT\s+([\w,\s]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val GrantRoleRe =
    """(?is)\s*GRANT\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val RevokeTableRe =
    """(?is)\s*REVOKE\s+([\w,\s]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+FROM\s+(\w+)\s*;?\s*""".r
  private val RevokeRoleRe =
    """(?is)\s*REVOKE\s+(\w+)\s+FROM\s+(\w+)\s*;?\s*""".r
  // incremental materialized views (superset DDL; [[SqlMaterializedView]]);
  // the FROM clause supports CHAINED JOINs (snowflake: a later dim may key
  // off an earlier dim's carried column) — parsed by parseFromClause
  // the optional trailing WITH (rewrite = off|fresh|refresh) scopes the
  // opt-in query rewrite PER VIEW (r17 stretch — lands as the
  // table-scoped `mv.rewrite` catalog option)
  private val CreateMvRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+SELECT\s+(.+?)""" +
      """\s+FROM\s+(.+?)\s+GROUP\s+BY\s+(.+?)""" +
      """(?:\s+WITH\s*\(\s*rewrite\s*=\s*'?(\w+)'?\s*\))?\s*;?\s*""").r
  private val RefreshMvRe =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*;?\s*""".r
  // explicit-transaction block (r15): the whole BEGIN…COMMIT/ROLLBACK
  // arrives as ONE sql() string; statements stage against the current lake
  // catalog and land as a single snapshot (reference transaction.sql)
  // the terminator tolerates trailing -- / /* */ comments (r16, ADVICE —
  // a comment after COMMIT used to fall through to the delegate parser
  // and the block silently lost its transactional semantics)
  private val TxBlockRe =
    ("""(?is)\s*BEGIN(?:\s+TRANSACTION)?\s*;(.*?)(COMMIT|ROLLBACK)""" +
      """(?:\s+TRANSACTION)?\s*;?(?:\s|--[^\n]*\n?|/\*.*?\*/)*""").r
  private val ShowRolesRe = """(?is)\s*SHOW\s+ROLES\s*;?\s*""".r
  private val ShowGrantsRe =
    """(?is)\s*SHOW\s+GRANTS(?:\s+ON\s+(?:TABLE\s+)?([\w.]+))?\s*;?\s*""".r

  private def curCat: String = CatalogAccess.currentCatalogName(session)
  private def csv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private def parts(qualified: String): Seq[String] =
    delegate.parseMultipartIdentifier(qualified)

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case TxBlockRe(body, endKw) =>
      LakeTransactionBlockCommand(curCat, SqlViews.splitStatements(body),
        endKw.equalsIgnoreCase("COMMIT"))
    case CreateRoleRe(name) => CreateLakeRoleCommand(curCat, name)
    case DropRoleRe(ifExists, name) =>
      DropLakeRoleCommand(curCat, name, ifExists != null)
    case CreateUserRe(name, roles) =>
      CreateLakeUserCommand(curCat, name,
        Option(roles).map(csv).getOrElse(Nil))
    case DropUserRe(ifExists, name) =>
      DropLakeUserCommand(curCat, name, ifExists != null)
    case GrantTableRe(privs, table, role) =>
      GrantLakeCommand(curCat, csv(privs), Some(table), role)
    case GrantRoleRe(role, user) =>
      GrantLakeCommand(curCat, Seq(role), None, user)
    case RevokeTableRe(privs, table, role) =>
      RevokeLakeCommand(curCat, csv(privs), Some(table), role)
    case RevokeRoleRe(role, user) =>
      RevokeLakeCommand(curCat, Seq(role), None, user)
    case CreateMvRe(name, select, fromClause, groupBy, rewriteMode) =>
      val groupCols = csv(groupBy)
      val (sums, cnts, avgs, mms) =
        SqlMaterializedView.parseSelectList(select, groupCols)
      val (source, dims, where) =
        SqlMaterializedView.parseFromClause(fromClause)
      // validate the predicate NOW — a broken filter should fail the
      // CREATE, not the initial compute (same discipline as macros)
      where.foreach(delegate.parseExpression)
      CreateLakeMaterializedViewCommand(curCat, name, source, groupCols,
        sums, cnts, avgs, mms, where, dims, Option(rewriteMode))
    case RefreshMvRe(name) =>
      RefreshLakeMaterializedViewCommand(curCat, name)
    case ShowRolesRe() => ShowLakeRolesCommand(curCat)
    case ShowGrantsRe(table) => ShowLakeGrantsCommand(curCat, Option(table))
    case CreateMacroRe(orReplace, name, params, tableKw, body) =>
      // validate the body NOW — a broken macro should fail its CREATE
      // statement, not the first use. `AS TABLE <select>` is a TABLE
      // macro (DuckDB grammar; reference coverage row
      // docs/ducklake_feature_coverage.md:32): body parses as a plan
      val isTable = tableKw != null
      if (isTable) delegate.parsePlan(body) else delegate.parseExpression(body)
      val ps = params.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      CreateLakeMacroCommand(parts(name), ps, body, orReplace != null,
        if (isTable) "table" else "scalar")
    case DropMacroRe(tableKw, ifExists, name) =>
      DropLakeMacroCommand(parts(name), ifExists != null,
        if (tableKw != null) "table" else "scalar")
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
