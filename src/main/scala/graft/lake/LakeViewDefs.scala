package graft.lake

import Meta._

/** Catalog views and scalar SQL macros (reference layout tables
  * `ducklake_view` / `ducklake_macro` / `ducklake_macro_impl` /
  * `ducklake_macro_parameters`, pgducklake_freeze.cpp:38,55-57 — the
  * reference itself lists CREATE VIEW and macros as unsupported,
  * docs/ducklake_feature_coverage.md:30, and only round-trips the rows;
  * graft stores AND EXECUTES them: [[Lake.createView]]/[[Lake.view]]
  * substitute snapshot-scoped lake scans into the parsed definition,
  * [[Lake.createMacro]] registers a FunctionRegistry builder that expands
  * the body at analysis time — DuckDB macro semantics).
  *
  * Storage: one interval-versioned [[Meta.TagEntry]] per definition —
  * scope `view:<schema>` / `macro:<schema>`, key = object name, value =
  * the JSON codec below. Riding the tag machinery buys versioning
  * (CREATE OR REPLACE ends the old row), time travel, transactions,
  * checkpointing and incremental import with zero metadata-format
  * changes. Freeze (Thaw.dumpParquet / FreezeSql.catalogSql) translates
  * the tags into reference-shaped `ducklake_view` / `ducklake_macro*`
  * rows (dialect `spark`) and excludes them from the `ducklake_tag` dump,
  * so a DuckDB-side consumer sees real catalog rows, not carrier blobs;
  * Thaw.load inverts spark-dialect rows back into these tags (other
  * dialects stay opaque carrier rows, round-tripped losslessly).
  */
object LakeViewDefs {

  /** One view: `sql` is the defining SELECT in Spark SQL (dialect
    * `spark`); `aliases` optionally rename the output columns (the
    * `column_aliases` column of ducklake_view); `uuid` is stable across
    * freeze/thaw round-trips. */
  case class ViewDef(sql: String, aliases: List[String], uuid: String)

  /** One SQL macro: positional `params` substituted into the `sql` body
    * at analysis time (DuckDB CREATE MACRO semantics: lazy textual
    * expansion, not a compiled function). `kind` is `scalar` (body = an
    * expression, expands through the FunctionRegistry) or `table` (body =
    * a SELECT, expands through the TableFunctionRegistry — DuckDB
    * `CREATE MACRO ... AS TABLE`, the reference coverage row
    * docs/ducklake_feature_coverage.md:32-33). */
  case class MacroDef(params: List[String], sql: String, uuid: String,
      kind: String = "scalar")

  def viewScope(schema: String): String = s"view:$schema"
  def macroScope(schema: String): String = s"macro:$schema"
  private[lake] def isViewTag(t: TagEntry): Boolean = t.scope.startsWith("view:")
  private[lake] def isMacroTag(t: TagEntry): Boolean = t.scope.startsWith("macro:")
  private[lake] def schemaOfScope(t: TagEntry): String =
    t.scope.substring(t.scope.indexOf(':') + 1)

  // ------------------------------------------------------------- JSON codec

  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods
  private implicit val fmts: Formats = DefaultFormats

  def encodeView(v: ViewDef): String =
    JsonMethods.compact(JsonMethods.render(
      ("sql" -> v.sql) ~ ("aliases" -> v.aliases) ~ ("uuid" -> v.uuid)))

  def decodeView(json: String): ViewDef = {
    val j = JsonMethods.parse(json)
    ViewDef((j \ "sql").extract[String],
      (j \ "aliases").extractOrElse[List[String]](Nil),
      (j \ "uuid").extractOrElse[String](""))
  }

  def encodeMacro(m: MacroDef): String =
    JsonMethods.compact(JsonMethods.render(
      ("params" -> m.params) ~ ("sql" -> m.sql) ~ ("uuid" -> m.uuid) ~
        ("kind" -> m.kind)))

  def decodeMacro(json: String): MacroDef = {
    val j = JsonMethods.parse(json)
    MacroDef((j \ "params").extractOrElse[List[String]](Nil),
      (j \ "sql").extract[String],
      (j \ "uuid").extractOrElse[String](""),
      (j \ "kind").extractOrElse[String]("scalar"))
  }

  // ---------------------------------------------------------------- lookups

  def viewAt(st: CatalogState, schema: String, name: String,
      s: Long): Option[ViewDef] =
    st.tagAt(viewScope(schema), name, s).map(decodeView)

  def macroAt(st: CatalogState, schema: String, name: String,
      s: Long): Option[MacroDef] =
    st.tagAt(macroScope(schema), name, s).map(decodeMacro)

  /** Execute a stored view over any [[Meta.CatalogState]] — live OR
    * frozen (a frozen mount only needs the state + a SparkSession, so
    * DSv2 loadView stays self-consistent with listViews/viewExists on
    * read-only mounts — ADVICE r8). The definition parses with the
    * session parser; lake table/view names substitute their
    * snapshot-`s` plans (views stack, names resolve view-first in the
    * view's own schema then `main`); anything else stays unresolved for
    * the session analyzer. */
  def resolveViewDF(spark: org.apache.spark.sql.SparkSession,
      st: CatalogState, name: String, s: Long,
      depth: Int = 0): org.apache.spark.sql.DataFrame = {
    require(depth < 16, s"view nesting deeper than 16 — definition cycle? ($name)")
    val (sn, vn) = name.split('.') match {
      case Array(a, b) => (a, b)
      case Array(b) => ("main", b)
      case _ => throw new IllegalArgumentException(s"bad view name: $name")
    }
    val vd = viewAt(st, sn, vn, s)
      .getOrElse(throw new NoSuchElementException(s"no view $name at snapshot $s"))
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    val substituted = spark.sessionState.sqlParser.parsePlan(vd.sql).transformUp {
      case u: UnresolvedRelation =>
        val candidates = u.multipartIdentifier match {
          case Seq(t1) => Seq((sn, t1), ("main", t1))
          case Seq(s1, t1) => Seq((s1, t1))
          case _ => Nil
        }
        candidates.collectFirst {
          case (cs, ct) if viewAt(st, cs, ct, s).isDefined =>
            resolveViewDF(spark, st, s"$cs.$ct", s, depth + 1)
              .queryExecution.analyzed
          case (cs, ct) if st.tableAt(cs, ct, s).isDefined =>
            LakeRead.scanDF(spark, st, st.tableAt(cs, ct, s).get.tableId, s)
              .queryExecution.analyzed
        }.getOrElse(u)
    }
    val df = org.apache.spark.sql.graft.StreamingBatch.ofRows(spark, substituted)
    if (vd.aliases.nonEmpty) df.toDF(vd.aliases: _*) else df
  }

  /** every view tag row ever written (live and ended), with its schema.
    * Freeze emits one ducklake_view row per TagEntry interval, begin/end
    * mapped to begin_snapshot/end_snapshot — ended generations are rows
    * too, preserving time travel over CREATE OR REPLACE history. */
  private[lake] def allViewTags(st: CatalogState): Seq[(String, TagEntry)] =
    st.tags.filter(isViewTag).map(t => (schemaOfScope(t), t))

  private[lake] def allMacroTags(st: CatalogState): Seq[(String, TagEntry)] =
    st.tags.filter(isMacroTag).map(t => (schemaOfScope(t), t))
}
