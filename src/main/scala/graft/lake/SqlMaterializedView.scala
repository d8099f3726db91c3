package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** SQL DDL for incremental materialized views (superset surface — the
  * reference stores only logical views; ours maintain, see
  * [[LakeMaterializedView]]). Grammar (parsed in [[GraftSqlParser]]):
  *
  * {{{
  *   CREATE MATERIALIZED VIEW <schema.name> AS
  *     SELECT <groupCols…>, COUNT(*)|SUM(c)|COUNT(c)|AVG(c)|MIN(c)|MAX(c)…
  *     FROM <schema.fact> [JOIN <schema.dim> ON fk = dk [AND …]]
  *     [WHERE <pred>]
  *     GROUP BY <groupCols…>
  *   REFRESH MATERIALIZED VIEW <schema.name>
  * }}}
  *
  * The select list is intentionally restricted to the MAINTAINABLE algebra
  * (the incremental fold's closure: signed counts/sums, derived AVG,
  * monotone MIN/MAX with dirty-group recompute) — anything else fails the
  * CREATE with the supported grammar in the message, never silently
  * degrades to a non-incremental view. Output column names are
  * engine-defined (`n_rows`, `sum_<c>`, `cnt_<c>`, `avg_<c>`,
  * `min_<c>`/`max_<c>`); aliases in the statement are accepted and
  * ignored. DROP is plain `DROP TABLE` (an MV IS a table plus tags).
  */
object SqlMaterializedView {

  private val CountStar = """(?is)COUNT\s*\(\s*\*\s*\)""".r
  private val AggCol = """(?is)(SUM|COUNT|AVG|MIN|MAX)\s*\(\s*([\w`]+)\s*\)""".r
  private val BareCol = """(?is)([\w`]+)""".r

  /** Parse the select list + group-by into the engine's MV definition
    * pieces: (sumCols, cntCols, avgCols, minMaxCols). */
  def parseSelectList(select: String, groupCols: Seq[String])
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    var sums, cnts, avgs, mms = Vector.empty[String]
    val groups = groupCols.map(strip).toSet
    select.split(",").map(_.trim).filter(_.nonEmpty).foreach { item0 =>
      // strip an optional trailing alias — output names are engine-defined
      val item = item0.replaceAll("""(?is)\s+AS\s+[\w`]+\s*$""", "").trim
      item match {
        case CountStar() => // n_rows is always maintained
        case AggCol(fn, c0) =>
          val c = strip(c0)
          fn.toUpperCase match {
            case "SUM" => sums :+= c
            case "COUNT" => cnts :+= c
            case "AVG" => avgs :+= c
            case "MIN" | "MAX" => if (!mms.contains(c)) mms :+= c
          }
        case BareCol(c) if groups.contains(strip(c)) => // a group column
        case other => throw new IllegalArgumentException(
          s"materialized view select list supports group columns, COUNT(*), " +
            s"and SUM/COUNT/AVG/MIN/MAX(column) only; got: $other")
      }
    }
    (sums.distinct, cnts.distinct, avgs.distinct, mms)
  }

  /** Parse `fk = dk [AND …]` join conditions into (factCol, dimCol) pairs.
    * Qualifiers orient the sides when present (either `fact.a = dim.b`
    * order works); unqualified conditions read left = fact, right = dim. */
  def parseJoinKeys(on: String, fact: String, dim: String): Seq[(String, String)] = {
    def bare(t: String): String = strip(t.substring(t.lastIndexOf('.') + 1))
    def owner(t: String): Option[String] = {
      val i = t.lastIndexOf('.')
      if (i < 0) None else Some(t.substring(0, i))
    }
    def isDim(o: Option[String]): Boolean = o.exists(q =>
      dim == q || dim.endsWith(s".$q") || q.endsWith(s".$dim"))
    splitKw(on, "AND").map(_.trim).filter(_.nonEmpty).map { c =>
      c.split("=").map(_.trim) match {
        case Array(l, r) =>
          if (isDim(owner(l)) && !isDim(owner(r))) (bare(r), bare(l))
          else (bare(l), bare(r))
        case _ => throw new IllegalArgumentException(
          s"materialized view JOIN supports equi-conditions only; got: $c")
      }
    }
  }

  /** Parse `src [JOIN d1 ON c1 [JOIN d2 ON c2 …]] [WHERE pred]` into
    * (source, dims, where). Chained JOINs build a snowflake in statement
    * order (a later ON may reference an earlier dim's carried column);
    * each ON supports equi-conditions only ([[parseJoinKeys]]). */
  def parseFromClause(fromClause: String)
      : (String, Seq[(String, Seq[(String, String)])], Option[String]) = {
    val (joins, where) = splitKw(fromClause, "WHERE", 2) match {
      case Seq(j, w) => (j.trim, Some(w.trim))
      case Seq(j) => (j.trim, None)
    }
    val segs = splitKw(joins, "JOIN").map(_.trim).filter(_.nonEmpty)
    val source = strip(segs.head)
    val dims = segs.tail.map { seg =>
      splitKw(seg, "ON", 2) match {
        case Seq(tbl, cond) =>
          val t = strip(tbl)
          (t, parseJoinKeys(cond.trim, source, t))
        case _ => throw new IllegalArgumentException(
          s"materialized view JOIN needs an ON clause; got: $seg")
      }
    }
    (source, dims, where)
  }

  /** keyword-token split that ignores matches inside single-quoted string
    * literals and backtick identifiers (r16 — a WHERE predicate containing
    * the token ` JOIN ` in a literal used to misparse the FROM clause).
    * limit semantics follow String.split(_, n). */
  private def splitKw(s: String, kw: String, limit: Int = 0): Seq[String] = {
    def outsideQuotes(pos: Int): Boolean = {
      var inS = false; var inB = false; var i = 0
      while (i < pos) {
        val c = s.charAt(i)
        if (c == '\'' && !inB) inS = !inS
        else if (c == '`' && !inS) inB = !inB
        i += 1
      }
      !inS && !inB
    }
    val cuts = ("(?is)\\s+" + kw + "\\s+").r.findAllMatchIn(s)
      .filter(m => outsideQuotes(m.start)).toList
    val take = if (limit > 0) cuts.take(limit - 1) else cuts
    val parts = Seq.newBuilder[String]
    var prev = 0
    take.foreach { m => parts += s.substring(prev, m.start); prev = m.end }
    parts += s.substring(prev)
    parts.result()
  }

  private def strip(c: String): String = c.replace("`", "").trim
}

case class CreateLakeMaterializedViewCommand(
    catalogName: String, name: String, source: String,
    groupCols: Seq[String], sumCols: Seq[String], cntCols: Seq[String],
    avgCols: Seq[String], minMaxCols: Seq[String], filterSql: Option[String],
    dims: Seq[(String, Seq[(String, String)])],
    rewrite: Option[String] = None)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlViews.lakeOf(spark, catalogName).createMaterializedView(
      name, source, groupCols, sumCols, minMaxCols, cntCols, avgCols,
      filterSql, dims = dims, rewrite = rewrite)))
}

case class RefreshLakeMaterializedViewCommand(catalogName: String, name: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("applied_snapshot", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlViews.lakeOf(spark, catalogName).refreshMaterializedView(name)))
}
