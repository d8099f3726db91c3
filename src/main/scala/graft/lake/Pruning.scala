package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import Meta._

/** Driver-side file pruning for the snapshot-scoped scan (SURVEY.md §4.2):
  * evaluates pushed-down predicates against per-file column min/max stats
  * (`ducklake_file_column_stats`) and recorded hidden-partition values
  * (`ducklake_file_partition_value`), reference
  * src/pgducklake_partition.cpp:31-97 + test/regression/sql/partition.sql.
  *
  * Everything is CONSERVATIVE: a file is skipped only when a predicate
  * provably matches no row in it; any uncertainty (unparsable stat, unknown
  * filter shape, hive-escaped partition value) keeps the file.
  */
object Pruning {

  /** files that may contain rows satisfying every pushed filter */
  def prune(
      files: Vector[DataFileEntry],
      statsByFile: Long => Vector[FileColumnStats],
      colTypes: Map[String, String],
      partitionKeys: List[PartitionKey],
      filters: Seq[Filter]): Vector[DataFileEntry] =
    files.filter(f => filters.forall(fl => mayMatch(fl, f, statsByFile(f.fileId), colTypes, partitionKeys)))

  private def mayMatch(
      f: Filter,
      file: DataFileEntry,
      stats: Vector[FileColumnStats],
      colTypes: Map[String, String],
      partitionKeys: List[PartitionKey]): Boolean = f match {
    case And(l, r) =>
      mayMatch(l, file, stats, colTypes, partitionKeys) &&
        mayMatch(r, file, stats, colTypes, partitionKeys)
    case Or(l, r) =>
      mayMatch(l, file, stats, colTypes, partitionKeys) ||
        mayMatch(r, file, stats, colTypes, partitionKeys)
    case Not(EqualTo(a, v)) => // only prune when the file is constant = v
      !(statFor(stats, a).exists(s => (s.minValue, s.maxValue) match {
        case (Some(mn), Some(mx)) if mn == mx && s.nullCount == 0 =>
          cmpTyped(colTypes.getOrElse(a, s.dataType), mn, v).contains(0)
        case _ => false
      }))
    case EqualTo(a, v) => rangeMayContain(a, v, file, stats, colTypes, partitionKeys, eq = true)
    case EqualNullSafe(a, v) if v != null =>
      rangeMayContain(a, v, file, stats, colTypes, partitionKeys, eq = true)
    case GreaterThan(a, v) => boundMay(a, v, file, stats, colTypes, partitionKeys, (c: Int) => c > 0, upper = true)
    case GreaterThanOrEqual(a, v) => boundMay(a, v, file, stats, colTypes, partitionKeys, (c: Int) => c >= 0, upper = true)
    case LessThan(a, v) => boundMay(a, v, file, stats, colTypes, partitionKeys, (c: Int) => c < 0, upper = false)
    case LessThanOrEqual(a, v) => boundMay(a, v, file, stats, colTypes, partitionKeys, (c: Int) => c <= 0, upper = false)
    case In(a, vs) => vs.isEmpty ||
      vs.exists(v => rangeMayContain(a, v, file, stats, colTypes, partitionKeys, eq = true))
    case IsNull(a) =>
      statFor(stats, a).forall(s => s.nullCount > 0 || statsRowCount(file, s))
    case IsNotNull(a) =>
      statFor(stats, a).forall(s => s.nullCount < file.rowCount)
    case _ => true
  }

  private def statsRowCount(file: DataFileEntry, s: FileColumnStats): Boolean =
    // nullCount == 0 proves "no null rows" only when stats cover all rows
    s.nullCount != 0 || file.rowCount == 0

  private def statFor(stats: Vector[FileColumnStats], a: String): Option[FileColumnStats] =
    stats.find(_.columnName == a)

  /** Resolve a (possibly variant-synthetic) filter attribute to its base
    * name + usable stat. Variant filters arrive as "v.$.price#bigint"
    * (LakeVariantPruning.statName): the suffix is the query's REQUESTED
    * extraction type, the stat row was computed under the write-time
    * inferred type. Bounds only describe the query's values when the two
    * agree exactly — double→bigint truncation, numeric-vs-string ordering,
    * and cast-failure nulls in the recorded null count all break the
    * mapping otherwise — so a type mismatch drops the stat (file kept). */
  private def resolveStat(
      stats: Vector[FileColumnStats], a: String): (String, Option[FileColumnStats]) = {
    val i = a.lastIndexOf('#')
    if (i < 0) (a, statFor(stats, a))
    else {
      val base = a.substring(0, i)
      val req = a.substring(i + 1)
      (base, statFor(stats, base)
        .filter(_.dataType.toLowerCase.replace(" ", "") == req.replace(" ", "")))
    }
  }

  /** may the file contain a row with column a == v (or in [v,∞)/(−∞,v])? */
  private def rangeMayContain(
      a: String, v: Any, file: DataFileEntry, stats: Vector[FileColumnStats],
      colTypes: Map[String, String], partitionKeys: List[PartitionKey],
      eq: Boolean): Boolean = {
    if (v == null) return false // EqualTo(null) matches nothing in SQL
    val (base, stat) = resolveStat(stats, a)
    val byStats = stat match {
      case Some(s) if s.minValue.isEmpty && s.maxValue.isEmpty =>
        // no recorded bounds: all-null column can't equal a non-null literal
        s.nullCount < file.rowCount || file.rowCount == 0
      case Some(s) =>
        // colTypes fallback: variant-path stats ("v.$.price") have no table
        // column entry — their comparison type is the stat row's own
        val dt = colTypes.getOrElse(base, s.dataType)
        s.minValue.forall(mn => cmpTyped(dt, mn, v).forall(_ <= 0)) &&
          s.maxValue.forall(mx => cmpTyped(dt, mx, v).forall(_ >= 0))
      case None => true
    }
    byStats && partitionMayContain(base, v, file, colTypes, partitionKeys, PartCmp.Eq)
  }

  private def boundMay(
      a: String, v: Any, file: DataFileEntry, stats: Vector[FileColumnStats],
      colTypes: Map[String, String], partitionKeys: List[PartitionKey],
      ok: Int => Boolean, upper: Boolean): Boolean = {
    if (v == null) return false
    val (base, stat) = resolveStat(stats, a)
    val byStats = stat match {
      case Some(s) =>
        val bound = if (upper) s.maxValue else s.minValue
        bound.forall(b => cmpTyped(colTypes.getOrElse(base, s.dataType), b, v).forall(ok))
      case None => true
    }
    byStats && partitionMayContain(base, v, file, colTypes, partitionKeys,
      if (upper) PartCmp.Ge else PartCmp.Le)
  }

  private object PartCmp extends Enumeration { val Eq, Ge, Le = Value }

  /** hidden-partition pruning: a filter on base column c prunes against the
    * recorded transform value (identity directly; year/month/day/hour via
    * the transform of the literal — monotone transforms preserve order). */
  private def partitionMayContain(
      a: String, v: Any, file: DataFileEntry, colTypes: Map[String, String],
      partitionKeys: List[PartitionKey], mode: PartCmp.Value): Boolean =
    partitionKeys.filter(_.column == a).forall { pk =>
      file.partitionValues.get(pk.label) match {
        case None => true
        case Some(pv) if pv.contains("HIVE_DEFAULT_PARTITION") || pv.contains("%") => true
        case Some(pv) if mode != PartCmp.Eq && pk.transform.startsWith("bucket[") =>
          true // bucket is NOT monotone: only equality prunes
        case Some(pv) =>
          transformOfLiteral(pk.transform, v, colTypes.getOrElse(a, "string")) match {
            case None => true
            case Some(tv) =>
              val c = cmpTyped(if (pk.transform == "identity") colTypes.getOrElse(a, "string") else "int", pv, tv)
              c match {
                case None => true
                case Some(x) => mode match {
                  // Ge/Le are conservative (boundary partitions kept): for
                  // monotone transforms c > v ⇒ T(c) >= T(v)
                  case PartCmp.Eq => x == 0
                  case PartCmp.Ge => x >= 0
                  case PartCmp.Le => x <= 0
                }
              }
          }
      }
    }

  /** value of transform(literal); None = can't evaluate → no pruning */
  private def transformOfLiteral(transform: String, v: Any, dt: String): Option[Any] = {
    def toLocal: Option[java.time.LocalDateTime] = v match {
      case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay)
      case d: java.time.LocalDate => Some(d.atStartOfDay)
      case t: java.sql.Timestamp => Some(t.toLocalDateTime)
      case t: java.time.Instant => Some(java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC))
      case _ => None
    }
    transform match {
      case "identity" => Some(v)
      case "year" => toLocal.map(_.getYear)
      case "month" => toLocal.map(_.getMonthValue)
      case "day" => toLocal.map(_.getDayOfMonth)
      case "hour" => toLocal.map(_.getHour)
      case BucketTransform(n) =>
        // reproduce the writer's pmod(murmur3(col), n) on the literal via
        // Catalyst itself — Literal.create performs the same
        // external→internal conversion the column value saw, so the hash
        // bytes agree for every supported type
        try {
          val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(v)
          val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(lit), 42)
            .eval(null).asInstanceOf[Int]
          Some(((h % n) + n) % n)
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** typed comparison of a stored stat/partition string vs a filter literal;
    * None = unparsable → caller must not prune */
  private[lake] def cmpTyped(dataType: String, stored: String, literal: Any): Option[Int] = {
    val dt = dataType.toLowerCase
    try {
      if (dt.startsWith("int") || dt.startsWith("bigint") || dt.startsWith("smallint") ||
        dt.startsWith("tinyint") || dt.startsWith("decimal") || dt.startsWith("double") ||
        dt.startsWith("float") || dt.startsWith("long") || dt.startsWith("short") || dt.startsWith("byte"))
        Some(BigDecimal(stored).compare(BigDecimal(literal.toString)))
      else if (dt.startsWith("date")) {
        val l = literal match {
          case d: java.sql.Date => d.toLocalDate
          case d: java.time.LocalDate => d
          case s => java.time.LocalDate.parse(s.toString)
        }
        Some(java.time.LocalDate.parse(stored).compareTo(l))
      } else if (dt.startsWith("timestamp")) {
        val lm = literal match {
          case t: java.sql.Timestamp => t.getTime
          case t: java.time.Instant => t.toEpochMilli
          case s => java.sql.Timestamp.valueOf(s.toString).getTime
        }
        Some(java.sql.Timestamp.valueOf(stored).getTime.compareTo(lm))
      } else if (dt.startsWith("string") || dt.startsWith("varchar") || dt.startsWith("char"))
        Some(stored.compareTo(literal.toString))
      else if (dt.startsWith("boolean"))
        Some(stored.toBoolean.compareTo(literal.toString.toBoolean))
      else None
    } catch { case _: Exception => None }
  }

  /** sources.Filter → Column, for SupportsDelete.deleteWhere. */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case And(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }
}
