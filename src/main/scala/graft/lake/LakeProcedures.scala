package graft.lake

import java.util.{Iterator => JIterator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored-procedure surface for the maintenance/admin ops — Spark 4's
  * DSv2 `ProcedureCatalog` SPI, so every op the Scala facade exposes is
  * callable from pure SQL in the Iceberg CALL idiom:
  *
  * {{{
  *   CALL lake.system.maintain()
  *   CALL lake.system.vacuum(`table` => 'main.t')
  *   CALL lake.system.rewrite_zorder('main.t', array('a', 'b'))
  *   CALL lake.system.set_option('parquet_compression', 'zstd', 'main.t')
  *   CALL lake.system.expire_snapshots(86400000)
  *   SHOW PROCEDURES IN lake.system
  * }}}
  *
  * The reference routes `CALL ducklake.set_option` through a PG utility
  * hook into DuckDB (src/pgducklake_hooks.cpp:263-313, SURVEY A27 —
  * previously mapped "not needed"); this is the Spark-native version of
  * that routing, generalized to the whole maintenance surface. Each call
  * returns one summary row (a [[LocalScan]] — driver-side result, no job).
  */
object LakeProcedures {

  private val Str = StringType
  private val Lng = LongType

  /** one procedure: IN params (name, type, nullable-with-NULL-default),
    * output schema, and the action over a [[Lake]] */
  private case class Spec(
      name: String,
      params: Seq[(String, DataType, Boolean)],
      out: StructType,
      run: (Lake, InternalRow) => Seq[Any],
      describe: String)

  private def str(in: InternalRow, i: Int): String = in.getUTF8String(i).toString
  private def optLong(in: InternalRow, i: Int): Option[Long] =
    if (in.isNullAt(i)) None else Some(in.getLong(i))
  private def optStr(in: InternalRow, i: Int): Option[String] =
    if (in.isNullAt(i)) None else Some(str(in, i))

  private val specs: Seq[Spec] = Seq(
    Spec("maintain",
      Seq(("expire_older_than_ms", Lng, true), ("delete_older_than_ms", Lng, true),
        ("orphan_older_than_ms", Lng, true)),
      StructType(Seq(StructField("tables_maintained", Lng),
        StructField("mvs_refreshed", Lng),
        StructField("snapshots_expired", Lng),
        StructField("scheduled_deletions_cleaned", Lng),
        StructField("orphans_deleted", Lng),
        StructField("checkpoint_snapshot", Lng))),
      (lake, in) => {
        val m = lake.maintain(optLong(in, 0), optLong(in, 1), optLong(in, 2))
        Seq(m("tables_maintained"), m("mvs_refreshed"), m("snapshots_expired"),
          m("scheduled_deletions_cleaned"), m("orphans_deleted"),
          m("checkpoint_snapshot"))
      },
      "all-in-one maintenance: flush + bin-pack + rewrite per table, expire, reap, checkpoint"),
    Spec("vacuum", Seq(("table", Str, false)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.vacuum(str(in, 0))),
      "merge small files + rewrite files past the delete threshold"),
    Spec("merge_adjacent_files", Seq(("table", Str, false)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.mergeAdjacentFiles(str(in, 0))),
      "bin-pack small files to target_file_size"),
    Spec("flush_inlined_data", Seq(("table", Str, false)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.flushInlinedData(str(in, 0))),
      "rewrite inlined rows as parquet"),
    Spec("rewrite_sorted", Seq(("table", Str, false)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.rewriteSorted(str(in, 0))),
      "globally re-cluster by the declared sort order"),
    Spec("refresh_materialized_view", Seq(("view", Str, false)),
      StructType(Seq(StructField("applied_snapshot", Lng))),
      (lake, in) => Seq(lake.refreshMaterializedView(str(in, 0))),
      "fold the source change feed since the last refresh into the MV"),
    Spec("rewrite_zorder",
      Seq(("table", Str, false), ("columns", ArrayType(Str), false)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => {
        val arr = in.getArray(1)
        val cols = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
        Seq(lake.rewriteZOrder(str(in, 0), cols))
      },
      "re-cluster by the Morton interleave of 2-4 columns' quantile buckets"),
    Spec("expire_snapshots", Seq(("older_than_ms", Lng, true)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.expireSnapshots(optLong(in, 0))),
      "drop snapshots older than the window from the visible history"),
    Spec("cleanup_old_files", Seq(("older_than_ms", Lng, true)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.cleanupOldFiles(optLong(in, 0))),
      "physically delete scheduled (replaced/dropped) files past the window"),
    Spec("delete_orphaned_files", Seq(("older_than_ms", Lng, true)),
      StructType(Seq(StructField("orphans_deleted", Lng))),
      (lake, in) => Seq(lake.deleteOrphanedFiles(optLong(in, 0)).size.toLong),
      "reap files no catalog row references (crashed-writer residue)"),
    Spec("checkpoint", Nil,
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, _) => Seq(lake.checkpoint()),
      "fold the metadata log into one checkpoint file"),
    Spec("set_option",
      Seq(("key", Str, false), ("value", Str, false), ("table", Str, true)),
      StructType(Seq(StructField("snapshot_id", Lng))),
      (lake, in) => Seq(lake.setOption(str(in, 0), str(in, 1), optStr(in, 2))),
      "set a catalog option (global, or table-scoped via the third argument)"),
    Spec("migrate", Seq(("source_dir", Str, false), ("target_schema", Str, false)),
      StructType(Seq(StructField("tables_migrated", Lng))),
      (lake, in) => Seq(lake.migrate(str(in, 0), str(in, 1)).size.toLong),
      "import every parquet table under a directory as lake tables"))

  private val byName: Map[String, Spec] = specs.map(s => s.name -> s).toMap

  def names: Seq[String] = specs.map(_.name)

  def load(lakeF: () => Lake, procName: String): UnboundProcedure = {
    val spec = byName.getOrElse(procName,
      throw new RuntimeException(
        s"no procedure system.$procName (have: ${names.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = spec.name
      override def description(): String = spec.describe
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = spec.name
        override def description(): String = spec.describe
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] =
          spec.params.map { case (n, t, nullable) =>
            val b = ProcedureParameter.in(n, t)
            if (nullable) b.defaultValue("NULL")
            b.build()
          }.toArray
        override def call(input: InternalRow): JIterator[Scan] = {
          val values = spec.run(lakeF(), input).map {
            case s: String => UTF8String.fromString(s)
            case other => other
          }.toArray[Any]
          val row: InternalRow = new GenericInternalRow(values)
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = spec.out
          }).iterator()
        }
      }
    }
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
