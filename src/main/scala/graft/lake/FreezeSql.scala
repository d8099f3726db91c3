package graft.lake

import java.nio.charset.StandardCharsets
import Meta._

/** DuckDB-executable freeze companion (reference freeze.sql: the frozen
  * output is ATTACHed and queried by plain DuckDB; src/pgducklake_freeze.cpp
  * copies the 28 `ducklake_*` metadata tables). The JVM cannot write a
  * binary DuckDB database, so the freeze emits the same content as SQL that
  * stock DuckDB executes directly:
  *
  *   - `views.sql` — one CREATE VIEW per live table reproducing the
  *     merge-on-read read path in pure SQL: per-schema-epoch column
  *     mapping, existence defaults for files predating a column, and the
  *     positional-delete anti-join. `duckdb -c ".read views.sql"` then
  *     `SELECT * FROM <schema>_<table>` returns exactly what the engine's
  *     scan returns.
  *   - `ducklake_catalog.sql` — CREATE TABLE + INSERT for the
  *     `ducklake_*` metadata layout (the table list of
  *     pgducklake_freeze.cpp:32-60), so the catalog rows themselves are
  *     queryable cross-engine.
  *
  * Like the reference (freeze.sql Test 2), inlined data must be flushed
  * before freezing for the views to cover it; tables with live inline
  * batches get a warning comment in `views.sql`.
  */
object FreezeSql {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"
  private def qi(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** Spark DDL type → DuckDB SQL type (scalar surface; nested types pass
    * through Spark DDL, which DuckDB's STRUCT/LIST syntax does not parse —
    * those columns are left uncast in the views). */
  private def duckType(sparkDdl: String): Option[String] =
    sparkDdl.toUpperCase.takeWhile(_ != '(') match {
      case "INT" | "INTEGER" => Some("INTEGER")
      case "BIGINT" | "LONG" => Some("BIGINT")
      case "SMALLINT" | "SHORT" => Some("SMALLINT")
      case "TINYINT" | "BYTE" => Some("TINYINT")
      case "STRING" | "VARCHAR" => Some("VARCHAR")
      case "DOUBLE" => Some("DOUBLE")
      case "FLOAT" | "REAL" => Some("REAL")
      case "BOOLEAN" => Some("BOOLEAN")
      case "DATE" => Some("DATE")
      case "TIMESTAMP" => Some("TIMESTAMPTZ")
      case "TIMESTAMP_NTZ" => Some("TIMESTAMP")
      case "DECIMAL" => Some(sparkDdl.toUpperCase)
      case "BINARY" => Some("BLOB")
      case _ => None
    }

  private def castAs(inner: String, sparkDdl: String): String =
    duckType(sparkDdl).map(t => s"CAST($inner AS $t)").getOrElse(inner)

  def emit(st: CatalogState, dir: String): Unit = {
    val io = StoreIO.forPath(dir)
    io.putString(s"$dir/views.sql", viewsSql(st))
    io.putString(s"$dir/ducklake_catalog.sql", catalogSql(st))
  }

  // ------------------------------------------------------------- views.sql

  private[lake] def viewsSql(st: CatalogState): String = {
    val cur = st.currentSnapshotId
    val sb = new StringBuilder
    sb ++= "-- graft-lake freeze: merge-on-read views over the frozen parquet\n"
    sb ++= "-- (execute with plain DuckDB: .read views.sql)\n\n"
    st.tables.filter(t => liveAt(t.begin, t.end, cur)).foreach { t =>
      sb ++= tableView(st, t, cur)
      sb ++= "\n"
    }
    sb.result()
  }

  private def tableView(st: CatalogState, t: TableEntry, cur: Long): String = {
    val cols = st.columnsAt(t.tableId, cur)
    val files = st.filesAt(t.tableId, cur)
    val deletes = st.deleteFilesAt(t.tableId, cur)
    val inlined = st.inlinedAt(t.tableId, cur)
    val viewName = qi(s"${t.schemaName}_${t.tableName}")
    val sb = new StringBuilder
    if (inlined.nonEmpty)
      sb ++= s"-- WARNING: ${t.schemaName}.${t.tableName} has ${inlined.map(_.rowsJson.length).sum} " +
        "inlined rows not covered by this view — run flush_inlined_data before freeze\n"
    if (files.isEmpty) {
      val colList = cols.map(c =>
        s"${castAs("NULL", c.dataType)} AS ${qi(c.name)}").mkString(", ")
      return sb.result() +
        s"CREATE OR REPLACE VIEW $viewName AS SELECT $colList WHERE false;\n"
    }
    // one branch per schema epoch: physical names mapped to current names,
    // missing columns filled with the frozen existence default
    val branches = files.groupBy(_.schemaVersion).toSeq.sortBy(_._1).map {
      case (sv, fs) =>
        val physById = st.columnsAt(t.tableId, sv).map(c => c.columnId -> c.name).toMap
        val sel = cols.map { c =>
          physById.get(c.columnId) match {
            case Some(pn) => s"${qi(pn)} AS ${qi(c.name)}"
            case None =>
              castAs(c.existsDefault.getOrElse("NULL"), c.dataType) + s" AS ${qi(c.name)}"
          }
        }.mkString(", ")
        val list = fs.map(f => q(f.path)).mkString("[", ", ", "]")
        s"  SELECT $sel, regexp_extract(filename, '[^/]+$$') AS _f, file_row_number AS _p\n" +
          s"  FROM read_parquet($list, filename=true, file_row_number=true)"
    }
    val src = branches.mkString("\n  UNION ALL BY NAME\n")
    val colList = cols.map(c => qi(c.name)).mkString(", ")
    val body =
      if (deletes.isEmpty)
        s"SELECT $colList FROM (\n$src\n) _src;"
      else {
        val delList = deletes.map(d => q(d.path + "/*.parquet")).mkString("[", ", ", "]")
        s"SELECT $colList FROM (\n$src\n) _src\n" +
          s"WHERE NOT EXISTS (SELECT 1 FROM read_parquet($delList) _d\n" +
          s"                  WHERE _d.file = _src._f AND _d.pos = _src._p);"
      }
    sb.result() + s"CREATE OR REPLACE VIEW $viewName AS\n$body\n"
  }

  // --------------------------------------------------- ducklake_catalog.sql

  /** the reference's frozen table list (pgducklake_freeze.cpp:32-60) */
  private val AllTables = Seq(
    "ducklake_metadata", "ducklake_snapshot", "ducklake_snapshot_changes",
    "ducklake_schema", "ducklake_table", "ducklake_view", "ducklake_tag",
    "ducklake_column_tag", "ducklake_data_file", "ducklake_file_column_stats",
    "ducklake_delete_file", "ducklake_column", "ducklake_table_stats",
    "ducklake_table_column_stats", "ducklake_partition_info",
    "ducklake_partition_column", "ducklake_file_partition_value",
    "ducklake_files_scheduled_for_deletion", "ducklake_inlined_data_tables",
    "ducklake_column_mapping", "ducklake_name_mapping",
    "ducklake_schema_versions", "ducklake_macro", "ducklake_macro_impl",
    "ducklake_macro_parameters", "ducklake_sort_info",
    "ducklake_sort_expression", "ducklake_file_variant_stats")

  private def lit(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => lit(x)
    case s: String => q(s)
    case b: Boolean => b.toString.toUpperCase
    case n => n.toString
  }

  private def insertAll(sb: StringBuilder, table: String, columns: Seq[String],
      rows: Seq[Seq[Any]]): Unit = {
    sb ++= s"CREATE OR REPLACE TABLE $table (" +
      columns.mkString(", ") + ");\n"
    if (rows.nonEmpty) {
      sb ++= s"INSERT INTO $table VALUES\n"
      sb ++= rows.map(r => r.map(lit).mkString("  (", ", ", ")")).mkString(",\n")
      sb ++= ";\n"
    }
  }

  private[lake] def catalogSql(st: CatalogState): String = {
    val sb = new StringBuilder
    sb ++= "-- graft-lake freeze: ducklake_* metadata layout " +
      "(table list per pgducklake_freeze.cpp:32-60)\n\n"
    val cur = st.currentSnapshotId

    insertAll(sb, "ducklake_metadata",
      Seq("key VARCHAR", "value VARCHAR"),
      Seq(Seq("version", "0.2"), Seq("created_by", "graft-lake freeze")))

    insertAll(sb, "ducklake_snapshot",
      Seq("snapshot_id BIGINT", "snapshot_time TIMESTAMPTZ",
        "schema_version BIGINT", "next_catalog_id BIGINT", "next_file_id BIGINT"),
      st.snapshots.map(s => Seq(s.snapshotId,
        new java.sql.Timestamp(s.snapshotTimeMs).toString, s.schemaVersion,
        st.nextTableId, st.nextFileId)))
    // snapshot_time as VARCHAR literal → cast on insert
    // (DuckDB casts string→timestamptz implicitly in INSERT)

    insertAll(sb, "ducklake_snapshot_changes",
      Seq("snapshot_id BIGINT", "changes_made VARCHAR", "author VARCHAR",
        "commit_message VARCHAR", "commit_extra_info VARCHAR"),
      st.snapshots.map(s => Seq(s.snapshotId, s.changes.mkString(","),
        None, s.commitMessage, None)))

    val schemas = (st.tables.map(_.schemaName) ++
      st.tags.filter(t => LakeViewDefs.isViewTag(t) || LakeViewDefs.isMacroTag(t))
        .map(LakeViewDefs.schemaOfScope)).distinct.sorted.zipWithIndex
    insertAll(sb, "ducklake_schema",
      Seq("schema_id BIGINT", "schema_uuid VARCHAR", "begin_snapshot BIGINT",
        "end_snapshot BIGINT", "schema_name VARCHAR"),
      schemas.map { case (n, i) => Seq(i, s"graft-schema-$i", 0L, None, n) })
    val schemaId = schemas.toMap

    insertAll(sb, "ducklake_table",
      Seq("table_id BIGINT", "table_uuid VARCHAR", "begin_snapshot BIGINT",
        "end_snapshot BIGINT", "schema_id BIGINT", "table_name VARCHAR"),
      st.tables.map(t => Seq(t.tableId, s"graft-table-${t.tableId}", t.begin,
        t.end, schemaId(t.schemaName), t.tableName)))

    insertAll(sb, "ducklake_column",
      Seq("column_id BIGINT", "begin_snapshot BIGINT", "end_snapshot BIGINT",
        "table_id BIGINT", "column_order BIGINT", "column_name VARCHAR",
        "column_type VARCHAR", "initial_default VARCHAR",
        "default_value VARCHAR", "nulls_allowed BOOLEAN", "parent_column BIGINT"),
      st.columns.map(c => Seq(c.columnId, c.begin, c.end, c.tableId,
        c.ordinal.toLong, c.name,
        if (c.dataType.equalsIgnoreCase("geometry")) "geometry"
        else TypeMap.sparkToDuck(LakeRead.sparkType(c.dataType)),
        c.existsDefault, c.defaultValue, c.nullable, None)))

    insertAll(sb, "ducklake_data_file",
      Seq("data_file_id BIGINT", "table_id BIGINT", "begin_snapshot BIGINT",
        "end_snapshot BIGINT", "file_order BIGINT", "path VARCHAR",
        "path_is_relative BOOLEAN", "file_format VARCHAR",
        "record_count BIGINT", "file_size_bytes BIGINT", "footer_size BIGINT",
        "row_id_start BIGINT", "partition_id BIGINT"),
      st.files.map(f => Seq(f.fileId, f.tableId, f.begin, f.end, None,
        f.path, false, "parquet", f.rowCount, f.fileSizeBytes, None,
        f.firstRowId, None)))

    insertAll(sb, "ducklake_file_column_stats",
      Seq("data_file_id BIGINT", "table_id BIGINT", "column_id BIGINT",
        "column_size_bytes BIGINT", "value_count BIGINT", "null_count BIGINT",
        "min_value VARCHAR", "max_value VARCHAR", "contains_nan BOOLEAN"),
      st.stats.flatMap { s =>
        val file = st.files.find(_.fileId == s.fileId)
        val colId = file.flatMap(f => st.columns.find(c =>
          c.tableId == f.tableId && c.name == s.columnName).map(_.columnId))
        file.map(f => Seq(s.fileId, f.tableId, colId, None,
          f.rowCount, s.nullCount, s.minValue, s.maxValue, None))
      })

    insertAll(sb, "ducklake_delete_file",
      Seq("delete_file_id BIGINT", "table_id BIGINT", "begin_snapshot BIGINT",
        "end_snapshot BIGINT", "data_file_id BIGINT", "path VARCHAR",
        "path_is_relative BOOLEAN", "format VARCHAR", "delete_count BIGINT",
        "file_size_bytes BIGINT", "footer_size BIGINT"),
      st.deleteFiles.map(d => Seq(d.deleteFileId, d.tableId, d.begin, d.end,
        d.countsByFile.keys.headOption.map(_.toLong), d.path, false,
        "parquet", d.deleteCount, None, None)))

    insertAll(sb, "ducklake_partition_info",
      Seq("partition_id BIGINT", "table_id BIGINT", "begin_snapshot BIGINT",
        "end_snapshot BIGINT"),
      st.partitionInfo.map(p => Seq(p.tableId, p.tableId, p.begin, p.end)))

    insertAll(sb, "ducklake_partition_column",
      Seq("partition_id BIGINT", "table_id BIGINT",
        "partition_key_index BIGINT", "column_id BIGINT", "transform VARCHAR"),
      st.partitionInfo.flatMap(p => p.keys.zipWithIndex.map { case (k, i) =>
        // key names were recorded under p.begin's epoch: resolve the
        // columnId against the columns live THEN (a reused name from a
        // different epoch must not capture the reference)
        val colId = st.columns.find(c =>
          c.tableId == p.tableId && c.name == k.column &&
            liveAt(c.begin, c.end, p.begin)).map(_.columnId)
        Seq(p.tableId, p.tableId, i.toLong, colId, k.transform)
      }))

    insertAll(sb, "ducklake_file_partition_value",
      Seq("data_file_id BIGINT", "table_id BIGINT",
        "partition_key_index BIGINT", "partition_value VARCHAR"),
      st.files.flatMap { f =>
        val keys = st.partitionKeysAt(f.tableId, f.begin)
        keys.zipWithIndex.flatMap { case (k, i) =>
          f.partitionValues.get(k.label).map(v =>
            Seq(f.fileId, f.tableId, i.toLong, v))
        }
      })

    insertAll(sb, "ducklake_tag",
      Seq("object_id VARCHAR", "begin_snapshot BIGINT", "end_snapshot BIGINT",
        "key VARCHAR", "value VARCHAR"),
      st.tags.filterNot(t => Thaw.isForeignCarrier(t) || Thaw.isColumnTag(t)
          || LakeViewDefs.isViewTag(t) || LakeViewDefs.isMacroTag(t))
        .map(t => Seq(t.scope, t.begin, t.end, t.key, t.value)))

    insertAll(sb, "ducklake_column_tag",
      Seq("table_id BIGINT", "column_id BIGINT", "begin_snapshot BIGINT",
        "end_snapshot BIGINT", "key VARCHAR", "value VARCHAR"),
      st.tags.filter(Thaw.isColumnTag).map { t =>
        val (tid, cid) = Thaw.columnTagIds(t)
        Seq(tid, cid, t.begin, t.end, t.key, t.value)
      })

    // Native view/macro definitions (scopes view:/macro:, excluded from
    // ducklake_tag above) emit reference-shaped with dialect 'spark' and
    // schema_id keying; preserved foreign carrier rows re-emit with their
    // original columns (Thaw.ForeignTables round-trip) — field-name union
    // when a dataset holds both. Timestamps/binary surface as
    // implicit-castable string literals.
    val foreignBy = st.tags.filter(Thaw.isForeignCarrier)
      .groupBy(_.scope.stripPrefix("ducklake:"))
      .collect { case (tn, tags) if tags.nonEmpty => tn -> Thaw.foreignRowsFromTags(tags) }
    def carrierMaxId(tn: String, field: String): Long =
      foreignBy.get(tn).map { case (sch, rows) =>
        val i = sch.fieldNames.indexOf(field)
        if (i < 0) 0L
        else rows.map(r => if (r.isNullAt(i)) 0L else r.get(i) match {
          case n: java.lang.Number => n.longValue
          case s: String => scala.util.Try(s.toLong).getOrElse(0L)
          case _ => 0L
        }).foldLeft(0L)(math.max)
      }.getOrElse(0L)
    val viewTags = st.tags.filter(LakeViewDefs.isViewTag)
      .sortBy(t => (t.begin, t.scope, t.key))
    val viewBase = carrierMaxId("ducklake_view", "view_id")
    val nativeViews: Seq[(Seq[String], Seq[Seq[Any]])] =
      if (viewTags.isEmpty) Nil
      else Seq((
        Seq("view_id BIGINT", "view_uuid VARCHAR", "begin_snapshot BIGINT",
          "end_snapshot BIGINT", "schema_id BIGINT", "view_name VARCHAR",
          "dialect VARCHAR", "sql VARCHAR", "column_aliases VARCHAR"),
        viewTags.zipWithIndex.map { case (t, i) =>
          val v = LakeViewDefs.decodeView(t.value)
          Seq(viewBase + i + 1, v.uuid, t.begin, t.end,
            schemaId.getOrElse(LakeViewDefs.schemaOfScope(t), 0L), t.key,
            "spark", v.sql,
            if (v.aliases.isEmpty) None else Some(v.aliases.mkString(",")))
        }))
    val macroTags = st.tags.filter(LakeViewDefs.isMacroTag)
      .sortBy(t => (t.begin, t.scope, t.key))
    val macroBase = carrierMaxId("ducklake_macro", "macro_id")
    val decodedMacros = macroTags.zipWithIndex.map { case (t, i) =>
      (macroBase + i + 1, t, LakeViewDefs.decodeMacro(t.value))
    }
    val nativeByTable: Map[String, (Seq[String], Seq[Seq[Any]])] = (Map(
      "ducklake_macro" -> ((
        Seq("macro_id BIGINT", "macro_uuid VARCHAR", "begin_snapshot BIGINT",
          "end_snapshot BIGINT", "schema_id BIGINT", "macro_name VARCHAR",
          "macro_type VARCHAR"),
        decodedMacros.map { case (id, t, m) =>
          Seq(id, m.uuid, t.begin, t.end,
            schemaId.getOrElse(LakeViewDefs.schemaOfScope(t), 0L), t.key, m.kind)
        }: Seq[Seq[Any]])),
      "ducklake_macro_impl" -> ((
        Seq("macro_id BIGINT", "begin_snapshot BIGINT", "end_snapshot BIGINT",
          "impl_id BIGINT", "dialect VARCHAR", "sql VARCHAR"),
        decodedMacros.map { case (id, t, m) =>
          Seq(id, t.begin, t.end, 0L, "spark", m.sql)
        }: Seq[Seq[Any]])),
      "ducklake_macro_parameters" -> ((
        Seq("macro_id BIGINT", "begin_snapshot BIGINT", "end_snapshot BIGINT",
          "impl_id BIGINT", "parameter_index BIGINT", "parameter_name VARCHAR"),
        decodedMacros.flatMap { case (id, t, m) =>
          m.params.zipWithIndex.map { case (p, pi) =>
            Seq(id, t.begin, t.end, 0L, pi.toLong, p): Seq[Any]
          }
        }: Seq[Seq[Any]]))
    ).filter(_._2._2.nonEmpty)) ++ nativeViews.map("ducklake_view" -> _).toMap
    val foreignEmitted = Thaw.ForeignTables.flatMap { tn =>
      val carrier = foreignBy.get(tn).map { case (schema, rows) =>
        (schema.map(f => s"${qi(f.name)} ${TypeMap.sparkToDuck(f.dataType)}"),
          rows.map(_.toSeq.map {
            case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
            case t: java.sql.Timestamp => t.toString
            case other => other
          }): Seq[Seq[Any]])
      }
      val native = nativeByTable.get(tn)
      val merged: Option[(Seq[String], Seq[Seq[Any]])] = (carrier, native) match {
        case (None, None) => None
        case (Some(c), None) => Some(c)
        case (None, Some(n)) => Some(n)
        case (Some((cCols, cRows)), Some((nCols, nRows))) =>
          // field-name union: carrier columns first, native-only appended
          def base(col: String) = col.trim.split("\\s+").head.replace("\"", "")
          val cNames = cCols.map(base)
          val extra = nCols.filterNot(nc => cNames.contains(base(nc)))
          val allCols = cCols ++ extra
          val allNames = allCols.map(base)
          val nIdx = nCols.map(base).zipWithIndex.toMap
          Some((allCols,
            cRows.map(r => r ++ Seq.fill(extra.length)(None)) ++
            nRows.map(r => allNames.map(nm => nIdx.get(nm).map(r).getOrElse(None)))))
      }
      merged.map { case (cols, rows) => insertAll(sb, tn, cols, rows); tn }
    }.toSet

    insertAll(sb, "ducklake_sort_info",
      Seq("sort_info_id BIGINT", "table_id BIGINT", "begin_snapshot BIGINT",
        "end_snapshot BIGINT"),
      st.sortInfo.map(s => Seq(s.tableId, s.tableId, s.begin, s.end)))

    insertAll(sb, "ducklake_sort_expression",
      Seq("sort_info_id BIGINT", "sort_key_index BIGINT", "expression VARCHAR",
        "ascending BOOLEAN", "nulls_first BOOLEAN"),
      st.sortInfo.flatMap(s => s.keys.zipWithIndex.map { case (k, i) =>
        Seq(s.tableId, i.toLong, k.expr, k.ascending, k.nullsFirst)
      }))

    insertAll(sb, "ducklake_files_scheduled_for_deletion",
      Seq("data_file_id BIGINT", "path VARCHAR", "path_is_relative BOOLEAN",
        "schedule_start TIMESTAMPTZ"),
      Nil) // frozen exports never carry pending deletions (freeze.cpp:102)

    // variant path min/max recorded at write time (LakeWrite.append) under
    // synthetic "<col>.$.<path>" stat names (pgducklake_freeze.cpp:60)
    insertAll(sb, "ducklake_file_variant_stats",
      Seq("data_file_id BIGINT", "table_id BIGINT", "column_name VARCHAR",
        "variant_path VARCHAR", "value_type VARCHAR", "min_value VARCHAR",
        "max_value VARCHAR", "null_count BIGINT"),
      st.stats.filter(_.columnName.contains(".$.")).flatMap { s =>
        val Array(colName, path) = s.columnName.split("\\.\\$\\.", 2)
        st.files.find(_.fileId == s.fileId).map(f =>
          Seq(s.fileId, f.tableId, colName, "$." + path, s.dataType,
            s.minValue, s.maxValue, s.nullCount))
      })

    insertAll(sb, "ducklake_schema_versions",
      Seq("begin_snapshot BIGINT", "schema_version BIGINT"),
      st.snapshots.map(s => Seq(s.snapshotId, s.schemaVersion)))

    // remaining layout tables have no engine-side content — emitted empty
    // so the 28-table layout matches the reference exactly
    val emitted = Set("ducklake_metadata", "ducklake_snapshot",
      "ducklake_snapshot_changes", "ducklake_schema", "ducklake_table",
      "ducklake_column", "ducklake_data_file", "ducklake_file_column_stats",
      "ducklake_delete_file", "ducklake_partition_info",
      "ducklake_partition_column", "ducklake_file_partition_value",
      "ducklake_tag", "ducklake_column_tag",
      "ducklake_sort_info", "ducklake_sort_expression",
      "ducklake_files_scheduled_for_deletion", "ducklake_schema_versions",
      "ducklake_file_variant_stats")
    AllTables.filterNot(t => emitted(t) || foreignEmitted(t)).foreach(t =>
      insertAll(sb, t, Seq("placeholder VARCHAR"), Nil))

    sb.result()
  }
}
