package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import Meta._

/** Thaw — the inverse of freeze (VERDICT r4 #3): import an
  * externally-written `ducklake_*` catalog back into [[CatalogState]] and
  * replay it into a [[MetadataStore]] with full per-snapshot fidelity
  * (time travel and the change feed work on the imported history).
  *
  * Reference surface being reproduced: the live FDW attach of a foreign
  * DuckLake catalog (src/pgducklake_fdw.cpp:167-190) and external-writer
  * sync (test/regression/sql/metadata_sync.sql) — another engine commits
  * snapshots into the shared catalog and this engine sees them after a
  * re-read.
  *
  * Interop format: one parquet dataset per `ducklake_*` table (the layout
  * of pgducklake_freeze.cpp:32-60, same columns FreezeSql emits as SQL) —
  * the engine-neutral materialization any engine can COPY to/from.
  * `Lake.freeze` writes these dumps under `<target>/catalog_parquet/`;
  * an external writer mutates them (adds snapshot + data-file rows for
  * parquet it wrote itself); `Lake.importCatalog` replays the result.
  *
  * Extension columns (lossless round-trip of engine concepts the
  * reference's narrower layout can't carry; absent in foreign catalogs →
  * defaults): `ducklake_column.spark_type` (exact Spark DDL, else the
  * DuckDB type string is mapped), `ducklake_data_file.schema_version` /
  * `explicit_row_ids` (else derived from begin_snapshot via
  * ducklake_schema_versions / false), `ducklake_delete_file
  * .counts_by_file` (JSON fileId→count, else the single data_file_id row
  * the reference schema models). Delete part-file lists are re-listed on
  * demand (deleteReadPaths' directory fallback).
  */
object Thaw {

  // ------------------------------------------- foreign (preserved) datasets

  /** Catalog tables we PRESERVE but don't execute — views and macros
    * (4 of the 28 frozen tables, pgducklake_freeze.cpp:38,55-57). The
    * reference doesn't support CREATE VIEW/macros either
    * (docs/ducklake_feature_coverage.md:30), but a foreign catalog may
    * carry rows, and an import that silently DROPS them corrupts the
    * catalog on re-export. Rows round-trip losslessly as carrier tags
    * (scope `ducklake:<table>`, key = content hash, value = JSON
    * {ddl, vals}); freeze/dumpParquet re-emit them as real datasets and
    * exclude the carriers from `ducklake_tag`. */
  private[lake] val ForeignTables: Seq[String] =
    Seq("ducklake_view", "ducklake_macro", "ducklake_macro_impl",
      "ducklake_macro_parameters")

  private[lake] def foreignScope(table: String): String = s"ducklake:$table"
  private[lake] def isForeignCarrier(t: TagEntry): Boolean =
    t.scope.startsWith("ducklake:")

  /** column comments/tags live in scope `col:<tid>:<colId>` and freeze as
    * ducklake_column_tag (pgducklake_freeze.cpp:40), never ducklake_tag */
  private[lake] def isColumnTag(t: TagEntry): Boolean = t.scope.startsWith("col:")
  private[lake] def columnTagIds(t: TagEntry): (Long, Long) = {
    val p = t.scope.split(':')
    (p(1).toLong, p(2).toLong)
  }

  /** value → portable string (binary → base64; everything else toString) */
  private def fieldToString(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => other.toString
  }

  /** portable string → typed value for the round-tripped schema */
  private def stringToField(dt: DataType, s: String): Any =
    if (s == null) null
    else dt match {
      case StringType => s
      case LongType => s.toLong
      case IntegerType => s.toInt
      case ShortType => s.toShort
      case ByteType => s.toByte
      case BooleanType => s.toBoolean
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case _: DecimalType => new java.math.BigDecimal(s)
      case BinaryType => java.util.Base64.getDecoder.decode(s)
      case TimestampType =>
        try java.sql.Timestamp.valueOf(s)
        catch { case _: Exception =>
          java.sql.Timestamp.from(java.time.Instant.parse(s)) }
      case _ => s
    }

  /** types outside the portable palette round-trip as VARCHAR */
  private def portableSchema(schema: StructType): StructType =
    StructType(schema.map { f =>
      f.dataType match {
        case StringType | LongType | IntegerType | ShortType | ByteType |
             BooleanType | DoubleType | FloatType | BinaryType |
             TimestampType => f.copy(nullable = true)
        case _: DecimalType => f.copy(nullable = true)
        case _ => f.copy(dataType = StringType, nullable = true)
      }
    })

  private def foreignRowJson(schema: StructType, row: Row): String = {
    import org.json4s.JsonDSL._
    import org.json4s._
    val vals = JArray(schema.indices.map { i =>
      if (row.isNullAt(i)) (JNull: JValue)
      else JString(fieldToString(row.get(i)))
    }.toList)
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("ddl" -> portableSchema(schema).toDDL) ~ ("vals" -> vals)))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** rebuild (schema, rows) of one foreign dataset from its carrier tags */
  private[lake] def foreignRowsFromTags(tags: Seq[TagEntry]): (StructType, Seq[Row]) = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val parsed = tags.sortBy(_.key)
      .map(t => org.json4s.jackson.JsonMethods.parse(t.value))
    val schema = StructType.fromDDL((parsed.head \ "ddl").extract[String])
    val rows = parsed.map { j =>
      val vals = (j \ "vals").asInstanceOf[JArray].arr
      Row.fromSeq(schema.zip(vals).map {
        case (_, JNull) => null
        case (f, JString(s)) => stringToField(f.dataType, s)
        case (f, other) => stringToField(f.dataType, other.values.toString)
      })
    }
    (schema, rows)
  }

  // ---------------------------------------------------------------- schemas

  private def fld(n: String, t: DataType) = StructField(n, t)
  private val snapshotSchema = StructType(Seq(
    fld("snapshot_id", LongType), fld("snapshot_time_ms", LongType),
    fld("schema_version", LongType)))
  private val changesSchema = StructType(Seq(
    fld("snapshot_id", LongType), fld("changes_made", StringType),
    fld("commit_message", StringType)))
  private val tableSchema = StructType(Seq(
    fld("table_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType), fld("schema_name", StringType),
    fld("table_name", StringType)))
  private val columnSchema = StructType(Seq(
    fld("column_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType), fld("table_id", LongType),
    fld("column_order", LongType), fld("column_name", StringType),
    fld("column_type", StringType), fld("initial_default", StringType),
    fld("default_value", StringType), fld("nulls_allowed", BooleanType),
    fld("spark_type", StringType)))
  private val dataFileSchema = StructType(Seq(
    fld("data_file_id", LongType), fld("table_id", LongType),
    fld("begin_snapshot", LongType), fld("end_snapshot", LongType),
    fld("path", StringType), fld("record_count", LongType),
    fld("file_size_bytes", LongType), fld("row_id_start", LongType),
    fld("schema_version", LongType), fld("explicit_row_ids", BooleanType)))
  private val statsSchema = StructType(Seq(
    fld("data_file_id", LongType), fld("table_id", LongType),
    fld("column_id", LongType), fld("null_count", LongType),
    fld("min_value", StringType), fld("max_value", StringType)))
  private val deleteFileSchema = StructType(Seq(
    fld("delete_file_id", LongType), fld("table_id", LongType),
    fld("begin_snapshot", LongType), fld("end_snapshot", LongType),
    fld("data_file_id", LongType), fld("path", StringType),
    fld("delete_count", LongType), fld("counts_by_file", StringType)))
  private val partInfoSchema = StructType(Seq(
    fld("table_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType)))
  private val partColSchema = StructType(Seq(
    fld("table_id", LongType), fld("begin_snapshot", LongType),
    fld("partition_key_index", LongType), fld("column_name", StringType),
    fld("transform", StringType)))
  private val filePartValSchema = StructType(Seq(
    fld("data_file_id", LongType), fld("partition_key_index", LongType),
    fld("partition_key_label", StringType), fld("partition_value", StringType)))
  private val sortInfoSchema = StructType(Seq(
    fld("table_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType)))
  private val sortExprSchema = StructType(Seq(
    fld("table_id", LongType), fld("begin_snapshot", LongType),
    fld("sort_key_index", LongType), fld("expression", StringType),
    fld("ascending", BooleanType), fld("nulls_first", BooleanType)))
  private val tagSchema = StructType(Seq(
    fld("object_id", StringType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType), fld("key", StringType),
    fld("value", StringType)))
  private val columnTagSchema = StructType(Seq(
    fld("table_id", LongType), fld("column_id", LongType),
    fld("begin_snapshot", LongType), fld("end_snapshot", LongType),
    fld("key", StringType), fld("value", StringType)))
  // reference-shaped view/macro datasets (pgducklake_freeze.cpp:38,55-57);
  // schema_name inline like every other dataset in this dump (the load path
  // also accepts the reference's schema_id keying via ducklake_schema)
  private val viewSchema = StructType(Seq(
    fld("view_id", LongType), fld("view_uuid", StringType),
    fld("begin_snapshot", LongType), fld("end_snapshot", LongType),
    fld("schema_name", StringType), fld("view_name", StringType),
    fld("dialect", StringType), fld("sql", StringType),
    fld("column_aliases", StringType)))
  private val macroSchema = StructType(Seq(
    fld("macro_id", LongType), fld("macro_uuid", StringType),
    fld("begin_snapshot", LongType), fld("end_snapshot", LongType),
    fld("schema_name", StringType), fld("macro_name", StringType),
    fld("macro_type", StringType))) // 'scalar' | 'table' (r9 table macros)
  private val macroImplSchema = StructType(Seq(
    fld("macro_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType), fld("impl_id", LongType),
    fld("dialect", StringType), fld("sql", StringType)))
  private val macroParamSchema = StructType(Seq(
    fld("macro_id", LongType), fld("begin_snapshot", LongType),
    fld("end_snapshot", LongType), fld("impl_id", LongType),
    fld("parameter_index", LongType), fld("parameter_name", StringType)))

  private def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private def jl(v: Option[Long]): java.lang.Long = v.map(jl).orNull

  // ------------------------------------------------------------------- dump

  /** write the catalog as `ducklake_*` parquet datasets under `dir`.
    * Each dataset is a tiny driver-local frame; the 13 writes run as
    * concurrent Spark jobs so a freeze pays ~1 job latency, not 13. */
  def dumpParquet(spark: SparkSession, st: CatalogState, dir: String): Unit = {
    val pending = Vector.newBuilder[(String, StructType, Seq[Row])]
    def w(name: String, schema: StructType, rows: Seq[Row]): Unit =
      pending += ((name, schema, rows))
    w("ducklake_snapshot", snapshotSchema, st.snapshots.map(s =>
      Row(jl(s.snapshotId), jl(s.snapshotTimeMs), jl(s.schemaVersion))))
    w("ducklake_snapshot_changes", changesSchema, st.snapshots.map(s =>
      Row(jl(s.snapshotId), s.changes.mkString(","), s.commitMessage.orNull)))
    w("ducklake_table", tableSchema, st.tables.map(t =>
      Row(jl(t.tableId), jl(t.begin), jl(t.end), t.schemaName, t.tableName)))
    w("ducklake_column", columnSchema, st.columns.map(c =>
      Row(jl(c.columnId), jl(c.begin), jl(c.end), jl(c.tableId),
        jl(c.ordinal.toLong), c.name,
        if (c.dataType.equalsIgnoreCase("geometry")) "geometry"
        else TypeMap.sparkToDuck(LakeRead.sparkType(c.dataType)),
        c.existsDefault.orNull, c.defaultValue.orNull,
        java.lang.Boolean.valueOf(c.nullable), c.dataType)))
    w("ducklake_data_file", dataFileSchema, st.files.map(f =>
      Row(jl(f.fileId), jl(f.tableId), jl(f.begin), jl(f.end), f.path,
        jl(f.rowCount), jl(f.fileSizeBytes), jl(f.firstRowId),
        jl(f.schemaVersion), java.lang.Boolean.valueOf(f.explicitRowIds))))
    val colIdByName = st.columns.map(c => (c.tableId, c.name) -> c.columnId).toMap
    val fileById = st.files.map(f => f.fileId -> f).toMap
    w("ducklake_file_column_stats", statsSchema, st.stats.flatMap { s =>
      fileById.get(s.fileId).map { f =>
        Row(jl(s.fileId), jl(f.tableId),
          jl(colIdByName.getOrElse((f.tableId, s.columnName), -1L)),
          jl(s.nullCount), s.minValue.orNull, s.maxValue.orNull)
      }
    })
    w("ducklake_delete_file", deleteFileSchema, st.deleteFiles.map { d =>
      val json = d.countsByFile.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      Row(jl(d.deleteFileId), jl(d.tableId), jl(d.begin), jl(d.end),
        jl(d.countsByFile.keys.headOption.map(_.toLong)), d.path,
        jl(d.deleteCount), json)
    })
    w("ducklake_partition_info", partInfoSchema, st.partitionInfo.map(p =>
      Row(jl(p.tableId), jl(p.begin), jl(p.end))))
    w("ducklake_partition_column", partColSchema, st.partitionInfo.flatMap(p =>
      p.keys.zipWithIndex.map { case (k, i) =>
        Row(jl(p.tableId), jl(p.begin), jl(i.toLong), k.column, k.transform)
      }))
    w("ducklake_file_partition_value", filePartValSchema, st.files.flatMap { f =>
      // partition_key_index must follow the live partition-spec key order
      // for the file's table/epoch (ADVICE r5): a reference-shaped consumer
      // (and load()'s index fallback) resolves values BY INDEX, so
      // label-sorted order mis-keys multi-key specs whose labels aren't
      // alphabetical. Labels outside the spec (stale epochs) keep a stable
      // slot after the live keys.
      val liveKeys = st.partitionInfo.filter(p => p.tableId == f.tableId &&
        liveAt(p.begin, p.end, f.begin)).flatMap(_.keys).map(_.label)
      val idxOf = liveKeys.zipWithIndex.toMap
      val (inSpec, stale) = f.partitionValues.toSeq.partition(kv => idxOf.contains(kv._1))
      inSpec.map { case (label, v) => Row(jl(f.fileId), jl(idxOf(label).toLong), label, v) } ++
        stale.sortBy(_._1).zipWithIndex.map { case ((label, v), i) =>
          Row(jl(f.fileId), jl((liveKeys.size + i).toLong), label, v)
        }
    })
    w("ducklake_sort_info", sortInfoSchema, st.sortInfo.map(s =>
      Row(jl(s.tableId), jl(s.begin), jl(s.end))))
    w("ducklake_sort_expression", sortExprSchema, st.sortInfo.flatMap(s =>
      s.keys.zipWithIndex.map { case (k, i) =>
        Row(jl(s.tableId), jl(s.begin), jl(i.toLong), k.expr,
          java.lang.Boolean.valueOf(k.ascending),
          java.lang.Boolean.valueOf(k.nullsFirst))
      }))
    w("ducklake_tag", tagSchema,
      st.tags.filterNot(t => isForeignCarrier(t) || isColumnTag(t)
          || LakeViewDefs.isViewTag(t) || LakeViewDefs.isMacroTag(t)).map(t =>
        Row(t.scope, jl(t.begin), jl(t.end), t.key, t.value)))
    w("ducklake_column_tag", columnTagSchema, st.tags.filter(isColumnTag).map { t =>
      val (tid, cid) = columnTagIds(t)
      Row(jl(tid), jl(cid), jl(t.begin), jl(t.end), t.key, t.value)
    })
    // Native view/macro definitions (tag scopes view:/macro:, never dumped
    // into ducklake_tag above) emit as the reference-shaped datasets with
    // dialect 'spark'; preserved FOREIGN rows (carrier tags) re-emerge
    // unchanged in the same datasets. Native ids start above the carrier
    // max so a DuckDB consumer never sees an id collision.
    val carrierData: Map[String, (StructType, Seq[Row])] =
      st.tags.filter(isForeignCarrier)
        .groupBy(_.scope.stripPrefix("ducklake:"))
        .collect { case (tn, tags) if tags.nonEmpty => tn -> foreignRowsFromTags(tags) }
    def carrierMaxId(tn: String, field: String): Long =
      carrierData.get(tn).map { case (sch, rows) =>
        val i = sch.fieldNames.indexOf(field)
        if (i < 0) 0L
        else rows.map(r => if (r.isNullAt(i)) 0L else r.get(i) match {
          case l: java.lang.Long => l.longValue
          case n: java.lang.Number => n.longValue
          case s: String => scala.util.Try(s.toLong).getOrElse(0L)
          case _ => 0L
        }).foldLeft(0L)(math.max)
      }.getOrElse(0L)
    // carrier + native rows under one dataset: field-name union, null-padded
    def mergeForeign(tn: String, nativeSchema: StructType, nativeRows: Seq[Row]): Unit =
      carrierData.get(tn) match {
        case None => if (nativeRows.nonEmpty) w(tn, nativeSchema, nativeRows)
        case Some((cs, cr)) =>
          if (nativeRows.isEmpty) w(tn, cs, cr)
          else {
            val merged = StructType(cs ++ nativeSchema.filterNot(f =>
              cs.fieldNames.contains(f.name)))
            def pad(from: StructType)(r: Row) = Row.fromSeq(merged.map { f =>
              val i = from.fieldNames.indexOf(f.name)
              if (i < 0) null else r.get(i)
            })
            w(tn, merged, cr.map(pad(cs)) ++ nativeRows.map(pad(nativeSchema)))
          }
      }
    val viewTags = st.tags.filter(LakeViewDefs.isViewTag)
      .sortBy(t => (t.begin, t.scope, t.key))
    mergeForeign("ducklake_view", viewSchema, {
      val base = carrierMaxId("ducklake_view", "view_id")
      viewTags.zipWithIndex.map { case (t, i) =>
        val v = LakeViewDefs.decodeView(t.value)
        Row(jl(base + i + 1), v.uuid, jl(t.begin), jl(t.end),
          LakeViewDefs.schemaOfScope(t), t.key, "spark", v.sql,
          if (v.aliases.isEmpty) null else v.aliases.mkString(","))
      }
    })
    val macroTags = st.tags.filter(LakeViewDefs.isMacroTag)
      .sortBy(t => (t.begin, t.scope, t.key))
    val macroBase = carrierMaxId("ducklake_macro", "macro_id")
    val macroRows = macroTags.zipWithIndex.map { case (t, i) =>
      (jl(macroBase + i + 1), t, LakeViewDefs.decodeMacro(t.value))
    }
    mergeForeign("ducklake_macro", macroSchema, macroRows.map { case (id, t, m) =>
      Row(id, m.uuid, jl(t.begin), jl(t.end), LakeViewDefs.schemaOfScope(t),
        t.key, m.kind)
    })
    mergeForeign("ducklake_macro_impl", macroImplSchema,
      macroRows.map { case (id, t, m) =>
        Row(id, jl(t.begin), jl(t.end), jl(0L), "spark", m.sql)
      })
    mergeForeign("ducklake_macro_parameters", macroParamSchema,
      macroRows.flatMap { case (id, t, m) =>
        m.params.zipWithIndex.map { case (p, pi) =>
          Row(id, jl(t.begin), jl(t.end), jl(0L), jl(pi.toLong), p)
        }
      })

    // driver-side writes (zero Spark jobs): every dataset's rows are
    // already driver-resident; a per-dataset job submission was the
    // dominant cost of freeze (and thus of l36/l38's freeze→import loops)
    val hconf = spark.sessionState.newHadoopConf()
    pending.result().foreach { case (name, schema, rows) =>
      // empty datasets are skipped: load() treats an absent dataset as
      // empty, and each file saved is a writer init here plus a read job
      // on every future import. ducklake_snapshot (the mandatory marker)
      // is never empty — a catalog always has its initial snapshot.
      if (rows.nonEmpty)
        org.apache.spark.sql.graft.DriverParquet.write(
          s"$dir/$name.parquet", schema, rows, hconf)
    }
  }

  // ------------------------------------------------------------------- load

  /** DuckDB type string → Spark DDL (inverse of TypeMap for the scalar
    * palette; `t[]` lists recurse; unknown falls back to string) */
  private[lake] def duckToSparkDdl(duck: String): String = {
    val d = duck.trim
    if (d.equalsIgnoreCase("geometry")) "geometry" // annotation kept distinct
    else if (d.endsWith("[]")) s"array<${duckToSparkDdl(d.dropRight(2))}>"
    else if (d.toLowerCase.startsWith("decimal")) d.toLowerCase
    else TypeMap.duckToSpark.get(d.toLowerCase).map(_.sql.toLowerCase)
      .getOrElse(d.toLowerCase match {
        case "integer" => "int" // DuckDB alias palette
        case "bigint" => "bigint"
        case "smallint" => "smallint"
        case "tinyint" => "tinyint"
        case "real" => "float"
        case "double" => "double"
        case _ => "string"
      })
  }

  /** read a `ducklake_*` parquet catalog into CatalogState */
  def load(spark: SparkSession, dir: String): CatalogState = {
    // existence through the path's OWN FileSystem — java.io.File silently
    // reads every dataset as absent on s3://gs:// (ADVICE r5: an
    // object-store catalog would thaw as empty with no error)
    lazy val hconf = spark.sessionState.newHadoopConf()
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    // ducklake_snapshot is mandatory in every DuckLake catalog — its
    // absence means `dir` is not a catalog dump (typo'd path, wrong FS),
    // and "successfully imported an empty catalog" is a data-loss-shaped
    // lie. The other datasets are genuinely optional (a catalog with no
    // deletes has no ducklake_delete_file dump).
    if (!exists(s"$dir/ducklake_snapshot.parquet"))
      throw new IllegalArgumentException(
        s"$dir has no ducklake_snapshot.parquet — not a DuckLake catalog dump")
    // memoized + prefetched: several datasets are consulted more than once
    // below, and each spark.read costs a footer-inference pass + a collect
    // job — ~18 sequential tiny jobs dominate import wall-clock, so fetch
    // them concurrently up front (Spark schedules concurrent jobs fine)
    val rdCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[Row]]()
    def rd(name: String): Seq[Row] = rdCache.computeIfAbsent(name, _ => {
      val p = s"$dir/$name.parquet"
      if (exists(p)) spark.read.parquet(p).collect().toSeq
      else Seq.empty
    })
    locally {
      val known = Seq("ducklake_snapshot", "ducklake_snapshot_changes",
        "ducklake_schema", "ducklake_table", "ducklake_column",
        "ducklake_data_file", "ducklake_file_column_stats",
        "ducklake_delete_file", "ducklake_partition_info",
        "ducklake_partition_column", "ducklake_file_partition_value",
        "ducklake_sort_info", "ducklake_sort_expression", "ducklake_tag",
        "ducklake_column_tag", "ducklake_view", "ducklake_macro",
        "ducklake_macro_impl", "ducklake_macro_parameters")
      val threads = known.map(n => new Thread(() => { rd(n); () }))
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    def opt(r: Row, field: String): Option[Long] = {
      val i = r.schema.fieldNames.indexOf(field)
      if (i < 0 || r.isNullAt(i)) None else Some(r.getLong(i))
    }
    def get(r: Row, field: String, dflt: Long = -1L): Long =
      opt(r, field).getOrElse(dflt)
    def getS(r: Row, field: String): Option[String] = {
      val i = r.schema.fieldNames.indexOf(field)
      if (i < 0 || r.isNullAt(i)) None else Some(r.getString(i))
    }
    def getB(r: Row, field: String, dflt: Boolean): Boolean = {
      val i = r.schema.fieldNames.indexOf(field)
      if (i < 0 || r.isNullAt(i)) dflt else r.getBoolean(i)
    }

    // snapshot_time: our dumps carry epoch ms (snapshot_time_ms BIGINT); a
    // foreign engine COPYing the reference-shaped layout writes a
    // TIMESTAMPTZ column named snapshot_time
    def getTimeMs(r: Row): Long = opt(r, "snapshot_time_ms").getOrElse {
      val i = r.schema.fieldNames.indexOf("snapshot_time")
      if (i < 0 || r.isNullAt(i)) 0L
      else r.get(i) match {
        case t: java.sql.Timestamp => t.getTime
        case t: java.time.Instant => t.toEpochMilli
        case t: java.time.LocalDateTime =>
          t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        case _ => 0L
      }
    }
    val msgs = rd("ducklake_snapshot_changes").map(r =>
      get(r, "snapshot_id") -> (getS(r, "changes_made"), getS(r, "commit_message"))).toMap
    val snapshots = rd("ducklake_snapshot").map { r =>
      val sid = get(r, "snapshot_id")
      val (ch, msg) = msgs.getOrElse(sid, (None, None))
      Snapshot(sid, getTimeMs(r), get(r, "schema_version", 0L),
        ch.map(_.split(',').toList.filter(_.nonEmpty)).getOrElse(Nil), msg)
    }.sortBy(_.snapshotId).toVector

    val schemaVerOf: Long => Long = {
      val m = snapshots.map(s => s.snapshotId -> s.schemaVersion).toMap
      sid => m.getOrElse(sid, 0L)
    }

    // schema name: inline in our dumps; the reference-shaped layout keys
    // tables by schema_id into ducklake_schema
    val schemaNameById = rd("ducklake_schema").map(r =>
      get(r, "schema_id") -> getS(r, "schema_name").getOrElse("main")).toMap
    val tables = rd("ducklake_table").map(r =>
      TableEntry(get(r, "table_id"),
        getS(r, "schema_name").orElse(
          opt(r, "schema_id").flatMap(schemaNameById.get)).getOrElse("main"),
        getS(r, "table_name").get, get(r, "begin_snapshot"),
        opt(r, "end_snapshot"))).toVector

    val columns = rd("ducklake_column").map { r =>
      val sparkDdl = getS(r, "spark_type").getOrElse(
        duckToSparkDdl(getS(r, "column_type").getOrElse("varchar")))
      ColumnEntry(get(r, "table_id"), get(r, "column_id"),
        get(r, "column_order", 0L).toInt, getS(r, "column_name").get,
        sparkDdl, getB(r, "nulls_allowed", dflt = true),
        getS(r, "default_value"), get(r, "begin_snapshot"),
        opt(r, "end_snapshot"), getS(r, "initial_default"))
    }.toVector

    // partition keys: our dumps carry (table_id, begin_snapshot,
    // column_name); the reference-shaped layout carries (partition_id =
    // table_id, column_id) with no epoch — group under begin -1 and
    // resolve column ids through ducklake_column
    val colNameForId = rd("ducklake_column")
      .map(r => (get(r, "table_id"), get(r, "column_id")) ->
        getS(r, "column_name").getOrElse("")).toMap
    val partCols = rd("ducklake_partition_column")
      .groupBy(r => (opt(r, "table_id").orElse(opt(r, "partition_id"))
        .getOrElse(-1L), get(r, "begin_snapshot")))
      .map { case (k, rs) =>
        k -> rs.sortBy(get(_, "partition_key_index"))
          .map(r => PartitionKey(getS(r, "transform").getOrElse("identity"),
            getS(r, "column_name").orElse(opt(r, "column_id")
              .flatMap(cid => colNameForId.get((k._1, cid)))).getOrElse("")))
          .filter(_.column.nonEmpty).toList
      }
    val partitionInfo = rd("ducklake_partition_info").map { r =>
      val tid = get(r, "table_id")
      val begin = get(r, "begin_snapshot")
      val keys = partCols.getOrElse((tid, begin),
        partCols.getOrElse((tid, -1L), Nil))
      PartitionInfoEntry(tid, keys, begin, opt(r, "end_snapshot"))
    }.toVector

    // per-file partition values: our dumps carry the key LABEL; the
    // reference-shaped layout only the key index — resolve via the file's
    // table partition spec after files are known
    val fpvRows = rd("ducklake_file_partition_value")
    val files0 = rd("ducklake_data_file").map { r =>
      val begin = get(r, "begin_snapshot")
      val path = getS(r, "path").get
      DataFileEntry(get(r, "data_file_id"), get(r, "table_id"), path,
        path.split('/').last, get(r, "record_count", 0L),
        get(r, "file_size_bytes", 0L), get(r, "row_id_start", 0L),
        opt(r, "schema_version").getOrElse(schemaVerOf(begin)),
        getB(r, "explicit_row_ids", dflt = false),
        Map.empty[String, String], begin, opt(r, "end_snapshot"))
    }.toVector
    val fileById0 = files0.map(f => f.fileId -> f).toMap
    val partValsByFile: Map[Long, Map[String, String]] = fpvRows
      .groupBy(get(_, "data_file_id"))
      .flatMap { case (fid, rs) =>
        fileById0.get(fid).map { f =>
          val keys = partitionInfo.filter(p => p.tableId == f.tableId &&
            liveAt(p.begin, p.end, f.begin)).flatMap(_.keys)
          fid -> rs.flatMap { r =>
            getS(r, "partition_key_label")
              .orElse(opt(r, "partition_key_index")
                .flatMap(i => keys.lift(i.toInt)).map(_.label))
              .map(_ -> getS(r, "partition_value").getOrElse(""))
          }.toMap
        }
      }
    val files = files0.map(f =>
      f.copy(partitionValues = partValsByFile.getOrElse(f.fileId, Map.empty)))

    val colNameById = columns.map(c => (c.tableId, c.columnId) -> c).toMap
    val fileById = files.map(f => f.fileId -> f).toMap
    val stats = rd("ducklake_file_column_stats").flatMap { r =>
      for {
        f <- fileById.get(get(r, "data_file_id"))
        c <- colNameById.get((f.tableId, get(r, "column_id")))
      } yield FileColumnStats(f.fileId, c.name, c.dataType,
        getS(r, "min_value"), getS(r, "max_value"), get(r, "null_count", 0L))
    }.toVector

    val deleteFiles = rd("ducklake_delete_file").map { r =>
      val counts: Map[String, Long] = getS(r, "counts_by_file") match {
        case Some(json) => // {"5": 3, "7": 1}
          "\"?(\\d+)\"?\\s*:\\s*(\\d+)".r.findAllMatchIn(json)
            .map(m => m.group(1) -> m.group(2).toLong).toMap
        case None => // reference shape: one data_file_id per delete file
          opt(r, "data_file_id")
            .map(id => Map(id.toString -> get(r, "delete_count", 0L)))
            .getOrElse(Map.empty)
      }
      DeleteFileEntry(get(r, "delete_file_id"), get(r, "table_id"),
        getS(r, "path").get, get(r, "delete_count", 0L), counts,
        get(r, "begin_snapshot"), opt(r, "end_snapshot"))
    }.toVector

    // sort keys: reference-shaped expressions key by sort_info_id (=
    // tableId in our freeze emission) with no epoch — same fallback shape
    val sortExprs = rd("ducklake_sort_expression")
      .groupBy(r => (opt(r, "table_id").orElse(opt(r, "sort_info_id"))
        .getOrElse(-1L), get(r, "begin_snapshot")))
      .map { case (k, rs) =>
        k -> rs.sortBy(get(_, "sort_key_index"))
          .map(r => SortKey(getS(r, "expression").get,
            getB(r, "ascending", dflt = true),
            getB(r, "nulls_first", dflt = false))).toList
      }
    val sortInfo = rd("ducklake_sort_info").map { r =>
      val tid = get(r, "table_id")
      val begin = get(r, "begin_snapshot")
      SortInfoEntry(tid, sortExprs.getOrElse((tid, begin),
        sortExprs.getOrElse((tid, -1L), Nil)), begin, opt(r, "end_snapshot"))
    }.toVector

    val tags = rd("ducklake_tag").map(r =>
      TagEntry(getS(r, "object_id").getOrElse("global"),
        getS(r, "key").get, getS(r, "value").getOrElse(""),
        get(r, "begin_snapshot"), opt(r, "end_snapshot"))).toVector
    val colTags = rd("ducklake_column_tag").map(r =>
      TagEntry(s"col:${get(r, "table_id")}:${get(r, "column_id")}",
        getS(r, "key").get, getS(r, "value").getOrElse(""),
        get(r, "begin_snapshot"), opt(r, "end_snapshot"))).toVector

    def foreignDf(tn: String): Option[(StructType, Seq[Row])] = {
      val p = s"$dir/$tn.parquet"
      if (!exists(p)) None
      else {
        val df = spark.read.parquet(p)
        if (df.schema.fieldNames.sameElements(Array("placeholder"))) None
        else Some((df.schema, df.collect().toSeq))
      }
    }
    // spark-dialect view/macro rows import as NATIVE executable definitions
    // (scopes view:/macro: — the freeze emission's exact inverse, with the
    // row's real begin/end interval so time travel over definitions
    // survives the round trip); any other dialect stays an opaque carrier.
    val viewData = foreignDf("ducklake_view")
    val nativeViewTags = viewData.toSeq.flatMap { case (_, rows) =>
      rows.filter(r => getS(r, "dialect").contains("spark")).map { r =>
        val schema = getS(r, "schema_name")
          .orElse(opt(r, "schema_id").flatMap(schemaNameById.get))
          .getOrElse("main")
        TagEntry(LakeViewDefs.viewScope(schema), getS(r, "view_name").get,
          LakeViewDefs.encodeView(LakeViewDefs.ViewDef(getS(r, "sql").get,
            getS(r, "column_aliases").map(_.split(',').toList.filter(_.nonEmpty))
              .getOrElse(Nil),
            getS(r, "view_uuid").getOrElse(""))),
          get(r, "begin_snapshot"), opt(r, "end_snapshot"))
      }
    }
    val macroData = foreignDf("ducklake_macro")
    val implData = foreignDf("ducklake_macro_impl")
    val paramData = foreignDf("ducklake_macro_parameters")
    val implRows = implData.toSeq.flatMap(_._2)
    val sparkMacroIds = implRows.filter(r => getS(r, "dialect").contains("spark"))
      .map(get(_, "macro_id")).toSet
    val nativeMacroTags = macroData.toSeq.flatMap { case (_, rows) =>
      rows.filter(r => sparkMacroIds(get(r, "macro_id"))).flatMap { r =>
        val mid = get(r, "macro_id")
        val schema = getS(r, "schema_name")
          .orElse(opt(r, "schema_id").flatMap(schemaNameById.get)).getOrElse("main")
        implRows.find(ir => get(ir, "macro_id") == mid &&
          getS(ir, "dialect").contains("spark")).flatMap(getS(_, "sql")).map { body =>
          val params = paramData.toSeq.flatMap(_._2)
            .filter(pr => get(pr, "macro_id") == mid)
            .sortBy(get(_, "parameter_index"))
            .flatMap(getS(_, "parameter_name")).toList
          TagEntry(LakeViewDefs.macroScope(schema), getS(r, "macro_name").get,
            LakeViewDefs.encodeMacro(LakeViewDefs.MacroDef(params, body,
              getS(r, "macro_uuid").getOrElse(""),
              getS(r, "macro_type").getOrElse("scalar"))),
            get(r, "begin_snapshot"), opt(r, "end_snapshot"))
        }
      }
    }
    // remaining rows preserve losslessly as carrier tags (see
    // ForeignTables). The carrier tag's begin mirrors the row's
    // begin_snapshot so incremental re-sync picks up rows an external
    // writer added between syncs; the row's OWN begin/end columns ride
    // inside the JSON untouched. Rows already imported as native
    // definitions above never become carriers.
    def skipAsNative(tn: String, r: Row): Boolean = tn match {
      case "ducklake_view" => getS(r, "dialect").contains("spark")
      case "ducklake_macro" | "ducklake_macro_impl" | "ducklake_macro_parameters" =>
        sparkMacroIds(get(r, "macro_id"))
      case _ => false
    }
    val preread = Map("ducklake_view" -> viewData, "ducklake_macro" -> macroData,
      "ducklake_macro_impl" -> implData, "ducklake_macro_parameters" -> paramData)
    val foreignTags = ForeignTables.flatMap { tn =>
      preread.getOrElse(tn, foreignDf(tn)).toSeq.flatMap { case (schema, rows) =>
        rows.filterNot(skipAsNative(tn, _)).map { row =>
          val json = foreignRowJson(schema, row)
          TagEntry(foreignScope(tn), md5hex(json), json,
            opt(row, "begin_snapshot").getOrElse(0L), None)
        }
      }
    }.toVector

    CatalogState(snapshots, tables, columns, files, deleteFiles, stats,
      partitionInfo, sortInfo, inlined = Vector.empty,
      tags ++ colTags ++ nativeViewTags.toVector ++ nativeMacroTags.toVector
        ++ foreignTags,
      scheduledDeletions = Vector.empty)
  }

  // ----------------------------------------------------------------- replay

  /** reconstruct one CommitDelta per snapshot from interval-versioned rows:
    * `begin == sid` → new entry, `end == Some(sid)` → ended id. Replaying
    * them into an empty store reproduces the full history — time travel
    * and the change feed see the imported snapshots exactly as the
    * external writer committed them.
    *
    * Expired-history safety: a catalog whose old snapshots were expired
    * (reference expire_snapshots) carries entity rows whose `begin` is not
    * any surviving snapshot id — predating the first survivor OR falling
    * in an interior id gap (non-contiguous foreign histories). Those rows
    * attach to the first surviving snapshot >= begin (last, if none is)
    * with their original interval intact — liveAt() works off the stored
    * begin/end, so visibility at every surviving snapshot is unchanged;
    * only the delta that introduces the row moves. */
  def reconstructDeltas(st: CatalogState): Seq[CommitDelta] = {
    val ids = st.snapshots.map(_.snapshotId) // sorted by load()
    val idSet = ids.toSet
    // the delta that introduces a row with this begin (ADVICE r5: interior
    // gaps must attach too, not just begin < first)
    def owner(begin: Long): Long =
      if (idSet.contains(begin)) begin
      else ids.find(_ >= begin).orElse(ids.lastOption).getOrElse(-1L)
    def isNew(begin: Long, s: Long): Boolean = owner(begin) == s
    st.snapshots.map { snap =>
      val s = snap.snapshotId
      CommitDelta(
        snapshot = snap,
        newTables = st.tables.filter(t => isNew(t.begin, s)).toList,
        endedTables = st.tables.filter(_.end.contains(s)).map(_.tableId).toList,
        newColumns = st.columns.filter(c => isNew(c.begin, s)).toList,
        endedColumns = st.columns.filter(_.end.contains(s))
          .map(c => s"${c.tableId}:${c.columnId}").toList,
        newFiles = st.files.filter(f => isNew(f.begin, s)).toList,
        endedFiles = st.files.filter(_.end.contains(s)).map(_.fileId).toList,
        newDeleteFiles = st.deleteFiles.filter(d => isNew(d.begin, s)).toList,
        endedDeleteFiles = st.deleteFiles.filter(_.end.contains(s))
          .map(_.deleteFileId).toList,
        newStats = st.stats.filter(stat =>
          st.files.exists(f => f.fileId == stat.fileId && isNew(f.begin, s))).toList,
        newPartitionInfo = st.partitionInfo.filter(p => isNew(p.begin, s)).toList,
        endedPartitionInfo = st.partitionInfo.filter(_.end.contains(s))
          .map(_.tableId).toList,
        newSortInfo = st.sortInfo.filter(p => isNew(p.begin, s)).toList,
        endedSortInfo = st.sortInfo.filter(_.end.contains(s)).map(_.tableId).toList,
        newInlined = st.inlined.filter(b => isNew(b.begin, s)).toList,
        endedInlined = st.inlined.filter(_.end.contains(s)).map(_.batchId).toList,
        newTags = st.tags.filter(t => isNew(t.begin, s)).toList,
        endedTags = st.tags.filter(_.end.contains(s))
          .map(t => s"${t.scope}:${t.key}").toList)
    }
  }
}
