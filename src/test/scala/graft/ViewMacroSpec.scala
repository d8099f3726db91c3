package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.lake.LakeViewDefs.{MacroDef, ViewDef}

/** Executable catalog views and scalar SQL macros: definition storage
  * (interval-versioned tags), snapshot-scoped execution, OR REPLACE
  * versioning + time travel, FunctionRegistry macro expansion, and the
  * freeze/thaw translation into reference-shaped ducklake_view /
  * ducklake_macro* rows (pgducklake_freeze.cpp:38,55-57). */
class ViewMacroSpec extends AnyFunSuite {
  import TestSession.spark

  private def newLake(): Lake =
    new Lake(spark, Files.createTempDirectory("graft_vm").toString)

  private val abSchema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType)))

  // ---- JSON codec (ADVICE r6: round-trip incl. defaults and colons) ------
  test("codec: view/macro JSON round-trips, defaults on absent fields") {
    val v = ViewDef("SELECT a, b FROM t WHERE a > 1", List("x", "y"), "uuid-1")
    assert(LakeViewDefs.decodeView(LakeViewDefs.encodeView(v)) == v)
    val noAlias = ViewDef("SELECT 1", Nil, "")
    assert(LakeViewDefs.decodeView(LakeViewDefs.encodeView(noAlias)) == noAlias)
    // absent optional fields default rather than throw
    assert(LakeViewDefs.decodeView("""{"sql":"SELECT 2"}""") ==
      ViewDef("SELECT 2", Nil, ""))
    val m = MacroDef(List("x", "y"), "x + y * 2", "uuid-m")
    assert(LakeViewDefs.decodeMacro(LakeViewDefs.encodeMacro(m)) == m)
    assert(LakeViewDefs.decodeMacro("""{"sql":"a + 1"}""") ==
      MacroDef(Nil, "a + 1", ""))
    // schema names containing ':' survive scope round-trips (scope is
    // "view:<schema>"; parsing splits on the FIRST colon only)
    assert(LakeViewDefs.viewScope("we:ird") == "view:we:ird")
  }

  // ---- execution ---------------------------------------------------------
  test("view executes against lake tables; aliases rename columns") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 101), (2, 102), (3, 103)).toDF("a", "b"))
    lake.createView("main.v", "SELECT a, b * 2 AS b2 FROM t WHERE a >= 2",
      aliases = Seq("k", "doubled"))
    val rows = lake.view("main.v").orderBy("k").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((2, 204), (3, 206)))
    assert(lake.view("main.v").columns.toSeq == Seq("k", "doubled"))
  }

  test("views stack: a view over a view resolves recursively") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    lake.createView("main.v1", "SELECT a, b FROM t WHERE a > 1")
    lake.createView("main.v2", "SELECT sum(b) AS s FROM v1")
    assert(lake.view("main.v2").collect().head.getLong(0) == 50L)
  }

  test("OR REPLACE versions the definition; AS-OF read sees old text AND old data") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    val s1 = lake.append("main.t", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val s2 = lake.createView("main.v", "SELECT count(*) AS n FROM t")
    lake.append("main.t", Seq((3, 30)).toDF("a", "b"))
    lake.createView("main.v", "SELECT sum(b) AS s FROM t") // replace
    assert(lake.view("main.v").collect().head.getLong(0) == 60L)
    // at s2: old definition (count), old data (2 rows)
    assert(lake.view("main.v", Some(s2)).collect().head.getLong(0) == 2L)
    assert(s1 < s2)
    // create with orReplace=false refuses
    intercept[IllegalArgumentException] {
      lake.createView("main.v", "SELECT 1", orReplace = false)
    }
    lake.dropView("main.v")
    intercept[NoSuchElementException] { lake.view("main.v") }
    // dropped now, but still resolvable at its live snapshot
    assert(lake.view("main.v", Some(s2)).collect().head.getLong(0) == 2L)
  }

  test("macro registers in the session and expands lazily at analysis time") {
    val lake = newLake()
    import spark.implicits._
    lake.createMacro("main.add_pct", Seq("x", "pct"), "x + x * pct / 100")
    val out = Seq(200, 400).toDF("v")
      .selectExpr("add_pct(v, 50) AS r").orderBy("r").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(300.0, 600.0)) // `/` is double div
    // wrong arity fails analysis
    val e = intercept[Exception] {
      Seq(1).toDF("v").selectExpr("add_pct(v)").collect()
    }
    assert(e.getMessage.contains("argument"))
    // a fresh Lake on the same store re-registers via registerMacros()
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("add_pct"))
    val lake2 = new Lake(spark, lake.root)
    lake2.registerMacros()
    assert(Seq(100).toDF("v").selectExpr("add_pct(v, 10) AS r")
      .collect().head.getDouble(0) == 110.0)
    assert(lake2.macros().collect().map(_.getString(1)).toSeq == Seq("add_pct"))
  }

  // ---- freeze / thaw translation ----------------------------------------
  test("freeze emits ducklake_view/macro rows, not tag blobs; thaw re-executes") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    lake.createView("main.v", "SELECT a, b FROM t WHERE a <= 2", Seq("x", "y"))
    lake.createView("main.v", "SELECT a, b FROM t WHERE a >= 2", Seq("x", "y"))
    lake.createMacro("main.twice", Seq("n"), "n * 2")
    val out = Files.createTempDirectory("graft_vm_fz").toString
    lake.freeze(out)
    val cat = s"$out/catalog_parquet"
    // ducklake_view: one row per generation (replace history preserved),
    // dialect spark, no view:/macro: rows left in ducklake_tag
    val vw = spark.read.parquet(s"$cat/ducklake_view.parquet")
      .orderBy("view_id").collect()
    assert(vw.length == 2)
    assert(vw.forall(_.getAs[String]("dialect") == "spark"))
    assert(vw.head.getAs[String]("sql").contains("a <= 2")
      && !vw.head.isNullAt(vw.head.fieldIndex("end_snapshot")))
    assert(vw.last.getAs[String]("sql").contains("a >= 2")
      && vw.last.isNullAt(vw.last.fieldIndex("end_snapshot")))
    assert(vw.forall(_.getAs[String]("column_aliases") == "x,y"))
    // absent dataset = empty since r12 (empty dumps are skipped entirely)
    val tagPath = java.nio.file.Paths.get(cat, "ducklake_tag.parquet")
    val tags =
      if (!java.nio.file.Files.exists(tagPath)) Array.empty[String]
      else spark.read.parquet(tagPath.toString)
        .select("object_id").collect().map(_.getString(0))
    assert(!tags.exists(s => s.startsWith("view:") || s.startsWith("macro:")))
    val mc = spark.read.parquet(s"$cat/ducklake_macro.parquet").collect()
    assert(mc.length == 1 && mc.head.getAs[String]("macro_name") == "twice")
    val mp = spark.read.parquet(s"$cat/ducklake_macro_parameters.parquet").collect()
    assert(mp.length == 1 && mp.head.getAs[String]("parameter_name") == "n")
    // thaw into a fresh store: view + macro come back EXECUTABLE with
    // definition history (the replaced generation resolves at its snapshot)
    val lake2 = new Lake(spark, Files.createTempDirectory("graft_vm_th").toString)
    lake2.importCatalog(cat)
    assert(lake2.view("main.v").orderBy("x").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 20), (3, 30)))
    val genEnd = vw.head.getAs[Long]("end_snapshot")
    assert(lake2.view("main.v", Some(genEnd - 1)).orderBy("x").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10), (2, 20)))
    lake2.registerMacros()
    assert(Seq(21).toDF("v").selectExpr("twice(v) AS r").collect()
      .head.getInt(0) == 42)
    // uuid stability across the round trip
    val uuid0 = lake.views().collect().head.getAs[String]("view_uuid")
    assert(lake2.views().collect().head.getAs[String]("view_uuid") == uuid0)
  }

  test("SQL surface: graft_view/graft_views/graft_macros TVFs") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val s1 = lake.createView("main.v", "SELECT sum(b) AS s FROM t")
    lake.append("main.t", Seq((3, 30)).toDF("a", "b"))
    lake.createMacro("main.neg", Seq("x"), "-x")
    assert(spark.sql(s"SELECT * FROM graft_view('${lake.root}', 'main.v')")
      .collect().head.getLong(0) == 60L)
    // AS-OF overload: definition AND data at the older snapshot
    assert(spark.sql(s"SELECT * FROM graft_view('${lake.root}', 'main.v', $s1)")
      .collect().head.getLong(0) == 30L)
    assert(spark.sql(s"SELECT view_name FROM graft_views('${lake.root}')")
      .collect().map(_.getString(0)).toSeq == Seq("v"))
    assert(spark.sql(s"SELECT macro_name, parameters FROM graft_macros('${lake.root}')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("neg", "x")))
  }

  test("foreign-dialect rows stay carriers; spark rows import native (mixed)") {
    import spark.implicits._
    val cat = Files.createTempDirectory("graft_vm_mixed").toString
    // a minimal foreign catalog: one snapshot, one duckdb view + one spark view
    Seq((0L, 0L)).toDF("snapshot_id", "schema_version")
      .withColumn("snapshot_time_ms", lit(0L))
      .write.parquet(s"$cat/ducklake_snapshot.parquet")
    Seq(
      (7L, "uuid-7", 0L, Option.empty[Long], "main", "duck_v", "duckdb",
        "SELECT 1", Option.empty[String]),
      (8L, "uuid-8", 0L, Option.empty[Long], "main", "spark_v", "spark",
        "SELECT 42 AS answer", Option.empty[String]))
      .toDF("view_id", "view_uuid", "begin_snapshot", "end_snapshot",
        "schema_name", "view_name", "dialect", "sql", "column_aliases")
      .write.parquet(s"$cat/ducklake_view.parquet")
    val st = Thaw.load(spark, cat)
    // spark view → native executable tag; duckdb view → carrier
    assert(st.tags.count(_.scope.startsWith("view:")) == 1)
    assert(st.tags.count(_.scope.startsWith("ducklake:")) == 1)
    val lake = new Lake(spark, Files.createTempDirectory("graft_vm_mx2").toString)
    lake.importCatalog(cat)
    assert(lake.view("main.spark_v").collect().head.getInt(0) == 42)
    // re-freeze: both rows re-emerge in ducklake_view, ids disjoint
    val out = Files.createTempDirectory("graft_vm_mx3").toString
    lake.freeze(out)
    val vw = spark.read.parquet(s"$out/catalog_parquet/ducklake_view.parquet")
      .collect()
    assert(vw.length == 2)
    assert(vw.map(_.getAs[Long]("view_id")).distinct.length == 2)
    assert(vw.exists(r => r.getAs[String]("view_name") == "duck_v"
      && r.getAs[String]("dialect") == "duckdb"))
    assert(vw.exists(r => r.getAs[String]("view_name") == "spark_v"
      && r.getAs[String]("dialect") == "spark"))
  }

  // ---- SQL statement surface (VERDICT r7 #4) -----------------------------
  test("SQL CREATE/DROP VIEW statements on a lake catalog, AS-OF consistent") {
    val root = Files.createTempDirectory("graft_vmsql").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    spark.conf.set("spark.sql.catalog.vmsql", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmsql.root", root)

    val s1 = spark.sql(
      "CREATE VIEW vmsql.main.sv AS SELECT a, b + 1 AS b1 FROM t WHERE a >= 2")
      .head.getLong(0)
    // a real versioned catalog row, byte-compatible with the API path
    assert(lake.views().select("view_name").as[String].collect().toSeq == Seq("sv"))
    // executes through the same machinery as API-created views
    assert(spark.sql(s"SELECT * FROM graft_view('$root', 'main.sv') ORDER BY a")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 21), (3, 31)))

    // plain CREATE VIEW (no OR REPLACE) refuses an existing name...
    intercept[Exception] {
      spark.sql("CREATE VIEW vmsql.main.sv AS SELECT a FROM t")
    }
    // ...IF NOT EXISTS is a no-op, OR REPLACE re-versions
    assert(spark.sql(
      "CREATE VIEW IF NOT EXISTS vmsql.main.sv AS SELECT a FROM t")
      .head.getLong(0) == -1L)
    spark.sql("CREATE OR REPLACE VIEW vmsql.main.sv AS SELECT count(*) AS n FROM t")
    assert(spark.sql(s"SELECT * FROM graft_view('$root', 'main.sv')")
      .head.getLong(0) == 3L)
    // time travel: the OLD definition resolves at the OLD snapshot
    assert(spark.sql(s"SELECT * FROM graft_view('$root', 'main.sv', $s1) ORDER BY a")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 21), (3, 31)))

    // plain SELECT through the catalog-qualified name (ResolveLakeViewRead
    // — Spark 4.1 ships ViewCatalog but no read rule of its own)
    assert(spark.sql("SELECT * FROM vmsql.main.sv").head.getLong(0) == 3L)
    // views stack under SQL reads too, and session as-of applies to both
    // the definition and the data
    spark.sql("CREATE VIEW vmsql.main.sv2 AS SELECT n + 1 AS n1 FROM sv")
    assert(spark.sql("SELECT n1 FROM vmsql.main.sv2").head.getLong(0) == 4L)
    // SHOW VIEWS over the lake catalog (+ LIKE pattern)
    assert(spark.sql("SHOW VIEWS IN vmsql.main").collect()
      .map(_.getString(1)).toSeq == Seq("sv", "sv2"))
    assert(spark.sql("SHOW VIEWS IN vmsql.main LIKE 'sv2'").count() == 1)
    spark.conf.set("spark.graft.lake.asOfSnapshot", s1.toString)
    try {
      val old = spark.sql("SELECT * FROM vmsql.main.sv ORDER BY a").collect()
      assert(old.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 21), (3, 31)))
    } finally spark.conf.unset("spark.graft.lake.asOfSnapshot")
    // ...and the inline VERSION AS OF form resolves definition + data at
    // that snapshot
    val ver = spark.sql(s"SELECT * FROM vmsql.main.sv VERSION AS OF $s1 ORDER BY a")
      .collect()
    assert(ver.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 21), (3, 31)))
    spark.sql("DROP VIEW vmsql.main.sv2")

    spark.sql("DROP VIEW vmsql.main.sv")
    assert(lake.views().count() == 0)
    intercept[Exception] { spark.sql("DROP VIEW vmsql.main.sv") }
    spark.sql("DROP VIEW IF EXISTS vmsql.main.sv") // no throw
    // session-catalog views are untouched by the interception
    spark.sql("CREATE TEMPORARY VIEW vm_tmpv AS SELECT 7 AS seven")
    assert(spark.sql("SELECT seven FROM vm_tmpv").head.getInt(0) == 7)
    spark.sql("DROP VIEW vm_tmpv")
  }

  test("TIMESTAMP AS OF on a stored view resolves definition AND data (r9)") {
    val root = Files.createTempDirectory("graft_vmts").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val s1 = lake.createView("main.tv", "SELECT count(*) AS n FROM t")
    Thread.sleep(60) // distinct snapshot_time for the AS-OF boundary
    lake.append("main.t", Seq((3, 30)).toDF("a", "b"))
    lake.createView("main.tv", "SELECT sum(b) AS s FROM t") // replace
    spark.conf.set("spark.sql.catalog.vmts", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmts.root", root)
    val t1 = lake.snapshots().filter(col("snapshot_id") === s1)
      .select(col("snapshot_time")).head.getTimestamp(0)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val lit1 = fmt.format(new java.util.Date(t1.getTime))
    // the timestamp form maps to the snapshot current at that instant —
    // OLD definition (count) over OLD data (2 rows), like tables
    assert(spark.sql(
      s"SELECT * FROM vmts.main.tv TIMESTAMP AS OF '$lit1'")
      .head.getLong(0) == 2L)
    // current read still sees the replaced definition over all data
    assert(spark.sql("SELECT * FROM vmts.main.tv").head.getLong(0) == 60L)
    // a timestamp before the first snapshot raises a clear error, not
    // 'table not found'
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM vmts.main.tv TIMESTAMP AS OF '1999-01-01'")
        .collect()
    }
    assert(e.getMessage.contains("no snapshot exists"), e.getMessage)
    // the graft_view TVF accepts the same timestamp form as its third
    // argument (the reference time_travel's dual overloads)
    assert(spark.sql(
      s"SELECT * FROM graft_view('$root', 'main.tv', '$lit1')")
      .head.getLong(0) == 2L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_view('$root', 'main.tv', '1999-01-01')")
        .collect()
    }
  }

  test("frozen mounts serve DSv2 loadView + SELECT, consistent with listViews (r9)") {
    val root = Files.createTempDirectory("graft_vmfz").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    lake.createView("main.fv", "SELECT a, b * 10 AS b10 FROM t WHERE a >= 2")
    val out = Files.createTempDirectory("graft_vmfz_out").toString
    lake.freeze(out)
    spark.conf.set("spark.sql.catalog.vmfz", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmfz.frozen", out)
    val cat = org.apache.spark.sql.graft.CatalogAccess.catalog(spark, "vmfz")
      .asInstanceOf[LakeCatalog]
    // ADVICE r8: listViews/viewExists/loadView must agree on frozen mounts
    val listed = cat.listViews("main").map(_.name()).toSeq
    assert(listed == Seq("fv"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("main"), "fv")
    assert(cat.viewExists(ident))
    val v = cat.loadView(ident) // used to throw NoSuchViewException
    assert(v.schema().fieldNames.toSeq == Seq("a", "b10"))
    // catalog-qualified SELECT resolves on the frozen mount too
    assert(spark.sql("SELECT * FROM vmfz.main.fv ORDER BY a").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 200), (3, 300)))
    // still read-only: DDL refuses
    intercept[Exception] {
      spark.sql("CREATE VIEW vmfz.main.nope AS SELECT 1")
    }
  }

  test("SHOW VIEWS LIKE: regex metachars quoted, case-insensitive (r9)") {
    val root = Files.createTempDirectory("graft_vmlk").toString
    val lake = new Lake(spark, root)
    lake.createTable("main.t", abSchema)
    lake.createView("main.agg_v1", "SELECT count(*) AS n FROM t")
    lake.createView("main.raw_data", "SELECT * FROM t")
    spark.conf.set("spark.sql.catalog.vmlk", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmlk.root", root)
    // '+' and '(' are regex metachars — ADVICE r8: these used to throw
    // PatternSyntaxException; they should simply not match
    assert(spark.sql("SHOW VIEWS IN vmlk.main LIKE 'x+('").count() == 0)
    // case-insensitive like Spark's StringUtils.filterPattern
    assert(spark.sql("SHOW VIEWS IN vmlk.main LIKE 'AGG_*'").count() == 1)
    // alternation + wildcard still work
    assert(spark.sql("SHOW VIEWS IN vmlk.main LIKE 'agg_*|raw_*'").count() == 2)
    spark.sql("DROP VIEW vmlk.main.agg_v1")
    spark.sql("DROP VIEW vmlk.main.raw_data")
  }

  test("TABLE macros: AS TABLE body, TVF invocation, kind-checked DROP (r9)") {
    val root = Files.createTempDirectory("graft_vmtm").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    spark.conf.set("spark.sql.catalog.vmtm", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmtm.root", root)

    // CREATE MACRO ... AS TABLE (DuckDB grammar, coverage row
    // ducklake_feature_coverage.md:32): a parameterized stored SELECT
    spark.sql("CREATE MACRO vmtm.main.top_b(lo) AS TABLE " +
      "SELECT a, b FROM t WHERE b >= lo")
    // invoked as a table function in plain SQL
    assert(spark.sql("SELECT * FROM top_b(20) ORDER BY a").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 20), (3, 30)))
    // arguments are expressions, substituted lazily (5 + 10 → b >= 15)
    assert(spark.sql("SELECT count(*) AS n FROM top_b(5 + 10)")
      .head.getLong(0) == 2L)
    // stored with kind=table
    assert(lake.macros().filter(col("macro_name") === "top_b")
      .select("macro_type").head.getString(0) == "table")
    // wrong arity fails
    intercept[Exception] { spark.sql("SELECT * FROM top_b()").collect() }

    // kind-checked DROP: plain DROP MACRO refuses a table macro...
    val e = intercept[Exception] { spark.sql("DROP MACRO vmtm.main.top_b") }
    assert(e.getMessage.contains("table"), e.getMessage)
    // ...and DROP MACRO TABLE refuses a scalar macro
    spark.sql("CREATE MACRO vmtm.main.sq(x) AS x * x")
    intercept[Exception] { spark.sql("DROP MACRO TABLE vmtm.main.sq") }

    // freeze emits macro_type; a thawed lake re-executes the table macro
    val out = Files.createTempDirectory("graft_vmtm_fz").toString
    lake.freeze(out)
    val mrow = spark.read.parquet(s"$out/catalog_parquet/ducklake_macro.parquet")
      .filter(col("macro_name") === "top_b").select("macro_type").head
    assert(mrow.getString(0) == "table")
    val lake2 = new Lake(spark, Files.createTempDirectory("graft_vmtm_th").toString)
    lake2.importCatalog(s"$out/catalog_parquet")
    spark.sessionState.tableFunctionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("top_b"))
    lake2.registerMacros()
    assert(spark.sql("SELECT * FROM top_b(30)").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((3, 30)))
    // rebind the session registration to the ORIGINAL lake's store (the
    // registry holds one builder per name; lake2's registerMacros bound
    // it to the thawed copy)
    spark.sessionState.tableFunctionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("top_b"))
    lake.registerMacros()

    // session as-of applies to the table macro's data at invocation time
    val sBefore = lake.append("main.t", Seq((4, 40)).toDF("a", "b")) - 1
    spark.conf.set("spark.graft.lake.asOfSnapshot", sBefore.toString)
    try assert(spark.sql("SELECT count(*) AS n FROM top_b(0)").head.getLong(0) == 3L)
    finally spark.conf.unset("spark.graft.lake.asOfSnapshot")
    assert(spark.sql("SELECT count(*) AS n FROM top_b(0)").head.getLong(0) == 4L)

    spark.sql("DROP MACRO TABLE vmtm.main.top_b")
    spark.sql("DROP MACRO vmtm.main.sq")
    assert(lake.macros().count() == 0)
    // dropped from the table-function registry too
    intercept[Exception] { spark.sql("SELECT * FROM top_b(1)").collect() }
  }

  test("USE <lakecat>: bare-name view reads, temp-view shadowing (r9)") {
    val root = Files.createTempDirectory("graft_vmuse").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20)).toDF("a", "b"))
    lake.createView("main.uv", "SELECT sum(b) AS s FROM t")
    spark.conf.set("spark.sql.catalog.vmuse", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmuse.root", root)
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql("USE vmuse")
    try {
      // bare view name resolves through the current lake catalog
      assert(spark.sql("SELECT * FROM uv").head.getLong(0) == 30L)
      // bare TABLE name too (DSv2 loadTable path under USE)
      assert(spark.sql("SELECT count(*) AS n FROM main.t").head.getLong(0) == 2L)
      // a temp view SHADOWS the stored view under the same bare name
      spark.sql("CREATE TEMPORARY VIEW uv AS SELECT 99 AS s")
      assert(spark.sql("SELECT * FROM uv").head.getInt(0) == 99)
      // the qualified name still reaches the stored view
      assert(spark.sql("SELECT * FROM vmuse.main.uv").head.getLong(0) == 30L)
      // DDL on the bare name targets the temp view (Spark semantics), and
      // after dropping it the stored view is visible again
      spark.sql("DROP VIEW uv")
      assert(spark.sql("SELECT * FROM uv").head.getLong(0) == 30L)
    } finally spark.sql(s"USE $prevCat")
  }

  test("SQL CREATE/DROP MACRO statements (reference dialect grammar)") {
    val root = Files.createTempDirectory("graft_vmsql_m").toString
    spark.conf.set("spark.sql.catalog.vmsqlm", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.vmsqlm.root", root)
    new Lake(spark, root).createTable("main.t", abSchema)

    spark.sql("CREATE MACRO vmsqlm.main.addb(x, y) AS x + y * 2")
    // expands at analysis time like an API-created macro
    assert(spark.sql("SELECT addb(1, 2) AS r").head.getInt(0) == 5)
    // stored as a catalog row
    val lake = new Lake(spark, root)
    import spark.implicits._
    assert(lake.macros().select("macro_name").as[String].collect().toSeq ==
      Seq("addb"))
    // OR REPLACE swaps the body
    spark.sql("CREATE OR REPLACE MACRO vmsqlm.main.addb(x, y) AS x - y")
    assert(spark.sql("SELECT addb(10, 2) AS r").head.getInt(0) == 8)
    // a broken body fails the CREATE statement, not the first use
    intercept[Exception] {
      spark.sql("CREATE MACRO vmsqlm.main.bad(x) AS x +")
    }
    spark.sql("DROP MACRO vmsqlm.main.addb")
    assert(lake.macros().count() == 0)
    intercept[Exception] { spark.sql("SELECT addb(1, 2)") }
    // every other statement still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) == 2)
  }
}
