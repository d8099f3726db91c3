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
    val tags = spark.read.parquet(s"$cat/ducklake_tag.parquet")
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
