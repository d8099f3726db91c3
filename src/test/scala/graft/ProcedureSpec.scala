package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** SQL stored procedures (`CALL <cat>.system.<proc>(...)`) over the DSv2
  * ProcedureCatalog SPI — the Spark-native version of the reference's
  * `CALL ducklake.set_option` utility-hook routing
  * (src/pgducklake_hooks.cpp:263-313), generalized to the whole
  * maintenance surface in the Iceberg CALL idiom. */
class ProcedureSpec extends AnyFunSuite {
  import TestSession.spark

  private def catalogedLake(tag: String): (Lake, String) = {
    val root = Files.createTempDirectory(s"graft_proc_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    (new Lake(spark, root), tag)
  }

  test("CALL system.vacuum / set_option / checkpoint return summary rows") {
    val (lake, cat) = catalogedLake("pc1")
    lake.createTableAs("main.t", spark.range(0, 100).selectExpr("id AS k"))
    lake.append("main.t", spark.range(100, 200).selectExpr("id AS k"))

    val sid = spark.sql(s"CALL $cat.system.vacuum('main.t')")
      .head.getLong(0)
    assert(sid > 0)
    val st = lake.store.state()
    val tid = st.tableAt("main", "t", st.currentSnapshotId).get.tableId
    assert(st.filesAt(tid, st.currentSnapshotId).size == 1, "vacuum merged")

    spark.sql(s"CALL $cat.system.set_option('parquet_compression', 'zstd', 'main.t')")
    assert(lake.options().filter(col("key") === "parquet_compression")
      .head.getString(2) == "zstd")
    // global scope via NULL default for the table argument
    spark.sql(s"CALL $cat.system.set_option('data_inlining_row_limit', '50')")
    assert(lake.options().filter(col("key") === "data_inlining_row_limit")
      .head.getString(0) == "global")

    assert(spark.sql(s"CALL $cat.system.checkpoint()").head.getLong(0) >= 0)
  }

  test("CALL system.maintain and rewrite_zorder; SHOW PROCEDURES lists all") {
    val (lake, cat) = catalogedLake("pc2")
    lake.createTableAs("main.z", spark.range(0, 5000).selectExpr(
      "CAST(id % 70 AS INT) AS x", "CAST(id / 70 AS INT) AS y"))
    spark.sql(s"CALL $cat.system.rewrite_zorder('main.z', array('x', 'y'))")
    assert(spark.table(s"$cat.main.z").count() == 5000)

    val m = spark.sql(s"CALL $cat.system.maintain()").head
    assert(m.getAs[Long]("tables_maintained") == 1L)

    val showDf = spark.sql(s"SHOW PROCEDURES IN $cat.`system`")
    val nameIdx = showDf.schema.fieldIndex("procedure_name")
    val procs = showDf.collect().map(_.getString(nameIdx)).toSet
    assert(LakeProcedures.names.toSet.subsetOf(procs),
      s"missing: ${LakeProcedures.names.toSet -- procs}")
  }

  test("procedures refuse a frozen mount") {
    val (lake, _) = catalogedLake("pc3src")
    lake.createTableAs("main.f", spark.range(0, 10).selectExpr("id AS k"))
    val fz = Files.createTempDirectory("graft_proc_fz").toString
    lake.freeze(fz, parquetCatalog = false)
    spark.conf.set("spark.sql.catalog.pcfz", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcfz.frozen", fz)
    val e = intercept[Exception] {
      spark.sql("CALL pcfz.system.checkpoint()").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("read-only"))
  }
}
