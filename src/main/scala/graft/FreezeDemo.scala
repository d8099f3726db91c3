package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.Lake

/** Builds a small lake (appends across a schema change + a delete) and
  * freezes it, so `scripts/freeze_check.py` can prove the frozen output is
  * queryable by plain DuckDB — the reference freeze.sql observable. */
object FreezeDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("freezedemo").toString
    val lake = new Lake(spark, root)
    val nation = graft.queries.Tables.load(spark, sfDir, "nation")
    lake.createTable("main.nat", nation.schema)
    lake.append("main.nat", nation)
    lake.delete("main.nat", col("n_regionkey") === 0)
    val cat = new graft.lake.LakeCatalog()
    val m = new java.util.HashMap[String, String]()
    m.put("root", root)
    cat.initialize("fd", new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("main"), "nat"),
      org.apache.spark.sql.connector.catalog.TableChange.addColumn(
        Array("tag"), org.apache.spark.sql.types.StringType))
    lake.append("main.nat", nation.limit(2)
      .withColumn("tag", lit("late")))
    // r16 (VERDICT r15 #3): RENAME COLUMN joins the demo — the early files
    // hold n_comment under its old physical name, so the frozen view's
    // epoch branches must alias by columnId ("n_comment" AS "remark");
    // stock DuckDB executes this via scripts/freeze_check.py
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("main"), "nat"),
      org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
        Array("n_comment"), "remark"))
    lake.append("main.nat", nation.limit(1)
      .withColumnRenamed("n_comment", "remark")
      .withColumn("tag", lit("post-rename")))
    // and a BUCKETED + SORTED table whose partition/sort KEY is renamed
    // mid-history with DML on both sides plus a cross-epoch delete — the
    // layout-bearing shape RenameLayoutSpec's freeze test pins in-engine
    // v starts INT and WIDENS to BIGINT mid-history (r16): the frozen view
    // unions int32 and int64 epochs of the same column — stock DuckDB must
    // coerce them under one name, value-checked by freeze_check's --sum
    val part = spark.range(0, 5000).selectExpr("id AS k", "CAST(id * 3 AS INT) AS v")
    lake.createTable("main.pk", part.schema,
      partitionKeys = List(graft.lake.Meta.PartitionKey("bucket[4]", "k")),
      sortKeys = List(graft.lake.Meta.SortKey("k", ascending = true, nullsFirst = true)))
    lake.append("main.pk", part)
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("main"), "pk"),
      org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
        Array("k"), "kk"))
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("main"), "pk"),
      org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
        Array("v"), org.apache.spark.sql.types.LongType))
    lake.append("main.pk", spark.range(5000, 6000)
      .selectExpr("id AS kk", "id * 3000000000 AS v")) // needs 64 bits
    lake.delete("main.pk", col("kk") % 10 === 1)
    // native view + macro: freeze must emit reference-shaped ducklake_view /
    // ducklake_macro* rows (dialect 'spark') that real DuckDB can load —
    // scripts/thaw_check.py executes the catalog SQL verbatim
    lake.createView("main.big_nations",
      "SELECT n_name, n_regionkey FROM nat WHERE n_nationkey >= 10",
      aliases = Seq("name", "region"))
    lake.createMacro("main.keysq", Seq("k"), "k * k + 1")
    // r9: a TABLE macro too — freeze emits macro_type='table' and DuckDB
    // must still load the catalog SQL verbatim
    lake.createMacro("main.nat_of", Seq("r"),
      "SELECT n_name FROM nat WHERE n_regionkey = r", kind = "table")
    lake.freeze(outDir)
    val expect = lake.table("main.nat").count()
    println(s"[freeze-demo] frozen at $outDir, engine row count = $expect")
    println(s"[freeze-demo] main_pk engine row count = ${lake.table("main.pk").count()}")
    spark.stop()
  }
}
