package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** r17 optimization: per-file column statistics are harvested from the
  * parquet footers the write itself produced instead of a second Spark
  * pass. Contract under test: the stored FileColumnStats are BIT-IDENTICAL
  * to what the old `min/max(col).cast(string) + null count` aggregation
  * job computed — across every stats-eligible type, including the
  * fallback-trigger shapes (NaN doubles) where the old job must actually
  * run and produce its old values. */
class FooterStatsSpec extends AnyFunSuite {
  import TestSession.spark

  private def mkLake() = new Lake(spark, Files.createTempDirectory("graft_fs").toString)

  /** recompute the old stats job's answer directly over a table's live
    * data files and compare to what the commit stored */
  private def assertStatsMatchJob(lake: Lake, table: String): Unit = {
    val st = lake.store.state()
    val (sn, tn) = lake.schemaOf(table)
    val tid = st.tableAt(sn, tn, st.currentSnapshotId).get.tableId
    val files = st.filesAt(tid, st.currentSnapshotId)
    assert(files.nonEmpty, "expected data files")
    val cols = st.columnsAt(tid, st.currentSnapshotId)
      .filter(c => LakeRead.sparkType(c.dataType) match {
        case _: org.apache.spark.sql.types.NumericType |
             org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.BooleanType => true
        case _ => false
      })
    val struct = LakeRead.structFor(st.columnsAt(tid, st.currentSnapshotId))
    files.foreach { f =>
      val aggs = Seq(count(lit(1)).as("_cnt")) ++ cols.flatMap { c =>
        Seq(min(col(c.name)).cast("string").as(s"_min_${c.name}"),
          max(col(c.name)).cast("string").as(s"_max_${c.name}"),
          sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(s"_nulls_${c.name}"))
      }
      val r = spark.read.schema(struct).parquet(f.path).agg(aggs.head, aggs.tail: _*)
        .collect().head
      assert(f.rowCount == r.getLong(r.fieldIndex("_cnt")),
        s"row count of ${f.fileName}")
      val stored = st.stats.filter(_.fileId == f.fileId)
        .map(s => s.columnName -> s).toMap
      cols.foreach { c =>
        val s = stored(c.name)
        val jobMin = Option(r.getString(r.fieldIndex(s"_min_${c.name}")))
        val jobMax = Option(r.getString(r.fieldIndex(s"_max_${c.name}")))
        val jobNulls = r.getLong(r.fieldIndex(s"_nulls_${c.name}"))
        assert(s.minValue == jobMin, s"min of ${c.name} in ${f.fileName}")
        assert(s.maxValue == jobMax, s"max of ${c.name} in ${f.fileName}")
        assert(s.nullCount == jobNulls, s"nulls of ${c.name} in ${f.fileName}")
      }
    }
  }

  test("footer-harvested stats equal the stats job across every eligible type") {
    val lake = mkLake()
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", -2.5e10, "1.50", "2020-01-01 00:00:00", "2020-01-01", true,
        Option.empty[Long], "", 3.5f),
      (2L, "béta", 0.25, "0.01", "2021-06-15 12:34:56.789", "2021-06-15", false,
        Option.empty[Long], "x", -1.25f),
      (3L, "Ωmega", 7.125, "12345.67", "1969-12-31 23:59:59", "1969-12-31", true,
        Option.empty[Long], "yy", 99.5f)
    ).toDF("id", "s", "d", "decs", "tss", "dts", "b", "alln", "es", "f")
      .select(col("id"), col("s"), col("d"),
        col("decs").cast("decimal(12,7)").as("dec"),
        (col("decs").cast("decimal(12,7)") * lit(1000000)).cast("decimal(38,0)").as("bigdec"),
        col("tss").cast("timestamp").as("ts"),
        col("dts").cast("date").as("dt"),
        col("b"), col("alln"), col("es"), col("f"),
        col("id").cast("smallint").as("sm"), col("id").cast("tinyint").as("ti"))
    lake.createTableAs("main.t", df)
    assertStatsMatchJob(lake, "main.t")
    // the update path funnels through the same harvest
    lake.update("main.t", col("id") === 2L, Map("s" -> lit("zz-moved")))
    assertStatsMatchJob(lake, "main.t")
  }

  test("NaN doubles force the job fallback and keep the job's exact values") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.nan",
      Seq((1L, 1.5), (2L, Double.NaN), (3L, -7.25)).toDF("id", "d").coalesce(1))
    val st = lake.store.state()
    val tid = st.tableAt("main", "nan", st.currentSnapshotId).get.tableId
    val s = st.stats.filter(x => x.fileId == st.filesAt(tid, st.currentSnapshotId).head.fileId)
      .map(x => x.columnName -> x).toMap
    // the old job's answers: Spark min ignores NaN ordering upward, max is NaN
    assert(s("d").minValue.contains("-7.25"))
    assert(s("d").maxValue.contains("NaN"))
    assertStatsMatchJob(lake, "main.nan")
  }

  test("a zero-hit DELETE writes no delete file at all") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.z", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    lake.delete("main.z", col("id") === 999L)
    val st = lake.store.state()
    val tid = st.tableAt("main", "z", st.currentSnapshotId).get.tableId
    assert(st.deleteFilesAt(tid, st.currentSnapshotId).isEmpty)
    assert(lake.table("main.z").count() == 2L)
  }

  test("tiny decimals render exactly like the job's cast (no scientific notation)") {
    // ADVICE r17 raised BigDecimal.toString's scientific switch (adjusted
    // exponent < -6) as a divergence risk; empirically Spark's
    // cast(decimal as string) renders PLAIN ("0.0000001", never "1E-7"),
    // so toPlainString is the bit-identical rendering — pinned here
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.tiny",
      Seq("0.0000001", "0.0000456", "3.1400000").toDF("ds")
        .select(col("ds").cast("decimal(12,7)").as("dec")).coalesce(1))
    assertStatsMatchJob(lake, "main.tiny")
    val st = lake.store.state()
    val s = st.stats.filter(_.columnName == "dec")
    assert(s.head.minValue.contains("0.0000001"), s"stored min: ${s.head.minValue}")
    assert(s.head.maxValue.contains("3.1400000"))
  }

  test("unsigned-int foreign files take the job fallback (no sign extension)") {
    // ADVICE r17: a uint32 parquet file registered via addDataFiles reads as
    // bigint in Spark, but its footer min/max are raw int32 bits — harvesting
    // them would sign-extend 4294967295 to -1 and poison pruning
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val lake = mkLake()
    lake.createTable("main.u", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    val dir = Files.createTempDirectory("graft_uint")
    val p = new org.apache.hadoop.fs.Path(dir.resolve("u32.parquet").toString)
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int32 v (INTEGER(32,false)); }")
    val gf = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter.builder(p).withType(schema)
      .withConf(spark.sessionState.newHadoopConf()).build()
    try {
      w.write(gf.newGroup().append("v", 7))
      w.write(gf.newGroup().append("v", -1)) // bits of uint 4294967295
    } finally w.close()
    lake.addDataFiles("main.u", Seq(p.toString))
    val st = lake.store.state()
    val s = st.stats.filter(_.columnName == "v")
    assert(s.nonEmpty, "stats recorded for the foreign file")
    assert(s.head.minValue.contains("7"), s"stored min: ${s.head.minValue}")
    assert(s.head.maxValue.contains("4294967295"), s"stored max: ${s.head.maxValue}")
    assertStatsMatchJob(lake, "main.u")
  }

  test("timestamps write as INT64 micros so footer stats cover them") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.ts",
      Seq(("2020-01-01 00:00:00", 1L), ("2021-06-15 12:34:56.789", 2L))
        .toDF("tss", "id").select(col("tss").cast("timestamp").as("ts"), col("id")).coalesce(1))
    assertStatsMatchJob(lake, "main.ts")
    val st = lake.store.state()
    val tid = st.tableAt("main", "ts", st.currentSnapshotId).get.tableId
    val s = st.stats.filter(_.columnName == "ts")
    assert(s.head.minValue.contains("2020-01-01 00:00:00"))
    assert(s.head.maxValue.contains("2021-06-15 12:34:56.789"))
  }
}
