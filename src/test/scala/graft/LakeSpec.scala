package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.lake.Meta._

/** End-to-end lakehouse-layer tests mirroring the reference's regression
  * scripts (basic.sql, dml_row_count.sql, time_travel.sql, vacuum.sql,
  * partition.sql, sorted_table.sql, data_inlining_row_limit.sql,
  * data_change_feed.sql, freeze.sql) and the three isolation specs. */
class LakeSpec extends AnyFunSuite {
  import TestSession.spark

  private def newLake(): Lake =
    new Lake(spark, Files.createTempDirectory("graft_lake").toString)

  private val abSchema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType)))

  // ---- basic.sql: create → insert → filter scan -------------------------
  test("basic: create, append, filtered scan") {
    val lake = newLake()
    lake.createTable("main.t", abSchema)
    import spark.implicits._
    lake.append("main.t", Seq((1, 101), (2, 102)).toDF("a", "b"))
    val rows = lake.table("main.t").filter(col("a") === 1).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 101)))
    assert(lake.table("main.t").count() == 2)
  }

  // ---- SQL surface through the DSv2 catalog -----------------------------
  test("catalog: SQL create/insert/select/CTAS/delete/time travel") {
    val root = Files.createTempDirectory("graft_cat").toString
    val cat = s"laketest${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.main.t (a INT, b INT)")
    spark.sql(s"INSERT INTO $cat.main.t VALUES (1, 101), (2, 102), (3, 103)")
    assert(spark.sql(s"SELECT b FROM $cat.main.t WHERE a = 2").collect()
      .map(_.getInt(0)).toSeq == Seq(102))
    // CTAS
    spark.sql(s"CREATE TABLE $cat.main.t2 AS SELECT a, b * 10 AS c FROM $cat.main.t")
    assert(spark.sql(s"SELECT sum(c) FROM $cat.main.t2").collect().head.getLong(0) == 3060)
    // DELETE through SupportsDelete (row-level)
    spark.sql(s"DELETE FROM $cat.main.t WHERE a <= 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.t").collect().head.getLong(0) == 2)
    // time travel: the insert snapshot still sees 3 rows
    val lake = new Lake(spark, root)
    val insertSnap = lake.snapshots().filter(col("changes").startsWith("inserted:"))
      .select("snapshot_id").collect().map(_.getLong(0)).min
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.t VERSION AS OF $insertSnap")
      .collect().head.getLong(0) == 3)
    // overwrite
    spark.sql(s"INSERT OVERWRITE $cat.main.t VALUES (9, 900)")
    assert(spark.sql(s"SELECT * FROM $cat.main.t").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  // ---- options.sql: writer options honored on the parquet write path ----
  test("writer options: compression codec and target file size honored") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.w", abSchema)
    lake.setOption("parquet_compression", "zstd", Some("main.w"))
    val df = (1 to 2000).map(i => (i, i * 2)).toDF("a", "b").coalesce(1)
    lake.append("main.w", df)
    // verify the written file's codec via the parquet footer
    val path = lake.listFiles("main.w").select("file_name").collect().head.getString(0)
    val st = lake.store.state()
    val full = st.files.find(_.fileName == path).get.path
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(full), spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val codecs = reader.getFooter.getBlocks.get(0).getColumns.asScala.map(_.getCodec.name()).toSet
      assert(codecs == Set("ZSTD"), s"expected ZSTD, got $codecs")
    } finally reader.close()
    // target_file_size: bytes/row estimated from the first append splits the next
    val sizeBefore = lake.listFiles("main.w").select("file_size").collect().head.getLong(0)
    lake.setOption("target_file_size", (sizeBefore / 4).toString, Some("main.w"))
    lake.append("main.w", df)
    val filesNow = lake.listFiles("main.w").count()
    assert(filesNow >= 3, s"expected the second append split into >=2 files, total >=3, got $filesNow")
    assert(lake.table("main.w").count() == 4000)
  }

  // ---- streaming: the change feed as a micro-batch source ---------------
  test("streaming: change feed source delivers incremental batches with checkpoint restart") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.s", abSchema)
    lake.append("main.s", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val buf = collection.mutable.ArrayBuffer[(String, Int, Int)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("root", lake.root).option("table", "main.s").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("_change_type", "a", "b").collect()
            .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
          buf.synchronized { buf ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(buf.sorted == Seq(("insert", 1, 10), ("insert", 2, 20)),
      s"first drain saw $buf")
    buf.clear()
    // no new commits → restart from checkpoint sees nothing
    drain()
    assert(buf.isEmpty, s"idle drain saw $buf")
    // incremental: only the delete and the update's pre/post images arrive
    lake.delete("main.s", col("a") === 1)
    lake.update("main.s", col("a") === 2, Map("b" -> lit(99)))
    drain()
    assert(buf.sorted == Seq(("delete", 1, 10),
      ("update_postimage", 2, 99), ("update_preimage", 2, 20)),
      s"incremental drain saw $buf")
  }

  // ---- streaming: backlog rate cap (VERDICT r9 #3) ----------------------
  // A cold start against a deep snapshot history must NOT replay the whole
  // backlog in one trigger: maxSnapshotsPerTrigger chunks it, AvailableNow
  // still drains to the end, and the checkpoint keeps exactly-once across
  // a mid-backlog restart.
  test("streaming: maxSnapshotsPerTrigger chunks a deep backlog across triggers") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.rc", abSchema)
    // 10 commit snapshots of one row each → deep history before any reader
    (1 to 10).foreach(i => lake.append("main.rc", Seq((i, i * 10)).toDF("a", "b")))
    val ckpt = Files.createTempDirectory("graft_ckpt_rc").toString
    val rows = collection.mutable.ArrayBuffer[(Int, Int)]()
    val batchSizes = collection.mutable.ArrayBuffer[Int]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("root", lake.root).option("table", "main.rc")
        .option("maxSnapshotsPerTrigger", "3")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rs = df.select("a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
          rows.synchronized { rows ++= rs; batchSizes += rs.length }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // exactly-once over the whole backlog...
    assert(rows.sorted == (1 to 10).map(i => (i, i * 10)),
      s"backlog drain saw $rows")
    // ...in capped steps: 11 snapshots (create + 10 appends) / cap 3 → ≥3
    // triggers, and no single batch may exceed 3 rows (1 row per snapshot).
    assert(batchSizes.length >= 3, s"expected >=3 capped triggers, got $batchSizes")
    assert(batchSizes.forall(_ <= 3), s"a batch exceeded the cap: $batchSizes")
    // restart with more history: the restored checkpoint + cap still chunk
    // only the NEW snapshots, exactly once
    rows.clear(); batchSizes.clear()
    (11 to 17).foreach(i => lake.append("main.rc", Seq((i, i * 10)).toDF("a", "b")))
    drain()
    assert(rows.sorted == (11 to 17).map(i => (i, i * 10)),
      s"incremental capped drain saw $rows")
    assert(batchSizes.length >= 2 && batchSizes.forall(_ <= 3),
      s"expected 7 new snapshots over >=2 capped triggers, got $batchSizes")
    // uncapped control: same source options minus the cap drains in one step
    val one = spark.readStream.format("graft-changes")
      .option("root", lake.root).option("table", "main.rc").load()
    assert(one.isStreaming)
  }

  // ---- streaming: byte-cap admission (VERDICT r10 #6) --------------------
  // A count cap alone still admits an unbounded batch when snapshot sizes
  // are wildly uneven (one huge compaction vs a thousand small appends).
  // maxBytesPerTrigger sums data-file bytes per admitted snapshot; a fat
  // snapshot exceeding the cap is admitted ALONE (never stalls the stream).
  test("streaming: maxBytesPerTrigger isolates a fat snapshot into its own trigger") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.bc", abSchema) // snapshot 1
    lake.append("main.bc", Seq((1, 10)).toDF("a", "b")) // snapshot 2, tiny
    lake.append("main.bc",
      spark.range(0, 20000).selectExpr("CAST(id + 100 AS INT) AS a",
        "CAST(id AS INT) AS b")) // snapshot 3, FAT (far above the cap)
    lake.append("main.bc", Seq((2, 20)).toDF("a", "b")) // snapshot 4, tiny
    lake.append("main.bc", Seq((3, 30)).toDF("a", "b")) // snapshot 5, tiny
    val ckpt = Files.createTempDirectory("graft_ckpt_bc").toString
    // (snapshot-id set, row count) per non-empty micro-batch
    val perBatch = collection.mutable.ArrayBuffer[(Set[Long], Int)]()
    val q = spark.readStream.format("graft-changes")
      .option("root", lake.root).option("table", "main.bc")
      .option("maxBytesPerTrigger", (8L * 1024).toString) // between tiny and fat
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val snaps = df.select("_snapshot_id").collect().map(_.getLong(0))
        perBatch.synchronized {
          if (snaps.nonEmpty) perBatch += ((snaps.toSet, snaps.length))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(perBatch.map(_._2).sum == 1 + 20000 + 1 + 1,
      s"exactly-once violated: $perBatch")
    val (fatSnaps, _) = perBatch.find(_._2 == 20000)
      .getOrElse(fail(s"fat snapshot never drained whole: $perBatch"))
    assert(fatSnaps.size == 1,
      s"fat snapshot shared a trigger with others: $fatSnaps (all: $perBatch)")
    assert(perBatch.length >= 3,
      s"byte cap did not chunk the backlog: $perBatch")
  }

  // ---- streaming under schema evolution (VERDICT r10 #7) -----------------
  // A backlog spanning an ADD COLUMN must drain exactly-once with every
  // micro-batch under the source's DECLARED schema: pre-ADD snapshots
  // NULL-fill the new column (the reference's historical-schema contract —
  // a time-travel read of a pre-ADD snapshot has no value for it either).
  test("streaming: backlog spanning ADD COLUMN serves declared schema, NULL-filling old rows") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.se", abSchema)
    lake.append("main.se", Seq((1, 10), (2, 20)).toDF("a", "b")) // pre-ADD
    locally { // ADD COLUMN via the DSv2 catalog, like the time-travel spec
      val cat = s"lkse${System.nanoTime()}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
      spark.sql(s"ALTER TABLE $cat.main.se ADD COLUMN c STRING")
    }
    lake.append("main.se",
      Seq((3, 30, "x"), (4, 40, "y")).toDF("a", "b", "c")) // post-ADD
    val ckpt = Files.createTempDirectory("graft_ckpt_se").toString
    val rows = collection.mutable.ArrayBuffer[(Int, Int, Option[String])]()
    val schemas = collection.mutable.ArrayBuffer[Seq[String]]()
    val q = spark.readStream.format("graft-changes")
      .option("root", lake.root).option("table", "main.se")
      .option("maxSnapshotsPerTrigger", "1") // force pure-old-schema batches
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = df.select("a", "b", "c").collect()
          .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2))))
        rows.synchronized {
          if (rs.nonEmpty) { rows ++= rs; schemas += df.columns.toSeq }
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // exactly-once, with NULL fill on the pre-ADD rows
    assert(rows.sorted == Seq((1, 10, None), (2, 20, None),
      (3, 30, Some("x")), (4, 40, Some("y"))), s"drain saw $rows")
    // every batch — including the all-pre-ADD ones forced by the cap —
    // carried the declared (post-ADD) column set
    assert(schemas.forall(_.contains("c")),
      s"a batch served the historical schema instead of the declared one: $schemas")
  }

  // ---- variant.sql: semi-structured columns (Spark 4 VariantType) -------
  test("variant: column round-trips through parquet, DML works, inlining disabled") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.v", StructType(Seq(
      StructField("id", IntegerType), StructField("v", VariantType))))
    lake.setOption("data_inlining_row_limit", "100", Some("main.v"))
    val df = Seq(
      (1, """{"name": "alice", "age": 30}"""),
      (2, """[1, 2, 3]"""),
      (3, """42""")).toDF("id", "j")
      .select(col("id"), expr("parse_json(j)").as("v"))
    lake.append("main.v", df)
    // small insert: variant forces the parquet path despite the inline limit
    val vv = spark.sql("""SELECT parse_json('{"x": 1}') AS v""").collect().head.get(0)
    lake.insertRows("main.v", Seq(Seq(4, vv)))
    val info = lake.tableInfo().select("inlined_row_count", "row_count").collect().head
    assert(info.getLong(0) == 0, "variant table must not inline")
    assert(info.getLong(1) == 4)
    // field extraction over the lake scan
    val names = lake.table("main.v")
      .selectExpr("id", "cast(variant_get(v, '$.name') as string) AS name")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(names == Seq((1, "alice"), (2, null), (3, null), (4, null)))
    // DML: update by extracted field, delete by serialized value
    lake.update("main.v", expr("variant_get(v, '$.age', 'int') = 30"),
      Map("v" -> expr("""parse_json('{"name": "alice", "age": 31}')""")))
    lake.delete("main.v", expr("to_json(v) = '42'"))
    val ages = lake.table("main.v")
      .selectExpr("id", "cast(variant_get(v, '$.age') as int) AS age")
      .orderBy("id").collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSeq
    assert(ages == Seq((1, 31), (2, -1), (4, -1)))
  }

  // ---- dml_row_count.sql: exact row-count tags --------------------------
  test("dml: delete/update row counts and results") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.d", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    lake.append("main.d", Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "v"))
    val (_, nDel) = lake.delete("main.d", col("id") <= 2)
    assert(nDel == 2, s"DELETE 2, got $nDel")
    assert(lake.table("main.d").orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(3, 4))
    val (_, nUp) = lake.update("main.d", col("id") === 3, Map("v" -> lit("z")))
    assert(nUp == 1, s"UPDATE 1, got $nUp")
    assert(lake.table("main.d").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((3, "z"), (4, "d")))
    val (_, nDel0) = lake.delete("main.d", col("id") === 99)
    assert(nDel0 == 0)
  }

  // ---- time_travel.sql incl. historical schema --------------------------
  test("time travel: versions and historical schema after ADD COLUMN") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tt", abSchema)
    val s1 = lake.append("main.tt", Seq((1, 1)).toDF("a", "b"))
    // evolve: add column c, then insert wider rows
    val cat = s"laketT${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    spark.sql(s"ALTER TABLE $cat.main.tt ADD COLUMN c INT")
    lake.append("main.tt", Seq((2, 2, 22)).toDF("a", "b", "c"))
    // current read: 3 columns, old rows null-filled
    val cur = lake.table("main.tt").orderBy("a").collect()
    assert(cur.map(_.length).toSeq == Seq(3, 3))
    assert(cur(0).isNullAt(2) && cur(1).getInt(2) == 22)
    // read at v1: TWO columns (historical schema)
    val v1 = lake.table("main.tt", Some(s1))
    assert(v1.columns.toSeq == Seq("a", "b"))
    assert(v1.count() == 1)
    // session-wide as-of conf
    spark.conf.set("spark.graft.lake.asOfSnapshot", s1.toString)
    try assert(spark.sql(s"SELECT * FROM $cat.main.tt").columns.toSeq == Seq("a", "b"))
    finally spark.conf.unset("spark.graft.lake.asOfSnapshot")
    // rename column: history keeps the old name
    spark.sql(s"ALTER TABLE $cat.main.tt RENAME COLUMN b TO bb")
    assert(lake.table("main.tt").columns.toSeq == Seq("a", "bb", "c"))
    assert(lake.table("main.tt", Some(s1)).columns.toSeq == Seq("a", "b"))
    // values survive the rename (columnId mapping)
    assert(lake.table("main.tt").orderBy("a").collect().map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  // ---- vacuum.sql: merge + rewrite-past-threshold ------------------------
  test("compaction: merge small files, rewrite deleted, cleanup") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.v", abSchema)
    (1 to 3).foreach(i => lake.append("main.v", Seq((i, i * 10)).toDF("a", "b")))
    assert(lake.listFiles("main.v").count() == 3)
    lake.mergeAdjacentFiles("main.v")
    assert(lake.listFiles("main.v").count() == 1)
    assert(lake.table("main.v").orderBy("a").collect().map(_.getInt(1)).toSeq ==
      Seq(10, 20, 30))
    // delete 1 of 3 rows (33% ≥ 10% threshold) → rewrite drops delete files
    lake.delete("main.v", col("a") === 2)
    val stBefore = lake.store.state()
    assert(stBefore.deleteFilesAt(
      stBefore.tableAt("main", "v", stBefore.currentSnapshotId).get.tableId,
      stBefore.currentSnapshotId).nonEmpty)
    lake.rewriteDataFiles("main.v", 0.1)
    val st = lake.store.state()
    val tid = st.tableAt("main", "v", st.currentSnapshotId).get.tableId
    assert(st.deleteFilesAt(tid, st.currentSnapshotId).isEmpty, "delete files gone")
    assert(lake.table("main.v").orderBy("a").collect().map(_.getInt(0)).toSeq == Seq(1, 3))
    // cleanup physically removes replaced files
    val scheduled = lake.store.state().scheduledDeletions.map(_.path)
    assert(scheduled.nonEmpty)
    lake.cleanupOldFiles()
    assert(lake.store.state().scheduledDeletions.isEmpty)
    assert(scheduled.forall(p => !Files.exists(java.nio.file.Paths.get(p))))
    assert(lake.table("main.v").count() == 2, "content preserved after cleanup")
  }

  // ---- partition.sql: hidden partitioning + prune ------------------------
  test("partitioning: files per partition, pruning, retroactive safety") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.p", StructType(Seq(
      StructField("cat", StringType), StructField("x", IntegerType))))
    // unpartitioned first write (retroactive safety)
    lake.append("main.p", Seq(("a", 1), ("b", 2)).toDF("cat", "x").coalesce(1))
    lake.setPartition("main.p", List(PartitionKey("identity", "cat")))
    lake.append("main.p", Seq(("a", 3), ("b", 4), ("c", 5)).toDF("cat", "x"))
    val files = lake.store.state()
    val tid = files.tableAt("main", "p", files.currentSnapshotId).get.tableId
    val live = files.filesAt(tid, files.currentSnapshotId)
    // 1 unpartitioned + 3 partition files
    assert(live.count(_.partitionValues.isEmpty) == 1)
    assert(live.count(_.partitionValues.nonEmpty) == 3)
    assert(live.filter(_.partitionValues.get("cat").contains("a")).forall(_.rowCount == 1))
    // pruning: filter cat='a' must scan ≤ 2 files (unpartitioned + a's)
    val filters = Seq(org.apache.spark.sql.sources.EqualTo("cat", "a"))
    val kept = Pruning.prune(live, files.statsFor,
      Map("cat" -> "STRING", "x" -> "INT"), List(PartitionKey("identity", "cat")), filters)
    assert(kept.length <= 2, s"expected ≤2 files after pruning, got ${kept.length}")
    assert(lake.table("main.p").filter(col("cat") === "a").count() == 2)
  }

  // ---- min/max stats pruning --------------------------------------------
  test("stats pruning: range predicates skip files") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.s", abSchema)
    lake.append("main.s", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    lake.append("main.s", (100 to 110).map(i => (i, i)).toDF("a", "b"))
    val st = lake.store.state()
    val tid = st.tableAt("main", "s", st.currentSnapshotId).get.tableId
    val live = st.filesAt(tid, st.currentSnapshotId)
    val kept = Pruning.prune(live, st.statsFor, Map("a" -> "INT", "b" -> "INT"),
      Nil, Seq(org.apache.spark.sql.sources.GreaterThan("a", 50)))
    assert(kept.length < live.length, "stats pruning dropped the low file")
    assert(lake.table("main.s").filter(col("a") > 50).count() == 11)
  }

  // ---- add_data_files (upstream DuckLake; reference lists unsupported) --
  test("add_data_files: registration, stats pruning, deletes, validation") {
    val lake = newLake()
    import spark.implicits._
    def parts(d: String): Seq[String] = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    lake.createTable("main.x", abSchema)
    lake.append("main.x", (1 to 5).map(i => (i, i)).toDF("a", "b"))
    val ext = Files.createTempDirectory("graft_addf").toString
    (100 to 110).map(i => (i, i)).toDF("a", "b").coalesce(1)
      .write.parquet(s"$ext/hi")
    lake.addDataFiles("main.x", parts(s"$ext/hi"))
    assert(lake.table("main.x").count() == 16)
    // the registration stats job makes the external file prunable
    val st = lake.store.state()
    val tid = st.tableAt("main", "x", st.currentSnapshotId).get.tableId
    val live = st.filesAt(tid, st.currentSnapshotId)
    val kept = Pruning.prune(live, st.statsFor, Map("a" -> "INT", "b" -> "INT"),
      Nil, Seq(org.apache.spark.sql.sources.LessThan("a", 50)))
    assert(kept.length < live.length, "registered file pruned by its stats")
    // positional deletes join the registered file by name like native ones
    lake.delete("main.x", col("a") === 105)
    assert(lake.table("main.x").count() == 15)
    assert(lake.table("main.x").filter(col("a") === 105).count() == 0)
    // a basename can only be registered once (it is the delete join key)
    val dup = intercept[IllegalArgumentException] {
      lake.addDataFiles("main.x", parts(s"$ext/hi").take(1))
    }
    assert(dup.getMessage.contains("already registered"))
    // type mismatch is rejected loudly — no silent widening
    Seq(("x", 1)).toDF("a", "b").write.parquet(s"$ext/bad")
    assertThrows[IllegalArgumentException] {
      lake.addDataFiles("main.x", parts(s"$ext/bad"))
    }
    // pure-footer path: no stats job, missing nullable column null-fills
    Seq(200, 201).toDF("a").write.parquet(s"$ext/partial")
    lake.addDataFiles("main.x", parts(s"$ext/partial"), collectStats = false)
    val nulls = lake.table("main.x").filter(col("a") >= 200)
      .select("b").collect()
    assert(nulls.length == 2 && nulls.forall(_.isNullAt(0)))
  }

  // ---- NOT NULL management (reference lists unsupported) ----------------
  test("not null: SET validates existing data, both write paths enforce") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.n", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    lake.append("main.n", Seq((1, "x"), (2, null)).toDF("a", "b"))
    // a surviving null refuses the constraint
    assertThrows[IllegalStateException] { lake.setNotNull("main.n", "b") }
    // after deleting it, file stats still count the null — the fallback
    // scan (not stats) is what must clear the constraint
    lake.delete("main.n", col("a") === 2)
    lake.setNotNull("main.n", "b")
    // parquet write path: codegen'd per-row guard
    intercept[Exception] {
      lake.append("main.n", Seq((3, null: String)).toDF("a", "b"))
    }
    // inline fast path: driver-side check
    assertThrows[IllegalArgumentException] {
      lake.insertRows("main.n", Seq(Seq(4, null)))
    }
    lake.setNotNull("main.n", "b", notNull = false)
    lake.insertRows("main.n", Seq(Seq(4, null)))
    assert(lake.table("main.n").count() == 2)
  }

  // ---- schema-level option scoping (reference lists unsupported) --------
  test("options: table beats schema beats global") {
    val lake = newLake()
    lake.createTable("main.o", abSchema)
    val tid = {
      val st = lake.store.state()
      st.tableAt("main", "o", st.currentSnapshotId).get.tableId
    }
    def resolved: Option[String] = {
      val st = lake.store.state()
      st.optionAt(tid, "parquet_compression", st.currentSnapshotId)
    }
    lake.setOption("parquet_compression", "zstd")
    assert(resolved.contains("zstd"))
    lake.setOption("parquet_compression", "snappy", schema = Some("main"))
    assert(resolved.contains("snappy"), "schema scope beats global")
    lake.setOption("parquet_compression", "gzip", table = Some("main.o"))
    assert(resolved.contains("gzip"), "table scope beats schema")
    assertThrows[IllegalArgumentException] {
      lake.setOption("k", "v", table = Some("main.o"), schema = Some("main"))
    }
  }

  // ---- sorted_table.sql --------------------------------------------------
  test("sorted table: compaction applies sort order") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.srt", abSchema)
    lake.setSort("main.srt", List(SortKey("a", ascending = false, nullsFirst = false)))
    lake.append("main.srt", Seq((1, 1), (3, 3)).toDF("a", "b"))
    lake.append("main.srt", Seq((2, 2), (4, 4)).toDF("a", "b"))
    lake.mergeAdjacentFiles("main.srt")
    val st = lake.store.state()
    val tid = st.tableAt("main", "srt", st.currentSnapshotId).get.tableId
    val f = st.filesAt(tid, st.currentSnapshotId)
    assert(f.length == 1)
    // file physically sorted desc: read raw parquet in order
    val raw = spark.read.parquet(f.head.path).select("a").collect().map(_.getInt(0)).toSeq
    assert(raw == Seq(4, 3, 2, 1), s"expected desc order, got $raw")
  }

  // ---- data_inlining_row_limit.sql ---------------------------------------
  test("inlining: small inserts stay in metadata, flush writes parquet") {
    val lake = newLake()
    lake.createTable("main.i", abSchema)
    lake.setOption("data_inlining_row_limit", "10", Some("main.i"))
    lake.insertRows("main.i", Seq(Seq(1, 10), Seq(2, 20)))
    val st = lake.store.state()
    val tid = st.tableAt("main", "i", st.currentSnapshotId).get.tableId
    assert(st.filesAt(tid, st.currentSnapshotId).isEmpty, "no parquet yet")
    assert(st.inlinedAt(tid, st.currentSnapshotId).nonEmpty)
    assert(lake.table("main.i").orderBy("a").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10), (2, 20)))
    // DML over inlined rows
    lake.delete("main.i", col("a") === 1)
    assert(lake.table("main.i").collect().map(_.getInt(0)).toSeq == Seq(2))
    lake.update("main.i", col("a") === 2, Map("b" -> lit(99)))
    assert(lake.table("main.i").collect().map(_.getInt(1)).toSeq == Seq(99))
    // flush → parquet, inline log empty, row ids preserved
    lake.flushInlinedData("main.i")
    val st2 = lake.store.state()
    assert(st2.inlinedAt(tid, st2.currentSnapshotId).isEmpty)
    assert(st2.filesAt(tid, st2.currentSnapshotId).nonEmpty)
    assert(lake.table("main.i").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((2, 99)))
    // over the limit → parquet append instead
    lake.insertRows("main.i", (1 to 20).map(i => Seq(i + 100, i)))
    val st3 = lake.store.state()
    assert(st3.inlinedAt(tid, st3.currentSnapshotId).isEmpty)
    assert(lake.table("main.i").count() == 21)
  }

  // ---- data_change_feed.sql ----------------------------------------------
  test("change feed: inserts, deletes, update pre/post images") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.c", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    val s0 = lake.currentSnapshot()
    lake.append("main.c", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    lake.delete("main.c", col("id") === 1)
    lake.update("main.c", col("id") === 2, Map("v" -> lit("B")))
    val s1 = lake.currentSnapshot()
    val ch = lake.tableChanges("main.c", s0, s1)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(ch == Set(
      ("insert", 1, "a"), ("insert", 2, "b"),
      ("delete", 1, "a"),
      ("update_preimage", 2, "b"), ("update_postimage", 2, "B")), s"got $ch")
    // insertions/deletions projections
    assert(lake.tableInsertions("main.c", s0, s1).count() == 3)
    assert(lake.tableDeletions("main.c", s0, s1).count() == 2)
    // pre/post pair share the row id
    val pairs = lake.tableChanges("main.c", s0, s1)
      .filter(col("_change_type").startsWith("update_"))
      .select("_row_id").collect().map(_.getLong(0)).toSeq
    assert(pairs.distinct.length == 1, s"pre/post row ids differ: $pairs")
  }

  // ---- freeze.sql / frozen_fdw.sql ---------------------------------------
  test("freeze: export and read-only frozen mount") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.f", abSchema)
    lake.append("main.f", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val frozenDir = Files.createTempDirectory("graft_frozen").toString
    lake.freeze(frozenDir)
    val cat = s"frozen${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.frozen", frozenDir)
    assert(spark.sql(s"SELECT sum(b) FROM $cat.main.f").collect().head.getLong(0) == 30)
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.main.f VALUES (3, 30)")
    }
    assert(err.getMessage.toLowerCase.contains("read-only")
      || err.toString.toLowerCase.contains("unsupported"))
  }

  // ---- isolation specs ----------------------------------------------------
  test("isolation: concurrent writers retry and never lose a commit") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.iso", abSchema)
    lake.setOption("data_inlining_row_limit", "1000")
    val threads = 4
    val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futs = (0 until threads).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          (0 until perThread).foreach { i =>
            lake.insertRows("main.iso", Seq(Seq(t * 100 + i, t)))
          }
      })
    }
    futs.foreach(_.get())
    pool.shutdown()
    val rows = lake.table("main.iso").collect().map(_.getInt(0))
    assert(rows.length == threads * perThread, s"lost commits: ${rows.length}")
    assert(rows.distinct.length == rows.length, "duplicate rows")
    // every snapshot id unique and contiguous
    val sids = lake.snapshots().select("snapshot_id").collect().map(_.getLong(0)).sorted
    assert(sids.distinct.length == sids.length)
    assert(sids.last - sids.head == sids.length - 1, "snapshot ids contiguous")
  }

  test("isolation: 32-thread commit storm — zero lost commits, bounded retries") {
    // VERDICT r4 #4: without backoff the optimistic loop livelocks under a
    // commit storm (all writers re-read, all claim sid+1, one wins, repeat).
    // With exponential backoff + full jitter every commit must land within
    // the default retry budget.
    val dir = java.nio.file.Files.createTempDirectory("graft-storm").toString
    val store = new MetadataStore(dir)
    val threads = 32
    val perThread = 4
    val maxAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futs = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
        override def call(): Seq[Long] = (0 until perThread).map { i =>
          val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
          val sid = store.commitWithRetry() { (_, sid) =>
            attempts.incrementAndGet()
            Meta.CommitDelta(Meta.Snapshot(sid, System.currentTimeMillis(), 0,
              List(s"storm:$t:$i")))
          }
          maxAttempts.accumulateAndGet(attempts.get(), Math.max)
          sid
        }
      })
    }
    val sids = futs.flatMap(_.get()).sorted
    pool.shutdown()
    // zero lost commits: every claim landed, ids unique and contiguous
    assert(sids.length == threads * perThread)
    assert(sids.distinct.length == sids.length, "duplicate snapshot ids")
    assert(sids.last - sids.head == sids.length - 1, "snapshot ids contiguous")
    // retry budget never exhausted (commitWithRetry would have thrown), and
    // the worst-case attempt count stays well inside the default budget of 20
    assert(maxAttempts.get() <= 20, s"worst commit took ${maxAttempts.get()} attempts")
  }

  test("isolation: concurrent parquet appends never lose rows or files") {
    // the distributed-append path under contention: staged parquet writes +
    // stats jobs + CAS commits racing on ONE table (insertRows storms only
    // exercise the inline path)
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.pq", abSchema)
    lake.setOption("data_inlining_row_limit", "0") // force parquet appends
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futs = (0 until threads).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit = (0 until 2).foreach { i =>
          lake.append("main.pq",
            Seq.tabulate(10)(j => (t * 1000 + i * 100 + j, t)).toDF("a", "b"))
        }
      })
    }
    futs.foreach(_.get())
    pool.shutdown()
    val rows = lake.table("main.pq").collect().map(_.getInt(0))
    assert(rows.length == threads * 2 * 10, s"lost rows: ${rows.length}")
    assert(rows.distinct.length == rows.length, "duplicate rows")
    val st = lake.store.state()
    val sids = st.snapshots.map(_.snapshotId)
    assert(sids.distinct.length == sids.length)
    assert(sids.max - sids.min == sids.length - 1, "snapshot ids contiguous")
    // every committed file exists on disk and row counts reconcile
    val tid = st.tableAt("main", "pq", st.currentSnapshotId).get.tableId
    val files = st.filesAt(tid, st.currentSnapshotId)
    assert(files.forall(f => java.nio.file.Files.exists(java.nio.file.Paths.get(f.path))))
    assert(files.map(_.rowCount).sum == threads * 2 * 10)
  }

  test("isolation: concurrent cross-table writes don't interfere") {
    val lake = newLake()
    lake.setOption("data_inlining_row_limit", "1000")
    lake.createTable("main.x1", abSchema)
    lake.createTable("main.x2", abSchema)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val f1 = pool.submit(new Runnable {
      override def run(): Unit =
        (0 until 6).foreach(i => lake.insertRows("main.x1", Seq(Seq(i, 1))))
    })
    val f2 = pool.submit(new Runnable {
      override def run(): Unit =
        (0 until 6).foreach(i => lake.insertRows("main.x2", Seq(Seq(i, 2))))
    })
    f1.get(); f2.get(); pool.shutdown()
    // the concurrent_cross_table_writes.spec duplicate-row guard
    assert(lake.table("main.x1").count() == 6)
    assert(lake.table("main.x2").count() == 6)
    assert(lake.table("main.x1").select("b").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("isolation: readers pinned to a snapshot don't see later commits") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.r", abSchema)
    lake.append("main.r", Seq((1, 1)).toDF("a", "b"))
    val pinned = lake.table("main.r", Some(lake.currentSnapshot()))
    lake.append("main.r", Seq((2, 2)).toDF("a", "b"))
    assert(pinned.count() == 1, "pinned reader sees later commit")
    assert(lake.table("main.r").count() == 2)
  }

  // ---- DML vs concurrent rewrite conflict ---------------------------------
  test("delete racing a compaction is detected, not silently lost") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.cc", abSchema)
    lake.append("main.cc", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    lake.append("main.cc", (11 to 20).map(i => (i, i)).toDF("a", "b"))
    // the compaction lands between the delete's scan and its commit
    val e = intercept[java.util.ConcurrentModificationException] {
      graft.lake.LakeWrite.delete(spark, lake.store, "main", "cc",
        col("a") <= 5,
        beforeCommit = () => lake.mergeAdjacentFiles("main.cc"))
    }
    assert(e.getMessage.contains("concurrent rewrite"))
    // nothing was lost: table still has all 20 rows; retrying succeeds
    assert(lake.table("main.cc").count() == 20)
    val (_, n) = lake.delete("main.cc", col("a") <= 5)
    assert(n == 5 && lake.table("main.cc").count() == 15)
  }

  test("DML racing a sorted rewrite is detected, not silently lost") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.rr", abSchema)
    lake.setSort("main.rr", List(SortKey("a", ascending = true, nullsFirst = false)))
    lake.append("main.rr", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    lake.append("main.rr", (11 to 20).map(i => (i, i)).toDF("a", "b"))
    // the delete lands between the rewrite's snapshot read and its commit;
    // the rewrite's survivors were computed WITHOUT it, so committing would
    // resurrect the deleted rows — must fail instead
    val e = intercept[java.util.ConcurrentModificationException] {
      lake.rewriteSorted("main.rr",
        beforeCommit = () => lake.delete("main.rr", col("a") <= 5))
    }
    assert(e.getMessage.contains("concurrent write"))
    // the delete survived the aborted rewrite; retrying the rewrite works
    assert(lake.table("main.rr").count() == 15)
    lake.rewriteSorted("main.rr")
    assert(lake.table("main.rr").count() == 15)
    assert(lake.tableInfo().filter(col("table_name") === "rr")
      .collect().head.getAs[Long]("delete_file_count") == 0L)
  }

  // ---- multi-statement transactions (transaction.sql,
  // explicit_transaction_commit.spec) -------------------------------------
  test("transaction: multiple ops land as exactly one snapshot") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tg", abSchema)
    val before = lake.currentSnapshot()
    val (_, sid) = lake.transaction { tx =>
      tx.append("main.tg", Seq((1, 10), (2, 20)).toDF("a", "b"))
      tx.append("main.tg", Seq((3, 30), (4, 40)).toDF("a", "b"))
      tx.delete("main.tg", col("a") === 2)
      // reads-your-own-writes inside the transaction
      assert(tx.table("main.tg").count() == 3)
    }
    assert(sid == before + 1, "transaction must claim exactly the next snapshot id")
    assert(lake.currentSnapshot() == before + 1)
    assert(lake.table("main.tg").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 4))
    // change feed over the single snapshot carries the NET transaction result
    val feed = lake.tableChanges("main.tg", before, sid)
    assert(feed.filter(col("_change_type") === "insert").count() == 3)
    // time travel to `before` sees the pre-transaction (empty) table
    assert(lake.table("main.tg", Some(before)).count() == 0)
  }

  test("change feed: a transaction led by a DDL op still reports its DML") {
    // regression (r13): classification used the snapshot's HEAD change
    // entry, so a tx whose first op was setSort tagged the whole snapshot
    // 'sort' and its append vanished from the change feed
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tdl", abSchema)
    val before = lake.currentSnapshot()
    val (_, sid) = lake.transaction { tx =>
      tx.setSort("main.tdl", List(Meta.SortKey("a", ascending = true, nullsFirst = true)))
      tx.append("main.tdl", Seq((1, 10), (2, 20)).toDF("a", "b"))
    }
    val feed = lake.tableChanges("main.tdl", before, sid)
    assert(feed.filter(col("_change_type") === "insert").count() == 2,
      "DDL-led transaction dropped its insert from the change feed")
    // and a DDL-led DELETE reports its pre-images too
    val (_, sid2) = lake.transaction { tx =>
      tx.setComment("main.tdl", Some("x"))
      tx.delete("main.tdl", col("a") === 2)
    }
    val feed2 = lake.tableChanges("main.tdl", sid, sid2)
    assert(feed2.filter(col("_change_type") === "delete").count() == 1,
      "DDL-led transaction dropped its delete from the change feed")
  }

  test("transaction: rollback removes staged files and metadata is untouched") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tr", abSchema)
    lake.append("main.tr", Seq((1, 10)).toDF("a", "b"))
    val before = lake.currentSnapshot()
    val dataDirFiles = () => {
      val d = java.nio.file.Paths.get(lake.root)
      java.nio.file.Files.walk(d).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    }
    val filesBefore = dataDirFiles()
    val e = intercept[RuntimeException] {
      lake.transaction { tx =>
        tx.append("main.tr", Seq((2, 20)).toDF("a", "b"))
        tx.delete("main.tr", col("a") === 1)
        throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(lake.currentSnapshot() == before, "rollback must not commit")
    assert(lake.table("main.tr").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(dataDirFiles() == filesBefore,
      "staged parquet files must be deleted on rollback")
  }

  test("transaction: concurrent commit aborts the transaction (serial)") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tc2", abSchema)
    val outside = new Lake(spark, lake.root)
    intercept[java.util.ConcurrentModificationException] {
      lake.transaction { tx =>
        tx.append("main.tc2", Seq((1, 10)).toDF("a", "b"))
        // another writer lands between transaction start and commit
        outside.append("main.tc2", Seq((99, 990)).toDF("a", "b"))
      }
    }
    // the outside write survives; the transaction's rows do not
    assert(lake.table("main.tc2").collect().map(_.getInt(0)).toSeq == Seq(99))
  }

  test("transaction: maintenance ops are rejected inside") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tm", abSchema)
    lake.append("main.tm", Seq((1, 10)).toDF("a", "b"))
    lake.transaction { tx =>
      val e = intercept[IllegalArgumentException](tx.vacuum("main.tm"))
      assert(e.getMessage.contains("transaction"))
      intercept[IllegalArgumentException](tx.cleanupOldFiles())
      intercept[IllegalArgumentException](tx.freeze("/tmp/never"))
    }
    // nesting is rejected too
    lake.transaction { tx =>
      intercept[IllegalArgumentException](tx.transaction(_ => ()))
    }
  }

  test("transaction: create-and-populate a new table inside one transaction") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t1", abSchema)
    lake.append("main.t1", Seq((1, 10)).toDF("a", "b"))
    val before = lake.currentSnapshot()
    lake.transaction { tx =>
      tx.append("main.t1", Seq((2, 20)).toDF("a", "b"))
      tx.createTable("main.t2", abSchema)
      tx.append("main.t2", Seq((7, 70)).toDF("a", "b"))
      tx.insertRows("main.t2", Seq(Seq(8, 80)))
    }
    assert(lake.currentSnapshot() == before + 1)
    assert(lake.table("main.t1").count() == 2)
    assert(lake.table("main.t2").collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
  }

  // ---- variant path stats + pruning (ducklake_file_variant_stats) --------
  test("variant path stats are recorded and variant_get predicates prune files") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.vp", StructType(Seq(
      StructField("id", IntegerType), StructField("v", VariantType))))
    // three appends with disjoint $.price ranges → three files with
    // disjoint recorded variant path min/max
    Seq(0, 100, 200).foreach { base =>
      lake.append("main.vp", spark.range(10).coalesce(1).selectExpr(
        s"cast(id + $base as int) AS id",
        s"""parse_json(concat('{"price": ', id + $base, ', "tag": "t', id % 3, '"}')) AS v"""))
    }
    val st = lake.store.state()
    val priceStats = st.stats.filter(_.columnName == "v.$.price")
    assert(priceStats.size == 3, s"one v.$$.price stat per file: $priceStats")
    assert(priceStats.exists(s => s.minValue.contains("200") && s.maxValue.contains("209")))
    assert(st.stats.exists(_.columnName == "v.$.tag"), "string paths get stats too")

    val cat = s"vpcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val q = spark.sql(
      s"SELECT count(*) FROM $cat.main.vp WHERE variant_get(v, '$$.price', 'bigint') >= 200")
    // the rule attached file-prune predicates to the relation's LakeTable
    // (after pushdown the optimized plan holds a DataSourceV2ScanRelation)
    def lakeTableOf(df: org.apache.spark.sql.DataFrame): Option[LakeTable] =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
            if r.table.isInstanceOf[LakeTable] => r.table.asInstanceOf[LakeTable]
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
            if s.relation.table.isInstanceOf[LakeTable] =>
          s.relation.table.asInstanceOf[LakeTable]
      }
    val table = lakeTableOf(q)
    assert(table.exists(_.variantPrune.nonEmpty),
      "LakeVariantPruning must extract the variant_get comparison")
    // and the predicate prunes the file list to the single matching file
    def fileCount(t: LakeTable): Int =
      t.newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().asInstanceOf[LakeNativeScan].currentFileCount
    assert(fileCount(table.get) == 1, "variant stats must prune to 1 of 3 files")
    // row-level semantics intact
    assert(q.collect().head.getLong(0) == 10)
    // a range hitting two files keeps exactly those two
    val q2 = spark.sql(
      s"SELECT count(*) FROM $cat.main.vp WHERE variant_get(v, '$$.price', 'bigint') < 105")
    val t2 = lakeTableOf(q2)
    assert(fileCount(t2.get) == 2)
    assert(q2.collect().head.getLong(0) == 15)
  }

  test("variant pruning: requested type ≠ stat type is incomparable (file kept)") {
    // ADVICE r5 (high): $.price values 1..9 recorded with bigint stats
    // (min 1, max 9); variant_get(v,'$.price','string') > '15' matches
    // rows under STRING ordering ('9' > '15'), but comparing the literal
    // against the bigint bounds numerically (9 < 15) would silently drop
    // the file. The requested extraction type now rides in the synthetic
    // filter name and a mismatch keeps the file.
    val lake = newLake()
    lake.createTable("main.vt", StructType(Seq(
      StructField("id", IntegerType), StructField("v", VariantType))))
    lake.append("main.vt", spark.range(1, 10).coalesce(1).selectExpr(
      "cast(id as int) AS id",
      """parse_json(concat('{"price": ', id, '}')) AS v"""))
    val st = lake.store.state()
    val ps = st.stats.filter(_.columnName == "v.$.price")
    assert(ps.nonEmpty && ps.forall(_.dataType.equalsIgnoreCase("bigint")),
      s"setup: price stats must be bigint-typed: $ps")

    val cat = s"vtcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    // string extraction, string ordering: '2'..'9' > '15' → 8 rows
    val q = spark.sql(s"SELECT count(*) FROM $cat.main.vt " +
      s"WHERE variant_get(v, '$$.price', 'string') > '15'")
    assert(q.collect().head.getLong(0) == 8,
      "type-mismatched variant stat must not prune the file")
    // matching type still prunes: bigint > 15 eliminates the only file
    val q2 = spark.sql(s"SELECT count(*) FROM $cat.main.vt " +
      s"WHERE variant_get(v, '$$.price', 'bigint') > 15")
    def fileCount(df: org.apache.spark.sql.DataFrame): Option[Int] =
      df.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
            if s.relation.table.isInstanceOf[LakeTable] =>
          s.relation.table.asInstanceOf[LakeTable]
      }.map(_.newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().asInstanceOf[LakeNativeScan].currentFileCount)
    assert(fileCount(q2).contains(0), "same-type variant predicate still prunes")
    assert(q2.collect().head.getLong(0) == 0)
  }

  // ---- thaw: external ducklake_* catalog import ---------------------------
  test("thaw round-trip: freeze → importCatalog reproduces history") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.rt", abSchema,
      sortKeys = List(SortKey("a", ascending = true, nullsFirst = false)))
    lake.append("main.rt", (1 to 20).map(i => (i, i * 10)).toDF("a", "b"))
    lake.delete("main.rt", col("a") % 5 === 0)
    lake.setOption("target_file_size", "64MB", Some("main.rt"))
    val frozen = Files.createTempDirectory("graft_rtfreeze").toString
    lake.freeze(frozen)

    val b = new Lake(spark, Files.createTempDirectory("graft_rtlake").toString)
    val sid = b.importCatalog(s"$frozen/catalog_parquet")
    assert(sid == lake.currentSnapshot())
    // current content identical
    assert(b.table("main.rt").collect().map(_.getInt(0)).sorted.toSeq ==
      (1 to 20).filter(_ % 5 != 0))
    // history replayed: time travel to the pre-delete snapshot (history is
    // create=0, append=1, delete=2, setOption=3)
    assert(b.table("main.rt", Some(1)).count() == 20)
    // metadata preserved: sort keys and options survive the round trip
    assert(b.store.state().sortKeysAt(
      b.store.state().tableAt("main", "rt", sid).get.tableId, sid)
      .map(_.expr) == List("a"))
    assert(b.options().filter(col("key") === "target_file_size").count() == 1)
  }

  test("incremental importCatalog: re-sync appends only new snapshots; forks abort") {
    val a = newLake()
    import spark.implicits._
    a.createTable("main.inc", abSchema)                                // 0
    a.append("main.inc", (1 to 5).map(i => (i, i)).toDF("a", "b"))     // 1
    val f1 = Files.createTempDirectory("graft_inc1").toString
    a.freeze(f1)
    val b = newLake()
    b.importCatalog(s"$f1/catalog_parquet")
    assert(b.currentSnapshot() == 1)
    // the external writer keeps committing into the shared catalog
    a.append("main.inc", Seq((6, 6)).toDF("a", "b"))                   // 2
    a.delete("main.inc", col("a") === 1)                               // 3
    val f2 = Files.createTempDirectory("graft_inc2").toString
    a.freeze(f2)
    val sid = b.importCatalog(s"$f2/catalog_parquet")
    assert(sid == 3)
    assert(b.table("main.inc").collect().map(_.getInt(0)).sorted.toSeq == (2 to 6))
    // the change feed works over the synced range
    val ch = b.tableChanges("main.inc", 1, 3)
      .select("_change_type", "a").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(ch == Seq(("delete", 1), ("insert", 6)))
    // re-importing the identical catalog is a no-op
    assert(b.importCatalog(s"$f2/catalog_parquet") == 3)
    // a LOCAL commit forks the history → the next sync must abort loudly
    b.append("main.inc", Seq((99, 99)).toDF("a", "b"))                 // local 4
    Thread.sleep(3) // distinct commit time for the external snapshot 4
    a.append("main.inc", Seq((7, 7)).toDF("a", "b"))                   // external 4
    val f3 = Files.createTempDirectory("graft_inc3").toString
    a.freeze(f3)
    val e = intercept[IllegalStateException] { b.importCatalog(s"$f3/catalog_parquet") }
    assert(e.getMessage.contains("divergent"))
  }

  test("checkpoint GC keeps the newest 2; a torn survivor falls back cleanly") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.cg", abSchema)
    for (i <- 1 to 4) {
      lake.append("main.cg", Seq((i, i)).toDF("a", "b"))
      lake.checkpoint()
    }
    val dir = java.nio.file.Paths.get(lake.root, "_ducklake")
    def ckpts: Seq[String] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ckpt")).toSeq.sorted
      finally s.close()
    }
    assert(ckpts.size == 4)
    lake.cleanupOldFiles()
    assert(ckpts.size == 2, s"GC keeps newest 2: $ckpts")
    // torn newest checkpoint: a cold open skips it and reads the older one
    java.nio.file.Files.write(dir.resolve(ckpts.last), "torn{".getBytes)
    val cold = new Lake(spark, lake.root)
    assert(cold.table("main.cg").count() == 4)
  }

  test("foreign view/macro rows survive import → freeze round-trip") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.vw", abSchema)
    lake.append("main.vw", Seq((1, 1)).toDF("a", "b"))
    val frozen = Files.createTempDirectory("graft_vwfreeze").toString
    lake.freeze(frozen)
    val cat = s"$frozen/catalog_parquet"
    // a foreign engine records a view and a macro in the shared catalog —
    // we don't execute them, but dropping them on import would corrupt the
    // catalog on re-export (VERDICT r5 missing #2)
    Seq((7L, "uuid-7", 0L, Option.empty[Long], 0L, "my_view", "duckdb",
        "SELECT * FROM vw WHERE a > 0", Option.empty[String]))
      .toDF("view_id", "view_uuid", "begin_snapshot", "end_snapshot",
        "schema_id", "view_name", "dialect", "sql", "column_aliases")
      .write.parquet(s"$cat/ducklake_view.parquet")
    Seq((3L, "uuid-m3", 0L, Option.empty[Long], 0L, "my_macro"))
      .toDF("macro_id", "macro_uuid", "begin_snapshot", "end_snapshot",
        "schema_id", "macro_name")
      .write.parquet(s"$cat/ducklake_macro.parquet")
    val b = newLake()
    b.importCatalog(cat)
    val refrozen = Files.createTempDirectory("graft_vwrefreeze").toString
    b.freeze(refrozen)
    // the rows re-emerge with their original columns in the parquet dump...
    val vw = spark.read.parquet(s"$refrozen/catalog_parquet/ducklake_view.parquet").collect()
    assert(vw.length == 1 && vw.head.getAs[String]("view_name") == "my_view"
      && vw.head.getAs[String]("sql") == "SELECT * FROM vw WHERE a > 0"
      && vw.head.getAs[Long]("view_id") == 7L && vw.head.isNullAt(
        vw.head.fieldIndex("end_snapshot")))
    val mc = spark.read.parquet(s"$refrozen/catalog_parquet/ducklake_macro.parquet").collect()
    assert(mc.length == 1 && mc.head.getAs[String]("macro_name") == "my_macro")
    // ...the carrier tags never leak into ducklake_tag (empty datasets are
    // not written at all since r12 — absence is the strongest form)...
    val tagPath = java.nio.file.Paths.get(refrozen, "catalog_parquet", "ducklake_tag.parquet")
    assert(!java.nio.file.Files.exists(tagPath) ||
      spark.read.parquet(tagPath.toString)
        .filter(col("object_id").startsWith("ducklake:")).count() == 0)
    // ...and the SQL artifact carries the rows too
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(refrozen, "ducklake_catalog.sql")))
    assert(sql.contains("my_view") && sql.contains("my_macro"))
  }

  test("thaw survives expired history: orphaned begins attach to the first snapshot") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.eh", abSchema)                        // snap 0
    lake.append("main.eh", (1 to 10).map(i => (i, i)).toDF("a", "b")) // snap 1
    lake.delete("main.eh", col("a") <= 2)                        // snap 2
    lake.append("main.eh", Seq((11, 11)).toDF("a", "b"))         // snap 3
    val frozen = Files.createTempDirectory("graft_ehfreeze").toString
    lake.freeze(frozen)
    val cat = s"$frozen/catalog_parquet"
    // external expiry: snapshots 0-1 gone from the catalog, their entity
    // rows (table, columns, first data file) keep begin=0/1
    val stripped = Files.createTempDirectory("graft_ehstrip").toString
    java.nio.file.Files.list(java.nio.file.Paths.get(cat)).forEach { p =>
      val name = p.getFileName.toString
      val df = spark.read.parquet(p.toString)
      val out = if (name == "ducklake_snapshot.parquet" ||
          name == "ducklake_snapshot_changes.parquet")
        df.filter(col("snapshot_id") >= 2) else df
      out.write.parquet(s"$stripped/$name")
    }
    val b = new Lake(spark, Files.createTempDirectory("graft_ehlake").toString)
    val sid = b.importCatalog(stripped)
    assert(sid == 3)
    // the pre-expiry table/files are visible at every surviving snapshot
    assert(b.table("main.eh").collect().map(_.getInt(0)).sorted.toSeq ==
      ((3 to 10) :+ 11))
    assert(b.table("main.eh", Some(2)).count() == 8)
  }

  test("thaw accepts a reference-shaped delete file (single data_file_id)") {
    // foreign catalogs model one delete file per data file with no
    // counts_by_file extension column — the loader reconstructs countsByFile
    // from (data_file_id, delete_count)
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.fs", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    lake.delete("main.fs", col("a") <= 3)
    val frozen = Files.createTempDirectory("graft_fsfreeze").toString
    lake.freeze(frozen)
    val cat = s"$frozen/catalog_parquet"
    // strip the extension column like a foreign writer would
    val stripped = Files.createTempDirectory("graft_fsstrip").toString
    java.nio.file.Files.list(java.nio.file.Paths.get(cat)).forEach { p =>
      val name = p.getFileName.toString
      val df = spark.read.parquet(p.toString)
      val out = if (name == "ducklake_delete_file.parquet")
        df.drop("counts_by_file") else df
      out.write.parquet(s"$stripped/$name")
    }
    val b = new Lake(spark, Files.createTempDirectory("graft_fslake").toString)
    b.importCatalog(stripped)
    assert(b.table("main.fs").collect().map(_.getInt(0)).sorted.toSeq == (4 to 10))
    val dels = b.store.state().deleteFiles.filter(_.end.isEmpty)
    assert(dels.nonEmpty && dels.forall(_.countsByFile.nonEmpty))
  }

  test("thaw survives INTERIOR snapshot-id gaps: rows attach to the next survivor") {
    // ADVICE r5: a foreign catalog with non-contiguous ids (interior
    // snapshots expired, not just a prefix) carries entity rows whose
    // begin equals no surviving snapshot — they must attach to the first
    // surviving snapshot >= begin, not be silently dropped.
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.ig", abSchema)                         // snap 0
    lake.append("main.ig", Seq((1, 1)).toDF("a", "b"))            // snap 1
    lake.append("main.ig", Seq((2, 2)).toDF("a", "b"))            // snap 2
    lake.append("main.ig", Seq((3, 3)).toDF("a", "b"))            // snap 3
    val frozen = Files.createTempDirectory("graft_igfreeze").toString
    lake.freeze(frozen)
    val stripped = Files.createTempDirectory("graft_igstrip").toString
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$frozen/catalog_parquet")).forEach { p =>
      val name = p.getFileName.toString
      val df = spark.read.parquet(p.toString)
      val out = if (name == "ducklake_snapshot.parquet" ||
          name == "ducklake_snapshot_changes.parquet")
        df.filter(col("snapshot_id") === 0 || col("snapshot_id") === 3) else df
      out.write.parquet(s"$stripped/$name")
    }
    val b = new Lake(spark, Files.createTempDirectory("graft_iglake").toString)
    assert(b.importCatalog(stripped) == 3)
    // files begun at gap snapshots 1 and 2 survive, visible at snapshot 3
    assert(b.table("main.ig").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // and correctly invisible at the surviving snapshot BEFORE the gap
    assert(b.table("main.ig", Some(0)).count() == 0)
  }

  test("freeze dump indexes partition values by the table's key order") {
    // ADVICE r5: partition_key_index followed label-sorted order, so a
    // multi-key spec whose labels aren't alphabetical ("z" before "a")
    // mis-keys values for any reference-shaped consumer resolving by index.
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.ko", StructType(Seq(
      StructField("z", IntegerType), StructField("a", IntegerType),
      StructField("x", IntegerType))),
      partitionKeys = List(PartitionKey("identity", "z"), PartitionKey("identity", "a")))
    lake.append("main.ko", Seq((7, 3, 1)).toDF("z", "a", "x"))
    val frozen = Files.createTempDirectory("graft_kofreeze").toString
    lake.freeze(frozen)
    val fpv = spark.read
      .parquet(s"$frozen/catalog_parquet/ducklake_file_partition_value.parquet")
      .collect().map(r => r.getString(r.fieldIndex("partition_key_label")) ->
        r.getLong(r.fieldIndex("partition_key_index"))).toMap
    assert(fpv == Map("z" -> 0L, "a" -> 1L),
      s"indices must follow the spec's key order (z first), got $fpv")
  }

  test("importCatalog of a non-catalog dir fails loudly") {
    // ADVICE r5: java.io.File probing read every dataset as absent on a
    // non-local FS (or typo'd path) and "imported" an empty catalog.
    val lake = newLake()
    val empty = Files.createTempDirectory("graft_nocat").toString
    val e = intercept[IllegalArgumentException] { lake.importCatalog(empty) }
    assert(e.getMessage.contains("ducklake_snapshot"))
  }

  test("metadata change racing a sorted rewrite is detected too") {
    // ADVICE r4: a set_sort reset landing between the rewrite's snapshot
    // read and its commit must abort the rewrite — otherwise it commits
    // stamped as clustered by an order the table no longer declares
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.rm", abSchema)
    lake.setSort("main.rm", List(SortKey("a", ascending = true, nullsFirst = false)))
    lake.append("main.rm", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    val e = intercept[java.util.ConcurrentModificationException] {
      lake.rewriteSorted("main.rm",
        beforeCommit = () => lake.setSort("main.rm",
          List(SortKey("b", ascending = false, nullsFirst = true))))
    }
    assert(e.getMessage.contains("metadata change"))
    // table contents untouched by the aborted rewrite
    assert(lake.table("main.rm").count() == 10)
  }

  // ---- SQL TVF sugar (session extensions) ---------------------------------
  test("graft_* table functions resolve through the session extensions") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tf", abSchema)
    lake.append("main.tf", Seq((1, 1), (2, 2)).toDF("a", "b"))
    lake.delete("main.tf", col("a") === 1)
    val r = lake.root.replace("'", "''")
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshots('$r')")
      .collect().head.getLong(0) == 3)
    assert(spark.sql(s"SELECT row_count FROM graft_table_info('$r')")
      .collect().head.getLong(0) == 2)
    assert(spark.sql(s"SELECT count(*) FROM graft_list_files('$r', 'main.tf')")
      .collect().head.getLong(0) >= 1)
    val ch = spark.sql(
      s"SELECT _change_type, a FROM graft_table_changes('$r', 'main.tf', 0, 2) ORDER BY _change_type, a")
      .collect().map(x => (x.getString(0), x.getInt(1))).toSeq
    assert(ch == Seq(("delete", 1), ("insert", 1), ("insert", 2)), s"got $ch")
    val be = spark.sql(
      s"SELECT value FROM graft_settings('$r') WHERE setting = 'metadata_backend'")
      .collect().head.getString(0)
    assert(be == "file")
  }

  test("small lake table auto-broadcasts in a join (metadata-backed sizeInBytes)") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.dim", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    val cat = s"lbc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    // fact side is sized past autoBroadcastJoinThreshold (10 MB), so a
    // BroadcastHashJoin can only appear if the LAKE side reports a small
    // finite size — a V1 relation without sizeInBytes defaults to
    // effectively-infinite and would force a sort-merge/shuffled-hash join
    spark.range(0, 2000000).selectExpr("cast(id % 3 + 1 as int) AS a", "id AS v")
      .createOrReplaceTempView("bigfact")
    // force the composed V1 tier — the native tiers get stats from
    // MetadataFileIndex already
    spark.conf.set("spark.graft.lake.nativeScan", "false")
    try {
      val joined = spark.sql(
        s"SELECT b, count(*) AS n FROM bigfact JOIN $cat.main.dim USING (a) GROUP BY b")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast of lake dim side:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == 2000000L)
      // guard: with size-based broadcasting disabled the hint must not fire
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p2 = spark.sql(
          s"SELECT b, count(*) AS n FROM bigfact JOIN $cat.main.dim USING (a) GROUP BY b")
          .queryExecution.executedPlan.toString
        assert(!p2.contains("BroadcastHashJoin"), s"hint fired with threshold off:\n$p2")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.conf.unset("spark.graft.lake.nativeScan")
  }

  test("runtime (DPP) file pruning on the native scan via hidden partition values") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.fact", StructType(Seq(
      StructField("k", IntegerType), StructField("v", LongType))),
      partitionKeys = List(PartitionKey("identity", "k")))
    // one append per partition value → 5 files, each with a recorded k
    (0 until 5).foreach { k =>
      lake.append("main.fact",
        spark.range(0, 50000).selectExpr(s"cast($k as int) AS k", "id AS v"))
    }
    val st = lake.store.state()
    val t = new LakeTable(lake.store, "main", "fact", st.currentSnapshotId, st)
    val scan = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val native = scan.asInstanceOf[LakeNativeScan]
    assert(native.currentFileCount == 5)
    assert(native.filterAttributes().map(_.describe()).toSeq == Seq("k"))
    // a runtime IN filter (what a DPP subquery delivers) re-prunes the list
    native.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(2, 4))))
    assert(native.currentFileCount == 2)
    assert(native.toBatch.planInputPartitions().nonEmpty)
    // end-to-end: join on the partition column against a filtered dim
    // derives a DPP subquery against the lake fact scan. The dim must be a
    // real source (a LocalRelation folds the filter away and DPP sees no
    // selective predicate), and the broadcast threshold sits between dim
    // and fact sizes so only the dim broadcasts.
    val cat = s"ldpp${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq((2, "keep"), (7, "other")).toDF("k", "tag")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dpp_dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    try {
      val q = spark.sql(
        s"""SELECT tag, count(*) AS n FROM $cat.main.fact f
           |JOIN dpp_dim d ON f.k = d.k WHERE d.tag = 'keep' GROUP BY tag""".stripMargin)
      assert(q.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
        q.queryExecution.optimizedPlan.toString)
      val rows = q.collect()
      assert(rows.length == 1 && rows.head.getLong(1) == 50000L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("runtime filters prune files by min/max stats on sort-key columns") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.sf", StructType(Seq(
      StructField("k", LongType), StructField("v", LongType))))
    lake.setSort("main.sf", List(SortKey("k", ascending = true, nullsFirst = false)))
    // three appends with disjoint k ranges → tight per-file min/max
    Seq(0L, 100L, 200L).foreach { base =>
      lake.append("main.sf",
        spark.range(base, base + 100).selectExpr("id AS k", "id * 2 AS v")
          .coalesce(1))
    }
    val st = lake.store.state()
    val t = new LakeTable(lake.store, "main", "sf", st.currentSnapshotId, st)
    val scan = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val native = scan.asInstanceOf[LakeNativeScan]
    // the sort column is runtime-filterable even with no partition keys
    assert(native.filterAttributes().map(_.describe()).toSeq == Seq("k"))
    assert(native.currentFileCount == 3)
    native.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(150L, 160L))))
    assert(native.currentFileCount == 1)
  }

  test("batch read via format(graft-lake) with versionAsOf/timestampAsOf") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.fr", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val v1 = lake.currentSnapshot()
    lake.append("main.fr", Seq((3, 30)).toDF("a", "b"))
    def rd = spark.read.format("graft-lake")
      .option("root", lake.root).option("table", "main.fr")
    assert(rd.load().count() == 3)
    assert(rd.option("versionAsOf", v1.toString).load().count() == 2)
    assert(rd.option("timestampAsOf", System.currentTimeMillis.toString)
      .load().count() == 3)
    // pushdown reaches the same native tier as the catalog path
    val filtered = rd.load().filter(col("a") === 3)
    assert(filtered.collect().map(_.getInt(1)).toSeq == Seq(30))
    // batch WRITE through the same format (V1_BATCH_WRITE capability)
    Seq((4, 40)).toDF("a", "b").write.format("graft-lake")
      .option("root", lake.root).option("table", "main.fr")
      .mode("append").save()
    assert(rd.load().count() == 4)
    assert(lake.table("main.fr").filter(col("a") === 4).count() == 1)
  }

  test("storage-partitioned join: co-partitioned lake tables join with no shuffle") {
    val lake = newLake()
    def mk(name: String): Unit = {
      lake.createTable(s"main.$name", StructType(Seq(
        StructField("k", IntegerType), StructField("v", LongType))),
        partitionKeys = List(PartitionKey("identity", "k")))
      lake.append(s"main.$name",
        spark.range(0, 300).selectExpr("cast(id % 3 as int) AS k", "id AS v"))
    }
    mk("spa"); mk("spb")
    val cat = s"lspj${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"SELECT count(*) AS n FROM $cat.main.spa a JOIN $cat.main.spb b ON a.k = b.k")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-partitioned join still shuffled:\n$plan")
      assert(q.collect().head.getLong(0) == 3L * 100 * 100)
      // a live delete overlay must NOT re-introduce the shuffle: the
      // delete-aware tier key-groups too (vacuum is not an SPJ prerequisite)
      lake.delete("main.spb", col("v") < 10)
      val q2 = spark.sql(
        s"SELECT count(*) AS n FROM $cat.main.spa a JOIN $cat.main.spb b ON a.k = b.k")
      val plan2 = q2.queryExecution.executedPlan.toString
      assert(plan2.contains("SortMergeJoin"), plan2)
      assert(!plan2.contains("Exchange hashpartitioning"),
        s"delete overlay re-introduced the shuffle:\n$plan2")
      // spb keeps per k: k=0 → 96, k=1 → 97, k=2 → 97 of its 100 rows
      assert(q2.collect().head.getLong(0) == 100L * (96 + 97 + 97))
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("runtime filters compose with the delete-aware tier") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.fd", StructType(Seq(
      StructField("k", IntegerType), StructField("v", LongType))),
      partitionKeys = List(PartitionKey("identity", "k")))
    (0 until 4).foreach { k =>
      lake.append("main.fd",
        spark.range(0, 100).selectExpr(s"cast($k as int) AS k", "id AS v"))
    }
    lake.delete("main.fd", col("v") < 10) // live overlay → tier 2
    val st = lake.store.state()
    val t = new LakeTable(lake.store, "main", "fd", st.currentSnapshotId, st)
    val scan = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val native = scan.asInstanceOf[LakeNativeScan]
    assert(native.currentFileCount == 4)
    assert(native.description().contains("with deletes"), native.description())
    native.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(1))))
    assert(native.currentFileCount == 1)
    // the re-planned delete-aware batch still applies positions correctly
    val parts = native.toBatch.planInputPartitions()
    assert(parts.nonEmpty)
    val rows = lake.table("main.fd").filter(col("k") === 1).count()
    assert(rows == 90)
  }

  test("native tier survives defaultless ADD COLUMN and DROP COLUMN epochs") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.ne", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val cat = s"lne${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    def scanOf(): org.apache.spark.sql.connector.read.Scan = {
      val st = lake.store.state()
      new LakeTable(lake.store, "main", "ne", st.currentSnapshotId, st)
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    }
    // defaultless ADD COLUMN: by-name reader null-fills old files natively
    spark.sql(s"ALTER TABLE $cat.main.ne ADD COLUMN c INT")
    lake.append("main.ne", Seq((3, 30, 300)).toDF("a", "b", "c"))
    assert(scanOf().isInstanceOf[LakeNativeScan], "ADD COLUMN dropped the native tier")
    assert(lake.table("main.ne").orderBy("a").collect().map(r =>
      (r.getInt(0), if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq ==
      Seq((1, -1), (2, -1), (3, 300)))
    // DROP COLUMN: the by-name reader just ignores the stale column
    spark.sql(s"ALTER TABLE $cat.main.ne DROP COLUMN b")
    assert(scanOf().isInstanceOf[LakeNativeScan], "DROP COLUMN dropped the native tier")
    assert(lake.table("main.ne").columns.toSeq == Seq("a", "c"))
    // re-adding a dropped NAME mints a new column id: the old files' stale
    // "b" data must NOT leak into the successor → composed plan, all null
    spark.sql(s"ALTER TABLE $cat.main.ne ADD COLUMN b INT")
    assert(!scanOf().isInstanceOf[LakeNativeScan], "re-added name must not read stale data")
    assert(lake.table("main.ne").collect().forall(r => r.isNullAt(r.fieldIndex("b"))))
  }

  test("_row_id metadata column: SQL-visible row lineage (upstream rowid)") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.rid", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    val cat = s"lrid${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val ids = spark.sql(s"SELECT _row_id, a FROM $cat.main.rid ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(ids.map(_._1).distinct.length == 3, s"row ids not unique: ${ids.toSeq}")
    // row identity survives an UPDATE rewrite (survivors keep their id)
    val id2 = ids.find(_._2 == 2).get._1
    lake.update("main.rid", col("a") === 2, Map("b" -> lit(99)))
    val after = spark.sql(s"SELECT _row_id FROM $cat.main.rid WHERE a = 2")
      .collect().head.getLong(0)
    assert(after == id2, s"row id changed across UPDATE: $id2 -> $after")
    // plain reads are unaffected (and still eligible for the native tier)
    assert(spark.sql(s"SELECT a FROM $cat.main.rid ORDER BY a").count() == 3)
  }

  test("ALTER TYPE widening keeps old epochs on the native tier") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.nw", Seq((1, 10), (2, 20)).toDF("a", "b"))
    val cat = s"lnw${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    spark.sql(s"ALTER TABLE $cat.main.nw ALTER COLUMN b TYPE BIGINT")
    lake.append("main.nw", Seq((3, 3000000000L)).toDF("a", "b"))
    val st = lake.store.state()
    val scan = new LakeTable(lake.store, "main", "nw", st.currentSnapshotId, st)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    assert(scan.isInstanceOf[LakeNativeScan], "int->bigint widening dropped the native tier")
    assert(lake.table("main.nw").orderBy("a").collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 20L, 3000000000L))
    // pushed filter over the widened column stays correct across epochs
    assert(spark.sql(s"SELECT a FROM $cat.main.nw WHERE b > 15")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // r16: NON-promotions reject. Narrowing (bigint->int) trips Spark's
    // own upcast check at the SQL boundary; bigint->string UPCASTS per
    // Spark but is not a DuckLake promotion — OUR catalog guard
    // (Meta.typePromotes) must reject it rather than let existing file
    // values re-type silently
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.main.nw ALTER COLUMN b TYPE INT"))
    assert(e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e1.getMessage.contains("promotion"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.main.nw ALTER COLUMN b TYPE STRING"))
    assert(e2.getMessage.contains("promotion"), e2.getMessage)
    // the rejected ALTERs left no epoch behind: reads and schema unchanged
    assert(lake.table("main.nw").schema("b").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("ADD COLUMN WITH DEFAULT keeps the composed tier (default must be filled)") {
    val lake = newLake()
    import spark.implicits._
    lake.createTableAs("main.nd", Seq((1, 10)).toDF("a", "b"))
    val cat = s"lnd${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    spark.sql(s"ALTER TABLE $cat.main.nd ADD COLUMN t STRING DEFAULT 'x'")
    val st = lake.store.state()
    val scan = new LakeTable(lake.store, "main", "nd", st.currentSnapshotId, st)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    assert(!scan.isInstanceOf[LakeNativeScan])
    assert(lake.table("main.nd").collect().head.getString(2) == "x")
  }

  test("SPJ and runtime (DPP) filtering compose on the same scan") {
    val lake = newLake()
    import spark.implicits._
    def mk(name: String, rows: Long): Unit = {
      lake.createTable(s"main.$name", StructType(Seq(
        StructField("k", IntegerType), StructField("v", LongType))),
        partitionKeys = List(PartitionKey("identity", "k")))
      (0 until 4).foreach { k =>
        lake.append(s"main.$name",
          spark.range(0, rows).selectExpr(s"cast($k as int) AS k", "id AS v"))
      }
    }
    mk("ja", 20000) // big fact: stays over the broadcast threshold
    mk("jb", 50)    // small co-partitioned side, selectively filtered
    val cat = s"lsd${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val q = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.main.ja a JOIN $cat.main.jb b
           |ON a.k = b.k WHERE b.v = 0 AND b.k IN (1, 2)""".stripMargin)
      // whatever strategy the planner picks (SPJ sort-merge or broadcast
      // with a DPP subquery), the result must be exact
      assert(q.collect().head.getLong(0) == 2L * 20000)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("rewriteSorted clusters the table into disjoint sort-key ranges") {
    val lake = newLake()
    lake.createTable("main.cl", StructType(Seq(
      StructField("k", LongType), StructField("v", LongType))))
    lake.setSort("main.cl", List(SortKey("k", ascending = true, nullsFirst = false)))
    lake.setOption("target_file_size", "16384", Some("main.cl"))
    // interleaved appends → every file spans nearly the whole k domain
    (0 until 4).foreach { i =>
      lake.append("main.cl",
        spark.range(0, 5000).selectExpr(s"id * 4 + $i AS k", "id AS v").coalesce(1))
    }
    lake.delete("main.cl", col("k") < 100)
    val beforeCnt = lake.table("main.cl").count()
    val beforeSum = lake.table("main.cl").agg(sum(col("k"))).collect().head.getLong(0)
    val preSid = lake.currentSnapshot()

    val sid = lake.rewriteSorted("main.cl")

    // contents identical, overlays consumed, CDF silent
    assert(lake.table("main.cl").count() == beforeCnt)
    assert(lake.table("main.cl").agg(sum(col("k"))).collect().head.getLong(0) == beforeSum)
    val info = lake.tableInfo().filter(col("table_name") === "cl").collect().head
    assert(info.getAs[Long]("delete_file_count") == 0L)
    assert(lake.tableChanges("main.cl", preSid, sid).count() == 0)

    // per-file sort-key ranges are now disjoint (zone maps selective)
    val ranges = lake.tableWithRowMeta("main.cl")
      .groupBy(col(LakeRead.FileCol))
      .agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2, s"expected a multi-file clustered layout, got $ranges")
    ranges.sliding(2).foreach { case Array((_, mx1), (mn2, _)) =>
      assert(mx1 < mn2, s"overlapping file ranges: $ranges")
    }

    // and the clustered layout makes runtime filters prune whole files
    val st = lake.store.state()
    val t = new LakeTable(lake.store, "main", "cl", st.currentSnapshotId, st)
    val scan = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val native = scan.asInstanceOf[LakeNativeScan]
    native.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(ranges.head._2))))
    assert(native.currentFileCount == 1)
  }

  test("get_partition/get_sort/last_committed_snapshot TVFs (sorted_table.sql, snapshots.sql)") {
    val lake = newLake()
    lake.createTable("main.gm", abSchema)
    lake.setPartition("main.gm", List(Meta.PartitionKey("identity", "b")))
    lake.setSort("main.gm", List(Meta.SortKey("a", ascending = false, nullsFirst = true)))
    val r = lake.root.replace("'", "''")
    val p = spark.sql(s"SELECT * FROM graft_get_partition('$r', 'main.gm')").collect()
    assert(p.map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq ==
      Seq((0L, "b", "identity")))
    val so = spark.sql(s"SELECT * FROM graft_get_sort('$r', 'main.gm')").collect()
    assert(so.map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3))).toSeq ==
      Seq((0L, "a", "DESC", "NULLS_FIRST")))
    // snapshots.sql Test 2: exactly one row, and it is the current snapshot
    val lcs = spark.sql(s"SELECT snapshot_id FROM graft_last_committed_snapshot('$r')").collect()
    assert(lcs.length == 1 && lcs.head.getLong(0) == lake.currentSnapshot())
    // reset_* ends the live info (sorted_table.sql Test 4 DROP INDEX shape)
    lake.resetSort("main.gm")
    lake.resetPartition("main.gm")
    assert(lake.getSort("main.gm").count() == 0)
    assert(lake.getPartition("main.gm").count() == 0)
  }

  // ---- geometry (WKB) catalog annotation (docs/data_types.md) ------------
  test("geometry columns: WKB round-trip, distinct catalog type, no stats, no inline") {
    val lake = newLake()
    lake.setOption("data_inlining_row_limit", "100")
    val geomMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.type", "geometry").build()
    lake.createTable("main.geo", StructType(Seq(
      StructField("id", IntegerType),
      StructField("wkb", BinaryType, nullable = true, geomMeta))))
    // the catalog column carries the distinct annotation, not plain binary
    val st0 = lake.store.state()
    val geoCol = st0.columnsAt(
      st0.tableAt("main", "geo", st0.currentSnapshotId).get.tableId,
      st0.currentSnapshotId).find(_.name == "wkb").get
    assert(geoCol.dataType == "geometry")
    // WKB payload round-trips byte-exact (a tiny POINT(1 2) little-endian)
    val wkb = Array[Byte](1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, -16, 63,
      0, 0, 0, 0, 0, 0, 0, 64)
    import spark.implicits._
    lake.insertRows("main.geo", Seq(Seq(1, wkb), Seq(2, null)))
    // binary/geometry disables the inline fast path (bytes don't survive
    // the JSON log) — rows must land as parquet despite the inline limit
    assert(lake.store.state().inlined.isEmpty, "geometry rows must not inline")
    val back = lake.table("main.geo").orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]]("wkb").toSeq == wkb.toSeq)
    assert(back(1).isNullAt(1))
    // stats-safe: no min/max recorded for the WKB column
    assert(!lake.store.state().stats.exists(_.columnName == "wkb"))
    // freeze keeps the distinct type in the ducklake_column layout
    val out = Files.createTempDirectory("graft_geo").toString
    lake.freeze(out)
    val cat = Files.readString(java.nio.file.Paths.get(out, "ducklake_catalog.sql"))
    assert(cat.contains("'geometry'"), "frozen catalog must keep the geometry type")
    // and thaw restores it as geometry
    val b = new Lake(spark, Files.createTempDirectory("graft_geo2").toString)
    b.importCatalog(s"$out/catalog_parquet")
    val stB = b.store.state()
    assert(stB.columnsAt(stB.tableAt("main", "geo", stB.currentSnapshotId).get.tableId,
      stB.currentSnapshotId).find(_.name == "wkb").get.dataType == "geometry")
    assert(b.table("main.geo").count() == 2)
  }

  // ---- type palette round-trip (types.sql) --------------------------------
  test("full type palette round-trips through parquet path incl. DML") {
    val lake = newLake()
    import spark.implicits._
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, CAST(1.50 AS DECIMAL(10,2)), DATE'2024-01-02',
        |   TIMESTAMP'2024-01-02 03:04:05.123456', true, array(1, 2, 3),
        |   named_struct('x', 7, 's', 'a'), CAST('ab' AS BINARY), 1.5D,
        |   CAST(2.5 AS FLOAT), CAST(3 AS SMALLINT), CAST(4 AS TINYINT)),
        |  (2, CAST(-0.25 AS DECIMAL(10,2)), DATE'1999-12-31',
        |   TIMESTAMP'1999-12-31 23:59:59', false, array(9),
        |   named_struct('x', 8, 's', 'b'), CAST('cd' AS BINARY), -2.5D,
        |   CAST(-1.5 AS FLOAT), CAST(-3 AS SMALLINT), CAST(-4 AS TINYINT))
        |AS t(id, dec, d, ts, bool, arr, st, bin, dbl, flt, sh, bt)""".stripMargin)
    lake.createTableAs("main.types", df)
    val back = lake.table("main.types").orderBy("id")
    val want = StructType(df.schema.fields.map(f =>
      f.copy(dataType = graft.lake.LakeRead.relaxNullability(f.dataType), nullable = true)))
    val got = StructType(back.schema.fields.map(_.copy(nullable = true)))
    assert(got == want, s"schema drift: $got vs $want")
    val r = back.collect()
    assert(r.length == 2)
    assert(r(0).getDecimal(1).toPlainString == "1.50")
    assert(r(0).getDate(2).toString == "2024-01-02")
    assert(r(0).getTimestamp(3).toString == "2024-01-02 03:04:05.123456")
    assert(r(0).getSeq[Int](5) == Seq(1, 2, 3))
    assert(r(0).getStruct(6).getInt(0) == 7)
    assert(new String(r(0).getAs[Array[Byte]](7)) == "ab")
    // DML on a typed table (timestamp predicate + decimal update)
    lake.delete("main.types", col("d") < lit(java.sql.Date.valueOf("2000-01-01")))
    assert(lake.table("main.types").count() == 1)
    lake.update("main.types", col("id") === 1,
      Map("dec" -> lit(java.math.BigDecimal.valueOf(99.99))))
    assert(lake.table("main.types").collect()(0).getDecimal(1).toPlainString == "99.99")
    // stats-based pruning on date/decimal columns stays conservative-correct
    assert(lake.table("main.types")
      .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))).count() == 1)
  }

  test("inline log round-trips scalar types incl. date and timestamp") {
    val lake = newLake()
    lake.createTable("main.ti", StructType(Seq(
      StructField("id", IntegerType), StructField("d", DateType),
      StructField("ts", TimestampType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("x", DoubleType))))
    lake.setOption("data_inlining_row_limit", "10", Some("main.ti"))
    lake.insertRows("main.ti", Seq(
      Seq(1, java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), "a\"b\nc", true, 1.5),
      Seq(2, null, null, null, false, -0.25)))
    val r = lake.table("main.ti").orderBy("id").collect()
    assert(r(0).getDate(1).toString == "2024-01-02")
    assert(r(0).getTimestamp(2).toString == "2024-01-02 03:04:05.0")
    assert(r(0).getString(3) == "a\"b\nc", "JSON escaping round-trip")
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && r(1).isNullAt(3))
    assert(r(1).getDouble(5) == -0.25)
    // flush converts the inline rows to parquet losslessly
    lake.flushInlinedData("main.ti")
    val r2 = lake.table("main.ti").orderBy("id").collect()
    assert(r2.map(_.toString).toSeq == r.map(_.toString).toSeq)
  }

  // ---- inline rows × schema evolution -------------------------------------
  test("updating inlined rows after ADD COLUMN keeps JSON epochs separated") {
    val lake = newLake()
    val cat = s"lakeinlev${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    lake.createTable("main.ie", abSchema)
    lake.setOption("data_inlining_row_limit", "100", Some("main.ie"))
    lake.insertRows("main.ie", Seq(Seq(1, 10), Seq(2, 20)))
    spark.sql(s"ALTER TABLE $cat.main.ie ADD COLUMN c INT")
    val (_, n) = lake.update("main.ie", col("a") === 2, Map("c" -> lit(5)))
    assert(n == 1)
    val rows = lake.table("main.ie").orderBy("a").collect()
      .map(r => (r.getInt(0), r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(rows == Seq((1, 10, -1), (2, 20, 5)), s"got $rows")
    // the untouched row's batch kept its old epoch; the updated row moved
    // to a current-epoch batch
    val st = lake.store.state()
    val tid = st.tableAt("main", "ie", st.currentSnapshotId).get.tableId
    val epochs = st.inlinedAt(tid, st.currentSnapshotId).map(_.schemaVersion).distinct
    assert(epochs.length == 2, s"expected two distinct epochs, got $epochs")
  }

  // ---- incremental change-feed consumption --------------------------------
  test("change feed poller returns only new changes per poll") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.cp", abSchema)
    val poller = lake.changeFeedPoller("main.cp")
    lake.append("main.cp", Seq((1, 1), (2, 2)).toDF("a", "b"))
    assert(poller.poll().count() == 2)
    assert(poller.poll().count() == 0, "second poll with no commits must be empty")
    lake.delete("main.cp", col("a") === 1)
    val ch = poller.poll().select("_change_type", "a").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(ch == Set(("delete", 1)))
  }

  // ---- drop / rename ------------------------------------------------------
  test("drop and rename table") {
    val lake = newLake()
    import spark.implicits._
    val cat = s"lakedrop${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    lake.createTable("main.a", abSchema)
    lake.append("main.a", Seq((1, 1)).toDF("a", "b"))
    spark.sql(s"ALTER TABLE $cat.main.a RENAME TO main.z")
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.z").collect().head.getLong(0) == 1)
    assert(intercept[Exception](spark.sql(s"SELECT * FROM $cat.main.a").collect())
      .toString.nonEmpty)
    spark.sql(s"DROP TABLE $cat.main.z")
    assert(!spark.catalog.tableExists(s"$cat.main.z"))
    // files scheduled for deletion, then physically removed
    assert(lake.store.state().scheduledDeletions.nonEmpty)
    lake.cleanupOldFiles()
    assert(lake.store.state().scheduledDeletions.isEmpty)
  }

  // ---- timestamp-based time travel ----------------------------------------
  test("time travel by timestamp picks the latest snapshot at-or-before") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.ts", abSchema)
    lake.append("main.ts", Seq((1, 1)).toDF("a", "b"))
    val t1 = lake.store.state().snapshots.last.snapshotTimeMs
    Thread.sleep(5)
    lake.append("main.ts", Seq((2, 2)).toDF("a", "b"))
    assert(lake.tableAsOfTime("main.ts", t1).count() == 1)
    assert(lake.tableAsOfTime("main.ts", System.currentTimeMillis()).count() == 2)
    spark.conf.set("spark.graft.lake.asOfTimestampMs", t1.toString)
    try assert(lake.table("main.ts").count() == 1)
    finally spark.conf.unset("spark.graft.lake.asOfTimestampMs")
  }

  // ---- pushdown reaches the inner parquet scan ----------------------------
  test("lake scan pushes filters into the parquet scan") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.pf", abSchema)
    lake.append("main.pf", (1 to 100).map(i => (i, i)).toDF("a", "b"))
    val plan = lake.table("main.pf").filter(col("a") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("EqualTo(a,7)") || plan.contains("IsNotNull(a)")),
      s"no parquet pushdown in plan:\n${plan.take(1500)}")
  }

  // ---- SQL UPDATE lowers onto the native positional-delete update ---------
  test("SQL UPDATE works through the catalog and feeds the change feed") {
    val root = Files.createTempDirectory("graft_sqlup").toString
    val cat = s"upcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.main.u (a INT, b INT, s STRING)")
    spark.sql(s"INSERT INTO $cat.main.u VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')")
    val res = spark.sql(s"UPDATE $cat.main.u SET b = b + 100, s = concat(s, '!') WHERE a >= 2")
    assert(res.collect().map(_.getLong(0)).toSeq == Seq(2L), "UPDATE row count")
    assert(spark.sql(s"SELECT a, b, s FROM $cat.main.u ORDER BY a").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 10, "x"), (2, 120, "y!"), (3, 130, "z!")))
    // the SQL update produced proper pre/post images in the change feed
    val lake = new Lake(spark, root)
    val changes = lake.tableChanges("main.u", lake.currentSnapshot() - 1,
      lake.currentSnapshot())
      .select("_change_type", "a", "b").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    assert(changes.toSeq == Seq(
      ("update_postimage", 2, 120), ("update_postimage", 3, 130),
      ("update_preimage", 2, 20), ("update_preimage", 3, 30)))
  }

  // ---- delete-file consolidation -----------------------------------------
  test("consolidateDeleteFiles merges overlays without changing rows or CDF") {
    val root = Files.createTempDirectory("graft_dcons").toString
    val cat = s"dcons${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTableAs("main.t",
      spark.range(1000).select(col("id").as("a"), (col("id") % 7).as("b")))
    lake.delete("main.t", col("a") % 5 === 0)
    lake.delete("main.t", col("a") % 5 === 1)
    lake.update("main.t", col("a") === 2, Map("b" -> lit(99L)))
    def delCount() = lake.tableInfo().select("delete_file_count")
      .collect().head.getLong(0)
    assert(delCount() == 3L)
    val expected = spark.sql(s"SELECT a, b FROM $cat.main.t ORDER BY a").collect().toSeq

    lake.consolidateDeleteFiles("main.t")
    assert(delCount() == 1L, "three overlays must merge into one")
    assert(spark.sql(s"SELECT a, b FROM $cat.main.t ORDER BY a").collect().toSeq
      == expected, "consolidation must not change table contents")
    // CDF: the consolidation snapshot itself contributes no changes, and
    // the original DML snapshots still classify
    val changes = lake.tableChanges("main.t", 1L, lake.currentSnapshot())
      .groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(changes == Map("delete" -> 400L,
      "update_preimage" -> 1L, "update_postimage" -> 1L))
    // consolidating again is a no-op
    val before = lake.currentSnapshot()
    assert(lake.consolidateDeleteFiles("main.t") == before)
  }

  // ---- native-scan escape hatch ------------------------------------------
  test("spark.graft.lake.nativeScan=false falls back to the composed V1 plan") {
    val root = Files.createTempDirectory("graft_nsoff").toString
    val cat = s"nsoff${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.main.t (a INT, b INT)")
    spark.sql(s"INSERT INTO $cat.main.t VALUES (1, 10), (2, 20), (3, 30)")
    def q() = spark.sql(s"SELECT b FROM $cat.main.t WHERE a >= 2 ORDER BY b")
    assert(q().queryExecution.executedPlan.toString.contains("BatchScan"))
    spark.conf.set("spark.graft.lake.nativeScan", "false")
    try {
      val off = q()
      assert(!off.queryExecution.executedPlan.toString.contains("BatchScan"),
        "flag off must route through the V1 composed plan")
      assert(off.collect().map(_.getInt(0)).toSeq == Seq(20, 30))
    } finally spark.conf.unset("spark.graft.lake.nativeScan")
    assert(q().collect().map(_.getInt(0)).toSeq == Seq(20, 30))
  }

  // ---- streaming sink: exactly-once micro-batch ingest -------------------
  test("streaming sink ingests exactly-once across restarts and replays") {
    val root = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]

    def start() = mem.toDF().toDF("k", "v").writeStream
      .format("graft-lake")
      .option("root", root).option("table", "main.ing")
      .option("checkpointLocation", ckpt)
      .start()

    mem.addData((1, "a"), (2, "b"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    mem.addData((3, "c"))
    val q2 = start() // restart from checkpoint: batch 0 must not re-apply
    q2.processAllAvailable(); q2.stop()

    val lake = new Lake(spark, root)
    assert(lake.table("main.ing").orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))

    // direct replay of an already-committed batch id is a no-op
    val sink = new graft.streaming.LakeSink(root, "main.ing", ckpt, overwrite = false)
    sink.addBatch(0, Seq((9, "dup")).toDF("k", "v"))
    assert(lake.table("main.ing").count() == 3, "replayed batch must not append")
    // a NEW batch id from the same txn does append
    sink.addBatch(99, Seq((4, "d")).toDF("k", "v"))
    assert(lake.table("main.ing").count() == 4)
  }

  // ---- delete-aware native scan: executor-local position skipping -------
  test("native scan applies a big delete set without joins or broadcast") {
    val root = Files.createTempDirectory("graft_natdel").toString
    val cat = s"ndcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val lake = new Lake(spark, root)
    import spark.implicits._
    val n = 200000L
    lake.createTableAs("main.big",
      spark.range(n).select(col("id").as("a"), (col("id") % 97).as("b")))
    // delete a third of the rows — far above any broadcast threshold once
    // multiplied out at scale; the point is the PLAN shape, which must not
    // depend on the delete set's size at all
    lake.delete("main.big", col("a") % 3 === 0)

    val q = spark.sql(s"SELECT sum(a) AS s, count(*) AS c FROM $cat.main.big")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected native BatchScan, got:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"delete application must be scan-local, not a join:\n$plan")
    val r = q.collect().head
    val expS = (0L until n).filter(_ % 3 != 0).sum
    val expC = (0L until n).count(_ % 3 != 0).toLong
    assert((r.getLong(0), r.getLong(1)) == (expS, expC))

    // pushed predicates still correct across deleted/kept rows
    assert(spark.sql(s"SELECT b FROM $cat.main.big WHERE a = 12").collect().isEmpty)
    assert(spark.sql(s"SELECT b FROM $cat.main.big WHERE a = 13").collect()
      .map(_.getLong(0)).toSeq == Seq(13L % 97))

    // a second DELETE stacks another live delete file over the same files
    lake.delete("main.big", col("a") % 3 === 1)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.main.big").collect()
      .head.getLong(0) == (0L until n).count(_ % 3 == 2).toLong)

    // time travel to the pre-delete snapshot stays native and full
    val v0 = 1L // CTAS snapshot
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.big VERSION AS OF $v0")
      .collect().head.getLong(0) == n)
  }

  test("scan reads delete parts from metadata, never lists the directory") {
    // VERDICT r4 #5: part files are recorded in DeleteFileEntry at write
    // time. Proof the scan trusts metadata only: plant a STRAY delete part
    // (deleting extra rows) into the directory after the commit — a scan
    // that re-lists the dir would pick it up and lose rows; a metadata
    // scan must not.
    val root = Files.createTempDirectory("graft_delparts").toString
    val cat = s"dpcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTableAs("main.dp",
      spark.range(100).select(col("id").as("a"), (col("id") % 7).as("b")))
    lake.delete("main.dp", col("a") < 10)

    val entry = lake.store.state().deleteFiles.filter(_.end.isEmpty)
    assert(entry.nonEmpty && entry.forall(_.parts.nonEmpty),
      "delete part files must be recorded in metadata at write time")
    assert(entry.forall(_.parts.forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(p)))), "recorded parts must exist on disk")

    // stray part: positions 10..19 of the same data file — rows the real
    // delete did NOT touch
    val dataFile = lake.store.state().files.filter(_.end.isEmpty).head.fileName
    val delDir = entry.head.path
    val strayStage = Files.createTempDirectory("graft_stray").toString
    (10L until 20L).map(p => (dataFile, p, p)).toDF("file", "pos", "row_id")
      .coalesce(1).write.mode("overwrite").parquet(strayStage)
    val strayPart = java.nio.file.Files.list(java.nio.file.Paths.get(strayStage))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(strayPart,
      java.nio.file.Paths.get(delDir, "part-stray-poison.parquet"))

    // both tiers must still see 90 rows (10 really deleted) — rows 10..19
    // survive because the stray part is invisible to metadata
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.dp").collect()
      .head.getLong(0) == 90)
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.dp WHERE a BETWEEN 10 AND 19")
      .collect().head.getLong(0) == 10)
  }

  test("SQL MERGE updates, deletes, and inserts in one snapshot; change feed pairs images") {
    val root = Files.createTempDirectory("graft_sqlmerge").toString
    val cat = s"mrgcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.main.m (k INT, v INT, txt STRING)")
    spark.sql(s"INSERT INTO $cat.main.m VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c'), (4, 40, 'd')")
    import spark.implicits._
    Seq((2, 200, "upd"), (3, 0, "del"), (5, 500, "ins"))
      .toDF("k", "nv", "op").createOrReplaceTempView("msrc")
    val res = spark.sql(
      s"""MERGE INTO $cat.main.m t USING msrc s ON t.k = s.k
         |WHEN MATCHED AND s.op = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv, txt = concat(t.txt, '*')
         |WHEN NOT MATCHED THEN INSERT (k, v, txt) VALUES (s.k, s.nv, 'new')
         |""".stripMargin).collect().head
    assert((res.getLong(0), res.getLong(1), res.getLong(2)) == (1L, 1L, 1L),
      "updated/deleted/inserted counts")
    assert(spark.sql(s"SELECT k, v, txt FROM $cat.main.m ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 10, "a"), (2, 200, "b*"), (4, 40, "d"), (5, 500, "new")))

    // one snapshot, correctly classified change feed
    val lake = new Lake(spark, root)
    val changes = lake.tableChanges("main.m", lake.currentSnapshot() - 1,
      lake.currentSnapshot())
      .select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    assert(changes.toSeq == Seq(
      ("delete", 3, 30), ("insert", 5, 500),
      ("update_postimage", 2, 200), ("update_preimage", 2, 20)))

    // WHEN NOT MATCHED BY SOURCE sees unmatched target rows
    val res2 = spark.sql(
      s"""MERGE INTO $cat.main.m t USING (SELECT 2 AS k) s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND t.k > 4 THEN DELETE
         |""".stripMargin).collect().head
    assert(res2.getLong(1) == 1L, "nmbs delete count")
    assert(spark.sql(s"SELECT k FROM $cat.main.m ORDER BY k").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2, 4))

    // SQL-standard cardinality rule: two source rows hitting one target row
    Seq((2, 1, "x"), (2, 2, "y")).toDF("k", "nv", "op").createOrReplaceTempView("mdup")
    val err = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.main.m t USING mdup s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |""".stripMargin).collect()
    }
    assert(err.getMessage != null)
  }

  // ---- ddl.sql: column defaults — existence vs current ---------------------
  test("ADD COLUMN DEFAULT fills old files; SET DEFAULT only affects inserts") {
    val root = Files.createTempDirectory("graft_def").toString
    val cat = s"defcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.main.dc (a INT)")
    spark.sql(s"INSERT INTO $cat.main.dc VALUES (1), (2)")
    spark.sql(s"ALTER TABLE $cat.main.dc ADD COLUMN tag STRING DEFAULT 'legacy'")
    spark.sql(s"ALTER TABLE $cat.main.dc ALTER COLUMN tag SET DEFAULT 'fresh'")
    spark.sql(s"INSERT INTO $cat.main.dc (a) VALUES (3)")
    val rows = spark.sql(s"SELECT a, tag FROM $cat.main.dc ORDER BY a").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    // pre-ADD rows keep the frozen existence default; the new insert that
    // omitted the column takes the CURRENT default
    assert(rows == Seq((1, "legacy"), (2, "legacy"), (3, "fresh")))
  }

  // ---- change feed plans O(runs), not O(snapshots) ------------------------
  test("change feed batches insert-only runs into one scan branch") {
    val lake = newLake()
    lake.createTable("main.rf", abSchema)
    lake.setOption("data_inlining_row_limit", "1000", Some("main.rf"))
    (1 to 30).foreach(i => lake.insertRows("main.rf", Seq(Seq(i, i), Seq(i + 100, i))))
    val df = lake.tableChanges("main.rf", 0L, lake.currentSnapshot())
    import org.apache.spark.sql.catalyst.plans.logical.Union
    val arms = df.queryExecution.logical.collect { case u: Union => u.children.length }
    assert(arms.forall(_ <= 2), s"union arms: $arms — insert run not batched")
    val rows = df.select("_snapshot_id", "a").collect()
    assert(rows.length == 60)
    assert(rows.map(_.getLong(0)).distinct.length == 30,
      "per-row _snapshot_id must be the committing snapshot, not the run end")
  }

  // ---- timestamptz change-feed overloads ----------------------------------
  test("timestamp change-feed overloads resolve the wall-clock window") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tw", abSchema)
    lake.append("main.tw", Seq((1, 1), (2, 2)).toDF("a", "b"))
    lake.delete("main.tw", col("a") === 1)
    val all = lake.tableChangesBetweenTimes("main.tw", 0L, System.currentTimeMillis())
      .select("_change_type", "a").collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(all.toSeq == Seq(("delete", 1), ("insert", 1), ("insert", 2)))
    assert(lake.tableDeletionsBetweenTimes("main.tw", 0L,
      System.currentTimeMillis()).count() == 1)
    // a window before any snapshot sees nothing
    assert(lake.tableChangesBetweenTimes("main.tw", 0L, 1L).count() == 0)
  }

  // ---- compaction bin-packing: big files are never rewritten --------------
  test("merge bin-packs only files below target_file_size; big files untouched") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.bp", StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType))))
    lake.setOption("target_file_size", "16KB", Some("main.bp"))
    // one big file (incompressible payload, well over 16 KB)
    lake.append("main.bp", (1 to 2000).map(i => (i, i))
      .toDF("k", "i").select(col("k"), md5(concat(col("i"), lit("x"))).as("v"))
      .coalesce(1))
    // four small files
    (1 to 4).foreach(i => lake.append("main.bp",
      Seq((10000 + i, s"small-$i")).toDF("k", "v")))
    val before = lake.listFiles("main.bp").collect()
    assert(before.length == 5)
    val bigFile = before.maxBy(_.getLong(3)) // file_size
    lake.mergeAdjacentFiles("main.bp")
    val after = lake.listFiles("main.bp").collect()
    assert(after.length == 2, s"expected big+1, got ${after.length}")
    assert(after.map(_.getString(1)).contains(bigFile.getString(1)),
      "the big file must survive compaction untouched")
    assert(lake.table("main.bp").count() == 2004)
    // a second merge is a no-op (1 small file left, nothing to pack)
    val snap = lake.currentSnapshot()
    lake.mergeAdjacentFiles("main.bp")
    assert(lake.currentSnapshot() == snap)
  }

  // ---- scale guard: the delete-set join must not force a broadcast --------
  test("large delete sets are not force-broadcast in the merge-on-read scan") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.bd", abSchema)
    lake.append("main.bd", (1 to 2000).map(i => (i, i)).toDF("a", "b"))
    lake.delete("main.bd", col("a") % 2 === 0) // 1000-row delete set
    // under a tiny broadcast threshold the gate must leave the join
    // strategy to Catalyst (no user-forced ResolvedHint / broadcast of a
    // set the session says is too big) — and the scan stays correct
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the O(files) row-id lookup join is always hinted (bounded by the
      // file list); the DELETE-SET join must not add a second hint
      def hintCount(s: String) = "ResolvedHint".r.findAllIn(s).length
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val df = lake.table("main.bd")
      val gated = hintCount(df.queryExecution.analyzed.toString)
      assert(df.count() == 1000)
      // small sets under a normal threshold DO get the broadcast hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val hinted = hintCount(lake.table("main.bd").queryExecution.analyzed.toString)
      assert(hinted == gated + 1,
        s"expected exactly one extra hint for the small delete set (gated=$gated hinted=$hinted)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // ---- layout options: hive_file_pattern + per_thread_output --------------
  test("hive_file_pattern and per_thread_output shape the physical layout") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.hp", abSchema,
      partitionKeys = List(PartitionKey("identity", "a")))
    lake.setOption("hive_file_pattern", "true", Some("main.hp"))
    lake.setOption("per_thread_output", "false", Some("main.hp"))
    lake.append("main.hp", (1 to 100).map(i => (i % 2, i)).toDF("a", "b"))
    val files = lake.listFiles("main.hp").collect()
    assert(files.length == 2, "one file per partition under per_thread_output=false")
    val st = lake.store.state()
    val paths = st.files.map(_.path)
    assert(paths.forall(p => p.contains("/a=0/") || p.contains("/a=1/")),
      s"expected hive-style dirs, got: $paths")
    assert(lake.table("main.hp").count() == 100)
    assert(lake.table("main.hp").filter(col("a") === 1).count() == 50)
  }

  // ---- commit messages (require_commit_message, metadata_manager.cpp:735) -
  test("require_commit_message blocks writes until a message is supplied") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.cm", abSchema)
    lake.setOption("require_commit_message", "true")
    val e = intercept[IllegalStateException] {
      lake.append("main.cm", Seq((1, 1)).toDF("a", "b"))
    }
    assert(e.getMessage.contains("require_commit_message"))
    spark.conf.set("spark.graft.lake.commitMessage", "load batch 1")
    try lake.append("main.cm", Seq((1, 1)).toDF("a", "b"))
    finally spark.conf.unset("spark.graft.lake.commitMessage")
    assert(lake.table("main.cm").count() == 1)
    val msgs = lake.snapshots().select("commit_message").collect().map(_.getString(0))
    assert(msgs.contains("load batch 1"))
  }

  test("require_commit_message applies to transaction commits too") {
    // ADVICE r5: transaction() committed via store.commit directly,
    // bypassing stampCommitMessage — a tagged table could be written
    // message-less through the transaction back door.
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.tcm", abSchema)
    lake.setOption("require_commit_message", "true")
    val e = intercept[IllegalStateException] {
      lake.transaction(tx => tx.append("main.tcm", Seq((1, 1)).toDF("a", "b")))
    }
    assert(e.getMessage.contains("require_commit_message"))
    // the failed transaction rolled back: nothing visible
    assert(lake.table("main.tcm").count() == 0)
    spark.conf.set("spark.graft.lake.commitMessage", "tx batch")
    try lake.transaction(tx => tx.append("main.tcm", Seq((1, 1)).toDF("a", "b")))
    finally spark.conf.unset("spark.graft.lake.commitMessage")
    assert(lake.table("main.tcm").count() == 1)
    val msgs = lake.snapshots().select("commit_message").collect().map(_.getString(0))
    assert(msgs.contains("tx batch"), "transaction snapshot carries the stamped message")
  }

  // ---- snapshot expiry (expire_older_than) --------------------------------
  test("expired snapshots vanish from history and refuse time travel") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.ex", abSchema)          // snap 0
    lake.append("main.ex", Seq((1, 1)).toDF("a", "b")) // snap 1
    lake.append("main.ex", Seq((2, 2)).toDF("a", "b")) // snap 2
    Thread.sleep(10)
    lake.expireSnapshots(Some(0L))                 // snap 3, expires 0 and 1
    val ids = lake.snapshots().select("snapshot_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L, 3L), s"got $ids")
    intercept[IllegalArgumentException] { lake.table("main.ex", Some(1)).count() }
    assert(lake.table("main.ex").count() == 2, "current data intact")
    // no-op without a window and nothing new to expire
    assert(lake.expireSnapshots(None) == 3L)
  }

  // ---- freeze emits DuckDB-executable SQL artifacts -----------------------
  test("freeze emits merge-on-read views and the ducklake_* catalog as SQL") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.fz", abSchema)
    lake.append("main.fz", Seq((1, 1), (2, 2), (3, 3)).toDF("a", "b"))
    lake.delete("main.fz", col("a") === 2)
    val out = Files.createTempDirectory("graft_fzsql").toString
    lake.freeze(out)
    val views = Files.readString(java.nio.file.Paths.get(out, "views.sql"))
    assert(views.contains("CREATE OR REPLACE VIEW \"main_fz\""))
    assert(views.contains("read_parquet"), "views must read the frozen parquet")
    assert(views.contains("NOT EXISTS"), "positional deletes must be anti-joined")
    val cat = Files.readString(java.nio.file.Paths.get(out, "ducklake_catalog.sql"))
    // the full reference layout (pgducklake_freeze.cpp:32-60) is present
    Seq("ducklake_snapshot", "ducklake_table", "ducklake_column",
      "ducklake_data_file", "ducklake_delete_file", "ducklake_macro",
      "ducklake_file_variant_stats").foreach(t =>
      assert(cat.contains(s"CREATE OR REPLACE TABLE $t "), s"missing $t"))
    assert(cat.contains("INSERT INTO ducklake_data_file"))
  }

  // ---- metadata checkpoint (cold-open accelerator) ------------------------
  test("checkpoint: cold opens read checkpoint + tail; log stays authoritative") {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.ck", abSchema)
    lake.append("main.ck", (1 to 10).map(i => (i, i)).toDF("a", "b"))
    lake.delete("main.ck", col("a") <= 3)
    val ckSid = lake.checkpoint()
    assert(ckSid == lake.currentSnapshot())
    // commits AFTER the checkpoint form the tail
    lake.append("main.ck", Seq((11, 11)).toDF("a", "b"))

    // a COLD store instance (fresh caches) must see checkpoint + tail
    val cold = new Lake(spark, lake.root)
    assert(cold.table("main.ck").collect().map(_.getInt(0)).sorted.toSeq ==
      ((4 to 10) :+ 11))
    assert(cold.snapshots().count() == lake.snapshots().count())
    // time travel crosses the checkpoint boundary (deltas still read)
    assert(cold.table("main.ck", Some(1)).count() == 10)
    assert(cold.tableChanges("main.ck", 0, cold.currentSnapshot())
      .filter(col("_change_type") === "insert").count() == 11)

    // a torn checkpoint never poisons a cold open — the log is authoritative
    val stray = java.nio.file.Files.list(
      java.nio.file.Paths.get(lake.root, "_ducklake")).iterator().asScala
      .find(_.getFileName.toString.startsWith("ckpt")).get
    java.nio.file.Files.write(stray, "{ truncated".getBytes)
    val cold2 = new Lake(spark, lake.root)
    assert(cold2.table("main.ck").count() == 8)
  }

  test("checkpoint_interval option auto-checkpoints every Nth commit") {
    val lake = newLake()
    lake.createTable("main.ak", abSchema)
    lake.setOption("data_inlining_row_limit", "1000")
    lake.setOption("checkpoint_interval", "5")
    def ckpts(): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(lake.root, "_ducklake"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ckpt")).toSeq
      finally s.close()
    }
    assert(ckpts().isEmpty)
    // snapshots so far: 0 create, 1 limit, 2 interval; inserts land 3,4,5 →
    // snapshot 5 triggers the auto-checkpoint
    (1 to 3).foreach(i => lake.insertRows("main.ak", Seq(Seq(i, i))))
    assert(ckpts() == Seq("ckpt0000000005.json"))
    // a transaction never auto-checkpoints staged state
    lake.transaction { tx =>
      (1 to 7).foreach(i => tx.insertRows("main.ak", Seq(Seq(100 + i, i))))
    }
    assert(ckpts() == Seq("ckpt0000000005.json"),
      "staged commits must not write checkpoints")
    // a cold open after the auto-checkpoint sees everything
    val cold = new Lake(spark, lake.root)
    assert(cold.table("main.ak").count() == 10)
  }

  // ---- metadata store crash-atomicity -------------------------------------
  test("commit is crash-atomic: truncated temp never poisons the log") {
    val lake = newLake()
    lake.createTable("main.m", abSchema)
    lake.setOption("data_inlining_row_limit", "1000")
    // a stray temp file in the log dir is ignored by state()
    val tmp = java.nio.file.Paths.get(lake.root, "_ducklake", ".commit_stray.tmp")
    Files.write(tmp, "{corrupt".getBytes)
    assert(lake.currentSnapshot() >= 0)
    lake.insertRows("main.m", Seq(Seq(1, 1)))
    assert(lake.table("main.m").count() == 1)
  }
}
