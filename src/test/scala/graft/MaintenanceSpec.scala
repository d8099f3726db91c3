package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** `maintain()` — upstream DuckLake's all-in-one CHECKPOINT (flush inlined,
  * bin-pack, delete-threshold rewrite, expire, reap scheduled + orphaned
  * files, metadata checkpoint) — and `migrate()` — upstream's
  * COPY FROM DATABASE. Both unimplemented in the reference
  * (docs/ducklake_feature_coverage.md:88,97). */
class MaintenanceSpec extends AnyFunSuite {
  import TestSession.spark

  private def freshLake(): Lake =
    new Lake(spark, Files.createTempDirectory("graft_maint").toString)

  test("maintain flushes inline rows, merges files, reaps, and checkpoints") {
    val lake = freshLake()
    lake.createTableAs("main.m", spark.range(0, 200).selectExpr("id AS k"))
    lake.append("main.m", spark.range(200, 400).selectExpr("id AS k"))
    lake.setOption("data_inlining_row_limit", "100", Some("main.m"))
    lake.append("main.m", spark.range(400, 410).selectExpr("id AS k")) // inlined
    lake.delete("main.m", col("k") < 50)
    // stray orphan beside the data files
    val st0 = lake.store.state()
    val dataDir = Paths.get(st0.files.head.path).getParent
    Files.write(dataDir.resolve("part-stray.parquet"), Array[Byte](9))

    val summary = lake.maintain(
      expireOlderThanMs = Some(Long.MaxValue),
      deleteOlderThanMs = Some(0L), orphanOlderThanMs = Some(0L))

    assert(summary("tables_maintained") == 1L)
    assert(summary("orphans_deleted") == 1L)
    assert(summary("scheduled_deletions_cleaned") >= 1L) // merged-away files
    assert(summary("checkpoint_snapshot") >= 0L)
    val st = lake.store.state()
    val tid = st.tableAt("main", "m", st.currentSnapshotId).get.tableId
    assert(st.inlinedAt(tid, st.currentSnapshotId).isEmpty, "inline not flushed")
    assert(st.filesAt(tid, st.currentSnapshotId).size == 1, "files not merged")
    assert(lake.table("main.m").count() == 360)
    // the checkpoint file exists: a cold open reads it + empty tail
    val cold = new Lake(spark, lake.root)
    assert(cold.table("main.m").count() == 360)
  }

  test("maintain refreshes stale MVs; a second idle pass commits nothing to them") {
    // r12: the all-in-one maintenance keeps MVs fresh — a cron maintain()
    // leaving a stale MV is a silent correctness hazard for its readers
    val lake = freshLake()
    import spark.implicits._
    lake.createTableAs("main.src", Seq(("a", 1L), ("b", 2L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    lake.append("main.src", Seq(("a", 10L)).toDF("g", "x"))
    val s1 = lake.maintain(deleteOlderThanMs = Some(Long.MaxValue))
    assert(s1("mvs_refreshed") == 1L)
    val got = lake.table("main.mv").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (2L, 11L), "b" -> (1L, 2L)))
    // idle source: the next pass's refresh early-outs (no MV commit); the
    // summary still counts the MV as visited-and-fresh
    val before = lake.store.state().filesAt(
      lake.store.state().tableAt("main", "mv",
        lake.store.state().currentSnapshotId).get.tableId,
      lake.store.state().currentSnapshotId).map(_.fileId).toSet
    val s2 = lake.maintain(deleteOlderThanMs = Some(Long.MaxValue))
    assert(s2("mvs_refreshed") == 1L)
    val after = lake.store.state().filesAt(
      lake.store.state().tableAt("main", "mv",
        lake.store.state().currentSnapshotId).get.tableId,
      lake.store.state().currentSnapshotId).map(_.fileId).toSet
    assert(after == before, "idle maintain rewrote the MV")
  }

  test("migrate imports every parquet table under a directory, schema inferred") {
    val lake = freshLake()
    val migrated = lake.migrate("/root/testdata/sf0.001", "db",
      only = Seq("nation", "region"))
    assert(migrated == Vector("nation", "region"))
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    assert(lake.table("db.nation").count() == nation.count())
    assert(lake.table("db.nation").schema.fieldNames.sameElements(
      nation.schema.fieldNames))
    // migrated tables are REAL lake tables: DML + time travel work
    lake.delete("db.region", col("r_regionkey") === 0)
    assert(lake.table("db.region").count() ==
      spark.read.parquet("/root/testdata/sf0.001/region.parquet").count() - 1)
  }

  test("migrate with no matching tables fails loudly") {
    val lake = freshLake()
    intercept[IllegalArgumentException] {
      lake.migrate("/root/testdata/sf0.001", "db", only = Seq("nope"))
    }
  }
}
