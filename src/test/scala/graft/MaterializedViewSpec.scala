package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** Incremental materialized views (LakeMaterializedView): refresh applies
  * ONLY the change feed since the watermark, exactly once, through every
  * DML shape — and the watermark commit is CAS-guarded against concurrent
  * refreshers. */
class MaterializedViewSpec extends AnyFunSuite {
  import TestSession.spark

  private def mkLake() = new Lake(spark, Files.createTempDirectory("graft_mv").toString)

  private def mvState(lake: Lake): Map[String, (Long, Long)] =
    lake.table("main.mv").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def oracle(lake: Lake): Map[String, (Long, Long)] =
    lake.table("main.src").groupBy(col("g"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("x")), lit(0L)).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("refresh folds appends, deletes, and group-moving updates, cycle by cycle") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src",
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    assert(mvState(lake) == Map("a" -> (2L, 3L), "b" -> (1L, 10L)))

    // cycle 1: append into an existing and a new group
    lake.append("main.src", Seq(("b", 5L), ("c", 7L)).toDF("g", "x"))
    lake.refreshMaterializedView("main.mv")
    assert(mvState(lake) == oracle(lake))

    // cycle 2: delete a whole group — its MV row must VANISH, not zero out
    lake.delete("main.src", col("g") === "a")
    lake.refreshMaterializedView("main.mv")
    assert(mvState(lake) == oracle(lake))
    assert(!mvState(lake).contains("a"))

    // cycle 3: update moves rows across groups (pre/post images transfer
    // both the count and the sum) and changes a value in place
    lake.update("main.src", col("g") === "b" && col("x") === 10L,
      Map("g" -> lit("c")))
    lake.update("main.src", col("x") === 5L, Map("x" -> lit(6L)))
    lake.refreshMaterializedView("main.mv")
    assert(mvState(lake) == oracle(lake))

    // refresh with no source changes: values unchanged
    val before = mvState(lake)
    lake.refreshMaterializedView("main.mv")
    assert(mvState(lake) == before)
  }

  test("a stale refresher loses the watermark CAS instead of double-applying") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src", Seq(("a", 1L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    lake.append("main.src", Seq(("a", 2L)).toDF("g", "x"))
    // refresher A computes its delta, then B refreshes first: A's commit
    // must abort on the in-commit watermark re-check. Simulate by
    // refreshing through a SECOND Lake handle (B) before A commits — here
    // sequentially: B refreshes, then A (same watermark) must see cur ==
    // its recomputed state and not double-apply. The CAS path itself is
    // exercised by calling refresh concurrently from two threads.
    val t1 = new Thread(() => try { lake.refreshMaterializedView("main.mv") } catch { case _: Exception => () })
    val t2 = new Thread(() => try { new Lake(spark, lake.root).refreshMaterializedView("main.mv") } catch { case _: Exception => () })
    t1.start(); t2.start(); t1.join(); t2.join()
    // whichever won, the MV must equal the oracle exactly once
    lake.refreshMaterializedView("main.mv") // settle any loser's abort
    assert(mvState(lake) == Map("a" -> (2L, 3L)))
  }

  test("MIN/MAX: inserts fold monotonically, deletes recompute only dirty groups") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src",
      Seq(("a", 1L), ("a", 9L), ("b", 5L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv2", "main.src", Seq("g"), Nil, Seq("x"))
    def mm(): Map[String, (Long, Long, Long)] =
      lake.table("main.mv2").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(mm() == Map("a" -> (2L, 1L, 9L), "b" -> (1L, 5L, 5L)))

    // insert-only: new max folds without touching the source (monotone)
    lake.append("main.src", Seq(("a", 20L), ("b", 2L)).toDF("g", "x"))
    lake.refreshMaterializedView("main.mv2")
    assert(mm() == Map("a" -> (3L, 1L, 20L), "b" -> (2L, 2L, 5L)))

    // delete the current max of a — the dirty recompute must retire it;
    // b is untouched (clean fold path)
    lake.delete("main.src", col("g") === "a" && col("x") === 20L)
    lake.refreshMaterializedView("main.mv2")
    assert(mm() == Map("a" -> (2L, 1L, 9L), "b" -> (2L, 2L, 5L)))

    // update moves a row out of b into a: b goes dirty (preimage), a's new
    // value folds as an insert
    lake.update("main.src", col("g") === "b" && col("x") === 5L,
      Map("g" -> lit("a")))
    lake.refreshMaterializedView("main.mv2")
    assert(mm() == Map("a" -> (3L, 1L, 9L), "b" -> (1L, 2L, 2L)))
  }

  test("MV definition survives freeze -> thaw and keeps refreshing") {
    // the mv_* definition tags ride the generic interval-versioned tag
    // machinery (ducklake_tag), so the freeze/import path must carry them
    // and a thawed engine must keep maintaining the MV incrementally
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src", Seq(("a", 1L), ("b", 2L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    val frozen = Files.createTempDirectory("graft_mvfreeze").toString
    lake.freeze(frozen)
    val thawed = new Lake(spark, Files.createTempDirectory("graft_mvthaw").toString)
    thawed.importCatalog(s"$frozen/catalog_parquet")
    thawed.append("main.src", Seq(("a", 10L)).toDF("g", "x"))
    thawed.refreshMaterializedView("main.mv")
    val got = thawed.table("main.mv").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (2L, 11L), "b" -> (1L, 2L)))
  }

  test("NULL group keys fold and recompute correctly (null-safe joins)") {
    // regression (r11 review): a using-join's EqualTo never matches NULL
    // with NULL, which split a NULL group into stale+delta rows on every
    // refresh; the merge joins are null-safe (<=>) now
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src",
      Seq((Some("a"), 1L), (None, 5L), (None, 7L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"),
      Seq("x"))
    def state(): Map[Option[String], (Long, Long, Long, Long)] =
      lake.table("main.mv").collect().map(r =>
        Option(r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(state() == Map(Some("a") -> (1L, 1L, 1L, 1L),
      None -> (2L, 12L, 5L, 7L)))
    // fold path: NULL-group insert must merge into the ONE existing row
    lake.append("main.src", Seq((Option.empty[String], 9L)).toDF("g", "x"))
    lake.refreshMaterializedView("main.mv")
    assert(state() == Map(Some("a") -> (1L, 1L, 1L, 1L),
      None -> (3L, 21L, 5L, 9L)))
    // dirty path: delete the NULL group's max — recompute must target it
    lake.delete("main.src", col("x") === 9L)
    lake.refreshMaterializedView("main.mv")
    assert(state() == Map(Some("a") -> (1L, 1L, 1L, 1L),
      None -> (2L, 12L, 5L, 7L)))
  }

  test("non-integral SUM columns are rejected at create") {
    val lake = mkLake()
    import spark.implicits._
    lake.createTableAs("main.src", Seq(("a", 1.5)).toDF("g", "x"))
    val e = intercept[IllegalArgumentException] {
      lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    }
    assert(e.getMessage.contains("integral"))
  }
}
