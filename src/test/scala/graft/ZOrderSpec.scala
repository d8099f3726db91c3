package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.functions.ZValue

/** Z-order clustering rewrite: after `rewriteZOrder(x, y)`, per-file
  * min/max zone maps are tight on BOTH columns, so a point filter on
  * EITHER prunes files — where a linear sort serves only its leading key.
  * Content identity and the compacted-snapshot machinery are shared with
  * rewriteSorted (LakeSpec); this spec proves the multi-dimensional
  * pruning claim itself. */
class ZOrderSpec extends AnyFunSuite {
  import TestSession.spark

  private def gridLake(): (Lake, String) = {
    val lake = new Lake(spark, Files.createTempDirectory("graft_zorder").toString)
    // 100x100 grid: x and y are independent, so a linear x-sort leaves
    // every file covering the full y range
    val df = spark.range(0, 10000).select(
      (col("id") % 100).cast("int").as("x"),
      (col("id") / 100).cast("int").as("y"),
      col("id").as("payload"))
    lake.createTableAs("main.z", df)
    lake.setOption("target_file_size", "6KB", Some("main.z"))
    (lake, "main.z")
  }

  private def prunedCount(lake: Lake, table: String, filter: EqualTo): (Int, Int) = {
    val st = lake.store.state()
    val e = st.tableAt("main", table.split('.').last, st.currentSnapshotId).get
    val files = st.filesAt(e.tableId, st.currentSnapshotId)
    val colTypes = st.columnsAt(e.tableId, st.currentSnapshotId)
      .map(c => c.name -> c.dataType).toMap
    val kept = Pruning.prune(files, st.statsFor, colTypes,
      st.partitionKeysAt(e.tableId, st.currentSnapshotId), Seq(filter))
    (kept.size, files.size)
  }

  test("z-order rewrite prunes on every participating dimension") {
    val (lake, t) = gridLake()
    val before = lake.table(t).collect().map(_.toSeq).toSet
    lake.rewriteZOrder(t, Seq("x", "y"))
    assert(lake.table(t).collect().map(_.toSeq).toSet == before)

    val (keptX, totalX) = prunedCount(lake, t, EqualTo("x", 50))
    val (keptY, totalY) = prunedCount(lake, t, EqualTo("y", 50))
    assert(totalX > 3, s"need several files to demonstrate pruning, got $totalX")
    assert(keptX < totalX, s"x filter kept all $totalX files")
    assert(keptY < totalY, s"y filter kept all $totalY files")
  }

  test("linear sort only serves its leading key — the contrast case") {
    val (lake, t) = gridLake()
    lake.setSort(t, List(Meta.SortKey("x", ascending = true, nullsFirst = false)))
    lake.rewriteSorted(t)
    val (keptX, total) = prunedCount(lake, t, EqualTo("x", 50))
    val (keptY, _) = prunedCount(lake, t, EqualTo("y", 50))
    assert(keptX < total, "x filter should prune the x-sorted layout")
    assert(keptY == total,
      "independent y must not prune an x-sorted layout (else the grid is wrong)")
  }

  test("z-order absorbs delete overlays like the sorted rewrite") {
    val (lake, t) = gridLake()
    lake.delete(t, col("x") < 10)
    lake.rewriteZOrder(t, Seq("x", "y"))
    val st = lake.store.state()
    val e = st.tableAt("main", "z", st.currentSnapshotId).get
    assert(st.deleteFilesAt(e.tableId, st.currentSnapshotId).isEmpty,
      "rewrite must absorb the delete overlay")
    assert(lake.table(t).count() == 9000)
    assert(lake.table(t).filter(col("x") < 10).count() == 0)
  }

  test("zvalue runs inside whole-stage codegen (fallback disabled) and matches eval") {
    import org.apache.spark.sql.graft.NativeParquet.{columnOf, expressionOf}
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cuts = Array(Array(25.0, 50.0, 75.0), Array(2.0, 5.0, 8.0))
      val df = spark.range(0, 100).select(
        col("id").cast("double").as("a"),
        (col("id") % 10).cast("double").as("b"))
      val z = columnOf(ZValue(
        Seq(expressionOf(col("a")), expressionOf(col("b"))), cuts))
      val got = df.select(z.as("z")).agg(sum("z")).head.getLong(0)
      val want = (0 until 100).map { i =>
        ZValue.interleave(Array(
          ZValue.bucketOf(cuts(0), i.toDouble),
          ZValue.bucketOf(cuts(1), (i % 10).toDouble)), 2)
      }.sum
      assert(got == want, s"codegen result $got != interpreted $want")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("zvalue math: bucket + interleave") {
    assert(ZValue.bucketOf(Array(10.0, 20.0), 5.0) == 0)
    assert(ZValue.bucketOf(Array(10.0, 20.0), 10.0) == 1)
    assert(ZValue.bucketOf(Array(10.0, 20.0), 15.0) == 1)
    assert(ZValue.bucketOf(Array(10.0, 20.0), 25.0) == 2)
    // 2 dims, 2 bits: (b01, b10) -> z = 0b0110
    assert(ZValue.interleave(Array(1, 2), 2) == 6L)
    // MSB of dim 0 leads
    assert(ZValue.interleave(Array(2, 0), 2) == 8L)
  }
}
