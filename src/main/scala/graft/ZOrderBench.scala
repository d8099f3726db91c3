package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, EqualTo, GreaterThanOrEqual, LessThanOrEqual}
import graft.lake._

/** Z-order value proposition measured (BASELINE.md round-7): the same
  * two-column point/range query over sf lineitem after (a) rewriteSorted
  * by l_partkey alone and (b) rewriteZOrder(l_partkey, l_suppkey) —
  * reporting rewrite cost, per-dimension file-prune ratios from the
  * metadata zone maps, and the measured scan time of a both-dims filter.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ZOrderBench */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val (pkLo, pkHi, skLo, skHi) = {
      val r = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a ~1% slice of each dimension's range
    def slice(lo: Long, hi: Long): (Long, Long) = {
      val mid = lo + (hi - lo) / 2; val w = math.max(1L, (hi - lo) / 200)
      (mid - w, mid + w)
    }
    val (p0, p1) = slice(pkLo, pkHi)
    val (s0, s1) = slice(skLo, skHi)

    def buildLake(tag: String)(cluster: Lake => Unit): (Lake, Double) = {
      val root = java.nio.file.Files.createTempDirectory(s"zob_$tag").toString
      val lake = new Lake(spark, root)
      lake.createTableAs("main.li", li)
      lake.setOption("target_file_size", "256KB", Some("main.li"))
      val t0 = System.nanoTime()
      cluster(lake)
      (lake, (System.nanoTime() - t0) / 1e9)
    }

    def pruneStats(lake: Lake): (Int, Int, Int, Int) = {
      val st = lake.store.state()
      val e = st.tableAt("main", "li", st.currentSnapshotId).get
      val files = st.filesAt(e.tableId, st.currentSnapshotId)
      val ct = st.columnsAt(e.tableId, st.currentSnapshotId)
        .map(c => c.name -> c.dataType).toMap
      val pks = st.partitionKeysAt(e.tableId, st.currentSnapshotId)
      def kept(f: org.apache.spark.sql.sources.Filter) =
        Pruning.prune(files, st.statsFor, ct, pks, Seq(f)).size
      (files.size,
        kept(And(GreaterThanOrEqual("l_partkey", p0), LessThanOrEqual("l_partkey", p1))),
        kept(And(GreaterThanOrEqual("l_suppkey", s0), LessThanOrEqual("l_suppkey", s1))),
        kept(And(
          And(GreaterThanOrEqual("l_partkey", p0), LessThanOrEqual("l_partkey", p1)),
          And(GreaterThanOrEqual("l_suppkey", s0), LessThanOrEqual("l_suppkey", s1)))))
    }

    def scanTime(lake: Lake): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        lake.table("main.li")
          .filter(col("l_partkey").between(p0, p1) &&
            col("l_suppkey").between(s0, s1))
          .agg(sum("l_quantity")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); Seq.fill(5)(once()).sorted.apply(2)
    }

    val (linear, tLin) = buildLake("lin") { lk =>
      lk.setSort("main.li", List(Meta.SortKey("l_partkey", ascending = true, nullsFirst = false)))
      lk.rewriteSorted("main.li")
    }
    val (zord, tZ) = buildLake("z") { lk =>
      lk.rewriteZOrder("main.li", Seq("l_partkey", "l_suppkey"))
    }

    val (nL, pL, sL, bL) = pruneStats(linear)
    val (nZ, pZ, sZ, bZ) = pruneStats(zord)
    println(f"[zorder-bench] rewrite_sec linear=$tLin%.2f zorder=$tZ%.2f")
    println(s"[zorder-bench] linear: files=$nL partkey-slice keeps $pL, " +
      s"suppkey-slice keeps $sL, both keep $bL")
    println(s"[zorder-bench] zorder: files=$nZ partkey-slice keeps $pZ, " +
      s"suppkey-slice keeps $sZ, both keep $bZ")
    println(f"[zorder-bench] both-dims scan_sec linear=${scanTime(linear)}%.3f " +
      f"zorder=${scanTime(zord)}%.3f")
    spark.stop()
  }
}
