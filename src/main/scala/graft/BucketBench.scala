package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake._
import graft.lake.Meta.PartitionKey

/** Bucket-SPJ value measured (BASELINE.md round-7): the same fact-fact
  * join on l_orderkey over sf lineitem, (a) plain lake tables — both
  * sides shuffle — vs (b) co-bucketed `bucket[32]` tables — zero
  * exchanges (storage-partitioned join). Also prints the executed-plan
  * exchange count as ground truth.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BucketBench */
object BucketBench {
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
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")

    def mkLake(tag: String, keys: List[PartitionKey]): (Lake, String) = {
      val root = java.nio.file.Files.createTempDirectory(s"bspj_$tag").toString
      val lake = new Lake(spark, root)
      lake.createTable("main.a", li.schema, partitionKeys = keys)
      lake.append("main.a", li)
      lake.createTable("main.b", li.schema, partitionKeys = keys)
      lake.append("main.b", li.filter(col("l_partkey") % 2 === 0))
      val cat = s"c$tag"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (lake, cat)
    }

    val (_, plainCat) = mkLake("plain", Nil)
    val (_, bktCat) = mkLake("bkt", List(PartitionKey(BucketTransform(32), "l_orderkey")))

    def joinQ(cat: String) = spark.sql(
      s"""SELECT count(*) AS n, sum(a.l_quantity * b.l_quantity) AS s
         |FROM $cat.main.a a JOIN $cat.main.b b ON a.l_orderkey = b.l_orderkey
         |""".stripMargin)

    def time(label: String, cat: String): Double = {
      val plan = joinQ(cat).queryExecution.executedPlan.toString
      val nExchange = "Exchange hashpartitioning".r.findAllIn(plan).length
      def once(): Double = {
        val t0 = System.nanoTime(); joinQ(cat).collect(); (System.nanoTime() - t0) / 1e9
      }
      once()
      val med = Seq.fill(3)(once()).sorted.apply(1)
      println(f"[bucket-bench] $label%-8s median_sec=$med%.2f exchanges=$nExchange")
      med
    }

    // both variants must agree before times mean anything
    val a = joinQ(plainCat).collect()(0)
    val c = joinQ(bktCat).collect()(0)
    require(a == c, s"result mismatch: $a vs $c")

    time("plain", plainCat)
    time("bucketed", bktCat)

    // r16 (VERDICT r15 #2): IN-PLACE migration of an EXISTING raw lake —
    // setPartition is future-files-only by design (partition.sql:43-57),
    // so the operator recipe is setPartition(bucket[32]) + setSort +
    // rewriteSorted: ONE range shuffle per table absorbs every pre-spec
    // file into the new layout, and the SAME tables' join then plans the
    // storage-partitioned shape. migrate_sec is the one-off cost that buys
    // the plain→bucketed delta on every subsequent join.
    val (mLake, mCat) = mkLake("mig", Nil)
    val t0 = System.nanoTime()
    Seq("main.a", "main.b").foreach { t =>
      mLake.setPartition(t, List(PartitionKey(BucketTransform(32), "l_orderkey")))
      mLake.setSort(t,
        List(Meta.SortKey("l_orderkey", ascending = true, nullsFirst = true)))
      mLake.rewriteSorted(t)
    }
    val migSec = (System.nanoTime() - t0) / 1e9
    println(f"[bucket-bench] migrate_sec=$migSec%.2f " +
      "(setPartition+setSort+rewriteSorted over both sides)")
    val m = joinQ(mCat).collect()(0)
    require(a == m, s"migrated result mismatch: $a vs $m")
    time("migrated", mCat)
    spark.stop()
  }
}
