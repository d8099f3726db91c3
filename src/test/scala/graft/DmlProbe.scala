package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.lake.Lake

/** Forked-JVM half of [[CrossProcessSpec]]'s live-share DML test: a SECOND
  * OS process running its OWN SparkSession + [[Lake]] against the same
  * shared catalog, interleaving real INSERTs (the reference's posture of N
  * independent PG backends doing DML into one DuckLake catalog,
  * docs/ducklake_feature_coverage.md "multiple clients"). Unlike
  * [[CommitProbe]] (raw metadata CAS), every commit here goes through the
  * full engine write path — ACL check, NOT NULL guard, inline-log fast
  * path, snapshot stamping via `spark.graft.lake.commitMessage`.
  *
  * Protocol matches CommitProbe: `<go>.ready` when the session is up, spin
  * on `<go>`, then n paced inserts tagged `child-i`; prints PROBE_OK.
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val go = Paths.get(args(2))

    val b = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lake = new Lake(spark, root)

    Files.write(Paths.get(args(2) + ".ready"), Array.emptyByteArray)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!Files.exists(go)) {
      if (System.nanoTime() > deadline) { System.err.println("no go signal"); sys.exit(2) }
      Thread.sleep(5)
    }

    // symmetric pacing on parent DML progress (CommitProbe's lesson: a
    // burst from either side makes the interleaving assertion flake)
    def parentOps(): Int = lake.store.state().snapshots
      .count(_.commitMessage.exists(_.startsWith("parent-")))
    (0 until n).foreach { i =>
      val waitDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (parentOps() < i - 1) {
        if (System.nanoTime() > waitDeadline) {
          System.err.println(s"parent stalled before child insert $i"); sys.exit(3)
        }
        Thread.sleep(2)
      }
      spark.conf.set("spark.graft.lake.commitMessage", s"child-$i")
      lake.insertRows("main.t", Seq(Seq(Int.box(1000 + i), Int.box(i))))
    }
    println("PROBE_OK")
    spark.stop()
  }
}
