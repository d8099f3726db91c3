package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.lake.Meta.{CommitDelta, Snapshot}

/** TRUE multi-process optimistic concurrency on the shared file log: this
  * JVM and a forked second JVM ([[CommitProbe]]) race commits into one
  * `_ducklake` log. Single-JVM threaded specs (LakeSpec's commit storms)
  * can't prove cross-process safety — the CAS there could be satisfied by
  * any in-process lock. Here exclusion must come from the filesystem's
  * O_CREAT|O_EXCL link, the same primitive N executors-as-writers or N
  * engines on one NFS/object mount would rely on; the reference's analogue
  * is N PG backends racing one catalog (pgducklake_metadata_manager.cpp:
  * 294-364). Asserts zero lost commits, a contiguous snapshot-id sequence,
  * and both writers' messages all present exactly once. */
class CrossProcessSpec extends AnyFunSuite {

  test("two OS processes race commits into one file log — none lost, ids contiguous") {
    val root = Files.createTempDirectory("graft_xproc").toString
    val n = 20
    val go = s"$root/go_signal"

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    // the probe needs graft classes + scala-library/json4s/hadoop (all
    // shipped in /opt/spark/jars, same classpath sbt compiled against)
    val cp = Seq(
      "/root/repo/target/scala-2.13/test-classes",
      "/root/repo/target/scala-2.13/classes",
      "/opt/spark/jars/*").mkString(":")
    val pb = new ProcessBuilder(
      javaBin, "-cp", cp, "graft.CommitProbe", root, n.toString, "child", go)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    try {
      // handshake: wait for the child's store to be open, then fire both
      // writers at once so the commit ranges genuinely interleave
      val readyDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!Files.exists(Paths.get(go + ".ready"))) {
        assert(System.nanoTime() < readyDeadline, "child never became ready")
        assert(proc.isAlive, "child died before ready")
        Thread.sleep(5)
      }
      val store = new MetadataStore(root)
      Files.write(Paths.get(go), Array.emptyByteArray)

      // pace on observed child progress: before parent commit i, at least i
      // child commits are in the log (a cold child JVM would otherwise lose
      // the whole race to the warm parent). Forces genuine interleaving; the
      // child commits full-speed in between, so the parent's read-claim
      // window still collides with child claims — real cross-process CAS
      // conflicts with retry.
      def childCommits(): Int = store.state().snapshots
        .count(_.commitMessage.exists(_.startsWith("child-")))
      val mine = (0 until n).map { i =>
        val waitDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (childCommits() < i) {
          assert(System.nanoTime() < waitDeadline, s"child stalled before commit $i")
          Thread.sleep(2)
        }
        store.commitWithRetry(maxRetries = 1000) { (st, sid) =>
          CommitDelta(Snapshot(sid, System.currentTimeMillis(), 0L,
            List(s"probe:parent-$i"), commitMessage = Some(s"parent-$i")))
        }
      }

      val out = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor(120, TimeUnit.SECONDS), s"child timed out; output: $out")
      assert(proc.exitValue() == 0 && out.contains("PROBE_OK"), s"child failed: $out")

      val childIds = out.linesIterator.find(_.startsWith("PROBE_OK"))
        .get.stripPrefix("PROBE_OK ").trim.split(",").map(_.toLong).toVector

      // no id claimed twice across processes; union is the contiguous log
      assert(mine.toSet.intersect(childIds.toSet).isEmpty,
        "one snapshot id claimed by both processes")
      val st = new MetadataStore(root).state()
      val ids = st.snapshots.map(_.snapshotId).sorted
      assert(ids == (0 until 2 * n).map(_.toLong).toVector,
        s"expected contiguous 0..${2 * n - 1}, got $ids")
      val msgs = st.snapshots.flatMap(_.commitMessage)
      assert(msgs.count(_.startsWith("child-")) == n)
      assert(msgs.count(_.startsWith("parent-")) == n)
      assert(msgs.distinct.size == 2 * n)
      // both writers really did interleave (not two disjoint serial runs):
      // the child's ids are not simply all-above or all-below the parent's
      val interleaved = mine.exists(m => childIds.exists(_ < m)) &&
        childIds.exists(c => mine.exists(_ < c))
      assert(interleaved, s"no interleaving observed: parent=$mine child=$childIds")
    } finally {
      if (proc.isAlive) proc.destroyForcibly()
    }
  }

  test("two Spark JVMs interleave DML into one catalog; a third session tails the feed") {
    // the live-share posture end to end (VERDICT r9 #9): this JVM and a
    // forked SECOND SparkSession+Lake JVM ([[DmlProbe]]) run real INSERTs
    // (full write path: ACL, NOT NULL, inline fast path, message stamping)
    // through one shared catalog, while a THIRD cold session tails the
    // change feed and must see exactly the union of both writers' rows.
    import TestSession.spark
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft_xdml").toString
    val n = 8
    val go = s"$root/go_dml"

    val lake = new Lake(spark, root)
    lake.createTable("main.t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType))))

    // the third surface observes the race LIVE: a streaming CDF tail with
    // a per-trigger cap, polling WHILE both processes commit — the source
    // must see cross-process commits (cold store re-lists) and stay
    // exactly-once as the log grows under it
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val liveSink = s"xdmllive${System.nanoTime()}"
    val liveQ = spark.readStream.format("graft-changes")
      .option("root", root).option("table", "main.t")
      .option("maxSnapshotsPerTrigger", "2")
      .load().filter(col("_change_type") === "insert")
      .select("a", "b")
      .writeStream.format("memory").queryName(liveSink)
      .option("checkpointLocation", s"$root/_tail_ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = Seq(
      "/root/repo/target/scala-2.13/test-classes",
      "/root/repo/target/scala-2.13/classes",
      "/opt/spark/jars/*").mkString(":")
    // Spark-on-JDK17 outside spark-submit needs the module opens
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val pb = new ProcessBuilder(
      (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.DmlProbe", root, n.toString, go)): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    try {
      val readyDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!Files.exists(Paths.get(go + ".ready"))) {
        assert(System.nanoTime() < readyDeadline, "child session never came up")
        assert(proc.isAlive, "child died before ready")
        Thread.sleep(10)
      }
      Files.write(Paths.get(go), Array.emptyByteArray)

      def childOps(): Int = lake.store.state().snapshots
        .count(_.commitMessage.exists(_.startsWith("child-")))
      import spark.implicits._
      (0 until n).foreach { i =>
        val waitDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (childOps() < i) {
          assert(System.nanoTime() < waitDeadline, s"child stalled before parent op $i")
          Thread.sleep(2)
        }
        spark.conf.set("spark.graft.lake.commitMessage", s"parent-$i")
        lake.insertRows("main.t", Seq(Seq(Int.box(i), Int.box(i * 10))))
      }
      spark.conf.unset("spark.graft.lake.commitMessage")

      val out = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"child timed out; output: $out")
      assert(proc.exitValue() == 0 && out.contains("PROBE_OK"), s"child failed: $out")

      // drain the live tail to the final head, then assert exactly-once:
      // every insert from BOTH processes, no duplicates, despite the
      // capped triggers racing the growing log
      liveQ.processAllAvailable()
      liveQ.stop()
      val live = spark.table(liveSink).collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(live.length == 2 * n, s"live tail saw ${live.length} rows, want ${2 * n}")
      assert(live.toSet.size == 2 * n, "live tail delivered a duplicate")
      assert(live.map(_._1).sorted.toVector ==
        ((0 until n) ++ (0 until n).map(_ + 1000)).sorted.toVector)

      // third session: cold store, fresh caches — the change feed carries
      // the union of both writers' inserts, each exactly once, and the
      // interleave is real (neither side's snapshots form one solid block)
      val tail = new Lake(spark, root)
      val end = tail.currentSnapshot()
      val feed = tail.tableChanges("main.t", 0, end)
        .select("_change_type", "a", "b").collect()
      assert(feed.forall(_.getString(0) == "insert"))
      val as = feed.map(_.getInt(1)).sorted.toVector
      assert(as == ((0 until n) ++ (0 until n).map(_ + 1000)).map(identity).sorted.toVector,
        s"feed rows: $as")
      assert(tail.table("main.t").count() == 2L * n)
      val st = tail.store.state()
      val tagged = st.snapshots.flatMap(_.commitMessage)
        .filter(m => m.startsWith("parent-") || m.startsWith("child-"))
      assert(tagged.count(_.startsWith("parent-")) == n)
      assert(tagged.count(_.startsWith("child-")) == n)
      val order = st.snapshots.sortBy(_.snapshotId).flatMap(_.commitMessage)
        .collect { case m if m.startsWith("parent-") => 'p'
                   case m if m.startsWith("child-") => 'c' }
      assert(order.toSet == Set('p', 'c') && order.sliding(2)
        .exists(w => w.length == 2 && w(0) != w(1)),
        s"no interleaving observed: ${order.mkString}")
    } finally {
      if (proc.isAlive) proc.destroyForcibly()
    }
  }

  test("retry settings: spark.graft.lake.maxRetryCount bounds commit retries") {
    import TestSession.spark
    val store = new MetadataStore(
      Files.createTempDirectory("graft_retry").toString)
    var builds = 0
    def contendedCommit(): Long = store.commitWithRetry() { (st, sid) =>
      builds += 1
      // adversary claims every slot first — permanent contention
      store.commit(CommitDelta(Snapshot(sid, 1L, 0L, List("adversary"))))
      CommitDelta(Snapshot(sid, 1L, 0L, List("victim")))
    }
    spark.conf.set("spark.graft.lake.maxRetryCount", "0")
    try {
      intercept[CommitConflictException] { contendedCommit() }
      assert(builds == 1, "maxRetryCount=0 must fail on the first conflict")
      spark.conf.set("spark.graft.lake.maxRetryCount", "3")
      spark.conf.set("spark.graft.lake.retryWaitMs", "1")
      builds = 0
      intercept[CommitConflictException] { contendedCommit() }
      assert(builds == 4, s"3 retries = 4 attempts, saw $builds")
    } finally {
      spark.conf.unset("spark.graft.lake.maxRetryCount")
      spark.conf.unset("spark.graft.lake.retryWaitMs")
    }
  }
}
