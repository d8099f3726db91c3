package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.lake.Meta._

/** Live shared catalog over JDBC (embedded Derby — on the Spark classpath):
  * two Lake instances on ONE database see each other's commits on the next
  * read, with no freeze/import pull cycle — the reference's defining
  * deployment shape (N clients on one live PG catalog,
  * src/pgducklake_metadata_manager.cpp:366-404, src/pgducklake_fdw.cpp:167-190). */
class JdbcStoreSpec extends AnyFunSuite {
  import TestSession.spark

  private val abSchema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType)))

  private def freshPair(): (String, String) = {
    val dataRoot = Files.createTempDirectory("graft_jdbc_lake").toString
    val dbDir = Files.createTempDirectory("graft_derby").toString
    (dataRoot, s"jdbc:derby:$dbDir/cat;create=true")
  }

  test("two Lake instances share a live JDBC catalog — no freeze/import") {
    val (dataRoot, url) = freshPair()
    val writer = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    val reader = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    import spark.implicits._

    writer.createTable("main.t", abSchema)
    writer.append("main.t", (1 to 10).map(i => (i, i * 2)).toDF("a", "b"))
    // the reader's NEXT read sees the writer's snapshot — live catalog
    assert(reader.table("main.t").count() == 10)

    writer.delete("main.t", col("a") <= 3)
    assert(reader.table("main.t").count() == 7)

    // and the other direction: the reader writes, the writer sees it
    reader.append("main.t", Seq((100, 200)).toDF("a", "b"))
    assert(writer.table("main.t").count() == 8)

    // time travel works off the shared log
    val snaps = writer.snapshots().collect().map(_.getLong(0)).sorted
    assert(writer.table("main.t", Some(snaps(1))).count() == 10)

    // metadata truly lives in the database: the filesystem log dir carries
    // no vNNN.json commit files (data parquet still lands under dataRoot)
    val logDir = Paths.get(dataRoot, "_ducklake")
    val logFiles =
      if (Files.isDirectory(logDir))
        Files.list(logDir).iterator().asScala
          .count(_.getFileName.toString.endsWith(".json"))
      else 0
    assert(logFiles == 0, "commit log must be in the database, not on disk")
  }

  test("commit CAS: the database PK turns a double-claim into a conflict") {
    val (dataRoot, url) = freshPair()
    val s1 = new JdbcMetadataStore(dataRoot, url)
    val s2 = new JdbcMetadataStore(dataRoot, url)
    def delta(sid: Long) = CommitDelta(snapshot = Snapshot(sid, 1000L + sid, 0L, Nil))
    s1.commit(delta(0))
    intercept[CommitConflictException] { s2.commit(delta(0)) }
    // commitWithRetry recovers: both writers land, serialized
    val sidA = s1.commitWithRetry() { (_, sid) => delta(sid) }
    val sidB = s2.commitWithRetry() { (_, sid) => delta(sid) }
    assert(Set(sidA, sidB) == Set(1L, 2L))
    assert(s1.state().snapshots.map(_.snapshotId) == Vector(0L, 1L, 2L))
  }

  test("concurrent writers through one JDBC catalog all land (retry under contention)") {
    val (dataRoot, url) = freshPair()
    val stores = (1 to 4).map(_ => new JdbcMetadataStore(dataRoot, url))
    def delta(sid: Long, tag: String) = CommitDelta(
      snapshot = Snapshot(sid, 1000L + sid, 0L, List(tag)))
    val threads = stores.zipWithIndex.map { case (st, i) =>
      new Thread(() => (0 until 5).foreach { j =>
        st.commitWithRetry() { (_, sid) => delta(sid, s"w$i-$j") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val landed = stores.head.state().snapshots
    assert(landed.map(_.snapshotId) == (0L until 20L).toVector)
    // every writer's every commit is present exactly once
    val tags = landed.flatMap(_.changes)
    assert(tags.toSet.size == 20)
  }

  test("checkpoints live in the database; cold open reads checkpoint + tail") {
    val (dataRoot, url) = freshPair()
    val lake = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 1), (2, 2)).toDF("a", "b"))
    lake.checkpoint()
    lake.append("main.t", Seq((3, 3)).toDF("a", "b")) // tail past the checkpoint
    val cold = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    assert(cold.table("main.t").count() == 3)
    // checkpoint GC through the same tables
    lake.checkpoint()
    assert(lake.store.gcCheckpoints(keep = 1) >= 0)
    val cold2 = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    assert(cold2.table("main.t").count() == 3)
  }

  test("transactions group into one snapshot on the shared catalog") {
    val (dataRoot, url) = freshPair()
    val writer = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    val reader = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    import spark.implicits._
    writer.createTable("main.t", abSchema)
    val before = reader.snapshots().count()
    writer.transaction { tx =>
      tx.append("main.t", Seq((1, 1)).toDF("a", "b"))
      tx.append("main.t", Seq((2, 2)).toDF("a", "b"))
      tx.delete("main.t", col("a") === 1)
    }
    assert(reader.table("main.t").collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(reader.snapshots().count() == before + 1) // ONE snapshot for the group
  }

  test("SQL surface: a DSv2 catalog with jdbc= shares the same live store") {
    val (dataRoot, url) = freshPair()
    val cat = s"jdbccat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dataRoot)
    spark.conf.set(s"spark.sql.catalog.$cat.jdbc", url)
    spark.sql(s"CREATE TABLE $cat.main.t (a INT, b INT)")
    spark.sql(s"INSERT INTO $cat.main.t VALUES (1, 10), (2, 20)")
    // an API-level Lake on the same database sees the SQL writes live
    val lake = new Lake(spark, dataRoot, Some(new JdbcMetadataStore(dataRoot, url)))
    assert(lake.table("main.t").count() == 2)
    lake.append("main.t", {
      import spark.implicits._
      Seq((3, 30)).toDF("a", "b")
    })
    assert(spark.sql(s"SELECT count(*) FROM $cat.main.t").collect()
      .head.getLong(0) == 3)
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
