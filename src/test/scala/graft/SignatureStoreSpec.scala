package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** Incremental corpus dedup (r17, VERDICT r16 #5, [[SignatureStore]]): a
  * maintained MinHash band-signature table fed from the change feed, plus
  * an LSH probe of only the new rows' bands against it. */
class SignatureStoreSpec extends AnyFunSuite {
  import TestSession.spark

  private def mkLake() =
    new Lake(spark, Files.createTempDirectory("graft_sig").toString)

  private def doc(id: Long, words: String*): (Long, String) =
    id -> words.mkString(" ")

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** signature rows as a comparable set */
  private def sigSet(df: DataFrame): Set[(Long, Int, String)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private val base = Seq(
    doc(1, "the", "quick", "brown", "fox", "jumps", "over", "the", "dog"),
    doc(2, "the", "quick", "brown", "fox", "jumps", "over", "the", "cat"),
    doc(3, "entirely", "different", "text", "about", "other", "topics", "here"),
    doc(4, "short"), // < 3 tokens: no shingles, excluded everywhere
    doc(5, "yet", "another", "unrelated", "document", "body", "goes", "here"))

  test("interleaved appends + refreshes land every band exactly once") {
    val lake = mkLake()
    lake.createTableAs("main.docs", docsDF(base))
    SignatureStore.create(lake, "main.sigs", "main.docs")
    // three append/refresh cycles, including a double append in one window
    // and a replayed refresh (watermark no-op)
    val batches = Seq(
      Seq(doc(6, "the", "quick", "brown", "fox", "leaps", "over", "the", "dog")),
      Seq(doc(7, "totally", "fresh", "content", "for", "batch", "two"),
        doc(8, "the", "quick", "brown", "fox", "jumps", "over", "the", "dog")),
      Seq(doc(9, "final", "batch", "document", "with", "own", "words")))
    lake.append("main.docs", docsDF(batches(0)))
    SignatureStore.refresh(lake, "main.sigs")
    SignatureStore.refresh(lake, "main.sigs") // replay: no-op
    lake.append("main.docs", docsDF(batches(1)))
    lake.append("main.docs", docsDF(batches(2)))
    SignatureStore.refresh(lake, "main.sigs")
    val got = sigSet(lake.table("main.sigs"))
    val want = sigSet(SignatureStore.bandsOf(lake.table("main.docs")))
    assert(got == want, s"sigs must equal a fresh banding of the corpus")
    // exactly-once: no duplicate rows either
    assert(lake.table("main.sigs").count() ==
      lake.table("main.sigs").distinct().count())
  }

  test("concurrent refreshers: the CAS loser cannot double-append") {
    val lake = mkLake()
    lake.createTableAs("main.docs", docsDF(base))
    SignatureStore.create(lake, "main.sigs", "main.docs")
    lake.append("main.docs",
      docsDF(Seq(doc(10, "raced", "append", "window", "content", "here"))))
    val t1 = new Thread(() =>
      try SignatureStore.refresh(lake, "main.sigs")
      catch { case _: Exception => () })
    val t2 = new Thread(() =>
      try SignatureStore.refresh(new Lake(spark, lake.root), "main.sigs")
      catch { case _: Exception => () })
    t1.start(); t2.start(); t1.join(); t2.join()
    SignatureStore.refresh(lake, "main.sigs") // settle a loser's abort
    assert(sigSet(lake.table("main.sigs")) ==
      sigSet(SignatureStore.bandsOf(lake.table("main.docs"))))
  }

  test("a delete in the window rebuilds the signatures (no stale bands)") {
    val lake = mkLake()
    lake.createTableAs("main.docs", docsDF(base))
    SignatureStore.create(lake, "main.sigs", "main.docs")
    lake.delete("main.docs", col("doc_id") === 2L)
    lake.append("main.docs",
      docsDF(Seq(doc(11, "added", "after", "the", "delete", "happened"))))
    SignatureStore.refresh(lake, "main.sigs")
    val got = sigSet(lake.table("main.sigs"))
    assert(got == sigSet(SignatureStore.bandsOf(lake.table("main.docs"))))
    assert(!got.exists(_._1 == 2L), "deleted doc's bands must be gone")
  }

  test("dedupNewAgainstAll equals the batch pairing restricted to new-vs-all") {
    val lake = mkLake()
    lake.createTableAs("main.docs", docsDF(base))
    SignatureStore.create(lake, "main.sigs", "main.docs")
    val snap0 = lake.currentSnapshot()
    lake.append("main.docs", docsDF(Seq(
      doc(6, "the", "quick", "brown", "fox", "jumps", "over", "the", "dog"),
      doc(7, "nothing", "like", "anything", "else", "in", "the", "corpus"))))
    SignatureStore.refresh(lake, "main.sigs")
    val inc = SignatureStore.dedupNewAgainstAll(lake, "main.sigs", snap0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: band EVERYTHING, pair within buckets, keep pairs
    // touching a new doc (6 or 7)
    val bands = SignatureStore.bandsOf(lake.table("main.docs"))
    val b2 = bands.select(col("doc_id").as("doc_b"),
      col("band"), col("bucket"))
    val batch = bands.join(b2, Seq("band", "bucket"))
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 >= 6L || p._2 >= 6L).toSet
    assert(inc == batch, s"inc=$inc batch=$batch")
    // doc 6 is an exact dup of doc 1 (and near-dups 2); doc 7 matches none
    assert(inc.nonEmpty && inc.forall(p => p._1 >= 6L || p._2 >= 6L))
    assert(!inc.exists(p => p._1 == 7L || p._2 == 7L))
    // jaccard column: the exact dup pair scores 1.0
    val j = SignatureStore.dedupNewAgainstAll(lake, "main.sigs", snap0)
      .filter(col("doc_a") === 1L && col("doc_b") === 6L)
      .collect()
    assert(j.length == 1 && j.head.getDouble(2) > 0.99, j.mkString(","))
  }
}
