package graft

import java.net.URI
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** The same local-backed test filesystem as [[GraftTestFs]] but under a
  * scheme deliberately NOT declared atomic — stands in for a plain S3
  * bucket whose create(overwrite=false) is check-then-write. */
class CasUnsafeFs extends GraftTestFs {
  override def getScheme: String = "casunsafe"
  override def getUri: URI = URI.create("casunsafe:///")
}

/** VERDICT r7 #2: the commit CAS must refuse non-atomic substrates
  * instead of silently degrading to last-writer-wins. The decision
  * matrix: built-in atomic schemes pass, conf-declared schemes pass,
  * anything else fails fast with remediation, and
  * `graft.commit.allowNonAtomicCas=true` downgrades the failure to a
  * single-writer warning. (ObjectStoreSpec exercises the declared-scheme
  * path end-to-end via `graft.commit.atomicSchemes=graftfs`.) */
class CasGateSpec extends AnyFunSuite {
  import TestSession.spark

  spark.sparkContext.hadoopConfiguration
    .set("fs.casunsafe.impl", classOf[CasUnsafeFs].getName)

  private def tmpPath(): String =
    Files.createTempDirectory("graft_casgate").toString

  test("unknown scheme is refused with remediation, reads still work") {
    val dir = tmpPath()
    val io = StoreIO.forPath(s"casunsafe://$dir")
    // non-commit primitives are unaffected — only the CAS is gated
    io.put(s"casunsafe://$dir/free.txt", "x".getBytes)
    assert(io.exists(s"casunsafe://$dir/free.txt"))
    val ex = intercept[IllegalStateException] {
      io.putIfAbsent(s"casunsafe://$dir/commit.json", "{}".getBytes)
    }
    assert(ex.getMessage.contains("casunsafe"))
    assert(ex.getMessage.contains("JDBC"), s"no remediation in: ${ex.getMessage}")
    assert(!io.exists(s"casunsafe://$dir/commit.json"),
      "refused CAS must not have written the slot")
  }

  test("allowNonAtomicCas=true downgrades to single-writer warning") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setBoolean("graft.commit.allowNonAtomicCas", true)
    try {
      val dir = tmpPath()
      val io = StoreIO.forPath(s"casunsafe://$dir")
      assert(io.putIfAbsent(s"casunsafe://$dir/commit.json", "{}".getBytes))
      // the CAS result semantics stay intact on the tolerated path
      assert(!io.putIfAbsent(s"casunsafe://$dir/commit.json", "{}".getBytes))
    } finally hc.unset("graft.commit.allowNonAtomicCas")
  }

  test("file:// (built-in atomic) passes the gate") {
    val dir = tmpPath()
    val io = StoreIO.forPath(s"file://$dir")
    assert(io.putIfAbsent(s"file://$dir/commit.json", "{}".getBytes))
    assert(!io.putIfAbsent(s"file://$dir/commit.json", "{}".getBytes))
  }
}
