package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Thread-scoping of the SQL BEGIN-block store override (r16, ADVICE): a
  * concurrent writer on ANOTHER thread must keep committing to the real
  * store while a block is open — with the old catalog-global override its
  * write silently landed in the block's StagingStore and was discarded
  * wholesale on ROLLBACK. Lives in graft.lake for access to the
  * private[lake] begin/endTxOverride hooks the SQL command uses. */
class TxScopeSpec extends AnyFunSuite {
  import graft.TestSession.spark

  private def freshCat(): (Lake, LakeCatalog, String) = {
    val lake = new Lake(spark, Files.createTempDirectory("graft_txscope").toString)
    val cat = s"txs${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val lc = org.apache.spark.sql.graft.CatalogAccess.catalog(spark, cat)
      .asInstanceOf[LakeCatalog]
    (lake, lc, cat)
  }

  test("a concurrent writer on another thread survives the block's ROLLBACK") {
    val (lake, lc, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    object Rb extends RuntimeException
    try {
      lake.transaction { tx =>
        lc.beginTxOverride(tx.store)
        try {
          // this thread's write stages (reads-your-own-writes)
          spark.sql(s"INSERT INTO $cat.main.t VALUES (2, 20)").collect()
          assert(spark.sql(s"SELECT count(*) FROM $cat.main.t")
            .head.getLong(0) == 2L)
          // another thread's write goes to the REAL store, not the staging
          @volatile var err: Option[Throwable] = None
          val t = new Thread(() => {
            try spark.sql(s"INSERT INTO $cat.main.t VALUES (9, 90)").collect()
            catch { case e: Throwable => err = Some(e) }
          })
          t.start(); t.join()
          assert(err.isEmpty, s"concurrent writer failed: $err")
          throw Rb
        } finally lc.endTxOverride()
      }
      fail("rollback did not propagate")
    } catch { case Rb => () }
    val got = lake.table("main.t").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 9L),
      s"the concurrent write must survive the rollback; staged one must not: $got")
  }

  test("splitStatements: comments and quoted identifiers don't split or emit statements") {
    val got = SqlViews.splitStatements(
      """INSERT INTO `a;b` VALUES (1); -- trailing; comment
        |-- a full-line; comment between statements
        |/* block; comment */ INSERT INTO "c;d" VALUES ('x;y');
        |SELECT /* mid; block */ 1""".stripMargin)
    assert(got.size == 3, got)
    assert(got(0).startsWith("INSERT INTO `a;b` VALUES (1)"), got(0))
    assert(got(1).contains("\"c;d\"") && got(1).contains("'x;y'"), got(1))
    assert(got(2).startsWith("SELECT"), got(2))
    // a fragment that is ONLY comments is not a statement
    assert(SqlViews.splitStatements("-- just; a comment\n/* and; this */").isEmpty)
    // "/*/" does not close the block comment it opens
    assert(SqlViews.splitStatements("SELECT 1 /*/ ; */").size == 1)
  }

  test("splitStatements: backslash-escaped quote stays inside the string (ADVICE r16)") {
    // \' must NOT exit string mode: the ';' after it is literal text
    val got = SqlViews.splitStatements(
      """INSERT INTO t VALUES ('it\'s; done'); SELECT 1""")
    assert(got.size == 2, got)
    assert(got(0).contains("""'it\'s; done'"""), got(0))
    assert(got(1) == "SELECT 1", got(1))
    // a trailing backslash at end-of-input must not read past the buffer
    assert(SqlViews.splitStatements("SELECT '\\").size == 1)
    // '' double-quote escaping still nets out (toggles twice)
    val dd = SqlViews.splitStatements("INSERT INTO t VALUES ('a''b;c'); SELECT 2")
    assert(dd.size == 2 && dd(0).contains("'a''b;c'"), dd)
  }

  test("nesting a block on one thread is rejected; end clears the slot") {
    val (lake, lc, _) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    lc.beginTxOverride(new StagingStore(lake.store))
    try {
      val e = intercept[IllegalArgumentException](
        lc.beginTxOverride(new StagingStore(lake.store)))
      assert(e.getMessage.contains("nest"))
    } finally lc.endTxOverride()
    // slot cleared: a fresh begin works again
    lc.beginTxOverride(new StagingStore(lake.store))
    lc.endTxOverride()
  }
}
