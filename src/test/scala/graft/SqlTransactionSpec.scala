package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** SQL `BEGIN; …; COMMIT/ROLLBACK` blocks (r15, VERDICT r14 #9): the last
  * surface-shape delta with the reference's transaction.sql — the
  * multi-statement API (l35) existed, this drives it from the parser
  * boundary. The whole block arrives as one sql() string; its statements
  * stage against the current lake catalog (reads-your-own-writes) and land
  * as ONE snapshot, or vanish wholesale on ROLLBACK. */
class SqlTransactionSpec extends AnyFunSuite {
  import TestSession.spark

  private def freshCat(): (Lake, String) = {
    val lake = new Lake(spark, Files.createTempDirectory("graft_sqltx").toString)
    val c = s"tx${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.root", lake.root)
    c -> ()
    (lake, c)
  }

  test("BEGIN block: statements read their own writes and land as ONE snapshot") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val before = lake.currentSnapshot()
    val sid = spark.sql(
      s"""BEGIN;
         |INSERT INTO $cat.main.t VALUES (3, 30);
         |INSERT INTO $cat.main.t SELECT k + 100, v * 2 FROM $cat.main.t;
         |DELETE FROM $cat.main.t WHERE k = 2;
         |COMMIT;""".stripMargin).head.getLong(0)
    // the second INSERT saw the staged (3,30) — reads-your-own-writes —
    // and the DELETE pruned both the original 2 and nothing else
    val got = lake.table("main.t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 3L -> 30L,
      101L -> 20L, 102L -> 40L, 103L -> 60L))
    // exactly ONE snapshot for the whole block
    assert(sid == before + 1, s"expected one snapshot, $before -> $sid")
    assert(lake.currentSnapshot() == sid)
  }

  test("ROLLBACK block: nothing visible, staged files deleted") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    val before = lake.currentSnapshot()
    def parquetCount: Long = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(lake.root)).iterator().asScala
        .count(_.toString.endsWith(".parquet")).toLong
    }
    val filesBefore = parquetCount
    val sid = spark.sql(
      s"""BEGIN;
         |INSERT INTO $cat.main.t VALUES (2, 20);
         |DELETE FROM $cat.main.t WHERE k = 1;
         |ROLLBACK;""".stripMargin).head.getLong(0)
    assert(sid == -1L)
    assert(lake.currentSnapshot() == before)
    assert(lake.table("main.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // rollback deleted the staged parquet (no orphan accumulation; an
    // empty uuid directory may remain — bytes, not data)
    assert(parquetCount == filesBefore, "staged parquet survived the rollback")
  }

  test("a failing statement aborts the whole block invisibly") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    val before = lake.currentSnapshot()
    intercept[Exception] {
      spark.sql(
        s"""BEGIN;
           |INSERT INTO $cat.main.t VALUES (2, 20);
           |INSERT INTO $cat.main.nope VALUES (1, 1);
           |COMMIT;""".stripMargin).collect()
    }
    assert(lake.currentSnapshot() == before)
    assert(lake.table("main.t").count() == 1)
  }

  test("semicolons inside string literals don't split statements") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.s", Seq((1L, "x")).toDF("k", "txt"))
    spark.sql(
      s"""BEGIN;
         |INSERT INTO $cat.main.s VALUES (2, 'a;b;c');
         |COMMIT;""".stripMargin).collect()
    assert(lake.table("main.s").filter(col("k") === 2L)
      .head.getString(1) == "a;b;c")
  }

  test("comments inside and after the block parse transactionally (r16)") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    val before = lake.currentSnapshot()
    // a trailing comment after COMMIT used to miss TxBlockRe entirely and
    // fall through to the delegate parser (losing atomicity); a ';' in a
    // comment used to split the statement
    spark.sql(
      s"""BEGIN;
         |-- stage two rows; both land atomically
         |INSERT INTO $cat.main.t VALUES (2, 20);
         |/* second; insert */ INSERT INTO $cat.main.t VALUES (3, 30);
         |COMMIT; -- done; one snapshot""".stripMargin).collect()
    assert(lake.currentSnapshot() == before + 1, "block must land as ONE snapshot")
    assert(lake.table("main.t").count() == 3)
  }

  test("single-statement blocks and string-literal COMMIT text work; DDL stages too") {
    val (lake, cat) = freshCat()
    import spark.implicits._
    lake.createTableAs("main.t", Seq((1L, 10L)).toDF("k", "v"))
    // DDL + DML in one block: CTAS-style create via the catalog, then
    // insert into it — both land in one snapshot... DSv2 CREATE inside a
    // block stages through the same effective store
    val before = lake.currentSnapshot()
    spark.sql(
      s"""BEGIN;
         |CREATE TABLE $cat.main.t2 (k BIGINT, v BIGINT);
         |INSERT INTO $cat.main.t2 VALUES (7, 70);
         |COMMIT;""".stripMargin).collect()
    assert(lake.currentSnapshot() == before + 1)
    assert(lake.table("main.t2").head.getLong(1) == 70L)
  }
}
