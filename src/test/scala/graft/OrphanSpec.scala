package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** delete_orphaned_files: storage residue of crashed writers (promoted but
  * never committed) is found by catalog-vs-disk diff and reaped past a
  * grace window; every file any catalog interval references — live,
  * historical, or scheduled for deletion — is untouchable. */
class OrphanSpec extends AnyFunSuite {
  import TestSession.spark

  private def freshLake(): Lake =
    new Lake(spark, Files.createTempDirectory("graft_orphan").toString)

  private def dataDirOf(lake: Lake): String = {
    val it = Files.walk(Paths.get(lake.root)).iterator()
    var dir: String = null
    it.forEachRemaining { p =>
      val s = p.toString
      if (s.contains("/data/") && s.endsWith(".parquet"))
        dir = p.getParent.toString
    }
    assert(dir != null, "no data file found")
    dir
  }

  test("stray files are reaped; referenced and historical files survive") {
    val lake = freshLake()
    lake.createTableAs("main.o", spark.range(0, 100).selectExpr("id AS k"))
    lake.delete("main.o", col("k") >= 90) // delete vector + history
    val dataDir = dataDirOf(lake)
    val stray = s"$dataDir/part-00000-deadbeef-orphan.c000.parquet"
    Files.write(Paths.get(stray), "not a parquet".getBytes)

    val reaped = lake.deleteOrphanedFiles(olderThanMs = Some(0L))
    assert(reaped == Vector(stray))
    assert(!Files.exists(Paths.get(stray)))
    // catalog-owned files are intact and the table still reads
    assert(lake.table("main.o").count() == 90)
    assert(lake.deleteOrphanedFiles(olderThanMs = Some(0L)).isEmpty)
  }

  test("grace window spares a freshly promoted file") {
    val lake = freshLake()
    lake.createTableAs("main.g", spark.range(0, 10).selectExpr("id AS k"))
    val stray = s"${dataDirOf(lake)}/part-inflight.parquet"
    Files.write(Paths.get(stray), Array[Byte](1, 2, 3))
    // default 1h grace: the just-written file is presumed in-flight
    assert(lake.deleteOrphanedFiles().isEmpty)
    assert(Files.exists(Paths.get(stray)))
  }

  test("files scheduled for deletion belong to cleanup, not orphan reaping") {
    val lake = freshLake()
    lake.createTableAs("main.s", spark.range(0, 50).selectExpr("id AS k"))
    lake.append("main.s", spark.range(50, 100).selectExpr("id AS k"))
    lake.mergeAdjacentFiles("main.s") // old files -> scheduled deletions
    assert(lake.deleteOrphanedFiles(olderThanMs = Some(0L)).isEmpty)
    // cleanup owns them and time travel before expiry still works
    assert(lake.table("main.s").count() == 100)
  }
}
