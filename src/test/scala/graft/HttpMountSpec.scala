package graft

import java.nio.file.Files
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
import graft.queries.MiniHttp

/** Frozen catalog mounted over HTTP — the reference's `frozen_url`
  * deployment (src/pgducklake_fdw.cpp:84-93: the FDW attaches a frozen
  * `.ducklake` catalog served by any web server, no shared filesystem
  * between publisher and consumer). Graft's freeze manifest is a set of
  * fixed-name JSON files, so the mount needs only HTTP GET — no listing,
  * no length probe — which is exactly what Hadoop's read-only
  * `HttpFileSystem` (scheme `http://`, on every Spark classpath) provides,
  * flowing through the same [[StoreIO]] seam as local and object-store
  * roots. Data files keep resolving against the lake's own storage root:
  * only METADATA crosses HTTP, matching the reference (the FDW attaches
  * the catalog; table scans read parquet from the data path). */
class HttpMountSpec extends AnyFunSuite {
  import TestSession.spark

  test("frozen mount over http:// — metadata via GET, data from the lake root") {
    val dataRoot = Files.createTempDirectory("graft_httplake").toString
    val lake = new Lake(spark, dataRoot)
    val df = spark.range(0, 100).select(
      col("id").as("k"), (col("id") % 7).as("grp"))
    lake.createTable("main.t", df.schema)
    lake.append("main.t", df)
    lake.delete("main.t", col("k") >= 90) // delete overlay must survive the mount

    val frozenDir = Files.createTempDirectory("graft_httpfz").toString
    lake.freeze(frozenDir, parquetCatalog = false)

    val srv = MiniHttp.serve(frozenDir)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val c = new LakeCatalog()
      val m = new java.util.HashMap[String, String]()
      m.put("frozen", url)
      c.initialize("httpfz", new CaseInsensitiveStringMap(m))
      assert(c.readOnly)
      val mounted = c.loadTable(Identifier.of(Array("main"), "t"))
        .asInstanceOf[LakeTable].scanDF(spark)
      assert(mounted.count() == 90)
      assert(mounted.agg(sum("k")).head.getLong(0) == (0 until 90).sum.toLong)
    } finally srv.stop(0)
  }

  test("the mount stays queryable after the metadata server goes away") {
    val dataRoot = Files.createTempDirectory("graft_httplake2").toString
    val lake = new Lake(spark, dataRoot)
    lake.createTableAs("main.u", spark.range(0, 50).selectExpr("id AS k"))
    val frozenDir = Files.createTempDirectory("graft_httpfz2").toString
    lake.freeze(frozenDir, parquetCatalog = false)

    val srv = MiniHttp.serve(frozenDir)
    val c = new LakeCatalog()
    val m = new java.util.HashMap[String, String]()
    m.put("frozen", s"http://127.0.0.1:${srv.getAddress.getPort}")
    c.initialize("httpfz2", new CaseInsensitiveStringMap(m))
    val mounted = c.loadTable(Identifier.of(Array("main"), "u"))
      .asInstanceOf[LakeTable].scanDF(spark)
    srv.stop(0) // catalog state is fully materialized at initialize
    assert(mounted.count() == 50)
  }
}
