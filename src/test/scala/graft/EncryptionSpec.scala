package graft

import java.nio.file.{Files, Paths}
import java.util.Base64
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** Parquet Modular Encryption on lake tables (`encrypted` option): files
  * are real PME encrypted-footer parquet (magic `PARE`), unreadable
  * without key access, transparently decrypted by every scan tier. The
  * reference and upstream DuckLake both list encryption unsupported
  * (docs/ducklake_feature_coverage.md:63) — this is superset surface. */
class EncryptionSpec extends AnyFunSuite {
  import TestSession.spark

  private def withKeys[A](body: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    val key = Base64.getEncoder.encodeToString(Array.tabulate[Byte](16)(_.toByte))
    hc.set(LakeEncryption.KeysConf, s"graft0:$key")
    body
  }

  private def encryptedLake(): Lake = {
    val root = Files.createTempDirectory("graft_enc").toString
    val lake = new Lake(spark, root)
    lake.setOption("encrypted", "true") // global scope: every table
    lake
  }

  private def dataFiles(lake: Lake, table: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    Files.walk(Paths.get(lake.root)).iterator().forEachRemaining { p =>
      val s = p.toString
      if (s.contains("/data/") && s.endsWith(".parquet")) b += s
    }
    b.result()
  }

  private def magic(path: String): String = {
    val in = Files.newInputStream(Paths.get(path))
    try { val b = new Array[Byte](4); in.read(b); new String(b, "US-ASCII") }
    finally in.close()
  }

  test("encrypted table: PARE files, plaintext-blind readers fail, lake reads decrypt") {
    withKeys {
      val lake = encryptedLake()
      val df = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 10).as("grp"), concat(lit("row"), col("id")).as("payload"))
      lake.createTableAs("main.enc", df)

      val files = dataFiles(lake, "main.enc")
      assert(files.nonEmpty)
      // encrypted-footer parquet magic is PARE, not PAR1
      files.foreach(p => assert(magic(p) == "PARE", s"$p not encrypted"))

      // a reader without the crypto factory cannot even open the footer
      val blind = intercept[Exception] {
        org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(files.head), new Configuration()))
      }
      assert(blind.getMessage != null &&
        blind.getMessage.toLowerCase.contains("encrypted"),
        s"unexpected failure: ${blind.getMessage}")

      // the lake read decrypts transparently (native tier)
      val back = lake.table("main.enc")
      assert(back.count() == 1000)
      assert(back.agg(sum("k")).head.getLong(0) == (0L until 1000L).sum)
    }
  }

  test("DELETE on an encrypted table writes encrypted delete vectors; scans stay correct") {
    withKeys {
      val lake = encryptedLake()
      lake.createTableAs("main.encd",
        spark.range(0, 500).select(col("id").as("k")))
      lake.delete("main.encd", col("k") % 5 === 0)

      // the delete-aware tier decrypts both data and delete files
      assert(lake.table("main.encd").count() == 400)

      // delete vector files on disk are PARE too
      val root = lake.root
      val delFiles = Files.walk(Paths.get(root)).iterator()
      var checkedDel = 0
      delFiles.forEachRemaining { p =>
        if (p.toString.contains("/deletes/") && p.toString.endsWith(".parquet")) {
          assert(magic(p.toString) == "PARE", s"$p not encrypted")
          checkedDel += 1
        }
      }
      assert(checkedDel > 0, "no delete vector files found")
    }
  }

  test("missing master key is a clean KeyAccessDenied failure, not silent plaintext") {
    withKeys {
      val lake = encryptedLake()
      lake.setOption("encryption_key", "absent_key")
      val err = intercept[Exception] {
        lake.createTableAs("main.encx",
          spark.range(0, 10).select(col("id").as("k")))
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(err).exists(t =>
        t.isInstanceOf[org.apache.parquet.crypto.KeyAccessDeniedException] ||
          (t.getMessage != null && t.getMessage.contains("absent_key"))),
        s"unexpected error chain: $err")
    }
  }

  test("encryption composes with the change feed and the streaming source") {
    withKeys {
      val lake = encryptedLake()
      lake.createTableAs("main.ence",
        spark.range(0, 100).select(col("id").as("k")))
      lake.delete("main.ence", col("k") >= 80)
      // batch change feed decrypts both the insert and delete images
      val ch = lake.tableChanges("main.ence", 0, lake.currentSnapshot())
      assert(ch.filter(col("_change_type") === "insert").count() == 100)
      assert(ch.filter(col("_change_type") === "delete").count() == 20)
      // streaming CDF source over the encrypted table
      val sink = s"graft_enc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = spark.readStream.format("graft-changes")
        .option("root", lake.root).option("table", "main.ence").load()
        .writeStream.format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(spark.table(sink).count() == 120)
      // z-order rewrite of an encrypted table stays encrypted
      lake.createTableAs("main.encz", spark.range(0, 2000).select(
        (col("id") % 40).cast("int").as("x"), (col("id") / 40).cast("int").as("y")))
      lake.rewriteZOrder("main.encz", Seq("x", "y"))
      val root = lake.root
      var checked = 0
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .forEachRemaining { p =>
          if (p.toString.endsWith(".parquet")) { assert(magic(p.toString) == "PARE", p); checked += 1 }
        }
      assert(checked > 0)
      assert(lake.table("main.encz").count() == 2000)
    }
  }

  test("compaction of an encrypted table re-encrypts the merged output") {
    withKeys {
      val lake = encryptedLake()
      val df = spark.range(0, 300).select(col("id").as("k"))
      lake.createTable("main.encc", df.schema)
      lake.append("main.encc", df.filter(col("k") < 100))
      lake.append("main.encc", df.filter(col("k") >= 100 && col("k") < 200))
      lake.append("main.encc", df.filter(col("k") >= 200))
      lake.mergeAdjacentFiles("main.encc")
      val files = dataFiles(lake, "main.encc")
      files.foreach(p => assert(magic(p) == "PARE", s"post-compaction $p not encrypted"))
      assert(lake.table("main.encc").count() == 300)
    }
  }
}
