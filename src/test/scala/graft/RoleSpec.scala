package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** Access-control roles (SURVEY §2.A A30): the reference's predefined
  * superuser/writer/reader role model + per-table GRANTs
  * (sql/pg_ducklake--0.1.0.sql:523-563, docs/access_control.md) with the
  * DML-level enforcement the reference documents as a known gap — checks
  * fire at the engine choke points (LakeRead.scanDF / LakeWrite.*), so
  * the API, DSv2 SQL, views, and the change feed are all covered. */
class RoleSpec extends AnyFunSuite {
  import TestSession.spark

  private def newLake(): Lake =
    new Lake(spark, Files.createTempDirectory("graft_acl").toString)

  private val abSchema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType)))

  /** run `body` as the given session user, always restoring owner mode */
  private def as[T](user: String)(body: => T): T = {
    spark.conf.set(LakeAcl.UserConf, user)
    try body finally spark.conf.unset(LakeAcl.UserConf)
  }

  /** DSv2 execution may wrap the SecurityException — walk the cause
    * chain and return the permission-denied message */
  private def denied(body: => Any): String = {
    val e = intercept[Throwable](body)
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .collectFirst { case s: SecurityException => s.getMessage }
      .getOrElse(fail(s"expected SecurityException, got $e", e))
  }

  private def seedLake(): Lake = {
    val lake = newLake()
    import spark.implicits._
    lake.createTable("main.t", abSchema)
    lake.append("main.t", Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"))
    lake.createTable("main.other", abSchema)
    lake.append("main.other", Seq((9, 90)).toDF("a", "b"))
    lake
  }

  test("predefined roles exist by default; empty setting disables (GUC parity)") {
    val lake = newLake()
    val names = lake.acl.roles().collect().map(_.getString(0)).toSet
    assert(names == Set("graft_superuser", "graft_writer", "graft_reader"))
    lake.setOption("reader_role", "")
    assert(!lake.acl.roles().collect().map(_.getString(0)).contains("graft_reader"))
    // renamed role: membership checks follow the configured name
    lake.setOption("writer_role", "scribes")
    assert(lake.acl.roles().collect().map(_.getString(0)).contains("scribes"))
  }

  test("undeclared session user = owner mode: everything allowed (reference default posture)") {
    val lake = seedLake()
    assert(lake.table("main.t").count() == 3)
    lake.delete("main.t", col("a") === 1)
    lake.vacuum("main.t")
    assert(lake.table("main.t").count() == 2)
  }

  test("reader: SELECT everywhere, every write and maintenance op denied") {
    val lake = seedLake()
    import spark.implicits._
    lake.acl.createUser("ana", Seq("graft_reader"))
    as("ana") {
      assert(lake.table("main.t").count() == 3)
      assert(lake.table("main.other").count() == 1)
      assert(denied(lake.append("main.t", Seq((4, 40)).toDF("a", "b")))
        .contains("INSERT"))
      assert(denied(lake.delete("main.t", col("a") === 1)).contains("DELETE"))
      assert(denied(lake.update("main.t", col("a") === 1,
        Map("b" -> lit(0)))).contains("UPDATE"))
      assert(denied(lake.insertRows("main.t", Seq(Seq(5, 50)))).contains("INSERT"))
      assert(denied(lake.vacuum("main.t")).contains("superuser"))
      assert(denied(lake.createTable("main.nope", abSchema)).contains("superuser"))
      assert(denied(lake.setOption("k", "v")).contains("superuser"))
      assert(denied(lake.createView("main.v", "SELECT 1")).contains("superuser"))
    }
  }

  test("writer: all DML, no DDL/maintenance; superuser: everything") {
    val lake = seedLake()
    import spark.implicits._
    lake.acl.createUser("wri", Seq("graft_writer"))
    lake.acl.createUser("adm", Seq("graft_superuser"))
    as("wri") {
      lake.append("main.t", Seq((4, 40)).toDF("a", "b"))
      lake.update("main.t", col("a") === 4, Map("b" -> lit(44)))
      lake.delete("main.t", col("a") === 4)
      // overwrite = INSERT + DELETE — writer holds both
      lake.append("main.t", Seq((7, 70)).toDF("a", "b"), overwrite = true)
      assert(denied(lake.vacuum("main.t")).contains("superuser"))
      assert(denied(lake.cleanupOldFiles()).contains("superuser"))
    }
    as("adm") {
      lake.createTable("main.t2", abSchema)
      lake.append("main.t2", Seq((1, 1)).toDF("a", "b"))
      lake.vacuum("main.t2")
      lake.expireSnapshots(Some(0L))
    }
  }

  test("custom role: only granted tables/privileges; revoke removes; ALL expands") {
    val lake = seedLake()
    import spark.implicits._
    lake.acl.createRole("analyst")
    lake.acl.createUser("bo", Seq("analyst"))
    lake.acl.grant("main.t", "analyst", Seq("SELECT", "INSERT"))
    as("bo") {
      assert(lake.table("main.t").count() == 3)
      lake.append("main.t", Seq((4, 40)).toDF("a", "b"))
      assert(denied(lake.delete("main.t", col("a") === 4)).contains("DELETE"))
      assert(denied(lake.table("main.other").count()).contains("SELECT"))
    }
    lake.acl.revoke("main.t", "analyst", Seq("INSERT"))
    as("bo") {
      assert(lake.table("main.t").count() == 4) // SELECT kept
      assert(denied(lake.append("main.t", Seq((5, 50)).toDF("a", "b")))
        .contains("INSERT"))
    }
    lake.acl.grant("main.other", "analyst", Seq("ALL"))
    as("bo") {
      lake.update("main.other", col("a") === 9, Map("b" -> lit(99)))
      lake.delete("main.other", col("a") === 9)
    }
    intercept[IllegalArgumentException](
      lake.acl.grant("main.t", "analyst", Seq("VACUUM")))
  }

  test("membership DDL: GRANT/REVOKE role TO/FROM user; DROP ROLE cascades") {
    val lake = seedLake()
    lake.acl.createRole("eng")
    lake.acl.createUser("cy")
    lake.acl.grant("main.t", "eng", Seq("SELECT"))
    as("cy")(assert(denied(lake.table("main.t").count()).contains("SELECT")))
    lake.acl.grantRole("eng", "cy")
    as("cy")(assert(lake.table("main.t").count() == 3))
    lake.acl.revokeRole("eng", "cy")
    as("cy")(assert(denied(lake.table("main.t").count()).contains("SELECT")))
    lake.acl.grantRole("eng", "cy")
    lake.acl.dropRole("eng") // cascades: grant + membership vanish
    assert(lake.acl.grants().filter(col("role_name") === "eng").count() == 0)
    assert(!lake.acl.users().filter(col("user_name") === "cy")
      .head.getString(1).contains("eng"))
    as("cy")(assert(denied(lake.table("main.t").count()).contains("SELECT")))
    // predefined roles cannot be dropped
    intercept[IllegalArgumentException](lake.acl.dropRole("graft_reader"))
  }

  test("ACL DDL itself requires superuser once a user is declared") {
    val lake = seedLake()
    lake.acl.createUser("adm", Seq("graft_superuser"))
    lake.acl.createUser("rdr", Seq("graft_reader"))
    as("rdr") {
      assert(denied(lake.acl.createRole("sneaky")).contains("superuser"))
      assert(denied(lake.acl.grant("main.t", "graft_reader",
        Seq("DELETE"))).contains("superuser"))
    }
    as("adm")(lake.acl.createRole("ok"))
    assert(lake.acl.roles().collect().map(_.getString(0)).contains("ok"))
  }

  test("enforcement covers DSv2 SQL, stored views (base tables), and the change feed") {
    val lake = seedLake()
    lake.createView("main.v", "SELECT a FROM t WHERE a >= 2")
    lake.acl.createUser("ana", Seq("graft_reader"))
    lake.acl.createUser("no1")
    val cat = s"aclcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    as("ana") {
      assert(spark.sql(s"SELECT * FROM $cat.main.t").count() == 3)
      assert(lake.view("main.v").count() == 2)
      assert(lake.tableChanges("main.t", 0, lake.currentSnapshot()).count() > 0)
    }
    as("no1") {
      assert(denied(spark.sql(s"SELECT * FROM $cat.main.t").count())
        .contains("SELECT"))
      assert(denied(lake.view("main.v").count()).contains("SELECT"))
      assert(denied(lake.tableChanges("main.t", 0, lake.currentSnapshot())
        .count()).contains("SELECT"))
      assert(denied(spark.sql(
        s"INSERT INTO $cat.main.t VALUES (8, 80)")).contains("INSERT"))
      assert(denied(spark.sql(s"ALTER TABLE $cat.main.t ADD COLUMN c INT"))
        .contains("superuser"))
      assert(denied(spark.sql(s"DROP TABLE $cat.main.t")).contains("superuser"))
    }
  }

  test("MERGE checks the union of its clauses' privileges") {
    val lake = seedLake()
    import spark.implicits._
    lake.acl.createRole("upserter")
    lake.acl.createUser("up", Seq("upserter"))
    lake.acl.grant("main.t", "upserter", Seq("SELECT", "INSERT", "UPDATE"))
    val src = Seq((2, 222), (9, 900)).toDF("sa", "sb")
    as("up") {
      // update + insert clauses: allowed
      lake.merge("main.t", src, col("a") === col("sa"),
        matched = Seq(LakeWrite.MergeMatched(None, Some(Map("b" -> col("sb"))))),
        notMatched = Seq(LakeWrite.MergeInsert(None,
          Map("a" -> col("sa"), "b" -> col("sb")))))
      // a DELETE clause needs the DELETE privilege
      assert(denied(lake.merge("main.t", src, col("a") === col("sa"),
        matched = Seq(LakeWrite.MergeMatched(None, None)),
        notMatched = Nil)).contains("DELETE"))
    }
  }

  test("SQL role DDL: CREATE ROLE/USER, GRANT, SHOW ROLES/GRANTS via the parser") {
    val lake = seedLake()
    val cat = s"aclsql${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val prev = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql(s"USE $cat")
    try {
      spark.sql("CREATE ROLE folk")
      spark.sql("CREATE USER dana IN ROLE folk")
      spark.sql("GRANT SELECT, INSERT ON TABLE main.t TO folk")
      val roles = spark.sql("SHOW ROLES").collect().map(_.getString(0)).toSet
      assert(roles.contains("folk") && roles.contains("graft_superuser"))
      val g = spark.sql("SHOW GRANTS ON main.t").collect()
        .map(r => (r.getString(2), r.getString(3))).toSet
      assert(g == Set(("folk", "SELECT,INSERT")))
      as("dana") {
        assert(spark.sql(s"SELECT * FROM $cat.main.t").count() == 3)
        assert(denied(lake.delete("main.t", col("a") === 1)).contains("DELETE"))
      }
      spark.sql("REVOKE INSERT ON main.t FROM folk")
      assert(spark.sql("SHOW GRANTS").collect()
        .map(_.getString(3)).toSet == Set("SELECT"))
      spark.sql("GRANT graft_superuser TO dana")
      as("dana")(lake.vacuum("main.t"))
      spark.sql("REVOKE graft_superuser FROM dana")
      as("dana")(assert(denied(lake.vacuum("main.t")).contains("superuser")))
      spark.sql("DROP USER dana")
      spark.sql("DROP ROLE folk")
      assert(!spark.sql("SHOW ROLES").collect().map(_.getString(0)).contains("folk"))
    } finally spark.sql(s"USE $prev")
  }

  test("ACL state rides freeze → thaw as plain ducklake_tag rows") {
    val lake = seedLake()
    lake.acl.createRole("r1")
    lake.acl.createUser("u1", Seq("r1"))
    lake.acl.grant("main.t", "r1", Seq("SELECT", "DELETE"))
    val frozen = Files.createTempDirectory("graft_aclfreeze").toString
    lake.freeze(frozen)
    val thawed = new Lake(spark, Files.createTempDirectory("graft_aclthaw").toString)
    thawed.importCatalog(s"$frozen/catalog_parquet")
    assert(thawed.acl.roles().collect().map(_.getString(0)).contains("r1"))
    assert(thawed.acl.users().filter(col("user_name") === "u1")
      .head.getString(1) == "r1")
    assert(thawed.acl.grants().filter(col("role_name") === "r1")
      .head.getString(3) == "SELECT,DELETE")
    // and the imported ACL ENFORCES on the thawed lake too
    as("u1") {
      assert(lakeReadCount(thawed) == 3)
      assert(denied(thawed.table("main.other").count()).contains("SELECT"))
    }
  }

  private def lakeReadCount(l: Lake): Long = l.table("main.t").count()

  test("ACL state is interval-versioned: grants() time-travels") {
    val lake = seedLake()
    lake.acl.createRole("r1")
    val before = lake.currentSnapshot()
    lake.acl.grant("main.t", "r1", Seq("SELECT"))
    assert(lake.acl.grants(Some(before)).count() == 0)
    assert(lake.acl.grants().count() == 1)
    assert(lake.acl.roles(Some(before)).collect().map(_.getString(0))
      .contains("r1"))
  }

  test("adversarial: reader escalation via SQL role DDL; writer via CALL maintenance") {
    // the two probes a security review runs first (VERDICT r9 #6): a
    // declared NON-superuser driving the SQL ACL surface directly, and a
    // writer (full DML) reaching for the maintenance procedures
    val lake = seedLake()
    lake.acl.createUser("boss", Seq("graft_superuser"))
    lake.acl.createUser("wry", Seq("graft_writer"))
    lake.acl.createUser("rdr", Seq("graft_reader"))
    val cat = s"aclneg${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val prev = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql(s"USE $cat")
    try {
      as("rdr") {
        assert(denied(spark.sql("CREATE ROLE sneaky")).contains("superuser"))
        assert(denied(spark.sql("GRANT DELETE ON TABLE main.t TO graft_reader"))
          .contains("superuser"))
        assert(denied(spark.sql("GRANT graft_superuser TO rdr"))
          .contains("superuser"))
        assert(denied(spark.sql("CREATE USER mole IN ROLE graft_superuser"))
          .contains("superuser"))
        assert(denied(spark.sql("DROP ROLE graft_writer")).contains("superuser"))
      }
      as("wry") {
        // writer: DML flows, every maintenance procedure is denied
        spark.sql(s"INSERT INTO $cat.main.t VALUES (7, 70)")
        assert(denied(spark.sql(s"CALL $cat.system.vacuum('main.t')"))
          .contains("superuser"))
        assert(denied(spark.sql(s"CALL $cat.system.maintain()"))
          .contains("superuser"))
        assert(denied(spark.sql(s"CALL $cat.system.expire_snapshots(0)"))
          .contains("superuser"))
        assert(denied(spark.sql(
          s"CALL $cat.system.set_option('parquet_compression', 'zstd')"))
          .contains("superuser"))
        assert(denied(spark.sql(s"CALL $cat.system.rewrite_zorder('main.t', array('a'))"))
          .contains("superuser"))
      }
      // none of the denied attempts left state behind
      assert(!lake.acl.roles().collect().map(_.getString(0)).contains("sneaky"))
      assert(!lake.acl.users().collect().map(_.getString(0)).contains("mole"))
      assert(lake.acl.grants().count() == 0)
      // the writer's legitimate INSERT did land
      assert(lake.table("main.t").count() == 4)
    } finally spark.sql(s"USE $prev")
  }
}
