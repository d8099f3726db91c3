package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Meta
import graft.lake.Meta._
import graft.lake.TypeMap
import org.apache.spark.sql.types._

/** Property-style tests for the snapshot-interval algebra (SURVEY.md §5
  * test plan item 4), run over many seeded random op interleavings:
  * visibility of catalog rows, append-only snapshot log, and the
  * change-feed delta identity (rows visible at s1 minus rows visible at
  * s0 = rows begun in (s0, s1] minus rows ended in (s0, s1]). */
class MetaSpec extends AnyFunSuite {

  private case class Op(add: Boolean, target: Int)

  private def genOps(seed: Int): List[Op] = {
    val rnd = new scala.util.Random(seed)
    List.fill(40)(Op(rnd.nextBoolean(), rnd.nextInt(20)))
  }

  private def applyOps(ops: List[Op]): CatalogState = {
    var st = CatalogState.empty
    var nextFile = 0L
    ops.zipWithIndex.foreach { case (op, i) =>
      val sid = i.toLong
      val delta =
        if (op.add) {
          val fe = DataFileEntry(nextFile, 1L, s"/f$nextFile", s"f$nextFile",
            10, 100, nextFile * 10, 0, explicitRowIds = false, Map.empty, sid, None)
          nextFile += 1
          CommitDelta(Snapshot(sid, sid * 1000, 0, List("op")), newFiles = List(fe))
        } else {
          val live = st.filesAt(1L, sid - 1)
          val victim = if (live.isEmpty) Nil
            else List(live(op.target % live.length).fileId)
          CommitDelta(Snapshot(sid, sid * 1000, 0, List("op")), endedFiles = victim)
        }
      st = Meta.apply(st, delta)
    }
    st
  }

  private val seeds = 1 to 50

  test("visibility: a file is live exactly in [begin, end)") {
    seeds.foreach { seed =>
      val st = applyOps(genOps(seed))
      st.files.foreach { f =>
        (0L to st.currentSnapshotId).foreach { s =>
          val visible = st.filesAt(1L, s).exists(_.fileId == f.fileId)
          val expected = f.begin <= s && f.end.forall(_ > s)
          assert(visible == expected, s"seed $seed file ${f.fileId} at $s")
        }
      }
    }
  }

  test("snapshots are append-only with unique monotone ids and times") {
    seeds.foreach { seed =>
      val st = applyOps(genOps(seed))
      val ids = st.snapshots.map(_.snapshotId)
      assert(ids == ids.sorted && ids.distinct == ids, s"seed $seed")
      val times = st.snapshots.map(_.snapshotTimeMs)
      assert(times == times.sorted, s"seed $seed")
    }
  }

  test("change-feed identity: Δ(visible sets) = begun minus ended in range") {
    seeds.foreach { seed =>
      val st = applyOps(genOps(seed))
      val rnd = new scala.util.Random(seed * 31)
      val last = st.currentSnapshotId
      (1 to 20).foreach { _ =>
        val a = rnd.nextLong(last + 2) - 1
        val b = rnd.nextLong(last + 2) - 1
        val (s0, s1) = if (a <= b) (a, b) else (b, a)
        val at0 = st.filesAt(1L, s0).map(_.fileId).toSet
        val at1 = st.filesAt(1L, s1).map(_.fileId).toSet
        val begun = st.files.filter(f => f.begin > s0 && f.begin <= s1).map(_.fileId).toSet
        val ended = st.files.filter(f => f.end.exists(e => e > s0 && e <= s1)).map(_.fileId).toSet
        // a row that appeared must have begun in range; one that vanished
        // must have ended in range; and the visible set evolves exactly by
        // (∪ begun) minus rows whose interval closed before s1
        assert((at1 -- at0).forall(begun.contains), s"seed $seed [$s0,$s1]")
        assert((at0 -- at1).forall(ended.contains), s"seed $seed [$s0,$s1]")
        assert(at1 == (at0 ++ begun).filter(id =>
          st.files.find(_.fileId == id).exists(f => liveAt(f.begin, f.end, s1))),
          s"seed $seed [$s0,$s1]")
      }
    }
  }

  test("snapshotAtTime returns the latest snapshot at or before ts") {
    seeds.take(10).foreach { seed =>
      val st = applyOps(genOps(seed))
      st.snapshots.foreach { s =>
        assert(st.snapshotAtTime(s.snapshotTimeMs).contains(s.snapshotId))
        assert(st.snapshotAtTime(s.snapshotTimeMs + 1).contains(s.snapshotId))
      }
      assert(st.snapshotAtTime(-1L).isEmpty)
    }
  }

  test("TypeMap round-trips the common Spark types through DuckLake names") {
    val types = Seq(BooleanType, ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, StringType, BinaryType, DateType,
      TimestampNTZType, TimestampType)
    types.foreach { t =>
      val duck = TypeMap.sparkToDuck(t)
      assert(TypeMap.duckToSpark.contains(duck), s"no reverse mapping for $duck ($t)")
      assert(TypeMap.duckToSpark(duck) == t, s"round trip $t -> $duck -> ${TypeMap.duckToSpark(duck)}")
    }
    // widenings documented in SURVEY.md §1.2
    assert(TypeMap.duckToSpark("uint64") == DecimalType(20, 0))
    assert(TypeMap.duckToSpark("hugeint") == DecimalType(38, 0))
    assert(TypeMap.sparkToDuck(ArrayType(IntegerType)) == "int32[]")
    // geometry (docs/data_types.md): WKB bytes in Spark, distinct in catalog
    assert(TypeMap.duckToSpark("geometry") == BinaryType)
    assert(graft.lake.LakeRead.sparkType("geometry") == BinaryType)
  }

  test("typePromotes normalizes the integer alias and treats respells as no-ops (ADVICE r16)") {
    // alias respells are no-op promotions, not rejections
    assert(Meta.typePromotes("int", "integer"))
    assert(Meta.typePromotes("integer", "int"))
    // the alias behaves like int on EVERY arm, including int->double
    assert(Meta.typePromotes("integer", "bigint"))
    assert(Meta.typePromotes("integer", "double"))
    assert(Meta.typePromotes("smallint", "integer"))
    // narrowing through the alias still rejected
    assert(!Meta.typePromotes("bigint", "integer"))
    assert(!Meta.typePromotes("integer", "smallint"))
    // non-promotions stay rejected
    assert(!Meta.typePromotes("bigint", "double"))
    assert(!Meta.typePromotes("int", "float"))
    assert(!Meta.typePromotes("int", "varchar"))
  }
}
