package graft

import org.scalatest.funsuite.AnyFunSuite

/** The entry-drift gate (VERDICT r14 #1b): the r14 sweep ran ~1.6x slower
  * suite-wide with a FLAT compute sentinel — a pure-CPU sentinel cannot see
  * ambient I/O/page-cache state. The gate compares per-entry medians
  * against the previous committed artifact and stamps the note when the
  * movement is one-directional and broad.
  */
class BenchGateSpec extends AnyFunSuite {

  private def entries(n: Int, base: Double): Map[String, Double] =
    (1 to n).map(i => f"e$i%02d" -> (base + i * 0.01)).toMap

  test("synthetic 1.5x suite-wide slowdown fires the gate") {
    val prev = entries(40, 0.5)
    val cur = prev.map { case (k, v) => k -> v * 1.5 }
    val (n, up, down, med, note) = BenchGate.entryDrift(prev, cur)
    assert(n == 40 && up == 40 && down == 0)
    assert(math.abs(med - 50.0) < 1.0)
    assert(note.exists(_.contains("slower")))
  }

  test("suite-wide speedup fires in the other direction") {
    val prev = entries(40, 0.5)
    val cur = prev.map { case (k, v) => k -> v * 0.5 }
    val (_, up, down, _, note) = BenchGate.entryDrift(prev, cur)
    assert(up == 0 && down == 40)
    assert(note.exists(_.contains("faster")))
  }

  test("flat sweep with a few genuine per-entry changes stays quiet") {
    val prev = entries(40, 0.5)
    // 4 entries legitimately changed shape (10% < the 20% fraction) — the
    // normal round-over-round pattern when specific operators were worked on
    val cur = prev.map { case (k, v) =>
      k -> (if (Set("e01", "e02", "e03", "e04")(k)) v * 2.0 else v * 1.05)
    }
    val (n, up, _, _, note) = BenchGate.entryDrift(prev, cur)
    assert(n == 40 && up == 4)
    assert(note.isEmpty)
  }

  test("sub-50ms planning-floor entries are excluded from the comparison") {
    val prev = entries(20, 0.5) ++ (1 to 20).map(i => f"tiny$i%02d" -> 0.004).toMap
    // the tiny entries triple (planning jitter) while the real ones are flat
    val cur = prev.map { case (k, v) =>
      k -> (if (k.startsWith("tiny")) v * 3 else v)
    }
    val (n, up, _, _, note) = BenchGate.entryDrift(prev, cur)
    assert(n == 20 && up == 0 && note.isEmpty)
  }

  test("no previous artifact or too few comparable entries never fires") {
    assert(BenchGate.entryDrift(Map.empty, entries(40, 0.5))._5.isEmpty)
    val prev = entries(5, 0.5)
    val cur = prev.map { case (k, v) => k -> v * 2 }
    assert(BenchGate.entryDrift(prev, cur)._5.isEmpty) // below minEntries
  }
}
