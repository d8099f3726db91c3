package org.apache.spark.sql.graft

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the pushed-filter rename translation (r16, ADVICE): a
  * dropped AND side WEAKENS a filter — fine as a row-group skipping hint
  * at the top level, but Not(weakened) is STRONGER than the original
  * (¬(a∧b) = ¬a∨¬b vs the produced ¬a) and would wrongly skip row groups
  * holding ¬b∧a rows. Exactness must flow through the fold and Not must
  * refuse to negate anything weakened. */
class RenameFilterSpec extends AnyFunSuite {
  private val m = Map("new_k" -> "old_k")

  test("leaves and boolean structure translate exactly") {
    assert(NativeParquet.renameFilter(EqualTo("new_k", 1), m)
      .contains(EqualTo("old_k", 1)))
    assert(NativeParquet.renameFilter(
      And(GreaterThan("new_k", 1), LessThan("other", 5)), m)
      .contains(And(GreaterThan("old_k", 1), LessThan("other", 5))))
    assert(NativeParquet.renameFilter(Not(In("new_k", Array(1, 2))), m)
      .contains(Not(In("old_k", Array(1, 2)))))
  }

  test("AND with an untranslatable side weakens to the surviving side") {
    val f = And(EqualTo("new_k", 1), AlwaysTrue)
    assert(NativeParquet.renameFilter(f, m).contains(EqualTo("old_k", 1)))
  }

  test("Not over a weakened AND is dropped, never negated") {
    // old behavior produced Not(EqualTo(old_k,1)), which is STRONGER than
    // ¬(k=1 ∧ <unknown>) and would wrongly skip row groups
    val f = Not(And(EqualTo("new_k", 1), AlwaysTrue))
    assert(NativeParquet.renameFilter(f, m).isEmpty)
  }

  test("Not over an exact nested structure still negates") {
    val f = Not(Or(EqualTo("new_k", 1), IsNull("new_k")))
    assert(NativeParquet.renameFilter(f, m)
      .contains(Not(Or(EqualTo("old_k", 1), IsNull("old_k")))))
  }

  test("Not over a weakened side nested under AND keeps only the exact side") {
    val f = And(Not(And(EqualTo("new_k", 1), AlwaysTrue)), IsNotNull("new_k"))
    assert(NativeParquet.renameFilter(f, m).contains(IsNotNull("old_k")))
  }
}
