package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** LSH bucket-cap gate that COUNTS what it drops into Spark accumulators.
  *
  * Why not (only) `observe()`: `CollectMetricsExec` metrics come back empty
  * from `QueryExecution.observedMetrics` when AQE re-plans the query (the
  * r5 caveat that forced the cap-metric tests to pin AQE off) — so a
  * production 100 TB run with AQE on had no dropped-bucket signal.
  * Accumulators are collected by the task scheduler, not the plan, so they
  * survive any re-plan. Task retries can over-count — the standard
  * accumulator-in-transformation caveat, acceptable for monitoring
  * counters (Spark's own SQL metrics carry the same one).
  *
  * `eval` returns `size <= cap` (the keep-predicate) and, when false, adds
  * 1 bucket / `size` members to the registered counters. Runs post-shuffle
  * on O(buckets) rows, so CodegenFallback costs nothing measurable.
  * Deterministic=false keeps the optimizer from re-ordering, merging or
  * double-evaluating the counting predicate.
  */
case class BucketCapGate(child: Expression, cap: Int,
    capped: LongAccumulator, dropped: LongAccumulator)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_cap_gate"
  override def eval(input: InternalRow): Any = {
    val sz = child.eval(input).asInstanceOf[Int]
    if (sz > cap) { capped.add(1L); dropped.add(sz.toLong); false }
    else true
  }
  override protected def withNewChildInternal(newChild: Expression): BucketCapGate =
    copy(child = newChild)
}

/** Driver-side registry of named (capped_buckets, dropped_members)
  * accumulator pairs — one pair per metric name (t11, v03/knnLsh, v04),
  * get-or-create so repeated query builds share the same counters. */
object CapMetrics {
  private val regs =
    new java.util.concurrent.ConcurrentHashMap[String, (LongAccumulator, LongAccumulator)]()

  /** the (capped, dropped) pair for `name`, registered on first use */
  def forName(spark: SparkSession, name: String): (LongAccumulator, LongAccumulator) =
    regs.computeIfAbsent(name, _ => (
      spark.sparkContext.longAccumulator(s"$name.capped_buckets"),
      spark.sparkContext.longAccumulator(s"$name.dropped_members")))

  /** current (capped_buckets, dropped_members) values for `name` */
  def value(name: String): (Long, Long) =
    Option(regs.get(name)).map(p => (p._1.value.longValue, p._2.value.longValue))
      .getOrElse((0L, 0L))

  /** zero the counters (test isolation) */
  def reset(name: String): Unit =
    Option(regs.get(name)).foreach { p => p._1.reset(); p._2.reset() }
}
