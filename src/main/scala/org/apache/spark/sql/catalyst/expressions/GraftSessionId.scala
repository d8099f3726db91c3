package org.apache.spark.sql.catalyst.expressions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** `graft_session(tsSeconds, gapSeconds)` — fused sessionization window
  * function: the 1-based session ordinal of each row within its window
  * partition, where a new session starts when the gap to the previous
  * row's timestamp EXCEEDS `gapSeconds` (strict `>`, matching the common
  * `lag`+conditional-sum SQL idiom).
  *
  * The classic two-step shape — `lag(ts)` (offset frame) followed by a
  * running `sum(new_session)` (running frame) — plans as TWO Window
  * operators over one sort, because Spark groups window expressions by
  * frame. This single running-frame aggregate carries (prev_ts,
  * session_id) in its buffer and does the gap test inside the one pass —
  * the second in-memory pass over every sorted partition disappears
  * (VERDICT r13 #5, q27).
  *
  * Buffer order matters: `sid` updates FIRST so it reads the PREVIOUS
  * row's `prevTs` before the second slot overwrites it (the update
  * projection assigns into the shared buffer sequentially — same trick as
  * Spark's RankLike ordering).
  */
case class GraftSessionId(ts: Expression, gap: Expression)
  extends AggregateWindowFunction with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  override def left: Expression = ts
  override def right: Expression = gap
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_session"

  private lazy val sid = AttributeReference("sid", LongType, nullable = false)()
  private lazy val prevTs = AttributeReference("prevTs", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sid, prevTs)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(null, LongType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    // reads the OLD prevTs (assigned after sid in buffer order): first row
    // of a partition (prevTs NULL) and any strict gap breach open a session
    sid + If(IsNull(prevTs) || GreaterThan(Subtract(ts, prevTs), gap),
      Literal(1L), Literal(0L)),
    ts)
  override lazy val evaluateExpression: Expression = sid

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftSessionId =
    copy(ts = newLeft, gap = newRight)
}
