package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.B low-priority row; DuckDB `ASOF JOIN`
  * semantics — for every left row, the single right row with the greatest
  * right-time <= left-time within the same key group; left rows with no
  * prior right row keep NULLs, like `ASOF LEFT JOIN`).
  *
  * Plan shape — built for 100 TB, not translated from a range join:
  * both sides are unioned and ONE window pass (partitioned by key, ordered
  * by time, right rows sorting before left rows on ties) carries the most
  * recent right payload forward as a single struct. That is exactly one
  * keyed shuffle + sort — the same weight as any per-key window the query
  * would need anyway — instead of the O(|left| x |right-per-key|)
  * intermediate a naive `l.join(r, l.t >= r.t)` range join materializes
  * before its argmax. The right payload travels as one struct column, so
  * all right columns are guaranteed to come from the SAME matched row.
  */
object AsofJoin {

  /** Backward as-of left join.
    *
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param rightPrefix prefix for right payload columns in the output
    *                    (avoids collisions; rightTime surfaces as
    *                    `rightPrefix + rightTime`)
    * @param strict    true = match strictly-earlier right rows only
    *                  (`left.t > right.t`); false = inclusive (`>=`)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      strict: Boolean = false): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val lNorm = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(right.schema(rightTime).dataType).as("_rt"),
          lit(null).cast(org.apache.spark.sql.types.StructType(
            right.schema.fields.filter(f => rPayload.contains(f.name)))).as("_r")) ++
        lPayload.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          col(rightTime).as("_rt"),
          struct(rPayload.map(col): _*).as("_r")) ++
        lPayload.map(c => lit(null).cast(lTypes(c)).as(c)): _*)

    // ties: inclusive (>=) wants same-instant right rows visible to left
    // rows, so right (_side 0) sorts first; strict (>) flips the tie order
    val tie = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("_t").as(leftTime)) ++
          lPayload.filterNot(_ == leftTime).map(col) ++
          rPayload.map(c => col(s"_r.$c").as(rightPrefix + c)): _*)
  }

  /** Forward as-of left join: earliest right row at-or-after the left time
    * (mirror of [[backward]]; DuckDB `ASOF JOIN ... ON l.t <= r.t`). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      strict: Boolean = false): DataFrame = {
    // reuse backward over negated micros? cleaner: same union with a
    // descending time order — implemented directly to keep types intact
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val lNorm = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(org.apache.spark.sql.types.StructType(
            right.schema.fields.filter(f => rPayload.contains(f.name)))).as("_r")) ++
        lPayload.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          struct(rPayload.map(col): _*).as("_r")) ++
        lPayload.map(c => lit(null).cast(lTypes(c)).as(c)): _*)

    val tie = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("_t").as(leftTime)) ++
          lPayload.filterNot(_ == leftTime).map(col) ++
          rPayload.map(c => col(s"_r.$c").as(rightPrefix + c)): _*)
  }
}
