package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}

/** Bridge to `private[sql] internalCreateDataFrame`: DataFrames returned by
  * a v1 streaming `Source.getBatch` must report `isStreaming=true`, but the
  * change-feed batch is an arbitrary composed (batch) plan. Re-basing the
  * plan onto its executed RDD with the streaming flag set is the same
  * pattern Spark's built-in Kafka source uses for its batches — the plan
  * stays distributed (toRdd is lazy; no driver materialization).
  */
object StreamingBatch {
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The reverse bridge for streaming SINKS: inside `Sink.addBatch` the
    * incoming DataFrame is flagged streaming (calling `.write` on it
    * throws), but its physical plan IS one finite micro-batch — re-wrap
    * the executed RDD as a plain batch DataFrame so the normal lake append
    * path (staging write, stats job, snapshot commit) can consume it. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Bridge to the `private[sql]` StreamingQueryWrapper: find the active
    * streaming query whose sink is `sink` (by identity). V1 `Sink` has no
    * stop hook, so a sink holding a resource (the JDBC-cataloged lake's DB
    * connection) needs its owning query's id to close on termination via a
    * StreamingQueryListener. */
  def queryIdOfSink(spark: org.apache.spark.sql.SparkSession,
      sink: AnyRef): Option[java.util.UUID] =
    spark.streams.active.collectFirst {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
          if w.streamingQuery.sink eq sink => w.id
    }

  /** Bridge to `private[sql] Dataset.ofRows`: rehydrate an already-resolved
    * logical plan (e.g. a MERGE source captured at analysis time) as a
    * DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[ClassicSparkSession], plan)
}
