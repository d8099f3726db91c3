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
}
