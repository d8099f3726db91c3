package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The `bucket` V2 function behind the `bucket[N]` partition transform,
  * served through [[LakeCatalog]]'s FunctionCatalog: Spark's
  * storage-partitioned-join planner resolves a reported
  * `bucket(n, col)` transform against the table catalog's function of
  * that name — without it the KeyGroupedPartitioning silently degrades
  * to unknown and a co-bucketed join falls back to full shuffles.
  *
  * The bound function computes EXACTLY the writer's recorded value
  * (`pmod(murmur3_seed42(col), n)`, [[LakeWrite.transformCol]]), so if
  * the planner ever evaluates it (partially-clustered distributions,
  * one-side repartitioning) the results agree with the per-file
  * metadata. */
object LakeBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col), n) — the lake's hidden-partition hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.catalogString}")
    val valueType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.lake.bucket(${valueType.sql})"
      override def isDeterministic: Boolean = true
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, valueType)
        val h = Murmur3HashFunction.hash(v, valueType, 42).toInt
        Integer.valueOf(((h % n) + n) % n)
      }
    }
  }
}
