package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.mutable

/** Bridge into Spark's own DataSource-V2 parquet machinery, so lake scans
  * with no merge-on-read overlay run on the EXACT code path a plain
  * `spark.read.parquet` uses — vectorized columnar reader, whole-stage
  * codegen above it, parquet filter pushdown, file-split planning — with
  * zero per-row conversion tax.
  *
  * The file list, sizes, and schema come from lake metadata, so the scan
  * performs NO filesystem listing at all (the listing cost a plain parquet
  * read pays at planning time); snapshot/stats/partition pruning happened
  * before this is built.
  */
object NativeParquet {

  /** columnar DSv2 Scan over an explicit (path, sizeBytes) parquet file
    * list. `dataSchema` = full table schema, `readSchema` = pruned columns
    * Spark asked for, `filters` = pushed predicates (forwarded to parquet
    * row-group/page skipping; Spark re-applies them on rows above). */
  def parquetScan(
      spark: SparkSession,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readSchema: StructType,
      filters: Array[Filter]): Scan = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    ParquetScan(
      classic,
      classic.sessionState.newHadoopConf(),
      new MetadataFileIndex(classic, files),
      dataSchema,
      readSchema,
      StructType(Nil), // no hive-style partition columns: values live in-file
      filters,
      CaseInsensitiveStringMap.empty())
  }
}

/** A [[PartitioningAwareFileIndex]] backed entirely by catalog metadata:
  * the file set and sizes are known exactly, so listing/refresh are no-ops
  * (lake files are immutable; a new snapshot builds a new index). */
class MetadataFileIndex(
    spark: ClassicSparkSession,
    files: Seq[(String, Long)])
  extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  // qualify (file:/…) exactly like Spark's own listing does — rootPaths are
  // qualified before the leafDirToChildrenFiles lookup, so unqualified keys
  // would silently list nothing
  private val statuses: Seq[FileStatus] = {
    val hc = spark.sessionState.newHadoopConf()
    files.map { case (p, size) =>
      val raw = new Path(p)
      val q = raw.getFileSystem(hc).makeQualified(raw)
      new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, q)
    }
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
    mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

  override def rootPaths: Seq[Path] =
    statuses.map(_.getPath.getParent).distinct

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2).sum
}
