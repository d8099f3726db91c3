package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side parquet writer for SMALL driver-resident datasets (the
  * `ducklake_*` catalog dumps): one file, zero Spark jobs.
  *
  * `Lake.freeze` emits ~17 tiny metadata datasets whose rows are already
  * materialized on the driver; writing each through
  * `spark.createDataFrame(...).coalesce(1).write.parquet(...)` costs a full
  * job submission + task round-trip apiece, which dominates freeze/thaw
  * wall-clock (the r11 bench's slowest entries l36/l38 are freeze+import
  * sequences). This writes the same bytes through Spark's own
  * `ParquetWriteSupport` (identical schema conversion and value encoding to
  * the executor write path) directly on the driver, preserving the
  * directory-with-part-file layout `DataFrameWriter` produces so every
  * consumer (Spark reads, DuckDB's read_parquet glob in thaw_check.py,
  * HTTP-mounted catalogs) sees an unchanged format. */
object DriverParquet {

  private class Builder(path: Path, conf: Configuration)
    extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Write `rows` as `<dir>/part-00000.parquet` (+ `_SUCCESS`), mirroring a
    * coalesce(1) DataFrame write. Overwrites an existing dir. */
  def write(dir: String, schema: StructType, rows: Seq[Row],
      hconf: Configuration): Unit = {
    // a MINIMAL conf: the session Hadoop conf carries spark.* entries that
    // ParquetWriter.Builder trips over; the write support needs only the
    // schema plus these explicitly-defaulted SQLConf keys
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    // read unconditionally by SparkToParquetSchemaConverter (no variant
    // columns in these schemas, but the key must parse as a boolean)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val file = new Path(dirPath, "part-00000.parquet")
    val writer = new Builder(file, conf)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      rows.foreach(r => writer.write(toCatalyst(r).asInstanceOf[InternalRow]))
    } finally writer.close()
    fs.create(new Path(dirPath, "_SUCCESS"), true).close()
  }
}
