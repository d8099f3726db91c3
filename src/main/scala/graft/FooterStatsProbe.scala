package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off fidelity probe for parquet-footer statistics vs the Spark
  * stats-aggregation job they would replace (guide §6: don't re-read what
  * the writer already summarized). Writes edge-case data with the SAME
  * writer the lake uses, then prints footer min/max/nullCount/rowCount
  * next to the current `min(col).cast(string)` job's answers.
  *
  * Cases probed: long strings (64 B+ — parquet-mr truncates statistics at
  * parquet.statistics.truncate.length), >4 KB strings (stats dropped),
  * NaN doubles, negative/positive doubles, decimals (plain vs scientific
  * rendering), timestamps (micros, UTC rendering), dates, booleans,
  * all-null columns, empty strings, non-ASCII strings.
  */
object FooterStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_fsp").toString
    val longStr = "z" * 100
    val hugeStr = "h" * 5000
    val df = Seq(
      (1L, "alpha", 1.5, BigDecimal("1.50"), java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
        java.sql.Date.valueOf("2020-01-01"), true, Option.empty[Long], "", longStr, hugeStr),
      (2L, "béta", Double.NaN, BigDecimal("0.0000001"), java.sql.Timestamp.valueOf("2021-06-15 12:34:56.789"),
        java.sql.Date.valueOf("2021-06-15"), false, Option.empty[Long], "x", longStr + "tail", hugeStr + "t"),
      (3L, "Ωmega", -2.5e10, BigDecimal("12345.67"), java.sql.Timestamp.valueOf("1969-12-31 23:59:59"),
        java.sql.Date.valueOf("1969-12-31"), true, Option.empty[Long], "yy", "short", "small")
    ).toDF("id", "s", "d", "dec", "ts", "dt", "b", "alln", "es", "longs", "huges")
      .withColumn("dec", col("dec").cast("decimal(12,7)"))
      .withColumn("bigdec", (col("dec") * lit(1e12)).cast("decimal(38,0)"))
      .withColumn("middec", col("dec").cast("decimal(22,7)"))
      .withColumn("f", col("d").cast("float"))
      .withColumn("zz", when(col("id") === 1, lit(-0.0)).otherwise(lit(0.0)))
      .withColumn("sm", col("id").cast("smallint"))
      .withColumn("ti", col("id").cast("tinyint"))
    df.coalesce(1).write.mode("overwrite").parquet(dir)

    // the Spark stats job as LakeWrite runs it
    val cols = df.schema.fields.map(_.name)
    val aggs = Seq(count(lit(1)).as("_cnt")) ++ cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"))
    }
    val row = spark.read.parquet(dir).agg(aggs.head, aggs.tail: _*).collect().head
    println("== Spark stats job ==")
    cols.foreach { c =>
      println(s"  $c: min=${row.getAs[String](s"_min_$c")} max=${row.getAs[String](s"_max_$c")} nulls=${row.getAs[Long](s"_nulls_$c")}")
    }

    // the footer
    println("== Parquet footer ==")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, part, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val blocks = footer.getBlocks
    println(s"  rowGroups=${blocks.size()} rows=${blocks.stream().mapToLong(_.getRowCount).sum()}")
    blocks.forEach { b =>
      b.getColumns.forEach { cc =>
        val st = cc.getStatistics
        val pd = cc.getPrimitiveType
        val render = (v: Any) => v match {
          case bin: org.apache.parquet.io.api.Binary =>
            "B\"" + new String(bin.getBytes.take(80), "UTF-8") + s""""(len=${bin.getBytes.length})"""
          case x => String.valueOf(x)
        }
        if (st == null) println(s"  ${cc.getPath}: NO STATS")
        else println(s"  ${cc.getPath} [${pd}]: " +
          s"hasNonNull=${st.hasNonNullValue} nulls=${if (st.isNumNullsSet) st.getNumNulls else "UNSET"} " +
          s"min=${if (st.hasNonNullValue) render(st.genericGetMin) else "-"} " +
          s"max=${if (st.hasNonNullValue) render(st.genericGetMax) else "-"}")
      }
    }
    spark.stop()
  }
}
