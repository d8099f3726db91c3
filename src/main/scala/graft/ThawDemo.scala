package graft

import org.apache.spark.sql.SparkSession
import graft.lake.Lake

/** Thaw driver for the cross-engine interop check: import a `ducklake_*`
  * parquet catalog (e.g. one COPY'd out of a real DuckDB instance by
  * `scripts/thaw_check.py`) into a fresh lake and print each live table's
  * row count and first rows — proof the import round-trips through a
  * foreign engine's materialization of the catalog.
  * Usage: runMain graft.ThawDemo <catalogParquetDir> */
object ThawDemo {
  def main(args: Array[String]): Unit = {
    val catalogDir = args(0)
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_thawdemo").toString
    val lake = new Lake(spark, root)
    val sid = lake.importCatalog(catalogDir)
    val st = lake.store.state()
    st.tables.filter(t => graft.lake.Meta.liveAt(t.begin, t.end, sid))
      .foreach { t =>
        val name = s"${t.schemaName}.${t.tableName}"
        val df = lake.table(name)
        println(s"[thaw-demo] $name rows=${df.count()} snapshot=$sid")
        df.orderBy(df.columns.head).show(3, truncate = false)
      }
    // preserved foreign view/macro rows (thaw_check.py --add-view): prove
    // the import kept them and a re-freeze re-emits the dataset
    val preserved = st.tags.filter(_.scope.startsWith("ducklake:"))
    if (preserved.nonEmpty) {
      println(s"[thaw-demo] preserved foreign rows: " +
        preserved.groupBy(_.scope).view.mapValues(_.size).toMap)
      val refrozen = java.nio.file.Files.createTempDirectory("graft_refreeze").toString
      lake.freeze(refrozen)
      preserved.map(_.scope.stripPrefix("ducklake:")).distinct.foreach { tn =>
        val re = spark.read.parquet(s"$refrozen/catalog_parquet/$tn.parquet")
        println(s"[thaw-demo] re-frozen $tn rows=${re.count()}")
        re.show(5, truncate = false)
      }
    }
    spark.stop()
  }
}
