package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator surface:
  *   - graft.queries.Relational    — the delegated SQL surface (SURVEY.md §2.B)
  *   - graft.queries.TextOps       — dedup / text-analysis pipeline ops
  *   - graft.queries.VectorOps     — embedding similarity search ops
  *   - graft.queries.MultimodalOps — binary-payload media pipeline ops
  *   - graft.queries.LakeQueries   — DuckLake lakehouse ops over graft.lake
  *     (SURVEY.md §2.A: catalog, write path, DML, time travel, change feed,
  *     partitioning, sorting, compaction, inlining, options, freeze)
  *   - graft.queries.StreamOps     — change feed as a Structured Streaming
  *     micro-batch source (graft.streaming)
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.MultimodalOps.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.TextOps.oracleSql ++
      graft.queries.VectorOps.oracleSql ++
      graft.queries.MultimodalOps.oracleSql ++
      graft.queries.LakeQueries.oracleSql ++
      graft.queries.StreamOps.oracleSql
}
