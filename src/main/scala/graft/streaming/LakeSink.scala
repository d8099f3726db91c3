package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamingBatch
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.lake.{Lake, LakeTable, LakeWrite, MetadataStore}
import graft.lake.Meta.TagEntry

/** Structured Streaming sink writing micro-batches into a lake table with
  * EXACTLY-ONCE semantics (the write side of the CDF loop —
  * [[ChangeFeedSourceProvider]] is the read side; together they run a
  * streaming ingest/replicate pipeline entirely on the lake format).
  *
  * {{{
  *   df.writeStream.format("graft-lake")
  *     .option("root", "/lake/root").option("table", "main.t")
  *     .option("checkpointLocation", ...)   // also the default txn id
  *     .start()
  * }}}
  *
  * Exactly-once: each committed micro-batch atomically records its batch
  * id in a per-query snapshot tag (`stream_txn:<txnId>`) IN THE SAME
  * snapshot commit as the data files — the Delta `txnVersion` idiom on
  * this metadata store. A batch replayed after a crash-restart sees
  * `batchId <= last` and no-ops, so rows land exactly once no matter
  * where the checkpoint recovery restarts the query. The data write is
  * the normal distributed append (staging parquet + stats job + optimistic
  * commit); Append mode appends, Complete mode atomically replaces the
  * table contents per batch.
  *
  * The target table is auto-created from the first batch's schema when
  * absent; lake-side partitioning/sorting (set_partition / set_sorted_by)
  * applies to streamed writes like any other append.
  *
  * The same format also serves BATCH reads (reference A12 surface):
  * {{{
  *   spark.read.format("graft-lake")
  *     .option("root", root).option("table", "main.t")
  *     .option("versionAsOf", "3")          // or timestampAsOf (epoch ms)
  *     .load()
  * }}}
  * which resolves to the identical DSv2 [[LakeTable]] the catalog serves —
  * same scan tiers, pruning, and runtime filtering — and batch WRITES
  * (`df.write.format("graft-lake").mode(...).save()`, all four save
  * modes, target auto-created from the frame's schema).
  */
class LakeSinkProvider extends StreamSinkProvider with DataSourceRegister
    with TableProvider with CreatableRelationProvider {

  override def shortName(): String = "graft-lake"

  /** option jdbc=<url> (same as the DSv2 catalog): the metadata catalog
    * lives in a shared live database instead of the file log */
  private def storeFor(root: String, jdbc: Option[String]): MetadataStore =
    jdbc match {
      case Some(url) => new graft.lake.JdbcMetadataStore(root, url)
      case None => new MetadataStore(root)
    }

  /** batch `df.write.format("graft-lake")` — Spark routes V1_BATCH_WRITE
    * tables through the V1 save path, which needs this provider. The
    * target table is auto-created from the frame's schema when absent
    * (same contract as the streaming sink). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-lake requires option 'root'"))
    val name = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-lake requires option 'table'"))
    val store = storeFor(root, parameters.get("jdbc"))
    try {
      val lake = new Lake(data.sparkSession, root, Some(store))
      val (sn, tn) = lake.schemaOf(name)
      val exists = lake.store.state()
        .tableAt(sn, tn, lake.store.state().currentSnapshotId).isDefined
      mode match {
        case SaveMode.ErrorIfExists if exists =>
          throw new IllegalStateException(s"table $name already exists")
        case SaveMode.Ignore if exists => ()
        case _ =>
          if (!exists) lake.createTable(name, data.schema)
          lake.append(name, data, overwrite = mode == SaveMode.Overwrite)
      }
    } finally store match {
      case j: graft.lake.JdbcMetadataStore => j.close()
      case _ => ()
    }
    new BaseRelation {
      override def sqlContext: SQLContext = data.sparkSession.sqlContext
      override def schema: StructType = data.schema
    }
  }

  // ---- batch read path: format("graft-lake") → the DSv2 table ----------
  private def load(o: CaseInsensitiveStringMap): Table = {
    val root = Option(o.get("root")).getOrElse(
      throw new IllegalArgumentException("graft-lake requires option 'root'"))
    val name = Option(o.get("table")).getOrElse(
      throw new IllegalArgumentException("graft-lake requires option 'table'"))
    val (sn, tn) = name.split('.') match {
      case Array(s, t) => (s, t)
      case Array(t) => ("main", t)
      case _ => throw new IllegalArgumentException(s"bad table name: $name")
    }
    val store = storeFor(root, Option(o.get("jdbc")))
    val st = store.state()
    // time-travel resolution errors must PROPAGATE with their message (no
    // snapshot at/before the timestamp, version beyond current) — only the
    // table being absent at the CURRENT snapshot may fall back to the
    // placeholder below, so a bad versionAsOf on a batch read fails loudly
    // instead of as a generic "table does not support reads"
    val version = Option(o.get("versionAsOf")).map(_.toLong)
    version.filter(_ > st.currentSnapshotId).foreach(v =>
      throw new IllegalArgumentException(
        s"no snapshot $v (current is ${st.currentSnapshotId})"))
    val snap = version
      .orElse(Option(o.get("timestampAsOf")).map { ts =>
        st.snapshotAtTime(ts.toLong).getOrElse(throw new NoSuchElementException(
          s"no snapshot at or before $ts"))
      })
      .getOrElse(st.currentSnapshotId)
    val timeTravel = snap != st.currentSnapshotId
    if (!timeTravel && st.tableAt(sn, tn, st.currentSnapshotId).isEmpty)
      // writeStream probes the TableProvider BEFORE the sink's first
      // batch auto-creates the table; a capability-less placeholder
      // routes Spark to the V1 StreamSinkProvider fallback (and LakeTable
      // itself never reports STREAMING_WRITE, so existing tables take
      // the same exactly-once sink path)
      new Table {
        override def name(): String = s"$sn.$tn (not created)"
        override def schema(): StructType = new StructType()
        override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
          java.util.Collections.emptySet()
      }
    else new LakeTable(store, sn, tn, snap, st)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    load(options).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    load(new CaseInsensitiveStringMap(properties))

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-lake sink: option 'root' required"))
    val table = p.getOrElse("table",
      throw new IllegalArgumentException("graft-lake sink: option 'table' required"))
    val txnId = p.get("txnid").orElse(p.get("checkpointlocation")).getOrElse(
      throw new IllegalArgumentException(
        "graft-lake sink: 'txnId' or a checkpointLocation required for exactly-once tracking"))
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-lake sink supports Append and Complete output modes, got $outputMode")
    new LakeSink(root, table, txnId, overwrite = outputMode == OutputMode.Complete(),
      jdbc = p.get("jdbc"))
  }
}

class LakeSink(root: String, table: String, txnId: String, overwrite: Boolean,
    jdbc: Option[String] = None)
  extends Sink {

  private def txnKey = s"stream_txn:$txnId"

  // ONE store per sink, shared by every addBatch and the Lake facade, and
  // closed with the query: a JdbcMetadataStore holds a live DB connection,
  // so a per-batch store would leak one connection per micro-batch until
  // the database's limit kills the stream
  private lazy val store: MetadataStore = jdbc match {
    case Some(url) => new graft.lake.JdbcMetadataStore(root, url)
    case None => new MetadataStore(root)
  }

  private[streaming] def close(): Unit = store match {
    case j: graft.lake.JdbcMetadataStore => j.close()
    case _ => ()
  }

  // V1 Sink has no stop hook, so the first addBatch locates the owning
  // query (by sink identity) and registers a self-removing listener that
  // closes the JDBC connection when that query terminates; a query that
  // never runs a batch never opened the lazy store either
  @volatile private var closeHooked = false
  private def hookCloseOnTermination(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (closeHooked || jdbc.isEmpty) return
    synchronized {
      if (closeHooked) return
      StreamingBatch.queryIdOfSink(spark, this).foreach { qid =>
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            if (e.id == qid) {
              close()
              spark.streams.removeListener(this)
            }
        }
        spark.streams.addListener(listener)
        closeHooked = true
      }
    }
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    hookCloseOnTermination(spark)
    val lake = new Lake(spark, root, Some(store))
    val st0 = store.state()
    val (schemaName, tableName) = {
      val parts = table.split('.')
      if (parts.length == 2) (parts(0), parts(1)) else ("main", table)
    }
    val tid = st0.tableAt(schemaName, tableName, st0.currentSnapshotId)
      .map(_.tableId).getOrElse {
        lake.createTable(s"$schemaName.$tableName", data.schema)
        store.state().tableAt(schemaName, tableName, store.state().currentSnapshotId).get.tableId
      }

    // replayed batch after restart: the tag says it already committed
    val last = store.state()
      .tagAt(tid.toString, txnKey, store.state().currentSnapshotId)
      .map(_.toLong).getOrElse(-1L)
    if (batchId <= last) return

    val batchDF = StreamingBatch.asBatch(data)
    LakeWrite.append(spark, store, schemaName, tableName, batchDF,
      overwrite = overwrite,
      extraTags = (st, sid) => {
        // re-check inside the commit: if a concurrent retry of the same
        // query already recorded this batch, abort rather than double-write
        val cur = st.tagAt(tid.toString, txnKey, st.currentSnapshotId)
          .map(_.toLong).getOrElse(-1L)
        if (batchId <= cur) throw new IllegalStateException(
          s"batch $batchId already committed by a concurrent writer of txn $txnId")
        (List(TagEntry(tid.toString, txnKey, batchId.toString, sid, None)),
          List(s"$tid:$txnKey"))
      })
  }

  override def toString: String = s"LakeSink[$table @ $root, txn=$txnId]"
}

/** Streaming MV auto-refresh — the foreachBatch-free continuous version
  * of `refreshMaterializedView`:
  *
  * {{{
  *   spark.readStream.format("graft-changes")
  *     .option("root", root).option("table", "main.src").load()
  *     .writeStream.format("graft-mv-refresh")
  *     .option("root", root).option("view", "main.mv")
  *     .option("checkpointLocation", ...).start()
  * }}}
  *
  * Each micro-batch triggers ONE refresh. The incoming rows are IGNORED:
  * refresh reads the change feed from its own CAS'd `mv_last` watermark,
  * which is already exactly-once — a replayed or racing batch either
  * early-outs (nothing new past the watermark) or aborts at the in-commit
  * watermark re-check, and the swallow below treats that abort as
  * "already applied". The upstream change-feed stream supplies trigger
  * cadence and admission control (maxSnapshots/BytesPerTrigger bound how
  * much source history each refresh folds); under AvailableNow the loop
  * converges because a refresh whose window holds no SOURCE change
  * commits nothing. */
class LakeMvRefreshSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-mv-refresh"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-mv-refresh: option 'root' required"))
    val view = p.getOrElse("view",
      throw new IllegalArgumentException("graft-mv-refresh: option 'view' required"))
    new LakeMvRefreshSink(root, view, p.get("jdbc"))
  }
}

class LakeMvRefreshSink(root: String, view: String, jdbc: Option[String])
  extends Sink {

  private lazy val store: MetadataStore = jdbc match {
    case Some(url) => new graft.lake.JdbcMetadataStore(root, url)
    case None => new MetadataStore(root)
  }

  private[streaming] def close(): Unit = store match {
    case j: graft.lake.JdbcMetadataStore => j.close()
    case _ => ()
  }

  @volatile private var closeHooked = false
  private def hookCloseOnTermination(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (closeHooked || jdbc.isEmpty) return
    synchronized {
      if (closeHooked) return
      StreamingBatch.queryIdOfSink(spark, this).foreach { qid =>
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            if (e.id == qid) {
              close()
              spark.streams.removeListener(this)
            }
        }
        spark.streams.addListener(listener)
        closeHooked = true
      }
    }
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    hookCloseOnTermination(data.sparkSession)
    val lake = new Lake(data.sparkSession, root, Some(store))
    try lake.refreshMaterializedView(view)
    catch {
      // a concurrent refresher (or a replay racing this one) advanced the
      // watermark first — the delta is applied, nothing to redo. Matched by
      // TYPE: message-substring matching broke the moment the text changed
      case _: graft.lake.ConcurrentMvRefreshException => ()
    }
  }

  override def toString: String = s"LakeMvRefreshSink[$view @ $root]"
}
