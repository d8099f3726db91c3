package graft
import org.apache.spark.sql.SparkSession
import graft.lake._
import graft.lake.Meta.{PartitionKey, SortKey}

/** throwaway diagnostic: task shape of the v3 fixture build's compaction */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = new Lake(spark, java.nio.file.Files.createTempDirectory("graft_cprobe").toString)
    val df = graft.queries.Tables.load(spark, "/root/testdata/sf0.1", "orders")
    lake.createTable("main.t", df.schema,
      partitionKeys = List(PartitionKey(BucketTransform(32), "o_orderkey")),
      sortKeys = List(SortKey("o_orderkey", ascending = true, nullsFirst = true)))
    lake.setOption("target_file_size", "1GB", Some("main.t"))
    val (sn, tn) = lake.schemaOf("main.t")
    (0 until 3).foreach { c =>
      LakeWrite.append(spark, lake.store, sn, tn,
        df.filter(org.apache.spark.sql.functions.expr(s"o_orderkey % 3 = $c")),
        sorted = true)
    }
    val st = lake.store.state()
    val tid = st.tableAt(sn, tn, st.currentSnapshotId).get.tableId
    val files = st.filesAt(tid, st.currentSnapshotId)
    println(s"== after appends: ${files.size} files; partitionValues sample: " +
      files.take(3).map(_.partitionValues).mkString(" | "))
    println(s"== distinct partitionValue keys: ${files.map(_.partitionValues).distinct.size}")
    @volatile var maxTasks = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        println(s"== stage ${sc.stageInfo.stageId}: ${sc.stageInfo.numTasks} tasks, ${sc.stageInfo.name.take(60)}")
        maxTasks = math.max(maxTasks, sc.stageInfo.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(l)
    lake.mergeAdjacentFiles("main.t")
    Thread.sleep(1000)
    val files2 = lake.store.state().filesAt(tid, lake.store.state().currentSnapshotId)
    println(s"== after compaction: ${files2.size} files, stamps: ${files2.count(_.sortedBy.isDefined)} stamped")
  }
}
