package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Step profiler for the lakehouse op-sequence entries (guide §1: measure
  * first). Replays an entry's operator sequence with per-step wall time and
  * per-step Spark job/task counts, so optimization targets the step that is
  * actually expensive (driver metadata work shows up as wall time with zero
  * jobs; a redundant data pass shows up as an extra job).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.OpProfile l57"
  */
object OpProfile {
  private val jobs = new AtomicLong
  private val tasks = new AtomicLong
  private var sparkRef: SparkSession = _

  private def step[T](name: String)(body: => T): T = {
    // listener events are async; a short settle keeps step attribution honest
    Thread.sleep(80)
    val j0 = jobs.get(); val t0 = tasks.get(); val w0 = System.nanoTime()
    val r = body
    val ms = (System.nanoTime() - w0) / 1e6
    Thread.sleep(80)
    println(f"[step] $name%-42s $ms%9.1f ms  jobs=${jobs.get() - j0}%-3d tasks=${tasks.get() - t0}%-5d")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("l57")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.queries.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    sparkRef = spark
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("GRAFT_MV_EXPLAIN").contains("1"))
      spark.conf.set("spark.graft.mv.explainRefresh", "true")
    if (sys.env.get("GRAFT_PROFILE_ACTIONS").contains("1"))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          val head = qe.optimizedPlan.toString.linesIterator.take(2).mkString(" ~ ").take(150)
          println(f"    [action] $funcName%-18s ${durationNs / 1e6}%8.1f ms  $head")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.get("GRAFT_PROFILE_JOBS").contains("1")) {
          val names = j.stageInfos.map(_.name).distinct.mkString(" | ")
          println(s"    [job ${j.jobId}] $names")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    def run(): Unit = which match {
      case "l57" => profileL57(spark, sfDir)
      case "l59" => profileL59(spark, sfDir)
      case "l60" => profileL60(spark, sfDir)
      case other =>
        // generic: run any declared entry once, whole-entry counts
        step(other)(SparkEntry.queries(other)(spark, sfDir).count())
    }
    println(s"== warmup pass ==")
    run()
    println(s"== timed pass ==")
    run()
    spark.stop()
  }

  private def t(s: SparkSession, dir: String, n: String) =
    graft.queries.Tables.load(s, dir, n)

  private def profileL57(s: SparkSession, dir: String): Unit = {
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_opprof")
    val lake = new graft.lake.Lake(s, dirTmp.toString)
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
    step("createTableAs mvo (even half)")(
      lake.createTableAs("main.mvo", orders.filter(col("o_orderkey") % 2 === 0)))
    step("createMaterializedView")(
      lake.createMaterializedView("main.mv", "main.mvo",
        groupCols = Seq("o_orderpriority"), sumCols = Seq("o_custkey"),
        minMaxCols = Seq("o_orderkey")))
    step("append odd half")(
      lake.append("main.mvo", orders.filter(col("o_orderkey") % 2 === 1)))
    step("delete slice")(lake.delete("main.mvo",
      col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 3))
    step("update move-groups")(lake.update("main.mvo", col("o_orderkey") % 7 === 0,
      Map("o_orderpriority" -> lit("9-MOVED"))))
    step("refresh #1 (delta)")(lake.refreshMaterializedView("main.mv"))
    step("refresh #2 (no-op)")(lake.refreshMaterializedView("main.mv"))
    step("final read")(lake.table("main.mv").orderBy(col("o_orderpriority")).count())
    step("cleanup")(graft.lake.LakeWrite.deleteRecursively(dirTmp.toString))
  }

  private def profileL59(s: SparkSession, dir: String): Unit = {
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_opprof")
    val lake = new graft.lake.Lake(s, dirTmp.toString)
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    step("createTableAs fact")(
      lake.createTableAs("main.fact", orders.filter(col("o_orderkey") % 2 === 0)))
    step("createTableAs dim")(lake.createTableAs("main.dim", cust))
    step("createMaterializedView (join)")(
      lake.createMaterializedView("main.mv", "main.fact",
        groupCols = Seq("c_mktsegment"), sumCols = Seq("o_custkey"),
        minMaxCols = Seq("o_orderkey"),
        dimTable = Some("main.dim"),
        dimKeys = Seq(("o_custkey", "c_custkey"))))
    step("append fact odd half")(
      lake.append("main.fact", orders.filter(col("o_orderkey") % 2 === 1)))
    step("refresh #1 (fact delta)")(lake.refreshMaterializedView("main.mv"))
    step("update fact (key-moving)")(lake.update("main.fact",
      col("o_orderkey") % 13 === 0, Map("o_custkey" -> lit(1L))))
    step("delete fact slice")(lake.delete("main.fact",
      col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 3))
    step("refresh #2 (upd+del delta)")(lake.refreshMaterializedView("main.mv"))
    step("update dim")(lake.update("main.dim", col("c_custkey") % 5 === 0,
      Map("c_mktsegment" -> lit("9-DIMMOVED"))))
    step("refresh #3 (dim delta)")(lake.refreshMaterializedView("main.mv"))
    step("final read")(lake.table("main.mv").orderBy(col("c_mktsegment")).count())
    step("cleanup")(graft.lake.LakeWrite.deleteRecursively(dirTmp.toString))
  }

  private def profileL60(s: SparkSession, dir: String): Unit = {
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_opprof")
    val lake = new graft.lake.Lake(s, dirTmp.toString)
    val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    step("createTableAs fact")(
      lake.createTableAs("main.fact", orders.filter(col("o_orderkey") % 2 === 0)))
    step("createTableAs d1")(lake.createTableAs("main.d1", t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))))
    step("createTableAs d2")(lake.createTableAs("main.d2", t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))))
    step("createMaterializedView (2-dim)")(
      lake.createMaterializedView("main.mv", "main.fact",
        groupCols = Seq("n_name"), sumCols = Seq("o_orderkey"),
        dims = Seq(("main.d1", Seq(("o_custkey", "c_custkey"))),
          ("main.d2", Seq(("c_nationkey", "n_nationkey"))))))
    step("append fact odd half")(
      lake.append("main.fact", orders.filter(col("o_orderkey") % 2 === 1)))
    step("refresh #1 (fact delta)")(lake.refreshMaterializedView("main.mv"))
    step("update fact")(lake.update("main.fact", col("o_orderkey") % 11 === 0,
      Map("o_custkey" -> lit(1L))))
    step("update d1")(lake.update("main.d1", col("c_custkey") % 7 === 0,
      Map("c_nationkey" -> ((col("c_nationkey") + 1) % 25))))
    step("update d2")(lake.update("main.d2", col("n_nationkey") % 5 === 0,
      Map("n_name" -> concat(lit("X-"), col("n_name")))))
    step("refresh #2 (all-3 delta)")(lake.refreshMaterializedView("main.mv"))
    step("update d2 again")(lake.update("main.d2", col("n_nationkey") % 3 === 1,
      Map("n_name" -> concat(lit("Y-"), col("n_name")))))
    step("refresh #3 (outer-dim delta)")(lake.refreshMaterializedView("main.mv"))
    step("final read")(lake.table("main.mv").orderBy(col("n_name")).count())
    step("cleanup")(graft.lake.LakeWrite.deleteRecursively(dirTmp.toString))
  }
}
