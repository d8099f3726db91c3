package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CacheScope

/** Cache hygiene (VERDICT r8 #5): registry builders that persist an
  * intermediate frame consumed by the returned lazy plan must not leak
  * cached plans across invocations in a long-lived session. CacheScope
  * unpersists each tracked frame once an action containing it completes. */
class CacheScopeSpec extends AnyFunSuite {
  import TestSession._

  // tracked frames drain on the listener bus (async after the action);
  // poll with a generous timeout
  private def awaitDrained(): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (CacheScope.trackedCount(spark) > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(CacheScope.trackedCount(spark) == 0,
      s"tracked frames not drained: ${CacheScope.trackedCount(spark)}")
  }

  test("persisting registry queries leave no cached plans behind") {
    spark.sharedState.cacheManager.clearCache()
    // the three persisting text ops + two persisting vector shapes, run
    // repeatedly: storage must come back flat each time
    val names = Seq("t11_minhash_lsh_pairs", "t13_token_budget",
      "t18_dedup_clusters", "v04_embedding_neardup", "v05_knn_ivf")
    for (round <- 1 to 2; name <- names) {
      SparkEntry.queries(name)(spark, sf).count()
      awaitDrained()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name round $round left cached plans")
    }
  }

  test("release() drops tracked frames eagerly without an action") {
    import spark.implicits._
    val df = CacheScope.track(Seq(1, 2, 3).toDF("x"))
    df.count()
    // the frame is consumed by its own action → listener drains it
    awaitDrained()
    val df2 = CacheScope.track(Seq(4, 5).toDF("y"))
    assert(CacheScope.trackedCount(spark) == 1)
    CacheScope.release(spark)
    assert(CacheScope.trackedCount(spark) == 0)
    assert(df2.storageLevel.useMemory == false)
  }
}
