package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan-assertion net (r14, VERDICT r13 #10): the bucketed
  * twins were plan-checked ad hoc; this pins the EXCHANGE COUNT of every
  * pure-read q-entry's pre-execution physical plan, so a silent plan
  * regression (a lost broadcast, a new shuffle, a dropped SPJ) fails CI
  * even when it hides inside the timing noise band. Counts are from the
  * AQE INITIAL plan (deterministic at fixed testdata + TestSession confs);
  * "Exchange" matches both shuffle and broadcast exchanges by substring.
  * A legitimate plan change updates the pinned count IN THE SAME commit,
  * with the reason in the commit message.
  */
class PlanNetSpec extends AnyFunSuite {
  import TestSession.{spark, sf}

  // q-entry -> pinned Exchange count in the initial physical plan
  private val pinned: Map[String, Int] = Map(
    "q01_pricing_summary" -> 2,
    "q02_filter_topk" -> 0,
    "q03_top_revenue_orders" -> 3,
    "q03b_bucketed_spj" -> 3,
    "q04_priority_semi" -> 5,
    "q04b_bucketed_spj" -> 3,
    "q05_nation_revenue" -> 10,
    "q05b_bucketed_spj" -> 22,
    "q06_forecast_revenue" -> 1,
    "q07_volume_shipping" -> 7,
    "q07b_bucketed_spj" -> 8,
    "q08_window_rank" -> 1,
    "q09_running_sum" -> 1,
    "q10_rollup" -> 3,
    "q11_cust_distribution" -> 3,
    "q11b_bucketed_spj" -> 3,
    "q12_case_counts" -> 4,
    "q13_big_orders" -> 1,
    "q14_anti_join" -> 4,
    "q14b_bucketed_spj" -> 3,
    "q15_above_avg" -> 3,
    "q16_semi_top_suppliers" -> 0,
    "q17_set_ops" -> 2,
    "q18_json_extract" -> 3,
    "q19_date_trunc" -> 2,
    "q20_having" -> 2,
    "q21_unnest_zip" -> 0,
    "q22_generate_series" -> 0,
    "q23_asof_join" -> 1,
    "q24_range_join" -> 3,
    "q25_cube_grouping" -> 3,
    "q26_pivot" -> 3,
    "q27_sessionize" -> 2)

  // Allowed nested-loop joins — each has a BOUNDED broadcast side, so the
  // shape is linear in the big side, not quadratic:
  //   q15: ONE aggregated row (the scalar-subquery idiom)
  //   v01/v05/v07/v08: the tiny fixed QUERY set (|queries| rows) crossed
  //   against the (IVF/quantization-restricted) corpus — the documented
  //   kNN scoring shape; candidate restriction happened before the cross
  private val nljAllowed = Set("q15_above_avg", "v01_knn_brute",
    "v05_knn_ivf", "v07_ivf_partitioned", "v08_quantized_rerank")

  private def observe(): Map[String, Int] =
    SparkEntry.queries.keys.filter(_.startsWith("q")).toSeq.sorted.map { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      name -> "Exchange".r.findAllIn(plan).size
    }.toMap

  test("no q/t/v/m entry plans a cartesian or nested-loop join") {
    // t/v/m (dedup, ANN, multimodal) are exactly where an accidental
    // all-pairs shape would be a 100 TB catastrophe — the candidate
    // generation must stay equi-join/bucketed
    val bad =
      try SparkEntry.queries.keys
        .filter(n => n.startsWith("q") || n.startsWith("t") ||
          n.startsWith("v") || n.startsWith("m"))
        .filterNot(nljAllowed).toSeq.sorted.flatMap { name =>
          val plan = SparkEntry.queries(name)(spark, sf)
            .queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop"))
            Some(name)
          else None
        }
      // building t/v plans WITHOUT running them leaves CacheScope-tracked
      // persists waiting for an action that never comes — release them so
      // this plan-only spec doesn't poison cache-hygiene checks downstream
      finally graft.queries.CacheScope.release(spark)
    assert(bad.isEmpty, s"quadratic joins in: $bad")
  }

  test("exchange counts match the pinned net") {
    val got = observe()
    val diffs = (pinned.keySet ++ got.keySet).toSeq.sorted.flatMap { k =>
      (pinned.get(k), got.get(k)) match {
        case (Some(p), Some(g)) if p == g => None
        case (p, g) => Some(s"$k: pinned=${p.getOrElse("-")} got=${g.getOrElse("-")}")
      }
    }
    assert(diffs.isEmpty,
      s"exchange-count drift:\n${diffs.mkString("\n")}\n\nfull observed map:\n" +
        got.toSeq.sorted.map { case (k, v) => s"""    "$k" -> $v,""" }.mkString("\n"))
  }
}
