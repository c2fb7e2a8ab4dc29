package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Fleet-wide physical-plan guard: EVERY query on the oracle surface is
  * linted, and none may plan a CartesianProductExec — the one shape
  * that is never acceptable (the deliberate one-row/B-row scalar
  * attaches plan as BroadcastNestedLoopJoin, which the lint reports at
  * warn for human confirmation, and empty-partition windows over
  * post-aggregate O(groups) frames are audited per-query in PLANS.md).
  * A refactor that silently degrades an equi-join or band join into an
  * all-pairs product fails here before any bench or scale run sees it. */
class PlanSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately carries a global-order window:
    * each one is a documented O(groups)/O(bins) POST-AGGREGATE frame
    * (PLANS.md audits every entry) — the window sorts bounded data,
    * never the corpus. Anything new that trips the lint must either
    * lose the global window or earn a PLANS.md entry + a row here. */
  private val globalWindowAllowed: Set[String] = Set(
    "q_g2_complement_agg", // grand totals over the per-stadium agg (~10 rows; Metrics.parkFactor)
    "q_m1_park_factor",    // same G2 grand-total window over O(stadiums)
    "q_x_bm25",            // O(queries×k) post-TakeOrdered rank frame (PLANS.md)
    "q_x_dsir",            // O(buckets) post-aggregate weight frame (PLANS.md)
    "q_x_ndcg",            // O(queries×k) ranked eval frame (PLANS.md)
    "q_x_pipeline10",      // composes bm25/ndcg ranked-eval subplans (PLANS.md)
    "q_x_rank_eval",       // O(queries×k) ranked eval frame (PLANS.md)
    "q_x_rbo",             // rank over a LIMIT-k (k=20) top-token frame
    "q_x_stratified_exact",// O(strata) allocation frame (PLANS.md)
    "q_x_vocab_coverage")  // O(V_top) post-aggregate vocab frame (PLANS.md)

  /** Queries allowed to plan Spark's exact Percentile aggregate: only
    * provably bounded value domains (PLANS.md-audited); everything
    * else must use Curriculum.exactBoundaries or approx_percentile. */
  private val exactPercentileAllowed: Set[String] = Set(
    // the q_g8-adjudicated exact-percentile contract: these queries
    // exist to pin bit-exact quantile parity with DuckDB quantile_cont;
    // their scale path (Anomaly scaladoc) is approx_percentile /
    // Curriculum.exactBoundaries past ~1e6 rows per group
    "q_g8_percentiles",
    "q_x_approx_percentile", // exact percentile is the comparison baseline
    "q_x_pipeline6",         // composes the winsorize/robust-z subplans
    "q_x_robust_z",          // median/MAD per event_type (bounded groups)
    "q_x_winsorize")         // p05/p95 clamp bounds per event_type

  private def surfaceFindings(check: String): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      graft.ext.PlanLint.findings(fn(spark, sf))
        .filter(_.check == check).map(f => name -> f.detail)
    }

  test("no query on the surface plans a cartesian product") {
    val offenders = surfaceFindings("cartesian-product")
    assert(offenders.isEmpty,
      offenders.map { case (n, d) => s"$n: $d" }.mkString("\n"))
  }

  test("no query outside the audited allowlist plans a global-order " +
      "window") {
    val offenders = surfaceFindings("global-window")
      .filterNot { case (n, _) => globalWindowAllowed(n) }
    assert(offenders.isEmpty,
      offenders.map { case (n, d) => s"$n: $d" }.mkString("\n"))
    val stale = globalWindowAllowed -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries for unknown queries: $stale")
  }

  test("no query outside the audited allowlist plans an exact " +
      "Percentile aggregate") {
    val offenders = surfaceFindings("exact-percentile")
      .filterNot { case (n, _) => exactPercentileAllowed(n) }
    assert(offenders.isEmpty,
      offenders.map { case (n, d) => s"$n: $d" }.mkString("\n"))
    val stale = exactPercentileAllowed -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries for unknown queries: $stale")
  }

  test("the gates actually fire: seeded bad plans are caught") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(100).toDF("id")
    val cart = df.crossJoin(spark.range(100).toDF("j")
      .hint("shuffle_replicate_nl"))
    assert(graft.ext.PlanLint.findings(cart)
      .exists(_.check == "cartesian-product"))
    val gw = df.withColumn("r", row_number().over(Window.orderBy("id")))
    assert(graft.ext.PlanLint.findings(gw)
      .exists(_.check == "global-window"))
    val ep = df.agg(expr("percentile(id, 0.5)"))
    assert(graft.ext.PlanLint.findings(ep)
      .exists(_.check == "exact-percentile"))
  }
}
