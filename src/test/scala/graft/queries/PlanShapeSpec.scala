package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Regression guards for the plan properties the 100 TB design depends
  * on. These are the facts PLANS.md claims; if a refactor quietly adds
  * a shuffle to the as-of join or turns the range join into a nested
  * loop, this fails before the bench does. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan text. AdaptiveSparkPlan.toString
    * prints the final AND the initial plan; keep only the final section
    * or every operator double-counts. */
  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  private def count(plan: String, op: String): Int =
    op.r.findAllIn(plan).length

  test("as-of join: one shuffle per row, no join operator") {
    val p = planOf(SparkEntry.queries("q_j10_asof")(spark, sf))
    // the union's two branches each show an Exchange node, but every row
    // crosses exactly one shuffle boundary; more than two would mean a
    // second shuffle appeared after the union
    assert(count(p, "Exchange hashpartitioning") <= 2, p.take(800))
    assert(!p.contains("Join"), "as-of must not plan a join")
    assert(count(p, "Window \\[") == 1, // the operator, not spec text
      p.take(800))
  }

  test("forward as-of join keeps the single-window no-join plan (and " +
      "the incremental running frame, not UnboundedFollowing)") {
    val p = planOf(SparkEntry.queries("q_j10b_asof_forward")(spark, sf))
    assert(count(p, "Exchange hashpartitioning") <= 2, p.take(800))
    assert(!p.contains("Join"), "forward as-of must not plan a join")
    assert(count(p, "Window \\[") == 1, p.take(800))
    assert(!p.contains("unboundedfollowing"),
      "forward fill must use the incremental preceding frame")
  }

  test("range join: hash join on the bucket key, never nested-loop") {
    // sf0.01: at sf0.001 the interval side can be empty and AQE plans
    // the join away entirely
    val p = planOf(SparkEntry.queries("q_j11_range")(spark,
      "/root/testdata/sf0.01"))
    assert(p.contains("HashJoin"), p.take(800))
    assert(!p.contains("NestedLoop"),
      "interval join must block on buckets, not cross-compare")
  }

  test("group-by aggregates are two-phase (map-side partial)") {
    val p = planOf(SparkEntry.queries("q_g1_groupby_agg")(spark, sf))
    assert(count(p, "HashAggregate") >= 2, p.take(800))
  }

  test("flagship entry broadcasts its dimension joins") {
    val p = planOf(SparkEntry.entry(spark))
    assert(count(p, "BroadcastHashJoin") >= 3, p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("minhash near-dup: signature subtree materialized once — the " +
      "final plan reads the checkpoint, never re-shingles the corpus") {
    val p = planOf(SparkEntry.queries("q_x_dedup_minhash")(spark, sf))
    assert(p.contains("ExistingRDD"),
      "band/verify branches must read the checkpointed signature frame")
    assert(!p.toLowerCase.contains("scan parquet"),
      "corpus re-shingling leaked into the query plan:\n" + p.take(800))
  }

  test("bloom prune probes via the native might_contain, not a UDF") {
    // sf0.01 like the range join: a non-degenerate fact side
    val p = planOf(SparkEntry.queries("q_j12_bloom_prune")(spark,
      "/root/testdata/sf0.01"))
    assert(p.contains("might_contain"), p.take(800))
    assert(!p.contains("UDF"),
      "bloom probe must stay codegen'd — no boxing scalar UDF")
  }

  test("novelty: first occurrence via groupBy+join — no window keyed " +
      "on the n-gram hash") {
    val p = planOf(SparkEntry.queries("q_x_novelty")(spark, sf))
    assert(count(p, "Window \\[") == 0,
      "novelty must not window over the exploded n-gram frame:\n" +
        p.take(800))
    assert(p.contains("Join"), "first-occurrence must join back")
  }

  test("curriculum: boundaries plan carries no exact Percentile buffer") {
    val df = SparkEntry.queries("q_x_curriculum")(spark, sf)
    assert(!graft.ext.PlanLint.findings(df)
      .exists(_.check == "exact-percentile"))
  }

  test("PQ serving: the candidate spread survives as an explicit " +
      "REPARTITION_BY_NUM exchange AQE cannot coalesce") {
    // The ADC LUT join's corpus side arrives from tiny upstream
    // shuffles (packCodes' pivot is a few KB) that AQE coalesces to one
    // partition — the |Q| x N x m explosion then runs on one core. The
    // fix is an explicit repartition at 2x shuffle.partitions (a count
    // identical to the upstream hashpartitioning(vid, n) would be
    // optimized away as redundant). Pin both: the distinct count AND
    // the uncoalescible REPARTITION_BY_NUM origin.
    val n2 = 2 * spark.sessionState.conf.numShufflePartitions
    val pq = planOf(SparkEntry.queries("q_x_ann_pq")(spark, sf))
    assert(s"hashpartitioning\\(vid#\\d+L?, $n2\\), REPARTITION_BY_NUM".r
      .findFirstIn(pq).isDefined,
      "PQ candidate spread was eliminated or coalesced:\n" + pq.take(800))
    val ivfpq = planOf(SparkEntry.queries("q_x_ann_ivfpq")(spark, sf))
    assert(
      s"hashpartitioning\\(qid#\\d+L?, vid#\\d+L?, $n2\\), REPARTITION_BY_NUM"
        .r.findFirstIn(ivfpq).isDefined,
      "IVF-PQ candidate spread was eliminated or coalesced:\n" +
        ivfpq.take(800))
  }

  test("bounded-|Q| serving batch pushes its id bound into the parquet " +
      "scan") {
    // the bound is applied BEFORE the +30000 qid projection so it
    // stays a pushable predicate; filtering the projected qid strands
    // it above the scan (ANSI overflow rules block the rewrite) and at
    // 100 TB the serving batch would scan the corpus and discard
    val df = SparkEntry.queries("q_x_ann_pq_serve")(spark, sf)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("LessThan(vec_id,160)"),
      "serving-batch bound missing from PushedFilters:\n" +
        scans.take(800))
  }

  test("native expressions appear in plans (not the composed forms)") {
    val p = planOf(SparkEntry.queries("q_x_embed_neardup")(spark, sf))
    assert(p.contains("sig9"), "score must route through sig9_round")
    assert(p.contains("dotproduct"), "dot must be the native expression")
  }
}
