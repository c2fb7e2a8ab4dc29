package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Observational-causal and sequential-experiment estimators that
  * complete the experiment family (Welch/CUPED/DiD/IPW/QTE/MDE):
  * nearest-score matching (the PSM workhorse), local-linear regression
  * discontinuity, and the always-valid mixture sequential probability
  * ratio test for streaming A/B readouts.
  *
  * Scale shapes: matching is a BANDED equi-join on a bucketed score
  * (never treated x controls), RDD is two closed-form OLS fits from
  * exact decimal moments (one aggregation), and mSPRT is a per-day
  * aggregate with a bounded per-arm prefix window (O(days) rows after
  * the first aggregation). Nothing here carries a global-order window
  * or a driver-side loop.
  *
  * Rosenbaum & Rubin (1983) for matching on a balancing score;
  * Imbens & Lemieux (2008) for the RDD setup; Johari, Koomen,
  * Pekelis & Walsh (KDD 2017) for the mSPRT always-valid p-value.
  */
object Causal {

  /** Nearest-neighbor matching on a score, with replacement, within a
    * caliper — the estimation step of propensity-score matching (the
    * score column can be any balancing score; the fixture uses a
    * deterministic activity proxy).
    *
    * Each treated unit is matched to the control with the smallest
    * |score_c - score_t| at most `caliper` away (ties: smaller control
    * id). Candidates are found with a BANDED equi-join: scores bucket
    * at `caliper` width and a treated row probes buckets {b-1, b, b+1},
    * which provably covers every control within the caliper. The
    * argmin per treated unit is a keyed window over its (bounded)
    * candidate list.
    *
    * Output: one row — arm sizes, matched/unmatched counts, ATT =
    * mean(y_t - y_matched) over matched pairs, and the mean absolute
    * score gap (match-quality diagnostic).
    */
  def matchAtt(units: DataFrame, idCol: String, treatCol: String,
      scoreCol: String, yCol: String, caliper: Double): DataFrame = {
    require(caliper > 0, "matchAtt: caliper must be positive")
    val u = units.where(col(scoreCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(treatCol).cast("boolean").as("__t"),
        col(scoreCol).cast("double").as("__s"),
        col(yCol).cast("double").as("__y"))
    val treated = u.where(col("__t"))
      .select(col("__id").as("t_id"), col("__s").as("t_s"),
        col("__y").as("t_y"),
        floor(col("__s") / caliper).as("__bkt"))
    val controls = u.where(!col("__t"))
      .select(col("__id").as("c_id"), col("__s").as("c_s"),
        col("__y").as("c_y"),
        floor(col("__s") / caliper).as("__cb"))

    // probe the three covering buckets; |gap| <= caliper re-checked
    val probes = treated.select(col("t_id"), col("t_s"), col("t_y"),
      explode(array(col("__bkt") - 1, col("__bkt"),
        col("__bkt") + 1)).as("__cb"))
    val cand = probes.join(controls, "__cb")
      .withColumn("__gap", abs(col("c_s") - col("t_s")))
      .where(col("__gap") <= caliper)
    val w = Window.partitionBy(col("t_id"))
      .orderBy(col("__gap").asc, col("c_id").asc)
    val matched = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)

    val nT = treated.groupBy().agg(count(lit(1)).as("n_treated"))
    val nC = controls.groupBy().agg(count(lit(1)).as("n_control"))
    matched.agg(
        count(lit(1)).cast("long").as("n_matched"),
        Q.dsum(col("t_y") - col("c_y")).as("__d"),
        Q.dsum(col("__gap")).as("__g"))
      .crossJoin(nT).crossJoin(nC)
      .select(col("n_treated"), col("n_control"), col("n_matched"),
        (col("n_treated") - col("n_matched")).as("n_unmatched"),
        Q.sig9(col("__d") / col("n_matched").cast("double")).as("att"),
        Q.sig9(col("__g") / col("n_matched").cast("double"))
          .as("mean_score_gap"))
  }

  /** Sharp regression discontinuity: local linear fits on both sides of
    * `cutoff` within `bandwidth`, effect = difference of the two
    * intercepts AT the cutoff.
    *
    * Sides: left = [cutoff - bandwidth, cutoff), right = [cutoff,
    * cutoff + bandwidth]. Each side fits y = a + b*(x - cutoff) by
    * closed-form OLS over exact DECIMAL(38,15) moment sums; slope and
    * intercept are sig9'd IEEE chains, so both engines agree bitwise.
    *
    * Output: one row — per-side n / intercept / slope and
    * tau = a_right - a_left.
    */
  def rddEstimate(df: DataFrame, xCol: String, yCol: String,
      cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, "rddEstimate: bandwidth must be positive")
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((col(xCol).cast("double") - cutoff).as("__u"),
        col(yCol).cast("double").as("__y"))
      .where(col("__u") >= -bandwidth && col("__u") <= bandwidth)
      .withColumn("__side", when(col("__u") < 0, "left").otherwise("right"))

    def fit(side: String) = {
      val m = base.where(col("__side") === side).agg(
        count(lit(1)).cast("long").as("n"),
        Q.dsum(col("__u")).as("sx"),
        Q.dsum(col("__y")).as("sy"),
        Q.dsum(col("__u") * col("__u")).as("sxx"),
        Q.dsum(col("__u") * col("__y")).as("sxy"))
      val nD = col("n").cast("double")
      val den = Q.sig9(nD * col("sxx") - col("sx") * col("sx"))
      val b = Q.sig9((nD * col("sxy") - col("sx") * col("sy")) / den)
      val a = Q.sig9((col("sy") - b * col("sx")) / nD)
      m.select(col("n").as(s"n_$side"), a.as(s"a_$side"),
        b.as(s"b_$side"))
    }
    fit("left").crossJoin(fit("right"))
      .select(col("n_left"), col("n_right"), col("a_left"), col("b_left"),
        col("a_right"), col("b_right"),
        Q.sig9(col("a_right") - col("a_left")).as("tau"))
  }

  /** Instrumental-variable (Wald) estimator for a binary instrument:
    * beta_IV = (E[y|z=1] - E[y|z=0]) / (E[x|z=1] - E[x|z=0]) — the
    * encouragement-design readout when treatment uptake x is
    * endogenous but the instrument z is as-if random (Angrist, Imbens
    * & Rubin 1996). Numerator = intent-to-treat effect, denominator =
    * first stage; a weak first stage (|den| = 0 after sig9) yields
    * NULL rather than an exploding ratio.
    *
    * ONE map-side-combined aggregate per arm (decimal sums), one-row
    * crossJoin — the scalar-fold idiom. Nothing iterative.
    */
  def ivWald(units: DataFrame, zCol: String, xCol: String,
      yCol: String): DataFrame = {
    val u = units.where(col(zCol).isNotNull && col(xCol).isNotNull &&
      col(yCol).isNotNull)
    // dsumStable: unit metrics are typically already-rounded per-unit
    // aggregates (granular), where the plain decimal->double cast can
    // tie at a sig9 half-step; scale 6 keeps |sum| < 1e9 exact
    def arm(z: Int) = u.where(col(zCol) === z).agg(
      count(lit(1)).cast("long").as(s"n_$z"),
      Q.dsumStable(col(xCol), 6).as(s"__sx$z"),
      Q.dsumStable(col(yCol), 6).as(s"__sy$z"))
      .select(col(s"n_$z"),
        Q.sig9(col(s"__sx$z") / col(s"n_$z").cast("double"))
          .as(s"mean_x$z"),
        Q.sig9(col(s"__sy$z") / col(s"n_$z").cast("double"))
          .as(s"mean_y$z"))
    val itt = Q.sig9(col("mean_y1") - col("mean_y0"))
    val fs = Q.sig9(col("mean_x1") - col("mean_x0"))
    arm(0).crossJoin(arm(1))
      .select(col("n_0"), col("n_1"), col("mean_x0"), col("mean_x1"),
        col("mean_y0"), col("mean_y1"), itt.as("itt"),
        fs.as("first_stage"),
        when(fs =!= 0.0, Q.sig9(itt / fs)).as("beta_iv"))
  }

  /** Always-valid mixture SPRT over a day-bucketed two-arm experiment.
    *
    * Per day d (event-time ascending), with cumulative arm counts
    * n_t, n_c and cumulative means m_t, m_c:
    *   V_d   = sigma2 * (1/n_t + 1/n_c)          (variance of delta)
    *   logLambda_d = ln(sqrt(V/(V+tau2)))
    *               + delta^2 * tau2 / (2 V (V+tau2))
    * and the test rejects the first day logLambda_d > ln(1/alpha).
    * sigma2 is the pooled sample variance of the metric over the full
    * span (one broadcast row). Everything after the per-(day, arm)
    * aggregation is O(days) rows; the prefix sums are per-arm bounded
    * windows, never a global order.
    *
    * Output: one row per day — cumulative arm sizes, delta,
    * log_lambda, crossed (pointwise), and first_cross_day (the
    * experiment's stopping day, broadcast onto every row; NULL if the
    * boundary is never crossed).
    */
  def msprt(events: DataFrame, armCol: String, dayCol: String,
      valueCol: String, tau2: Double, alpha: Double): DataFrame = {
    val e = events.where(col(valueCol).isNotNull)
      .select(col(armCol).cast("long").as("__g"), col(dayCol).as("__d"),
        col(valueCol).cast("double").as("__x"))

    // pooled variance (one broadcast row)
    val sig = e.agg(count(lit(1)).cast("long").as("__n"),
        Q.dsum(col("__x")).as("__s1"),
        Q.dsum(col("__x") * col("__x")).as("__s2"))
      .select(Q.sig9((col("__s2") -
          col("__s1") * col("__s1") / col("__n").cast("double")) /
          (col("__n") - 1).cast("double")).as("sigma2"))

    val daily = e.groupBy(col("__g"), col("__d"))
      .agg(count(lit(1)).as("__nd"),
        sum(col("__x").cast(org.apache.spark.sql.types.DecimalType(38, 15)))
          .as("__sd"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("__cn", sum(col("__nd")).over(w).cast("long"))
      .withColumn("__cs", Q.sig9(sum(col("__sd")).over(w).cast("double")))

    val t = cum.where(col("__g") === 1)
      .select(col("__d").as("day"), col("__cn").as("n_t"),
        Q.sig9(col("__cs") / col("__cn").cast("double")).as("m_t"))
    val c = cum.where(col("__g") === 0)
      .select(col("__d").as("day"), col("__cn").as("n_c"),
        Q.sig9(col("__cs") / col("__cn").cast("double")).as("m_c"))

    val vD = Q.sig9(col("sigma2") *
      (lit(1.0) / col("n_t").cast("double") +
        lit(1.0) / col("n_c").cast("double")))
    val joined = t.join(c, "day").crossJoin(sig)
      .withColumn("delta", Q.sig9(col("m_t") - col("m_c")))
      .withColumn("__v", vD)
    val logLambda = Q.sig9(
      Q.sig9(lit(0.5) * log(col("__v") / (col("__v") + tau2))) +
        Q.sig9(col("delta") * col("delta") * tau2 /
          (lit(2.0) * col("__v") * (col("__v") + tau2))))
    val perDay = joined.withColumn("log_lambda", logLambda)
      .withColumn("crossed",
        col("log_lambda") > math.log(1.0 / alpha))
    val firstCross = perDay.agg(
      min(when(col("crossed"), col("day"))).as("first_cross_day"))
    perDay.crossJoin(firstCross)
      .select(col("day"), col("n_t"), col("n_c"), col("m_t"), col("m_c"),
        col("delta"), col("log_lambda"), col("crossed"),
        col("first_cross_day"))
  }

  /** Offline (counterfactual) policy evaluation from logged bandit
    * feedback: IPS, capped IPS and SNIPS estimates of a target
    * policy's value, with the logging propensities taken EMPIRICALLY
    * from the log itself and the target policy the deterministic
    * greedy rule "play the action with the best logged mean reward in
    * this context" (ties to the smaller action label). Horvitz &
    * Thompson (1952) for IPS; Swaminathan & Joachims (JMLR 2015) for
    * the self-normalized (SNIPS) correction; Ionides (2008) for
    * weight capping.
    *
    * The whole computation collapses onto the bounded (context,
    * action) cell table after ONE corpus aggregation: a cell's rows
    * share the same weight w = 1{a = pi(x)} * n_x / n_xa, so
    * sum_i w_i r_i = w * sum_cell(r) and sum_i w_i = n_x per matched
    * cell — the estimators are closed forms over |contexts|*|actions|
    * rows. At 100 TB the log is scanned once; everything after is
    * driver-free bounded math.
    *
    * Determinism: cell reward sums accumulate in exact decimal and
    * emerge sig9'd; weights are exact integer ratios; the final
    * cell-level sums ride [[Q.dsumStable]].
    *
    * @return one row: n, n_contexts, matched_rows (log rows whose
    *         action agrees with pi), ips, ips_capped, snips */
  def ipsPolicyEval(log: DataFrame, contextCol: String, actionCol: String,
      rewardCol: String, cap: Double): DataFrame = {
    require(cap > 0, s"ipsPolicyEval: cap must be positive, got $cap")
    val cells = log
      .where(col(contextCol).isNotNull && col(actionCol).isNotNull &&
        col(rewardCol).isNotNull)
      .groupBy(col(contextCol).as("__x"), col(actionCol).as("__a"))
      .agg(count(lit(1)).as("__na"),
        Q.dsum(col(rewardCol).cast("double")).as("__rs"))
      .withColumn("__mean",
        Q.sig9(col("__rs") / col("__na").cast("double")))
    val perCtx = cells.groupBy(col("__x"))
      .agg(sum(col("__na")).cast("long").as("__nx"),
        max(col("__mean")).as("__mbest"))
    // deterministic greedy target: argmax mean, ties to min action
    val pi = cells.join(perCtx, "__x")
      .where(col("__mean") === col("__mbest"))
      .groupBy(col("__x")).agg(min(col("__a")).as("__abest"))
    val matched = cells.join(perCtx, "__x").join(pi, "__x")
      .where(col("__a") === col("__abest"))
      .select(col("__x"), col("__na"), col("__rs"), col("__nx"),
        (col("__nx").cast("double") / col("__na").cast("double"))
          .as("__w"),
        least(col("__nx").cast("double") / col("__na").cast("double"),
          lit(cap)).as("__wc"))
    val tot = log
      .where(col(contextCol).isNotNull && col(actionCol).isNotNull &&
        col(rewardCol).isNotNull)
      .agg(count(lit(1)).cast("long").as("n"),
        count_distinct(col(contextCol)).cast("long").as("n_contexts"))
    // with EMPIRICAL propensities and a deterministic policy the plain
    // self-normalizer is exact (sum w = sum_x n_x = n), so SNIPS is
    // only informative over the CAPPED weights — the usual pairing
    val sums = matched.agg(
      coalesce(sum(col("__na")), lit(0L)).cast("long").as("matched_rows"),
      coalesce(Q.dsumStable(col("__w") * col("__rs"), 6), lit(0.0))
        .as("__swr"),
      coalesce(Q.dsumStable(col("__wc") * col("__rs"), 6), lit(0.0))
        .as("__swcr"),
      coalesce(Q.dsumStable(col("__wc") * col("__na").cast("double"), 6),
        lit(0.0)).as("__swc"))
    tot.crossJoin(sums).select(col("n"), col("n_contexts"),
      col("matched_rows"),
      Q.sig9(col("__swr") / col("n").cast("double")).as("ips"),
      Q.sig9(col("__swcr") / col("n").cast("double")).as("ips_capped"),
      when(col("__swc") === 0.0, lit(0.0))
        .otherwise(Q.sig9(col("__swcr") / col("__swc"))).as("snips"))
  }
}
