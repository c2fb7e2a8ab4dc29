package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event stream: ordered conversion
  * funnels and cohort retention — the two queries every product/growth
  * dashboard runs against exactly the event table this engine already
  * ingests (streaming sessions/attribution in
  * [[graft.streaming.EventPipeline]] are the real-time faces; these are
  * their batch complements).
  *
  * Both are built windowless: each funnel step is one filtered
  * aggregate plus one user-keyed equi-join, retention is two grouped
  * aggregates and a join — every shuffle keys on the user or the
  * cohort, nothing global, so the shapes survive arbitrary user counts
  * (the 100 TB axis for an event log is users × time, and both
  * operators are linear scans over it).
  */
object Behavior {

  /** First-touch ordered funnel: for each user, t_1 = their earliest
    * `steps(0)` event, and t_k = the earliest `steps(k)` event after
    * t_{k-1} (within `maxGap` of it, when given). Returns long format
    * (user, step_idx, step, ts) with one row per REACHED step — the
    * standard strict-order, first-touch attribution used by product
    * analytics tools (a later first-step touch that would convert when
    * the earliest does not is deliberately not searched; document
    * choice, mirrored by the oracle).
    */
  def conversionFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGap: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(u.as("user")).agg(min(col(tsCol)).as("t"))
    var out = cur.select(col("user"), lit(0).as("step_idx"),
      lit(steps.head).as("step"), col("t").as("ts"))
    steps.zipWithIndex.drop(1).foreach { case (s, k) =>
      val prev = cur.select(col("user"), col("t").as("prev"))
      val inGap = maxGap.map(g => col(tsCol) <= col("prev") + g)
        .getOrElse(lit(true))
      cur = events.filter(col(typeCol) === s)
        .join(prev, col(userCol) === col("user"))
        .where(col(tsCol) > col("prev") && inGap)
        .groupBy(col("user")).agg(min(col(tsCol)).as("t"))
      out = out.unionByName(cur.select(col("user"), lit(k).as("step_idx"),
        lit(s).as("step"), col("t").as("ts")))
    }
    out
  }

  /** Step-level rollup of [[conversionFunnel]] output: users reached
    * per step + conversion fraction vs the step before (single integer
    * division — deterministic). */
  def funnelSummary(funnel: DataFrame): DataFrame = {
    val counts = funnel.groupBy(col("step_idx"), col("step"))
      .agg(countDistinct(col("user")).as("n_users"))
    val prev = counts.select((col("step_idx") + 1).as("step_idx"),
      col("n_users").as("n_prev"))
    counts.join(prev, Seq("step_idx"), "left")
      .withColumn("conversion",
        when(col("n_prev").isNotNull && col("n_prev") > 0,
          col("n_users").cast("double") / col("n_prev")))
      .select("step_idx", "step", "n_users", "conversion")
  }

  /** Cohort LTV curves: per (cohort day, day offset), the cohort's
    * active users, period revenue and CUMULATIVE revenue — the
    * "how much is a day-N cohort worth by day M" view that prices
    * acquisition. Revenue accumulates IN DECIMAL through the
    * per-cohort running window (offsets per cohort are bounded by the
    * observation span, like every keyed window here) and converts out
    * through the stable decimal round ([[graft.queries.Q.decOut]],
    * `cumScale` places — size it so total·10^scale fits 15 digits).
    */
  def ltv(events: DataFrame, userCol: String, tsCol: String,
      valCol: String, cumScale: Int = 6): DataFrame = {
    val cohorts = events.groupBy(col(userCol).as("user"))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 15)
    val daily = events
      .join(cohorts, col(userCol) === col("user"))
      .groupBy(col("cohort_day"),
        datediff(to_date(col(tsCol)), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"),
        sum(col(valCol).cast(dec)).as("__rev_dec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    daily
      .withColumn("rev", graft.queries.Q.decOut(col("__rev_dec"), cumScale))
      .withColumn("cum_rev",
        graft.queries.Q.decOut(sum(col("__rev_dec")).over(w), cumScale))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("rev"), col("cum_rev"))
  }

  /** Event-to-event transition counts (first-order Markov path
    * analysis): for each user's (ts, tieBreak)-ordered stream, count
    * (from_type -> to_type) adjacencies and each target's share of its
    * source's outgoing transitions. The lead() window partitions by
    * user — bounded by per-user history, never global. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_out"))
    pairs.join(outTotals, Seq("from_type"))
      .withColumn("frac", col("n").cast("double") / col("n_out"))
      .select("from_type", "to_type", "n", "frac")
  }

  /** Exponentially time-decayed per-user feature: sum over events of
    * value * exp(-ln2/halfLife * age_at(`at`)) — the standard recency
    * weighting for engagement/feature-store scoring. Age is computed on
    * exact epoch-microsecond integers; each exp() term is sig9-rounded
    * (the engine-portability contract for libm steps — see
    * [[graft.queries.Q]]) and summed through DECIMAL so the result is
    * partition-order independent. */
  def decayedSum(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeSec: Double, at: Column): DataFrame = {
    val lam = math.log(2.0) / halfLifeSec
    val dtSec = (unix_micros(at) - unix_micros(col(tsCol)))
      .cast("double") / lit(1e6)
    val term = graft.queries.Q.sig9(
      col(valueCol) * exp(lit(-lam) * dtSec))
    events.groupBy(col(userCol).as("user"))
      .agg(graft.queries.Q.dsum(term).as("decayed_value"),
        count(lit(1)).as("n_events"))
  }

  /** Daily cohort retention: cohort = each user's first active date;
    * one row per (cohort_day, day_offset) with the distinct users
    * active that day and the retained fraction of the cohort.
    * Offset 0 is the cohort itself (retention exactly 1.0). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val u = col(userCol)
    val cohorts = events.groupBy(u.as("user"))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(countDistinct(col("user")).as("cohort_size"))
    val active = events.select(u.as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    active.join(cohorts, Seq("user"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day"))
        .cast("long").as("day_offset"))
      .agg(countDistinct(col("user")).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size"))
      .select("cohort_day", "day_offset", "n_active", "cohort_size",
        "retention")
  }
}
