package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion anomaly detection: a 100 TB pipeline's first operational
  * question is "did a source silently break / explode today?". The
  * detector flags per-stream daily volumes whose z-score against the
  * trailing window exceeds a threshold — the standard volume-drift
  * monitor run after every ingest batch.
  *
  * Determinism contract: the rolling moments come from EXACT integer
  * sums (counts, and sums of squared counts, are BIGINTs — no float
  * summation anywhere), so mean/variance are identical IEEE expressions
  * of identical integers in any engine; the z-score is sig9-normalized
  * before thresholding so both engines flag the same days.
  *
  * Scale shape: the daily rollup is one map-side-combined aggregate of
  * the event stream; everything after runs on the O(streams × days)
  * rollup frame, whose per-stream window partitions are bounded by the
  * retention horizon — this never needs the two-phase scan treatment.
  */
object Anomaly {

  /** Robust per-group outliers by median/MAD: z = c·(x − med)/MAD
    * with c = 0.6745 (the consistency constant making MAD estimate σ
    * for normal data) — the outlier detector that, unlike the moment
    * z-score, one wild value cannot poison (both median and MAD have
    * a 50% breakdown point).
    *
    * Plan: two grouped exact percentiles (the q_g8-adjudicated
    * percentile ↔ quantile_cont contract) — med over x, then MAD as
    * the median of |x − med| via a broadcast join of the bounded
    * per-group medians — and a map-side scoring projection. Exact
    * percentile buffers each group's values; with high-cardinality
    * groups swap in approx_percentile (the documented q_x pairing).
    * z is null when MAD = 0 (a constant-majority group has no robust
    * scale). The division is fixed IEEE on sig9'd med/MAD, sig9'd
    * out.
    *
    * @return one row per input point: (keys..., x, med, mad, z,
    *         is_outlier) */
  def robustZ(df: DataFrame, keyCols: Seq[String], valCol: String,
      zThreshold: Double = 3.5): DataFrame = {
    val c = 0.6745
    val med = df.groupBy(keyCols.map(col): _*)
      .agg(graft.queries.Q.sig9(
        percentile(col(valCol), lit(0.5))).as("med"))
    val mad = df.join(broadcast(med), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(graft.queries.Q.sig9(percentile(
        abs(col(valCol) - col("med")), lit(0.5))).as("mad"))
    df.join(broadcast(med), keyCols).join(broadcast(mad), keyCols)
      .withColumn("z", when(col("mad") > 0, graft.queries.Q.sig9(
        lit(c) * (col(valCol) - col("med")) / col("mad"))))
      .withColumn("is_outlier",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(keyCols.map(col) :+ col(valCol).as("x") :+ col("med") :+
        col("mad") :+ col("z") :+ col("is_outlier"): _*)
  }

  /** Per-group winsorized mean: values clamped to the group's
    * [p_lo, p_hi] exact percentiles before averaging — the standard
    * heavy-tail guard for metrics feeding dashboards and A/B tests
    * (one whale order should move revenue-per-user, not own it).
    * Same exact-percentile contract as [[robustZ]] (q_g8-adjudicated;
    * swap approx_percentile past ~10^6 rows per group); bounds
    * broadcast; clamping is a map-side projection and the mean the
    * decimal davg.
    *
    * @return one row per group: (keys..., n, lo, hi, mean_raw,
    *         mean_winsorized) */
  def winsorizedMean(df: DataFrame, keyCols: Seq[String], valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bounds = df.groupBy(keyCols.map(col): _*)
      .agg(graft.queries.Q.sig9(
          percentile(col(valCol), lit(pLo))).as("lo"),
        graft.queries.Q.sig9(
          percentile(col(valCol), lit(pHi))).as("hi"))
    df.join(broadcast(bounds), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(col(valCol)).as("n"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        graft.queries.Q.davg(col(valCol)).as("mean_raw"),
        graft.queries.Q.davg(
          least(greatest(col(valCol), col("lo")), col("hi")))
          .as("mean_winsorized"))
  }

  /** Per (stream, day) volume with trailing-window z-score.
    *
    * The window is the `lookback` preceding OBSERVED days (ROWS, not
    * RANGE: a silent gap day shifts the window rather than shrinking
    * it — a day with zero events produces no row, which is itself the
    * anomaly the `n_win < lookback` null-z rows surface). z is null
    * until the window is full or when the window variance is zero.
    * Output: (stream, day, cnt, n_win, mean_cnt, z, is_anomaly). */
  /** The (stream, day) volume rollup — ONE definition shared by the
    * batch detector and the streaming monitor, so the two can never
    * silently diverge on counting semantics. */
  def dailyCounts(events: DataFrame, tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame =
    events.groupBy(col(typeCol).as("stream"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))

  def dailyVolume(events: DataFrame, tsCol: String = "ts",
                  typeCol: String = "event_type", lookback: Int = 7,
                  zThreshold: Double = 3.0): DataFrame =
    fromDailyCounts(dailyCounts(events, tsCol, typeCol),
      lookback, zThreshold)

  /** Same detector over a PRE-AGGREGATED (stream, day, cnt) rollup —
    * the entry point the streaming monitor uses: micro-batches merge
    * additively into the rollup and only the rollup (O(streams ×
    * days)) is re-scored, never the event history. */
  def fromDailyCounts(daily: DataFrame, lookback: Int = 7,
                      zThreshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("stream")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    val mo = daily.select(col("stream"), col("day"), col("cnt"))
      .withColumn("n_win", count(col("cnt")).over(w))
      .withColumn("s1", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
    val n = col("n_win").cast("double")
    val mean = col("s1").cast("double") / n
    val vr = (col("s2").cast("double")
      - col("s1").cast("double") * col("s1").cast("double") / n) / n
    val full = col("n_win") === lookback
    val zRaw = (col("cnt").cast("double") - mean) / sqrt(vr)
    mo.withColumn("mean_cnt",
        when(full, graft.queries.Q.sig9(mean)))
      .withColumn("z",
        when(full && vr > 0, graft.queries.Q.sig9(zRaw)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col("stream"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("cnt"),
        col("n_win"), col("mean_cnt"), col("z"), col("is_anomaly"))
  }
}
