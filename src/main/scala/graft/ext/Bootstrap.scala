package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q

/** One-pass Poisson bootstrap — error bars for corpus metrics at
  * 100 TB scale (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", the standard streaming/MapReduce bootstrap
  * formulation; Kleiner et al.'s BLB is the heavier alternative).
  *
  * The classical bootstrap resamples the corpus R times — R shuffles
  * of 100 TB. The Poisson trick replaces resampling with per-row
  * REPLICATE WEIGHTS: in replicate r, each row appears w ~ Poisson(1)
  * times (the R-fold multinomial's limit), so all R resamples are
  * computed in ONE corpus pass: explode each row to its R (replicate,
  * weight) pairs map-side, aggregate (keys, replicate) partials
  * through one shuffle, and reduce the O(groups × R) replicate-mean
  * frame to sd + order-statistic confidence bounds with bounded
  * algebra. Never R passes, never a resample shuffle, no driver data
  * path.
  *
  * Determinism contract (DuckDB-adjudicable): the Poisson draw is the
  * inverse CDF of u_r = ((a_r·hashP(salt:id) + b_r) mod P) / P — one
  * portable md5 per ROW mixed through per-replicate affine constants
  * ([[mixers]], the MinHash-permutation family) — against the
  * PRECOMPUTED Poisson(1) CDF thresholds below; both engines embed
  * the same mixer and threshold literals and the same `u >= c`
  * comparisons, so every weight is identical everywhere. Replicate
  * means follow the NB product contract (sig9 per w·x term, decimal
  * sum); sd uses the mirrored two-moment formula (sqrt is IEEE
  * correctly-rounded, so it cannot diverge); the confidence bounds are
  * DISCRETE order statistics (k-th smallest replicate mean, ties by
  * replicate id) — rank selection, not interpolation, so no
  * interpolation arithmetic to tie-break across engines.
  */
object Bootstrap {

  /** Poisson(1) CDF thresholds c_k = e^-1 · Σ_{j<=k} 1/j!, k = 0..11:
    * the weight is #{k : c_k <= u}, capped at 12 (P[w > 12] < 1e-13 —
    * unreachable from a 60-bit u). Computed once here; the oracle
    * embeds the SAME shortest-repr double literals (the pagerank
    * base-constant convention), so both engines compare against
    * bit-identical values. */
  val PoissonCdf1: Seq[Double] = {
    val e1 = StrictMath.exp(-1.0)
    val terms = Iterator.iterate(1.0 -> 0) { case (t, j) =>
      (t / (j + 1), j + 1)
    }.map(_._1).take(12).toSeq
    terms.scanLeft(0.0)(_ + _).tail.map(_ * e1)
  }

  /** Max weight = thresholds count (12). */
  val MaxWeight: Int = PoissonCdf1.size

  /** Per-replicate affine mixers over the MinHash ring [0, P): the
    * replicate-r coin is u_r = ((a_r·h + b_r) mod P) / P where h is
    * the row's SINGLE md5 hash — one md5 per row instead of one per
    * (row, replicate), which profiled as the whole cost of the
    * operator (R md5s × corpus rows). (a_r, b_r) derive from md5 of
    * the salt and replicate index alone — a bounded artifact both
    * engines embed as literals, the MinHash-permutation recipe
    * `Hashing` already uses. a_r ∈ [1, P), b_r ∈ [0, P); products
    * a·h stay under 2^62 (no overflow, the documented P contract). */
  def mixers(salt: String, replicates: Int): (Seq[Long], Seq[Long]) = {
    val a = (0 until replicates).map(r =>
      Hashing.hash60Local(s"$salt:a:$r") % (Hashing.P - 1) + 1)
    val b = (0 until replicates).map(r =>
      Hashing.hash60Local(s"$salt:b:$r") % Hashing.P)
    (a, b)
  }

  /** Deterministic Poisson(1) weight of (rowHash, replicate): the
    * mixed uniform counted against [[PoissonCdf1]] as a codegen'd
    * chain of comparisons (a higher-order `filter` over the literal
    * array is interpreted per row — measured 20x slower). */
  private def weight(h: org.apache.spark.sql.Column,
                     rep: org.apache.spark.sql.Column,
                     a: Seq[Long], b: Seq[Long]) = {
    val ar = element_at(array(a.map(lit): _*), rep + 1)
    val br = element_at(array(b.map(lit): _*), rep + 1)
    val u = pmod(ar * h + br, lit(Hashing.P)).cast("double") /
      lit(Hashing.P.toDouble)
    PoissonCdf1.map(c => (u >= lit(c)).cast("long")).reduce(_ + _)
  }

  /** Bootstrap distribution of the per-group MEAN of `valCol`.
    *
    * @param df        input rows
    * @param keys      grouping columns (empty = one global group is NOT
    *                  supported — pass a literal key column for that)
    * @param idCol     stable row identity the weights hash (re-runs and
    *                  repartitions agree)
    * @param valCol    metric column (double)
    * @param replicates R — the bootstrap resample count (64 is the
    *                  usual production choice; cost is R× map work on
    *                  the exploded side, one shuffle)
    * @param alpha     two-sided miscoverage for the bounds (0.05 →
    *                  2.5%/97.5% order statistics)
    * @return (keys…, n_rows, point_mean, n_reps, boot_mean, boot_sd,
    *         ci_lo, ci_hi) — sig9'd doubles; ci bounds are the
    *         floor(α/2·(R−1))+1-th and ceil((1−α/2)·(R−1))+1-th
    *         smallest replicate means
    */
  def poissonMeans(df: DataFrame, keys: Seq[String], idCol: String,
                   valCol: String, replicates: Int,
                   alpha: Double = 0.05,
                   salt: String = "boot"): DataFrame = {
    require(replicates >= 2, s"replicates must be >= 2, got $replicates")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(keys.nonEmpty, "pass at least one grouping column")
    val kCols = keys.map(col)

    // ONE materialized narrow base at cluster width: both the point
    // branch and the R-way replicate branch read it (was two scans,
    // and a single-split scan starved the R-way fan-out stage down to
    // one core — measured 6.9 s of 32-core idle at sf0.1)
    val base = Checkpoints.spreadCut(df.select(
      kCols :+ col(idCol).as("__id") :+ col(valCol).as("__x"): _*))

    // point estimate from the UN-exploded frame (exact, no bootstrap)
    val point = base.groupBy(kCols: _*)
      .agg(count(col("__x")).as("n_rows"),
        Q.sig9(Q.davg(col("__x"))).as("point_mean"))

    // R replicate means per group: one corpus pass, ONE md5 per row,
    // then a map-side explode whose per-replicate coin is one
    // multiply-add-mod against the embedded mixer literals.
    // __xda hoists the replicate term's double->DECIMAL(38,15) cast
    // (Double.toString — the Q.dec15 scaladoc's profiled dominant
    // cost) out of the R-way fan-out: the summed term sig9(w·x) only
    // depends on the BOUNDED weight w <= MaxWeight, so each row
    // precomputes the MaxWeight possible decimal terms once and every
    // replicate picks by weight. A weight-0 replicate contributed an
    // exact decimal 0 before and is skipped as a NULL now — decimal
    // addition is exact, so the sums are bit-identical.
    val (ma, mb) = mixers(salt, replicates)
    val xda = array((1 to MaxWeight).map(k =>
      Q.dec15(Q.sig9(lit(k.toDouble) * col("__x")))): _*)
    val rep = base
      .select(kCols :+ col("__x") :+ xda.as("__xda") :+
        Hashing.hashP(concat(lit(salt + ":"), col("__id").cast("string")))
          .as("__h"): _*)
      .withColumn("__r", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__w", weight(col("__h"), col("__r"), ma, mb))
    val repMeans = rep.groupBy(kCols :+ col("__r"): _*)
      .agg(sum(col("__w")).as("__sw"),
        Q.dsumPre(when(col("__w") >= 1L, element_at(col("__xda"),
          col("__w").cast("int")))).as("__swx"))
      .where(col("__sw") > 0)
      .select(kCols :+ col("__r") :+
        Q.sig9(col("__swx") / col("__sw").cast("double")).as("__m"): _*)

    // bounded O(groups × R) reduction: two-moment sd + rank bounds
    val kLo = math.floor(alpha / 2 * (replicates - 1)).toLong + 1
    val kHi = math.ceil((1 - alpha / 2) * (replicates - 1)).toLong + 1
    val win = Window.partitionBy(kCols: _*)
      .orderBy(col("__m").asc, col("__r").asc)
    val ranked = repMeans.withColumn("__rk", row_number().over(win))
    val summary = ranked.groupBy(kCols: _*)
      .agg(count(lit(1)).as("n_reps"),
        Q.dsum(col("__m")).as("__s1"),
        Q.dsum(Q.sig9(col("__m") * col("__m"))).as("__s2"),
        min(when(col("__rk") === kLo, col("__m"))).as("__lo_try"),
        min(when(col("__rk") === kHi, col("__m"))).as("__hi_try"),
        min(col("__m")).as("__mn"), max(col("__m")).as("__mx"))
      .select(kCols :+ col("n_reps") :+
        Q.sig9(col("__s1") / col("n_reps").cast("double"))
          .as("boot_mean") :+
        when(col("n_reps") > 1, Q.sig9(sqrt(greatest(
          Q.sig9((col("__s2") - Q.sig9(col("__s1") * col("__s1")) /
            col("n_reps").cast("double")) /
            (col("n_reps") - 1).cast("double")), lit(0.0)))))
          .otherwise(0.0).as("boot_sd") :+
        // a group that lost replicates to all-zero weights (possible
        // only at toy sizes) falls back to its extreme order stats
        coalesce(col("__lo_try"), col("__mn")).as("ci_lo") :+
        coalesce(col("__hi_try"), col("__mx")).as("ci_hi"): _*)

    point.join(summary, keys)
      .select(kCols :+ col("n_rows") :+ col("point_mean") :+
        col("n_reps") :+ col("boot_mean") :+ col("boot_sd") :+
        col("ci_lo") :+ col("ci_hi"): _*)
  }
}
