package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance audits for a training-data lake: privacy
  * (k-anonymity / l-diversity over declared quasi-identifiers) and
  * declared-constraint quality (functional-dependency violation rates,
  * candidate-key uniqueness).
  *
  * A 100 TB corpus cannot be hand-reviewed before release; what scales
  * is a declared contract ("these columns are quasi-identifiers",
  * "lhs -> rhs must hold", "these columns are the key") plus a
  * one-pass audit that either certifies it or quantifies the breach.
  * Every audit here is a single hash aggregation (two-level where a
  * distinct count is needed, so no O(n) expand and no global sort) —
  * the shapes that survive a 1000-executor shuffle untouched.
  *
  * Sweeney, "k-anonymity: a model for protecting privacy" (2002);
  * Machanavajjhala et al., "l-diversity" (TKDD 2007); Huhtala et al.,
  * "TANE" (1999) for the FD-violation framing.
  */
object Govern {

  /** k-anonymity / l-diversity audit over one declared quasi-identifier
    * set.
    *
    * Output: one row per equivalence class (distinct QI combination) —
    * the class size `n_rows`, the number of distinct sensitive values
    * `l_distinct`, and the two pass/fail verdicts `k_anonymous`
    * (n_rows >= k) and `l_diverse` (l_distinct >= l). Release gates
    * read the violating classes; re-identification risk is bounded by
    * 1 / min(n_rows).
    *
    * Shape: groupBy(QI, sensitive) then groupBy(QI) — two map-side
    * combinable hash aggregations; the first collapses duplicate
    * sensitive values so the second counts distincts with a plain
    * count(*). No expand, no window, no distinct-aggregate rewrite.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need at least one QI column")
    val qi = quasiCols.map(col)
    val perSensitive = df
      .groupBy(qi :+ col(sensitiveCol).as("__sv"): _*)
      .agg(count(lit(1)).as("__c"))
    perSensitive
      .groupBy(qi: _*)
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("l_distinct"))
      .select(qi :+ col("n_rows") :+ col("l_distinct") :+
        (col("n_rows") >= k).as("k_anonymous") :+
        (col("l_distinct") >= l).as("l_diverse"): _*)
  }

  /** Violation audit of one declared functional dependency lhs -> rhs.
    *
    * Output: a single row — the FD's name, the number of lhs groups,
    * how many of them see more than one distinct rhs value (violating
    * groups), how many ROWS sit in violating groups (the rewrite
    * workload if the FD is to be enforced), and the group-level
    * violation rate.
    *
    * Shape: groupBy(lhs, rhs) then groupBy(lhs) then one global agg —
    * all hash aggregations, each stage orders of magnitude smaller
    * than the last.
    */
  def fdAudit(df: DataFrame, name: String, lhs: Seq[String],
      rhs: String): DataFrame = {
    val l = lhs.map(col)
    val perRhs = df
      .where(l.map(_.isNotNull).reduce(_ && _))
      .groupBy(l :+ col(rhs).as("__rv"): _*)
      .agg(count(lit(1)).as("__c"))
    val perLhs = perRhs.groupBy(l: _*)
      .agg(sum(col("__c")).as("__rows"), count(lit(1)).as("__nd"))
    perLhs.agg(
      count(lit(1)).cast("long").as("n_groups"),
      sum(when(col("__nd") > 1, 1L).otherwise(0L)).cast("long")
        .as("violating_groups"),
      sum(when(col("__nd") > 1, col("__rows")).otherwise(0L)).cast("long")
        .as("violating_rows"))
      .select(lit(name).as("audit"), col("n_groups"),
        col("violating_groups"), col("violating_rows"),
        (col("violating_groups").cast("double") /
          col("n_groups").cast("double")).as("violation_rate"))
  }

  /** Referential-integrity audit of one declared foreign key: how many
    * child rows point at a parent key that does not exist?
    *
    * Shape: the child side collapses to (fk, count) FIRST — the
    * anti-join then runs over the child's key domain, not its row
    * count (a 10^12-row fact table with 10^7 distinct keys anti-joins
    * 10^7 rows). NULL foreign keys are reported separately (they are
    * "not linked", not "dangling").
    *
    * Output one row: audit name, child rows, null-fk rows, distinct
    * fks, orphan fks, orphan rows, orphan row rate.
    */
  def riAudit(child: DataFrame, name: String, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val perKey = child.groupBy(col(fkCol).as("__fk"))
      .agg(count(lit(1)).as("__c"))
    val nulls = perKey.where(col("__fk").isNull)
      .agg(coalesce(sum(col("__c")), lit(0L)).cast("long")
        .as("null_fk_rows"))
    val nonNull = perKey.where(col("__fk").isNotNull)
    val orphans = nonNull.join(
      parent.select(col(pkCol).as("__pk")).distinct(),
      col("__fk") === col("__pk"), "left_anti")
    val tot = child.agg(count(lit(1)).cast("long").as("n_rows"))
    val keyStats = nonNull.agg(
      count(lit(1)).cast("long").as("n_fks"))
    val orphanStats = orphans.agg(
      count(lit(1)).cast("long").as("orphan_fks"),
      coalesce(sum(col("__c")), lit(0L)).cast("long").as("orphan_rows"))
    tot.crossJoin(nulls).crossJoin(keyStats).crossJoin(orphanStats)
      .select(lit(name).as("audit"), col("n_rows"), col("null_fk_rows"),
        col("n_fks"), col("orphan_fks"), col("orphan_rows"),
        (col("orphan_rows").cast("double") / col("n_rows").cast("double"))
          .as("orphan_rate"))
  }

  /** Seeded Laplace mechanism for a differentially-private count
    * release: per-group counts plus Laplace(1/epsilon) noise drawn by
    * inverse CDF from the PORTABLE group-keyed hash (Dwork et al.
    * 2006; noise = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|) with
    * u uniform on (0,1)).
    *
    * The draw is deterministic per (seed, group): the same release
    * re-run on the same snapshot is bit-identical — the reproducible-
    * release discipline; rotating `seed` per release period restores
    * draw freshness.
    *
    * SECURITY CAVEAT: determinism trades on the seed's secrecy. An
    * adversary who learns `seed` can recompute every noise draw exactly
    * and recover the true counts, so the release is formally
    * epsilon-DP only if the seed is (a) kept secret like a key and
    * (b) used for AT MOST ONE release per snapshot — reusing a seed
    * across releases of overlapping data lets noise cancel in
    * differences. Treat `seed` as a single-use secret; the
    * reproducibility win is for the data owner's own audit replays,
    * never a license to publish the seed.
    *
    * u = (hash + 1/2) / P sits strictly inside (0,1),
    * so the log argument is strictly positive and ANSI mode cannot
    * throw. One hash aggregation + per-row scalar math; nothing
    * drawn on the driver.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, seed: String): DataFrame = {
    require(epsilon > 0, "dpNoisyCounts: epsilon must be positive")
    import graft.queries.Q
    val keys = groupCols.map(col)
    val keyStr = concat_ws("|", lit(seed) +: keys: _*)
    val u = (Hashing.hashP(keyStr).cast("double") + lit(0.5)) /
      lit(Hashing.P.toDouble)
    val centered = u - lit(0.5)
    val noise = Q.sig9(lit(-1.0 / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered)))
    df.groupBy(keys: _*).agg(count(lit(1)).cast("long").as("n_true"))
      .select(keys :+ col("n_true") :+ noise.as("noise") :+
        Q.sig9(col("n_true").cast("double") + noise).as("n_released"): _*)
  }

  /** t-closeness audit over one declared quasi-identifier set and an
    * ORDERED sensitive attribute (Li, Li & Venkatasubramanian, ICDE
    * 2007): per equivalence class, the Earth Mover's Distance between
    * the class's sensitive-value distribution and the table-wide one,
    * with unit ground distance between adjacent values of the sorted
    * domain and the standard (m-1) normalization — so t_emd is in
    * [0, 1] and a class passes iff t_emd <= t. k-anonymity bounds who
    * you might be; t-closeness bounds what the class LEAKS about the
    * sensitive attribute even when the class is large.
    *
    * For the ordered-domain EMD the optimal transport telescopes:
    * EMD = sum_j |sum_{i<=j} (q_i - p_i)| / (m - 1) over the sorted
    * domain — no assignment problem, one cumulative pass.
    *
    * Shape: one groupBy(QI, value) cell aggregation, one groupBy(QI)
    * roll-up, and a broadcast of the BOUNDED sorted domain (global
    * per-value counts, |domain| rows); the cumulative fold runs inside
    * a per-class array over that bounded domain. O(classes * m) total
    * work after the cell aggregation — no window over anything
    * unbounded, no per-class rescan.
    *
    * Determinism: q_i - p_i is a difference of exact integer ratios
    * (bit-identical IEEE divisions on both engines), the cumulative
    * and absolute sums accumulate in DECIMAL (exact, order-free), and
    * the single final division is sig9'd.
    *
    * @return one row per equivalence class: QI columns, n_rows,
    *         t_emd, t_close (t_emd <= t) */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness: need at least one QI column")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    import graft.queries.Q
    val decAcc = DecimalType(25, 15)
    val qi = quasiCols.map(col)
    val base = df.where(col(sensitiveCol).isNotNull)
      .select(qi :+ col(sensitiveCol).cast("long").as("__sv"): _*)
    // bounded sorted domain with global counts, packed into ONE row
    val dom = base.groupBy(col("__sv")).agg(count(lit(1)).as("__gc"))
      .agg(array_sort(collect_list(struct(col("__sv"), col("__gc"))))
        .as("__dom"), sum(col("__gc")).cast("long").as("__nt"))
    val cells = base.groupBy(qi :+ col("__sv"): _*)
      .agg(count(lit(1)).as("__c"))
    val classes = cells.groupBy(qi: _*)
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        map_from_entries(collect_list(struct(col("__sv"), col("__c"))))
          .as("__cm"))
    // cumulative |sum (q - p)| over the broadcast domain, in decimal
    val diffs = transform(col("__dom"), e =>
      (coalesce(element_at(col("__cm"), e.getField("__sv")), lit(0L))
        .cast(DoubleType) / col("n_rows").cast(DoubleType) -
        e.getField("__gc").cast(DoubleType) / col("__nt").cast(DoubleType))
        .cast(decAcc))
    val folded = aggregate(diffs,
      struct(lit(0L).cast(decAcc).as("cum"), lit(0L).cast(decAcc).as("tot")),
      (acc, d) => {
        val cum = (acc.getField("cum") + d).cast(decAcc)
        struct(cum.as("cum"),
          (acc.getField("tot") + abs(cum)).cast(decAcc).as("tot"))
      },
      acc => acc.getField("tot"))
    // decimal-out at scale 13 (|tot| < 100 keeps <= 15 sig digits) so
    // the DECIMAL -> DOUBLE cast is exact on both engines before the
    // single division + sig9
    classes.crossJoin(broadcast(dom))
      .select(qi :+ col("n_rows") :+
        when(size(col("__dom")) <= 1, lit(0.0))
          .otherwise(Q.sig9(Q.decOut(folded, 13) /
            (size(col("__dom")) - 1).cast(DoubleType))).as("t_emd"): _*)
      .withColumn("t_close", col("t_emd") <= t)
  }

  /** Candidate-key uniqueness audit: does `cols` identify rows?
    *
    * Output: one row — total rows, distinct key combinations,
    * duplicate rows (rows beyond the first in each key group), and the
    * uniqueness ratio. A ratio of 1.0 certifies the key; below it, the
    * duplicate-row count is the dedup workload.
    */
  def keyAudit(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    val ks = cols.map(col)
    df.groupBy(ks: _*).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_distinct"))
      .select(lit(name).as("audit"), col("n_rows"), col("n_distinct"),
        (col("n_rows") - col("n_distinct")).as("dup_rows"),
        (col("n_distinct").cast("double") / col("n_rows").cast("double"))
          .as("uniqueness"))
  }
}
