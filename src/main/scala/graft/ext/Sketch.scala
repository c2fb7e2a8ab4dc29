package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) built relationally —
  * the mergeable frequency summary a streaming/telemetry pipeline keeps
  * when the key domain is too large to count exactly: d independent
  * hash rows of w buckets; every key increments one bucket per row;
  * a point estimate is the MIN over its d bucket sums (always an
  * OVERestimate — collisions only add).
  *
  * The sketch here is a d·w-row DataFrame, which is the whole point at
  * scale: building it is ONE map-side-combining aggregate over the
  * stream keyed by (row, bucket) — bounded output regardless of input
  * cardinality; two sketches with the same (d, w, salt) merge by
  * unioning and re-summing (the mergeability law, spec-pinned); point
  * queries broadcast the bounded sketch against the key list. Hashes
  * are the portable salted [[Hashing.hash60]], so the same sketch is
  * reproducible in any engine and across incremental batches.
  *
  * Everything is exact integer arithmetic — estimates adjudicate
  * bit-for-bit with no float contract at all.
  */
object Sketch {

  /** Build the sketch: one row per OCCUPIED (row j, bucket) pair with
    * its count sum (absent buckets are zero — padding is the reader's
    * concern, and estimates only probe occupied buckets' keys).
    *
    * @param items  one row per observation (duplicates count)
    * @return (j, bucket, s) — d·w rows at most */
  def countMin(items: DataFrame, keyCol: String, d: Int, w: Int,
      salt: String): DataFrame = {
    // collapse the stream to (key, count) FIRST: the d-way explode and
    // d hash evaluations then run over the vocabulary, not the corpus
    // (hot keys hash once per row instead of once per occurrence) —
    // bit-identical output, since bucket sums are sums of key counts
    val counts = items
      .select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
    countMinWeighted(counts, "k", "c", d, w, salt)
  }

  /** [[countMin]] over pre-aggregated (key, count) pairs — the
    * incremental-build face: a daily pipeline sketches each batch's
    * count table and merges by union + re-sum. */
  def countMinWeighted(counts: DataFrame, keyCol: String, cntCol: String,
      d: Int, w: Int, salt: String): DataFrame = {
    require(d >= 1 && w >= 1, s"need d,w >= 1, got d=$d w=$w")
    val rows = array((0 until d).map(lit): _*)
    counts
      .select(col(keyCol).cast("string").as("k"),
        col(cntCol).cast("long").as("c"))
      .where(col("k").isNotNull)
      .select(explode(rows).as("j"), col("k"), col("c"))
      .select(col("j"),
        pmod(Hashing.hash60(
          concat(lit(salt), col("j").cast("string"), lit(":"),
            col("k"))), lit(w.toLong)).as("bucket"),
        col("c"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("c")).cast("long").as("s"))
  }

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007) built
    * relationally — the third portable sketch beside the Misra-Gries
    * heavy hitters and [[countMin]]: register table = ONE map-side-
    * combining max-aggregate keyed on the bucket (bounded m = 2^p rows
    * at any input cardinality; two register tables with the same
    * (p, salt) merge by union + max — the HLL merge law, spec-pinned).
    *
    * Portability (no engine-specific hash or bit intrinsic): the
    * 60-bit salted [[Hashing.hash60]] splits into bucket = h mod m and
    * payload w = h div m; the rank rho = (trailing zeros of w) + 1 is
    * computed on the BINARY STRING (length minus length after
    * rtrim '0' — leading-zero conventions cancel out), w = 0 caps at
    * the payload width. 2^-M terms are exact doubles via integer
    * shiftleft (never libm pow); the harmonic sum folds LEFT-TO-RIGHT
    * over bucket-ordered registers (the sqlFold contract) with the
    * empty-register mass (m − occupied) · 1 added in closed form (the
    * complement trick — registers never pad). ln() in the small-range
    * (linear-counting) correction is the single libm step, sig9'd.
    *
    * @param p register-count exponent, m = 2^p; 7..16 (one alpha
    *          formula regime)
    * @return one row: (estimate, raw_est, v_zero, n_occupied, m) —
    *         estimate = linear counting when raw ≤ 2.5m and empty
    *         registers remain, else the raw HLL estimate */
  def hyperLogLog(items: DataFrame, keyCol: String, p: Int,
      salt: String): DataFrame =
    hllEstimate(hllRegisters(items, keyCol, p, salt), p)

  /** The HLL register table alone — (sliceCols..., bucket, M) with
    * M = max rho per bucket WITHIN each slice. This is the mergeable
    * face: registers for any union of slices combine by
    * `groupBy(bucket).max(M)` (the HLL merge law), which is exactly
    * how per-partition/per-day sketches roll up at 100 TB without
    * re-touching the raw keys. [[hllEstimate]] turns any (merged)
    * register table back into the estimate. */
  def hllRegisters(items: DataFrame, keyCol: String, p: Int,
      salt: String, sliceCols: Seq[String] = Seq.empty): DataFrame = {
    require(p >= 7 && p <= 16, s"p must be in 7..16, got $p")
    val m = 1L << p
    val payloadBits = 60 - p
    val slices = sliceCols.map(col)
    items
      .select(slices :+ col(keyCol).cast("string").as("k"): _*)
      .where(col("k").isNotNull)
      .select(slices :+
        Hashing.hash60(concat(lit(s"$salt:"), col("k"))).as("h"): _*)
      .select(slices :+ (col("h") % m).as("bucket") :+
        expr(s"h div CAST($m AS BIGINT)").as("w"): _*)
      .withColumn("rho",
        when(col("w") === 0L, lit(payloadBits + 1L))
          .otherwise(
            length(conv(col("w").cast("string"), 10, 2)) -
              length(rtrim(conv(col("w").cast("string"), 10, 2), "0"))
              + 1L))
      .groupBy(slices :+ col("bucket"): _*)
      .agg(max(col("rho")).cast("long").as("M"))
  }

  /** Estimate from a register table (merging duplicate buckets by max
    * first, so a UNION of slice registers feeds in directly). Same
    * output row as [[hyperLogLog]]. */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    hllEstimateBySlice(registers, p, Seq.empty)
      .select(col("estimate"), col("raw_est"), col("v_zero"),
        col("n_occupied"), col("m"))

  /** Per-slice [[hllEstimate]]: one estimate row per distinct value of
    * `sliceCols` in the register table (e.g. per node for
    * [[Graph.hyperBall]], per day for a rollup readback). The same
    * formula as the global estimate, keyed — empty `sliceCols` is the
    * one-row global aggregate. */
  def hllEstimateBySlice(registers: DataFrame, p: Int,
      sliceCols: Seq[String]): DataFrame = {
    require(p >= 7 && p <= 16, s"p must be in 7..16, got $p")
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val slices = sliceCols.map(col)
    val regs = registers.groupBy(slices :+ col("bucket"): _*)
      .agg(max(col("M")).cast("long").as("M"))
    val agg = regs
      .groupBy(slices: _*)
      .agg(count(lit(1)).cast("long").as("occ"),
        array_sort(collect_list(struct(col("bucket"), col("M"))))
          .as("arr"))
      .withColumn("sregs", expr(
        "aggregate(transform(arr, e -> CAST(1.0 AS DOUBLE) / " +
          "CAST(shiftleft(CAST(1 AS BIGINT), e.M) AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"))
    val vZero = lit(m) - col("occ")
    val s = vZero.cast("double") + col("sregs")
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / s
    agg.select(slices :+
      graft.queries.Q.sig9(
        when(raw <= 2.5 * m && vZero > 0L,
          lit(m.toDouble) *
            graft.queries.Q.sig9(log(lit(m.toDouble) /
              vZero.cast("double"))))
          .otherwise(raw)).as("estimate") :+
      graft.queries.Q.sig9(raw).as("raw_est") :+
      vZero.cast("long").as("v_zero") :+
      col("occ").as("n_occupied") :+
      lit(m).as("m"): _*)
  }

  /** Point-estimate each key in `keys` against a sketch built with the
    * SAME (d, w, salt): est = min over the d rows of the bucket sum
    * (0 when a probed bucket is unoccupied — the key was never seen
    * and nothing collided into any of its buckets).
    *
    * The sketch side is bounded (≤ d·w rows) and broadcast; the key
    * side can be corpus-sized. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int, salt: String): DataFrame = {
    require(d >= 1 && w >= 1, s"need d,w >= 1, got d=$d w=$w")
    val rows = array((0 until d).map(lit): _*)
    val probes = keys
      .select(col(keyCol).cast("string").as("k")).distinct()
      .select(col("k"), explode(rows).as("j"))
      .select(col("k"), col("j"),
        pmod(Hashing.hash60(
          concat(lit(salt), col("j").cast("string"), lit(":"),
            col("k"))), lit(w.toLong)).as("bucket"))
    probes
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("s"), lit(0L))).cast("long").as("est"))
      .select(col("k").as(keyCol), col("est"))
  }

  /** Equi-width histogram sketch of one value column, built per shard
    * and merged — the fourth portable sketch (beside Misra-Gries,
    * count-min, HLL) and the mergeable-state form of distributed
    * quantile serving: per-partition histograms with a FIXED global
    * binning merge by plain count addition (the histogram merge law),
    * so a 100 TB fleet sums 10^5 tiny per-file sketches instead of
    * sorting anything.
    *
    * Output: (bin, cnt) rows, bins 0..bins-1; values clamp to the edge
    * bins, so out-of-declared-range data degrades the edge estimate
    * rather than erroring. Bin assignment floor((x-lo)/w) is one IEEE
    * chain shared with the oracle.
    */
  def histSketch(df: DataFrame, valCol: String, shardCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "histSketch: need bins >= 1, hi > lo")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valCol).cast("double") - lo) / w).cast("long"),
      lit(0L)), lit(bins - 1L))
    // per-shard sketches first, then the merge — structurally the
    // incremental path (merge == direct recompute because addition is
    // associative over a FIXED binning; the oracle recomputes direct)
    df.where(col(valCol).isNotNull)
      .groupBy(col(shardCol).as("__shard"), bin.as("bin"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("bin"))
      .agg(sum(col("__c")).cast("long").as("cnt"))
  }

  /** Quantile estimates served from a merged [[histSketch]]: for each
    * requested permille q, the smallest bin whose cumulative count
    * reaches q*n/1000, linearly interpolated inside the bin; the
    * half-bin-width error bound rides along. The bounded bin table
    * (<= `bins` rows) folds in ONE packed-array row — no window, no
    * sort beyond the in-row array_sort.
    */
  def histQuantiles(sketch: DataFrame, qPermille: Seq[Int], lo: Double,
      hi: Double, bins: Int): DataFrame = {
    import graft.queries.Q
    require(qPermille.nonEmpty &&
      qPermille.forall(q => q > 0 && q <= 1000),
      "histQuantiles: permilles must be in (0, 1000]")
    val w = (hi - lo) / bins
    val packed = sketch
      .agg(array_sort(collect_list(struct(col("bin"), col("cnt"))))
        .as("arr"), sum(col("cnt")).cast("long").as("n"))
    val qArr = array(qPermille.map(lit): _*)
    val rows = packed.select(col("n"), explode(qArr).as("q_permille"),
      col("arr"))
    // fold: find (bin, cumBefore, cnt) of the target bin — state packed
    // as [foundFlag, bin, cumBefore, cnt]; all-integer comparisons
    // (cum*1000 >= q*n) so the bin choice is exact on both engines
    val init = array(lit(0L), lit(0L), lit(0L), lit(0L))
    // every branch REBUILDS the state array (never returns acc itself):
    // DuckDB 1.0's list_reduce corrupts the accumulator once an
    // identity branch fires twice (the q_x_interleave finding), and the
    // oracle mirrors this fold verbatim
    val st = aggregate(col("arr"), init, (acc, e) => {
      val found = element_at(acc, 1) === 1L
      val cum = element_at(acc, 3) + element_at(acc, 4)
      val hits = (cum + e.getField("cnt")) * 1000 >=
        col("q_permille") * col("n")
      when(found, array(lit(1L), element_at(acc, 2), element_at(acc, 3),
        element_at(acc, 4)))
        .otherwise(when(hits,
          array(lit(1L), e.getField("bin"), cum, e.getField("cnt")))
          .otherwise(array(lit(0L), e.getField("bin"), cum,
            e.getField("cnt"))))
    })
    val s = rows.withColumn("__st", st)
      .where(element_at(col("__st"), 1) === 1L)
      .select(col("q_permille").cast("long").as("q_permille"), col("n"),
        element_at(col("__st"), 2).as("bin"),
        element_at(col("__st"), 3).as("cum_before"),
        element_at(col("__st"), 4).as("bin_cnt"))
    val frac = Q.sig9(
      (col("q_permille").cast("double") * col("n").cast("double") /
        lit(1000.0) - col("cum_before").cast("double")) /
        col("bin_cnt").cast("double"))
    s.select(col("q_permille"), col("n"), col("bin"),
      Q.sig9(lit(lo) + lit(w) *
        (col("bin").cast("double") + frac)).as("estimate"),
      Q.sig9(lit(w) / lit(2.0)).as("max_err"))
  }

  /** Size of the [[Hashing.hash60]] space, 2^60, as an EXACT double
    * (a power of two is exactly representable) — the KMV estimator's
    * numerator scale, one shared literal on both engines. */
  val KmvH: Double = 1152921504606846976.0

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et
    * al. 2007 "On synopses for distinct-value estimation") — the fifth
    * portable sketch, and the one that closes the gap HLL leaves open:
    * two bottom-k sketches answer UNION **and INTERSECTION** distinct
    * estimates ([[kmvSetEstimates]]); HLL registers only union.
    *
    * The sketch is the k smallest distinct salted 60-bit key hashes.
    * Build is per shard first — a KEYED window (rank pushdown plans a
    * WindowGroupLimit; never a global sort) — then the bounded union
    * (<= shards·k rows) merges to the global bottom-k in ONE
    * packed-array row. Merge law, spec-pinned:
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — so per-file
    * sketches at 100 TB roll up by union + re-truncate without
    * re-touching keys, exactly like the other four sketches.
    *
    * @return (h) rows — the <= k smallest distinct key hashes */
  def kmvSketch(items: DataFrame, keyCol: String, shardCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 2, s"kmvSketch: need k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val hashed = items
      .where(col(keyCol).isNotNull)
      .select(col(shardCol).as("__shard"),
        Hashing.hash60(concat(lit(s"$salt:"),
          col(keyCol).cast("string"))).as("h"))
      .distinct()
    // per-shard (__shard, h) is distinct, so the h-ordering is total
    // within a shard and row_number is deterministic
    val w = Window.partitionBy(col("__shard")).orderBy(col("h"))
    hashed
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select(col("h"))
      .distinct() // one key can appear in several shards
      .agg(slice(array_sort(collect_list(col("h"))), 1, k).as("arr"))
      .select(explode(col("arr")).as("h"))
  }

  /** Distinct-count estimate from a (merged) [[kmvSketch]]: with hash
    * space H = 2^60, est = (k-1)·H / h_(k); a sketch holding fewer
    * than k hashes saw the WHOLE key set, so the count is exact (= n).
    * One bounded aggregate; the single division sig9s. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch
      .agg(count(lit(1)).cast("long").as("n_sketch"),
        max(col("h")).as("theta"))
      .select(col("n_sketch"),
        graft.queries.Q.sig9(
          when(col("n_sketch") < k, col("n_sketch").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(KmvH) /
              col("theta").cast("double"))).as("est"))

  /** Union, intersection and difference distinct estimates from two
    * [[kmvSketch]]es built with the SAME (k, salt) (Beyer et al.
    * 2007): the union sketch K∪ = bottom-k of the two hash sets;
    * est_union from K∪'s k-th hash as in [[kmvEstimate]]; for any
    * membership class C of K∪ (both sides, A-only, B-only),
    * est_C = |C|/k' · est_union with k' = |K∪| — so intersection AND
    * both set differences fall out of the same bounded frame.
    * Membership flags inside K∪ are faithful by the bottom-k order
    * (an A∩B hash above A's threshold cannot reach K∪: all k of A's
    * smaller hashes precede it). When k' < k both inputs were exact
    * and every estimate is an exact count. Everything folds over ONE
    * bounded (<= 2k) packed array; only the final scalings sig9.
    *
    * @return rows (set_label, n_sketch, est) for "union",
    *         "intersect", "a_not_b", "b_not_a" */
  def kmvSetEstimates(skA: DataFrame, skB: DataFrame,
      k: Int): DataFrame = {
    import graft.queries.Q
    val both = skA.select(col("h"), lit(1L).as("ia"))
      .join(skB.select(col("h"), lit(1L).as("ib")), Seq("h"), "full")
      .select(col("h"), coalesce(col("ia"), lit(0L)).as("ia"),
        coalesce(col("ib"), lit(0L)).as("ib"))
    def classCount(f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) =
      (acc: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column) => acc + f(e)
    val packed = both
      .agg(slice(array_sort(collect_list(struct(col("h"), col("ia"),
        col("ib")))), 1, k).as("arr"))
      .select(size(col("arr")).cast("long").as("kp"),
        // empty union sketch (both inputs empty): no k-th hash to
        // read — kp = 0 < k routes every estimate to the exact branch
        when(size(col("arr")) === 0, lit(0L))
          .otherwise(element_at(col("arr"), size(col("arr")))
            .getField("h")).as("theta"),
        aggregate(col("arr"), lit(0L), classCount(e =>
          e.getField("ia") * e.getField("ib"))).as("rho"),
        aggregate(col("arr"), lit(0L), classCount(e =>
          e.getField("ia") * (lit(1L) - e.getField("ib"))))
          .as("rho_a"),
        aggregate(col("arr"), lit(0L), classCount(e =>
          (lit(1L) - e.getField("ia")) * e.getField("ib")))
          .as("rho_b"))
    val estU = Q.sig9(
      when(col("kp") < k, col("kp").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(KmvH) /
          col("theta").cast("double")))
    val withU = packed.select(col("kp"), col("rho"), col("rho_a"),
      col("rho_b"), estU.as("est_u"))
    def classRow(label: String, rhoCol: String) =
      withU.select(lit(label).as("set_label"),
        col(rhoCol).as("n_sketch"),
        when(col("kp") < k, col(rhoCol).cast("double"))
          .otherwise(Q.sig9(col(rhoCol).cast("double") * col("est_u") /
            lit(k.toDouble))).as("est"))
    withU.select(lit("union").as("set_label"),
        col("kp").as("n_sketch"), col("est_u").as("est"))
      .unionAll(classRow("intersect", "rho"))
      .unionAll(classRow("a_not_b", "rho_a"))
      .unionAll(classRow("b_not_a", "rho_b"))
  }

  /** Join-cardinality estimate from two [[countMin]] sketches built
    * with the SAME (d, w, salt): |A ⋈_key B| = Σ_key cA·cB is
    * estimated by the sketch inner product min_j Σ_b sA[j,b]·sB[j,b]
    * (Cormode & Muthukrishnan 2005 §4.2) — an upper bound (collisions
    * only add) that two O(d·w) summaries answer WITHOUT running the
    * join. This is the planner face of the sketch family: at 100 TB
    * the question "how big is this join" is answered from kilobytes.
    * Products route through DECIMAL(38,0) — fleet-scale bucket sums
    * exceed 2^31 and a long×long product would overflow.
    *
    * @return one row (est_card) */
  def cmsJoinCardinality(skA: DataFrame, skB: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // every hash row j must contribute: a j whose buckets do not
    // overlap has inner product 0 — PROOF the join is empty — and an
    // inner join would silently drop it (min over the surviving rows
    // then OVERestimates; two disjoint sketches returned NULL). The j
    // domain comes from the sketches themselves (a nonempty sketch
    // carries every j; two empty sketches estimate 0).
    val js = skA.select(col("j")).unionAll(skB.select(col("j")))
      .distinct()
    val prods = skA.select(col("j"), col("bucket"), col("s").as("sa"))
      .join(skB.select(col("j"), col("bucket"), col("s").as("sb")),
        Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("sa").cast(DecimalType(38, 0)) *
        col("sb").cast(DecimalType(38, 0))).as("ip"))
    js.join(prods, Seq("j"), "left")
      .agg(coalesce(min(coalesce(col("ip"),
        lit(0L).cast(DecimalType(38, 0)))), lit(0L).cast(
        DecimalType(38, 0))).cast("long").as("est_card"))
  }
}
