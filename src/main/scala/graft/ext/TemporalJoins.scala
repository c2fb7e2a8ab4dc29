package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively: as-of join and
  * interval/range join. Both are implemented with scale-safe plans —
  * a single keyed shuffle for the as-of join (no join at all), and
  * coarse-bucket blocking for the range join (equi-join on a derived
  * bucket key; never a nested-loop / cartesian comparison).
  *
  * The reference has no temporal joins (SURVEY.md §2.D: equi-joins
  * only), but a training-data pipeline needs them constantly — attach
  * the latest model-version / config snapshot to each example (as-of),
  * or collect all events inside an incident/campaign window (range).
  */
object TemporalJoins {

  /** As-of join: for each probe row, attach the payload of the most
    * recent quote row with the same key and quote time <= probe time
    * (inclusive). Left semantics: probes with no preceding quote keep
    * NULL payload.
    *
    * Plan: tag both sides, unionByName, one window over (keys, time)
    * filling last(quote-row STRUCT, ignoreNulls) — a SINGLE shuffle on
    * the key columns, linear scan within each partition. This is the
    * 100 TB plan: no per-row subquery, no range join, and skew is
    * bounded by the per-key series length, exactly like any keyed
    * window.
    *
    * The payload travels as ONE struct so the probe row always gets the
    * columns of a single real quote row. (Filling each payload column
    * independently with last(col, ignoreNulls) — the obvious shape —
    * is WRONG when payload values can be NULL: a latest quote
    * (a=NULL, b=5) over an older (a=3, b=7) would stitch (a=3, b=5),
    * a row that never existed. The struct itself is never NULL on a
    * quote row, so ignoreNulls skips only probe rows.)
    *
    * Ties: quotes sort before probes at equal time (inclusive as-of);
    * among equal-time quotes the one with the greatest `tieBreak`
    * value wins — pass a unique column to make the result
    * deterministic when (key, time) can repeat on the quote side.
    *
    * Direction: "backward" (default) attaches the latest quote at or
    * before the probe time — the market-data/feature-snapshot shape;
    * "forward" attaches the EARLIEST quote at or after it — the
    * next-maintenance / next-session shape (pandas merge_asof
    * direction='forward'). Forward is the SAME plan with only the time
    * sort mirrored (desc): the fill stays `last` over the running
    * [unboundedPreceding, currentRow] frame, which Spark evaluates
    * incrementally — an UnboundedFollowing frame would be recomputed
    * per row, O(n^2) on a hot key.
    *
    * Tolerance: with `toleranceSeconds` set, a probe matches only a
    * quote within that many seconds (pandas merge_asof tolerance);
    * staler matches revert to the no-match NULL payload. Because the
    * as-of candidate is the NEAREST quote in the match direction,
    * "nearest is too stale" implies every other candidate is staler —
    * so nulling the filled payload after the window is exactly "match
    * only within tolerance", at zero extra plan cost (a map-side
    * projection on the already-filled row; `timeCol` must be a
    * timestamp when a tolerance is used).
    *
    * @param payload quote columns to carry onto probe rows; names must
    *                not collide with probe columns.
    */
  def asOfJoin(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               tieBreak: Column = lit(0L),
               direction: String = "backward",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val side = "__graft_side"
    val tie = "__graft_tie"
    val pay = "__graft_pay"
    val qts = "__graft_qts"
    val probeCols = probes.columns.toSeq
    val p = probes.withColumn(side, lit(1)).withColumn(tie, lit(null).cast("long"))
    val q = quotes
      .withColumn(tie, tieBreak.cast("long")) // before projecting quote cols away
      .select((keys :+ timeCol).map(col) :+ col(tie) :+
        struct(payload.map(col) :+ col(timeCol).as(qts): _*).as(pay): _*)
      .withColumn(side, lit(0))
    // probe rows get pay = NULL from the missing-column union, so the
    // ignoreNulls fill skips them and lands on whole quote rows only.
    // In both directions quotes sort toward the probe (side asc at equal
    // time => inclusive) and the greatest tieBreak lands nearest it.
    val unioned = p.unionByName(q, allowMissingColumns = true)
    val timeOrd = if (backward) col(timeCol).asc else col(timeCol).desc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col(side).asc, col(tie).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    val gated = toleranceSeconds match {
      case Some(t) =>
        require(t >= 0, s"toleranceSeconds must be >= 0, got $t")
        // cast-to-double keeps fractional seconds; unix_timestamp()
        // truncates to whole seconds and would misclassify sub-second
        // staleness exactly at the boundary (merge_asof is exact)
        val staleness =
          if (backward)
            col(timeCol).cast("double") -
              col(pay).getField(qts).cast("double")
          else
            col(pay).getField(qts).cast("double") -
              col(timeCol).cast("double")
        // NULL payload (no match) keeps NULL: staleness is NULL, the
        // when() falls through to the null branch
        filled.withColumn(pay, when(staleness <= t.toDouble, col(pay)))
      case None => filled
    }
    gated
      .select(probeCols.map(col) ++
        payload.map(c => col(pay).getField(c).as(c)) :+
        col(pay).getField(qts).as("asof_time"): _*)
  }

  /** Interval containment join: count (or collect) the rows of `points`
    * whose `pointTime` falls inside each [lo, hi] interval of
    * `intervals`. Left semantics: empty intervals keep n = 0.
    *
    * Plan: block on a coarse time bucket. Each interval explodes to the
    * (few) buckets it overlaps via `sequence`; each point has exactly
    * one bucket, so the bucket equi-join matches every qualifying pair
    * exactly once — no dedup needed — and Catalyst runs it as a plain
    * shuffle (or broadcast) hash join. Cost is |points| + sum of
    * interval spans / bucketLen, never |points| x |intervals|. Pick
    * bucketSeconds close to the typical interval length so most
    * intervals explode to 1-2 buckets.
    */
  /** Multi-touch LINEAR attribution: each conversion's value splits
    * equally over the same key's touchpoints strictly before it and
    * within `windowSeconds` — the marketing-analytics complement of
    * the last-touch as-of join (one row of credit per qualifying
    * (touch, conversion) pair, aggregated per touch).
    *
    * Plan: the [[rangeJoinCount]] bucket-blocking trick, keyed — each
    * conversion explodes to the few coarse buckets its window spans,
    * each touch sits in exactly one bucket, and the (key, bucket)
    * equi-join matches every qualifying pair exactly once. Cost is
    * |touches| + |conversions|·(window/bucketLen) + pairs, never
    * |touches| × |conversions|. Per-conversion touch counts and the
    * per-touch credit rollup are two keyed hash aggregates; credit is
    * one exact IEEE division, sig9-NORMALIZED before the decimal
    * rollup — a raw quotient's 15th decimal is itself a rounding the
    * engines may disagree on by 1e-15 (Spark casts the shortest-repr
    * string to DECIMAL, DuckDB the binary value), while a 9-digit
    * value casts exactly on both (the PageRank term contract).
    *
    * @return (keys..., touch_id, n_conversions, credited) for touches
    *         with >= 1 attributed conversion */
  def multiTouch(conversions: DataFrame, convId: String, convTs: String,
      valCol: String, touches: DataFrame, touchId: String, touchTs: String,
      keys: Seq[String], windowSeconds: Long,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(windowSeconds > 0 && bucketSeconds > 0,
      "window and bucket must be positive")
    val b = lit(bucketSeconds)
    val cv = conversions.select(keys.map(col) :+ col(convId).as("__pid") :+
        col(convTs).as("__pts") :+ col(valCol).as("__val"): _*)
      .withColumn("__bucket", explode(sequence(
        floor((unix_timestamp(col("__pts")) - windowSeconds) / b)
          .cast("long"),
        floor(unix_timestamp(col("__pts")) / b).cast("long"))))
    val tv = touches.select(keys.map(col) :+ col(touchId).as("__tid") :+
        col(touchTs).as("__tts"): _*)
      .withColumn("__bucket",
        floor(unix_timestamp(col("__tts")) / b).cast("long"))
    val pairs = cv.join(tv, keys :+ "__bucket")
      .where(col("__tts") < col("__pts") &&
        col("__tts") >= col("__pts") -
          expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(keys.map(col) :+ col("__pid") :+ col("__val") :+
        col("__tid"): _*)
    val nt = pairs.groupBy("__pid").agg(count(lit(1)).as("__nt"))
    pairs.join(nt, "__pid")
      .withColumn("__credit", col("__val") / col("__nt"))
      .groupBy(keys.map(col) :+ col("__tid").as("touch_id"): _*)
      .agg(count(lit(1)).as("n_conversions"),
        graft.queries.Q.dsum(
          graft.queries.Q.sig9(col("__credit"))).as("credited"))
  }

  def rangeJoinCount(intervals: DataFrame, idCol: String, loCol: String,
                     hiCol: String, points: DataFrame, pointTime: String,
                     bucketSeconds: Long = 3600L): DataFrame = {
    val b = lit(bucketSeconds)
    val iv = intervals.select(col(idCol), col(loCol), col(hiCol),
      explode(sequence(floor(unix_timestamp(col(loCol)) / b).cast("long"),
        floor(unix_timestamp(col(hiCol)) / b).cast("long"))).as("__bucket"))
    val pt = points
      .select(col(pointTime).as("__pt"),
        floor(unix_timestamp(col(pointTime)) / b).cast("long").as("__bucket"))
    iv.join(pt,
        iv("__bucket") === pt("__bucket") &&
          col("__pt") >= col(loCol) && col("__pt") <= col(hiCol),
        "left")
      .groupBy(col(idCol))
      .agg(count(col("__pt")).as("n_in_window"))
  }
}
