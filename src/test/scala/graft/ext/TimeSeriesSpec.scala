package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (key, event_id, ts, value)
  private def ev(rows: (String, Long, String, Double)*): DataFrame =
    rows.map { case (k, id, t, v) => (k, id, ts(t), v) }
      .toDF("k", "id", "ts", "v")

  test("resample: OHLC per bucket, first/last by (ts, tieBreak)") {
    val bars = TimeSeries.resample(
      ev(("a", 1, "2024-01-01 00:05:00", 10.0),
        ("a", 2, "2024-01-01 00:20:00", 30.0),
        ("a", 3, "2024-01-01 00:50:00", 20.0),
        ("a", 4, "2024-01-01 01:10:00", 5.0),
        ("b", 5, "2024-01-01 00:30:00", 7.0)),
      Seq("k"), "ts", "v", bucketSeconds = 3600L, tieBreak = col("id"))
      .select(col("k"), date_format(col("bucket_ts"), "HH:mm").as("b"),
        col("open_v"), col("high_v"), col("low_v"), col("close_v"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(bars === Set(
      ("a", "00:00", 10.0, 30.0, 10.0, 20.0, 3L),
      ("a", "01:00", 5.0, 5.0, 5.0, 5.0, 1L),
      ("b", "00:00", 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("resample: equal-timestamp rows resolve by tieBreak, not luck") {
    val bars = TimeSeries.resample(
      ev(("a", 2, "2024-01-01 00:10:00", 99.0),
        ("a", 1, "2024-01-01 00:10:00", 11.0)),
      Seq("k"), "ts", "v", 3600L, col("id")).collect()
    assert(bars.length === 1)
    val r = bars.head
    assert(r.getAs[Double]("open_v") === 11.0) // id 1 first
    assert(r.getAs[Double]("close_v") === 99.0) // id 2 last
  }

  private def interp(df: DataFrame, step: Long = 3600L) =
    TimeSeries.interpolate(df, Seq("k"), "ts", "v", step)
      .select(col("k"), date_format(col("ts"), "MM-dd HH:mm").as("g"),
        col("value_interp"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet

  test("interpolate: linear between brackets, exact on samples") {
    // samples at 00:30 (v=10) and 02:30 (v=30); hourly grid points at
    // 01:00 and 02:00 interpolate 1/4 and 3/4 of the way
    val g = interp(ev(
      ("a", 1, "2024-01-01 00:30:00", 10.0),
      ("a", 2, "2024-01-01 02:30:00", 30.0),
      // b has a sample exactly ON a grid point
      ("b", 3, "2024-01-01 01:00:00", 5.0),
      ("b", 4, "2024-01-01 03:00:00", 9.0)))
    assert(g === Set(
      ("a", "01-01 01:00", 15.0), ("a", "01-01 02:00", 25.0),
      ("b", "01-01 01:00", 5.0), ("b", "01-01 02:00", 7.0),
      ("b", "01-01 03:00", 9.0)))
  }

  test("interpolate: span with no aligned grid point yields no rows") {
    // both samples inside (01:00, 02:00) — ceil(lo) > floor(hi)
    val g = interp(ev(
      ("a", 1, "2024-01-01 01:10:00", 1.0),
      ("a", 2, "2024-01-01 01:50:00", 2.0)))
    assert(g === Set.empty)
  }

  test("interpolate: equal-timestamp samples reduce to max before as-of") {
    val g = interp(ev(
      ("a", 1, "2024-01-01 01:00:00", 3.0),
      ("a", 2, "2024-01-01 01:00:00", 8.0))) // same ts — max wins
    assert(g === Set(("a", "01-01 01:00", 8.0)))
  }

  test("interpolate: single-sample key emits exactly its aligned point") {
    val g = interp(ev(("a", 1, "2024-01-01 05:00:00", 4.0)))
    assert(g === Set(("a", "01-01 05:00", 4.0)))
  }

  test("cusum: window identity equals the direct recursion exactly") {
    import graft.functions.GraftMath
    val xs = Seq(3.0, -1.0, 4.0, 4.0, -9.0, 6.0, 2.0, -0.5)
    val drift = 1.0
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, ts(f"2024-01-01 ${i}%02d:00:00"), v) }
      .toDF("k", "id", "ts", "v")
    val got = TimeSeries.cusum(df, Seq("k"), "ts", "v", drift, 5.0, "id")
      .orderBy("id").select("s_stat", "alarm")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1))).toSeq
    // direct recursion in exact decimal: S_t = max(0, S_{t-1} + x9 - k)
    var s = BigDecimal(0)
    val exp = xs.map { v =>
      val inc = BigDecimal(GraftMath.sig9(v) - drift)
        .setScale(15, BigDecimal.RoundingMode.HALF_UP)
      s = (s + inc).max(BigDecimal(0))
      val s9 = GraftMath.sig9(s.toDouble)
      (s9, s9 > 5.0)
    }
    assert(got === exp)
  }

  test("cusum: keys accumulate independently") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 01:00:00"), 10.0),
      ("b", 2L, ts("2024-01-01 01:00:00"), 0.0),
      ("a", 3L, ts("2024-01-01 02:00:00"), 10.0))
      .toDF("k", "id", "ts", "v")
    val got = TimeSeries.cusum(df, Seq("k"), "ts", "v", 1.0, 15.0, "id")
      .collect().map(r => r.getLong(2) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(got(1L) === ((9.0, false)))
    assert(got(3L) === ((18.0, true))) // 9 + 9 crosses 15
    assert(got(2L) === ((0.0, false))) // b unaffected by a's drift
  }

  test("seasonal profile: slot means and residuals") {
    // 2024-01-01 is a Monday (Spark dow = 2); two Mondays 10:00 for
    // key a → mean 15, plus one Tuesday 10:00 slot
    val df = ev(
      ("a", 1, "2024-01-01 10:15:00", 10.0),
      ("a", 2, "2024-01-08 10:45:00", 20.0),
      ("a", 3, "2024-01-02 10:00:00", 7.0))
    val prof = TimeSeries.seasonalProfile(df, Seq("k"), "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(prof === Map(
      ("a", 2L, 10L) -> ((2L, 15.0)),
      ("a", 3L, 10L) -> ((1L, 7.0))))
    val res = TimeSeries.deseasonalize(df,
        TimeSeries.seasonalProfile(df, Seq("k"), "ts", "v"),
        Seq("k"), "ts", "v")
      .select(col("id"), col("resid"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res === Map(1L -> -5.0, 2L -> 5.0, 3L -> 0.0))
  }

  test("gapStats: exact micro gaps, single-event key has null mean") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), 0.0),
      ("a", 2L, ts("2024-01-01 00:00:10"), 0.0),
      ("a", 3L, ts("2024-01-01 00:01:00"), 0.0),
      ("b", 4L, ts("2024-01-01 00:00:00"), 0.0))
      .toDF("k", "id", "ts", "v")
    val r = TimeSeries.gapStats(df, Seq("k"), "ts", "id")
      .collect().map(x => x.getString(0) -> (x.getLong(1),
        Option(x.get(2)), Option(x.get(3)),
        Option(x.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(r("a") === ((2L, Some(60000000L), Some(50000000L), Some(30.0))))
    assert(r("b") === ((0L, None, None, None)))
  }

  // ===== ewma =========================================================

  /** Local replica of the documented bounded-horizon adjusted EWMA:
    * same embedded weight/normalizer doubles, same left-to-right fold,
    * sig9 at the same single point. */
  private def refEwma(xs: Seq[Double], alpha: Double, h: Int)
      : Seq[Double] = {
    val beta = 1.0 - alpha
    val weights = Seq.iterate(1.0, h)(_ * beta)
    val denoms = weights.scanLeft(0.0)(_ + _).tail
    xs.indices.map { t =>
      val arr = xs.slice(math.max(0, t - h + 1), t + 1)
      val n = arr.size
      var acc = 0.0
      arr.zipWithIndex.foreach { case (x, i0) =>
        acc += x * weights(n - 1 - i0) }
      graft.functions.GraftMath.sig9(acc / denoms(n - 1))
    }
  }

  private def runEwma(rows: Seq[(String, Long, String, Double)],
      alpha: Double, h: Int): Map[(String, Long), Double] =
    TimeSeries.ewma(ev(rows: _*).repartition(3), Seq("k"), "ts", "v",
        "id", alpha, h)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        r.getDouble(4)).toMap

  test("ewma: matches the reference recurrence within the horizon; " +
      "first point equals its own value") {
    val xs = Seq(10.0, 20.0, 5.0, 40.0, 1.0, 7.0)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("a", i.toLong, f"2024-01-01 00:${i}%02d:00", x) }
    val got = runEwma(rows, 0.25, 32)
    val want = refEwma(xs, 0.25, 32)
    xs.indices.foreach { i =>
      assert(got(("a", i.toLong)) == want(i), s"point $i") }
    assert(got(("a", 0L)) == 10.0, "ewma of a single point is the point")
    // adjusted EWMA with full history equals pandas ewm(adjust=True)
    val p1 = (20.0 + 0.75 * 10.0) / 1.75
    assert(got(("a", 1L)) == graft.functions.GraftMath.sig9(p1))
  }

  test("ewma: horizon truncates the lookback; keys independent; " +
      "ties order by tieBreak") {
    val xs = (1 to 10).map(_.toDouble)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("a", i.toLong, f"2024-01-01 00:${i}%02d:00", x) } ++
      Seq(("b", 100L, "2024-01-01 00:00:00", 5.0),
        ("b", 99L, "2024-01-01 00:00:00", 50.0)) // same ts, id orders
    val got = runEwma(rows, 0.5, 4)
    val want = refEwma(xs, 0.5, 4)
    xs.indices.foreach { i =>
      assert(got(("a", i.toLong)) == want(i), s"point $i") }
    val wantB = refEwma(Seq(50.0, 5.0), 0.5, 4)
    assert(got(("b", 99L)) == wantB(0) && got(("b", 100L)) == wantB(1))
  }

  test("ewma: null values are absent samples, not zeros") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), Some(10.0)),
      ("a", 2L, ts("2024-01-01 00:01:00"), None),
      ("a", 3L, ts("2024-01-01 00:02:00"), Some(20.0)))
      .toDF("k", "id", "ts", "v")
    val got = TimeSeries.ewma(df, Seq("k"), "ts", "v", "id", 0.25, 8)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    val want = refEwma(Seq(10.0, 20.0), 0.25, 8)
    assert(got === Map(1L -> want(0), 3L -> want(1)))
  }

  // ===== changePoint ==================================================

  private def cpOf(vals: (String, Seq[Long])*) = {
    val rows = vals.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, i) =>
        (k, ts(f"2024-01-${i + 1}%02d 00:00:00"), x) } }
    TimeSeries.changePoint(rows.toDF("k", "ts", "x"), Seq("k"), "ts", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
  }

  test("changePoint: argmax of |n·S_t − t·S_n| against a direct scan") {
    val xs = Seq(5L, 6L, 4L, 5L, 20L, 22L, 19L, 21L)
    val n = xs.length.toLong
    val sn = xs.sum
    val direct = (1 until xs.length).map { t =>
      val st = xs.take(t).sum
      (t.toLong, math.abs(n * st - t * sn)) }
    val (bestT, bestD) = direct.minBy { case (t, d) => (-d, t) }
    val got = cpOf("a" -> xs)("a")
    assert(got._1 === n && got._2 === sn)
    assert(got._3 === bestT)
    assert(got._4 === bestD.toDouble)
    assert(got._5 === xs.take(bestT.toInt).sum.toDouble / bestT)
    assert(got._6 === xs.drop(bestT.toInt).sum.toDouble / (n - bestT))
  }

  test("changePoint: ties break to the earliest index; keys independent") {
    // symmetric series: D_t ties at t=1 and t=3 (D=|4·S_t − t·16|)
    val got = cpOf("a" -> Seq(2L, 6L, 6L, 2L), "b" -> Seq(1L, 9L))
    assert(got("a")._3 === 1L) // t=1 and t=3 both give D=8; earliest wins
    assert(got("b") === ((2L, 10L, 1L, 8.0, 1.0, 9.0)))
  }

  test("changePoint: single-point keys yield no row") {
    assert(!cpOf("a" -> Seq(7L)).contains("a"))
  }

  test("changePoint: total is the true sum, not max prefix, for " +
      "negative-valued series") {
    // prefix sums of (5, -3, -4, 6): 5, 2, -2, 4 — max prefix (5)
    // differs from the total (4); the statistic must use the total
    val xs = Seq(5L, -3L, -4L, 6L)
    val n = xs.length.toLong
    val sn = xs.sum
    val direct = (1 until xs.length).map { t =>
      val st = xs.take(t).sum
      (t.toLong, math.abs(n * st - t * sn)) }
    val (bestT, bestD) = direct.minBy { case (t, d) => (-d, t) }
    val got = cpOf("a" -> xs)("a")
    assert(got._2 === sn)
    assert(got._3 === bestT && got._4 === bestD.toDouble)
  }

  test("changePoint: fractional input raises instead of silently " +
      "truncating") {
    import spark.implicits._
    val df = Seq(("a", ts("2024-01-01 00:00:00"), 1.5),
      ("a", ts("2024-01-02 00:00:00"), 2.0)).toDF("k", "ts", "x")
    val e = intercept[Exception] {
      TimeSeries.changePoint(df, Seq("k"), "ts", "x").collect()
    }
    assert(e.getMessage.contains("non-integer") ||
      Option(e.getCause).exists(_.getMessage.contains("non-integer")))
  }

  // ===== autocorr =====================================================

  test("autocorr: matches the direct global-mean estimator per lag") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("g1", ts(f"2024-01-${i + 1}%02d 00:00:00"), x) }
    val got = TimeSeries.autocorr(rows.toDF("g", "ts", "x"),
        Seq("g"), "ts", "x", maxLag = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val n = xs.length
    val mu = xs.sum.toDouble / n
    def ref(k: Int): Double = {
      val num = (0 until n - k).map(t => (xs(t) - mu) * (xs(t + k) - mu)).sum
      val den = xs.map(x => (x - mu) * (x - mu)).sum
      num / den
    }
    (1 to 3).foreach { k =>
      val (nn, np, r) = got(k.toLong)
      assert(nn === n.toLong && np === (n - k).toLong)
      assert(math.abs(r - ref(k)) < 1e-9, s"lag $k")
    }
  }

  // ===== seasonal strength ============================================

  test("seasonalStrength: a perfectly weekly signal scores 1, pure " +
      "noise-vs-profile structure lands in between") {
    // key a: value is a pure function of (dow, hod) -> residuals all 0
    val weekly = (0 until 28).map { d =>
      val t = ts(f"2024-01-${d + 1}%02d ${(d * 5) % 24}%02d:00:00")
      ("a", 1000L + d, t, ((d * 5) % 24).toDouble * 2.0)
    }
    // key b: slot-independent alternation within one slot -> resid
    // variance equals total variance -> strength 0
    val flat = (0 until 4).map { i =>
      ("b", 2000L + i, ts(f"2024-01-${i * 7 + 1}%02d 09:00:00"),
        if (i % 2 == 0) 1.0 else 9.0)
    } // four Mondays 09:00: ONE shared dow/hod slot
    val df = (weekly ++ flat).toDF("k", "id", "ts", "v")
    val got = TimeSeries.seasonalStrength(df, Seq("k"), "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("a")._1 === 28L)
    assert(got("a")._2 === Some(1.0)) // residuals identically zero
    assert(got("b")._2.get < 0.3) // one shared slot explains ~nothing
  }

  // ===== trend trio ===================================================

  private def trioDf(vals: (String, Seq[Long])*) =
    vals.flatMap { case (k, xs) => xs.zipWithIndex.map { case (x, i) =>
      (k, ts(f"2024-01-${i + 1}%02d 00:00:00"), x) } }
      .toDF("g", "ts", "x").repartition(3)

  test("trendLine: exact OLS against the closed form; constant series " +
      "has slope 0 and NULL r2") {
    import graft.functions.GraftMath.sig9
    val xs = Seq(5L, 8L, 7L, 11L, 12L, 16L)
    val got = TimeSeries.trendLine(trioDf("a" -> xs, "c" -> Seq(4L, 4L, 4L)),
        Seq("g"), "ts", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    val n = xs.length.toLong
    val is = (1L to n)
    val (si, sii) = (is.sum, is.map(i => i * i).sum)
    val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
    val six = is.zip(xs).map { case (i, x) => i * x }.sum
    val dii = n * sii - si * si
    val dxx = n * sxx - sx * sx
    val dix = n * six - si * sx
    val slope = sig9(dix.toDouble / dii)
    assert(got("a")._1 === n)
    assert(got("a")._2 === Some(slope))
    assert(got("a")._3 === Some(sig9((sx - slope * si) / n)))
    assert(got("a")._4 === Some(sig9(
      (dix.toDouble * dix) / (dii.toDouble * dxx))))
    assert(got("c") === ((3L, Some(0.0), Some(4.0), None)))
  }

  test("mannKendall: exact S/tie/z against a direct pair scan") {
    import graft.functions.GraftMath.sig9
    val xs = Seq(3L, 5L, 5L, 2L, 8L, 8L, 9L)
    val got = TimeSeries.mannKendall(trioDf("a" -> xs), Seq("g"),
      "ts", "x").head()
    val n = xs.length
    val s = (for (i <- 0 until n; j <- i + 1 until n)
      yield (xs(j) compare xs(i)).sign).sum
    val tie = xs.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val va = (n.toLong * (n - 1) * (2 * n + 5) - tie) / 18.0
    assert(got.getLong(1) === n.toLong && got.getLong(2) === s.toLong)
    assert(got.getLong(3) === tie)
    val sd = sig9(math.sqrt(va))
    assert(got.getDouble(4) === sig9((s - 1.0) / sd))
  }

  test("theilSen: lower-median pairwise slope; an outlier day cannot " +
      "move it") {
    // clean slope 2 everywhere, one wild spike at the end
    val clean = Seq(0L, 2L, 4L, 6L, 8L, 10L)
    val spiked = clean.init :+ 500L
    val got = TimeSeries.theilSen(
        trioDf("c" -> clean, "s" -> spiked), Seq("g"), "ts", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("c") === ((15L, 2.0)))
    assert(got("s")._2 === 2.0) // 10 of 15 pairwise slopes are still 2
    // while OLS is dragged far off by the same spike
    val ols = TimeSeries.trendLine(trioDf("s" -> spiked), Seq("g"),
      "ts", "x").head().getDouble(2)
    assert(ols > 50.0)
  }

  // ===== crossCorr ====================================================

  private def dayTs(i: Int) = ts(f"2024-01-${i}%02d 00:00:00")

  test("crossCorr: matches the direct two-series estimator; a shifted " +
      "copy peaks at its shift") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val a = xs.zipWithIndex.map { case (v, i) => (dayTs(i + 1), v) }
      .toDF("ts", "v")
    // y = x shifted 2 days later (y_{t+2} = x_t), plus noise-free
    val b = xs.zipWithIndex.map { case (v, i) => (dayTs(i + 3), v) }
      .toDF("ts", "v")
    val got = TimeSeries.crossCorr(a, b, "ts", "v", 86400L, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(2L)._2.get === 1.0) // exact alignment
    assert(got(2L)._1 === 8L)
    // direct reference at k = 0 (6 overlapping points)
    val ax = xs.drop(2).map(_.toDouble) // x days 3..8
    val by = xs.take(6).map(_.toDouble) // y at days 3..8 = x days 1..6
    val mx = xs.sum.toDouble / xs.length
    val my = mx
    val num = ax.zip(by).map { case (p, q) => (p - mx) * (q - my) }.sum
    val den = math.sqrt(xs.map(v => (v - mx) * (v - mx)).sum *
      xs.map(v => (v - my) * (v - my)).sum)
    assert(math.abs(got(0L)._2.get - num / den) < 1e-9)
  }

  test("crossCorr: zero-variance side yields NULL r, never NaN") {
    val a = (1 to 5).map(i => (dayTs(i), 7L)).toDF("ts", "v")
    val b = (1 to 5).map(i => (dayTs(i), i.toLong)).toDF("ts", "v")
    val rs = TimeSeries.crossCorr(a, b, "ts", "v", 86400L, 1).collect()
    assert(rs.nonEmpty && rs.forall(_.isNullAt(4)))
  }

  test("autocorr: constant series has NULL r; lag-shifted copy peaks") {
    val flat = (1 to 6).map(i => ("g1", ts(f"2024-01-$i%02d 00:00:00"), 5L))
    val rs = TimeSeries.autocorr(flat.toDF("g", "ts", "x"),
      Seq("g"), "ts", "x", 2).collect()
    assert(rs.length === 2 && rs.forall(_.isNullAt(4)))
    // period-2 alternation: r(2) = +1-ish dominance over r(1)
    val alt = (1 to 8).map(i =>
      ("g2", ts(f"2024-01-$i%02d 00:00:00"), if (i % 2 == 0) 10L else 0L))
    val byLag = TimeSeries.autocorr(alt.toDF("g", "ts", "x"),
        Seq("g"), "ts", "x", 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(byLag(2L) > 0 && byLag(1L) < 0)
  }

  test("doubleEwma: constant series -> s1 = s2 = x, zero trend, " +
      "forecast = level = x") {
    val rows = (1 to 6).map(i =>
      ("g", i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 7.0))
    val got = TimeSeries.doubleEwma(
      rows.toDF("g", "event_id", "ts", "x").repartition(3),
      Seq("g"), "ts", "x", "event_id", alpha = 0.25, horizon = 32)
      .collect()
    got.foreach { r =>
      assert(r.getAs[Double]("s1") == 7.0 && r.getAs[Double]("s2") == 7.0)
      assert(r.getAs[Double]("trend") == 0.0)
      assert(r.getAs[Double]("level") == 7.0)
      assert(r.getAs[Double]("forecast") == 7.0)
    }
  }

  test("doubleEwma: linear ramp -> positive trend that a flat ewma " +
      "misses; s2 smooths the SIG9'D s1 stream (compositional replica)") {
    import graft.functions.GraftMath
    def s9(x: Double) = GraftMath.sig9(x)
    val alpha = 0.25; val h = 4
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("g", (i + 1).toLong, ts(f"2024-01-${i + 1}%02d 00:00:00"), x)
    }
    val got = TimeSeries.doubleEwma(
      rows.toDF("g", "event_id", "ts", "x"),
      Seq("g"), "ts", "x", "event_id", alpha, h)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    // local replica: bounded adjusted weights over the sig9'd stream
    val beta = 1.0 - alpha
    val w = Seq.iterate(1.0, h)(_ * beta)
    val den = w.scanLeft(0.0)(_ + _).tail
    def smooth(s: Seq[Double]): Seq[Double] = s.indices.map { t =>
      val lags = math.min(t + 1, h)
      // arr = last `lags` points ascending; arr[i] pairs w[n-i]
      val arr = s.slice(t + 1 - lags, t + 1)
      val num = arr.zipWithIndex.foldLeft(0.0) { case (acc, (x, i)) =>
        acc + x * w(lags - 1 - i)
      }
      s9(num / den(lags - 1))
    }
    val s1 = smooth(xs)
    val s2 = smooth(s1)
    xs.indices.foreach { t =>
      val r = got((t + 1).toLong)
      assert(r.getAs[Double]("s1") == s1(t), s"s1 t=$t")
      assert(r.getAs[Double]("s2") == s2(t), s"s2 t=$t")
      val level = s9(2.0 * s1(t) - s2(t))
      val trend = s9(alpha / (1.0 - alpha) * (s1(t) - s2(t)))
      assert(r.getAs[Double]("level") == level)
      assert(r.getAs[Double]("trend") == trend)
      assert(r.getAs[Double]("forecast") == s9(level + trend))
      if (t > 0) assert(r.getAs[Double]("trend") > 0.0)
    }
  }

  // ===== forecast backtest ============================================

  test("forecastBacktest: a constant series has zero error on both " +
      "model and baseline (skill NULL); a ramp beats persistence") {
    val const = (1 to 6).map(i =>
      ("g", i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 7.0))
    val rc = TimeSeries.forecastBacktest(
      const.toDF("g", "event_id", "ts", "x"), Seq("g"), "ts", "x",
      "event_id", alpha = 0.25, horizon = 32).head()
    assert(rc.getAs[Long]("n_evals") == 5L) // last point has no next
    assert(rc.getAs[Double]("mae") == 0.0 &&
      rc.getAs[Double]("mae_naive") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("skill")))
    // steady ramp: trend-aware DES converges to the slope, persistence
    // is off by the slope every step
    val ramp = (1 to 30).map(i =>
      ("g", i.toLong, ts(f"2024-01-$i%02d 00:00:00"), i * 10.0))
    val rr = TimeSeries.forecastBacktest(
      ramp.toDF("g", "event_id", "ts", "x"), Seq("g"), "ts", "x",
      "event_id", alpha = 0.5, horizon = 32).head()
    assert(rr.getAs[Long]("n_evals") == 29L)
    assert(rr.getAs[Double]("mae") < rr.getAs[Double]("mae_naive"))
    assert(rr.getAs[Double]("skill") > 0.5)
    assert(rr.getAs[Double]("rmse") >= rr.getAs[Double]("mae"))
  }

  test("dispersion: zero days in the span count; bursty beats " +
      "regular; a constant series pins burstiness to -1") {
    val ev = Seq(
      // bursty: 3 events day 1, NOTHING day 2, 1 event day 3
      ("b", "2024-01-01"), ("b", "2024-01-01"), ("b", "2024-01-01"),
      ("b", "2024-01-03"),
      // regular: exactly 1 event each of 3 days
      ("r", "2024-01-01"), ("r", "2024-01-02"), ("r", "2024-01-03"))
      .toDF("k", "d").select(col("k"), to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.dispersion(ev, Seq("k"), "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    def near(x: Double, y: Double) = math.abs(x - y) < 1e-6
    val b = got("b")
    assert(b._1 == 3L && b._2 == 4L) // the empty day is IN the grid
    // counts [3,0,1]: mean 4/3, var (3*10-16)/6 = 7/3, fano 7/4
    assert(near(b._3, 4.0 / 3.0) && near(b._4, 7.0 / 3.0) &&
      near(b._5, 1.75))
    assert(b._6 > 0.0) // bursty
    val r = got("r")
    assert(near(r._4, 0.0) && near(r._5, 0.0) && near(r._6, -1.0))
  }

  test("burstStates labels a planted burst window, stays flat on a " +
      "flat stream, and matches an independent Viterbi bit-for-bit") {
    import graft.functions.GraftMath.{sig9 => s9}
    // 20 bins at ~10% relevant, bins 8-12 spike to ~50%
    val bins: Seq[(Long, Long, Long)] = (1L to 20L).map { t =>
      if (t >= 8 && t <= 12) (t, 50L, 100L) else (t, 10L, 100L)
    }
    def run(b: Seq[(Long, Long, Long)], s: Double, g: Double) =
      TimeSeries.burstStates(b.toDF("o", "r", "n"), "o", "r", "n", s, g)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = run(bins, 3.0, 1.0)
    (8L to 12L).foreach(t => assert(got(t) === 1L, s"bin $t"))
    (1L to 7L).foreach(t => assert(got(t) === 0L, s"bin $t"))
    (13L to 20L).foreach(t => assert(got(t) === 0L, s"bin $t"))
    // independent forward/backtrack replica with the engine's exact
    // sig9 points and tie rules
    def ref(b: Seq[(Long, Long, Long)], s: Double, g: Double) = {
      val (rt, nt, tn) = (b.map(_._2).sum, b.map(_._3).sum, b.size)
      val p0 = rt.toDouble / nt.toDouble
      val p1 = math.min(s * p0, 0.999999)
      val (lp0, l10) = (s9(StrictMath.log(p0)),
        s9(StrictMath.log(1.0 - p0)))
      val (lp1, l11) = (s9(StrictMath.log(p1)),
        s9(StrictMath.log(1.0 - p1)))
      val tau = s9(g * StrictMath.log(tn.toDouble))
      var (c0, c1) = (0.0, 1.0e15)
      val ds = Array.newBuilder[(Double, Double)]
      b.foreach { case (_, r, n) =>
        val k0 = s9(-(r.toDouble * lp0 + (n - r).toDouble * l10))
        val k1 = s9(-(r.toDouble * lp1 + (n - r).toDouble * l11))
        val (m0, d0) = if (c0 <= c1) (c0, 0.0) else (c1, 1.0)
        val (m1, d1) =
          if (c1 <= c0 + tau) (c1, 1.0) else (c0 + tau, 0.0)
        ds += ((d0, d1)); c0 = s9(m0 + k0); c1 = s9(m1 + k1)
      }
      val dec = ds.result()
      var cur = if (c0 <= c1) 0.0 else 1.0
      val out = Array.fill(tn)(0.0); out(tn - 1) = cur
      for (t <- tn to 2 by -1) {
        cur = if (cur == 0.0) dec(t - 1)._1 else dec(t - 1)._2
        out(t - 2) = cur
      }
      b.map(_._1).zip(out.map(_.toLong)).toMap
    }
    assert(got === ref(bins, 3.0, 1.0))
    // flat stream: no bursts anywhere
    val flat = (1L to 15L).map(t => (t, 10L, 100L))
    assert(run(flat, 3.0, 1.0).values.forall(_ == 0L))
    assert(run(flat, 3.0, 1.0) === ref(flat, 3.0, 1.0))
    // a higher entry toll suppresses a 1-bin blip that gamma=0 labels
    val blip = (1L to 15L).map(t =>
      if (t == 8) (t, 22L, 100L) else (t, 10L, 100L))
    assert(run(blip, 3.0, 0.0) === ref(blip, 3.0, 0.0))
    assert(run(blip, 3.0, 6.0) === ref(blip, 3.0, 6.0))
    assert(run(blip, 3.0, 0.0)(8L) === 1L)
    assert(run(blip, 3.0, 6.0)(8L) === 0L)
    // single-bin series
    assert(run(Seq((1L, 5L, 10L)), 2.0, 1.0) ===
      ref(Seq((1L, 5L, 10L)), 2.0, 1.0))
    // degenerate rates: all-zero and all-relevant streams clamp p0
    // into (0,1) and label every bin BASE instead of NULL-poisoning
    val zero = (1L to 8L).map(t => (t, 0L, 50L))
    assert(run(zero, 3.0, 1.0).values.forall(_ == 0L))
    val full = (1L to 8L).map(t => (t, 50L, 50L))
    assert(run(full, 3.0, 1.0).values.forall(_ == 0L))
    // empty grid: zero output rows, no index crash
    assert(TimeSeries.burstStates(
      Seq.empty[(Long, Long, Long)].toDF("o", "r", "n"),
      "o", "r", "n", 3.0, 1.0).count() === 0L)
  }

  test("holtWinters matches an independent plain-Scala recursion " +
      "bit-for-bit and drops sub-2m series") {
    import graft.functions.GraftMath.{sig9 => s9}
    val (a, b, g, m) = (0.3, 0.1, 0.2, 3)
    // trend + period-3 seasonality, 12 points
    val xs = (0 until 12).map(t =>
      10.0 + 0.5 * t + Seq(2.0, -1.0, -1.0)(t % 3))
    // independent reference with the engine's exact sig9 points
    val (omA, omB, omG) = (1.0 - a, 1.0 - b, 1.0 - g)
    var l = s9(xs.take(m).foldLeft(0.0)(_ + _) / m)
    var tr = s9((1 to m).map(i => xs(m + i - 1) - xs(i - 1))
      .foldLeft(0.0)(_ + _) / (m * m))
    var seas = xs.take(m).map(x => s9(x - l)).toVector
    for (t <- m until xs.length) {
      val sOld = seas.head
      val lNew = s9(a * (xs(t) - sOld) + omA * (l + tr))
      val bNew = s9(b * (lNew - l) + omB * tr)
      val sNew = s9(g * (xs(t) - lNew) + omG * sOld)
      l = lNew; tr = bNew; seas = seas.tail :+ sNew
    }
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("k", "o", "x")
      .unionAll(Seq(("short", 0L, 1.0), ("short", 1L, 2.0),
        ("short", 2L, 3.0), ("short", 3L, 4.0), ("short", 4L, 5.0))
        .toDF("k", "o", "x")) // 5 < 2m = 6: dropped
    val out = TimeSeries.holtWinters(df, Seq("k"), "o", "x", a, b, g, m)
      .collect()
    assert(out.forall(_.getString(0) == "s") && out.length === m)
    out.foreach { r =>
      val h = r.getAs[Long]("h").toInt
      assert(r.getAs[Double]("level") === l, "level")
      assert(r.getAs[Double]("trend") === tr, "trend")
      assert(r.getAs[Double]("forecast") ===
        s9(l + h.toDouble * tr + seas(h - 1)), s"forecast h=$h")
    }
    // sanity: the fit tracks the construction (trend ~ 0.5,
    // forecasts continue the seasonal pattern's shape)
    assert(math.abs(tr - 0.5) < 0.2)
    val f = out.sortBy(_.getAs[Long]("h")).map(_.getAs[Double]("forecast"))
    assert(f(0) > f(1) && f(0) > f(2)) // the +2 season leads the -1s
  }

  test("ar2Forecast: hand-solved Yule-Walker on a 5-point series") {
    import graft.functions.GraftMath.{sig9 => s9}
    val df = (1 to 5).map(i => ("k", i.toLong, i.toLong))
      .toDF("key", "t", "v")
    val out = TimeSeries.ar2Forecast(df, Seq("key"), "t", "v",
      horizon = 3).collect().sortBy(_.getAs[Long]("h"))
    assert(out.length === 3)
    val r = out(0)
    // n=5, S=15, Q=55; lag1: P=40,A=10,B=14 -> r1 = 100/250 = 0.4
    // lag2: P=26,A=6,B=12 -> r2 = -25/250 = -0.1
    assert(r.getAs[Double]("r1") === 0.4)
    assert(r.getAs[Double]("r2") === -0.1)
    val phiDen = 1.0 - 0.4 * 0.4
    val phi1 = s9(0.4 * (1.0 - -0.1) / phiDen)
    val phi2 = s9((-0.1 - 0.4 * 0.4) / phiDen)
    assert(r.getAs[Double]("phi1") === phi1)
    assert(r.getAs[Double]("phi2") === phi2)
    val mu = s9(15.0 / 5.0)
    assert(r.getAs[Double]("mu") === mu)
    val f1 = s9(mu + phi1 * (5.0 - mu) + phi2 * (4.0 - mu))
    val f2 = s9(mu + phi1 * (f1 - mu) + phi2 * (5.0 - mu))
    val f3 = s9(mu + phi1 * (f2 - mu) + phi2 * (f1 - mu))
    assert(out.map(_.getAs[Double]("forecast")).toSeq ===
      Seq(f1, f2, f3))
  }

  test("ar2Forecast: constant series yields NULL fit and forecasts") {
    val df = (1 to 6).map(i => ("k", i.toLong, 7L)).toDF("key", "t", "v")
    val out = TimeSeries.ar2Forecast(df, Seq("key"), "t", "v",
      horizon = 2).collect()
    assert(out.length === 2)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("r1")) &&
      r.isNullAt(r.fieldIndex("phi1")) &&
      r.isNullAt(r.fieldIndex("forecast"))))
    assert(out.forall(_.getAs[Double]("mu") === 7.0))
  }

  test("ar2Forecast: two-point series has NULL phi (n < 3)") {
    val df = Seq(("k", 1L, 1L), ("k", 2L, 5L)).toDF("key", "t", "v")
    val out = TimeSeries.ar2Forecast(df, Seq("key"), "t", "v",
      horizon = 1).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("phi1")))
    assert(out(0).isNullAt(out(0).fieldIndex("forecast")))
  }
}
