package graft.ext

import graft.SparkSpec
import java.sql.Timestamp

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // days 1..10 alternate 11/10 events (non-zero variance); day 11 = 100
  private def events = {
    val base = for {
      d <- 1 to 10
      i <- 1 to (10 + d % 2)
    } yield (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), "click", 1.0)
    val spike = (1 to 100)
      .map(_ => (Timestamp.valueOf("2024-01-11 12:00:00"), "click", 1.0))
    (base ++ spike).toDF("ts", "event_type", "value")
  }

  test("planted volume spike is flagged; warm-up days stay null") {
    val r = Anomaly.dailyVolume(events)
      .as[(String, String, Long, Long, Option[Double], Option[Double],
        Boolean)]
      .collect().map(t => t._2 -> t).toMap
    assert(r.size == 11)
    // first 7 days: window not yet full -> no mean, no z, no flag
    (1 to 7).foreach { d =>
      val row = r(f"2024-01-$d%02d")
      assert(row._5.isEmpty && row._6.isEmpty && !row._7)
    }
    // stable full-window days are not anomalous
    (8 to 10).foreach { d =>
      val row = r(f"2024-01-$d%02d")
      assert(row._5.nonEmpty && row._6.nonEmpty && !row._7)
    }
    // the spike day is
    val spike = r("2024-01-11")
    assert(spike._3 == 100L && spike._6.exists(_ > 3.0) && spike._7)
  }

  test("zero-variance window yields null z, not a division blow-up") {
    val flat = (for { d <- 1 to 9; i <- 1 to 10 } yield
      (Timestamp.valueOf(f"2024-02-$d%02d 00:30:00"), "view", 0.0))
      .toDF("ts", "event_type", "value")
    val r = Anomaly.dailyVolume(flat)
      .as[(String, String, Long, Long, Option[Double], Option[Double],
        Boolean)]
      .collect().filter(_._4 == 7L)
    assert(r.nonEmpty)
    assert(r.forall(t => t._5.contains(10.0) && t._6.isEmpty && !t._7))
  }

  test("robustZ: median/MAD scoring, outlier gating, null z on MAD=0") {
    import graft.functions.GraftMath
    // group g: values 1..9 plus wild 1000 -> med=5.5, MAD=median(|x-5.5|)
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.map(v => ("g", v)).toDF("k", "v")
    val r = Anomaly.robustZ(df, Seq("k"), "v", zThreshold = 3.5)
      .collect().map(x => x.getDouble(1) ->
        (x.getDouble(2), x.getDouble(3), Option(x.get(4)).map(_.asInstanceOf[Double]), x.getBoolean(5))).toMap
    val med = GraftMath.sig9(5.5)
    val mad = GraftMath.sig9(2.5) // |x-5.5| sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5
    assert(r(1.0)._1 === med && r(1.0)._2 === mad)
    val zWild = GraftMath.sig9(0.6745 * (1000.0 - med) / mad)
    assert(r(1000.0)._3.contains(zWild) && r(1000.0)._4)
    assert(!r(5.0)._4) // central value not an outlier
    // constant group: MAD = 0 -> z null, never an outlier
    val c = Anomaly.robustZ(Seq(("c", 7.0), ("c", 7.0)).toDF("k", "v"),
      Seq("k"), "v").collect()
    assert(c.forall(x => x.isNullAt(4) && !x.getBoolean(5)))
  }

  test("winsorizedMean: clamps tails at the exact percentiles") {
    import graft.functions.GraftMath
    // 1..9 plus whale 1000; p05/p95 over 10 values (interpolated):
    // lo = 1 + 0.45*(2-1) = 1.45; hi = 9 + 0.55*(1000-9) = 554.05
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val r = Anomaly.winsorizedMean(vals.map(v => ("g", v)).toDF("k", "v"),
      Seq("k"), "v").collect().head
    val lo = GraftMath.sig9(1.45)
    val hi = GraftMath.sig9(554.05)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("lo") === lo)
    assert(r.getAs[Double]("hi") === hi)
    // winsorized values: lo, 2..9, hi — mean drops from 104.5
    val expW = (Seq(lo) ++ (2 to 9).map(_.toDouble) :+ hi)
      .map(BigDecimal(_)).sum.toDouble / 10.0
    assert(math.abs(r.getAs[Double]("mean_winsorized") - expW) < 1e-6)
    assert(r.getAs[Double]("mean_raw") === 104.5)
  }
}
