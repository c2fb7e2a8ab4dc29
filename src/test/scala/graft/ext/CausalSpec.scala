package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CausalSpec extends SparkSpec {
  import spark.implicits._

  // ===== matchAtt =====================================================

  private def units(rows: (Long, Boolean, Double, Double)*) =
    rows.toDF("id", "t", "s", "y")

  test("matchAtt matches each treated to the nearest control in caliper") {
    val out = Causal.matchAtt(units(
      (1L, true, 10.0, 5.0), // nearest control: id 11 (gap 1) not 12 (gap 2)
      (2L, true, 20.0, 7.0), // nearest: id 13 (gap 0.5)
      (11L, false, 9.0, 1.0),
      (12L, false, 12.0, 100.0),
      (13L, false, 19.5, 3.0)), "id", "t", "s", "y", caliper = 3.0)
      .collect()(0)
    assert(out.getLong(0) === 2L) // n_treated
    assert(out.getLong(1) === 3L) // n_control
    assert(out.getLong(2) === 2L) // n_matched
    assert(out.getLong(3) === 0L) // n_unmatched
    // ATT = ((5-1) + (7-3)) / 2 = 4
    assert(out.getDouble(4) === 4.0)
    // gaps: 1.0 and 0.5 -> 0.75
    assert(out.getDouble(5) === 0.75)
  }

  test("matchAtt: controls beyond the caliper leave a treated unmatched") {
    val out = Causal.matchAtt(units(
      (1L, true, 0.0, 5.0),
      (11L, false, 10.0, 1.0)), "id", "t", "s", "y", caliper = 2.0)
      .collect()(0)
    assert(out.getLong(2) === 0L)
    assert(out.getLong(3) === 1L)
    assert(out.isNullAt(4)) // ATT undefined with no matches
  }

  test("matchAtt: equal gaps break on the smaller control id") {
    val out = Causal.matchAtt(units(
      (1L, true, 10.0, 9.0),
      (12L, false, 11.0, 2.0),
      (11L, false, 9.0, 4.0)), "id", "t", "s", "y", caliper = 2.0)
      .collect()(0)
    // both gaps are 1.0 -> control 11 wins -> ATT = 9 - 4 = 5
    assert(out.getDouble(4) === 5.0)
  }

  test("matchAtt: a control exactly caliper away (next bucket) is found") {
    val out = Causal.matchAtt(units(
      (1L, true, 2.0, 5.0),
      (11L, false, 4.0, 1.0)), "id", "t", "s", "y", caliper = 2.0)
      .collect()(0)
    assert(out.getLong(2) === 1L)
    assert(out.getDouble(4) === 4.0)
  }

  // ===== rddEstimate ==================================================

  test("rddEstimate recovers a clean jump on noiseless linear sides") {
    // left: y = 1 + 2u; right: y = 4 + 0.5u  -> tau = 3
    val rows = Seq(-3.0, -2.0, -1.0).map(u => (u, 1.0 + 2.0 * u)) ++
      Seq(0.0, 1.0, 2.0, 3.0).map(u => (u, 4.0 + 0.5 * u))
    val out = Causal.rddEstimate(rows.toDF("x", "y"), "x", "y",
      cutoff = 0.0, bandwidth = 10.0).collect()(0)
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === 4L)
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-6) // a_left
    assert(math.abs(out.getDouble(3) - 2.0) < 1e-6) // b_left
    assert(math.abs(out.getDouble(4) - 4.0) < 1e-6) // a_right
    assert(math.abs(out.getDouble(5) - 0.5) < 1e-6) // b_right
    assert(math.abs(out.getDouble(6) - 3.0) < 1e-6) // tau
  }

  test("rddEstimate: points outside the bandwidth do not enter the fit") {
    val rows = Seq((-100.0, 9999.0), (-1.0, 1.0), (-2.0, 1.0),
      (1.0, 2.0), (2.0, 2.0), (100.0, -9999.0))
    val out = Causal.rddEstimate(rows.toDF("x", "y"), "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect()(0)
    assert(out.getLong(0) === 2L)
    assert(out.getLong(1) === 2L)
    assert(math.abs(out.getDouble(6) - 1.0) < 1e-6) // 2 - 1
  }

  // ===== ivWald =======================================================

  test("ivWald: beta = ITT / first-stage on a clean encouragement design") {
    // z=1 raises uptake x by 0.5 and y by 2.0 -> beta = 4
    val df = Seq(
      (0L, 0.0, 10.0), (0L, 1.0, 12.0), // z=0: mean x .5, mean y 11
      (1L, 1.0, 12.0), (1L, 1.0, 14.0) // z=1: mean x 1, mean y 13
    ).toDF("z", "x", "y")
    val out = Causal.ivWald(df, "z", "x", "y").collect()(0)
    assert(out.getLong(0) === 2L)
    assert(out.getLong(1) === 2L)
    assert(out.getDouble(6) === 2.0) // itt
    assert(out.getDouble(7) === 0.5) // first stage
    assert(out.getDouble(8) === 4.0) // beta
  }

  test("ivWald: a zero first stage yields NULL, not a division error") {
    val df = Seq((0L, 1.0, 10.0), (1L, 1.0, 99.0)).toDF("z", "x", "y")
    val out = Causal.ivWald(df, "z", "x", "y").collect()(0)
    assert(out.getDouble(7) === 0.0)
    assert(out.isNullAt(8))
  }

  // ===== msprt ========================================================

  test("msprt: cumulative counts and the logLambda chain per day") {
    val df = Seq(
      (1L, "2024-01-01", 10.0), (0L, "2024-01-01", 1.0),
      (1L, "2024-01-02", 12.0), (0L, "2024-01-02", 2.0),
      (1L, "2024-01-03", 11.0), (0L, "2024-01-03", 1.5))
      .toDF("arm", "day0", "x")
      .withColumn("day", to_date(col("day0")))
    val out = Causal.msprt(df, "arm", "day", "x", tau2 = 1.0,
      alpha = 0.05).collect().sortBy(_.getDate(0).toString)
    assert(out.length === 3)
    // day 2: cumulative n_t = n_c = 2
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getLong(2) === 2L)
    // deltas are positive and the LLR increases with evidence
    val ll = out.map(_.getDouble(6))
    assert(ll(2) > ll(0))
    // crossed is the pointwise boundary check
    val thr = math.log(1.0 / 0.05)
    out.foreach(r => assert(r.getBoolean(7) === (r.getDouble(6) > thr)))
    // first_cross_day is constant across rows and equals the min
    // crossed day (or null)
    val fc = out.map(r => Option(r.getDate(8)).map(_.toString)).distinct
    assert(fc.length === 1)
  }

  test("msprt: a null-effect stream never crosses") {
    val rows = (1 to 20).flatMap { i =>
      Seq((1L, f"2024-01-$i%02d", 5.0 + (i % 3)),
        (0L, f"2024-01-$i%02d", 5.0 + ((i + 1) % 3)))
    }
    val df = rows.toDF("arm", "day0", "x")
      .withColumn("day", to_date(col("day0")))
    val out = Causal.msprt(df, "arm", "day", "x", tau2 = 1.0,
      alpha = 0.05).collect()
    assert(out.forall(!_.getBoolean(7)))
    assert(out.forall(_.isNullAt(8)))
  }

  test("ipsPolicyEval: one context, greedy picks the better action") {
    // ctx 1: action a mean 1.0 (2 rows), action b mean 0.0 (2 rows)
    val df = Seq((1L, "a", 1.0), (1L, "a", 1.0), (1L, "b", 0.0),
      (1L, "b", 0.0)).toDF("x", "a", "r")
    val out = Causal.ipsPolicyEval(df, "x", "a", "r", cap = 4.0)
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) ===
      ((4L, 1L, 2L)))
    // w = 4/2 = 2 on the matched cell; ips = 2*(1+1)/4 = 1.0
    assert(out.getDouble(3) === 1.0)
    assert(out.getDouble(4) === 1.0) // cap 4 not binding
    assert(out.getDouble(5) === 1.0) // snips = (2*2)/(2*2)
  }

  test("ipsPolicyEval: weight capping binds on a rare best action") {
    // ctx 1: 'b' once with reward 10 (mean 10), 'a' nine times reward 0
    val rows = (1 to 9).map(_ => (1L, "a", 0.0)) :+ ((1L, "b", 10.0))
    val df = rows.toDF("x", "a", "r")
    val out = Causal.ipsPolicyEval(df, "x", "a", "r", cap = 4.0)
      .collect()(0)
    assert(out.getLong(2) === 1L)
    // w = 10/1 = 10: ips = 10*10/10 = 10; capped = 4*10/10 = 4
    assert(out.getDouble(3) === 10.0)
    assert(out.getDouble(4) === 4.0)
    // capped-SNIPS renormalizes: (4*10)/(4*1) = 10
    assert(out.getDouble(5) === 10.0)
  }

  test("ipsPolicyEval: single-action log reduces to the mean reward") {
    val df = Seq((1L, "a", 2.0), (1L, "a", 4.0), (2L, "a", 6.0))
      .toDF("x", "a", "r")
    val out = Causal.ipsPolicyEval(df, "x", "a", "r", cap = 4.0)
      .collect()(0)
    assert(out.getLong(2) === 3L)
    assert(out.getDouble(3) === 4.0)
    assert(out.getDouble(4) === 4.0)
    assert(out.getDouble(5) === 4.0)
  }
}
