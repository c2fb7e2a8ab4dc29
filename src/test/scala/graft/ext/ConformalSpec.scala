package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("qhat is the ceil((1-alpha)(n+1))-th smallest calibration score") {
    // n = 9, alpha = 0.1 -> k = ceil(0.9 * 10) = 9 -> 9th smallest = 90
    val cal = (1L to 9L).map(i => ("a", i, i * 10.0)).toDF("g", "id", "s")
    val th = Classifier.conformalThresholds(cal, Seq("g"), "s", 0.1)
      .head()
    assert(th.getAs[Long]("n_calib") == 9L)
    assert(th.getAs[Long]("k") == 9L)
    assert(th.getAs[Double]("qhat") == 90.0)
  }

  test("k > n leaves qhat NULL (degenerate small calibration set) and " +
      "coverage counts everything") {
    // n = 5, alpha = 0.1 -> k = ceil(0.9 * 6) = 6 > 5
    val cal = (1L to 5L).map(i => ("a", i, i * 1.0)).toDF("g", "id", "s")
    val test = (1L to 4L).map(i => ("a", i + 100, 1e9 + i))
      .toDF("g", "id", "s")
    val r = Classifier.conformalCoverage(cal, test, Seq("g"), "s", 0.1)
      .head()
    assert(r.getAs[Long]("k") == 6L)
    assert(r.isNullAt(r.fieldIndex("qhat")))
    assert(r.getAs[Long]("n_covered") == 4L) // everything covered
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("empirical coverage meets the 1-alpha bar on exchangeable data") {
    // scores from a deterministic pseudo-random stream; calibration =
    // every 5th row. Split-conformal guarantees E[coverage] >= 0.9;
    // with ~800 test points the realized coverage stays well above
    // 0.85 for this fixed stream.
    val rows = (1L to 1000L).map { i =>
      val u = ((i * 2654435761L) % 10007L).toDouble / 10007.0
      ("a", i, u)
    }
    val cal = rows.filter(_._2 % 5 == 0).toDF("g", "id", "s")
    val test = rows.filter(_._2 % 5 != 0).toDF("g", "id", "s")
    val r = Classifier.conformalCoverage(cal, test, Seq("g"), "s", 0.1)
      .head()
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov")
    // threshold sits near the 90th percentile of the score stream
    val qhat = r.getAs[Double]("qhat")
    assert(qhat > 0.8 && qhat < 1.0)
  }

  test("Mondrian: thresholds are per-group and tie-insensitive") {
    // group b has duplicate scores at the threshold rank; the VALUE at
    // rank k is the same whatever order the ties enumerate in
    val cal = (
      (1L to 9L).map(i => ("a", i, i * 10.0)) ++
      (1L to 9L).map(i => ("b", i + 50, if (i >= 5) 7.0 else i * 1.0))
    ).toDF("g", "id", "s")
    val th = Classifier.conformalThresholds(cal, Seq("g"), "s", 0.1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("qhat")).toMap
    assert(th("a") == 90.0)
    assert(th("b") == 7.0)
    // partition-invariance
    val th2 = Classifier.conformalThresholds(
      cal.repartition(7), Seq("g"), "s", 0.1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("qhat")).toMap
    assert(th2 == th)
  }

  test("invalid alpha rejected") {
    val cal = Seq(("a", 1L, 1.0)).toDF("g", "id", "s")
    intercept[IllegalArgumentException] {
      Classifier.conformalThresholds(cal, Seq("g"), "s", alpha = 0.0)
    }
  }
}
