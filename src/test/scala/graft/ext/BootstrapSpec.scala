package graft.ext

import graft.SparkSpec
import graft.functions.GraftMath
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, Long, Double)*) =
    rows.toDF("g", "id", "x")

  /** The documented weight draw, locally: one md5 per row mixed by the
    * per-replicate affine constants, counted against the embedded
    * Poisson(1) CDF thresholds. */
  private val (refA, refB) = Bootstrap.mixers("boot", 64)
  private def refWeight(id: Long, r: Int, salt: String = "boot"): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(md5, 16) % Hashing.P
    val u = ((refA(r) * h + refB(r)) % Hashing.P).toDouble / Hashing.P
    Bootstrap.PoissonCdf1.count(c => u >= c).toLong
  }

  test("Poisson(1) CDF thresholds are the textbook values") {
    val cdf = Bootstrap.PoissonCdf1
    assert(cdf.size == 12)
    assert(math.abs(cdf.head - math.exp(-1)) < 1e-15)        // P[w=0]
    assert(math.abs(cdf(1) - 2 * math.exp(-1)) < 1e-15)      // P[w<=1]
    assert(cdf.sliding(2).forall(p => p(0) < p(1)))          // monotone
    assert(cdf.last > 0.9999999)                             // ~1
  }

  test("weights follow the documented deterministic draw and mean ~1") {
    val n = 2000
    val ws = (0 until n).map(i => refWeight(i.toLong, i % 8))
    assert(ws.forall(w => w >= 0 && w <= Bootstrap.MaxWeight))
    val mean = ws.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.1, s"weight mean $mean far from 1")
    assert(ws.count(_ == 0).toDouble / n > 0.25) // P[w=0] = 1/e ~ .37
  }

  /** Local replica of the full documented pipeline (sig9 points
    * included), one group. */
  private def ref(rows: Seq[(Long, Double)], reps: Int)
      : (Double, Double, Double, Double, Double) = {
    def dsum(ts: Seq[Double]): Double = GraftMath.sig9(
      ts.map(BigDecimal(_).setScale(15, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble)
    val ms = (0 until reps).flatMap { r =>
      val ws = rows.map { case (id, x) => (refWeight(id, r), x) }
      val sw = ws.map(_._1).sum
      if (sw == 0) None
      else Some(r -> GraftMath.sig9(dsum(ws.map { case (w, x) =>
        GraftMath.sig9(w.toDouble * x) }) / sw.toDouble))
    }
    val n = ms.size
    val s1 = dsum(ms.map(_._2))
    val s2 = dsum(ms.map(m => GraftMath.sig9(m._2 * m._2)))
    val bootMean = GraftMath.sig9(s1 / n)
    val varV = GraftMath.sig9(
      (s2 - GraftMath.sig9(s1 * s1) / n) / (n - 1).toDouble)
    val sd = GraftMath.sig9(math.sqrt(math.max(varV, 0.0)))
    val sorted = ms.sortBy(m => (m._2, m._1)).map(_._2)
    val kLo = math.floor(0.025 * (reps - 1)).toInt // 0-based
    val kHi = math.ceil(0.975 * (reps - 1)).toInt
    (bootMean, sd, sorted(kLo), sorted(kHi), n.toDouble)
  }

  test("matches the local reference exactly (weights, sig9 points, " +
      "rank bounds)") {
    val rows = (1L to 200L).map(i =>
      (i, ((i * 37) % 100).toDouble / 10.0 - 3.0))
    val got = Bootstrap.poissonMeans(
        rows.map { case (i, x) => ("a", i, x) }.toDF("g", "id", "x"),
        Seq("g"), "id", "x", replicates = 64)
      .head()
    val (bm, sd, lo, hi, nreps) = ref(rows, 64)
    assert(got.getAs[Long]("n_rows") == 200L)
    assert(got.getAs[Long]("n_reps") == nreps.toLong)
    assert(got.getAs[Double]("boot_mean") == bm)
    assert(got.getAs[Double]("boot_sd") == sd)
    assert(got.getAs[Double]("ci_lo") == lo)
    assert(got.getAs[Double]("ci_hi") == hi)
    // and the interval is sane around the point mean
    assert(lo <= bm && bm <= hi && sd > 0)
  }

  test("partition-invariant and re-run stable") {
    val d = (1L to 300L).map(i => (s"g${i % 3}", i, math.sin(i.toDouble)))
      .toDF("g", "id", "x")
    val a = Bootstrap.poissonMeans(d, Seq("g"), "id", "x", 32)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val b = Bootstrap.poissonMeans(d.repartition(7), Seq("g"), "id", "x", 32)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(a == b)
  }

  test("invalid params rejected") {
    val d = df(("a", 1L, 1.0))
    intercept[IllegalArgumentException] {
      Bootstrap.poissonMeans(d, Seq("g"), "id", "x", replicates = 1)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.poissonMeans(d, Seq.empty, "id", "x", replicates = 8)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.poissonMeans(d, Seq("g"), "id", "x", 8, alpha = 1.5)
    }
  }
}
