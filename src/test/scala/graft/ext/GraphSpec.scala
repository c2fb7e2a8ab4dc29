package graft.ext

import graft.SparkSpec
import graft.functions.GraftMath
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("a", "b", "w")
  private def nodes(ids: Long*): DataFrame = ids.toDF("v")

  private def run(e: DataFrame, n: DataFrame, iters: Int)
      : Map[Long, Double] =
    Graph.pageRank(e, "a", "b", "w", n, "v", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Reference power iteration replicating the documented formula —
    * N-scaled mass, sig9'd terms, stable decimal sum (dec15 per term,
    * decimal-space round to SumScale places, then sig9) at the same
    * points as the engine, final /N projection. */
  private def stableSum(terms: Seq[Double]): Double =
    GraftMath.sig9(terms
      .map(t => BigDecimal(t).setScale(15, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(Graph.SumScale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble)

  private def ref(e: Seq[(Long, Long, Long)], ns: Seq[Long], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nN = ns.size
    val outW = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var m = ns.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val terms = e.map { case (a, b, w) =>
        b -> GraftMath.sig9(m(a) * w.toDouble / outW(a).toDouble) }
      val s = terms.groupBy(_._1).view
        .mapValues(ts => stableSum(ts.map(_._2))).toMap
      val dangling = ns.filter(v => !outW.contains(v))
      val dm = if (dangling.isEmpty) 0.0
        else stableSum(dangling.map(m))
      m = ns.map(v => v -> GraftMath.sig9(
        (1.0 - d) + d * (s.getOrElse(v, 0.0) + dm / nN))).toMap
    }
    m.view.mapValues(x => GraftMath.sig9(x / nN)).toMap
  }

  test("ranks match the reference trajectory exactly (sig9 points incl.)") {
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 3L), (3L, 1L, 2L),
      (1L, 3L, 1L))
    val ns = Seq(1L, 2L, 3L, 4L) // 4 is dangling AND unreferenced
    assert(run(edges(e: _*), nodes(ns: _*), 4) === ref(e, ns, 4))
  }

  test("rank mass is conserved (sums to ~1 with dangling nodes present)") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L)) // 3 dangles
    val r = run(edges(e: _*), nodes(1L, 2L, 3L), 6)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("heavier-in-weight node outranks its peers") {
    // everyone points at 1; 2 and 3 only get the base share
    val e = Seq((2L, 1L, 5L), (3L, 1L, 5L), (1L, 2L, 1L), (1L, 3L, 1L))
    val r = run(edges(e: _*), nodes(1L, 2L, 3L), 5)
    assert(r(1L) > r(2L) && r(1L) > r(3L))
    assert(r(2L) === r(3L)) // symmetric positions tie exactly
  }

  test("partition-invariant (decimal sums)") {
    val e = edges((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L), (1L, 3L, 4L))
    val n = nodes(1L, 2L, 3L)
    assert(run(e.repartition(7), n.repartition(3), 3) === run(e, n, 3))
  }

  test("invalid params rejected") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges((1L, 2L, 1L)), "a", "b", "w", nodes(1L, 2L),
        "v", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges((1L, 2L, 1L)), "a", "b", "w", nodes(1L, 2L),
        "v", iters = 1, damping = 1.5)
    }
  }
}
