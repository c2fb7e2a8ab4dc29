package graft.ext

import graft.SparkSpec
import graft.functions.GraftMath
import org.apache.spark.sql.functions._

class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  /** Local replica of the documented statistic (sig9 + dsumStable(6)
    * points included), over the FULL margin grid with zero cells. */
  private def ref(rows: Seq[(String, String)]): (Double, Long) = {
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rs = rows.map(_._1).distinct.sorted
    val cs = rows.map(_._2).distinct.sorted
    val rt = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toDouble
    val contribs = for (r <- rs; c <- cs) yield {
      val o = cells.getOrElse((r, c), 0L).toDouble
      val e = rt(r).toDouble * ct(c).toDouble / n
      GraftMath.sig9((o - e) * (o - e) / e)
    }
    val chi2 = GraftMath.sig9(contribs
      .map(BigDecimal(_).setScale(15, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    (chi2, (rs.size - 1).toLong * (cs.size - 1))
  }

  private def run(rows: Seq[(String, String)]) =
    Profile.chiSquare(rows.toDF("r", "c").repartition(3), "r", "c").head()

  test("textbook 2x2 table matches the hand formula") {
    // O = [[10, 20], [30, 15]]
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(15)(("b", "y"))
    val got = run(rows)
    val (chi2, dof) = ref(rows)
    assert(got.getAs[Double]("chi2") == chi2)
    assert(got.getAs[Long]("dof") == dof && dof == 1L)
    assert(got.getAs[Long]("n") == 75L)
  }

  test("absent (r,c) pairs still contribute E — zero-cell padding") {
    // (b, y) never observed; dropping it would understate chi2
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x"))
    val got = run(rows)
    val (chi2, _) = ref(rows)
    assert(got.getAs[Double]("chi2") == chi2)
    // sanity: brute-force without the zero cell would differ
    val inOnly = Seq(("a", "x", 5L), ("a", "y", 5L), ("b", "x", 5L))
      .map { case (r, c, o) =>
        val rt = Map("a" -> 10.0, "b" -> 5.0)(r)
        val ct = Map("x" -> 10.0, "y" -> 5.0)(c)
        val e = rt * ct / 15.0
        (o - e) * (o - e) / e
      }.sum
    assert(chi2 > inOnly, "zero cell must add its expected count")
  }

  test("independent margins -> chi2 0; degenerate table -> NULL") {
    // perfectly proportional cells
    val rows = Seq.fill(4)(("a", "x")) ++ Seq.fill(8)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    assert(run(rows).getAs[Double]("chi2") == 0.0)
    val deg = run(Seq(("a", "x"), ("a", "y")))
    assert(deg.isNullAt(deg.fieldIndex("chi2")))
    assert(deg.getAs[Long]("dof") == 0L)
  }

  test("null categories are excluded, result partition-invariant") {
    val base = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"),
      ("a", "x"), ("b", "y"), ("a", "y"), ("b", "x"))
    val withNulls = base.map { case (r, c) => (r: String, c: String) } ++
      Seq((null: String, "x"), ("a", null: String))
    val got = Profile.chiSquare(
      withNulls.toDF("r", "c").repartition(7), "r", "c").head()
    val (chi2, _) = ref(base)
    assert(got.getAs[Double]("chi2") == chi2)
    assert(got.getAs[Long]("n") == 8L)
  }
}
