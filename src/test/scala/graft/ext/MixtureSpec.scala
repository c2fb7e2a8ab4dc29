package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 2 sources x 2 langs, skewed toward (a, en)
  private def corpus = Seq.fill(6)(("a", "en")) ++ Seq.fill(2)(("a", "de")) ++
    Seq.fill(1)(("b", "en")) ++ Seq.fill(1)(("b", "de"))
  // target: uniform over sources AND langs
  private def tgt = Seq(("a", "en"), ("a", "de"), ("b", "en"), ("b", "de"))

  private def rake(rounds: Int) = Mixture.ipfRake(
    corpus.toDF("src", "lng"), tgt.toDF("src", "lng"),
    "src", "lng", rounds = rounds)

  test("ipfRake matches the last-raked (column) marginal exactly and " +
    "preserves total mass") {
    val r = rake(2)
    val n = 10.0
    // after the final column half-step the lang marginals are exact
    val langMass = r.groupBy("lng").agg(sum($"mass").as("m"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(langMass("en") - n / 2) < 1e-6)
    assert(math.abs(langMass("de") - n / 2) < 1e-6)
    // and the total stays the corpus size
    val tot = r.agg(sum($"mass")).as[Double].head()
    assert(math.abs(tot - n) < 1e-6)
  }

  test("ipfRake converges toward the row marginal across sweeps") {
    def rowGap(rounds: Int): Double = {
      val m = rake(rounds).groupBy("src").agg(sum($"mass").as("m"))
        .as[(String, Double)].collect().toMap
      math.abs(m("a") - 5.0) + math.abs(m("b") - 5.0)
    }
    val g1 = rowGap(1)
    val g3 = rowGap(3)
    assert(g3 < g1, s"IPF did not converge: gap(1 sweep)=$g1 gap(3)=$g3")
    assert(g3 < 0.05, s"row marginal gap after 3 sweeps: $g3")
  }

  test("categories absent from the target rake to weight 0") {
    val t2 = Seq(("a", "en"), ("a", "de")).toDF("src", "lng") // no b
    val r = Mixture.ipfRake(corpus.toDF("src", "lng"), t2,
      "src", "lng", rounds = 2)
    val bw = r.where($"src" === "b").select("weight")
      .as[Double].collect()
    assert(bw.nonEmpty && bw.forall(_ == 0.0))
    // the surviving source still carries the full calibrated mass
    val tot = r.agg(sum($"mass")).as[Double].head()
    assert(math.abs(tot - 10.0) < 1e-6)
  }

  test("uniform corpus with matching target keeps weights at 1") {
    val u = tgt.toDF("src", "lng")
    val r = Mixture.ipfRake(u, u, "src", "lng", rounds = 2)
    val ws = r.select("weight").as[Double].collect()
    assert(ws.length == 4 && ws.forall(w => math.abs(w - 1.0) < 1e-9))
  }
}
