package graft.ext

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldV = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
    (4L, "delta")).toDF("doc_id", "text")
  private def newV = Seq((1L, "alpha"), (2L, "beta CHANGED"),
    (4L, "delta"), (5L, "epsilon")).toDF("doc_id", "text")

  test("statuses: added / removed / changed / unchanged") {
    val r = CorpusDiff.diff(oldV, newV)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("summary counts each status") {
    val s = CorpusDiff.summary(oldV, newV)
      .as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  // ===== tokenDivergence (per-group JSD vs the whole corpus) ==========

  import graft.functions.GraftMath
  import org.apache.spark.sql.functions._

  /** Local replica of the documented per-group JSD chain (sig9 and
    * dsumStable(12) points included), complement fold in closed form. */
  private def refJsd(rows: Seq[(String, Seq[String])])
      : Map[String, Double] = {
    def dsum12(ts: Seq[Double]): Double = GraftMath.sig9(ts
      .map(BigDecimal(_).setScale(15, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val all = rows.flatMap(_._2)
    val nTot = all.size.toDouble
    val cg = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).map { case (g, docs) =>
      val toks = docs.flatMap(_._2)
      val ns = toks.size.toDouble
      val cs = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val terms = cs.toSeq.sortBy(_._1).map { case (tok, c) =>
        val p = c.toDouble / ns
        val q = cg(tok).toDouble / nTot
        val m = (p + q) / 2.0
        GraftMath.sig9(0.5 * p * GraftMath.sig9(math.log(p / m)) +
          0.5 * q * GraftMath.sig9(math.log(q / m)))
      }
      val qIn = dsum12(cs.toSeq.sortBy(_._1)
        .map { case (tok, _) => GraftMath.sig9(cg(tok).toDouble / nTot) })
      g -> GraftMath.sig9(dsum12(terms) +
        0.5 * CorpusDiff.Ln2 * (1.0 - qIn))
    }
  }

  private def runJsd(rows: Seq[(String, Seq[String])]) =
    CorpusDiff.tokenDivergence(
      rows.toDF("g", "tk").repartition(3), "g", "tk")
      .select(col("g"), col("jsd"), col("n_tok_positions"), col("n_vocab"))
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("JSD: group == corpus -> 0; disjoint group -> near ln2 bound") {
    val one = runJsd(Seq(("a", Seq("x", "y", "x"))))
    assert(one("a")._2 == 0.0, "single group IS the corpus -> jsd 0")
    val rows = Seq(
      ("a", Seq("x", "x", "y")), ("b", Seq("z", "w", "z", "w")))
    val got = runJsd(rows)
    val want = refJsd(rows)
    rows.map(_._1).distinct.foreach { g =>
      assert(got(g)._2 == want(g), s"group $g")
      assert(got(g)._2 > 0.0 && got(g)._2 < CorpusDiff.Ln2)
    }
  }

  test("JSD matches the local reference on overlapping vocabularies " +
      "and counts positions/vocab") {
    val rows = Seq(
      ("a", Seq("x", "y", "z", "x")), ("a", Seq("y", "y")),
      ("b", Seq("x", "z", "z", "q")), ("c", Seq("q", "q", "x")))
    val got = runJsd(rows)
    val want = refJsd(rows)
    Seq("a", "b", "c").foreach { g =>
      assert(got(g)._2 == want(g), s"group $g")
    }
    assert(got("a")._3 == 6L && got("a")._4 == 3L) // positions, vocab
    assert(got("c")._3 == 3L && got("c")._4 == 2L)
  }

  test("tokenEntropy: H = ln N − (Σ c ln c)/N against a local replica; " +
      "uniform maxes the normalized score, constant floors it") {
    import graft.functions.GraftMath.sig9
    val rows = Seq(
      ("u", Seq("a", "b", "c", "d")),       // uniform: H = ln 4, norm 1
      ("k", Seq("z", "z", "z", "z")),       // constant: H = 0
      ("m", Seq("a", "a", "b", "c", "a")))  // mixed
    val got = CorpusDiff.tokenEntropy(
        rows.toDF("source", "tk").repartition(3), "source", "tk")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    def ref(cs: Seq[Int]): Double = {
      val n = cs.sum
      var s = BigDecimal(0)
      cs.filter(_ > 1).foreach { c =>
        s += BigDecimal(java.math.BigDecimal.valueOf(
          sig9(c.toDouble * sig9(math.log(c.toDouble)))))
          .setScale(15, BigDecimal.RoundingMode.HALF_UP) }
      val s9 = sig9(
        s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      sig9(sig9(math.log(n.toDouble)) - s9 / n)
    }
    assert(got("u") === ((4L, 4L, Some(ref(Seq(1, 1, 1, 1))),
      Some(sig9(ref(Seq(1, 1, 1, 1)) / sig9(math.log(4.0)))))))
    assert(got("u")._4.get === 1.0)
    // V = 1: entropy ~0 (exact up to the sig9'd ln chain), no norm
    assert(got("k") === ((4L, 1L, Some(ref(Seq(4))), None)))
    assert(math.abs(got("k")._3.get) < 1e-6) // scale-6 rounding residue
    assert(got("m")._3 === Some(ref(Seq(3, 1, 1))))
    assert(got("m")._3.get > 0 && got("m")._4.get < 1.0)
  }
}
