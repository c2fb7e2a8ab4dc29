package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  // c1: a=3 b=3 x=1 (N=7); c2: (a,b)=3, (b,a)=1
  private def toks = Seq(
    (1L, Seq("a", "b", "a", "b")),
    (2L, Seq("a", "b")),
    (3L, Seq("x")) // single token: no bigram positions
  ).toDF("doc_id", "tk")

  private def score = LangModel.bigramScore(toks, "doc_id", "tk",
    LangModel.unigramCounts(toks, "tk"),
    LangModel.bigramCounts(toks, "tk"))

  test("interpolated probabilities match the hand-computed model") {
    val pAb = 0.7 * (3.0 / 3.0) + (1 - 0.7) * (3.0 / 7.0)
    val pBa = 0.7 * (1.0 / 3.0) + (1 - 0.7) * (3.0 / 7.0)
    val r = score.as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set(1L, 2L)) // doc 3 has no positions
    assert(r(1L)._2 == 3L)
    assert(math.abs(r(1L)._3 - (2 * pAb + pBa) / 3) < 1e-8)
    assert(math.abs(r(1L)._4 - pBa) < 1e-12) // min position untouched
    assert(r(2L)._2 == 1L)
    assert(math.abs(r(2L)._3 - pAb) < 1e-8)
  }

  test("reference-corpus scoring: OOV bigrams score the unigram floor") {
    val ref = Seq((10L, Seq("a", "b"))).toDF("doc_id", "tk")
    val probe = Seq((20L, Seq("z", "a"))).toDF("doc_id", "tk")
    // model from ref only: c1 a=1 b=1 (N=2); (z,a) has c2=0, c1(z)=0
    val r = LangModel.bigramScore(probe, "doc_id", "tk",
        LangModel.unigramCounts(ref, "tk"),
        LangModel.bigramCounts(ref, "tk"))
      .as[(Long, Long, Double, Double)].head()
    // p = 0.7*0/1 + 0.3*(1/2) - no 0/0, unigram term survives
    assert(math.abs(r._3 - (1 - 0.7) * 0.5) < 1e-12)
  }
}
