package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich et al. fixture: low x5, lower x2, newest x6,
  // widest x3
  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq(Tuple1(words)).toDF("tk")
  }

  test("spaced pads and separates characters") {
    val r = Seq(Tuple1("abc")).toDF("w")
      .select(Bpe.spaced(col("w"))).as[String].head()
    assert(r == " a b c ")
  }

  test("reference fixture learns (e,s), (es,t), (l,o) in order") {
    val rules = Bpe.train(corpus, "tk", merges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(rules == Seq(
      (1L, "e", "s", "es", 9L),   // e-s 9 ties s-t 9 -> lex smaller left
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)))  // l-o 7 ties o-w 7
  }

  test("vocabulary exhaustion stops the loop instead of wiping the dict") {
    // single-character words carry no pairs after one merge is learned
    val tiny = Seq(Tuple1(Seq("ab", "ab", "c", "d"))).toDF("tk")
    val rules = Bpe.train(tiny, "tk", merges = 5)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(rules == Seq((1L, "a", "b", "ab", 2L))) // then exhausted
    // no pairs at all -> empty rules frame with the right schema
    val none = Seq(Tuple1(Seq("x", "y"))).toDF("tk")
    val r2 = Bpe.train(none, "tk", merges = 2)
    assert(r2.columns.toSeq ==
      Seq("step", "lhs", "rhs", "merged", "pair_count"))
    assert(r2.count() == 0)
  }

  test("consecutive merge runs resolve greedily (a a a a -> aa aa)") {
    val rep = Seq(Tuple1(Seq.fill(3)("aaaa"))).toDF("tk")
    val rules = Bpe.train(rep, "tk", merges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // 3 adjacent a-a pairs per word x 3 words = 9; after the merge each
    // word is "aa aa" (greedy), giving ONE aa-aa pair per word
    assert(rules == Seq(
      (1L, "a", "a", "aa", 9L),
      (2L, "aa", "aa", "aaaa", 3L)))
  }
}
