package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token/char/stopword features") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextStats.stats(df).as[
      (Long, Long, Long, Long, Double, Double, Double, String)].head()
    val (_, nTok, nUniq, nChars, avgLen, stopR, alphaR, lang) = r
    assert(nTok == 6 && nUniq == 5 && nChars == 22)
    assert(avgLen == 17.0 / 6) // "thecatsatonthemat" = 17 chars
    assert(stopR == 2.0 / 6)
    assert(alphaR == 17.0 / 22)
    assert(lang == "en")
  }

  test("stats: empty text -> zero counts, null ratios, 'other'") {
    val r = TextStats.stats(Seq((1L, "")).toDF("doc_id", "text"))
      .select("n_tokens", "avg_token_len", "lang_guess")
      .as[(Long, Option[Double], String)].head()
    assert(r == ((0L, None, "other")))
  }

  test("fingerprint is order-sensitive content identity") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextStats.fingerprints(df).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < Hashing.P))
  }

  test("qualityFilter: first failing rule wins; clean docs keep") {
    val docs = Seq(
      (1L, "the cat sat on the mat with a dog and a bird near it"),
      (2L, "short doc"),
      (3L, "the extraordinarily incomprehensible antidisestablishment " +
        "hippopotomonstrous supercalifragilistic deinstitutionalization " +
        "overintellectualization compartmentalization characteristically " +
        "internationalization"))
      .toDF("doc_id", "text")
    val r = TextStats.qualityFilter(docs)
      .as[(Long, String, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == (("ok", true)))
    assert(r(2L) == (("too_short", false)))
    assert(r(3L) == (("gibberish", false)))
  }

  test("bpeish token count: letter runs, digit runs, single marks") {
    val r = TextStats.tokenCounts(
      Seq((1L, "hello world42, don't!")).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].head()
    // ws: [hello, world42,, don't!] = 3
    // bpeish: hello|world|42|,|don|'|t|! = 8
    assert(r == ((1L, 3L, 8L)))
  }

  test("tokens drops empty strings from repeated separators") {
    val r = Seq("  a   b  ").toDF("t")
      .select(Hashing.tokens(col("t"))).as[Seq[String]].head()
    assert(r == Seq("a", "b"))
  }
}
