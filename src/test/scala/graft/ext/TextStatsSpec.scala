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

  test("repetition: top-unigram and duplicate-bigram fractions") {
    val docs = Seq(
      (1L, "a a a b"), // top unigram a: 3/4; bigrams [a a, a a, a b]: 1 - 2/3
      (2L, "x y z"), // all unique: 1/3 and 0.0
      (3L, "solo")) // single token: no bigrams -> null
      .toDF("doc_id", "text")
    val r = TextStats.repetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(1) == 0.75)
    assert(math.abs(r(1L).getDouble(2) - (1.0 - 2.0 / 3.0)) < 1e-15)
    assert(r(2L).getDouble(1) == 1.0 / 3.0 && r(2L).getDouble(2) == 0.0)
    assert(r(3L).getDouble(1) == 1.0 && r(3L).isNullAt(2))
  }

  test("chunk: overlapping windows, short tail kept, empty doc dropped") {
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val r = TextStats.chunk(docs, chunkTokens = 50, overlap = 10)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: starts 0, 40, 80 -> lengths 50, 50, 15
    assert(r(1L).map(_._4).toSeq == Seq(50L, 50L, 15L))
    assert(r(1L)(0)._3.startsWith("t1 ") && r(1L)(1)._3.startsWith("t41 "))
    // 10-token overlap: chunk 0 ends with t50, chunk 1 starts at t41
    assert(r(1L)(0)._3.endsWith(" t50") && r(1L)(2)._3.endsWith(" t95"))
    assert(!r.contains(2L)) // empty doc -> no chunks
    assert(r(3L).map(x => (x._2, x._4)).toSeq == Seq((0L, 2L)))
  }

  test("redactPii masks emails and long digit runs, counts matches") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "call 12345678 or 999 ext 4321"), // only the 8-digit run
      (3L, "clean text")).toDF("doc_id", "text")
    val r = TextStats.redactPii(docs)
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == "mail <EMAIL> now" && r(1L)._3 == 1L)
    assert(r(2L)._2 == "call <NUM> or 999 ext 4321" && r(2L)._4 == 1L)
    assert(r(3L) == ((3L, "clean text", 0L, 0L)))
  }

  test("novelty: first occurrence by min doc id; repeats score 0; short docs drop") {
    val docs = Seq(
      (1L, "a b c d"),          // trigrams: a_b_c, b_c_d — both first here
      (2L, "a b c x y"),        // a_b_c repeats; b_c_x, c_x_y novel
      (3L, "a b c d"),          // exact repeat of doc 1 -> fully stale
      (4L, "t u")               // too short for a trigram -> drops out
    ).toDF("doc_id", "text")
    val r = TextStats.novelty(docs, n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == ((1L, 2L, 2L, 1.0)))
    assert(r(2L) == ((2L, 3L, 2L, 2.0 / 3)))
    assert(r(3L) == ((3L, 2L, 0L, 0.0)))
  }

  test("novelty: a pathologically hot n-gram (shared boilerplate in " +
      "every doc) stays exact — the shape the skew-safe plan exists for") {
    // 400 docs all sharing one boilerplate prefix: its trigrams occur
    // 400x (the hot reducer under the old window-by-hash plan; here
    // they collapse map-side in the groupBy partial). Unique suffixes
    // give each doc some novel trigrams. Expected values are
    // closed-form: doc 1 owns the 4 boilerplate trigrams + its 3
    // suffix/bridge trigrams; later docs own only their 3.
    val docs = (1L to 400L)
      .map(i => (i, s"the same boiler plate text in u$i v$i w$i"))
      .toDF("doc_id", "text")
    val r = TextStats.novelty(docs, n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r.size == 400)
    // 9 tokens -> 7 trigrams; 4 are pure boilerplate ("the same
    // boiler".."plate text in"), 3 touch the unique tokens
    assert(r(1L) == ((7L, 7L)))
    (2L to 400L).foreach(i => assert(r(i) == ((7L, 3L)), s"doc $i"))
  }

  test("novelty is partition-invariant") {
    val docs = (1L to 120L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 3} w${i % 5}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = TextStats.novelty(docs.repartition(parts))
      .collect().toSet
    assert(run(1) == run(7))
  }

  test("compressionRatio: repetition compresses, noise doesn't; empty is NULL") {
    val rep = "lorem ipsum " * 200
    val noise = new scala.util.Random(11).alphanumeric.take(2400).mkString
    val docs = Seq((1L, rep), (2L, noise), (3L, ""))
      .toDF("doc_id", "text")
    val r = TextStats.compressionRatio(docs)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 2400L && r(1L)._4.get < 0.05,
      s"boilerplate should crush: ${r(1L)}")
    assert(r(2L)._4.get > 0.5, s"alnum noise barely compresses: ${r(2L)}")
    assert(r(3L) == ((3L, 0L, r(3L)._3, None)))
  }

  test("compressionRatio is partition-invariant and id-type-agnostic") {
    val docs = Seq(("a", "x y z x y z x y z"), ("b", "qqq"))
      .toDF("doc_id", "text")
    def run(parts: Int) = TextStats.compressionRatio(docs.repartition(parts))
      .as[(String, Long, Long, Option[Double])].collect().toSet
    assert(run(1) == run(3))
  }

  test("vocabGrowth: cumulative distinct == first-occurrence collapse") {
    // 4 docs, checkpoints at halves: after 2 docs and after 4
    val docs = Seq(
      (10L, "a b a"),      // vocab {a,b}, 3 toks
      (20L, "b c"),        // +c -> 3 vocab, 5 toks
      (30L, "c c d d"),    // +d -> 4 vocab, 9 toks
      (40L, "a e"))        // +e -> 5 vocab, 11 toks
      .toDF("doc_id", "text").repartition(3)
    val got = TextStats.vocabGrowth(docs, "doc_id", "text",
        checkpoints = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) === ((2L, 20L, 5L, 3L)))
    assert(got(2L) === ((4L, 40L, 11L, 5L)))
  }

  test("vocabGrowth: monotone in both axes on a larger random-ish mix") {
    val docs = (1 to 60).map(i =>
      (i.toLong, Seq.tabulate(5)(k => s"t${(i * 7 + k * 13) % 40}")
        .mkString(" ")))
      .toDF("doc_id", "text").repartition(4)
    val rows = TextStats.vocabGrowth(docs, "doc_id", "text", 10)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(rows.length === 10)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.last._1 === 300L) // 60 docs x 5 tokens
    assert(rows.last._2 === 40L)  // full 40-token vocabulary reached
  }

  /** Local replica of the documented zipfFit chain over (rank, cnt)
    * pairs: sig9'd logs, dsumStable(9) sums, sig9'd OLS. */
  private def refZipf(pairs: Seq[(Long, Long)])
      : (Option[Double], Option[Double], Option[Double]) = {
    import graft.functions.GraftMath
    def s9(x: Double) = GraftMath.sig9(x)
    def stable(ts: Seq[Double]): Double = s9(ts
      .map(BigDecimal(_).setScale(15, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val xs = pairs.map(p => s9(math.log(p._1.toDouble)))
    val ys = pairs.map(p => s9(math.log(p._2.toDouble)))
    val n = pairs.size.toDouble
    val sx = stable(xs); val sy = stable(ys)
    val sxy = stable(xs.zip(ys).map { case (x, y) => s9(x * y) })
    val sxx = stable(xs.map(x => s9(x * x)))
    val syy = stable(ys.map(y => s9(y * y)))
    val num = n * sxy - sx * sy
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    if (pairs.size < 2 || !(dx > 0)) (None, None, None)
    else {
      val slope = s9(num / dx)
      (Some(slope), Some(s9((sy - slope * sx) / n)),
        if (dy > 0) Some(s9(num * num / (dx * dy))) else None)
    }
  }

  test("zipfFit: exact power law recovers slope ~ -1, r2 ~ 1, and " +
      "every value equals the sig9/dsumStable replica") {
    // counts c_r = 720/r for ranks 1..6: ln c = ln 720 - 1 * ln r.
    val docs = (1 to 6).flatMap { r =>
      Seq.fill(720 / r)(s"t$r")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .groupBy(_._1 / 7).map { case (g, ws) =>
        (g.toLong, ws.map(_._2).mkString(" "))
      }.toSeq
    val got = TextStats.zipfFit(docs.toDF("doc_id", "text"), topN = 512)
      .head()
    val (slope, intercept, r2) = refZipf(
      (1 to 6).map(r => (r.toLong, (720 / r).toLong)))
    assert(Option(got.getAs[Double]("slope")) == slope)
    assert(Option(got.getAs[Double]("intercept")) == intercept)
    assert(Option(got.getAs[Double]("r2")) == r2)
    assert(math.abs(got.getAs[Double]("slope") + 1.0) < 1e-6)
    assert(got.getAs[Double]("r2") > 0.999999)
    assert(got.getAs[Long]("n_ranks") == 6L)
  }

  test("zipfFit: rank ties break on token name; topN caps the fit; " +
      "single-token corpus -> NULLs") {
    // two tokens tied at 4, one at 2: ranks (a,b) by name then c
    val df = Seq((1L, "b a b a c"), (2L, "a b a b c"))
      .toDF("doc_id", "text")
    val full = TextStats.zipfFit(df, topN = 512).head()
    assert(full.getAs[Long]("n_ranks") == 3L)
    val capped = TextStats.zipfFit(df, topN = 2).head()
    assert(capped.getAs[Long]("n_ranks") == 2L)
    // ranks 1,2 share count 4 -> dy = 0 -> flat slope, r2 NULL
    val (cSlope, _, cR2) = refZipf(Seq((1L, 4L), (2L, 4L)))
    assert(Option(capped.getAs[Double]("slope")) == cSlope)
    assert(math.abs(capped.getAs[Double]("slope")) < 1e-8)
    assert(capped.isNullAt(capped.fieldIndex("r2")) && cR2.isEmpty)
    val one = TextStats.zipfFit(
      Seq((1L, "x x x")).toDF("doc_id", "text")).head()
    assert(one.isNullAt(one.fieldIndex("slope")))
    assert(one.getAs[Long]("n_ranks") == 1L)
  }

  test("readability: exact word/sentence/syllable counts per contract") {
    // "the cat sat. it ran!" -> w=5, sentences=2,
    // syllable runs: e,a,a,i,a = 5, no vowel-less words -> y=5
    val df = Seq((1L, "g1", "the cat sat. it ran!"),
      (2L, "g1", "xyz 123"), // 2 words, 0 sentence runs -> clamp 1; y=2
      (3L, "g2", "beautiful day")) // runs: eau,i,u + a,y... count below
      .toDF("doc_id", "source", "text")
    val got = TextStats.readability(df).orderBy("source").collect()
    val g1 = got(0)
    assert(g1.getAs[Long]("n_words") == 7L)
    assert(g1.getAs[Long]("n_sentences") == 3L)
    assert(g1.getAs[Long]("n_syllables") == 7L)
    // fk = .39*(7/3) + 11.8*(7/7) - 15.59, computed identically here
    val fk = graft.functions.GraftMath.sig9(
      0.39 * (7.0 / 3.0) + 11.8 * 1.0 - 15.59)
    assert(g1.getAs[Double]("fk_grade") == fk)
    val g2 = got(1)
    // "beautiful" -> eau, i, u = 3 runs; "day" -> a, y... 'ay' is one
    // run (both vowel-class chars) -> beautiful(3) + day(1) = 4
    assert(g2.getAs[Long]("n_syllables") == 4L)
    assert(g2.getAs[Long]("n_sentences") == 1L)
  }

  test("readability: empty source -> zero words, NULL scores") {
    val got = TextStats.readability(
      Seq((1L, "s", "")).toDF("doc_id", "source", "text")).head()
    assert(got.getAs[Long]("n_words") == 0L)
    assert(got.isNullAt(got.fieldIndex("fk_grade")))
    assert(got.isNullAt(got.fieldIndex("reading_ease")))
  }

  // ===== TF-IDF keywords ==============================================

  private val kwDocs = Seq(
    (1L, "apple apple banana z"),
    (2L, "banana cherry cherry cherry z"),
    (3L, "apple cherry date date z")).toDF("doc_id", "text")

  test("tfidfKeywords: scores follow sig9(sig9(tf)*sig9(idf)); " +
      "everywhere-tokens score exactly 0; score ties break token-asc") {
    import graft.functions.GraftMath.sig9
    val got = TextStats.tfidfKeywords(kwDocs, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getAs[String]("token")) ->
        ((r.getAs[Long]("kw_rank"), r.getAs[Double]("score"),
          r.getAs[Long]("df"), r.getAs[Long]("dl")))).toMap
    // doc 3 (dl 5): date tf 2/5 df 1; apple/cherry tf 1/5 df 2; z df 3
    assert(got((3L, "date"))._2 ==
      sig9(sig9(2.0 / 5.0) * sig9(math.log(3.0 / 1.0))))
    assert(got((3L, "date"))._1 == 1L)
    // apple and cherry tie at the identical sig9 score -> token asc
    assert(got((3L, "apple"))._2 == got((3L, "cherry"))._2)
    assert(got((3L, "apple"))._1 == 2L)
    assert(got((3L, "cherry"))._1 == 3L)
    // z appears in all 3 docs: idf = ln(1) = 0 -> score exactly 0
    assert(got((3L, "z"))._2 == 0.0)
    assert(got((3L, "z"))._1 == 4L)
    assert(got((1L, "apple"))._3 == 2L && got((1L, "apple"))._4 == 4L)
  }

  test("lexicalDiversity: TTR, hapax rate and Yule's K from exact " +
      "counts; all-unique vocabulary gives K = 0") {
    import graft.functions.GraftMath.sig9
    val docs = Seq((1L, "s1", "a a b c"), (2L, "s2", "x y z"))
      .toDF("doc_id", "source", "text")
    val got = TextStats.lexicalDiversity(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = got("s1") // counts a:2 b:1 c:1 -> N=4 V=3 hapax=2 c2=6
    assert(s1.getAs[Long]("n_tokens") == 4L)
    assert(s1.getAs[Long]("vocab") == 3L)
    assert(s1.getAs[Long]("n_hapax") == 2L)
    assert(s1.getAs[Double]("ttr") == 0.75)
    assert(s1.getAs[Double]("hapax_rate") == sig9(2.0 / 3.0))
    // K = 1e4 * (6 - 4) / 16 = 1250
    assert(s1.getAs[Double]("yule_k") == 1250.0)
    val s2 = got("s2") // all hapax -> c2 = N -> K exactly 0
    assert(s2.getAs[Double]("yule_k") == 0.0)
    assert(s2.getAs[Double]("ttr") == 1.0)
  }

  test("tfidfKeywords: k truncates per document; short docs yield " +
      "fewer than k rows") {
    val got = TextStats.tfidfKeywords(kwDocs, k = 2)
    assert(got.count() == 6L) // 2 per doc
    assert(got.where(col("kw_rank") > 2).count() == 0L)
    val one = TextStats.tfidfKeywords(
      Seq((9L, "solo")).toDF("doc_id", "text"), k = 5)
    assert(one.count() == 1L) // one distinct token -> one keyword row
  }

  test("unseenMass: hand Good-Turing P0 and bias-corrected Chao1") {
    val docs = Seq(
      ("A", "a a b c"),        // N=4 V=3 f1=2 f2=1
      ("B", "x x y y z z"))    // N=6 V=3 f1=0 f2=0
      .toDF("source", "text")
    val got = TextStats.unseenMass(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    def near(x: Double, y: Double) = math.abs(x - y) < 1e-9
    val a = got("A")
    assert((a._1, a._2, a._3, a._4) === (4L, 3L, 2L, 1L))
    assert(near(a._5, 0.5) && near(a._6, 0.5))
    // chao1 = 3 + 2*1/(2*(1+1)) = 3.5
    assert(near(a._7, 3.5))
    val b = got("B")
    // no singletons: unseen mass 0, full coverage, chao1 = V exactly
    assert(near(b._5, 0.0) && near(b._6, 1.0) && near(b._7, 3.0))
  }
}
