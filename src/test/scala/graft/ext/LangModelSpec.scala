package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val toks = Seq(
    (1L, "a a b"), (2L, "b c"), (3L, ""))
    .toDF("doc_id", "text")
    .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))

  test("unigramCounts counts corpus occurrences") {
    val c = LangModel.unigramCounts(toks, "tk")
      .as[(String, Long)].collect().toMap
    assert(c == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("score: exact probabilities, min, and rare fraction; empty docs " +
      "drop out") {
    val counts = LangModel.unigramCounts(toks, "tk")
    // N = 5; p(a) = p(b) = 0.4, p(c) = 0.2
    val r = LangModel.score(toks, "doc_id", "tk", counts, rareMax = 1L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L)) // doc 3 has no positions
    val d1 = r(1L)
    assert(d1.getLong(1) == 3L)
    assert(math.abs(d1.getDouble(2) - 0.4) < 1e-9) // (.4+.4+.4)/3
    assert(d1.getDouble(3) == 0.4)
    assert(d1.getDouble(4) == 0.0) // no token with corpus count <= 1
    val d2 = r(2L)
    assert(d2.getLong(1) == 2L)
    assert(math.abs(d2.getDouble(2) - 0.3) < 1e-9) // (.4+.2)/2
    assert(d2.getDouble(3) == 0.2)
    assert(d2.getDouble(4) == 0.5) // c is rare
  }

  test("reference-corpus scoring: OOV tokens score p=0 and count as " +
      "rare instead of being dropped") {
    val counts = LangModel.unigramCounts(toks, "tk") // vocab: a, b, c
    val unseen = Seq((10L, "zz qq a")).toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))
    val r = LangModel.score(unseen, "doc_id", "tk", counts, rareMax = 1L)
      .collect()
    assert(r.length == 1) // doc present even though mostly OOV
    val d = r.head
    assert(d.getLong(1) == 3L) // every position kept
    assert(d.getDouble(3) == 0.0) // min prob: the unseen tokens
    assert(math.abs(d.getDouble(4) - 2.0 / 3) < 1e-9) // zz, qq rare
    assert(math.abs(d.getDouble(2) - 0.4 / 3) < 1e-9) // (0+0+0.4)/3
    // a fully-OOV doc still scores (maximally suspicious), not vanishes
    val allOov = LangModel.score(
      Seq((11L, "xx yy")).toDF("doc_id", "text")
        .select(col("doc_id"), Hashing.tokens(col("text")).as("tk")),
      "doc_id", "tk", counts).collect()
    assert(allOov.length == 1 && allOov.head.getDouble(4) == 1.0)
  }

  test("scoring is deterministic across runs and partitionings") {
    val docs = (1L to 500L)
      .map(i => (i, s"tok${i % 7} tok${i % 13} tok${i % 7}"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))
    val counts = LangModel.unigramCounts(docs, "tk")
    val once = LangModel.score(docs, "doc_id", "tk", counts)
      .collect().toSet
    val again = LangModel.score(docs.repartition(7), "doc_id", "tk",
      LangModel.unigramCounts(docs.repartition(3), "tk")).collect().toSet
    assert(once == again)
  }

  test("vocabCoverage: rank by (count desc, tok), exact cumulative coverage") {
    // counts: a=4, b=3, c=3, d=1 -> N=11
    val docs = Seq("a a b c", "a b c d", "a b c").toDF("text")
      .select(Hashing.tokens(col("text")).as("tk"))
    val r = LangModel.vocabCoverage(docs, "tk", topV = 3)
      .as[(Long, String, Long, Double)].collect().toList
    assert(r == List(
      (1L, "a", 4L, 4.0 / 11),
      (2L, "b", 3L, 7.0 / 11), // tie at 3 -> 'b' before 'c'
      (3L, "c", 3L, 10.0 / 11)))
  }

  test("pmi: collocation positive, independence ~0, minCount gates") {
    import graft.functions.GraftMath
    // "a b" always adjacent (collocation); "c"/"d" appear but never as
    // a counted frequent pair
    val docs = (1 to 10).map(_ => "a b c d").toDF("text")
      .select(Hashing.tokens(col("text")).as("tk"))
    val uni = LangModel.unigramCounts(docs, "tk")
    val bi = LangModel.bigramCounts(docs, "tk")
    val p = LangModel.pmi(uni, bi, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // N1 = 40 positions, N2 = 30 pairs; c(a)=c(b)=10, c2(a,b)=10
    // PMI(a,b) = ln((10/30) / ((10/40)*(10/40))) = ln(16/3)
    val exp = GraftMath.sig9(math.log((10.0 / 30.0) /
      ((10.0 / 40.0) * (10.0 / 40.0))))
    assert(p(("a", "b")) === ((10L, exp)))
    assert(p.keySet === Set(("a", "b"), ("b", "c"), ("c", "d")))
    // pairs below minCount are gated
    assert(LangModel.pmi(uni, bi, minCount = 11L).count() === 0L)
  }

  test("vocabCoverage is partition-invariant and topV-bounded") {
    val docs = (1L to 200L).map(i => s"tok${i % 9} tok${i % 4}")
      .toDF("text").select(Hashing.tokens(col("text")).as("tk"))
    def run(parts: Int) =
      LangModel.vocabCoverage(docs.repartition(parts), "tk", topV = 5)
        .collect().toList
    assert(run(1) == run(6))
    assert(run(1).size == 5)
  }
}
