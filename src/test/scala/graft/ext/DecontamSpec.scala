package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))

  test("overlap flags docs sharing an n-gram with the benchmark, " +
      "counts hits, and leaves disjoint docs clean") {
    val docs = toks(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven",
      3L -> "alpha beta gamma delta epsilon prime")
    // benchmark = the first 5 tokens of doc 1 => one 5-gram, shared by
    // doc 1 (and doc 3, which repeats the same leading phrase)
    val bench = Decontam.benchNgrams(
      toks(99L -> "alpha beta gamma delta epsilon").select(col("tk")), "tk")
    val r = Decontam.overlap(docs, "doc_id", "tk", bench)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(4)))).toMap
    assert(r(1L) == ((4L, 1L, true)))  // 8 toks -> 4 5-grams, 1 hit
    assert(r(2L) == ((3L, 0L, false)))
    assert(r(3L) == ((2L, 1L, true)))
    val fracs = Decontam.overlap(docs, "doc_id", "tk", bench)
      .select(col("doc_id"), col("contam_frac")).as[(Long, Double)]
      .collect().toMap
    assert(fracs(1L) == 0.25 && fracs(2L) == 0.0 && fracs(3L) == 0.5)
  }

  test("too-short docs get n_ngrams=0, NULL frac, not contaminated") {
    val docs = toks(1L -> "just four tokens here", 2L -> "")
    val bench = Decontam.benchNgrams(
      toks(9L -> "just four tokens here more words").select(col("tk")), "tk")
    val rows = Decontam.overlap(docs, "doc_id", "tk", bench).collect()
    assert(rows.length == 2) // short docs are reported, not dropped
    rows.foreach { x =>
      assert(x.getLong(1) == 0L && x.getLong(2) == 0L)
      assert(x.isNullAt(3) && !x.getBoolean(4))
    }
  }

  test("benchmark n-grams are deduplicated: a corpus n-gram appearing " +
      "in two benchmark items counts once") {
    val docs = toks(1L -> "p q r s t u")
    // same 5-gram in both benchmark items
    val bench = Decontam.benchNgrams(
      toks(8L -> "p q r s t", 9L -> "x p q r s t").select(col("tk")), "tk")
    val row = Decontam.overlap(docs, "doc_id", "tk", bench).collect().head
    assert(row.getLong(2) == 1L)
  }
}
