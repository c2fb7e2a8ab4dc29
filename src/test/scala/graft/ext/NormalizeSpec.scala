package graft.ext

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("lowercases, maps control chars, collapses runs, trims") {
    val docs = Seq(
      (1L, "  Hello\tWORLD  now  "),
      (2L, "already clean"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = TextStats.normalize(docs)
      .select("doc_id", "norm_text", "n_chars_norm")
      .as[(Long, String, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, "hello world now", 15L)))
    assert(r(2L) == ((2L, "already clean", 13L)))
    assert(r(3L) == ((3L, "", 0L)))
  }

  test("normalization is idempotent (fixpoint on its own output)") {
    val docs = Seq((1L, "AB   C\t\tD")).toDF("doc_id", "text")
    val once = TextStats.normalize(docs)
      .select($"doc_id", $"norm_text".as("text"))
    val twice = TextStats.normalize(once)
      .select("norm_text").as[String].head()
    assert(twice == "a b c d")
  }
}
