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
}
