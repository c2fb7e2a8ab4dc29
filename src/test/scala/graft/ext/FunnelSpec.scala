package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 100L)
    .map(i => (i, if (i % 4 == 0) "short" else ("w " * 20).trim))
    .toDF("doc_id", "text")

  test("stage observations collect during ONE action and match " +
      "independently-computed counts") {
    val gated = Funnel.stage(
      docs.filter(length(col("text")) > 10), "gate")
    val deduped = Funnel.stage(
      gated.dropDuplicates("text"), "dedup")
    val out = Funnel.stage(
      deduped.filter(col("doc_id") <= 50), "cap")
    out.collect() // the one action
    val m = Funnel.report(out)
    assert(m("gate")("rows") == 75L)  // 25 shorts dropped
    assert(m("dedup")("rows") == 1L)  // all survivors share one text
    assert(m("cap")("rows") == 1L)
    // un-executed frames report nothing
    assert(Funnel.report(docs.filter(col("doc_id") > 0)).isEmpty)
  }

  test("extra aggregate observations ride the same pass") {
    val staged = Funnel.stage(
      docs.withColumn("n_tokens", size(split(col("text"), " "))),
      "tok", sum(col("n_tokens")).as("tokens"))
    staged.collect()
    val m = Funnel.report(staged)
    // 75 twenty-token docs + 25 one-token docs
    assert(m("tok")("rows") == 100L)
    assert(m("tok")("tokens") == 75L * 20 + 25L)
  }

  test("dropReport orders stages and charges drops to the right stage") {
    val out = Funnel.stage(
      Funnel.stage(
        Funnel.stage(docs, "ingest").filter(col("doc_id") % 2 === 0),
        "even")
        .filter(col("doc_id") > 60), "late")
    out.collect()
    val r = Funnel.dropReport(out, Seq("ingest", "even", "late"))
    assert(r == Seq(
      ("ingest", 100L, 0L),
      ("even", 50L, 50L),
      ("late", 20L, 30L)))
  }
}
