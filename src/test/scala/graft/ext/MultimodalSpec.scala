package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 10L).map(i => (i, s"document body $i payload"))
    .toDF("doc_id", "text")

  test("packAsMedia: binary payload + typed metadata struct") {
    val m = Multimodal.packAsMedia(docs)
    assert(m.schema("media").dataType.simpleString == "binary")
    assert(m.schema("meta").dataType.simpleString ==
      "struct<mime:string,n_bytes:bigint>")
    val r = m.filter(col("doc_id") === 1)
      .select(col("meta.n_bytes")).as[Long].head()
    assert(r == "document body 1 payload".getBytes("UTF-8").length)
  }

  test("batched mapPartitions extractor equals the columnar twin") {
    val media = Multimodal.packAsMedia(docs)
    val a = Multimodal.extractFeatures(media, batchSize = 3)
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    val b = Multimodal.extractFeaturesColumnar(media)
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    assert(a == b)
    assert(a.size == 10)
  }

  test("stubFeatures is deterministic and bounded") {
    val f1 = Multimodal.stubFeatures("abc".getBytes("UTF-8"))
    val f2 = Multimodal.stubFeatures("abc".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v >= 0.0 && v <= 1.0))
  }
}
