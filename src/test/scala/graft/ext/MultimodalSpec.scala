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

  test("extractFeatures passes string/UUID-style doc ids through " +
      "(id column is not pinned to Long)") {
    val sdocs = (1 to 10)
      .map(i => (s"doc-$i-uuid", s"document body $i payload"))
      .toDF("doc_id", "text")
    val media = Multimodal.packAsMedia(sdocs)
    val a = Multimodal.extractFeatures(media, batchSize = 3)
    assert(a.schema("doc_id").dataType.simpleString == "string")
    val b = Multimodal.extractFeaturesColumnar(media)
    assert(a.as[(String, Double, Double, Double, Double)].collect().toSet ==
      b.as[(String, Double, Double, Double, Double)].collect().toSet)
  }

  test("sampleFrames: k fixed-size frames at deterministic offsets") {
    val media = Multimodal.packAsMedia(docs)
    val r = Multimodal.sampleFrames(media, k = 4, frameBytes = 8)
    assert(r.schema("frames").dataType.simpleString ==
      "array<struct<frame_idx:int,offset:bigint,bytes:binary>>")
    import org.apache.spark.sql.Row
    val frames = r.filter(col("doc_id") === 1)
      .select("frames").head().getAs[scala.collection.Seq[Row]](0)
    assert(frames.size == 4)
    assert(frames.map(_.getAs[Int]("frame_idx")) == Seq(0, 1, 2, 3))
    val offs = frames.map(_.getAs[Long]("offset"))
    assert(offs == offs.sorted && offs.distinct.size == 4)
    assert(frames.forall(_.getAs[Array[Byte]]("bytes").length <= 8))
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, k = 4, frameBytes = 8)
      .filter(col("doc_id") === 1).select("frames").head()
      .getAs[scala.collection.Seq[Row]](0).map(_.getAs[Long]("offset"))
    assert(again == offs)
  }

  test("stubFeatures is deterministic and bounded") {
    val f1 = Multimodal.stubFeatures("abc".getBytes("UTF-8"))
    val f2 = Multimodal.stubFeatures("abc".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v >= 0.0 && v <= 1.0))
  }
}
