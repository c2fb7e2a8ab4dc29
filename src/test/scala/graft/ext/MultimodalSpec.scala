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

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("parseHeader reads real PNG / GIF / WAV layouts") {
    // PNG 640x480, color type 6 (RGBA -> 4 channels)
    val png = hexBytes("89504E470D0A1A0A 0000000D 49484452" +
      " 00000280 000001E0 08 06 00 00 00 00000000")
    assert(Multimodal.parseHeader(png) ==
      Multimodal.MediaHeader("png", 640L, 480L, 4L))
    // GIF89a 320x200 (little-endian dims)
    val gif = hexBytes("474946383961 4001 C800 F7 00 00")
    assert(Multimodal.parseHeader(gif) ==
      Multimodal.MediaHeader("gif", 320L, 200L, 3L))
    // RIFF-WAVE, 2 channels, 44100 Hz (LE at offsets 22 / 24)
    val wav = hexBytes("52494646 24000000 57415645 666D7420 10000000" +
      " 0100 0200 44AC0000 10B10200 0400 1000")
    assert(Multimodal.parseHeader(wav) ==
      Multimodal.MediaHeader("wav", 44100L, 0L, 2L))
  }

  test("parseHeader walks JPEG markers past APP segments to SOF; " +
      "malformed and truncated payloads degrade to null, never throw") {
    // FFD8, APP0 (JFIF, 16 bytes), then SOF0: 8bit, h=0x0100, w=0x0180, 3ch
    val jpg = hexBytes("FFD8" +
      " FFE0 0010 4A46494600 0101 00 0048 0048 00 00" +
      " FFC0 0011 08 0100 0180 03 011100 021101 031101")
    assert(Multimodal.parseHeader(jpg) ==
      Multimodal.MediaHeader("jpeg", 384L, 256L, 3L))
    // JPEG magic but no SOF before the bytes run out
    assert(Multimodal.parseHeader(hexBytes("FFD8 FFE0 0004 0000"))
      == Multimodal.MediaHeader("jpeg", -1L, -1L, -1L))
    // fill bytes (any number of 0xFF) may pad a marker; TEM (0x01) is
    // bare - both are standards-valid and must not derail the walk
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FF FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", 384L, 256L, 3L))
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FF01 FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", 384L, 256L, 3L))
    // unknown magic and truncated PNG signature
    assert(Multimodal.parseHeader(hexBytes("0011223344")).format == null)
    assert(Multimodal.parseHeader(hexBytes("89504E47")).format == null)
    assert(Multimodal.parseHeader(Array.emptyByteArray).format == null)
  }

  test("decodeHeaders surfaces parsed dims per row with NULLs for " +
      "unparseable payloads") {
    import org.apache.spark.sql.functions.{concat, lit, unhex, lpad, hex, when}
    val w = col("doc_id") * 10 + 1
    val png = concat(unhex(lit("89504E470D0A1A0A0000000D")),
      lit("IHDR").cast("binary"),
      unhex(lpad(hex(w), 8, "0")), unhex(lit("00000040")),
      unhex(lit("080200000000000000")))
    val media = docs.select(col("doc_id"),
      when(col("doc_id") === 2, unhex(lit("DEADBEEF")))
        .when(col("doc_id") === 3, lit(null).cast("binary")) // NULL payload
        .otherwise(png).as("media"))
    val r = Multimodal.decodeHeaders(media)
      .as[(Long, Option[String], Option[Long], Option[Long], Option[Long])]
      .collect().map(t => t._1 -> t).toMap
    r.foreach { case (id, (_, fmt, wd, ht, ch)) =>
      if (id == 2 || id == 3) assert(fmt.isEmpty && wd.isEmpty,
        s"id=$id must degrade to a NULL row, not a task kill")
      else {
        assert(fmt.contains("png") && wd.contains(id * 10 + 1))
        assert(ht.contains(64L) && ch.contains(3L)) // color type 2 = RGB
      }
    }
  }
}
