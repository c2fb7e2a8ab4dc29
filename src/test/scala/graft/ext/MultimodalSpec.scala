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

  test("parseHeader: EOI terminates the JPEG walk; corrupt length " +
      "fields stop deterministically instead of skipping by garbage") {
    // EOI (FFD9) before any SOF: must end the walk with the no-SOF
    // flag, not read a phantom length from the trailing bytes (here the
    // trailer LOOKS like a huge length that would skip past a real SOF)
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FFD9 FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", -1L, -1L, -1L))
    // a segment whose declared length is < 2 (cannot include itself) is
    // structurally corrupt: terminate, don't loop or jump pseudo-randomly
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FFE0 0001 FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", -1L, -1L, -1L))
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FFE0 0000 FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", -1L, -1L, -1L))
    // a valid walk with a zero-padded APPn still reaches the SOF
    assert(Multimodal.parseHeader(
      hexBytes("FFD8 FFE0 0002 FFC0 0011 08 0100 0180 03"))
      == Multimodal.MediaHeader("jpeg", 384L, 256L, 3L))
  }

  /** Encode a BufferedImage to bytes with the JRE's own codec. */
  private def imageBytes(fmt: String,
                         pixels: Seq[Seq[Int]]): Array[Byte] = {
    val h = pixels.size
    val w = pixels.head.size
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def lum(rgb: Int): Double =
    (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
      0.114 * (rgb & 0xff)) / 255.0

  test("extractPixelFeatures decodes real PNG/GIF pixels to known " +
      "luma stats; fakes and NULLs degrade to flagged fallback rows") {
    val pngPx = Seq(Seq(0xffffff, 0x000000), Seq(0xff0000, 0x00ff00))
    // b/w only (GIF palette keeps them exact) and 8x8 (the JRE GIF
    // writer drops the final row of very small 2x2/4x4 images — an
    // empirically-pinned codec quirk; at 8x8 the round-trip is exact):
    // rows 0-1 black, rows 2-7 white -> mean luma 6/8
    val gifPx = Seq.tabulate(8, 8)((y, _) =>
      if (y < 2) 0x000000 else 0xffffff).map(_.toSeq)
    val rows = Seq(
      (1L, imageBytes("png", pngPx)),
      (2L, imageBytes("gif", gifPx)),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("doc_id", "media")
    val r = Multimodal.extractPixelFeatures(media, batchSize = 2, bins = 8)
      .as[(Long, Boolean, Option[Double], Option[Seq[Double]])]
      .collect().map(t => t._1 -> t).toMap
    // PNG: white/black/red/green — mean and 8-bin histogram, exact math
    val (_, dec1, ml1, h1) = r(1L)
    val exp1 = pngPx.flatten.map(lum)
    assert(dec1)
    assert(math.abs(ml1.get - exp1.sum / 4) < 1e-12)
    val expHist = Array.fill(8)(0.0)
    exp1.foreach(l => expHist(math.min(7, (l * 8).toInt)) += 0.25)
    h1.get.zip(expHist).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12) }
    // GIF: 16 black + 48 white pixels
    val (_, dec2, ml2, h2) = r(2L)
    assert(dec2)
    assert(math.abs(ml2.get - 0.75) < 1e-12)
    assert(math.abs(h2.get(0) - 0.25) < 1e-12 &&
      math.abs(h2.get(7) - 0.75) < 1e-12)
    // and the canonical minimal 1x1 white GIF decodes through the
    // operator too (a hand-crafted byte fixture, not our own writer)
    val gif1 = hexBytes("474946383961 0100 0100 80 00 00 ffffff 000000" +
      " 2c 00000000 0100 0100 00 02 02 44 01 00 3b")
    val one = Multimodal.extractPixelFeatures(
        Seq((9L, gif1)).toDF("doc_id", "media"), bins = 8)
      .as[(Long, Boolean, Option[Double], Option[Seq[Double]])].head()
    assert(one._2 && math.abs(one._3.get - lum(0xffffff)) < 1e-12)
    // fake bytes: flagged, deterministic stub fallback, no histogram
    val (_, dec3, ml3, h3) = r(3L)
    assert(!dec3 && h3.isEmpty)
    assert(ml3.contains(
      Multimodal.stubFeatures("not an image at all".getBytes("UTF-8"))(0)))
    // NULL payload: flagged with NULL stats
    val (_, dec4, ml4, h4) = r(4L)
    assert(!dec4 && ml4.isEmpty && h4.isEmpty)
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

  test("dHash image dedup: REAL PNG decode -> pooled luma grid -> " +
      "near-dup pair found, distinct images and junk stay apart") {
    // 33x18 horizontal gradient, a one-pixel perturbation of it, the
    // reversed gradient, and an undecodable payload
    val (w, h) = (33, 18)
    def px(f: (Int, Int) => Int): Seq[Seq[Int]] =
      Seq.tabulate(h, w)((y, x) => f(x, y)).map(_.toSeq)
    def grey(v: Int) = (v << 16) | (v << 8) | v
    val imgA = px((x, _) => grey(x * 255 / (w - 1)))
    val imgB = px((x, y) => grey(
      if (x == 0 && y == 0) math.min(x * 255 / (w - 1) + 8, 255)
      else x * 255 / (w - 1)))
    val imgC = px((x, _) => grey(255 - x * 255 / (w - 1)))
    val media = Seq(
      (1L, imageBytes("png", imgA)),
      (2L, imageBytes("png", imgB)),
      (3L, imageBytes("png", imgC)),
      (4L, "junk bytes, not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val grids = Multimodal.extractLumaGrid(media, batchSize = 2)
      .as[(Long, Boolean, Option[Seq[Double]])].collect()
      .map(t => t._1 -> t).toMap
    // real decodes carry a full 6x11 grid; junk is flagged with NULL
    (1L to 3L).foreach { id =>
      assert(grids(id)._2 && grids(id)._3.get.size == 66, s"id=$id")
    }
    assert(!grids(4L)._2 && grids(4L)._3.isEmpty)
    // monotone gradient -> every horizontal comparison fires: the
    // decoded grid's dHash is all-60-bits-set; the reverse is zero
    val gdf = Multimodal.extractLumaGrid(media, batchSize = 2)
      .filter(org.apache.spark.sql.functions.col("decoded"))
    val dh = gdf.select(org.apache.spark.sql.functions.col("doc_id"),
        Multimodal.dhash60(org.apache.spark.sql.functions.col("grid"))
          .as("dh"))
      .as[(Long, Long)].collect().toMap
    assert(dh(1L) == (1L << 60) - 1 && dh(3L) == 0L)
    // the perturbed copy pools to (near-)identical gradients: paired;
    // the reversed image pairs with nothing
    val pairs = Multimodal.imageNearDups(gdf, "doc_id", "grid")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  /** Hand-built 16-bit mono PCM RIFF-WAV (the byte layout decodeHeaders
    * and extractAudioEnvelope both parse). */
  private def wavBytes(samples: Seq[Double], rate: Int = 8000): Array[Byte] = {
    val n = samples.size
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      buf.putShort(math.max(-32768, math.min(32767,
        math.round(s * 32767).toInt)).toShort)
    }
    buf.array()
  }

  test("audio envelope dedup: REAL WAV PCM parse -> RMS grid -> the " +
      "same dHash banding pairs a re-coded copy, not a different clip") {
    val n = 66 * 40 // 40 samples per pooled window
    def clip(ramp: Double => Double, f: Double): Seq[Double] =
      (0 until n).map { i =>
        val t = i.toDouble / n
        ramp(t) * math.sin(2 * math.Pi * f * i / 8000.0)
      }
    // 400 Hz at 8 kHz = 20-sample period: each 40-sample pooled window
    // holds exactly two cycles, so window RMS tracks the amplitude ramp
    // monotonically (a non-integer cycle count would add phase jitter
    // comparable to the per-window ramp step)
    val up = clip(t => 0.05 + 0.9 * t, 400.0)        // rising envelope
    val upCopy = clip(t => (0.05 + 0.9 * t) * 0.8, 400.0) // re-leveled
    // copy: uniform gain change scales every window RMS equally, so all
    // gradient SIGNS survive — dHash is gain-invariant by construction
    val down = clip(t => 0.95 - 0.9 * t, 400.0)      // falling envelope
    val media = Seq(
      (1L, wavBytes(up)), (2L, wavBytes(upCopy)), (3L, wavBytes(down)),
      (4L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val env = Multimodal.extractAudioEnvelope(media, batchSize = 2)
    val rows = env.as[(Long, Boolean, Option[Seq[Double]])].collect()
      .map(t => t._1 -> t).toMap
    (1L to 3L).foreach { id =>
      assert(rows(id)._2 && rows(id)._3.get.size == 66, s"id=$id")
    }
    assert(!rows(4L)._2 && rows(4L)._3.isEmpty)
    // rising envelope -> every within-row gradient comparison fires
    val dh = env.filter(org.apache.spark.sql.functions.col("decoded"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Multimodal.dhash60(org.apache.spark.sql.functions.col("grid"))
          .as("dh"))
      .as[(Long, Long)].collect().toMap
    assert(dh(1L) == (1L << 60) - 1 && dh(3L) == 0L)
    // the image near-dup machinery applies to audio unchanged
    val pairs = Multimodal.imageNearDups(
        env.filter(org.apache.spark.sql.functions.col("decoded")),
        "doc_id", "grid")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
