package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with a typed
  * metadata struct, plus a batch feature-extraction operator.
  *
  * The decode step is a clearly-marked deterministic STUB (`stubFeatures`)
  * — image/audio codecs are not in this container — but the Spark-side
  * plumbing is real and is what matters at 100 TB: binary payloads stay
  * columnar in parquet, metadata travels in a typed struct so planners can
  * prune/filter on it without touching bytes, and extraction runs as a
  * batched mapPartitions (the JVM shape of a mapInPandas/Arrow-batch UDF:
  * per-partition iterator, amortized per-batch setup, bounded memory).
  */
object Multimodal {

  /** Wrap a text corpus as fake media rows: (doc_id, media BINARY,
    * meta STRUCT<mime, n_bytes>) — the schema/partitioning shape of a real
    * image/audio table. */
  def packAsMedia(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    docs.select(col(idCol),
      bytes.as("media"),
      struct(lit("application/x-fake").as("mime"),
        length(bytes).cast("long").as("n_bytes")).as("meta"))
  }

  /** Deterministic fake "decode": 4 features derived from the payload's
    * md5 — stands in for a real image/audio feature extractor. */
  def stubFeatures(bytes: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    (0 until 4).toArray.map { j =>
      java.lang.Long.parseLong(hex.substring(j * 4, j * 4 + 4), 16) / 65535.0
    }
  }

  /** Batched per-partition feature extraction over (id, media) — the
    * mapInPandas-shaped operator: partitions stream in fixed-size batches
    * through the (stubbed) codec. Output: (idCol, feat0..feat3).
    * The id column passes through untyped (Row encoder over the input's
    * own id field), so long, string/UUID or any other id scheme works. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val in = media.select(col(idCol), col("media"))
    val outSchema = StructType(in.schema.head +:
      (0 until 4).map(j => StructField(s"feat$j", DoubleType, false)))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec once here
        batch.iterator.map { r =>
          val f = stubFeatures(r.getAs[Array[Byte]](1))
          org.apache.spark.sql.Row(r.get(0), f(0), f(1), f(2), f(3))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame sampling: k evenly-spaced fixed-size byte windows from each
    * payload (the video-frame-sample shape: deterministic offsets, typed
    * per-frame metadata, still one row per media item with a nested
    * frames column — explode() downstream for per-frame work). Pure
    * column ops: substring on BINARY is zero-copy into the payload. */
  def sampleFrames(media: DataFrame, k: Int = 4, frameBytes: Int = 16,
                   idCol: String = "doc_id"): DataFrame = {
    val n = col("meta.n_bytes")
    val frames = transform(sequence(lit(0), lit(k - 1)), i => {
      val offset = (i * greatest(n - frameBytes, lit(1L)) /
        lit(math.max(k - 1, 1))).cast("long")
      struct(i.cast("int").as("frame_idx"), offset.as("offset"),
        col("media").substr(offset + 1, lit(frameBytes)).as("bytes"))
    })
    media.select(col(idCol), col("meta"), frames.as("frames"))
  }

  /** The same features as a pure column projection (codegen'd, no
    * mapPartitions) — the oracle-checkable twin of extractFeatures; a
    * ScalaTest asserts both paths agree. */
  def extractFeaturesColumnar(media: DataFrame,
                              idCol: String = "doc_id"): DataFrame = {
    val hex = md5(col("media"))
    val feats = (0 until 4).map(j =>
      (conv(substring(hex, j * 4 + 1, 4), 16, 10).cast("long") / lit(65535.0))
        .as(s"feat$j"))
    media.select(col(idCol) +: feats: _*)
  }
}
