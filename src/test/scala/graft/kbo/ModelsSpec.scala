package graft.kbo

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Typed models must track the declared catalog StructTypes: a drifted
  * case class would silently reorder/retype columns at the Dataset
  * boundary. (Encoders mark primitives non-nullable; compare on
  * name+type.) */
class ModelsSpec extends SparkSpec {

  private def shapes(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  test("encoder schemas match the catalog StructTypes") {
    assert(shapes(Encoders.product[Models.GameRecord].schema) ==
      shapes(Schemas.gameRecords))
    assert(shapes(Encoders.product[Models.ParkFactor].schema) ==
      shapes(Schemas.parkFactor))
    assert(shapes(Encoders.product[Models.HitterGame].schema) ==
      shapes(Schemas.hitterGames))
    assert(shapes(Encoders.product[Models.HitterMetrics].schema) ==
      shapes(Schemas.hitterMetrics))
    assert(shapes(Encoders.product[Models.PitcherMetrics].schema) ==
      shapes(Schemas.pitcherMetrics))
    assert(shapes(Encoders.product[Models.TodayLineup].schema) ==
      shapes(Schemas.todayLineup))
  }

  test("typed document/embedding loaders round-trip the fixtures") {
    import spark.implicits._
    val docs = Models.documents(spark, "/root/testdata/sf0.001")
    assert(docs.filter(_.n_chars > 0).count() == docs.count())
    val embs = Models.embeddings(spark, "/root/testdata/sf0.001")
    assert(embs.head().embedding.length == 64)
    val games = Models.gameRecords _ // loader compiles against schema
    assert(games != null)
  }
}
