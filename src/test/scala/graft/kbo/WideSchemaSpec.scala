package graft.kbo

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import java.util.Collections

/** Asserts Records.wideRecord over reference-shaped inputs produces
  * EXACTLY the hitter_records / pitcher_records layout (engine-native
  * variant: nested recent_games in place of the CSV sidecar path).
  * Ref DDL: dags/0_init_baseball_table.py:303-478. */
class WideSchemaSpec extends SparkSpec {

  private def empty(schema: StructType): DataFrame =
    spark.createDataFrame(Collections.emptyList[org.apache.spark.sql.Row](),
      schema)

  private def shapes(df: DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  test("wideRecord(hitter) == hitter_records engine layout") {
    val lineup = empty(Schemas.todayLineup).drop("id")
    val out = Records.wideRecord(
      lineup, empty(Schemas.hitters), empty(Schemas.hitterMetrics),
      empty(Schemas.hitterOpponents), empty(Schemas.hitterStadiums),
      empty(Schemas.hitterGames), "hitter_id", isPitcher = false)
    val expected = shapes(empty(Schemas.hitterRecordsEngine))
    assert(shapes(out) == expected,
      s"missing=${expected.keySet -- shapes(out).keySet} " +
        s"extra=${shapes(out).keySet -- expected.keySet}")
  }

  test("wideRecord(pitcher) == pitcher_records engine layout") {
    val lineup = empty(Schemas.todayLineup).drop("id")
    val out = Records.wideRecord(
      lineup, empty(Schemas.pitchers), empty(Schemas.pitcherMetrics),
      empty(Schemas.pitcherOpponents), empty(Schemas.pitcherStadiums),
      empty(Schemas.pitcherGames), "pitcher_id", isPitcher = true)
    val expected = shapes(empty(Schemas.pitcherRecordsEngine))
    assert(shapes(out) == expected,
      s"missing=${expected.keySet -- shapes(out).keySet} " +
        s"extra=${shapes(out).keySet -- expected.keySet}")
  }

  test("catalog registers all 16 reference tables") {
    Schemas.createAll(spark)
    Schemas.all.foreach { case (name, schema) =>
      assert(spark.table(name).schema == schema, name)
    }
    // 16 init-DDL tables + today_lineup (created by DAG 040, ref
    // dags/040_baseball_lineup_scraper.py:47-56)
    assert(Schemas.all.size == 17)
  }
}
