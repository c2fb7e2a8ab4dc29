package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Golden end-to-end: the full daily chain over hand-built KBO-shaped
  * fixtures, with park factor / wOBA / FIP checked against hand-computed
  * values (same double-arithmetic order as the plan, so equality is
  * exact). Formulas: dags/001_park_factor_calculation.py:72,
  * dags/011_calculate_hitter_wOBA.py:41-42,
  * dags/021_calculate_pitcher_metrics.py:66,83. */
class DailyChainSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  // stadium A: 2 games (home 5+3, away 2+4); stadium B: 1 game (1 / 0)
  private lazy val games = Seq(
    (1L, "A", 5L, 2L), (2L, "A", 3L, 4L), (3L, "B", 1L, 0L))
    .toDF("id", "stadium", "home_score", "away_score")

  // columns Metrics needs; h2 has pa-ibb-sac = 0 (wOBA guard drops it)
  private lazy val hitters = Seq(
    (10L, "Kim", "T1", 40L, 4L, 1L, 1L, 10L, 2L, 1L, 3L, 2L, 1L, 2L, 5L, 1L, 30L, 0.35, 0.5),
    (11L, "Lee", "T1", 4L, 0L, 2L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 2L, 1L, 0L, 2L, 0.30, 0.4),
    (12L, "Park", "T2", 20L, 2L, 0L, 1L, 6L, 1L, 0L, 1L, 1L, 0L, 1L, 3L, 1L, 16L, 0.32, 0.45))
    .toDF("hitter_id", "player_name", "team_name", "pa", "bb", "ibb",
      "hbp", "hits", "doubles", "triples", "hr", "sb", "cs", "sac", "so",
      "sf", "ab", "obp", "slg")

  private lazy val pitchers = Seq(
    (20L, "Ryu", "T1", "10", 1L, 2L, 8L, 3.0),
    (21L, "Ahn", "T2", "5", 0L, 1L, 4L, 4.0))
    .toDF("pitcher_id", "player_name", "team_name", "ip", "hr", "bb",
      "so", "era")

  private lazy val lineup = Seq(
    ("Kim", "T1", "T2", "A", 3, ts("2024-03-01")),
    ("Park", "T2", "T1", "B", 5, ts("2024-03-01")),
    ("Ryu", "T1", "T2", "A", 0, ts("2024-03-01")))
    .toDF("player", "team", "opponent", "stadium", "position", "game_date")

  private lazy val hOpp = Seq((10L, "T2", 0.31), (12L, "T1", 0.28))
    .toDF("hitter_id", "opponent_team", "avg")
  private lazy val hStd = Seq((10L, "A", 0.33))
    .toDF("hitter_id", "stadium", "avg")
  private lazy val hGames = (1 to 8).map(i =>
    (10L, ts(s"2024-02-0$i"), "T2", i.toLong))
    .toDF("hitter_id", "game_date", "opponent_team", "hits")
  private lazy val pOpp = Seq((20L, "T2", 2.5))
    .toDF("pitcher_id", "opponent_team", "era")
  private lazy val pStd = Seq((20L, "A", 2.8))
    .toDF("pitcher_id", "stadium", "era")
  private lazy val pGames = (1 to 3).map(i =>
    (20L, ts(s"2024-02-0$i"), "T2", i.toLong))
    .toDF("pitcher_id", "game_date", "opponent_team", "so")

  private lazy val out = DailyChain.run(games, hitters, pitchers, lineup,
    hOpp, hStd, hGames, pOpp, pStd, pGames)

  test("park factor matches hand computation") {
    val pf = out("park_factor").as[(String, Double)].collect().toMap
    // A: (8+6)/2 per game vs B's (1+0)/1 => 7.0; B: 1 / 7 => 1/7
    assert(pf("A") == ((8.0 + 6.0) / 2) / ((1.0 + 0.0) / 1))
    assert(pf("B") == ((1.0 + 0.0) / 1) / ((8.0 + 6.0) / 2))
  }

  test("hitter_metrics output carries the reference metric column set") {
    val cols = out("hitter_metrics").columns.toSet
    assert(cols == graft.kbo.Schemas.hitterMetrics.fieldNames.toSet,
      s"got $cols")
  }

  test("wOBA: guard drops pa-ibb-sac == 0; value matches formula") {
    val m = out("hitter_metrics")
    val rows = m.select("hitter_id", "wOBA")
      .as[(Long, Double)].collect().toMap
    assert(!rows.contains(11L)) // denominator 4-2-2 == 0 => dropped
    val expected =
      (0.7 * (4 - 1 + 1) + 0.9 * 10 + 1.25 * 2 + 1.6 * 1 + 2.0 * 3 +
        0.25 * 2 - 0.5 * 1) / (40 - 1 - 2)
    assert(rows(10L) == expected)
  }

  test("FIP matches hand computation incl. league constant") {
    val m = out("pitcher_metrics").select("pitcher_id", "fip")
      .as[(Long, Double)].collect().toMap
    val fipConst = 3.5 - (13.0 * 1 + 3.0 * 3 - 2.0 * 12) / 15.0
    assert(m(20L) == (13.0 * 1 + 3.0 * 2 - 2.0 * 8) / 10.0 + fipConst)
    assert(m(21L) == (13.0 * 0 + 3.0 * 1 - 2.0 * 4) / 5.0 + fipConst)
  }

  test("wide records resolve lineup rows and nest recent games") {
    val hr = out("hitter_records")
    val rows = hr.collect()
    assert(rows.length == 2) // Kim + Park (Ryu is position 0)
    val kim = hr.filter(col("hitter_id") === 10L).head()
    assert(kim.getAs[String]("player_name") == "Kim")
    assert(kim.getAs[String]("opponent_team") == "T2")
    assert(kim.getAs[Double]("opponent_avg") == 0.31)
    assert(kim.getAs[Double]("stadium_avg") == 0.33)
    // top-5 of 8 recent games, newest first
    val recent = kim.getAs[scala.collection.Seq[Row]]("recent_games")
    assert(recent.size == 5)
    assert(recent.head.getAs[Long]("hits") == 8L)

    val pr = out("pitcher_records")
    assert(pr.count() == 1) // Ryu
    val ryu = pr.head()
    assert(ryu.getAs[Long]("pitcher_id") == 20L)
    assert(!pr.columns.contains("position"))
    assert(ryu.getAs[scala.collection.Seq[Row]]("recent_games").size == 3)
  }
}
