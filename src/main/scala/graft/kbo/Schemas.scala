package graft.kbo

import org.apache.spark.sql.types._

/** The reference's 16-table relational data model as Spark StructTypes.
  * Ref: dags/0_init_baseball_table.py:19-479 (MySQL DDL); type mapping per
  * SURVEY.md §1.2 (DECIMAL -> DoubleType, matching the reference's own
  * float conversion on read; ip stays a STRING fraction like "5 2/3").
  */
object Schemas {

  private def s(name: String)               = StructField(name, StringType)
  private def i(name: String)               = StructField(name, IntegerType)
  private def d(name: String)               = StructField(name, DoubleType)
  private def dt(name: String)              = StructField(name, DateType)
  private def ts(name: String)              = StructField(name, TimestampType)
  private def l(name: String)               = StructField(name, LongType)

  /** Ref: :258-266 */
  val gameRecords: StructType = StructType(Seq(
    l("id"), ts("game_date"), s("away_team"), i("away_score"),
    s("home_team"), i("home_score"), s("stadium")))

  /** Ref: :39-43 */
  val parkFactor: StructType = StructType(Seq(
    s("stadium"), d("park_factor")))

  private val hitterCounting = Seq(
    i("games"), i("pa"), i("ab"), i("runs"), i("hits"), i("doubles"),
    i("triples"), i("hr"), i("rbi"), i("sb"), i("cs"), i("sac"), i("sf"),
    i("bb"), i("ibb"), i("hbp"), i("so"), i("gdp"), i("errors"), i("mh"))

  /** Ref: :45-77 */
  val hitters: StructType = StructType(
    Seq(i("hitter_id"), s("player_name"), s("team_name"), d("avg")) ++
    hitterCounting ++
    Seq(d("slg"), d("obp"), d("ops"), d("risp"), d("ph_ba"),
        d("sb_percentage"), ts("updated_at")))

  /** Ref: :127-149 — per-game hitter rows keyed (hitter_id, game_date). */
  val hitterGames: StructType = StructType(Seq(
    i("hitter_id"), dt("game_date"), s("opponent_team"), d("avg"), i("pa"),
    i("ab"), i("runs"), i("hits"), i("doubles"), i("triples"), i("hr"),
    i("rbi"), i("sb"), i("cs"), i("bb"), i("hbp"), i("so"), i("gdp"),
    ts("updated_at")))

  /** Ref: :79-101 — keyed (hitter_id, opponent_team). */
  val hitterOpponents: StructType = StructType(Seq(
    i("hitter_id"), s("opponent_team"), i("games"), d("avg"), i("pa"),
    i("ab"), i("runs"), i("hits"), i("doubles"), i("triples"), i("hr"),
    i("rbi"), i("sb"), i("cs"), i("bb"), i("hbp"), i("so"), i("gdp"),
    ts("updated_at")))

  /** Ref: :103-125 — keyed (hitter_id, stadium). */
  val hitterStadiums: StructType = StructType(Seq(
    i("hitter_id"), s("stadium"), i("games"), d("avg"), i("pa"),
    i("ab"), i("runs"), i("hits"), i("doubles"), i("triples"), i("hr"),
    i("rbi"), i("sb"), i("cs"), i("bb"), i("hbp"), i("so"), i("gdp"),
    ts("updated_at")))

  /** Ref: :151-185 — ip is the "5 2/3" fraction STRING (SURVEY §1.2). */
  val pitchers: StructType = StructType(Seq(
    i("pitcher_id"), s("player_name"), s("team_name"), d("era"),
    i("games"), i("cg"), i("sho"), i("wins"), i("losses"), i("sv"),
    i("hld"), d("wpct"), i("tbf"), i("np"), s("ip"), i("hits"),
    i("doubles"), i("triples"), i("hr"), i("sac"), i("sf"), i("bb"),
    i("ibb"), i("so"), i("wp"), i("bk"), i("runs"), i("er"), i("bsv"),
    d("whip"), d("avg"), i("qs"), ts("updated_at")))

  /** Ref: :187-206 */
  val pitcherGames: StructType = StructType(Seq(
    i("pitcher_id"), dt("game_date"), s("opponent_team"), s("result"),
    d("era"), i("tbf"), s("ip"), i("hits"), i("hr"), i("bb"), i("hbp"),
    i("so"), i("runs"), i("er"), d("avg"), ts("updated_at")))

  /** Ref: :208-231 */
  val pitcherOpponents: StructType = StructType(Seq(
    i("pitcher_id"), s("opponent_team"), i("games"), i("wins"),
    i("losses"), i("sv"), i("hld"), d("wpct"), s("ip"), i("hits"),
    i("hr"), i("bb"), i("hbp"), i("so"), i("runs"), i("er"), d("avg"),
    ts("updated_at")))

  /** Ref: :233-256 */
  val pitcherStadiums: StructType = StructType(Seq(
    i("pitcher_id"), s("stadium"), i("games"), i("wins"),
    i("losses"), i("sv"), i("hld"), d("wpct"), s("ip"), i("hits"),
    i("hr"), i("bb"), i("hbp"), i("so"), i("runs"), i("er"), d("avg"),
    ts("updated_at")))

  /** Ref: :284-293 */
  val hitterMetrics: StructType = StructType(Seq(
    i("hitter_id"), d("wOBA"), d("wRC"), d("wRC_plus"), d("OPS_plus"),
    d("k_rate"), d("bb_rate"), d("babip")))

  /** Ref: :295-301 */
  val pitcherMetrics: StructType = StructType(Seq(
    i("pitcher_id"), d("fip"), d("k_rate"), d("bb_rate"), d("hr_rate")))

  /** Ref: :276-282 */
  val todayGames: StructType = StructType(Seq(
    ts("game_date"), s("away_team"), s("home_team"), s("stadium")))

  /** Ref: dags/040_baseball_lineup_scraper.py:47-56.
    * position = 0 encodes the starting pitcher; 1-9 = batting order. */
  val todayLineup: StructType = StructType(Seq(
    l("id"), ts("game_date"), s("player"), s("team"), s("opponent"),
    s("stadium"), i("position")))

  /** Ref: :268-274 */
  val gameRecordsUntil5Innings: StructType = StructType(Seq(
    ts("game_date"), s("away_team"), s("home_team"), i("result")))
}
