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
    i("pitcher_id"), s("opponent_team"), i("games"), d("era"), i("wins"),
    i("losses"), i("sv"), i("hld"), d("wpct"), i("tbf"), s("ip"),
    i("hits"), i("hr"), i("bb"), i("hbp"), i("so"), i("runs"), i("er"),
    d("avg"), ts("updated_at")))

  /** Ref: :233-256 */
  val pitcherStadiums: StructType = StructType(Seq(
    i("pitcher_id"), s("stadium"), i("games"), d("era"), i("wins"),
    i("losses"), i("sv"), i("hld"), d("wpct"), i("tbf"), s("ip"),
    i("hits"), i("hr"), i("bb"), i("hbp"), i("so"), i("runs"), i("er"),
    d("avg"), ts("updated_at")))

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

  // ===== wide integration records (ref: :303-390 hitter, :392-478
  // pitcher). Column names follow the DDL except case-normalized metric
  // names (MySQL identifiers are case-insensitive; the DDL writes BABIP /
  // FIP, the source metric tables babip / fip). The reference stores the
  // 5 recent games as a CSV file path (recent_games_file_path TEXT,
  // :388,:476); the engine-native shape replaces it with a nested
  // array<struct> column `recent_games` (see Records.wideRecord) — same
  // information, no filesystem side channel.

  private val hitterOppSplit = Seq(
    i("opponent_games"), d("opponent_avg"), i("opponent_pa"),
    i("opponent_ab"), i("opponent_runs"), i("opponent_hits"),
    i("opponent_doubles"), i("opponent_triples"), i("opponent_hr"),
    i("opponent_rbi"), i("opponent_sb"), i("opponent_cs"),
    i("opponent_bb"), i("opponent_hbp"), i("opponent_so"),
    i("opponent_gdp"))

  private val hitterStdSplit = Seq(
    i("stadium_games"), d("stadium_avg"), i("stadium_pa"),
    i("stadium_ab"), i("stadium_runs"), i("stadium_hits"),
    i("stadium_doubles"), i("stadium_triples"), i("stadium_hr"),
    i("stadium_rbi"), i("stadium_sb"), i("stadium_cs"),
    i("stadium_bb"), i("stadium_hbp"), i("stadium_so"), i("stadium_gdp"))

  /** hitter_records without the recent-games column (ref :303-387). */
  private val hitterRecordsBase: Seq[StructField] =
    Seq(i("hitter_id"), s("player_name"), s("team_name"), ts("game_date"),
      i("position"), d("avg")) ++
    Seq(i("games"), i("pa"), i("ab"), i("runs"), i("hits"), i("doubles"),
      i("triples"), i("hr"), i("rbi"), i("sb"), i("cs"), i("sac"), i("sf"),
      i("bb"), i("ibb"), i("hbp"), i("so"), i("gdp")) ++
    Seq(d("slg"), d("obp"), i("errors"), d("sb_percentage"), i("mh"),
      d("ops"), d("risp"), d("ph_ba")) ++
    Seq(d("wOBA"), d("wRC"), d("wRC_plus"), d("OPS_plus"), d("k_rate"),
      d("bb_rate"), d("babip")) ++
    (s("opponent_team") +: hitterOppSplit) ++
    (s("stadium") +: hitterStdSplit)

  /** Reference-layout hitter_records (74 cols, CSV sidecar path). */
  val hitterRecords: StructType =
    StructType(hitterRecordsBase :+ s("recent_games_file_path"))

  /** Engine-native hitter_records: nested recent_games instead of the
    * file path; element = hitter_games row minus (hitter_id, updated_at). */
  val hitterRecordsEngine: StructType = StructType(hitterRecordsBase :+
    StructField("recent_games", ArrayType(StructType(
      hitterGames.fields.filterNot(f =>
        f.name == "hitter_id" || f.name == "updated_at").toSeq))))

  private val pitcherOppSplit = Seq(
    i("opponent_games"), d("opponent_era"), i("opponent_wins"),
    i("opponent_losses"), i("opponent_sv"), i("opponent_hld"),
    d("opponent_wpct"), i("opponent_tbf"), s("opponent_ip"),
    i("opponent_hits"), i("opponent_hr"), i("opponent_bb"),
    i("opponent_hbp"), i("opponent_so"), i("opponent_runs"),
    i("opponent_er"), d("opponent_avg"))

  private val pitcherStdSplit = Seq(
    i("stadium_games"), d("stadium_era"), i("stadium_wins"),
    i("stadium_losses"), i("stadium_sv"), i("stadium_hld"),
    d("stadium_wpct"), i("stadium_tbf"), s("stadium_ip"),
    i("stadium_hits"), i("stadium_hr"), i("stadium_bb"),
    i("stadium_hbp"), i("stadium_so"), i("stadium_runs"),
    i("stadium_er"), d("stadium_avg"))

  /** pitcher_records without the recent-games column (ref :392-475). */
  private val pitcherRecordsBase: Seq[StructField] =
    Seq(i("pitcher_id"), s("player_name"), s("team_name"),
      ts("game_date"), d("era")) ++
    Seq(i("games"), i("cg"), i("sho"), i("wins"), i("losses"), i("sv"),
      i("hld"), d("wpct"), i("tbf"), i("np"), s("ip"), i("hits"),
      i("doubles"), i("triples"), i("hr"), i("sac"), i("sf"), i("bb"),
      i("ibb"), i("so"), i("wp"), i("bk"), i("runs"), i("er"), i("bsv"),
      d("whip"), d("avg"), i("qs")) ++
    Seq(d("fip"), d("k_rate"), d("bb_rate"), d("hr_rate")) ++
    (s("opponent_team") +: pitcherOppSplit) ++
    (s("stadium") +: pitcherStdSplit)

  /** Reference-layout pitcher_records (75 cols, CSV sidecar path). */
  val pitcherRecords: StructType =
    StructType(pitcherRecordsBase :+ s("recent_games_file_path"))

  /** Engine-native pitcher_records: nested recent_games column. */
  val pitcherRecordsEngine: StructType = StructType(pitcherRecordsBase :+
    StructField("recent_games", ArrayType(StructType(
      pitcherGames.fields.filterNot(f =>
        f.name == "pitcher_id" || f.name == "updated_at").toSeq))))

  /** All 16 reference tables by name — the catalog surface (A15). */
  val all: Map[String, StructType] = Map(
    "park_factor" -> parkFactor,
    "hitters" -> hitters,
    "hitter_opponents" -> hitterOpponents,
    "hitter_stadiums" -> hitterStadiums,
    "hitter_games" -> hitterGames,
    "pitchers" -> pitchers,
    "pitcher_games" -> pitcherGames,
    "pitcher_opponents" -> pitcherOpponents,
    "pitcher_stadiums" -> pitcherStadiums,
    "game_records" -> gameRecords,
    "game_records_until_5_innings" -> gameRecordsUntil5Innings,
    "today_games" -> todayGames,
    "today_lineup" -> todayLineup,
    "hitter_metrics" -> hitterMetrics,
    "pitcher_metrics" -> pitcherMetrics,
    "hitter_records" -> hitterRecords,
    "pitcher_records" -> pitcherRecords)

  /** A15 create-all: register every table as an empty catalog view so
    * `spark.table(name)` resolves with the exact reference schema. */
  def createAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, schema) =>
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .createOrReplaceTempView(name)
    }
}
