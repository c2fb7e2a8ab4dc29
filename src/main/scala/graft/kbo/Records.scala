package graft.kbo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 050/060 — the wide integration records. J1–J4/J7 left joins with column
  * prefixes + W1 top-5 recent-games window.
  * Ref: dags/050_insert_hitter_intergration_data.py:17-155,
  *      dags/060_insert_pitcher_integration_data.py:16-152.
  *
  * The reference runs 4 point-SELECTs + a LIMIT 5 query PER lineup row;
  * here each right side joins once (broadcast — they are player-grain
  * dimensions), and top-5 is a single row_number window partitioned by
  * player. The reference spills the 5 recent games to a per-player CSV
  * sidecar and stores the file path (dags/050...py:124-127); we keep them
  * as a nested array<struct> column (`recent_games`) — same information,
  * no filesystem side channel. `CsvSidecar.write` reproduces the file
  * layout for byte-fidelity when needed.
  */
object Records {

  private def prefixed(df: DataFrame, prefix: String,
                       keys: Seq[String]): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
    }

  /** Generic wide record: works for hitters (idCol=hitter_id, F2 filter
    * position != 0) and pitchers (idCol=pitcher_id, position == 0). */
  def wideRecord(lineup: DataFrame, players: DataFrame, metrics: DataFrame,
                 opponents: DataFrame, stadiums: DataFrame,
                 recentGames: DataFrame, idCol: String,
                 isPitcher: Boolean, recentK: Int = 5,
                 recentOrderCols: Seq[String] =
                   Seq("game_date", "opponent_team")): DataFrame = {
    val side = if (isPitcher) lineup.filter(col("position") === 0)
               else lineup.filter(col("position") =!= 0)
    // J1: resolve (player, team) -> player_id; inner (skip-if-missing).
    // The record carries the resolved identity under the reference's
    // player_name/team_name names (ref 050:87-127); audit columns never
    // leak through the split prefixes. The right sides are player-grain
    // dimensions — small today, but NOT hinted broadcast: AQE picks
    // broadcast when they fit and falls back to a shuffle join when a
    // 1000x catalog doesn't, instead of OOMing on a forced build side.
    val p = players.drop("updated_at")
    val base = side.join(p,
        side("player") === p("player_name") &&
        side("team") === p("team_name"))
      .drop(p("player_name")).drop(p("team_name"))
    // J2: metrics, left (missing => NULL metrics).
    val withMetrics = base.join(
      metrics.drop("updated_at"), Seq(idCol), "left")
    // J3: vs-opponent splits, left, opponent_ prefix.
    val opp = prefixed(opponents.drop("updated_at"), "opponent_",
      Seq(idCol, "opponent_team"))
    val withOpp = withMetrics.join(opp,
      withMetrics(idCol) === opp(idCol) &&
      withMetrics("opponent") === opp("opponent_team"), "left")
      .drop(opp(idCol)).drop("opponent_team")
    // J4: by-stadium splits, left, stadium_ prefix.
    val std = prefixed(stadiums.drop("updated_at"), "stadium_",
      Seq(idCol, "stadium"))
    val withStd = withOpp.join(std,
      withOpp(idCol) === std(idCol) &&
      withOpp("stadium") === std("stadium"), "left")
      .drop(std(idCol)).drop(std("stadium"))
    // W1: top-k recent games per player as a nested column.
    val gameCols = recentGames.columns.filterNot(c =>
      c == idCol || c == "updated_at")
    // recentOrderCols must totally order a player's games (callers append a
    // unique game id) or the top-k cut is nondeterministic under ties.
    val w = Window.partitionBy(col(idCol))
      .orderBy(recentOrderCols.map(c => col(c).desc): _*)
    val recent = recentGames
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= recentK)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(gameCols.toIndexedSeq.map(col): _*)), asc = false)
        .as("recent_games"))
    val joined = withStd.join(recent, Seq(idCol), "left")
      .withColumnRenamed("player", "player_name")
      .withColumnRenamed("team", "team_name")
      .withColumnRenamed("opponent", "opponent_team")
      .drop("updated_at")
    // pitcher_records carries no batting-order column (position is always
    // 0 on the pitcher side; ref dags/0_init_baseball_table.py:392-478).
    if (isPitcher) joined.drop("position") else joined
  }
}
