package graft.kbo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Exprs
import graft.queries.Q

/** The reference's analytics surface, re-expressed as pure
  * `DataFrame => DataFrame` transforms (one object per reference DAG).
  * All formulas cite /root/reference file:line; the N+1 loop patterns of
  * the reference are rewritten set-based per SURVEY.md §4.
  */
object Metrics {

  /** 001 — park factor. G1 + G2 (complement aggregate) + M1.
    * Ref: dags/001_park_factor_calculation.py:40-72.
    *
    * The reference runs one pandasql complement scan PER stadium (O(S^2));
    * we compute grand totals once and subtract — a single hash aggregate
    * plus a windowed grand total, no per-group rescan. At scale this is one
    * shuffle on `stadium` and an O(1) broadcast-sized window.
    */
  def parkFactor(gameRecords: DataFrame): DataFrame = {
    val perStadium = gameRecords.groupBy(col("stadium")).agg(
      sum(col("home_score")).cast("long").as("scored"),
      sum(col("away_score")).cast("long").as("allowed_score"),
      count(lit(1)).as("games"))
    // Grand totals via an empty-frame window over the (tiny) grouped result:
    // equivalent to the G2 complement re-scan but one pass.
    val w = Window.partitionBy()
    val withTotals = perStadium
      .withColumn("t_scored", sum(col("scored")).over(w))
      .withColumn("t_allowed", sum(col("allowed_score")).over(w))
      .withColumn("t_games", sum(col("games")).over(w))
    val otherScored  = col("t_scored") - col("scored")
    val otherAllowed = col("t_allowed") - col("allowed_score")
    val otherGames   = col("t_games") - col("games")
    // M1: per-game run rate at S / per-game run rate everywhere else
    // (ref :72). Degenerate single-stadium league => NULL (division by 0).
    withTotals.select(
      col("stadium"),
      when(otherGames === 0 || (otherScored + otherAllowed) === 0,
        lit(null).cast("double"))
        .otherwise(
          ((col("scored") + col("allowed_score")).cast("double") / col("games")) /
          ((otherScored + otherAllowed).cast("double") / otherGames))
        .as("park_factor"))
  }

  /** 011 — wOBA with KBO linear weights. G6 guard + M2.
    * Ref: dags/011_calculate_hitter_wOBA.py:37-42.
    * Rows with pa-ibb-sac == 0 are dropped (reference `continue`s them) —
    * the metric simply never materializes for those hitters.
    */
  def hitterWoba(hitters: DataFrame): DataFrame = {
    val denom = col("pa") - col("ibb") - col("sac")
    hitters
      .filter(denom =!= 0)
      .select(col("hitter_id"),
        ((lit(0.7) * (col("bb") - col("ibb") + col("hbp"))
          + lit(0.9) * col("hits") + lit(1.25) * col("doubles")
          + lit(1.6) * col("triples") + lit(2.0) * col("hr")
          + lit(0.25) * col("sb") - lit(0.5) * col("cs")) / denom)
          .as("wOBA"))
  }

  /** 012 — wRC. League scalar aggregates (G3) + M3 wOBA-scale + M4,
    * with the per-hitter `pa` point lookup (J8) folded into one join.
    * Ref: dags/012_calculate_hitter_wRC.py:20-93.
    *
    * League scalars are a single one-row aggregate crossJoin'd (broadcast)
    * onto the hitters — the Spark shape of the reference's driver-side
    * constants. No shuffle beyond the two aggregates.
    */
  def hitterWrc(gameRecords: DataFrame, hitters: DataFrame,
                woba: DataFrame): DataFrame = {
    // League scalars are decimal-routed (Q.dsum/davg) so the one-row frame
    // is bit-identical across partitionings/topologies — the determinism
    // contract every downstream row-wise formula inherits.
    val leagueRunsPa = gameRecords.agg(
        (sum(col("away_score")) + sum(col("home_score"))).cast("long")
          .cast("double").as("league_runs"))
      .crossJoin(hitters.agg(
        sum(col("pa")).cast("long").cast("double").as("league_pa"),
        Q.davg(col("obp")).as("league_obp"), Q.davg(col("slg")).as("league_slg")))
    val leagueWoba = woba.agg(Q.davg(col("wOBA")).as("league_woba"))
    val scalars = broadcast(leagueRunsPa.crossJoin(leagueWoba)
      .withColumn("woba_scale",
        (col("league_woba") - col("league_obp")) /
        (col("league_slg") - col("league_obp"))))
    hitters.select(col("hitter_id"), col("pa"))
      .join(woba, Seq("hitter_id"))
      .crossJoin(scalars)
      .select(col("hitter_id"),
        (((col("wOBA") - col("league_woba")) / col("woba_scale")
          + col("league_runs") / col("league_pa")) * col("pa")).as("wRC"))
  }

  /** 013 — k_rate / bb_rate / BABIP with zero-denominator guards (G6).
    * Ref: dags/013_calculate_hitter_metrics.py:39-46. */
  def hitterRates(hitters: DataFrame): DataFrame = {
    val babipDenom = col("ab") - col("so") - col("hr") + col("sf")
    hitters
      .filter(col("pa") =!= 0 && babipDenom =!= 0)
      .select(col("hitter_id"),
        (col("so").cast("double") / col("pa")).as("k_rate"),
        (col("bb").cast("double") / col("pa")).as("bb_rate"),
        ((col("hits") - col("hr")).cast("double") / babipDenom).as("babip"))
  }

  /** 021 — FIP + K/9, BB/9, HR/9. F3 ip-parse + G5 league totals + M8-M10.
    * Ref: dags/021_calculate_pitcher_metrics.py:43-86.
    * The reference's manual fold skips unparseable ERAs (try/except with an
    * error counter); Spark's avg/sum null-skip reproduces that exactly.
    */
  def pitcherMetrics(pitchers: DataFrame): DataFrame = {
    val withIp = pitchers.withColumn("ip_f", Exprs.ipToFloat(col("ip")))
    val league = broadcast(withIp.agg(
      sum(col("hr")).cast("long").cast("double").as("lg_hr"),
      sum(col("bb")).cast("long").cast("double").as("lg_bb"),
      sum(col("so")).cast("long").cast("double").as("lg_so"),
      Q.dsum(col("ip_f")).as("lg_ip"),
      Q.davg(col("era")).as("lg_era")))
    // M8 (ref :66): fip_constant = lgERA - (13*lgHR + 3*lgBB - 2*lgSO)/lgIP
    withIp.filter(col("ip_f") =!= 0.0)
      .crossJoin(league)
      .select(col("pitcher_id"),
        ((lit(13) * col("hr") + lit(3) * col("bb") - lit(2) * col("so"))
          / col("ip_f")
          + (col("lg_era") - (lit(13) * col("lg_hr") + lit(3) * col("lg_bb")
            - lit(2) * col("lg_so")) / col("lg_ip"))).as("fip"),
        (col("so") * lit(9.0) / col("ip_f")).as("k_rate"),
        (col("bb") * lit(9.0) / col("ip_f")).as("bb_rate"),
        (col("hr") * lit(9.0) / col("ip_f")).as("hr_rate"))
  }

  /** 070 — first-5-innings result. G4 innings sum + F10 sign.
    * Ref: dags/070_get_game_resulty.py:90-119.
    * Input: one row per (game, inning) with away/home runs for innings as
    * an array column `away_innings`/`home_innings` OR pre-summed columns.
    * This variant takes per-inning array columns.
    */
  def fiveInningResult(scoreboard: DataFrame): DataFrame = {
    def first5(c: Column): Column =
      aggregate(slice(c, 1, 5), lit(0), (acc, x) => acc + x)
    scoreboard.select(
      col("game_date"), col("away_team"), col("home_team"),
      Exprs.resultSign(first5(col("away_innings")), first5(col("home_innings")))
        .as("result"))
  }

  /** 041 — park-adjusted wRC+ / OPS+. J1 + J5 + J6 + M11 + M12.
    * Ref: dags/041_calculate_hitter_metrics_with_park_factor.py:19-151.
    *
    * Reference does 4 point-SELECTs per lineup row; we do one broadcast
    * join to hitters⋈metrics and one to park_factor. The reference's
    * defaultdict gives pf=0.0 for unknown stadiums and then ZeroDivision-
    * guards; we keep that as coalesce(pf, 0) + zero => NULL. NOTE
    * (documented divergence, SURVEY §7): on pf=0 the reference leaves
    * OPS+ STALE from the previous loop iteration (bug); we emit NULL.
    */
  /** League scalars for parkAdjusted as a ONE-ROW broadcastable frame —
    * never driver-side Doubles (that would force a collect()). Decimal-
    * routed for cross-topology determinism. */
  def leagueScalars(hitters: DataFrame, wrc: DataFrame): DataFrame =
    hitters.agg(
        Q.davg(col("obp")).as("league_obp"),
        Q.davg(col("slg")).as("league_slg"),
        sum(col("pa")).cast("long").cast("double").as("league_pa"))
      .crossJoin(wrc.agg(Q.dsum(col("wRC")).as("league_wrc")))

  def parkAdjusted(lineup: DataFrame, hitters: DataFrame, wrc: DataFrame,
                   parkFactor: DataFrame, scalars: DataFrame): DataFrame = {
    // hitterSide is player-grain: no broadcast hint (AQE decides);
    // parkFactor is stadium-grain — O(10) rows forever — hinted.
    val hitterSide = hitters.select(col("hitter_id"), col("player_name"),
      col("team_name"), col("pa"), col("obp"), col("slg"))
      .join(wrc, Seq("hitter_id"))
    val joined = lineup.filter(col("position") =!= 0)
      .join(hitterSide,
        lineup("player") === hitterSide("player_name") &&
        lineup("team") === hitterSide("team_name"))
      .join(broadcast(parkFactor), Seq("stadium"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("pf", coalesce(col("park_factor"), lit(0.0)))
    val wrcPlus = when(col("pf") === 0.0 || col("pa") === 0,
        lit(null).cast("double"))
      .otherwise((col("wRC") / col("pa")) /
        ((col("league_wrc") / col("league_pa")) / col("pf")) * lit(100.0))
    val opsPlus = when(col("pf") === 0.0, lit(null).cast("double"))
      .otherwise((lit(100.0) / col("pf")) *
        (col("obp") / col("league_obp") + col("slg") / col("league_slg")
          - lit(1.0)))
    joined.select(col("hitter_id"), col("player_name"), col("team_name"),
      col("stadium"), wrcPlus.as("wRC_plus"), opsPlus.as("OPS_plus"))
  }
}
