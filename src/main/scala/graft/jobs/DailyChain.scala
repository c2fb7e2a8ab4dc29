package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kbo.{Metrics, Records}

/** The reference's daily analytics chain (SURVEY.md §3 entry point 1:
  * DAGs 001 -> 011 -> 012 -> 013 -> 021 -> 041 -> 050 -> 060) as one pure
  * DataFrame program. The reference hands each stage through MySQL; here
  * stages compose in-plan (Catalyst sees the whole chain; common inputs
  * like the league scalars are computed once per run). Orchestration
  * (Airflow scheduling, scrape triggering) stays external — inputs are the
  * already-landed tables, outputs the derived metric/record tables.
  */
object DailyChain {

  /** The hitter_metrics table (ref dags/0_init_baseball_table.py:284-293)
    * from raw inputs: wOBA -> wRC -> rates -> park-adjusted, one row per
    * hitter. Factored out of run() so the oracle query checks exactly the
    * production composition. */
  def hitterMetricsTable(gameRecords: DataFrame, hitters: DataFrame,
                         lineup: DataFrame,
                         parkFactor: DataFrame): DataFrame = {
    val woba = Metrics.hitterWoba(hitters)
    val wrc = Metrics.hitterWrc(gameRecords, hitters, woba)
    val rates = Metrics.hitterRates(hitters)
    assembleHitterMetrics(woba, wrc, rates,
      adjustedOnePerHitter(lineup, hitters, wrc, parkFactor))
  }

  /** Reference DAG 041's output, one row per hitter: park-adjusted
    * wRC+/OPS+. A hitter can appear in several lineup rows (different
    * stadiums => different wRC+/OPS+); the reference's per-row upsert
    * loop kept whichever ran last — nondeterministic under
    * parallelism. We pin the FIRST stadium in lexicographic order.
    * Shared by the in-process chain and the per-stage deployment main
    * ([[graft.jobs.stages]]) so the two compositions cannot diverge. */
  def adjustedOnePerHitter(lineup: DataFrame, hitters: DataFrame,
                           wrc: DataFrame,
                           parkFactor: DataFrame): DataFrame = {
    val scalars = Metrics.leagueScalars(hitters, wrc)
    val adjusted = Metrics.parkAdjusted(lineup, hitters, wrc,
      parkFactor, scalars)
    val wAdj = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hitter_id"))
      .orderBy(col("stadium").asc)
    adjusted
      .withColumn("__rn", row_number().over(wAdj))
      .filter(col("__rn") === 1)
      .select(col("hitter_id"), col("wRC_plus"), col("OPS_plus"))
  }

  /** The hitter_metrics row shape from its four ingredient frames —
    * the reference's table assembled by DAGs 011/012/013/041. */
  def assembleHitterMetrics(woba: DataFrame, wrc: DataFrame,
                            rates: DataFrame,
                            adjustedOne: DataFrame): DataFrame =
    woba
      .join(wrc, Seq("hitter_id"), "left")
      .join(rates, Seq("hitter_id"), "left")
      .join(adjustedOne, Seq("hitter_id"), "left")

  /** Run the full metric chain. Inputs are reference-shaped frames (see
    * graft.kbo.Schemas); output map keys = reference table names. */
  def run(gameRecords: DataFrame, hitters: DataFrame, pitchers: DataFrame,
          lineup: DataFrame, hitterOpponents: DataFrame,
          hitterStadiums: DataFrame, hitterGames: DataFrame,
          pitcherOpponents: DataFrame, pitcherStadiums: DataFrame,
          pitcherGames: DataFrame): Map[String, DataFrame] = {

    // 001: park factor
    val parkFactor = Metrics.parkFactor(gameRecords)

    // 011-013 + 041: the hitter metric chain -> hitter_metrics table
    val hitterMetrics = hitterMetricsTable(gameRecords, hitters, lineup,
      parkFactor)

    // 021: pitcher metrics
    val pitcherMetrics = Metrics.pitcherMetrics(pitchers)

    // 050/060: wide integration records
    val hitterRecord = Records.wideRecord(lineup, hitters, hitterMetrics,
      hitterOpponents, hitterStadiums, hitterGames, "hitter_id",
      isPitcher = false)
    val pitcherRecord = Records.wideRecord(lineup, pitchers, pitcherMetrics,
      pitcherOpponents, pitcherStadiums, pitcherGames, "pitcher_id",
      isPitcher = true)

    Map(
      "park_factor" -> parkFactor,
      "hitter_metrics" -> hitterMetrics,
      "pitcher_metrics" -> pitcherMetrics,
      "hitter_records" -> hitterRecord,
      "pitcher_records" -> pitcherRecord)
  }
}
