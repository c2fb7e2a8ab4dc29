package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline funnel observability: per-stage row accounting WITHOUT
  * re-running anything.
  *
  * A prep pipeline is a funnel — gate drops, dedup drops, sampling
  * drops — and production debugging starts with "which stage ate my
  * rows?". The naive answer (`df.count()` after each stage) re-executes
  * the plan prefix once per stage: O(stages²) scans, unusable at
  * 100 TB. This utility instead attaches Spark's own `CollectMetrics`
  * observation ([[org.apache.spark.sql.Dataset.observe]]) at each stage
  * boundary: the metrics are folded in DURING the one normal action
  * (map-side, zero extra jobs, zero extra scans) and read back from
  * `QueryExecution.observedMetrics` afterwards.
  *
  * The same `observe` nodes report through
  * `StreamingQueryProgress.observedMetrics` when the frame runs as a
  * stream — one instrumentation, both execution modes (the
  * EventPipeline batch-twin convention).
  */
object Funnel {

  /** Name a stage boundary: attaches `rows` (always) plus any extra
    * aggregate observations (e.g. `sum(col("n_tokens")).as("tokens")`)
    * to be collected during the next action. Returns the frame
    * unchanged row-wise — safe to insert anywhere in a chain. Stage
    * names must be unique within one plan (Spark enforces it). */
  def stage(df: DataFrame, name: String, extras: Column*): DataFrame =
    df.observe(name, count(lit(1)).as("rows"), extras: _*)

  /** Observed metrics of the LAST action on `df`, as
    * stage -> (metric -> value). Call after the action; an
    * un-executed frame reports no metrics. */
  def report(df: DataFrame): Map[String, Map[String, Any]] =
    df.queryExecution.observedMetrics.map { case (stage, row) =>
      stage -> row.schema.fieldNames.zip(row.toSeq).toMap
    }

  /** The funnel itself: ordered (stage, rows) with per-stage drop
    * counts relative to the PREVIOUS listed stage — the artifact a
    * drop-accounting dashboard renders. `order` fixes the stage
    * sequence (observedMetrics is unordered). */
  def dropReport(df: DataFrame, order: Seq[String]): Seq[(String, Long, Long)] = {
    val m = report(df)
    val rows = order.map(s => s -> m.get(s).map(_("rows")
      .asInstanceOf[Long]).getOrElse(0L))
    rows.zip(0L +: rows.map(_._2)).map { case ((s, n), prev) =>
      (s, n, math.max(prev - n, 0L))
    }.zipWithIndex.map { case ((s, n, d), i) =>
      (s, n, if (i == 0) 0L else d)
    }
  }
}
