package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension historization: turn a change log
  * (key, tracked attributes, timestamp) into versioned dimension rows
  * `[valid_from, valid_to)` with an `is_current` flag — the lakehouse
  * pattern for "what did this user's profile say at time T?" queries
  * over attributes that mutate in place upstream.
  *
  * The reference's ingestion keeps only latest-wins state (its MERGE
  * upsert — see `sinks/UpsertWriter`, A12); SCD2 is the other standard
  * warehouse answer, and a training-data pipeline needs it wherever
  * point-in-time correctness matters (feature snapshots that must not
  * leak the future, label-at-time-of-event joins — the batch twin of
  * the as-of join in [[TemporalJoins]]).
  *
  * Semantics: per key, order the log by (ts, tieBreak...); collapse
  * every row whose tracked attributes null-safe-equal the previous
  * row's (no-op updates produce no version); each surviving change
  * opens a version at its ts, closed by the next change's ts
  * (`valid_to` NULL = still current).
  *
  * Scale shape: every window partitions by the dimension key — version
  * counts per key are bounded, nothing global. [[merge]] touches only
  * the keys present in the incoming batch (semi/anti split); untouched
  * history passes through without a rewrite, so incremental batches
  * cost O(batch + touched history), not O(dimension).
  */
object Scd2 {

  /** Full-log historization. Output: key..., tracked..., tieBreak...,
    * valid_from, valid_to, is_current. */
  def historize(log: DataFrame, key: Seq[String], ts: String,
      tracked: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    val cur = struct(tracked.map(col): _*)
    // row 1 always opens a version — even an all-NULL tracked struct
    // (lag's NULL would null-safe-equal it and wrongly collapse it).
    val changed = row_number().over(w) === 1 || !(cur <=> lag(cur, 1).over(w))
    val changes = log
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .select((key ++ tracked ++ tieBreak).map(col) :+ col(ts).as("valid_from"): _*)
    val w2 = Window.partitionBy(key.map(col): _*)
      .orderBy((col("valid_from") +: tieBreak.map(col)).map(_.asc): _*)
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental SCD2 merge: fold a new batch of per-key-appending
    * updates (every update ts >= the key's max valid_from — the normal
    * forward-moving ingestion contract) into an existing history.
    * Only touched keys are re-historized from (their surviving change
    * points ∪ the batch); untouched keys pass through untouched.
    * Applying ordered batches one at a time lands on exactly
    * [[historize]] of the concatenated log (Scd2Spec pins it). */
  def merge(existing: DataFrame, updates: DataFrame, key: Seq[String],
      ts: String, tracked: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val keys = updates.select(key.map(col): _*).distinct()
    val touched = existing.join(keys, key, "left_semi")
    val untouched = existing.join(keys, key, "left_anti")
    val logCols = (key ++ tracked ++ tieBreak).map(col)
    val replayed = touched.select(logCols :+ col("valid_from").as(ts): _*)
      .unionByName(updates.select(logCols :+ col(ts): _*))
    historize(replayed, key, ts, tracked, tieBreak)
      .unionByName(untouched)
  }

  /** Point-in-time lookup against a historized dimension: the version
    * row live at `at` (valid_from <= at < valid_to). */
  def asOf(history: DataFrame, at: Column): Column =
    col("valid_from") <= at && (col("valid_to").isNull || at < col("valid_to"))
}
