package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A12 — upsert semantics (`INSERT ... ON DUPLICATE KEY UPDATE`) without a
  * transactional table format. Ref: dags/utils/queries.py:5-261.
  *
  * Lake mode: latest-wins merge by natural key. The incoming batch wins
  * over the existing table; within a batch, ties break on `versionCol`
  * (typically updated_at) then deterministic arrival order — the reference
  * relies on MySQL row-at-a-time ordering (dags/utils/queries.py:13), which
  * is nondeterministic under parallelism; we make the tie-break explicit so
  * the merge is idempotent: upsert(upsert(t,d),d) == upsert(t,d).
  *
  * At scale this is one shuffle on the key; with a bucketed base table the
  * window reuses the bucketing and the merge is shuffle-free on the base
  * side.
  */
object UpsertWriter {

  /** Pure merge (no I/O) — unit-testable core. `incoming` beats `existing`
    * on key collision; duplicate keys inside either side collapse to the
    * row with the highest (versionCol, srcRank). */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            versionCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc, col(versionCol).desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Lake upsert: read current table (if any), merge, overwrite atomically
    * via a staging write. */
  def upsertParquet(incoming: DataFrame, path: String, keys: Seq[String],
                    versionCol: String): Unit = {
    val spark = incoming.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val merged =
      if (exists) merge(spark.read.parquet(path), incoming, keys, versionCol)
      else incoming
    val staging = path + "__staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    spark.read.parquet(staging).write.mode(SaveMode.Overwrite).parquet(path)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }
}

/** A14 — the reference's per-player recent-games CSV sidecar layout
  * `data/{hitter|pitcher}/{game_date}/{id}.csv`
  * (ref: dags/050_insert_hitter_intergration_data.py:124-127). Partitioned
  * write keyed the same way; kept for byte-fidelity, but the nested
  * `recent_games` array column in Records is the primary representation.
  */
object CsvSidecar {
  def write(recentGames: DataFrame, idCol: String, root: String): Unit =
    recentGames.write.mode(SaveMode.Overwrite)
      .partitionBy("game_date", idCol)
      .option("header", "true")
      .csv(root)
}
