package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the "ANALYZE TABLE" a data pipeline runs on every
  * new ingest batch before trusting it: per-column null counts,
  * distinct cardinality, min/max, and the modal value. One long-format
  * row per profiled column, so downstream QA rules (null-rate jumped,
  * cardinality collapsed, a constant column appeared) diff two profile
  * frames row-by-row.
  *
  * Scale shape: each column profiles over its OWN pruned single-column
  * scan (columnar formats make per-column passes nearly free, and the
  * per-column jobs are independent — they schedule concurrently). The
  * distinct count is exact via a two-level aggregate (distinct then
  * count — no count(distinct) Expand doubling); the modal value is a
  * struct-min argmax (count desc, value asc tie-break), map-side
  * partial everywhere. Values are profiled as strings so one output
  * schema fits every column type; keep profiled columns to
  * string/integer families — float-to-string FORMATTING is
  * engine-specific and would break cross-engine comparability. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val vals = df.select(col(c).cast("string").as("v"))
      val basic = vals.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_nulls"),
        min(col("v")).as("min_value"), max(col("v")).as("max_value"))
      val dist = vals.where(col("v").isNotNull).distinct()
        .agg(count(lit(1)).as("n_distinct"))
      val top = vals.where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(min(struct((-col("cnt")).as("nc"), col("v").as("tv"))).as("b"))
        .select(col("b.tv").as("top_value"), (-col("b.nc")).as("top_count"))
      basic.crossJoin(dist).crossJoin(top)
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"),
          col("top_value"), col("top_count"))
    }.reduce(_.unionByName(_))

  /** Schema drift between two frame versions — the generalized form of
    * the fixture-schema contract that round 9's events regression
    * taught (a silent upstream re-type surfaces as N scattered
    * analysis errors unless ONE check catches it at the boundary).
    * Compares column names and DataTypes of `old`/`new` and returns
    * one row per drifted column: status `added` / `removed` /
    * `retyped` (with both type strings), empty when the schemas agree.
    * Pure metadata — no job runs; wire it ahead of any ingest append
    * and fail loudly on non-empty. Column ORDER is deliberately not
    * compared: columnar formats and `unionByName` make order
    * insignificant, and flagging it would cry wolf. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map(c =>
        (c, "added", null.asInstanceOf[String], n(c))) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c =>
        (c, "removed", o(c), null.asInstanceOf[String])) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => (c, "retyped", o(c), n(c))
      }
    rows.toDF("col_name", "status", "old_type", "new_type")
  }
}
