package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier) — the classic OLAP
  * dominance query (Börzsönyi, Kossmann & Stocker, ICDE 2001 "The
  * Skyline Operator"): keep exactly the rows no other row dominates,
  * where q dominates p iff q.minCol <= p.minCol AND q.maxCol >=
  * p.maxCol with at least one strict ("cheaper and at least as big,
  * or as cheap and strictly bigger").
  *
  * Naive skyline is all-pairs. The scale design here is GRID PRUNING
  * on the minimized dimension: bucket by minCol (monotone binning, so
  * a strictly earlier bucket always holds strictly smaller minCol),
  * then
  *   1. cross-bucket dominance collapses to ONE broadcast prefix-max:
  *      p is dead iff max(maxCol) over earlier buckets >= p.maxCol —
  *      a bounded (<= bins) table folded in one packed row;
  *   2. only SAME-BUCKET pairs ever meet in a join, and that join is
  *      an equi-join on the bucket id. Bucket occupancy is the scale
  *      knob (the fs_link blocking contract): more bins = smaller
  *      quadratic cells.
  * Duplicate points dominate neither way and both survive — the
  * NOT-EXISTS semantics the oracle checks verbatim.
  */
object Skyline {

  /** @param df     input rows
    * @param keyCol unique row id (dominated rows are removed by id)
    * @param minCol dimension to minimize (numeric)
    * @param maxCol dimension to maximize (numeric)
    * @param bins   grid cells on minCol — occupancy knob, result-
    *               invariant (any binning yields the same skyline)
    * @return the input rows that lie on the Pareto frontier */
  def skyline2d(df: DataFrame, keyCol: String, minCol: String,
      maxCol: String, bins: Int = 256): DataFrame = {
    require(bins >= 1, s"skyline2d: need bins >= 1, got $bins")
    val pts = df.where(col(minCol).isNotNull && col(maxCol).isNotNull)
    val x = col(minCol).cast("double")
    val y = col(maxCol).cast("double")
    val bounds = pts.agg(min(x).as("__lo"), max(x).as("__hi"))
    val withB = pts.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") <= col("__lo"), lit(0L))
          .otherwise(least(greatest(
            floor((x - col("__lo")) /
              ((col("__hi") - col("__lo")) / bins)).cast("long"),
            lit(0L)), lit(bins - 1L))))
      .drop("__lo", "__hi")
    // bounded per-bucket best maxCol -> strict-prefix max, one packed row
    val perB = withB.groupBy(col("__b")).agg(max(y).as("__mx"))
    val pref = perB
      .agg(array_sort(collect_list(struct(col("__b"), col("__mx"))))
        .as("arr"))
      .select(explode(transform(col("arr"), (e, i) =>
        struct(e.getField("__b").as("__b"),
          aggregate(slice(col("arr"), lit(1), i),
            lit(Double.NegativeInfinity),
            (acc, p) => greatest(acc, p.getField("__mx")))
            .as("__pref")))).as("s"))
      .select(col("s.__b").as("__b"), col("s.__pref").as("__pref"))
    // a strictly earlier bucket's point has strictly smaller minCol,
    // so >= on maxCol is already full dominance
    val alive = withB.join(broadcast(pref), Seq("__b"))
      .where(col("__pref") < y)
      .drop("__pref")
    // same-bucket pairs: the full dominance predicate on an equi-join
    val probe = withB.select(col("__b"), x.as("__qx"), y.as("__qy"),
      col(keyCol).as("__qk"))
    val dead = alive.join(probe, Seq("__b"))
      .where(col("__qk") =!= col(keyCol) &&
        col("__qx") <= x && col("__qy") >= y &&
        (col("__qx") < x || col("__qy") > y))
      .select(col(keyCol)).distinct()
    alive.join(dead, Seq(keyCol), "left_anti").drop("__b")
  }
}
