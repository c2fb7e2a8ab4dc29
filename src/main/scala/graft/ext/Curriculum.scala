package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum construction: assign every document to a score-quantile
  * bucket (easy -> hard stages) plus a deterministic within-bucket
  * order, so a trainer can stream stage 0, then stage 1, ... with a
  * reproducible shuffle inside each stage.
  *
  * Scale design: bucketing does NOT use `ntile() OVER (ORDER BY
  * score)` — a global-order window is a single-reducer sort of the
  * corpus. Instead the exact percentile boundaries are ONE aggregate
  * (a one-row frame) broadcast back over a map-side pass; the bucket
  * id is "how many boundaries lie strictly below my score". With heavy
  * score ties the buckets are unequal by exactly the tie mass — the
  * price of a deterministic, order-free assignment (ntile would break
  * ties by arbitrary row order: not reproducible, and not
  * engine-portable). The within-bucket order is the salted unit hash —
  * the same append-stable coin as the sampling family. */
object Curriculum {

  def buckets(df: DataFrame, keyCol: String, scoreCol: String,
              nBuckets: Int, salt: String = "curriculum"): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val probs = (1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets))
    // sig9 the interpolated boundaries before comparing: Spark and
    // DuckDB interpolate quantiles with differently-ordered (same-value)
    // formulas, and a raw 1-ulp boundary difference could flip the
    // bucket of a score sitting exactly on it (module convention: every
    // engine-formula-dependent value is normalized before thresholding)
    val bounds = df.agg(
      transform(percentile(col(scoreCol), array(probs: _*)),
        b => graft.queries.Q.sig9(b)).as("bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        aggregate(col("bounds"), lit(0L),
          (acc, b) => acc + when(col(scoreCol) > b, 1L).otherwise(0L)))
      .withColumn("ord", Sampling.unitHash(col(keyCol), salt))
      .drop("bounds")
  }
}
