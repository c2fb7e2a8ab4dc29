package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** In-engine linear-model training: full-batch logistic regression by
  * gradient descent, expressed as ONE aggregate per iteration — the
  * fastText-style quality-classifier recipe (hand-engineered document
  * features -> a tiny linear model filtering a 100 TB corpus) without
  * leaving the engine or shipping data to a separate trainer.
  *
  * Scale shape: each iteration is a single map-side-combined aggregate
  * over the feature frame (k+0 gradient sums); the weight vector is a
  * bounded driver-side artifact (k doubles — the Bpe-rules precedent),
  * re-broadcast into the next iteration's projection as literals.
  * Nothing shuffles but the k-column aggregate; iterations are the
  * only sequential dimension (inherent to GD).
  *
  * Determinism contract (the reason this can sit under the DuckDB
  * oracle at all): the per-row sigmoid routes through sig9 (the libm
  * normalization every operator here uses), gradient sums accumulate
  * exactly through DECIMAL ([[Q.dsum]]), and the weight update
  * `w - lr * g / n` is a fixed IEEE expression — so the entire
  * training trajectory, not just the final scores, is bit-identical
  * across engines, partitionings and re-runs. A classifier whose
  * weights drift per run cannot gate a reproducible corpus.
  */
object Classifier {

  /** sig9-normalized logistic function (exp is the one libm step). */
  def sigmoid9(z: Column): Column =
    Q.sig9(lit(1.0) / (lit(1.0) + exp(-z)))

  private def zOf(features: Seq[String], w: Array[Double]): Column =
    features.zip(w).map { case (f, wj) => col(f) * lit(wj) }
      .reduce(_ + _)

  /** Full-batch GD from w = 0: `iters` rounds of
    * w_j <- w_j - lr * dsum(err(w·x, y) * x_j) / n, with the error
    * function supplied by the caller (logistic / linear below). */
  private def gdTrain(df: DataFrame, features: Seq[String], label: String,
                      iters: Int, lr: Double,
                      err: (Column, Column) => Column): Array[Double] = {
    require(features.nonEmpty && iters >= 1 && lr > 0,
      "need features, iters >= 1, lr > 0")
    val base = df.select((label +: features).map(col): _*)
      .na.drop(features :+ label)
    val n = base.count().toDouble
    require(n > 0, "empty training frame")
    var w = Array.fill(features.size)(0.0)
    for (_ <- 1 to iters) {
      val e = err(zOf(features, w), col(label))
      val g = base.agg(
        Q.dsum(e * col(features.head)).as("g0"),
        features.tail.zipWithIndex.map { case (f, j) =>
          Q.dsum(e * col(f)).as(s"g${j + 1}")
        }: _*).head()
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * g.getDouble(j) / n
      }
    }
    w
  }

  /** Logistic regression: err = sigmoid9(w·x) - y. Include a constant
    * 1.0 column among `features` for the bias; label must be 0.0/1.0.
    * Returns learned weights in feature order. */
  def logisticTrain(df: DataFrame, features: Seq[String], label: String,
                    iters: Int, lr: Double): Array[Double] =
    gdTrain(df, features, label, iters, lr,
      (z, y) => sigmoid9(z) - y)

  /** Least-squares linear regression by the same GD loop: err =
    * (w·x - y). No libm step ANYWHERE on this path — the trajectory is
    * exact decimal + fixed IEEE arithmetic, no sig9 normalization
    * needed beyond [[Q.dsum]]'s own. Scale features to O(1) so the
    * un-normalized gradient doesn't need a tiny lr. */
  def linearTrain(df: DataFrame, features: Seq[String], label: String,
                  iters: Int, lr: Double): Array[Double] =
    gdTrain(df, features, label, iters, lr, (z, y) => z - y)

  /** Linear prediction w·x (same left-to-right fold as training). */
  def predict(df: DataFrame, features: Seq[String], w: Array[Double],
              outCol: String = "yhat"): DataFrame = {
    require(features.size == w.length, "weights/features length mismatch")
    df.withColumn(outCol, zOf(features, w))
  }

  /** Score a frame with learned weights: sig9'd probability +
    * the 0.5-threshold decision. */
  def score(df: DataFrame, features: Seq[String], w: Array[Double],
            scoreCol: String = "score"): DataFrame = {
    require(features.size == w.length, "weights/features length mismatch")
    df.withColumn(scoreCol, sigmoid9(zOf(features, w)))
      .withColumn(s"${scoreCol}_pred", col(scoreCol) >= 0.5)
  }
}
