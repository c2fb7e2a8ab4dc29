package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Probabilistic record linkage scoring (Fellegi & Sunter, JASA 1969):
  * blocked candidate pairs scored by per-field agreement log-odds and
  * classified link / possible / non_link against declared thresholds.
  *
  * The m/u probabilities (P[field agrees | match] / P[field agrees |
  * non-match]) are DECLARED here, not EM-fitted — the deterministic
  * production-scoring half of FS; weights are Scala-computed double
  * literals so both engines share them bit-for-bit.
  *
  * Scale shape: candidate generation is a blocked equi-join — pair
  * count is sum over blocks of |L_b| x |R_b|, so the blocking key is
  * the scale contract (choose one that bounds block sizes; the fixture
  * blocks on nation). Scoring is per-row scalar math; no window, no
  * iteration.
  */
object Linkage {

  /** One comparison field: `agree` is evaluated against the joined
    * pair frame (left columns prefixed l_, right r_); (m, u) give the
    * agreement/disagreement log2 weights. */
  final case class FsField(name: String, agree: Column,
      m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"FsField $name: need 0 < u < m < 1")
    val wAgree: Double = math.log(m / u) / math.log(2.0)
    val wDisagree: Double = math.log((1.0 - m) / (1.0 - u)) /
      math.log(2.0)
  }

  /** Score all within-block pairs of `left` x `right`.
    *
    * @param idCol     unique id column, present in both frames
    * @param blockCols blocking keys (equi-join; the anti-quadratic
    *                  contract)
    * @param fields    comparison vector with declared m/u weights
    * @param upper     total score >= upper -> 'link'
    * @param lower     total score <= lower -> 'non_link'
    * @param selfPairs when left and right are the same frame, keep
    *                  only l_id < r_id pairs
    */
  def fsLink(left: DataFrame, right: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[FsField], upper: Double,
      lower: Double, selfPairs: Boolean = false): DataFrame = {
    require(fields.nonEmpty, "fsLink: need at least one field")
    require(upper >= lower, "fsLink: upper must be >= lower")
    def prefixed(df: DataFrame, p: String) = df.select(
      df.columns.map(c =>
        if (blockCols.contains(c)) col(c) else col(c).as(s"$p$c")): _*)
    val l = prefixed(left, "l_")
    val r = prefixed(right, "r_")
    val joined0 = l.join(r, blockCols)
    val joined =
      if (selfPairs)
        joined0.where(col(s"l_$idCol") < col(s"r_$idCol"))
      else joined0
    // field agreements once each; the score is ONE sig9'd sum of
    // shared double literals
    val withAgree = fields.foldLeft(joined) { (df, f) =>
      df.withColumn(s"agree_${f.name}", coalesce(f.agree, lit(false)))
    }
    val score = Q.sig9(fields.map(f =>
      when(col(s"agree_${f.name}"), lit(f.wAgree))
        .otherwise(lit(f.wDisagree))).reduce(_ + _))
    withAgree.withColumn("score", score)
      .withColumn("decision",
        when(col("score") >= upper, "link")
          .when(col("score") <= lower, "non_link")
          .otherwise("possible"))
      .select(Seq(col(s"l_$idCol").as("left_id"),
        col(s"r_$idCol").as("right_id")) ++
        fields.map(f => col(s"agree_${f.name}")) ++
        Seq(col("score"), col("decision")): _*)
  }
}
