package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: hashed n-gram log-ratio scoring against a
  * target domain. Pinned: target-like docs outrank off-domain docs,
  * featureless docs are neutral (0.0), weights are partition-invariant,
  * and selection ties break deterministically by id.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (100L, "spark shuffle spark codegen spark plan"),
    (101L, "spark codegen shuffle plan spark")).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "spark shuffle codegen plan spark spark"), // target-like
    (2L, "football weather kitchen garden recipe"), // off-domain
    (3L, "spark weather plan kitchen"),             // mixed
    (4L, "")                                        // featureless
  ).toDF("doc_id", "text")

  test("target-like docs outrank off-domain; featureless is 0.0") {
    val w = Dsir.importanceWeights(corpus, target, buckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w.size == 4)
    assert(w(1L) > w(3L), "pure target-like beats mixed")
    assert(w(3L) > w(2L), "mixed beats pure off-domain")
    assert(w(4L) == 0.0, "featureless doc is neutral")
  }

  test("weights are partition-invariant") {
    def run(parts: Int) =
      Dsir.importanceWeights(corpus.repartition(parts), target, buckets = 64)
        .as[(Long, Double)].collect().toSet
    assert(run(1) == run(5))
  }

  test("selectTopK ranks by (weight desc, id asc) with keep flag") {
    val w = Seq((1L, 2.0), (2L, 3.0), (3L, 2.0)).toDF("doc_id", "weight")
    val r = Dsir.selectTopK(w, k = 2)
      .as[(Long, Double, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(r(2L) == ((1L, true)))
    assert(r(1L) == ((2L, true)), "tie at 2.0 -> smaller id first")
    assert(r(3L) == ((3L, false)))
  }
}
