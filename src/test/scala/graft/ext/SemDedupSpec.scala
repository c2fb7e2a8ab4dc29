package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic dedup: clustering-bounded near-dup removal over embeddings.
  * Pinned properties: planted near-dups drop (keep-first by id), distinct
  * vectors survive, the decision is partition-invariant, and every input
  * id appears exactly once in the output.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated base directions in 8-dim space + near-copies
  private def vec(axis: Int, eps: Double, dims: Int = 8): Array[Double] = {
    val a = Array.fill(dims)(eps)
    a(axis) = 1.0
    a
  }

  private val fixture = Seq(
    (0L, vec(0, 0.0)), (1L, vec(1, 0.0)), (2L, vec(2, 0.0)),
    (3L, vec(3, 0.0)),
    (10L, vec(0, 0.001)), // near-dup of 0
    (11L, vec(1, 0.002)), // near-dup of 1
    (12L, vec(0, 0.3))    // same cluster as 0, NOT a near-dup
  ).toDF("vec_id", "embedding")

  test("planted near-dups drop, originals and distinct vectors keep") {
    val r = Similarity.semDedup(fixture, k = 4, threshold = 0.99)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(r.size == 7, "every input id appears exactly once")
    assert(r(0L) && r(1L) && r(2L) && r(3L), "originals keep")
    assert(!r(10L) && !r(11L), "near-dups of smaller ids drop")
    assert(r(12L), "same-cluster distinct vector keeps")
  }

  test("decision is partition-invariant") {
    def run(parts: Int) =
      Similarity.semDedup(fixture.repartition(parts), k = 4,
        threshold = 0.99)
        .select("vec_id", "centroid_id", "keep")
        .as[(Long, Long, Boolean)].collect().toSet
    assert(run(1) == run(5))
  }

  test("threshold gates the drop: at 1.0 nothing pairs, all keep") {
    val r = Similarity.semDedup(fixture, k = 4, threshold = 1.0000001)
      .select("vec_id", "keep").as[(Long, Boolean)].collect()
    assert(r.forall(_._2))
  }
}
