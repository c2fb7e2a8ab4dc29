package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterRepSpec extends SparkSpec {
  import spark.implicits._

  test("representative is the best-scoring member, not the smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "score")
    val r = Dedup.clusterRepresentatives(clusters, scores)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t._4).toMap
    // cluster 1: doc 2 wins on score (min-id would pick doc 1)
    assert(r == Map(1L -> false, 2L -> true, 3L -> false,
      10L -> true, 11L -> false)) // cluster 10: tie 4/4 -> smaller id
  }

  test("string ids work (no arithmetic tie-break)") {
    val clusters = Seq(("u-b", 1L), ("u-a", 1L), ("u-c", 1L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq(("u-b", 5L), ("u-a", 5L), ("u-c", 2L))
      .toDF("doc_id", "score")
    val r = Dedup.clusterRepresentatives(clusters, scores)
      .as[(String, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t._4).toMap
    // tie on score 5 -> lexicographically smaller id wins
    assert(r == Map("u-a" -> true, "u-b" -> false, "u-c" -> false))
  }

  test("partially scored clusters: unscored members stay in the " +
      "ledger as worst; all-unscored clusters fall back to min id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_id")
    // doc 2 (the would-be score winner's rival) and all of cluster 10
    // are unscored
    val scores = Seq((1L, 5L), (3L, 7L)).toDF("doc_id", "score")
    val r = Dedup.clusterRepresentatives(clusters, scores)
      .as[(Long, Long, Option[Long], Boolean)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(r.size == 5, "no member may vanish from the keep/drop ledger")
    assert(r(2L) == ((None, false)), "unscored member is never rep")
    assert(r(3L) == ((Some(7L), true)), "best SCORED member wins")
    assert(r(1L) == ((Some(5L), false)))
    // all-unscored cluster: min id represents it
    assert(r(10L) == ((None, true)) && r(11L) == ((None, false)))
  }

  test("every cluster keeps exactly one representative") {
    val clusters = (1L to 30L).map(i => (i, i % 5)).toDF("doc_id", "cluster_id")
    val scores = (1L to 30L).map(i => (i, (i * 7) % 11)).toDF("doc_id", "score")
    val kept = Dedup.clusterRepresentatives(clusters, scores)
      .filter(col("keep")).groupBy("cluster_id").count()
      .as[(Long, Long)].collect()
    assert(kept.length == 5 && kept.forall(_._2 == 1L))
  }
}
