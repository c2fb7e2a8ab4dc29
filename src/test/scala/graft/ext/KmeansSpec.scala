package graft.ext

import graft.SparkSpec
import graft.functions.GraftMath
import org.apache.spark.sql.functions._

/** Lloyd k-means ([[Similarity.kmeans]]): deterministic id-order init,
  * fixed-IEEE assignment distances with smallest-cid ties, sig9(dsum/n)
  * centroid updates, empty-cluster carryover — replayed locally. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def s9(x: Double) = GraftMath.sig9(x)

  /** Local replica of the documented trajectory. Returns
    * (centers, sizes of the final assignment). */
  private def ref(pts: Seq[(Long, Seq[Float])], k: Int, iters: Int)
      : (Map[Long, Seq[Double]], Map[Long, Long]) = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def mean(xs: Seq[Double]): Double = {
      val sum = xs.map(x =>
        BigDecimal(x).setScale(15, BigDecimal.RoundingMode.HALF_UP)).sum
      s9(s9(sum.toDouble) / xs.size)
    }
    var centers: Map[Long, Seq[Double]] = pts.sortBy(_._1).take(k)
      .zipWithIndex.map { case ((_, v), i) =>
        i.toLong -> v.map(_.toDouble)
      }.toMap
    var sizes = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val assigned = pts.map { case (_, vf) =>
        val v = vf.map(_.toDouble)
        val cid = centers.toSeq.sortBy(_._1).map { case (cid, c) =>
          ((dot(v, v) + dot(c, c)) - 2.0 * dot(v, c), cid)
        }.min._2
        (cid, v)
      }
      sizes = assigned.groupBy(_._1).map { case (c, g) =>
        c -> g.size.toLong
      }
      centers = centers.map { case (cid, prev) =>
        val mine = assigned.filter(_._1 == cid).map(_._2)
        cid -> (if (mine.isEmpty) prev
                else prev.indices.map(d => mean(mine.map(_(d)))))
      }
    }
    (centers, sizes)
  }

  private def run(pts: Seq[(Long, Seq[Float])], k: Int, iters: Int,
      parts: Int = 3) = Similarity.kmeans(
    pts.toDF("vec_id", "embedding").repartition(parts),
    "vec_id", "embedding", k, iters)

  test("two separated blobs: centroids land on the exact blob means, " +
      "every coordinate matching the sig9(dsum/n) replica") {
    val pts = Seq[(Long, Seq[Float])](
      1L -> Seq(0.1f, 0.2f), 2L -> Seq(10.0f, 10.1f),
      3L -> Seq(0.3f, 0.0f), 4L -> Seq(9.8f, 10.3f),
      5L -> Seq(0.2f, 0.1f), 6L -> Seq(10.2f, 9.9f))
    val got = run(pts, k = 2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val (cents, sizes) = ref(pts, 2, 3)
    for ((cid, cv) <- cents; (x, d) <- cv.zipWithIndex) {
      assert(got((cid, d.toLong))._1 == x, s"cid=$cid dim=$d")
      assert(got((cid, d.toLong))._2 == sizes(cid))
    }
    assert(sizes(0L) == 3L && sizes(1L) == 3L)
  }

  test("duplicate init vectors: ties go to the smallest cid, the " +
      "starved cluster reports n_assigned 0 and keeps its centroid") {
    // cluster 0's mean stays exactly on the shared init point, so the
    // duplicate center can never win a tie back in any round
    val pts = Seq[(Long, Seq[Float])](
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.0f, 0.0f),
      3L -> Seq(8.0f, 8.0f), 4L -> Seq(8.5f, 8.0f))
    val got = run(pts, k = 3, iters = 2).collect()
    val byCid = got.groupBy(_.getLong(0))
    // cid 1 duplicates cid 0's init -> every point ties to cid 0 first
    assert(byCid(1L).forall(_.getLong(3) == 0L))
    assert(byCid(1L).map(r => r.getLong(1) -> r.getDouble(2)).toMap ==
      Map(0L -> 0.0, 1L -> 0.0)) // carryover, never respawned
    assert(byCid(0L).head.getLong(3) == 2L)
    assert(byCid(2L).head.getLong(3) == 2L)
  }

  test("pseudo-random points: engine == replica and partition-invariant") {
    val pts = (1 to 97).map { i =>
      (i.toLong, Seq(((i * 7919) % 23).toFloat / 7f,
        ((i * 104729) % 19).toFloat / 5f, ((i * 31) % 11).toFloat))
    }
    val (cents, sizes) = ref(pts, 4, 3)
    for (parts <- Seq(1, 7)) {
      val got = run(pts, k = 4, iters = 3, parts).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getLong(3))).toMap
      for ((cid, cv) <- cents; (x, d) <- cv.zipWithIndex) {
        assert(got((cid, d.toLong))._1 == x, s"parts=$parts cid=$cid d=$d")
        assert(got((cid, d.toLong))._2 == sizes.getOrElse(cid, 0L))
      }
    }
  }
}
