package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force all-pairs distance join (the completeness oracle). */
  private def brutePairs(pts: Seq[(Long, Double, Double)],
      r: Double): Set[(Long, Long)] =
    (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1)).toSet

  private def gridPairs(pts: Seq[(Long, Double, Double)],
      r: Double): Set[(Long, Long)] =
    Spatial.distSelfJoin(pts.toDF("id", "x", "y").repartition(5),
        "id", "x", "y", r)
      .select("a_id", "b_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet

  // deterministic scatter: clumps, a straight line, and cell-boundary
  // points (x exactly on multiples of the radius)
  private val pts: Seq[(Long, Double, Double)] =
    (1 to 150).map { i =>
      (i.toLong, (i * 37 % 83) * 13.0, (i * 59 % 71) * 17.0)
    } ++ (0 to 5).map(i => (200L + i, i * 100.0, 0.0)) // on-boundary row

  test("grid join matches brute force at several radii") {
    for (r <- Seq(50.0, 100.0, 237.5)) {
      assert(gridPairs(pts, r) === brutePairs(pts, r), s"radius $r")
    }
  }

  test("exact-radius boundary pairs are kept (<=, not <)") {
    // consecutive points in the boundary row are exactly 100 m apart
    val p = gridPairs(pts, 100.0)
    assert((0 to 4).forall(i => p.contains((200L + i, 201L + i))))
  }

  test("distance values are exact and symmetric in construction") {
    val rows = Spatial.distSelfJoin(
      Seq((1L, 0.0, 0.0), (2L, 3.0, 4.0)).toDF("id", "x", "y"),
      "id", "x", "y", 10.0).collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 5.0)
  }

  test("null coordinates and ids are dropped") {
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (1L, 0.0, 0.0), (2L, 1.0, null), (null, 2.0, 2.0), (3L, 1.0, 1.0))
      .toDF("id", "x", "y")
    val out = Spatial.distSelfJoin(df, "id", "x", "y", 5.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 3L)))
  }

  test("gridCluster: two dense blobs merge across adjacent cells, " +
      "sparse background is noise") {
    // blob A spans two adjacent cells (x in [10, 190]); blob B is far
    // away; two lone points are background noise
    val blobA = (1 to 8).map(i => (i.toLong, 10.0 + i * 22.0, 50.0))
    val blobB = (11 to 16).map(i => (i.toLong, 5000.0, 5000.0 + i * 3.0))
    val noise = Seq((50L, 9000.0, 100.0), (51L, 100.0, 9000.0))
    val asg = Spatial.gridCluster(
      (blobA ++ blobB ++ noise).toDF("id", "x", "y"),
      "id", "x", "y", cell = 100.0, minPts = 3L)
      .select("id", "cluster_id")
      .as[(Long, Option[Long])].collect().toMap
    val aLabels = blobA.map(p => asg(p._1))
    val bLabels = blobB.map(p => asg(p._1))
    assert(aLabels.forall(_.isDefined) && aLabels.distinct.size === 1,
      "blob A is one cluster")
    assert(bLabels.forall(_.isDefined) && bLabels.distinct.size === 1,
      "blob B is one cluster")
    assert(aLabels.head !== bLabels.head, "blobs stay separate")
    assert(asg(50L).isEmpty && asg(51L).isEmpty, "background is noise")
  }

  test("gridCluster: diagonal-adjacent core cells connect") {
    // two 3-point stacks in diagonally adjacent cells
    val c1 = (1 to 3).map(i => (i.toLong, 50.0, 50.0 + i))
    val c2 = (4 to 6).map(i => (i.toLong, 150.0, 150.0 + i))
    val asg = Spatial.gridCluster((c1 ++ c2).toDF("id", "x", "y"),
      "id", "x", "y", 100.0, 3L)
      .select("id", "cluster_id").as[(Long, Option[Long])].collect().toMap
    assert(asg.values.toSet.size === 1 && asg.values.head.isDefined)
  }

  test("gridCluster: minPts boundary — exactly minPts is core, " +
      "one fewer is not") {
    val atMin = (1 to 3).map(i => (i.toLong, 10.0 + i, 10.0))
    val below = (11 to 12).map(i => (i.toLong, 5000.0 + i, 5000.0))
    val asg = Spatial.gridCluster((atMin ++ below).toDF("id", "x", "y"),
      "id", "x", "y", 100.0, 3L)
      .select("id", "cluster_id").as[(Long, Option[Long])].collect().toMap
    assert(atMin.forall(p => asg(p._1).isDefined))
    assert(below.forall(p => asg(p._1).isEmpty))
  }

  test("validation: non-positive radius / cell / minPts rejected") {
    val df = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.distSelfJoin(df, "id", "x", "y", 0.0))
    intercept[IllegalArgumentException](
      Spatial.gridCluster(df, "id", "x", "y", -1.0, 3L))
    intercept[IllegalArgumentException](
      Spatial.gridCluster(df, "id", "x", "y", 100.0, 0L))
  }
}
