package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force NOT-EXISTS dominance (the oracle's definition). */
  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Double)], bins: Int): Set[Long] =
    Skyline.skyline2d(pts.toDF("id", "x", "y").repartition(5),
      "id", "x", "y", bins).select("id").collect()
      .map(_.getLong(0)).toSet

  // deterministic scatter with ties on both axes and a duplicate point
  private val pts: Seq[(Long, Double, Double)] =
    (1 to 200).map { i =>
      (i.toLong, (i * 37 % 83).toDouble, (i * 59 % 71).toDouble)
    } ++ Seq((500L, 10.0, 60.0), (501L, 10.0, 60.0)) // exact duplicate

  test("matches brute-force dominance including ties and duplicates") {
    val expected = brute(pts)
    assert(run(pts, 16) === expected)
    // the duplicate pair: if one survives, both must
    assert(run(pts, 16).contains(500L) === run(pts, 16).contains(501L))
  }

  test("binning is result-invariant") {
    val expected = brute(pts)
    assert(run(pts, 1) === expected)   // all in one cell: pure pairwise
    assert(run(pts, 7) === expected)
    assert(run(pts, 512) === expected) // more cells than points
  }

  test("identical points all survive; a dominated tail all dies") {
    val same = (1L to 5L).map(i => (i, 3.0, 4.0))
    assert(run(same, 8) === (1L to 5L).toSet)
    // a strictly-better point kills the rest
    val chain = (1L to 6L).map(i => (i, i.toDouble, -i.toDouble))
    assert(run(chain, 4) === Set(1L))
  }

  test("nulls are dropped, not treated as dominators") {
    val df = Seq((1L, Some(1.0), Some(1.0)), (2L, None, Some(9.0)),
      (3L, Some(0.5), None)).toDF("id", "x", "y")
    val out = Skyline.skyline2d(df, "id", "x", "y", 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }
}
