package graft.ext

import graft.SparkSpec

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], comm: Seq[(Long, Long)]) =
    Graph.modularity(edges.toDF("a", "b"), "a", "b",
      comm.toDF("node", "cm"), "node", "cm")

  test("two disconnected triangles under the perfect partition") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val comm = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L)
    val rows = run(edges, comm).collect()
    assert(rows.length === 2)
    val r = rows.head
    // per community: members 3, intra 3, degree mass 6, m = 6
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 3L)
    assert(r.getLong(3) === 6L)
    // contribution = 3/6 - (6/12)^2 = 0.25; Q = 0.5
    assert(rows.forall(_.getDouble(4) === 0.25))
    assert(rows.forall(_.getDouble(6) === 0.5))
  }

  test("everything in one community has Q = 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val comm = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L)
    val rows = run(edges, comm).collect()
    assert(rows.length === 1)
    // 3/3 - (6/6)^2 = 0
    assert(rows.head.getDouble(6) === 0.0)
  }

  test("a cut straight through every edge gives negative Q") {
    // path 1-2, communities {1} and {2}: no intra edges
    val rows = run(Seq((1L, 2L)), Seq(1L -> 1L, 2L -> 2L)).collect()
    assert(rows.forall(_.getLong(2) === 0L))
    assert(rows.head.getDouble(6) === -0.5)
  }

  test("duplicate and reversed edges collapse before counting") {
    val rows = run(Seq((1L, 2L), (2L, 1L), (1L, 2L)),
      Seq(1L -> 1L, 2L -> 1L)).collect()
    assert(rows.head.getLong(5) === 1L) // m_edges
    assert(rows.head.getLong(2) === 1L) // intra
  }
}
