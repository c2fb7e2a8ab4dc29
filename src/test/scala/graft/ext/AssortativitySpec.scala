package graft.ext

import graft.SparkSpec

class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def assort(edges: (Long, Long)*) =
    Graph.assortativity(edges.toDF("a", "b"), "a", "b").collect()(0)

  test("star graph is maximally disassortative (r = -1)") {
    val out = assort((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(out.getLong(0) === 5L) // nodes
    assert(out.getLong(1) === 4L) // edges
    assert(out.getDouble(2) === 1.6) // mean degree 8/5
    assert(out.getLong(3) === 4L) // max degree
    assert(math.abs(out.getDouble(4) - (-1.0)) < 1e-9)
  }

  test("a regular graph has degenerate (NULL) assortativity") {
    // 4-cycle: every degree is 2, zero variance
    val out = assort((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(out.isNullAt(4))
    assert(out.getDouble(2) === 2.0)
  }

  test("duplicate, reversed and self edges normalize away") {
    val out = assort((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
    // simple graph: 1-2, 2-3 (self loop dropped)
    assert(out.getLong(1) === 2L)
    assert(out.getLong(0) === 3L)
    // path graph P3: stubs (1,2),(2,1),(2,3),(3,2) degrees
    // (1,2),(2,1),(2,1),(1,2): r = -1
    assert(math.abs(out.getDouble(4) - (-1.0)) < 1e-9)
  }
}
