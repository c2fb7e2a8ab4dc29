package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_g10_cube semantics: the full grouping lattice with the grouping
  * id distinguishing subtotal NULLs from data NULLs (first cube column
  * = MSB, the cross-engine bit-order contract). */
class CubeSpec extends SparkSpec {
  import spark.implicits._

  test("cube emits all four grouping sets; gid separates data NULLs " +
      "from subtotal NULLs") {
    val df = Seq(
      (Some("A"), "x", 1L), (Some("A"), "y", 2L),
      (None, "x", 4L)) // a data NULL in the first dim
      .toDF("f", "s", "q")
    val got = df.cube(col("f"), col("s"))
      .agg(sum(col("q")).cast("long").as("sq"),
        grouping_id().cast("long").as("gid"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    // detail rows: gid 0 — including the (NULL, x) DATA row
    assert(got.contains((Some("A"), Some("x"), 1L, 0L)))
    assert(got.contains((None, Some("x"), 4L, 0L)))
    // first-dim subtotal rows: gid 2 (MSB = first cube column)
    assert(got.contains((None, Some("x"), 5L, 2L)))
    assert(got.contains((None, Some("y"), 2L, 2L)))
    // second-dim subtotals: gid 1; grand total: gid 3
    assert(got.contains((Some("A"), None, 3L, 1L)))
    assert(got.contains((None, None, 4L, 1L))) // data-NULL group subtotal
    assert(got.contains((None, None, 7L, 3L)))
    // the lattice is complete: 2^2 grouping sets present
    assert(got.map(_._4) === Set(0L, 1L, 2L, 3L))
  }
}
