package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Double, Long)*) =
    rows.toDF("id", "q", "ntok")

  private def run(budget: Long, rows: (Long, Double, Long)*) =
    Sampling.budgetSelect(docs(rows: _*), "id", "q", "ntok", budget)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getBoolean(3))).toSet

  test("whole score groups fit first; the boundary group fills by id") {
    // scores 3.0 (10+10 tokens), 2.0 (10+10), 1.0 (10)
    val rows = Seq(
      (1L, 3.0, 10L), (2L, 3.0, 10L),
      (3L, 2.0, 10L), (4L, 2.0, 10L),
      (5L, 1.0, 10L))
    // budget 30: group 3.0 fits fully (20); boundary group 2.0 has
    // remaining 10 -> doc 3 only (id order); group 1.0 untouched
    assert(run(30L, rows: _*) === Set(
      (1L, 3.0, 10L, false), (2L, 3.0, 10L, false),
      (3L, 2.0, 10L, true)))
  }

  test("ties never split arbitrarily: id order decides inside the " +
      "boundary score") {
    val rows = Seq((7L, 5.0, 4L), (3L, 5.0, 4L), (9L, 5.0, 4L))
    // budget 8 -> boundary group is the only group; ids 3 then 7 fit
    assert(run(8L, rows: _*) === Set(
      (3L, 5.0, 4L, true), (7L, 5.0, 4L, true)))
  }

  test("budget covering everything selects everything; zero budget " +
      "selects nothing") {
    val rows = Seq((1L, 1.0, 5L), (2L, 2.0, 5L))
    assert(run(100L, rows: _*).map(_._1) === Set(1L, 2L))
    assert(run(0L, rows: _*) === Set.empty)
  }

  test("selection equals the naive reference on a pseudo-random corpus " +
      "and is partition-invariant") {
    val rows = (1L to 300L).map { i =>
      (i, ((i * 13) % 17).toDouble, (i * 7) % 23 + 1)
    }
    val budget = 800L
    // naive: sort groups by score desc; take whole groups while they
    // fit; fill the boundary group by ascending id
    val byScore = rows.groupBy(_._2).toSeq.sortBy(-_._1)
    var left = budget
    val expect = Set.newBuilder[(Long, Double, Long, Boolean)]
    var boundaryDone = false
    byScore.foreach { case (s, g) =>
      val tot = g.map(_._3).sum
      if (!boundaryDone && tot <= left) {
        g.foreach(r => expect += ((r._1, s, r._3, false)))
        left -= tot
      } else if (!boundaryDone) {
        var rb = left
        g.sortBy(_._1).foreach { r =>
          if (r._3 <= rb) { expect += ((r._1, s, r._3, true)); rb -= r._3 }
          else rb = -1 // stop: prefix must be contiguous
        }
        boundaryDone = true
      }
    }
    val got = run(budget, rows: _*)
    assert(got === expect.result())
    val got2 = Sampling.budgetSelect(
      docs(rows: _*).repartition(7), "id", "q", "ntok", budget)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got2 === got)
  }

  test("quantile bins: ties share a bin and bins are equi-depth") {
    val df = ((1 to 40).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(_ => ("b", 7.0)))
      .toDF("g", "v")
    val bins = Profile.equiDepthBins(df, Seq("g"), "v", bins = 4)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(4)).toMap
    // group a: 40 distinct values -> 10 per quartile bin
    assert(bins(("a", 1.0)) == 0L && bins(("a", 10.0)) == 0L)
    assert(bins(("a", 11.0)) == 1L && bins(("a", 20.0)) == 1L)
    assert(bins(("a", 21.0)) == 2L && bins(("a", 31.0)) == 3L)
    assert(bins(("a", 40.0)) == 3L)
    // group b: one massive tie -> everything in bin 0, never split
    assert(bins(("b", 7.0)) == 0L)
  }
}
