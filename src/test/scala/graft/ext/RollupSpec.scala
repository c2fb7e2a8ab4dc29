package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Double)*): DataFrame = rows.toDF("k", "v")

  private def reportMap(state: DataFrame)
      : Map[String, (Long, Double, Double, Double, Double)] =
    Rollup.report(state, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

  test("merge of two batch states == state of the union, exactly") {
    val all = Seq(("a", 1.1), ("a", 2.2), ("a", 0.3), ("b", 5.0),
      ("b", -1.5), ("c", 7.25))
    val (b1, b2) = all.splitAt(3)
    val merged = Rollup.mergeStates(
      Rollup.aggState(ev(b1: _*), Seq("k"), "v"),
      Rollup.aggState(ev(b2: _*), Seq("k"), "v"), Seq("k"))
    val direct = Rollup.aggState(ev(all: _*), Seq("k"), "v")
    assert(reportMap(merged) === reportMap(direct))
  }

  test("merge is batch-split invariant (decimal sums, any cut)") {
    val all = (1 to 30).map(i => (s"k${i % 3}", i * 0.1 + 0.01))
    val direct = reportMap(Rollup.aggState(ev(all: _*), Seq("k"), "v"))
    Seq(1, 7, 15, 29).foreach { cut =>
      val (x, y) = all.splitAt(cut)
      val m = Rollup.mergeStates(
        Rollup.aggState(ev(x: _*), Seq("k"), "v"),
        Rollup.aggState(ev(y: _*), Seq("k"), "v"), Seq("k"))
      assert(reportMap(m) === direct, s"cut $cut")
    }
  }

  test("keys unique to one batch survive the merge") {
    val m = Rollup.mergeStates(
      Rollup.aggState(ev(("only1", 3.0)), Seq("k"), "v"),
      Rollup.aggState(ev(("only2", 4.0)), Seq("k"), "v"), Seq("k"))
    val r = reportMap(m)
    assert(r("only1") === ((1L, 3.0, 3.0, 3.0, 3.0)))
    assert(r("only2") === ((1L, 4.0, 4.0, 4.0, 4.0)))
  }

  test("report derives avg as sig9(sum)/n and carries min/max") {
    val r = reportMap(Rollup.aggState(
      ev(("a", 1.0), ("a", 2.0), ("a", 6.0)), Seq("k"), "v"))
    assert(r("a") === ((3L, 9.0, 1.0, 6.0, 3.0)))
  }
}
