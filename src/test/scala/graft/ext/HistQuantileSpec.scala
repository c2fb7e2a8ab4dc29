package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def data(shards: Int) =
    (1 to 100).map(i => (i.toDouble, "s" + (i % shards))).toDF("x", "sh")

  test("sharded build merges to the direct histogram (merge law)") {
    val one = Sketch.histSketch(data(1), "x", "sh", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val three = Sketch.histSketch(data(3), "x", "sh", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === three)
    // 1..9 in bin 0; 10..19 in bin 1; ...; 100 clamps into bin 9
    assert(one(0L) === 9L)
    assert(one(9L) === 11L)
  }

  test("quantiles interpolate inside the hit bin with the error bound") {
    val sk = Sketch.histSketch(data(4), "x", "sh", 0.0, 100.0, 10)
    val out = Sketch.histQuantiles(sk, Seq(500, 990), 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // p50: cum by bin 9,19,...,49 then bin5 hits (59 >= 50):
    // frac (50-49)/10 = 0.1 -> 10*(5+0.1) = 51.0; truth 50.5, err <= 5
    assert(out(500L) === ((100L, 5L, 51.0, 5.0)))
    // p99: target 99; cums ... bin8: 89, bin9: 100 -> hit bin9,
    // frac (99-89)/11 -> est = 10*(9 + 10/11)
    val (n, bin, est, err) = out(990L)
    assert((n, bin, err) === ((100L, 9L, 5.0)))
    assert(math.abs(est - 10.0 * (9.0 + 10.0 / 11.0)) < 1e-6)
  }

  test("out-of-range values clamp to edge bins instead of erroring") {
    val df = Seq((-5.0, "a"), (500.0, "a"), (50.0, "a")).toDF("x", "sh")
    val sk = Sketch.histSketch(df, "x", "sh", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk === Map(0L -> 1L, 9L -> 1L, 5L -> 1L))
  }

  test("a quantile that lands exactly on a bin boundary stays exact") {
    // 10 values, p100 -> the last populated bin with frac 1
    val df = (1 to 10).map(i => (i.toDouble, "s")).toDF("x", "sh")
    val sk = Sketch.histSketch(df, "x", "sh", 0.0, 10.0, 5)
    val out = Sketch.histQuantiles(sk, Seq(1000), 0.0, 10.0, 5)
      .collect()(0)
    assert(out.getLong(2) === 4L)
    assert(out.getDouble(3) === 10.0) // lo + 2*(4+1)
  }
}
