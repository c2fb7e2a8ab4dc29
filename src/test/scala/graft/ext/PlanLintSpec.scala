package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 100L).map(i => (i, s"g${i % 5}", i * 2))
    .toDF("id", "grp", "v")

  test("global-order window over raw rows is flagged as an error") {
    val bad = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"))))
    val checks = PlanLint.findings(bad).map(f => f.check -> f.severity)
    assert(checks.contains("global-window" -> "error"))
    assert(!PlanLint.clean(bad))
  }

  test("cartesian product is flagged; keyed join is not") {
    val d = df
    val other = (1L to 10L).toDF("k")
    val cart = d.crossJoin(other.hint("shuffle_replicate_nl"))
    assert(PlanLint.findings(cart)
      .exists(f => f.check == "cartesian-product" && f.severity == "error"))
    val keyed = d.join(other, d("id") === other("k"))
    assert(PlanLint.clean(keyed))
  }

  test("partitioned windows and aggregates lint clean with shuffle count") {
    val good = df.groupBy("grp").agg(sum("v").as("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("s"))))
    val fs = PlanLint.findings(good)
    assert(PlanLint.clean(good))
    val info = fs.filter(_.check == "shuffle-count")
    assert(info.size == 1 && info.head.severity == "info")
  }

  test("post-execution (materialized AQE stages) still lints dirty") {
    val d = df
    val other = (1L to 10L).toDF("k")
    val cart = d.crossJoin(other.hint("shuffle_replicate_nl"))
      .groupBy("grp").count()
    cart.collect() // AQE materializes stages; subtree moves off children
    assert(PlanLint.findings(cart)
      .exists(f => f.check == "cartesian-product"), "stage walk lost it")
  }

  test("findings are not duplicated through the adaptive root") {
    val bad = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"))))
    val gw = PlanLint.findings(bad).filter(_.check == "global-window")
    assert(gw.size == 1, s"expected one finding, got ${gw.size}")
  }

  test("lint output is a composable DataFrame") {
    val out = PlanLint.lint(df.groupBy("grp").count())
    assert(out.columns.toSeq ==
      Seq("check", "severity", "node", "detail"))
    assert(out.filter(col("severity") === "error").count() == 0)
  }
}
