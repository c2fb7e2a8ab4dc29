package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The jaro_winkler contract: the scalar kernel reproduces the
  * published Winkler (1990) values and the rapidfuzz/DuckDB edge
  * conventions (match window floor(max/2)-1, half transpositions,
  * boost only above 0.7, prefix cap 4), and the codegen'd expression
  * equals the kernel row for row. */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-12

  test("jaroWinkler kernel matches the published reference values") {
    assert(approx(GraftText.jaroWinkler("MARTHA", "MARHTA"),
      0.9611111111111111))
    assert(approx(GraftText.jaroWinkler("DIXON", "DICKSONX"),
      0.8133333333333332))
    assert(approx(GraftText.jaroWinkler("JELLYFISH", "SMELLYFISH"),
      0.8962962962962964))
    assert(approx(GraftText.jaroWinkler("DUANE", "DWAYNE"), 0.84))
    assert(GraftText.jaroWinkler("same", "same") === 1.0)
    assert(GraftText.jaroWinkler("abc", "") === 0.0)
    assert(GraftText.jaroWinkler("", "") === 1.0) // equal fast path
    assert(GraftText.jaroWinkler("a", "b") === 0.0)
  }

  test("boost applies only above jaro 0.7 (rapidfuzz convention)") {
    // jaro = 0.5 with common prefix 2: boosted would be 0.6
    assert(GraftText.jaroWinkler("abqqqqqq", "abzzzzzz") === 0.5)
    // jaro > 0.7 with prefix 1 boosts
    assert(approx(GraftText.jaroWinkler("DUANE", "DWAYNE"),
      0.8222222222222223 + 0.1 * (1 - 0.8222222222222223)))
  }

  test("expression equals the kernel through codegen") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("x", "xyz"), ("aaaaaab", "aaaaaba"), ("ab", "ba"))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        call_function("jaro_winkler", col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) ===
        GraftText.jaroWinkler(r.getString(0), r.getString(1)))
    }
  }

  test("null inputs yield null") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    val r = df.select(
      call_function("jaro_winkler", col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
