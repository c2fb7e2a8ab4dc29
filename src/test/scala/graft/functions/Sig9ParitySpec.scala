package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native sig9_round expression must be BIT-identical to the
  * composed when/round/pow form it replaces — the whole oracle-parity
  * contract (Q.scala) rides on it. Sweep: random doubles across
  * magnitudes, negatives, denormals, exact halves, NaN/Inf. */
class Sig9ParitySpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: Column): Column = {
    val p = pow(lit(10.0), lit(9) - floor(log10(abs(c))))
    when(c.isNull || c === 0.0, c).otherwise(round(c * p) / p)
  }

  test("native sig9_round == composed expression, bit for bit") {
    // NaN/Inf excluded here: the COMPOSED form throws under ANSI on
    // +-Inf (floor/divide edge), while the native one totalizes to NaN
    // — covered by the interpreted-eval test below.
    val rnd = new scala.util.Random(20260812L)
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](null, 0.0, -0.0, 1.0, -1.0,
        Double.MinPositiveValue, Double.MaxValue,
        1.2345678949999999, 0.99, 123456789.5, -123456789.5) ++
        (1 to 200000).map { _ =>
          val mag = math.pow(10.0, rnd.nextInt(61) - 30)
          java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 2 * mag)
        }
    val df = vals.toDF("c")
    val rows = df.select(col("c"),
      call_function("sig9_round", col("c")).as("native"),
      composed(col("c")).as("comp")).collect()
    // bitwise compare so NaN==NaN holds and 0.0 vs -0.0 differs
    val bad = rows.filter { r =>
      val bn = if (r.isNullAt(1)) -1L
        else java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      val bc = if (r.isNullAt(2)) -1L
        else java.lang.Double.doubleToRawLongBits(r.getDouble(2))
      bn != bc
    }
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("interpreted eval matches codegen") {
    // exercise nullSafeEval directly on the same edge values
    for (v <- Seq(0.0, -0.0, 1.0, -1.2345678949999999, 123456789.5,
        Double.NaN, Double.PositiveInfinity, 1e-300, -1e300)) {
      val viaExpr = spark.sql(s"SELECT sig9_round(CAST('$v' AS DOUBLE))")
        .head.getDouble(0)
      assert(java.lang.Double.doubleToRawLongBits(viaExpr) ==
        java.lang.Double.doubleToRawLongBits(GraftMath.sig9(v)) ||
        (viaExpr.isNaN && GraftMath.sig9(v).isNaN))
    }
  }
}
