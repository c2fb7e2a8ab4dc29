package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QSpec extends SparkSpec {
  import spark.implicits._

  test("sig9 truncates mantissa digits, passes null/zero through") {
    // contract: p = 10^(9 - floor(log10|x|)) keeps 10 significant digits;
    // what matters is that sqlSig9 implements the IDENTICAL formula.
    val r = Seq(
      Some(123456789.123), Some(0.000123456789123), Some(0.0), None)
      .toDF("v").select(Q.sig9(col("v"))).as[Option[Double]].collect()
    assert(r(0).contains(123456789.1))
    assert(r(1).contains(1.234567891e-4))
    assert(r(2).contains(0.0))
    assert(r(3).isEmpty)
  }

  test("dsum is exact and partition-order independent") {
    // doubles that lose bits under naive left-to-right summation
    val vals = Seq.fill(1000)(Seq(1e15, 3.25, -1e15)).flatten
    val one = vals.toDF("v").repartition(1)
      .agg(Q.dsum(col("v"))).as[Double].head()
    val many = vals.toDF("v").repartition(7)
      .agg(Q.dsum(col("v"))).as[Double].head()
    assert(one == many)
    assert(one == 3250.0)
  }

  test("davg null-skips like the oracle's SUM/COUNT") {
    val r = Seq(Some(2.0), None, Some(4.0)).toDF("v")
      .agg(Q.davg(col("v"))).as[Double].head()
    assert(r == 3.0)
  }
}
