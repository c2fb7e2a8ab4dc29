package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the oracle-checked query surface.
  *
  * Determinism contract with the DuckDB oracle (driver compares value
  * hashes): every aggregation over doubles routes through DECIMAL(38,15)
  * so the sum is exact and independent of partition/evaluation order —
  * double summation is order-dependent and a 32-thread Spark sum would
  * differ from DuckDB's sequential sum in the last ulp. This is also the
  * behavior we want at cluster scale: bit-identical results across runs
  * and topologies.
  *
  * The final DECIMAL -> DOUBLE conversion itself differs by 1 ulp between
  * engines (Spark single-rounds via BigDecimal.doubleValue; DuckDB scales
  * an int128 through double twice), so aggregate outputs are normalized to
  * 9 significant digits on both sides; all row-wise math derived from them
  * is then bit-identical. Integer outputs are always BIGINT on both sides.
  */
object Q {

  /** Round to 9 significant digits (tie-insensitive to 1-ulp input skew). */
  def sig9(c: Column): Column = {
    val p = pow(lit(10.0), lit(9) - floor(log10(abs(c))))
    when(c.isNull || c === 0.0, c).otherwise(round(c * p) / p)
  }

  /** Order-independent exact sum of a double column -> double (9 sig). */
  def dsum(c: Column): Column =
    sig9(sum(c.cast(DecimalType(38, 15))).cast(DoubleType))

  /** Order-independent avg (null-skipping, like the oracle's SUM/COUNT). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Integer sum normalized to BIGINT. */
  def lsum(c: Column): Column = sum(c).cast(LongType)

  /** DuckDB-side equivalents (string builders for oracle SQL). */
  def sqlSig9(e: String): String =
    s"(CASE WHEN ($e) IS NULL OR ($e) = 0 THEN ($e) ELSE " +
    s"ROUND(($e) * power(10, 9 - FLOOR(LOG10(ABS($e))))) / " +
    s"power(10, 9 - FLOOR(LOG10(ABS($e)))) END)"
  def sqlDsum(expr: String): String =
    sqlSig9(s"CAST(SUM(CAST(($expr) AS DECIMAL(38,15))) AS DOUBLE)")
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT($expr))"
}
