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

  /** Round to 9 significant digits (tie-insensitive to 1-ulp input skew).
    *
    * Native expression (graft.functions.Sig9 via GraftExtensions), not
    * the composed when/round/pow form: the composed form references its
    * argument five times, Spark does not CSE across when() branches, and
    * predicate pushdown happily inlines the whole thing into join
    * conditions — so an expensive argument (a cosine over a dot product)
    * was evaluated 5-6x per row. The native expression evaluates its
    * child exactly once wherever it lands, bit-identically
    * (Sig9ParitySpec sweeps it; note StrictMath in GraftMath). */
  def sig9(c: Column): Column = call_function("sig9_round", c.cast("double"))

  /** Order-independent exact sum of a double column -> double (9 sig). */
  def dsum(c: Column): Column =
    sig9(sum(c.cast(DecimalType(38, 15))).cast(DoubleType))

  /** Pre-cast half of the [[dsum]] contract: double -> DECIMAL(38,15)
    * where the value is PRODUCED. Spark's double->decimal cast routes
    * through BigDecimal.valueOf, i.e. Double.toString — profiled as
    * the dominant cost of wide fan-out aggregations (ADC scoring
    * spends its single hot task in FloatingDecimal). When the summed
    * values come from a small broadcast side (a lookup table joined
    * against millions of candidate rows), casting the table ONCE and
    * summing with [[dsumPre]] removes the per-candidate conversion
    * while summing exactly the same decimal values. */
  def dec15(c: Column): Column = c.cast(DecimalType(38, 15))

  /** [[dsum]] over an already-[[dec15]]-cast column: bit-identical
    * (decimal addition is exact and order-independent, and the same
    * decimal values are summed), minus the per-row cast. */
  def dsumPre(c: Column): Column = sig9(sum(c).cast(DoubleType))

  /** [[dsum]] variant that is safe when the summed terms are GRANULAR
    * (already sig9'd, so digit positions align): such sums routinely
    * land EXACTLY on a 9-sig-digit rounding half-step, where the two
    * engines' differing DECIMAL->DOUBLE casts (1 ulp apart) tip the
    * final sig9 to adjacent values. Rounding the decimal sum to
    * `scale` decimal places IN DECIMAL SPACE first is exact and
    * engine-identical (both round half away from zero for the
    * positive values this is used on), and a decimal with <= 15
    * significant digits casts to double exactly on both engines — so
    * the value entering sig9 is bit-identical and ties cannot flip.
    * Pick `scale` so |value| * 10^scale stays under 15 digits
    * (scale=13 covers |value| < 100). */
  def dsumStable(c: Column, scale: Int): Column =
    sig9(round(sum(c.cast(DecimalType(38, 15))), scale).cast(DoubleType))

  def sqlDsumStable(expr: String, scale: Int): String =
    sqlSig9(s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,15))), $scale) " +
      "AS DOUBLE)")

  /** Stable double projection of an already-computed DECIMAL column
    * (e.g. a windowed running sum): decimal-space round to `scale`
    * places, exact cast, sig9 — the non-aggregating face of
    * [[dsumStable]], for values where |x|·10^scale stays under 15
    * digits. */
  def decOut(c: Column, scale: Int): Column =
    sig9(round(c, scale).cast(DoubleType))

  def sqlDecOut(expr: String, scale: Int): String =
    sqlSig9(s"CAST(ROUND($expr, $scale) AS DOUBLE)")

  /** Order-independent avg (null-skipping, like the oracle's SUM/COUNT). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Integer sum normalized to BIGINT. */
  def lsum(c: Column): Column = sum(c).cast(LongType)

  /** DuckDB-side portable hash (mirrors graft.ext.Hashing.hash60/hashP —
    * the cross-engine determinism contract; ONE definition, delegated to
    * by every oracle module). */
  def sqlHash60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
  def sqlHashP(e: String): String =
    s"${sqlHash60(e)} % ${graft.ext.Hashing.P}"

  /** DuckDB-side sequential double fold / dot product / squared norm
    * (mirror Similarity.dot's left-to-right fold — ONE definition of
    * the cross-engine vector-math contract). */
  def sqlFold(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), (a, b) -> a + b)"
  def sqlDot(qa: String, ca: String): String =
    sqlFold(s"list_transform(range(1, len($qa) + 1), " +
      s"i -> CAST($qa[i] AS DOUBLE) * CAST($ca[i] AS DOUBLE))")
  def sqlNsq(v: String): String =
    sqlFold(s"list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

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
