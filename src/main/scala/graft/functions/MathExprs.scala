package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bit-exact scalar twin of the composed 9-significant-digit rounding
  * expression in [[graft.queries.Q.sig9]]:
  *
  *   when(c.isNull || c === 0.0, c)
  *     .otherwise(round(c * pow(10, 9 - floor(log10(abs(c))))) / pow(...))
  *
  * The composed form references `c` five times and Spark does not
  * subexpression-eliminate across when() branches — so when `c` is itself
  * expensive (a cosine over a dot product) and the whole thing gets
  * inlined into a join condition by predicate pushdown, the dot product
  * is evaluated per reference. This expression evaluates its child
  * exactly ONCE no matter where the optimizer inlines it.
  *
  * Semantics parity (Sig9ParitySpec sweeps this): pow/log10/abs/floor on
  * doubles are java.lang.Math in Spark's codegen; Round(_, 0) on
  * DoubleType is BigDecimal HALF_UP with NaN/Infinity passed through.
  */
object GraftMath {
  def sig9(c: Double): Double = {
    if (c == 0.0) return c // covers -0.0 exactly like `c === 0.0`
    // StrictMath, not Math: Spark's POWER/LOG10 codegen calls StrictMath
    // (platform-independent), and Math.pow(10, 39) differs from
    // StrictMath.pow(10, 39) by 1 ulp — enough to break bit-parity with
    // the composed form (and the DuckDB oracle hash).
    val p = java.lang.StrictMath.pow(10.0,
      9.0 - java.lang.Math.floor(java.lang.StrictMath.log10(java.lang.Math.abs(c))))
    val prod = c * p
    val r =
      if (java.lang.Double.isNaN(prod) || java.lang.Double.isInfinite(prod)) prod
      else java.math.BigDecimal.valueOf(prod)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    r / p
  }
}

case class Sig9(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sig9_round needs a double input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftMath.sig9(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.sig9($c)")

  override protected def withNewChildInternal(newChild: Expression): Sig9 =
    copy(child = newChild)
}

/** Scalar twin of the Hilbert xy→d transform — ONE definition of the
  * per-level quadrant/rotation loop shared by the codegen'd
  * [[HilbertXY]] expression and any driver-side use. Bit-identical to
  * the packed-fold Column formulation it replaces on the hot path
  * (LayoutSpec pins both against the classic reference): all-integer
  * arithmetic, values above 2^bits wrap via masking. */
object GraftBits {
  def hilbertXY2D(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd Hilbert index of two long columns on the 2^bits grid —
  * the native-Expression tier of [[graft.ext.Layout.hilbertValue]]:
  * the interpreted higher-order fold costs ~6 us/row (measured, the
  * dominant cost of Hilbert clustering at sf0.1); this stays inside
  * whole-stage codegen as one static-method call per row. */
case class HilbertXY(left: Expression, right: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62,
    s"hilbert_xy: need 1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_xy needs two long inputs, got ${l.simpleString}, " +
          r.simpleString)
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    GraftBits.hilbertXY2D(x.asInstanceOf[Long], y.asInstanceOf[Long],
      bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftBits.hilbertXY2D($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertXY =
    copy(left = newLeft, right = newRight)
}
