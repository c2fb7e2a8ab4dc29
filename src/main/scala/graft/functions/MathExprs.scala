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
