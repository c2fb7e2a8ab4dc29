package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar string-similarity kernels shared by the native expression and
  * any plain-Scala caller (specs adjudicate against this directly).
  *
  * The arithmetic ORDER is part of the cross-engine contract: DuckDB's
  * `jaro_winkler_similarity` (a rapidfuzz port) computes
  * (m/|a| + m/|b| + (m − t)/m) / 3 with the same match window
  * floor(max/2) − 1 and half-transposition count, and boosts only when
  * jaro > 0.7 with prefix cap 4 and weight 0.1 — verified BIT-identical
  * against DuckDB across the standard (Winkler 1990) test pairs plus a
  * short-string edge battery before this port was written. sig9 at the
  * query layer then makes any residual last-ulp skew unobservable.
  */
object GraftText {

  /** Jaro similarity (Jaro 1989), rapidfuzz/DuckDB-compatible. */
  def jaroSimilarity(a: String, b: String): Double = {
    if (a == b) return 1.0
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val mw = math.max(l1, l2) / 2 - 1
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - mw)
      val hi = math.min(l2, i + mw + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!f2(j) && b.charAt(j) == a.charAt(i)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val t2 = t / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t2).toDouble / m) / 3.0
  }

  /** Jaro–Winkler (Winkler 1990): prefix boost (cap 4, weight 0.1)
    * applied only when jaro > 0.7 — the rapidfuzz/DuckDB convention. */
  def jaroWinkler(a: String, b: String): Double = {
    val d = jaroSimilarity(a, b)
    if (d > 0.7) {
      val max = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < max && a.charAt(l) == b.charAt(l)) l += 1
      d + l * 0.1 * (1.0 - d)
    } else d
  }

  /** UTF8String entry point for codegen (one static call per row). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)
}

/** Codegen'd Jaro–Winkler similarity of two string columns — the
  * linkage-scoring primitive (`jaro_winkler(a, b)`): stays inside
  * whole-stage codegen as one static-method call per candidate pair,
  * where a Scala UDF would break the codegen span and pay
  * serialization per row. */
case class JaroWinkler(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two string inputs, got ${l.simpleString}, " +
          r.simpleString)
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftText.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftText.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
