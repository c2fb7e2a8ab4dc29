package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity operators.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a
  * HigherOrderFunction chain: CodegenFallback, per-element closure calls,
  * and two materialized intermediate arrays per row. This expression
  * computes the same LEFT-TO-RIGHT double sum (bit-identical results, so
  * the DuckDB list_reduce oracle still matches) in one codegen'd loop over
  * the unsafe array data — no allocation, no virtual calls. On a 100 TB
  * scan the dot product is the innermost loop of every ANN/near-dup
  * operator, so this is the difference between scan-bound and
  * interpreter-bound.
  *
  * Accepts float or double arrays on either side (floats are widened
  * exactly, as the fold's `x.cast("double")` did). NULL if either side or
  * any touched element is NULL; arrays may differ in length (the shorter
  * prefix is used — zip_with-with-nulls semantics are NOT reproduced;
  * callers use equal-length vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  /** Unlike the BinaryExpression default, this can be NULL with non-null
    * inputs: a NULL *element* nulls the product. Declaring that here is
    * load-bearing for codegen — with nullable=false, nullSafeCodeGen never
    * declares ev.isNull, and a resultCode that assigns it generates
    * uncompilable Java (silent interpreted fallback for the whole stage). */
  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // Touch ev.isNull ONLY when elements can be null (then nullable is
      // true and ev.isNull is a declared variable); with containsNull
      // false on both sides the check is dead code and the loop is a
      // branch-free multiply-add.
      val body =
        if (mayHaveNullElements)
          s"""
             |for (int $i = 0; $i < $n; $i++) {
             |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
             |  $acc += ((double) $x.$lGet($i)) * ((double) $y.$rGet($i));
             |}
             |if (!${ev.isNull}) { ${ev.value} = $acc; }
           """.stripMargin
        else
          s"""
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += ((double) $x.$lGet($i)) * ((double) $y.$rGet($i));
             |}
             |${ev.value} = $acc;
           """.stripMargin
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |$body
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED long arrays (distinct
  * elements, no NULL elements) — a codegen'd merge walk. The Jaccard
  * verify stage over shingle-hash sets is intersect/union-bound;
  * `array_intersect`+`array_union` each build a per-call hash set, while
  * the merge walk is branch-predictable O(n+m) with zero allocation, and
  * |union| falls out as |a|+|b|-|intersect|. Inputs MUST be sorted
  * ascending (signature builders sort once at aggregation time).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED distinct long arrays in ONE
  * evaluation: |I| by merge walk, |U| = |a|+|b|-|I|, empty-union => 0.0.
  * Exists as a single expression for the same reason as Sig9: the
  * composed form references the merge walk three times, and predicate
  * pushdown inlines threshold filters into join conditions — tripling
  * the verify cost of every LSH candidate pair. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard needs array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val u = nx.toLong + ny.toLong - c
    if (u == 0L) 0.0 else c.toDouble / u
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |long $u = (long) $x.numElements() + (long) $y.numElements() - $c;
         |${ev.value} = ($u == 0L) ? 0.0 : ((double) $c) / $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for the native expressions. These resolve through the
    * function registry, so the session must carry [[graft.GraftExtensions]]
    * (`spark.sql.extensions=graft.GraftExtensions`). */
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  def sortedJaccard(a: Column, b: Column): Column =
    call_function("sorted_jaccard", a, b)

  /** Membership probe against a serialized bloom filter (binary literal)
    * — Spark's own BloomFilterMightContain, codegen'd. */
  def bloomMightContain(bloomBytes: Column, value: Column): Column =
    call_function("bloom_might_contain", bloomBytes, value)
}
