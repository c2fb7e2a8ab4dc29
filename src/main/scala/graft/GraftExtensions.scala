package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import graft.functions.{DotProduct, MisraGries, Sig9, SortedIntersectCount, SortedJaccard}

/** Engine extensions, registered the public way
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`): native expressions the
  * built-in surface can't express efficiently —
  *  - `dot_product`: codegen'd vector dot product (similarity operators);
  *  - `sorted_intersect_count`: codegen'd merge-walk set intersection
  *    (Jaccard verify over shingle-hash sets);
  *  - `bloom_might_contain`: Spark's own runtime-filter membership
  *    expression, exposed so BloomPrune probes stay codegen'd.
  */
object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder

  private[graft] def entries: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children.head, children(1))),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    (new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children.head, children(1))),
    (new FunctionIdentifier("sig9_round"),
      new ExpressionInfo(classOf[Sig9].getName, "sig9_round"),
      (children: Seq[Expression]) => Sig9(children.head)),
    (new FunctionIdentifier("hilbert_xy"),
      new ExpressionInfo(classOf[graft.functions.HilbertXY].getName,
        "hilbert_xy"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        if (children.length != 3)
          throw new IllegalArgumentException(
            s"hilbert_xy(x, y, bits) takes 3 arguments, got ${children.length}")
        val bits = children(2)
        val integral = Seq(ByteType, ShortType, IntegerType, LongType)
        if (!bits.foldable || !integral.contains(bits.dataType))
          throw new IllegalArgumentException(
            "hilbert_xy(x, y, bits): bits must be an integer literal")
        graft.functions.HilbertXY(children.head, children(1),
          bits.eval().asInstanceOf[Number].intValue())
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
        "jaro_winkler"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"jaro_winkler(a, b) takes 2 arguments, got ${children.length}")
        graft.functions.JaroWinkler(children.head, children(1))
      }),
    (new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (children: Seq[Expression]) =>
        SortedJaccard(children.head, children(1))),
    (new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (children: Seq[Expression]) => {
        // validate up front: a column reference or string literal here
        // would otherwise surface as an unbound-attribute NPE / CCE
        // deep in planning with no mention of the function
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"misra_gries(tok, capacity) takes 2 arguments, got ${children.length}")
        if (children.head.resolved && children.head.dataType != StringType)
          throw new IllegalArgumentException(
            "misra_gries(tok, capacity): tok must be a string column, got " +
              children.head.dataType.simpleString)
        val cap = children(1)
        val integral = Seq(ByteType, ShortType, IntegerType, LongType)
        if (!cap.foldable || !integral.contains(cap.dataType))
          throw new IllegalArgumentException(
            "misra_gries(tok, capacity): capacity must be an integer literal")
        MisraGries(children.head,
          cap.eval().asInstanceOf[Number].intValue())
      }))

  /** Late registration into an already-built session, for callers that
    * did not set spark.sql.extensions — the query surface depends on
    * these functions, so SparkEntry guards every entry point with this.
    * Idempotent. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    entries.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}
