package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Engine extensions, registered the public way
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`): native expressions the
  * built-in surface can't express efficiently. Currently: `dot_product`,
  * the codegen'd vector dot product behind every similarity operator.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
  }
}
