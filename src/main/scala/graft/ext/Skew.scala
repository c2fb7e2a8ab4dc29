package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins.
  *
  * AQE's skew-join splitting handles most cases (and is on by default in
  * this engine's sessions); explicit salting remains the tool when one
  * key dominates so heavily that even split partitions of it overwhelm a
  * task, or when the join sits under an operator AQE cannot re-plan.
  *
  * The fact side gets a DETERMINISTIC salt derived from its row content
  * (never rand() — re-runs and retries must place rows identically); the
  * dimension side is replicated saltFactor times. Shuffle width for the
  * hot key grows saltFactor-fold; the dimension inflation is bounded by
  * saltFactor x |dim|.
  */
object Skew {

  /** Inner/left equi-join on `key` with the right side replicated over
    * `saltFactor` salts. `saltSource` should be high-cardinality fact
    * columns (defaults to the whole row via all left columns). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner",
                 saltSource: Seq[Column] = Nil): DataFrame = {
    val src = if (saltSource.nonEmpty) saltSource
              else left.columns.toSeq.map(col)
    val l = left.withColumn("__salt", pmod(hash(src: _*), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
