package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering over co-occurrence baskets —
  * "customers who bought X also bought Y", the serving table behind
  * most production recommenders (Linden/Smith/York, IEEE Internet
  * Computing 2003).
  *
  * Similarity is co-occurrence cosine: sim(a, b) = n_ab /
  * sqrt(n_a * n_b) where n_x counts baskets containing x and n_ab
  * baskets containing both. All counts are exact integers; the cosine
  * is one sig9'd IEEE expression, so rankings are deterministic and
  * engine-portable.
  *
  * 100 TB shape: pair generation is the classic quadratic trap — one
  * power basket with 10^5 items yields 10^10 pairs. Two guards keep it
  * linear-ish and are part of the CONTRACT, not tuning hints:
  * `maxBasketSize` drops degenerate baskets before the self-join (a
  * crawler hitting every item carries no preference signal), and
  * `minSupport` prunes rare items before pairing (their cosines are
  * noise). What remains is a basket-keyed equi-join — partial
  * map-side aggregation, no window until the final bounded top-k per
  * item (rank over at most the surviving item count, keyed by item).
  */
object Recommend {

  /** Top-k most-similar items per item, by co-occurrence cosine.
    *
    * @param baskets    (basketCol, itemCol) rows; duplicates collapse.
    * @param minSupport items in fewer baskets than this are dropped
    *                   BEFORE pairing.
    * @param topK       neighbors kept per item (cosine desc, item asc).
    * @param maxBasketSize baskets with more distinct items than this
    *                   are dropped before pairing.
    */
  def itemItemCf(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int, topK: Int, maxBasketSize: Int): DataFrame = {
    val b = baskets
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()

    // per-item basket counts, support-pruned
    val itemN = b.groupBy("__i").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minSupport)

    // degenerate-basket guard (computed AFTER support pruning so the
    // size reflects the items that would actually pair)
    val kept = b.join(itemN, "__i")
    val okBaskets = kept.groupBy("__b").agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketSize)
      .select("__b")

    val kb = kept.join(okBaskets, "__b")
      .select(col("__b"), col("__i"), col("__n"))

    // ordered pairs within a basket (a < b), then symmetrized — the
    // equi-join on basket id is the only shuffle that grows with data
    val pairs = kb.as("x").join(kb.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("ia"), col("y.__i").as("ib"),
        col("x.__n").as("na"), col("y.__n").as("nb"))
      .agg(count(lit(1)).as("nab"))

    val cos = graft.queries.Q.sig9(
      col("nab").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
    val sym = pairs
      .select(col("ia").as("item"), col("ib").as("neighbor"),
        col("nab"), cos.as("cosine"))
      .unionByName(pairs.select(col("ib").as("item"),
        col("ia").as("neighbor"), col("nab"), cos.as("cosine")))

    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    sym.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col("item"), col("rnk").cast("long").as("rnk"),
        col("neighbor"), col("nab").cast("long").as("n_both"),
        col("cosine"))
  }
}
