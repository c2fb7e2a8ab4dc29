package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: filter a huge fact table down to the
  * rows whose key *might* appear in a (filtered) dimension, without
  * shuffling the fact side.
  *
  * The filter is built distributed (treeAggregate under
  * DataFrameStatFunctions.bloomFilter), ships to every task as a few
  * MB broadcast, and is applied during the scan — so at 100 TB the
  * fact table is cut to the ~matching rows *before* the join shuffle.
  * False positives (rate `fpp`) survive the prune and are eliminated
  * by the exact join that follows, so results are always exact; the
  * bloom is purely an I/O/shuffle reducer. This is the manual form of
  * Spark's AQE runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) with explicit
  * control over sizing.
  */
object BloomPrune {

  /** Rows of `big` whose `bigKey` might be present in `keys(keyCol)`.
    * `expectedItems` sizes the filter: ~1.2 bytes/item at fpp 1e-2,
    * ~2.4 at 1e-4 — a 10M-key dimension costs ~12-24 MB broadcast.
    *
    * The probe is Spark's own codegen'd `BloomFilterMightContain`
    * (the expression behind AQE runtime row-level filtering) over the
    * serialized sketch — not a scalar UDF, which would box every key
    * and break whole-stage codegen for the surrounding 100 TB scan.
    * NULL keys probe to NULL, which the filter drops — same rows as the
    * exact join that follows would keep. */
  def pruneByBloom(big: DataFrame, bigKey: String, keys: DataFrame,
                   keyCol: String, expectedItems: Long,
                   fpp: Double = 0.01): DataFrame = {
    val bloom = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    big.filter(graft.functions.VectorExprs.bloomMightContain(
      lit(bos.toByteArray), col(bigKey).cast("long")))
  }

  /** Bloom-pruned inner equi-join: prune `big` with a bloom over the
    * small side's key, then exact-join. Same result as a plain inner
    * join; the bloom only shrinks what reaches the shuffle. */
  def prunedJoin(big: DataFrame, bigKey: String, small: DataFrame,
                 smallKey: String, expectedItems: Long,
                 fpp: Double = 0.01): DataFrame = {
    val pruned = pruneByBloom(big, bigKey, small, smallKey, expectedItems, fpp)
    pruned.join(small, col(bigKey) === col(smallKey))
  }
}
