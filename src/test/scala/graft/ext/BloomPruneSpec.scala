package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("pruneByBloom keeps every true match (no false negatives)") {
    val big = (1L to 10000L).toDF("k")
    val keys = (1L to 10000L by 7).toDF("key")
    val pruned = BloomPrune.pruneByBloom(big, "k", keys, "key", 2000L, 0.05)
    val kept = pruned.select("k").as[Long].collect().toSet
    val truth = (1L to 10000L by 7).toSet
    assert(truth.subsetOf(kept)) // bloom never drops a real key
    assert(kept.size < 10000) // and actually prunes
  }

  test("prunedJoin result is identical to the plain inner join") {
    val big = (1L to 5000L).map(i => (i, i % 13)).toDF("k", "payload")
    val small = (1L to 5000L by 11).map(i => (i, s"dim$i")).toDF("key", "name")
    val viaBloom = BloomPrune
      .prunedJoin(big, "k", small, "key", 500L, 0.1)
      .select("k", "payload", "name")
    val plain = big.join(small, col("k") === col("key"))
      .select("k", "payload", "name")
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
    assert(viaBloom.count() == plain.count())
  }
}
