package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share token
  * n-grams with an evaluation/benchmark set, so test questions never
  * leak into the training corpus (the GPT-3-style n-gram overlap check).
  *
  * Scale design: a benchmark set is small (MBs of eval questions) while
  * the corpus is the 100 TB side, so the benchmark's distinct n-gram
  * hash set is BROADCAST and the corpus side stays a map-only
  * explode + broadcast-hash-join + per-doc count — one doc-keyed
  * shuffle for the per-document hit counts, no corpus self-join, and
  * the text column is the only wide column read. Hashes are the
  * portable md5 family from [[Hashing]], so a decontamination run is
  * reproducible across engines and incremental re-runs.
  */
object Decontam {

  /** Distinct n-gram hash set of a benchmark table: one `h` column.
    * Deduplicated BEFORE broadcast so overlapping benchmark items
    * don't double-count a matching corpus n-gram. */
  def benchNgrams(bench: DataFrame, tokCol: String, n: Int = 5): DataFrame =
    bench.select(explode(Dedup.shingleHashes(col(tokCol), n)).as("h"))
      .distinct()

  /** Per-document overlap against the benchmark n-gram set.
    * Output: (idCol, n_ngrams, n_hits, contam_frac, contaminated) —
    * every input document appears, including too-short ones
    * (n_ngrams = 0 => NULL contam_frac, not contaminated).
    *
    * `contaminated` uses the strict any-overlap rule (n_hits >= 1);
    * callers with noisier benchmarks filter on `contam_frac` instead.
    */
  def overlap(docs: DataFrame, idCol: String, tokCol: String,
              bench: DataFrame, n: Int = 5): DataFrame = {
    // ONE pass over the corpus text: total n-grams and benchmark hits
    // both come from the same exploded frame (broadcast LEFT join with
    // a match marker, then two counts in one doc-keyed aggregate).
    // Too-short docs re-enter via the id-only scan — no text read.
    val counted = docs
      .select(col(idCol), explode(Dedup.shingleHashes(col(tokCol), n)).as("h"))
      .join(broadcast(bench.select(col("h"), lit(1L).as("__m"))),
        Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("__m")).as("n_hits"))
    val nNg: Column = coalesce(col("n_ngrams"), lit(0L))
    val nHits: Column = coalesce(col("n_hits"), lit(0L))
    docs.select(col(idCol))
      .join(counted, Seq(idCol), "left")
      .select(col(idCol), nNg.as("n_ngrams"), nHits.as("n_hits"),
        when(nNg > 0, nHits.cast("double") / col("n_ngrams"))
          .otherwise(lit(null).cast("double")).as("contam_frac"),
        (nHits > 0).as("contaminated"))
  }
}
