package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) vocabulary induction (Sennrich et al. 2016):
  * repeatedly merge the most frequent adjacent symbol pair. The trainer
  * is the canonical two-level shape that makes BPE tractable at corpus
  * scale:
  *
  *  - ONE corpus text pass builds the word-frequency dict (token ->
  *    count, map-side-combined aggregate). Everything after runs on the
  *    dict, whose size is Zipf-bounded (millions of rows for a 100 TB
  *    corpus — thousands of times smaller than the corpus);
  *  - each merge round is a pair-count aggregate + deterministic argmax
  *    (count desc, then lexicographic) + a literal string replace over
  *    the dict. The argmax is a one-row frame crossJoin-broadcast into
  *    the merge projection — the loop never collects to the driver and
  *    never re-touches the corpus.
  *
  * Words are held as SPACE-SEPARATED symbol strings padded with one
  * leading/trailing space (" l o w "), so a merge is
  * `replace(sym, " l r ", " lr ")` — engine-portable, literal (no
  * regex), and identical left-to-right non-overlapping semantics in
  * Spark and DuckDB. A single replace pass can miss an occurrence
  * whose leading space was consumed by the preceding match ("a b a b"),
  * so the replace is applied 4 times per round — enough for merge runs
  * up to 16 consecutive occurrences, i.e. words of > 32 repeated
  * symbols, far past natural-language word lengths; the fixpoint equals
  * greedy BPE ("a a a" -> "aa a", never "a aa").
  *
  * The dict is localCheckpoint'ed each round: it is the loop-carried
  * artifact, and without materialization every round's argmax would
  * lazily re-run all prior rounds (on a real cluster use
  * `checkpoint()` with a dir, as in Dedup.dupClusters).
  */
object Bpe {

  /** "abc" -> " a b c " (padded spaced-symbol form). */
  def spaced(w: Column): Column =
    concat(lit(" "), trim(regexp_replace(w, "(.)", "$1 ")), lit(" "))

  /** Word-frequency dict in spaced-symbol form: (sym, cnt). */
  def wordDict(toks: DataFrame, tokCol: String): DataFrame =
    toks.select(explode(col(tokCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(spaced(col("w")).as("sym"), col("cnt"))

  /** Train `merges` BPE merge rules over the token arrays in
    * (toks, tokCol). Output one row per rule:
    * (step, lhs, rhs, merged, pair_count) — the merges table IS the
    * tokenizer artifact. */
  def train(toks: DataFrame, tokCol: String, merges: Int): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    var words = wordDict(toks, tokCol).localCheckpoint()
    val rules = Seq.newBuilder[DataFrame]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val syms = split(trim(col("sym")), " ")
      val pairs = words
        .select(col("cnt"), explode(adjacentPairs(syms)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pair_count"))
      val top = pairs
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(1).localCheckpoint()
      // no pairs left (every word is a single symbol): the vocabulary
      // is exhausted — stop with the rules learned so far, like any
      // BPE trainer, instead of letting an empty crossJoin silently
      // wipe the dict and emit phantom empty rounds
      if (top.isEmpty) { exhausted = true }
      else {
        rules += top.select(lit(step.toLong).as("step"),
          col("l").as("lhs"), col("r").as("rhs"),
          concat(col("l"), col("r")).as("merged"), col("pair_count"))
        if (step < merges) { // the final round's dict is never read
          val pat = concat(lit(" "), col("l"), lit(" "), col("r"), lit(" "))
          val rep = concat(lit(" "), col("l"), col("r"), lit(" "))
          val merged4 = (1 to 4).foldLeft(col("sym")) { (c, _) =>
            call_function("replace", c, pat, rep)
          }
          words = words.crossJoin(broadcast(top))
            .select(merged4.as("sym"), col("cnt"))
            .localCheckpoint()
        }
        step += 1
      }
    }
    val out = rules.result()
    if (out.nonEmpty) out.reduce(_.unionByName(_))
    else {
      val s = toks.sparkSession
      import s.implicits._
      Seq.empty[(Long, String, String, String, Long)]
        .toDF("step", "lhs", "rhs", "merged", "pair_count")
    }
  }

  /** Adjacent (l, r) symbol pairs of a symbol array (empty when fewer
    * than two symbols — such words carry no pairs). */
  private def adjacentPairs(syms: Column): Column =
    element_at(transform(array(syms), s =>
      when(size(s) >= 2,
        transform(sequence(lit(0), size(s) - 2), i =>
          struct(element_at(s, i + 1).as("l"),
            element_at(s, i + 2).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))), 1)
}
