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
  * symbols, far past natural-language word lengths.
  *
  * Merge-placement contract: the 4-pass replace fixpoint IS the
  * portable semantics, and it is NOT always greedy left-to-right BPE.
  * For a SELF-merged pair (l == r) over an odd run of >= 5 symbols,
  * non-overlapping replace leaves the stranded odd symbol mid-run
  * ("a a a a a" -> "aa a aa", a stable fixpoint) where greedy BPE
  * strands it at the end ("aa aa a") — same merge count, different
  * placement, so later-round pair counts can deviate from reference
  * Sennrich output on such runs (BpeSpec pins the odd-run case). For
  * non-self pairs and runs <= 4 the fixpoint equals greedy. Spark and
  * the DuckDB oracle share the replace semantics, so cross-engine
  * parity is unaffected — the deviation is a documented contract, not
  * a divergence.
  *
  * The dict is lineage-cut each round ([[Checkpoints.cut]]): it is the
  * loop-carried artifact, and without materialization every round's
  * argmax would lazily re-run all prior rounds. Pass `checkpointDir`
  * for the durable `checkpoint()` posture on a real cluster.
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

  /** The 4-pass padded literal replace of rule (`l`, `r`) applied to
    * `sym` — ONE definition shared by train and encode so the two
    * halves of the tokenizer can never disagree on merge semantics. */
  private def merge4(sym: Column, l: Column, r: Column): Column = {
    val pat = concat(lit(" "), l, lit(" "), r, lit(" "))
    val rep = concat(lit(" "), l, r, lit(" "))
    (1 to 4).foldLeft(sym) { (c, _) =>
      call_function("replace", c, pat, rep)
    }
  }

  /** Train `merges` BPE merge rules over the token arrays in
    * (toks, tokCol). Output one row per rule:
    * (step, lhs, rhs, merged, pair_count) — the merges table IS the
    * tokenizer artifact (steps contiguous from 1; fewer rows than
    * `merges` when the vocabulary exhausts early). */
  def train(toks: DataFrame, tokCol: String, merges: Int,
            checkpointDir: Option[String] = None): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    var words = Checkpoints.cut(wordDict(toks, tokCol), checkpointDir)
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
          words = Checkpoints.cut(
            words.crossJoin(broadcast(top))
              .select(merge4(col("sym"), col("l"), col("r")).as("sym"),
                col("cnt")),
            checkpointDir)
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

  /** Batched BPE trainer: up to `batch` MUTUALLY NON-INTERACTING merge
    * rules per Spark round, for production merge counts (R = 32k–100k)
    * where [[train]]'s one-rule-per-round loop is scheduler-floor bound
    * (R sequential pair-count jobs).
    *
    * Per round: one pair-count aggregate (same as [[train]]), then the
    * top candidates (count desc, lexicographic — a bounded
    * `limit(4*batch)` rule-artifact fetch, like [[orderedRules]])
    * are walked greedily on the driver keeping a pair only when its
    * {lhs, rhs, merged} strings are disjoint from every already-kept
    * pair's. Disjointness makes the kept pairs' counted occurrences
    * EXACTLY valid after each other's replaces (merging " a b " can
    * neither create nor destroy a " c d " adjacency when
    * {a,b} ∩ {c,d} = ∅), so all kept rules apply in ONE [[merge4]]
    * fold projection over the dict.
    *
    * Contract vs sequential BPE: rule ORDER within a batch follows the
    * stale (round-start) counts — a pair involving a freshly merged
    * symbol ("ab", c) cannot be selected until the next round, where
    * sequential BPE might rank it above the batch's later picks. This
    * is the standard multi-merge-per-round trade (batched/blocked BPE
    * training) and is documented, flagged behavior — `batch = 1`
    * degenerates EXACTLY to [[train]]'s semantics (BpeSpec pins it).
    * Encode/vocab/ids consume the output unchanged: same
    * (step, lhs, rhs, merged, pair_count) schema, steps contiguous
    * from 1. */
  def trainBatched(toks: DataFrame, tokCol: String, merges: Int,
                   batch: Int = 32,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    require(batch >= 1, "batch must be >= 1")
    val spark = toks.sparkSession
    import spark.implicits._
    var words = Checkpoints.cut(wordDict(toks, tokCol), checkpointDir)
    val rules = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val want = math.min(batch, merges - step + 1)
      val syms = split(trim(col("sym")), " ")
      val top = words
        .select(col("cnt"), explode(adjacentPairs(syms)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(4 * want)
        .collect()
      if (top.isEmpty) { exhausted = true }
      else {
        var occupied = Set.empty[String]
        val kept = top.iterator.flatMap { r =>
          val (l, rr, c) = (r.getString(0), r.getString(1), r.getLong(2))
          val touch = Set(l, rr, l + rr)
          if (touch.intersect(occupied).isEmpty) {
            occupied ++= touch
            Some((l, rr, c))
          } else None
        }.take(want).toSeq
        kept.zipWithIndex.foreach { case ((l, r, c), i) =>
          rules += ((step + i.toLong, l, r, l + r, c))
        }
        if (step + kept.size <= merges) {
          words = Checkpoints.cut(
            kept.foldLeft(words.select(col("sym"), col("cnt"))) {
              case (d, (l, r, _)) =>
                d.select(merge4(col("sym"), lit(l), lit(r)).as("sym"),
                  col("cnt"))
            }, checkpointDir)
        }
        step += kept.size
      }
    }
    rules.result()
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Ordered (lhs, rhs) rule list of a trained merge table, validated
    * contiguous from 1 (train's output contract). This reads the rule
    * TABLE to the driver — R short strings of an O(vocab) artifact,
    * i.e. the tokenizer file every BPE implementation ships, not a
    * data collect. */
  private def orderedRules(rules: DataFrame): Array[(String, String)] = {
    val rows = rules.select(col("step").cast("long"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getLong(0))
    val steps = rows.map(_.getLong(0))
    require(steps.zipWithIndex.forall { case (s, i) => s == i + 1 },
      s"rules.step must be contiguous from 1, got ${steps.mkString(",")}")
    rows.map(r => (r.getString(1), r.getString(2)))
  }

  /** Local twin of [[spaced]]: the same Java-regex spacing Spark
    * executes for the Column form, so the local encoder and the SQL
    * fold can never disagree on symbol boundaries. */
  private val spacedRe = java.util.regex.Pattern.compile("(.)")
  private[ext] def spacedLocal(w: String): String =
    " " + spacedRe.matcher(w).replaceAll("$1 ").trim + " "

  /** Local twin of [[merge4]]: `String.replace` is literal,
    * left-to-right and non-overlapping — exactly the Spark/DuckDB
    * `replace` semantics — so folding the rule list locally produces
    * bit-identical symbol strings to the R-stage SQL fold. The
    * `contains` guard only skips no-op passes (replace without a match
    * is identity), it cannot change the result. */
  private[ext] def mergeLocal(sym: String,
                              rules: Array[(String, String)]): String = {
    var s = sym
    var i = 0
    while (i < rules.length) {
      val (l, r) = rules(i)
      val pat = " " + l + " " + r + " "
      val rep = " " + l + r + " "
      var k = 0
      while (k < 4 && s.contains(pat)) { s = s.replace(pat, rep); k += 1 }
      i += 1
    }
    s
  }

  /** Rebuild per-document symbol sequences from a (w, sym) dict —
    * the corpus half shared by both encode paths: one equi-join on the
    * token, one doc-keyed aggregation; token-less docs keep (0, ""). */
  private def rebuild(docs: DataFrame, idCol: String, tokCol: String,
                      dict: DataFrame): DataFrame = {
    val ex = docs.select(col(idCol), posexplode(col(tokCol)).as(Seq("pos", "w")))
    val rebuilt = ex.join(dict, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(size(split(trim(col("sym")), " "))).cast("long").as("n_syms"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"),
              trim(col("sym")).as("t")))),
            s => s.getField("t")),
          " ").as("bpe_text"))
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_syms"), lit(0L)).as("n_syms"),
        coalesce(col("bpe_text"), lit("")).as("bpe_text"))
  }

  /** Encode: apply a trained merge-rule table to the token arrays —
    * the other half of the tokenizer, turning text into the symbol
    * sequences [[Packing]] counts and packs.
    *
    * Single-pass shape (the standard tokenizer deployment): the whole
    * rule table is broadcast and the R merges fold over each DISTINCT
    * token locally inside ONE `mapPartitions` stage — plan depth and
    * stage count are flat in R, so a production 32k–100k-merge
    * tokenizer costs the same number of Spark jobs as a 3-merge
    * fixture. Merge semantics are [[mergeLocal]], the bit-exact local
    * twin of [[merge4]] — [[encodeSqlFold]] keeps the R-stage SQL fold
    * as this path's cross-engine oracle twin (BpeSpec pins local ==
    * fold on the Sennrich fixture and the odd-run edge). The corpus
    * then rebuilds per document through [[rebuild]]'s equi-join on the
    * Zipf-bounded dict.
    *
    * `checkpointDir` is accepted for signature compatibility with the
    * fold twin; the local path has no loop-carried lineage to cut.
    *
    * Output: (idCol, n_syms, bpe_text) — bpe_text is the
    * space-separated symbol sequence of the document in token order;
    * token-less documents keep (0, ""). */
  def encode(docs: DataFrame, idCol: String, tokCol: String,
             rules: DataFrame,
             checkpointDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ruleArr = orderedRules(rules)
    val bc = spark.sparkContext.broadcast(ruleArr)
    val dict = docs.select(explode(col(tokCol)).as("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        val rs = bc.value
        it.map(w => (w, mergeLocal(spacedLocal(w), rs)))
      }
      .toDF("w", "sym")
    rebuild(docs, idCol, tokCol, dict)
  }

  /** The R-stage SQL-fold encoder — [[encode]]'s oracle twin and the
    * cross-engine-portable formulation (each rule is one broadcast
    * crossJoin + [[merge4]] literal replace over the distinct-token
    * dict, lineage cut every 16 rules). Sequential in R by
    * construction — R scheduler rounds — which is why [[encode]]'s
    * single-pass local fold is the production path; this stays as the
    * executable contract both engines share. */
  def encodeSqlFold(docs: DataFrame, idCol: String, tokCol: String,
                    rules: DataFrame,
                    checkpointDir: Option[String] = None): DataFrame = {
    val steps = orderedRules(rules).indices.map(_ + 1L)
    val dict0 = docs.select(explode(col(tokCol)).as("w")).distinct()
      .select(col("w"), spaced(col("w")).as("sym"))
    val dict = steps.foldLeft(dict0) { (d, i) =>
      val rule = rules.filter(col("step") === i)
        .select(col("lhs"), col("rhs"))
      val next = d.crossJoin(broadcast(rule))
        .select(col("w"), merge4(col("sym"), col("lhs"), col("rhs")).as("sym"))
      if (i % 16 == 0) Checkpoints.cut(next, checkpointDir) else next
    }
    rebuild(docs, idCol, tokCol, dict)
  }

  /** Base-symbol alphabet of the TRAINING corpus: (sym, sym_id) with
    * ids assigned by lexicographic rank 0..C-1. This is part of the
    * tokenizer ARTIFACT — train it once with the rules and persist the
    * pair; every later [[vocab]]/[[encodeIds]] call derives ids from
    * it, so sym_ids are a pure function of the artifact, never of the
    * batch being encoded (two batches with different character sets
    * still agree on every shared id).
    *
    * Rank assignment avoids a global-order window: the alphabet is
    * collected into ONE bounded row (`collect_set` over distinct
    * single characters — state O(alphabet), the league-scalar
    * posture) and posexploded back with its sort position. */
  def alphabet(toks: DataFrame, tokCol: String): DataFrame =
    toks.select(explode(col(tokCol)).as("w"))
      .select(explode(split(trim(spaced(col("w"))), " ")).as("sym"))
      .distinct()
      .agg(array_sort(collect_set(col("sym"))).as("a"))
      .select(posexplode(col("a")).as(Seq("id", "sym")))
      .select(col("sym"), col("id").cast("long").as("sym_id"))

  /** Vocabulary table (sym, sym_id) for a tokenizer artifact
    * (alphabet + rules): base symbols keep their alphabet ids
    * (0..C-1), merged symbols take C + step - 1 — the Sennrich id
    * layout (alphabet first, merges in learned order). Should two
    * rules produce the same merged string (possible from different
    * splits), the EARLIEST id wins — the table stays unique per sym,
    * so the encode join never fans out. */
  def vocab(alpha: DataFrame, rules: DataFrame): DataFrame = {
    val c = alpha.agg(count(lit(1)).as("c"))
    val merged = rules.crossJoin(broadcast(c))
      .select(col("merged").as("sym"),
        (col("c") + col("step") - 1).cast("long").as("sym_id"))
    alpha.unionByName(merged)
      .groupBy(col("sym")).agg(min(col("sym_id")).as("sym_id"))
  }

  /** Convenience overload deriving the alphabet from `docs` — ONLY
    * valid when `docs` IS the training corpus (otherwise ids would
    * depend on the encoded batch; use [[alphabet]] on the training
    * toks and the two-argument [[vocab]]). */
  def vocab(docs: DataFrame, tokCol: String, rules: DataFrame): DataFrame =
    vocab(alphabet(docs, tokCol), rules)

  /** Tokenize to integer ids: [[encode]]'s symbol sequences joined to
    * the vocabulary — one row per (document, position): (idCol, pos,
    * sym, sym_id). The shape a trainer consumes (and what [[Packing]]
    * packs once aggregated to counts); token-less docs contribute no
    * rows here (their accounting lives in encode's n_syms=0).
    *
    * Pass `vocabTable` (built from the TRAINING corpus's [[alphabet]]
    * + the rules — the persisted tokenizer artifact) whenever the
    * batch being encoded is not the training corpus itself: ids must
    * be a function of the artifact, not of the batch. Symbols outside
    * the artifact's vocabulary (a new batch with unseen characters)
    * keep their row with sym_id NULL — surfaced, never silently
    * dropped — so a downstream trainer can route them to its UNK id
    * or quarantine them. When `vocabTable` is None the vocabulary is
    * derived from `docs` (valid only for docs == training corpus,
    * where it covers every symbol by construction). */
  def encodeIds(docs: DataFrame, idCol: String, tokCol: String,
                rules: DataFrame,
                vocabTable: Option[DataFrame] = None,
                checkpointDir: Option[String] = None): DataFrame = {
    val voc = vocabTable.getOrElse(vocab(docs, tokCol, rules))
    val enc = encode(docs, idCol, tokCol, rules, checkpointDir)
    enc.filter(col("n_syms") > 0)
      .select(col(idCol),
        posexplode(split(col("bpe_text"), " ")).as(Seq("pos", "sym")))
      .join(voc, Seq("sym"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"), col("sym"),
        col("sym_id"))
  }

  /** Invert [[encodeIds]] against a vocabulary: (idCol, pos, sym_id)
    * rows back to each document's (n_syms, bpe_text) symbol stream —
    * the verification face of a shipped id stream ("do these ids
    * really spell the corpus?") and the debugging detokenizer. Uses
    * ONLY the ids (never the sym column a pipeline may have dropped);
    * ids outside the vocabulary surface as `<unk>`, never silently
    * dropped. Word boundaries are not marked in the stream by design
    * (this tokenizer has no end-of-word marker), so decode targets the
    * SYMBOL stream; raw-text reconstruction would need a marker
    * symbol in the alphabet (the byte-level-BPE convention).
    * Round-trip contract (BpeSpec-pinned and oracle-adjudicated via
    * `q_x_bpe_decode`): decodeIds(encodeIds(docs, rules), vocab) ==
    * [[encode]](docs, rules) restricted to token-bearing docs. */
  def decodeIds(ids: DataFrame, voc: DataFrame,
                idCol: String = "doc_id"): DataFrame =
    ids.select(col(idCol), col("pos"), col("sym_id"))
      .join(voc.select(col("sym_id"), col("sym")), Seq("sym_id"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_syms"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"),
              coalesce(col("sym"), lit("<unk>")).as("t")))),
            s => s.getField("t")),
          " ").as("bpe_text"))

  /** Persist a tokenizer artifact — the (rules, alphabet) pair that
    * fully determines [[encode]]/[[vocab]]/[[encodeIds]] behavior —
    * as two parquet tables, mirroring `Similarity.saveIndex`'s
    * artifact posture: train once on the corpus, ship the artifact,
    * encode any later batch against it (ids stay a pure function of
    * the artifact, never of the batch — the contract BpeSpec pins).
    * Both tables are O(vocab): rules has R rows, alphabet C rows. */
  def saveTokenizer(rules: DataFrame, alpha: DataFrame,
                    path: String): Unit = {
    rules.write.mode("overwrite").parquet(s"$path/rules")
    alpha.write.mode("overwrite").parquet(s"$path/alphabet")
  }

  /** Load a persisted tokenizer artifact: (rules, alphabet), ready for
    * [[encode]] and the two-argument [[vocab]]. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
                    path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/rules"),
      spark.read.parquet(s"$path/alphabet"))

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
