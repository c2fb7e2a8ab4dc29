package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.Q

/** Sparse-lexical retrieval over the corpus: BM25 ranking of documents
  * against a small query-term set — the retrieval primitive behind
  * RAG indexing, targeted corpus audits ("show me the docs about X"),
  * and lexical hard-negative mining.
  *
  * Scale design: query terms are a broadcast-sized frame, so the
  * corpus side is explode -> broadcast-hash semi-join (map-only: the
  * corpus is never shuffled at full width) -> per-(doc, term) counts
  * keyed on the matched subset only. Corpus statistics (N, avgdl) are
  * one-row broadcast frames, never driver-side collects. The final
  * top-k is TakeOrderedAndProject (per-partition heaps + a k-row
  * merge), not a global sort.
  *
  * Determinism contract: idf values are sig9-normalized (ln is the one
  * libm-dependent step; a handful of per-term values are normalized,
  * never per-row math), per-document term sums route through
  * DECIMAL(38,15), and ties rank by doc id.
  */
object Retrieval {

  /** BM25 top-k. `toks`: (idCol, tokCol: array<string>); `terms`: a
    * small one-column frame of query terms (deduplicated internally).
    * Output: (idCol, rank, score, n_terms_matched), rank 1..k.
    */
  def bm25TopK(toks: DataFrame, idCol: String, tokCol: String,
               terms: DataFrame, k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val termCol = terms.columns.head
    val k1p1 = k1 + 1
    val oneMinusB = 1 - b

    val dl = toks.select(col(idCol), size(col(tokCol)).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      Q.davg(col("dl").cast("double")).as("avgdl"))

    val tf = toks.select(col(idCol), explode(col(tokCol)).as("term"))
      .join(broadcast(terms.select(col(termCol).as("term")).distinct()),
        Seq("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

    // Robertson-Sparck Jones idf with the +1 floor (Lucene form): always
    // positive, so matching a common term never pushes a doc below a
    // non-matching one.
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("term"), Q.sig9(log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0))).as("idf"))

    val perTerm = tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .select(col(idCol),
        ((col("idf") * (col("tf").cast("double") * lit(k1p1))) /
          (col("tf").cast("double") + lit(k1) *
            (lit(oneMinusB) + lit(b) * col("dl").cast("double")
              / col("avgdl")))).as("s"))

    val scored = perTerm.groupBy(col(idCol))
      .agg(Q.sig9(sum(col("s").cast(DecimalType(38, 15))).cast("double"))
        .as("score"),
        count(lit(1)).cast("long").as("n_terms_matched"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k) // TakeOrderedAndProject — no global sort at scale
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(idCol).asc) // k rows — safe
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("rank"), col("score"),
        col("n_terms_matched"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): fuse any
    * number of per-query rankings into one, score = Σ 1/(k0 + rank)
    * over the rankings that contain the (query, doc) pair — the
    * standard hybrid-retrieval combiner (BM25 + ANN, or any mix),
    * robust because it reads only RANKS, never incomparable scores.
    *
    * Scale shape: a union + one (query, doc)-keyed hash aggregate
    * (map-side partial) + a per-query rank window — input is already
    * top-k-bounded per ranking, so the window partitions are
    * O(Σ k_i), never corpus-sized. The per-term 1/(k0+rank) is exact
    * in both engines (double division of small integers); the sum is
    * decimal-routed and sig9'd, so fused ranks are engine-portable.
    * Output: (qCol, docCol, n_rankings, rrf_score, fused_rank). */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60,
          qCol: String = "qid", docCol: String = "doc_id",
          rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, "k0 must be >= 1")
    val unioned = rankings
      .map(_.select(col(qCol), col(docCol), col(rankCol).cast("long")
        .as("__r")))
      .reduce(_.unionByName(_))
    val fused = unioned.groupBy(col(qCol), col(docCol))
      .agg(count(lit(1)).as("n_rankings"),
        Q.dsum(lit(1.0) / (lit(k0.toLong) + col("__r"))).as("rrf_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qCol))
      .orderBy(col("rrf_score").desc, col(docCol).asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
  }

  /** NDCG@k — the ranking-quality readout for any top-k list this
    * module produces ([[bm25TopK]], [[rrf]], an ANN ranking): DCG
    * with the standard 1/log2(i+1) position discount, normalized by
    * the ideal ordering's DCG. `ranked` carries 1-based ranks and
    * integer relevance grades; rows past rank k are ignored.
    *
    * Determinism: the k discount weights are computed ONCE in Scala
    * and embedded as literals on both engines (the PageRank-constant
    * convention); each term is one IEEE multiply of an exact integer
    * grade by a literal, summed LEFT TO RIGHT inside a bounded k-row
    * array (rank order for DCG; (grade desc, rank asc) for the ideal
    * — fully deterministic tie order), so both folds are
    * bit-identical cross-engine; the final ratio is sig9'd once.
    *
    * Scale shape: per query everything lives in one bounded ≤k-row
    * array row; across queries it is one hash aggregate — millions of
    * queries fan out flat.
    *
    * @return per key (one global row when keyCols is empty):
    *         (keys..., ndcg, dcg, idcg, n_ranked) — ndcg NULL when no
    *         positive grade exists (idcg = 0) */
  def ndcg(ranked: DataFrame, keyCols: Seq[String], rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val wLit = array((1 to k).map(i =>
      lit(1.0 / (math.log(i + 1.0) / math.log(2.0)))): _*)
    val keys = keyCols.map(col)
    val rows = ranked
      .select(keys :+ col(rankCol).cast("long").as("rank") :+
        col(relCol).cast("long").as("rel"): _*)
      .where(col("rank") >= 1 && col("rank") <= k &&
        col("rel").isNotNull)
    val aggs = Seq(
      array_sort(collect_list(struct(col("rank"), col("rel"))))
        .as("byrank"),
      array_sort(collect_list(struct(
        (lit(Long.MaxValue) - col("rel")).as("nr"), col("rank"),
        col("rel")))).as("byrel"),
      count(lit(1)).as("n_ranked"))
    val g =
      if (keyCols.isEmpty) rows.agg(aggs.head, aggs.tail: _*)
      else rows.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val dcgRaw = aggregate(
      transform(col("byrank"), x => x.getField("rel").cast("double") *
        element_at(wLit, x.getField("rank").cast("int"))),
      lit(0.0), (acc, e) => acc + e)
    val idcgRaw = aggregate(
      transform(col("byrel"), (x, i) =>
        x.getField("rel").cast("double") * element_at(wLit, i + 1)),
      lit(0.0), (acc, e) => acc + e)
    g.select(keys ++ Seq(
      when(col("n_ranked") > 0 && idcgRaw > 0,
        Q.sig9(dcgRaw / idcgRaw)).as("ndcg"),
      when(col("n_ranked") > 0, Q.sig9(dcgRaw)).as("dcg"),
      when(col("n_ranked") > 0, Q.sig9(idcgRaw)).as("idcg"),
      coalesce(col("n_ranked"), lit(0L)).cast("long").as("n_ranked")): _*)
  }

  /** Binary-relevance rank evaluation — the set-based readouts beside
    * [[ndcg]]'s graded one: MRR (reciprocal rank of the first relevant
    * hit in the top k, 0 when none), precision@k, recall@k and hit@k
    * over a judged ranked list. A row is relevant iff `relCol` > 0
    * (graded judgments degrade to binary, the standard convention).
    *
    * The recall base is the relevant rows ANYWHERE in the supplied
    * list — pass the full judged list (not a pre-truncated top-k) when
    * recall against the whole judged pool is wanted; rows past rank k
    * still count toward `n_rel_total` but not the @k numerators.
    *
    * Determinism: every statistic is an exact-integer count or min;
    * the only floating point is three single IEEE divisions of exact
    * longs, each sig9'd once — no aggregation order dependence at all.
    *
    * Scale shape: ONE hash aggregate (map-side partial) over the
    * ranked rows; per key the state is four longs, so millions of
    * queries fan out flat with no window or sort anywhere.
    *
    * @return per key (one global row when keyCols is empty):
    *         (keys..., mrr, prec_at_k, recall_at_k, hit_at_k,
    *         first_rel_rank, n_rel_at_k, n_rel_total, n_ranked) —
    *         recall_at_k NULL when the list has no relevant row */
  def rankEval(ranked: DataFrame, keyCols: Seq[String], rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val keys = keyCols.map(col)
    val rows = ranked
      .select(keys :+ col(rankCol).cast("long").as("rank") :+
        col(relCol).cast("long").as("rel"): _*)
      .where(col("rank") >= 1 && col("rel").isNotNull)
    val relHit = col("rel") > 0
    val atK = relHit && col("rank") <= k
    val aggs = Seq(
      count(lit(1)).as("n_ranked"),
      sum(when(relHit, 1L).otherwise(0L)).as("n_rel_total"),
      sum(when(atK, 1L).otherwise(0L)).as("n_rel_at_k"),
      min(when(atK, col("rank"))).as("first_rel_rank"))
    val g =
      if (keyCols.isEmpty) rows.agg(aggs.head, aggs.tail: _*)
      else rows.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val nTot = coalesce(col("n_rel_total"), lit(0L)).cast("long")
    val nAtK = coalesce(col("n_rel_at_k"), lit(0L)).cast("long")
    g.select(keys ++ Seq(
      when(col("first_rel_rank").isNotNull,
        Q.sig9(lit(1.0) / col("first_rel_rank").cast("double")))
        .otherwise(lit(0.0)).as("mrr"),
      Q.sig9(nAtK.cast("double") / lit(k.toDouble)).as("prec_at_k"),
      when(nTot > 0, Q.sig9(nAtK.cast("double") / nTot.cast("double")))
        .as("recall_at_k"),
      when(nAtK > 0, 1L).otherwise(0L).as("hit_at_k"),
      col("first_rel_rank").cast("long").as("first_rel_rank"),
      nAtK.as("n_rel_at_k"),
      nTot.as("n_rel_total"),
      coalesce(col("n_ranked"), lit(0L)).cast("long").as("n_ranked")): _*)
  }

  /** Truncated rank-biased overlap (Webber–Moffat–Zobel 2010) between
    * two rankings — "did the top of the list change": RBO@k =
    * Σ_{d≤k} (1−p)·p^{d−1}·X_d/d, with X_d the overlap of the two
    * depth-d prefixes and p the persistence (how deep a user reads;
    * 0.9 ≈ top-10 focus). The set-intersection form makes it the
    * right drift monitor for rankings whose ITEMS churn (top tokens,
    * top products week-over-week) where rank-correlations are
    * undefined on non-identical item sets.
    *
    * Inputs are two (item, rank) frames with ranks 1..k (build them
    * with any top-k; ties must already be broken deterministically).
    * Both prefixes pack into ONE bounded array row (k is the
    * contract, ≤ 1000 enforced), X_d is an exact array_intersect size
    * per depth, and the cumulative RBO folds in exact decimal over
    * sig9'd terms.
    *
    * @return one row per depth 1..k: (depth, x_d, agreement, term,
    *         rbo_at_d) — the last row is RBO@k */
  def rbo(a: DataFrame, b: DataFrame, itemCol: String, rankCol: String,
      k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    require(p > 0 && p < 1, s"p must be in (0, 1), got $p")
    val decAcc = DecimalType(25, 15)
    def packed(df: DataFrame, out: String) = df
      .where(col(rankCol) <= k)
      .agg(transform(
        array_sort(collect_list(struct(col(rankCol).cast("long")
          .as("r"), col(itemCol).cast("string").as("i")))),
        x => x.getField("i")).as(out))
    val both = packed(a, "la").crossJoin(packed(b, "lb"))
    val depths = both.select(col("la"), col("lb"),
      explode(sequence(lit(1), lit(k))).as("depth"))
      .withColumn("x_d", size(array_intersect(
        slice(col("la"), lit(1), col("depth")),
        slice(col("lb"), lit(1), col("depth")))).cast("long"))
      .withColumn("agreement", Q.sig9(col("x_d").cast("double") /
        col("depth").cast("double")))
      .withColumn("term", Q.sig9(lit(1.0 - p) *
        pow(lit(p), col("depth").cast("double") - 1) *
        col("x_d").cast("double") / col("depth").cast("double")))
    // bounded k-row frame: the running decimal sum packs in one array
    val out = depths
      .agg(array_sort(collect_list(struct(col("depth").cast("long")
        .as("depth"), col("x_d").as("x_d"),
        col("agreement").as("agreement"), col("term").as("term"))))
        .as("arr"))
      .select(explode(transform(col("arr"), (x, i) =>
        struct(x.getField("depth").as("depth"),
          x.getField("x_d").as("x_d"),
          x.getField("agreement").as("agreement"),
          x.getField("term").as("term"),
          aggregate(slice(col("arr"), lit(1), i + 1),
            lit(0L).cast(decAcc),
            (acc, e) => (acc + e.getField("term").cast(decAcc))
              .cast(decAcc)).as("cum")))).as("r"))
    out.select(col("r.depth").as("depth"), col("r.x_d").as("x_d"),
      col("r.agreement").as("agreement"), col("r.term").as("term"),
      Q.decOut(col("r.cum"), 12).as("rbo_at_d"))
  }

  /** Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM 2008) —
    * the ONLINE ranker-evaluation face beside the offline suite
    * (NDCG / RBO / rank_eval): per query, rankers A and B draft an
    * interleaved list round by round (a per-(query, round) hash coin
    * decides who picks first; each team picks its highest-ranked
    * not-yet-picked document), clicks credit the team that placed the
    * clicked slot, and the per-query winner is the team with more
    * credited clicks.
    *
    * Everything is EXACT INTEGER arithmetic — no sig9 anywhere. The
    * draft is a bounded per-query fold over 2k steps (Spark
    * `aggregate` == DuckDB `list_reduce`); the accumulator is ONE
    * packed BIGINT list (doc*2 + team) because DuckDB 1.0's
    * list_reduce silently drops list growth inside a STRUCT
    * accumulator — the packed encoding sidesteps the bug and keeps
    * both engines on the identical fold. Clicks are a deterministic
    * per-(query, doc) hash model (the fixture stand-in for a click
    * log; production passes real clicks through the same crediting).
    *
    * Scale shape: two bounded keyed windows (top-k per query per
    * ranker), one equi-join on the query, one per-row bounded fold —
    * shards on the query key end to end.
    */
  def teamDraftInterleave(rankA: DataFrame, rankB: DataFrame,
      queryCol: String, docCol: String, rankCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, "teamDraftInterleave: k must be >= 1")
    def side(df: DataFrame, name: String) = df
      .where(col(rankCol) <= k && col(docCol).isNotNull)
      .groupBy(col(queryCol).as("q"))
      .agg(transform(array_sort(collect_list(struct(
        col(rankCol).cast("long").as("r"),
        col(docCol).cast("long").as("d")))),
        s => s.getField("d")).as(name))
    val both = side(rankA, "la").join(side(rankB, "lb"), "q")

    val steps = transform(sequence(lit(1), lit(2 * k)),
      i => array(i.cast("long")))
    val init = array().cast("array<bigint>")
    val folded = both.withColumn("__acc",
      aggregate(steps, init, (acc, x) => {
        val i = element_at(x, 1)
        val r = floor((i - 1) / 2).cast("long")
        val s = pmod(i - 1, lit(2L))
        val coin = pmod(Hashing.hash60(concat(lit(seed + ":"),
          col("q").cast("string"), lit(":"), r.cast("string"))), lit(2L))
        val team = pmod(coin + s, lit(2L))
        val src = when(team === 0L, col("la")).otherwise(col("lb"))
        val picked = transform(acc, e => floor(e / 2).cast("long"))
        val remaining = filter(src,
          d => !array_contains(picked, d))
        // try_element_at: an exhausted list must yield NULL (skip the
        // pick), not an ANSI INVALID_ARRAY_INDEX error
        val nxt = try_element_at(remaining, lit(1))
        when(nxt.isNotNull,
          concat(acc, array(nxt * 2 + team))).otherwise(acc)
      }))

    def clicked(d: org.apache.spark.sql.Column) =
      Hashing.hashP(concat(lit("click:"), col("q").cast("string"),
        lit(":"), d.cast("string"))) % 5 === 0L
    def credit(team: Int) = size(filter(col("__acc"), e =>
      pmod(e, lit(2L)) === team.toLong &&
        clicked(floor(e / 2).cast("long")))).cast("long")
    folded
      .withColumn("n_shown", size(col("__acc")).cast("long"))
      .withColumn("credit_a", credit(0))
      .withColumn("credit_b", credit(1))
      .select(col("q").as(queryCol), col("n_shown"), col("credit_a"),
        col("credit_b"),
        when(col("credit_a") > col("credit_b"), "A")
          .when(col("credit_b") > col("credit_a"), "B")
          .otherwise("tie").as("winner"))
  }
}
