package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus version diff — the governance primitive for a dataset that
  * re-materializes: which documents were added, removed, or changed
  * between two versions, by id and 128-bit content digest. Training
  * runs pin dataset versions; this operator is how a version bump is
  * audited (and how incremental consumers find their delta).
  *
  * Scale shape: both sides reduce to (id, digest) projections before
  * the join — the full-width text never shuffles; the id-keyed
  * full-outer join is a standard sort-merge/shuffle-hash equi-join
  * (AQE-planned). Digests are md5 so the comparison is reproducible
  * across engines and versions of this library. */
object CorpusDiff {

  /** Per-id status: added / removed / changed / unchanged, with both
    * digests carried for audit. */
  def diff(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val o = oldV.select(col(idCol).as("id"), md5(col(textCol)).as("old_md5"))
    val n = newV.select(col(idCol).as("id"), md5(col(textCol)).as("new_md5"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol), col("old_md5"), col("new_md5"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The four-row audit summary. */
  def summary(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    diff(oldV, newV, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))

  /** ln(2) computed once in Scala and embedded identically in the
    * engine and every oracle (the decay-lambda convention). */
  val Ln2: Double = math.log(2.0)

  /** Per-group Jensen–Shannon divergence (in nats) between each
    * group's token distribution and the WHOLE corpus's — "which source
    * is most unlike the rest of the training mix?", the
    * distribution-level companion to [[diff]]'s id-level audit and the
    * token-space analogue of the numeric drift monitors (PSI/KS/chi2).
    * JSD is symmetric and bounded by ln 2, so scores are comparable
    * across groups and corpora.
    *
    * JSD(P_g ‖ Q) = ½ Σ p ln(p/m) + ½ Σ q ln(q/m), m = (p+q)/2. Only
    * tokens PRESENT in the group carry both terms; tokens absent from
    * the group have p = 0 and contribute ½·q·ln 2 each — folded in
    * CLOSED FORM as ½·ln2·(1 − Σ_{tok∈g} q) (the complement-aggregate
    * trick: the out-of-group tail needs no join, no anti-join, no
    * second pass). Σ over the group's own tokens is the only shuffle:
    * one token-keyed join of per-group counts against the global
    * vocabulary, then one group-keyed aggregate.
    *
    * Determinism: counts are exact; p, q, m are fixed IEEE doubles of
    * exact-cast integers; ln() is the single libm step and is sig9'd
    * per term; per-term products are sig9'd and summed via dsumStable
    * (terms ≤ ln 2, so scale 12 stays exact).
    *
    * @param toks (groupCol, tokCol: array<string>) — pre-tokenized
    * @return one row per group: (groupCol, jsd, n_tok_positions,
    *         n_vocab) — jsd in nats, NULL for an empty corpus */
  def tokenDivergence(toks: DataFrame, groupCol: String,
      tokCol: String): DataFrame = {
    import graft.queries.Q
    val ex = toks.select(col(groupCol).as("g"),
      explode(col(tokCol)).as("tok"))
    val cg = ex.groupBy(col("tok")).agg(count(lit(1)).as("cg"))
    val nTot = cg.agg(sum(col("cg")).cast("long").as("n_tot"))
    val cs = ex.groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    val ns = cs.groupBy(col("g")).agg(sum(col("c")).cast("long").as("ns"))
    val p = col("c").cast("double") / col("ns").cast("double")
    val q = col("cg").cast("double") / col("n_tot").cast("double")
    val m = (p + q) / 2.0
    val termIn = lit(0.5) * p * Q.sig9(log(p / m)) +
      lit(0.5) * q * Q.sig9(log(q / m))
    cs.join(cg, Seq("tok"))
      .join(ns, Seq("g"))
      .crossJoin(broadcast(nTot))
      .groupBy(col("g"))
      .agg(Q.dsumStable(Q.sig9(termIn), 12).as("t_in"),
        Q.dsumStable(Q.sig9(q), 12).as("q_in"),
        first(col("ns")).as("ns"),
        count(lit(1)).cast("long").as("n_vocab"))
      .select(col("g").as(groupCol),
        Q.sig9(col("t_in") +
          lit(0.5 * Ln2) * (lit(1.0) - col("q_in"))).as("jsd"),
        col("ns").cast("long").as("n_tok_positions"),
        col("n_vocab"))
  }

  /** Per-group Shannon entropy of the token distribution (nats) plus
    * the normalized form H / ln V — the repetitiveness profile next to
    * [[tokenDivergence]]'s cross-source distance: low entropy = the
    * source is dominated by few tokens (boilerplate, templating), and
    * the normalized score compares sources with different vocabulary
    * sizes on one [0, 1] scale.
    *
    * The identity H = ln N − (Σ c·ln c)/N turns the p·ln p sum into
    * ONE token-keyed count aggregate and ONE group-keyed sum — no
    * joins at all (p = c/N never materializes per token). Singleton
    * tokens (c = 1) contribute exactly 0 and are skipped in both
    * engines, which at web scale is nearly the whole vocabulary —
    * the sum is effectively over the repeated-token head.
    *
    * Determinism: counts exact; each c·ln c term is sig9'd around the
    * single libm ln and summed via dsumStable (scale 6 — terms reach
    * c·ln c ≈ 10⁹·21, the chi2 bound); the final H and H/ln V chains
    * are fixed IEEE ops over sig9'd values.
    *
    * @param toks (groupCol, tokCol: array<string>) — pre-tokenized
    * @return one row per group: (groupCol, n_tok, n_vocab, entropy,
    *         norm_entropy) — norm NULL when V = 1 */
  def tokenEntropy(toks: DataFrame, groupCol: String,
      tokCol: String): DataFrame = {
    import graft.queries.Q
    val ex = toks.select(col(groupCol).as("g"),
      explode(col(tokCol)).as("tok"))
    val cs = ex.groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    val cd = col("c").cast("double")
    val term = when(col("c") > 1,
      Q.sig9(cd * Q.sig9(log(cd)))).otherwise(lit(0.0))
    val h = Q.sig9(
      Q.sig9(log(col("n_tok").cast("double"))) -
        col("s_clogc") / col("n_tok").cast("double"))
    cs.groupBy(col("g"))
      .agg(sum(col("c")).cast("long").as("n_tok"),
        count(lit(1)).cast("long").as("n_vocab"),
        Q.dsumStable(term, 6).as("s_clogc"))
      .select(col("g").as(groupCol), col("n_tok"), col("n_vocab"),
        when(col("n_tok") > 0, h).as("entropy"),
        when(col("n_tok") > 0 && col("n_vocab") > 1, Q.sig9(
          h / Q.sig9(log(col("n_vocab").cast("double")))))
          .as("norm_entropy"))
  }
}
