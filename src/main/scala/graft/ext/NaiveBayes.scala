package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Multinomial Naive Bayes over token arrays — the other classic
  * corpus-gating classifier next to [[Classifier.logisticTrain]]
  * (language-ID, topic routing, spam/quality gating): training IS
  * counting, so unlike gradient descent it needs no iteration at all —
  * one pass of map-side-combined aggregates builds the whole model,
  * which is why NB is the first thing trained on any new 100 TB corpus.
  *
  * Scale shape: class statistics are a bounded frame (|classes| rows,
  * broadcast), token statistics one (label, token)-keyed hash
  * aggregate, scoring one token-keyed equi-join + one (doc, class)
  * aggregate. No windows, no iteration, no driver data path.
  *
  * Determinism contract (DuckDB-adjudicable like the GD trajectory):
  * counts are exact integers; each log term — class prior
  * ln(n_docs_c / N), token likelihood ln((cnt+1)/(n_toks_c + V))
  * (Laplace α=1), and the unseen-token fallback ln(1/(n_toks_c + V)) —
  * is one IEEE division plus one libm ln, sig9-normalized; per-doc
  * sums accumulate the exact products count × sig9(ln) through
  * DECIMAL ([[Q.dsum]]). Argmax ties break to the smallest label
  * (scores are sig9'd, so "tie" is engine-independent).
  */
object NaiveBayes {

  /** Per-(doc, class) log-posterior scores.
    *
    * @param train  (idCol, labelCol, toksCol) — labeled documents
    * @param score  (idCol, toksCol) — documents to score (may overlap
    *               train; extra columns pass through ignored)
    * @return (idCol, label, score) with one row per scored doc per
    *         training class — docs with zero/only-unseen tokens still
    *         score on the prior + unseen terms.
    */
  def score(train: DataFrame, scoreDocs: DataFrame, idCol: String,
      labelCol: String, toksCol: String): DataFrame = {
    val lbl = col(labelCol)

    // class doc counts from the UN-exploded frame (empty-token docs
    // still carry prior mass) + token totals from the exploded one
    val trTok = train.select(lbl.as("label"),
      explode(col(toksCol)).as("t"))
    val clsDocs = train.groupBy(lbl.as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val clsToks = trTok.groupBy("label").agg(count(lit(1)).as("n_toks"))
    val cls = clsDocs.join(clsToks, Seq("label"), "left")
      .na.fill(0L, Seq("n_toks"))
    val totals = cls.agg(sum(col("n_docs")).cast("long").as("n_total_docs"))
    val vocab = trTok.select(col("t")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("v_size"))

    // bounded class table with prior + unseen log-probs attached
    val clsFull = cls
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .withColumn("lprior", Q.sig9(log(col("n_docs").cast("double") /
        col("n_total_docs").cast("double"))))
      .withColumn("lp_unseen", Q.sig9(log(lit(1.0) /
        (col("n_toks") + col("v_size")).cast("double"))))

    // complete (token, class) likelihood table: vocab x classes, zero
    // counts filled — so every in-vocab token resolves for EVERY class
    val tokCnt = trTok.groupBy(col("t"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val tokLp = vocab.crossJoin(broadcast(
        clsFull.select(col("label"), col("n_toks"), col("v_size"))))
      .join(tokCnt, Seq("t", "label"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("lp", Q.sig9(log((col("cnt") + lit(1.0)) /
        (col("n_toks") + col("v_size")).cast("double"))))
      .select(col("t"), col("label"), col("lp"))

    // score side: per-doc token counts + totals (from array size, so
    // token-less docs still get a (doc, class) base row)
    val docTot = scoreDocs.select(col(idCol),
      size(col(toksCol)).cast("long").as("n_total"))
    val docTok = scoreDocs.select(col(idCol), explode(col(toksCol)).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("dcnt"))
    val matched = docTok.join(tokLp, Seq("t"))
      .groupBy(col(idCol), col("label"))
      .agg(Q.dsum(col("dcnt") * col("lp")).as("s_tok"),
        sum(col("dcnt")).as("m"))

    docTot.crossJoin(broadcast(clsFull.select(
        col("label"), col("lprior"), col("lp_unseen"))))
      .join(matched, Seq(idCol, "label"), "left")
      .na.fill(0.0, Seq("s_tok")).na.fill(0L, Seq("m"))
      .withColumn("score", Q.sig9(col("lprior") + col("s_tok") +
        (col("n_total") - col("m")).cast("double") * col("lp_unseen")))
      .select(col(idCol), col("label"), col("score"))
  }

  /** Argmax over [[score]] output with smallest-label tie-break:
    * (idCol, pred, best_score). */
  def predict(scored: DataFrame, idCol: String): DataFrame = {
    val best = scored.groupBy(col(idCol))
      .agg(max(col("score")).as("best_score"))
      .withColumnRenamed(idCol, "__best_id")
    scored.join(best,
        col(idCol) === col("__best_id") &&
          col("score") === col("best_score"))
      .groupBy(col(idCol), col("best_score"))
      .agg(min(col("label")).as("pred"))
      .select(col(idCol), col("pred"), col("best_score"))
  }
}
