package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))

  private val corpus = toks(
    1L -> "x x x y pad pad pad",
    2L -> "x z pad pad pad pad pad",
    3L -> "w w pad pad pad pad pad")
  private val terms = Seq("x", "y").toDF("term")

  test("bm25 ranks by matched-term weight; non-matching docs are absent") {
    val r = Retrieval.bm25TopK(corpus, "doc_id", "tk", terms)
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
      .sortBy(_._2)
    assert(r.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 matches nothing
    assert(r.map(_._2).toSeq == Seq(1L, 2L)) // ranks 1..k, no gaps
    val byDoc = r.map(x => x._1 -> x).toMap
    assert(byDoc(1L)._3 > byDoc(2L)._3) // tf 3+1 on both terms beats tf 1
    assert(byDoc(1L)._4 == 2L && byDoc(2L)._4 == 1L) // n_terms_matched
    assert(r.forall(_._3 > 0)) // the +1 idf floor keeps scores positive
  }

  test("k truncates the ranking deterministically") {
    val top1 = Retrieval.bm25TopK(corpus, "doc_id", "tk", terms, k = 1)
      .collect()
    assert(top1.length == 1 && top1.head.getLong(0) == 1L)
  }

  test("duplicate query terms don't double-count") {
    val dup = Seq("x", "x", "y").toDF("term")
    val a = Retrieval.bm25TopK(corpus, "doc_id", "tk", terms).collect().toSet
    val b = Retrieval.bm25TopK(corpus, "doc_id", "tk", dup).collect().toSet
    assert(a == b)
  }

  test("rrf: consensus docs outrank single-ranking wins; absent pairs " +
      "contribute nothing; ties break by doc id") {
    val r1 = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("qid", "doc_id", "rank")
    val r2 = Seq(("q", 2L, 1L), ("q", 4L, 2L), ("q", 1L, 3L))
      .toDF("qid", "doc_id", "rank")
    val fused = Retrieval.rrf(Seq(r1, r2))
      .as[(String, Long, Long, Double, Long)].collect()
      .map(t => t._2 -> ((t._3, t._4, t._5))).toMap
    // doc 2: 1/62 + 1/61 beats doc 1: 1/61 + 1/63
    assert(fused(2L)._3 == 1L && fused(1L)._3 == 2L)
    assert(fused(2L)._1 == 2L && fused(4L)._1 == 1L)
    // docs 3 and 4: 1/63 vs 1/62 - doc 4 ahead; both rank behind
    // the two-ranking docs
    assert(fused(4L)._3 == 3L && fused(3L)._3 == 4L)
    // score sanity: decimal-summed, sig9'd
    assert(math.abs(fused(2L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
  }

  test("scores are reproducible across partitionings") {
    val docs = (1L to 300L)
      .map(i => (i, s"t${i % 5} t${i % 11} t${i % 3} filler$i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))
    val q = Seq("t1", "t2", "t4").toDF("term")
    val once = Retrieval.bm25TopK(docs, "doc_id", "tk", q)
      .collect().toSet
    val again = Retrieval.bm25TopK(docs.repartition(13), "doc_id", "tk", q)
      .collect().toSet
    assert(once == again)
  }

  // ===== NDCG ==========================================================

  private def w2(i: Int) = 1.0 / (math.log(i + 1.0) / math.log(2.0))

  test("ndcg: ideal ordering scores exactly 1; reversal is penalized " +
      "by the literal-weight fold") {
    import graft.functions.GraftMath
    val ideal = Seq((1L, 2L), (2L, 1L), (3L, 0L)).toDF("rank", "rel")
    val gi = Retrieval.ndcg(ideal, Seq.empty, "rank", "rel", 10).head()
    assert(gi.getAs[Double]("ndcg") == 1.0)
    assert(gi.getAs[Long]("n_ranked") == 3L)
    val rev = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("rank", "rel")
    val gr = Retrieval.ndcg(rev, Seq.empty, "rank", "rel", 10).head()
    val dcg = 0.0 * w2(1) + 1.0 * w2(2) + 2.0 * w2(3)
    val idcg = 2.0 * w2(1) + 1.0 * w2(2) + 0.0 * w2(3)
    assert(gr.getAs[Double]("ndcg") == GraftMath.sig9(dcg / idcg))
    assert(gr.getAs[Double]("ndcg") < 1.0)
    assert(gr.getAs[Double]("dcg") == GraftMath.sig9(dcg))
    assert(gr.getAs[Double]("idcg") == GraftMath.sig9(idcg))
  }

  test("ndcg: rows past k are ignored; all-zero grades -> NULL; " +
      "per-key grouping keeps queries independent") {
    val past = Seq((1L, 1L), (2L, 1L), (5L, 9L)).toDF("rank", "rel")
    val gp = Retrieval.ndcg(past, Seq.empty, "rank", "rel", 3).head()
    assert(gp.getAs[Long]("n_ranked") == 2L)
    assert(gp.getAs[Double]("ndcg") == 1.0) // surviving rows are ideal
    val zero = Seq((1L, 0L), (2L, 0L)).toDF("rank", "rel")
    val gz = Retrieval.ndcg(zero, Seq.empty, "rank", "rel", 10).head()
    assert(gz.isNullAt(gz.fieldIndex("ndcg")))
    val keyed = Seq(("q1", 1L, 2L), ("q1", 2L, 1L),
      ("q2", 1L, 0L), ("q2", 2L, 3L)).toDF("q", "rank", "rel")
    val gk = Retrieval.ndcg(keyed, Seq("q"), "rank", "rel", 10)
      .orderBy("q").collect()
    assert(gk(0).getAs[Double]("ndcg") == 1.0)
    assert(gk(1).getAs[Double]("ndcg") < 1.0)
  }

  // ===== rankEval (MRR / P@k / R@k / hit@k) ============================

  test("rankEval: first relevant at rank 3 of 5 -> mrr 1/3; judged rows " +
      "past k widen the recall base but not the @k numerators") {
    import graft.functions.GraftMath
    // ranks 1..4 judged; rel at 3 and at 6 (past k=4)
    val rl = Seq((1L, 0L), (2L, 0L), (3L, 2L), (4L, 0L), (6L, 1L))
      .toDF("rank", "rel")
    val r = Retrieval.rankEval(rl, Seq.empty, "rank", "rel", k = 4).head()
    assert(r.getAs[Double]("mrr") == GraftMath.sig9(1.0 / 3.0))
    assert(r.getAs[Long]("first_rel_rank") == 3L)
    assert(r.getAs[Long]("n_rel_at_k") == 1L)
    assert(r.getAs[Long]("n_rel_total") == 2L) // rank-6 row counts here
    assert(r.getAs[Double]("prec_at_k") == GraftMath.sig9(1.0 / 4.0))
    assert(r.getAs[Double]("recall_at_k") == GraftMath.sig9(1.0 / 2.0))
    assert(r.getAs[Long]("hit_at_k") == 1L)
    assert(r.getAs[Long]("n_ranked") == 5L)
  }

  test("rankEval: no relevant row -> mrr 0, recall NULL, hit 0; " +
      "per-key grouping keeps queries independent") {
    val rl = Seq((1L, 0L), (2L, 0L)).toDF("rank", "rel")
    val r = Retrieval.rankEval(rl, Seq.empty, "rank", "rel", k = 10).head()
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.isNullAt(r.fieldIndex("recall_at_k")))
    assert(r.getAs[Long]("hit_at_k") == 0L)
    assert(r.isNullAt(r.fieldIndex("first_rel_rank")))
    assert(r.getAs[Double]("prec_at_k") == 0.0)
    val keyed = Seq(("q1", 1L, 1L), ("q1", 2L, 0L),
      ("q2", 1L, 0L), ("q2", 2L, 1L)).toDF("q", "rank", "rel")
    val gk = Retrieval.rankEval(keyed, Seq("q"), "rank", "rel", k = 2)
      .orderBy("q").collect()
    assert(gk(0).getAs[Double]("mrr") == 1.0)
    assert(gk(1).getAs[Double]("mrr") == 0.5)
    assert(gk(0).getAs[Double]("recall_at_k") == 1.0)
    assert(gk(1).getAs[Double]("recall_at_k") == 1.0)
  }
test("rbo: hand prefixes at p = 0.5; identical lists hit 1 - p^k; " +
      "disjoint lists score 0") {
    import spark.implicits._
    def rk(items: String*) =
      items.zipWithIndex.map { case (it, i) => (it, i + 1) }
        .toDF("item", "rank")
    val got = Retrieval.rbo(rk("x", "y", "z"), rk("x", "z", "w"),
        "item", "rank", k = 3, p = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // X = (1, 1, 2); terms .5, .125, 2/3*.125
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 2L)
    assert(near(got(1L)._2, 0.5) && near(got(2L)._2, 0.625) &&
      near(got(3L)._2, 0.625 + 0.5 * 0.25 * 2.0 / 3.0))
    val same = Retrieval.rbo(rk("a", "b", "c"), rk("a", "b", "c"),
        "item", "rank", 3, 0.5)
      .where(col("depth") === 3).head().getDouble(4)
    assert(near(same, 1.0 - 0.125)) // 1 - p^k
    val disj = Retrieval.rbo(rk("a", "b"), rk("c", "d"),
        "item", "rank", 2, 0.5)
      .where(col("depth") === 2).head().getDouble(4)
    assert(disj == 0.0)
  }
}
