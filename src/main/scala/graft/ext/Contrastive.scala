package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contrastive training-pair construction from near-duplicate
  * structure: every verified near-dup pair (a, b) becomes an
  * (anchor, positive); the negative is a deterministic hash-pick from
  * the corpus — the (anchor, positive, negative) triples an embedding
  * model trains on, derived entirely from pipeline artifacts.
  *
  * The negative pick is designed for scale AND determinism: the corpus
  * ids reduce to a `buckets`-row (bucket -> min id) table (one
  * aggregate, broadcast); each anchor probes the bucket named by its
  * salted hash, falling forward up to two buckets past entries that
  * are empty or invalid. A candidate is invalid if it is the anchor,
  * the positive, or ANY verified near-dup partner of the anchor (the
  * symmetrized pair set adjudicates this — training a model to push an
  * anchor away from its own near-duplicate would contradict the
  * positive signal). No global ordering, no per-anchor corpus pass, no
  * rand(). With B buckets at occupancy n/B, three consecutive failures
  * need three empty-or-invalid buckets (negligible for B ≪ n); a row
  * that still fails keeps a NULL negative rather than a biased one. */
object Contrastive {

  def pairs(nearDups: DataFrame, corpusIds: DataFrame,
            idCol: String = "doc_id", buckets: Int = 64,
            salt: String = "neg"): DataFrame = {
    val b = lit(buckets.toLong)
    val mins = corpusIds.select(col(idCol).as("cid"))
      .groupBy((Hashing.hash60(col("cid").cast("string")) % b).as("bkt"))
      .agg(min(col("cid")).as("m"))
    val base = nearDups.select(col("a_id"), col("b_id"),
      (Hashing.hash60(concat(lit(salt + ":"), col("a_id").cast("string")))
        % b).as("h0"))
    // symmetrized partner set: (anchor, candidate) membership marks the
    // candidate as one of the anchor's OWN near-dups — never a negative
    val sym = nearDups.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionByName(nearDups.select(col("b_id").as("x"), col("a_id").as("y")))
      .distinct()
    val j = base
      .join(mins.select(col("bkt").as("k0"), col("m").as("m0")),
        col("h0") === col("k0"), "left")
      .join(mins.select(col("bkt").as("k1"), col("m").as("m1")),
        (col("h0") + 1) % b === col("k1"), "left")
      .join(mins.select(col("bkt").as("k2"), col("m").as("m2")),
        (col("h0") + 2) % b === col("k2"), "left")
      .join(sym.select(col("x").as("x0"), col("y").as("y0")),
        col("a_id") === col("x0") && col("m0") === col("y0"), "left")
      .join(sym.select(col("x").as("x1"), col("y").as("y1")),
        col("a_id") === col("x1") && col("m1") === col("y1"), "left")
      .join(sym.select(col("x").as("x2"), col("y").as("y2")),
        col("a_id") === col("x2") && col("m2") === col("y2"), "left")
    def ok(m: Column, partnerHit: Column) =
      m.isNotNull && m =!= col("a_id") && m =!= col("b_id") &&
        partnerHit.isNull
    j.select(col("a_id").as("anchor_id"), col("b_id").as("pos_id"),
      when(ok(col("m0"), col("y0")), col("m0"))
        .when(ok(col("m1"), col("y1")), col("m1"))
        .when(ok(col("m2"), col("y2")), col("m2")).as("neg_id"))
  }
}
