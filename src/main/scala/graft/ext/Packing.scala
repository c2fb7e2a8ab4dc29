package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in a
  * deterministic order (id order within a group) and the token stream is
  * chopped into fixed-`capacity` training sequences (the GPT-2/LLaMA
  * concatenate-and-chunk recipe). The operator computes, per document,
  * its global token offset in the group's stream and the first/last
  * sequence ids it lands in — everything a downstream packer/writer
  * needs to emit the actual blocks, and everything an attention-masking
  * audit needs (`spans_boundary` marks documents split across
  * sequences).
  *
  * Scale design — the offset is a distributed prefix sum, NOT one
  * window per group: `SUM() OVER (PARTITION BY group ORDER BY id)` puts
  * an entire group on one reducer, which dies exactly when one source
  * dominates the corpus (the normal case: web text is most of a 100 TB
  * mix). Instead the classic two-phase scan:
  *
  *  1. bucket documents by id range; a windowed sum WITHIN (group,
  *     bucket) runs on bounded partitions regardless of group skew;
  *  2. per-bucket token totals — an O(#buckets) frame — get a running
  *     base offset per group (tiny window), and broadcast-join back.
  *
  * offset = bucket base + within-bucket prefix. Identical result to the
  * single-window form (the DuckDB oracle IS the single-window form),
  * but every shuffle partition is bounded by `bucketSize` documents.
  */
object Packing {

  /** Per-document packing coordinates.
    *
    * Input: one row per document with a group column (stream identity:
    * source, split, ...), an orderable id, and a token count. Output
    * adds: `tok_offset` (tokens before this doc in its group's stream),
    * `first_seq`/`last_seq` (sequence ids of capacity `capacity` the
    * doc occupies; empty docs take first_seq), `spans_boundary`.
    *
    * Bucketing contract: buckets are ID-RANGE slices (`id div
    * bucketSize`), derived ONLY when the id column is a numeric type —
    * the bucket must be monotone in the same order the within-bucket
    * window sorts by, and for a STRING id holding numeric text the
    * numeric cast buckets '600' before '5000' while the window sorts
    * it after (a silent wrong-offset path). Non-numeric id columns
    * therefore take a constant bucket: every row lands in one bucket
    * per group, which stays CORRECT (offsets follow the column's own
    * lexicographic order) but degrades to the naive single-window
    * shape — densify string ids to numeric ordinals to get the
    * two-phase bound back. For numeric ids pick bucketSize ≈ id_span /
    * desired_buckets; sparse 60-bit hash ids would put ~1 doc per
    * bucket (the bases frame then approaches one row per doc and the
    * per-group bucket window re-centralizes): densify those first too.
    * The bases join deliberately carries no broadcast hint: AQE
    * broadcasts it while it is small and falls back to a shuffle join
    * if a degenerate bucketing inflates it, instead of OOMing the
    * driver.
    */
  def packSequences(df: DataFrame, capacity: Int,
                    groupCol: String = "source", idCol: String = "doc_id",
                    nTokCol: String = "n_tokens",
                    bucketSize: Long = 4096L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val numericId = df.select(col(idCol)).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bktExpr =
      if (numericId) (col("id").cast("long") / bucketSize).cast("long")
      else lit(0L)
    val b = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(nTokCol).cast("long").as("n_tok"))
      .withColumn("bkt", bktExpr)
    val wIn = Window.partitionBy(col("grp"), col("bkt")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = b.withColumn("local_off",
      coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
    val wBkt = Window.partitionBy(col("grp")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = b.groupBy(col("grp"), col("bkt"))
      .agg(sum(col("n_tok")).as("bkt_tok"))
      .withColumn("base", coalesce(sum(col("bkt_tok")).over(wBkt), lit(0L)))
      .select(col("grp"), col("bkt"), col("base"))
    // integer `div`, not double `/`: a 100 TB group's token offsets
    // exceed 2^53 and double division would misplace sequence ids
    within.join(bases, Seq("grp", "bkt"))
      .withColumn("tok_offset", col("base") + col("local_off"))
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("n_tok").as("n_tokens"), col("tok_offset"))
      .withColumn("first_seq", expr(s"tok_offset div ${capacity.toLong}L"))
      .withColumn("last_seq",
        expr(s"(tok_offset + greatest(n_tokens, 1L) - 1L) div ${capacity.toLong}L"))
      .withColumn("spans_boundary", col("first_seq") =!= col("last_seq"))
  }

  /** Materialize the per-sequence block layout from [[packSequences]]
    * coordinates — the rows a block writer consumes to emit actual
    * fixed-`capacity` training sequences, and the other half of the
    * packing pair (coordinates say WHERE each document lands; blocks
    * say what each SEQUENCE contains).
    *
    * One row per (sequence, document-slice): `seq_off` is where the
    * slice starts inside the sequence, `doc_off` where it starts
    * inside the document, `len` its token length. A document spanning
    * a boundary appears in BOTH adjacent sequences with complementary
    * slices (doc_off partitions its tokens exactly); zero-token
    * documents surface with len 0 in their first_seq, keeping the
    * audit contract that every input row is accounted for.
    *
    * Scale shape: a pure map-side explode of `sequence(first_seq,
    * last_seq)` — output rows = total sequence-slices, the inherent
    * output size (a document of T tokens lands in ceil(T/capacity)+1
    * sequences at most); no shuffle, no window. Writers group by
    * (groupCol, seq_id) and order slices by seq_off.
    *
    * Pass the SAME `capacity` the coordinates were computed with —
    * it is part of the coordinate system, not a free knob here. */
  def emitBlocks(coords: DataFrame, capacity: Int,
                 groupCol: String = "source",
                 idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val cap = lit(capacity.toLong)
    coords
      .select(col(groupCol), col(idCol), col("n_tokens"), col("tok_offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .select(col(groupCol), col("seq_id"), col(idCol),
        greatest(col("tok_offset") - col("seq_id") * cap, lit(0L))
          .as("seq_off"),
        greatest(col("seq_id") * cap - col("tok_offset"), lit(0L))
          .as("doc_off"),
        (least(col("tok_offset") + col("n_tokens"), (col("seq_id") + 1) * cap)
          - greatest(col("tok_offset"), col("seq_id") * cap)).as("len"))
  }
}
