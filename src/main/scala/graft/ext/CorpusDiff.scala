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
}
