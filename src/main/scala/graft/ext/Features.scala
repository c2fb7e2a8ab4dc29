package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature engineering for in-engine model training
  * ([[Classifier]] / [[NaiveBayes]]): the deterministic vectorization
  * and encoding steps that turn raw text / categoricals into model
  * inputs WITHOUT leaving the engine or breaking reproducibility.
  * Everything here is exact-integer or single-sig9'd-division
  * arithmetic — a feature matrix built twice is bit-identical.
  */
object Features {

  /** Hashing-trick vectorizer (Weinberger et al. 2009): token →
    * bucket = hash60(token) mod dim, per-document bucket counts — the
    * fixed-dimension bag-of-words a linear model consumes, built with
    * no vocabulary pass and no driver state. Output is SPARSE long
    * format (absent buckets are zero), which joins directly against
    * per-bucket weight tables.
    *
    * Scale shape: one explode + one (doc, bucket) hash aggregate
    * (map-side partial). All counts exact BIGINTs; the bucket hash is
    * the portable md5-based [[Hashing.hash60]], so the same document
    * hashes identically on any engine, partitioning, or run.
    *
    * @return (idCol, bucket, cnt) — one row per occupied bucket */
  def featureHash(docs: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    docs.select(col(idCol),
        explode(Hashing.tokens(col(textCol))).as("tok"))
      .select(col(idCol),
        pmod(Hashing.hash60(col("tok")), lit(dim.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Leave-one-out target encoding: replace a categorical by the mean
    * of the target over the OTHER rows of its category,
    * (S_g − x_i) / (n_g − 1) — the standard high-cardinality encoding
    * that avoids leaking each row's own label into its feature
    * (Micci-Barreca 2001). Rows in singleton categories get NULL
    * (no other row to average — surfaced, never imputed from a
    * global prior silently).
    *
    * Determinism: category sums run exactly through DECIMAL(38,15)
    * (the dsum contract) and the subtraction S_g − x_i HAPPENS IN
    * DECIMAL (exact; subtracting in IEEE after a sig9'd cast would
    * lose the low digits of x_i against a large S_g); the single
    * division is sig9'd. One hash aggregate + one category-keyed
    * equi-join back.
    *
    * @return input keys + (loo) — (idCol, catCol, loo) */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
      targetCol: String): DataFrame = {
    import graft.queries.Q
    val dec = org.apache.spark.sql.types.DecimalType(38, 15)
    val rows = df.select(col(idCol), col(catCol).cast("string").as("cat"),
        col(targetCol).cast("double").as("x"))
      .where(col("cat").isNotNull && col("x").isNotNull)
    val grp = rows.groupBy(col("cat"))
      .agg(sum(col("x").cast(dec)).as("sg"), count(lit(1)).as("ng"))
    rows.join(grp, Seq("cat"))
      .select(col(idCol), col("cat").as(catCol),
        when(col("ng") > 1, Q.sig9(
          Q.sig9((col("sg") - col("x").cast(dec)).cast("double")) /
            (col("ng") - 1).cast("double"))).as("loo"))
  }
}
