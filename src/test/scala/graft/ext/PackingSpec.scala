package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (0L until 300L)
    .map(i => (s"g${i % 3}", i, (i % 7) * 3 + 1))
    .toDF("source", "doc_id", "n_tokens")

  private type Row7 = (String, Long, Long, Long, Long, Long, Boolean)

  test("two-phase offsets equal the single-window reference") {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.withColumn("exp_off",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    val got = Packing.packSequences(df, capacity = 16, bucketSize = 32L)
    assert(got.join(ref, Seq("source", "doc_id"))
      .filter(col("tok_offset") =!= col("exp_off")).count() == 0)
  }

  test("bucket size never changes the result") {
    val a = Packing.packSequences(df, 16, bucketSize = 8L)
      .as[Row7].collect().toSet
    val b = Packing.packSequences(df, 16, bucketSize = 1000L)
      .as[Row7].collect().toSet
    assert(a == b)
  }

  test("sequence ids, boundary spans, and empty docs") {
    val d = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 4L),
        ("g", 4L, 0L))
      .toDF("source", "doc_id", "n_tokens")
    val r = Packing.packSequences(d, capacity = 16, bucketSize = 2L)
      .as[Row7].collect().map(t => t._2 -> t).toMap
    // offsets 0, 10, 20, 24; capacity 16
    assert(r(1L) == (("g", 1L, 10L, 0L, 0L, 0L, false)))
    assert(r(2L) == (("g", 2L, 10L, 10L, 0L, 1L, true))) // tokens 10..19
    assert(r(3L) == (("g", 3L, 4L, 20L, 1L, 1L, false)))
    assert(r(4L) == (("g", 4L, 0L, 24L, 1L, 1L, false))) // empty: no span
  }
}
