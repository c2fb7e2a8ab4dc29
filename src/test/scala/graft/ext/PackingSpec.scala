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

  test("emitBlocks: boundary docs slice complementarily into both " +
      "sequences; empty docs keep a len-0 row") {
    val d = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 4L),
        ("g", 4L, 0L))
      .toDF("source", "doc_id", "n_tokens")
    val coords = Packing.packSequences(d, capacity = 16, bucketSize = 2L)
    val blocks = Packing.emitBlocks(coords, capacity = 16)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._2, t._3) -> (t._4, t._5, t._6)).toMap
    // doc 2 (offset 10, 10 tokens) spans seq 0/1: 6 tokens then 4
    assert(blocks((0L, 1L)) == ((0L, 0L, 10L)))
    assert(blocks((0L, 2L)) == ((10L, 0L, 6L)))  // seq 0 from slot 10
    assert(blocks((1L, 2L)) == ((0L, 6L, 4L)))   // seq 1 from doc tok 6
    assert(blocks((1L, 3L)) == ((4L, 0L, 4L)))
    assert(blocks((1L, 4L)) == ((8L, 0L, 0L)))   // empty doc accounted
    assert(blocks.size == 5)
    // every sequence's non-empty slices tile it contiguously
    val bySeq = blocks.toSeq.groupBy(_._1._1)
    bySeq.foreach { case (_, sl) =>
      val spans = sl.map(_._2).filter(_._3 > 0)
        .map(s => (s._1, s._1 + s._3)).sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, e), (b2, _)) => assert(e == b2)
        case _ => ()
      }
    }
  }

  test("string ids take the constant bucket: offsets follow the " +
      "column's own (lexicographic) order consistently") {
    // numeric text ids: '600' sorts lexicographically AFTER '5000';
    // the pre-fix numeric-cast bucket put it in an EARLIER bucket,
    // yielding offsets that corresponded to no total order at all
    val d = Seq(("g", "5000", 10L), ("g", "600", 4L), ("g", "70", 2L))
      .toDF("source", "doc_id", "n_tokens")
    val got = Packing.packSequences(d, capacity = 16, bucketSize = 2L)
      .select("doc_id", "tok_offset").as[(String, Long)].collect().toMap
    // lexicographic order: "5000" < "600" < "70"
    assert(got == Map("5000" -> 0L, "600" -> 10L, "70" -> 14L))
  }
}
