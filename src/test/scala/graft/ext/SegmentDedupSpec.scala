package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g h i j"), // segs(4): "a b c d", "e f g h", "i j"
    (2L, "a b c d x y z w"),     // shares "a b c d" with doc 1
    (3L, "p q r s"),             // unique
    (4L, "")                     // no tokens
  ).toDF("doc_id", "text")

  test("segments splits into fixed-width windows with a short tail") {
    val segs = docs.select(col("doc_id"),
        Dedup.segments(Hashing.tokens(col("text")), 4).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(segs(1L) == Seq("a b c d", "e f g h", "i j"))
    assert(segs(3L) == Seq("p q r s"))
    assert(segs(4L) == Seq.empty)
  }

  test("cross-doc segments drop everywhere; order and empties survive") {
    val r = Dedup.segmentDedup(docs, width = 4, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((3L, 2L, "e f g h i j")))
    assert(r(2L) == ((2L, 1L, "x y z w")))
    assert(r(3L) == ((1L, 1L, "p q r s")))
    assert(r(4L) == ((0L, 0L, "")))
  }

  test("a segment repeated WITHIN one doc is not boilerplate") {
    val d = Seq((1L, "a b a b"), (2L, "c d e f")).toDF("doc_id", "text")
    val r = Dedup.segmentDedup(d, width = 2, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // "a b" occurs twice but in one distinct doc -> both copies kept
    assert(r(1L) == ((2L, 2L, "a b a b")))
  }
}
