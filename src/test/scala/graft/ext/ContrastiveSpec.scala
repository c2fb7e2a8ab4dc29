package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 500L).toDF("doc_id")
  private def nearDups = Seq((1L, 101L), (2L, 102L), (3L, 103L),
    (50L, 150L)).toDF("a_id", "b_id")

  test("triples are complete and negatives avoid anchor/positive") {
    val r = Contrastive.pairs(nearDups, corpus)
      .as[(Long, Long, Option[Long])].collect()
    assert(r.length == 4)
    r.foreach { case (a, p, n) =>
      assert(n.nonEmpty, s"anchor $a got no negative from a 500-doc corpus")
      assert(!n.contains(a) && !n.contains(p), s"negative collides: $a/$p")
      assert(n.exists(v => v >= 1L && v <= 500L), "negative not in corpus")
    }
  }

  test("an anchor's OTHER near-dup partners are never its negative") {
    // corpus contains ONLY the anchor and its two verified partners:
    // every bucket-min candidate is anchor-or-partner, so the pick
    // must fall through to NULL rather than emit a contradictory triple
    val c3 = Seq(1L, 2L, 3L).toDF("doc_id")
    val nd = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val r = Contrastive.pairs(nd, c3)
      .as[(Long, Long, Option[Long])].collect()
    assert(r.length == 2)
    r.foreach { case (a, p, n) =>
      assert(n.isEmpty, s"triple ($a,$p) picked a near-dup partner $n")
    }
  }

  test("pair construction is deterministic") {
    val a = Contrastive.pairs(nearDups, corpus).collect().toSet
    val b = Contrastive.pairs(nearDups, corpus).collect().toSet
    assert(a == b)
  }
}
