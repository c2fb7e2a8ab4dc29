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

  test("pair construction is deterministic") {
    val a = Contrastive.pairs(nearDups, corpus).collect().toSet
    val b = Contrastive.pairs(nearDups, corpus).collect().toSet
    assert(a == b)
  }
}
