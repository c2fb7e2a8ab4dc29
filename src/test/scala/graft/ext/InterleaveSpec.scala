package graft.ext

import graft.SparkSpec

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val Seed = "tdspec"

  /** Plain-Scala twin of the packed fold — the spec's independent
    * reference implementation. */
  private def reference(q: String, la: Seq[Long], lb: Seq[Long])
      : (Long, Long, Long, String) = {
    var acc = Vector.empty[Long]
    for (i <- 1 to 2 * K) {
      val r = (i - 1) / 2
      val s = (i - 1) % 2
      val coin = Hashing.hash60Local(s"$Seed:$q:$r") % 2
      val team = (coin + s) % 2
      val src = if (team == 0) la else lb
      val picked = acc.map(_ / 2)
      src.find(d => !picked.contains(d)).foreach { d =>
        acc = acc :+ (d * 2 + team)
      }
    }
    def clicked(d: Long) =
      Hashing.hash60Local(s"click:$q:$d") % Hashing.P % 5 == 0
    val ca = acc.count(e => e % 2 == 0 && clicked(e / 2))
    val cb = acc.count(e => e % 2 == 1 && clicked(e / 2))
    (acc.size.toLong, ca.toLong, cb.toLong,
      if (ca > cb) "A" else if (cb > ca) "B" else "tie")
  }

  private def run(ranks: Map[String, (Seq[Long], Seq[Long])]) = {
    val ra = ranks.toSeq.flatMap { case (q, (la, _)) =>
      la.zipWithIndex.map { case (d, i) => (q, d, i + 1) } }
      .toDF("q", "d", "rnk")
    val rb = ranks.toSeq.flatMap { case (q, (_, lb)) =>
      lb.zipWithIndex.map { case (d, i) => (q, d, i + 1) } }
      .toDF("q", "d", "rnk")
    Retrieval.teamDraftInterleave(ra, rb, "q", "d", "rnk", K, Seed)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
  }

  test("engine draft, credits and winner equal the Scala reference") {
    val ranks = Map(
      "q1" -> (Seq(1L, 2L, 3L), Seq(3L, 4L, 5L)), // overlapping doc 3
      "q2" -> (Seq(10L, 11L, 12L), Seq(10L, 11L, 12L)), // identical
      "q3" -> (Seq(20L, 21L, 22L), Seq(30L, 31L, 32L))) // disjoint
    val out = run(ranks)
    ranks.foreach { case (q, (la, lb)) =>
      assert(out(q) === reference(q, la, lb), s"query $q")
    }
  }

  test("no document is shown twice and n_shown is bounded by the union") {
    val ranks = Map("q9" -> (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
    val out = run(ranks)
    val (n, _, _, _) = out("q9")
    assert(n <= 4L && n >= 3L) // union has 4 docs, 2K slots = 6
  }

  test("identical rankings split credit only by the coin, never by doc set") {
    // both teams draft from the same list: every shown doc is shared,
    // so total credit equals total clicked shown docs
    val la = Seq(100L, 101L, 102L)
    val out = run(Map("qq" -> (la, la)))
    val (n, ca, cb, _) = out("qq")
    assert(n === 3L)
    def clicked(d: Long) =
      Hashing.hash60Local(s"click:qq:$d") % Hashing.P % 5 == 0
    assert(ca + cb === la.count(clicked).toLong)
  }
}
