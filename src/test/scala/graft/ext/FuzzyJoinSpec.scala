package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.toDF("id", "tk").withColumn("tk", col("tk").cast("array<string>"))

  private def run(l: Seq[(Long, Seq[String])], r: Seq[(Long, Seq[String])],
      t: Double): Set[(Long, Long, Double)] =
    FuzzyJoin.jaccardJoin(toksDf(l), "id", "tk", toksDf(r), "id", "tk", t)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet

  /** Brute-force expected pairs over distinct STRING sets (the md5
    * token hashes are collision-free at test sizes, so hash-space
    * Jaccard equals string-space Jaccard here). */
  private def brute(l: Seq[(Long, Seq[String])], r: Seq[(Long, Seq[String])],
      t: Double): Set[(Long, Long, Double)] =
    (for {
      (lid, lt) <- l; (rid, rt) <- r
      la = lt.toSet; ra = rt.toSet
      if la.nonEmpty && ra.nonEmpty
      inter = (la & ra).size
      j = inter.toDouble / (la.size + ra.size - inter)
      if j >= t
    } yield (lid, rid, j)).toSet

  test("known pairs with exact jaccard values") {
    val l = Seq(1L -> Seq("red", "widget", "economy"),
      2L -> Seq("blue", "bolt", "promo"),
      3L -> Seq("hot", "gear", "standard"))
    val r = Seq(10L -> Seq("red", "widget", "deluxe"), // J = 2/4
      11L -> Seq("blue", "bolt", "promo"),             // J = 1
      12L -> Seq("green", "cog", "small"))             // J = 0
    assert(run(l, r, 0.5) ===
      Set((1L, 10L, 0.5), (2L, 11L, 1.0)))
  }

  test("prefix filtering is exact: random sets match brute force") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    def mk(n: Int, base: Long) = (0 until n).map { i =>
      (base + i,
        Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))))
    }
    val l = mk(60, 0L); val r = mk(50, 1000L)
    for (t <- Seq(0.3, 0.5, 0.8))
      assert(run(l, r, t) === brute(l, r, t), s"threshold $t diverged")
  }

  test("threshold 1.0 keeps only identical sets (order/dup-insensitive)") {
    val l = Seq(1L -> Seq("a", "b", "b", "c"), 2L -> Seq("a", "b"))
    val r = Seq(10L -> Seq("c", "a", "b"), 11L -> Seq("a", "b", "c", "d"))
    assert(run(l, r, 1.0) === Set((1L, 10L, 1.0)))
  }

  test("empty token sets never match") {
    val l = Seq(1L -> Seq.empty[String], 2L -> Seq("a"))
    val r = Seq(10L -> Seq.empty[String], 11L -> Seq("a"))
    assert(run(l, r, 0.1) === Set((2L, 11L, 1.0)))
  }

  test("plan is lint-clean: no cartesian product at any stage") {
    val l = toksDf(Seq(1L -> Seq("a", "b"), 2L -> Seq("c", "d")))
    val r = toksDf(Seq(10L -> Seq("a", "b"), 11L -> Seq("e", "f")))
    val out = FuzzyJoin.jaccardJoin(l, "id", "tk", r, "id", "tk", 0.5)
    assert(PlanLint.clean(out))
  }

  test("invalid threshold is rejected") {
    val d = toksDf(Seq(1L -> Seq("a")))
    intercept[IllegalArgumentException] {
      FuzzyJoin.jaccardJoin(d, "id", "tk", d, "id", "tk", 0.0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.jaccardJoin(d, "id", "tk", d, "id", "tk", 1.5)
    }
  }
}
