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

  // ===== containmentJoin ==============================================

  private def runC(l: Seq[(Long, Seq[String])], r: Seq[(Long, Seq[String])],
      t: Double): Set[(Long, Long, Double)] =
    FuzzyJoin.containmentJoin(toksDf(l), "id", "tk", toksDf(r), "id",
        "tk", t)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet

  private def bruteC(l: Seq[(Long, Seq[String])],
      r: Seq[(Long, Seq[String])], t: Double): Set[(Long, Long, Double)] =
    (for {
      (lid, lt) <- l; (rid, rt) <- r
      la = lt.toSet; ra = rt.toSet
      if la.nonEmpty && ra.nonEmpty
      c = (la & ra).size.toDouble / la.size
      if c >= t
    } yield (lid, rid, c)).toSet

  test("containment: a subset is contained at 1.0 however large the " +
      "container; jaccard would reject the same pair") {
    val l = Seq((1L, Seq("alpha", "beta")))
    val r = Seq((10L, Seq("alpha", "beta", "c", "d", "e", "f", "g", "h")))
    assert(runC(l, r, 1.0) == Set((1L, 10L, 1.0)))
    assert(run(l, r, 0.5).isEmpty, "J = 2/8 < 0.5 — asymmetry matters")
  }

  test("containment is exact vs brute force and properly asymmetric") {
    val l = (1L to 40L).map(i =>
      (i, (0 until (i % 5 + 2).toInt).map(j => s"t${(i + j * 7) % 13}")))
    val r = (100L to 140L).map(i =>
      (i, (0 until (i % 9 + 3).toInt).map(j => s"t${(i + j * 3) % 13}")))
    for (t <- Seq(0.5, 0.7, 1.0)) {
      assert(runC(l, r, t) == bruteC(l, r, t), s"t=$t")
    }
    // asymmetry: swapping sides changes the answer set
    assert(runC(l, r, 0.7).map(p => (p._2, p._1)) != runC(r, l, 0.7)
      .map(p => (p._1, p._2)) || bruteC(l, r, 0.7) != bruteC(r, l, 0.7)
      .map(p => (p._2, p._1, p._3)))
  }

  test("containment: probe tokens absent from the index match nothing " +
      "but do not break the prefix") {
    val l = Seq((1L, Seq("zz1", "zz2", "shared")), (2L, Seq("zz3", "zz4")))
    val r = Seq((10L, Seq("shared", "x", "y")))
    // C(1, 10) = 1/3 < 0.34? threshold 1/3: ceil handling — use 0.3
    assert(runC(l, r, 0.3) == bruteC(l, r, 0.3))
    assert(runC(l, r, 0.5).isEmpty)
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

  // ===== editJoin (deletion-neighborhood edit-distance join) =========

  private def strDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("id", "s")

  private def runEdit(l: Seq[(Long, String)], r: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editJoin(strDf(l), "id", "s", strDf(r), "id", "s", d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def bruteEdit(l: Seq[(Long, String)], r: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Long)] =
    (for {
      (lid, ls) <- l; (rid, rs) <- r
      dist = lev(ls, rs) if dist <= d
    } yield (lid, rid, dist.toLong)).toSet

  test("editJoin d=1: substitutions, inserts, deletes — and nothing else") {
    val l = Seq(1L -> "kitten", 2L -> "flaw", 3L -> "abc")
    val r = Seq(10L -> "sitten", // substitution: d=1
      11L -> "flaws",            // insertion: d=1
      12L -> "fla",              // deletion from flaw: d=1
      13L -> "kitten",           // exact: d=0
      14L -> "mitten",           // d=1 from kitten
      15L -> "zzz")              // unrelated
    assert(runEdit(l, r, 1) === bruteEdit(l, r, 1))
    assert(runEdit(l, r, 1).contains((1L, 13L, 0L)))
    assert(!runEdit(l, r, 1).exists(_._2 == 15L))
  }

  test("editJoin d=2 matches brute force on a random-ish key set") {
    val keys = Seq("Supplier#01", "Supplier#02", "Supplier#12",
      "Supplier#92", "Suplier#01", "Supplier#015", "Sopplier#41",
      "abc", "acb", "bca", "")
    val l = keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    assert(runEdit(l, l, 2) === bruteEdit(l, l, 2))
  }

  test("editJoin: empty strings pair with strings within d") {
    val l = Seq(1L -> "", 2L -> "a", 3L -> "ab")
    assert(runEdit(l, l, 1) === bruteEdit(l, l, 1))
  }

  test("deletionVariants: exact set for a 3-char string at d=1") {
    val v = strDf(Seq(1L -> "abc"))
      .select(explode(FuzzyJoin.deletionVariants(col("s"), 1)).as("v"))
      .collect().map(_.getString(0)).toSet
    assert(v === Set("abc", "bc", "ac", "ab"))
  }

  test("editJoin plan stays lint-clean (no cartesian anywhere)") {
    val l = strDf(Seq(1L -> "aa", 2L -> "bb"))
    val out = FuzzyJoin.editJoin(l, "id", "s", l, "id", "s", 1)
    assert(PlanLint.clean(out))
  }

  test("editJoin: invalid maxDist rejected") {
    val l = strDf(Seq(1L -> "aa"))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editJoin(l, "id", "s", l, "id", "s", 0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.editJoin(l, "id", "s", l, "id", "s", 4)
    }
  }
}
