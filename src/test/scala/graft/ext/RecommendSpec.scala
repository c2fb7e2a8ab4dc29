package graft.ext

import graft.SparkSpec

class RecommendSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{c,d} 5:{d}
  private val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"),
    (4L, "c"), (4L, "d"),
    (5L, "d")).toDF("bk", "it")

  private def cf(minSupport: Int = 1, topK: Int = 10,
      maxBasket: Int = 100) =
    Recommend.itemItemCf(baskets, "bk", "it", minSupport, topK, maxBasket)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))

  test("cosines are n_ab / sqrt(n_a n_b), symmetric, ranked") {
    val out = cf()
    val ab = out.find(t => t._1 == "a" && t._3 == "b").get
    // a in 3 baskets, b in 3, together 3 -> cosine 1.0
    assert(ab._4 === 3L)
    assert(ab._5 === 1.0)
    // a-c: together 1, n_a=3, n_c=2 -> 1/sqrt(6)
    val ac = out.find(t => t._1 == "a" && t._3 == "c").get
    assert(math.abs(ac._5 - 1.0 / math.sqrt(6.0)) < 1e-8)
    // symmetry: c lists a too
    assert(out.exists(t => t._1 == "c" && t._3 == "a"))
    // ranking: for a, b (1.0) before c (0.41)
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq ===
      Seq("b", "c"))
  }

  test("duplicate basket lines collapse before counting") {
    val dup = Seq((1L, "a"), (1L, "a"), (1L, "b")).toDF("bk", "it")
    val out = Recommend.itemItemCf(dup, "bk", "it", 1, 10, 100)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSet === Set(("a", 1L), ("b", 1L)))
  }

  test("minSupport prunes rare items before pairing") {
    val out = cf(minSupport = 2)
    // c (2 baskets) stays, d (2 baskets) stays; but pair c-d still from
    // basket 4; a-c survives? c appears in baskets 1 and 4 -> support 2.
    assert(out.forall(t => Set("a", "b", "c", "d")(t._1)))
    val out3 = cf(minSupport = 3)
    // only a and b have support >= 3
    assert(out3.map(_._1).toSet === Set("a", "b"))
  }

  test("maxBasketSize drops degenerate baskets before pairing") {
    val out = cf(maxBasket = 2)
    // basket 1 (3 surviving items) is dropped: a-c and b-c pairs vanish,
    // c-d (basket 4, size 2) stays
    assert(!out.exists(t => t._1 == "a" && t._3 == "c"))
    assert(out.exists(t => t._1 == "c" && t._3 == "d"))
    // a-b still co-occur in baskets 2 and 3
    assert(out.find(t => t._1 == "a" && t._3 == "b").get._4 === 2L)
  }

  test("topK keeps the K best neighbors, ties broken by neighbor id") {
    // x co-occurs once with each of y and z (equal cosine): tie -> y
    val t = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "z"))
      .toDF("bk", "it")
    val out = Recommend.itemItemCf(t, "bk", "it", 1, 1, 100)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out.contains(("x", "y")))
    assert(!out.contains(("x", "z")))
  }

  test("als2 recovers rank-1 structure: item factors scale linearly " +
      "with the item's rating column") {
    // r(u, i) = u * i is rank-1: after any user step the per-item
    // normal equations share one A matrix, so q_i = i * c exactly
    // (up to sig9 rounding) regardless of the id-based init
    val ratings = for (u <- 1 to 6; i <- 1 to 4)
      yield (u.toLong, i.toLong, (u * i).toDouble)
    val f = Recommend.als2(ratings.toDF("u", "i", "r"), "u", "i", "r",
      lambda = 0.01, iters = 2).collect()
      .map(r => r.getAs[Long]("item") ->
        (r.getAs[Double]("f1"), r.getAs[Double]("f2"))).toMap
    val c = f(1L)
    // tolerance 1e-3 relative: rank-1 data makes A = XᵀX + λI nearly
    // singular, so the per-step sig9 roundings (1e-9) amplify by the
    // condition number ~ trace/λ through the closed-form solve and
    // compound across the two sweeps (measured ~1e-4 at λ=0.01)
    for (i <- 2 to 4; v = f(i.toLong)) {
      assert(math.abs(v._1 - i * c._1) < 1e-3 * math.abs(i * c._1) + 1e-9,
        s"f1($i)=${v._1} != $i*${c._1}")
      assert(math.abs(v._2 - i * c._2) < 1e-3 * math.abs(i * c._2) + 1e-9,
        s"f2($i)=${v._2} != $i*${c._2}")
    }
    // all users rated every item
    assert(Recommend.als2(ratings.toDF("u", "i", "r"), "u", "i", "r",
      0.01, 1).collect().forall(_.getAs[Long]("n_users") == 6L))
  }

  test("als2: items with identical rating columns get identical " +
      "factors after a full sweep (init differences wash out)") {
    // items 5 and 7 (different hash60-based inits) rated identically
    val ratings = Seq(
      (1L, 5L, 3.0), (2L, 5L, 1.0), (3L, 5L, 4.0),
      (1L, 7L, 3.0), (2L, 7L, 1.0), (3L, 7L, 4.0),
      (1L, 2L, 9.0), (2L, 2L, 2.0))
    val f = Recommend.als2(ratings.toDF("u", "i", "r"), "u", "i", "r",
      lambda = 0.1, iters = 1).collect()
      .map(r => r.getAs[Long]("item") ->
        (r.getAs[Double]("f1"), r.getAs[Double]("f2"))).toMap
    assert(f(5L) == f(7L))
    assert(f(5L) != f(2L))
  }
}
