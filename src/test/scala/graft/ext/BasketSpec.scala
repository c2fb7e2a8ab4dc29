package graft.ext

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1{A,B,C} 2{A,B} 3{A,C} 4{A} 5{B,C,D} — D infrequent at 2
  private val tx = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"), (2L, "B"), // duplicate incidence collapses
    (3L, "A"), (3L, "C"),
    (4L, "A"),
    (5L, "B"), (5L, "C"), (5L, "D"))
    .toDF("basket", "item").repartition(3)

  test("pairRules: exact counts, both confidences, lift; a-priori " +
      "prune drops infrequent items before pairing") {
    val got = Basket.pairRules(tx, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8),
          r.getDouble(9)))).toMap
    // item counts: A=4 B=3 C=3 (D=1 pruned); pairs: AB=2 AC=2 BC=2
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    val (pn, c1, c2, nb, sup, c12, c21, lift) = got(("A", "B"))
    assert((pn, c1, c2, nb) === ((2L, 4L, 3L, 5L)))
    assert(sup === 0.4)
    assert(c12 === 0.5)
    assert(c21 === graft.functions.GraftMath.sig9(2.0 / 3.0))
    assert(lift === graft.functions.GraftMath.sig9(10.0 / 12.0))
    // BC: both count 3, pair 2 -> lift 10/9 > 1 (positively associated)
    assert(got(("B", "C"))._8 === graft.functions.GraftMath.sig9(10.0 / 9.0))
  }

  test("pairRules: pairs below minSupport vanish even when both items " +
      "are frequent") {
    // A and E each in 2 baskets, but never together twice
    val t2 = Seq((1L, "A"), (2L, "A"), (2L, "E"), (3L, "E"))
      .toDF("basket", "item")
    assert(Basket.pairRules(t2, "basket", "item", 2L).count() === 0L)
  }
}
