package graft.functions

import graft.SparkSpec
import graft.ext.TextStats
import org.apache.spark.sql.functions._

/** The Misra–Gries aggregate and the exact two-pass heavy-hitters query
  * built on it. The sketch's contract is a RETENTION guarantee (every
  * item with freq > N/(capacity+1) survives any merge order), not a
  * deterministic candidate set — so the properties pinned here are the
  * guarantee itself, the exactness of the verified output, and its
  * invariance under partitioning.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(rows: Seq[String], cap: Int, parts: Int): Set[String] =
    rows.toDF("tok").repartition(parts)
      .agg(SketchAggs.misraGries(col("tok"), cap).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet

  test("retention guarantee: freq > N/(cap+1) items survive any partitioning") {
    // 60x "hot", 25x "warm", 40 singletons -> N = 125
    val rows = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 40).map(i => s"noise_$i")
    val shuffled = new scala.util.Random(7).shuffle(rows)
    for (parts <- Seq(1, 2, 5); cap <- Seq(4, 8)) {
      val c = candidates(shuffled, cap, parts)
      // hot: 60 > 125/5; warm: 25 > 125/9 (cap 8 only)
      assert(c.contains("hot"), s"parts=$parts cap=$cap lost 'hot'")
      if (cap == 8) assert(c.contains("warm"), s"parts=$parts lost 'warm'")
      assert(c.size <= cap)
    }
  }

  test("summary merges across partitions (counts sum, not clamp)") {
    // each partition alone would tie 'a' with noise; summed, 'a' dominates
    val rows = (0 until 6).flatMap(p => "a" +: (0 until 3).map(i => s"p${p}_$i"))
    assert(candidates(new scala.util.Random(3).shuffle(rows), 3, 6)
      .contains("a"))
  }

  test("registration rejects bad arity / non-string token descriptively") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT misra_gries(text) FROM VALUES ('a') t(text)").collect()
    }
    assert(e1.getMessage.contains("misra_gries"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT misra_gries(n, 4) FROM VALUES (1) t(n)").collect()
    }
    assert(e2.getMessage.contains("misra_gries") &&
      e2.getMessage.toLowerCase.contains("string"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT misra_gries(text, text) FROM VALUES ('a') t(text)")
        .collect()
    }
    assert(e3.getMessage.contains("capacity"), e3.getMessage)
  }

  test("null tokens are skipped, not counted") {
    val df = Seq(Some("x"), None, Some("x"), None, None).toDF("tok")
    val c = df.agg(SketchAggs.misraGries(col("tok"), 4).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet
    assert(c == Set("x"))
  }

  test("heavyHitters output is exact and partition-order invariant") {
    val docs = (
      Seq.fill(30)("spark spark shuffle") ++
      Seq.fill(10)("codegen scan") ++
      (0 until 50).map(i => s"tail_$i")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // N = 30*3 + 10*2 + 50 = 160; k=5 -> threshold 32: spark(60),
    // shuffle(30) misses, codegen/scan(10) miss
    def run(parts: Int) =
      TextStats.heavyHitters(
        docs.toDF("doc_id", "text").repartition(parts), k = 5)
        .as[(String, Long, Long)].collect().toSet
    val expect = Set(("spark", 60L, 160L))
    assert(run(1) == expect)
    assert(run(7) == expect)
  }

  test("heavyHittersBy is exact PER GROUP: a token heavy in one group " +
      "and diluted in another appears only where it clears the bar") {
    // group g1: 'hot' is 6/10 tokens; group g2: 'hot' is 2/40
    val docs = (
      Seq.fill(6)(("g1", "hot")) ++ Seq(("g1", "a b c d")) ++
      Seq.fill(2)(("g2", "hot")) ++
      (0 until 38).map(i => ("g2", s"t$i"))
    ).zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
    def run(parts: Int) = TextStats.heavyHittersBy(
      docs.toDF("doc_id", "src", "text").repartition(parts), "src",
      k = 4).as[(String, String, Long, Long)].collect().toSet
    // g1: N=10, bar 2.5 -> hot(6) passes; g2: N=40, bar 10 -> nothing
    val expect = Set(("g1", "hot", 6L, 10L))
    assert(run(1) == expect)
    assert(run(5) == expect)
    // brute-force parity on a denser multi-group case
    val dense = (for {
      g <- Seq("x", "y", "z"); i <- 0 until 60
    } yield (g, if (i % (g.length + 2) == 0) "big" else s"w${i % 13}"))
      .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
    val got = TextStats.heavyHittersBy(
      dense.toDF("doc_id", "src", "text").repartition(6), "src", k = 8)
      .as[(String, String, Long, Long)].collect().toSet
    val brute = dense.groupBy(_._2).flatMap { case (g, rows) =>
      val toks = rows.flatMap(_._3.split(" "))
      val n = toks.size.toLong
      toks.groupBy(identity).collect {
        case (t, occ) if occ.size.toLong * 8 > n =>
          (g, t, occ.size.toLong, n)
      }
    }.toSet
    assert(got == brute)
  }
}
