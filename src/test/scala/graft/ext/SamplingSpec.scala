package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 4000L)
    .map(i => (i, s"src${i % 4}")).toDF("id", "src")

  test("stratified sampling hits per-stratum rates and is deterministic") {
    val rates = Map("src0" -> 0.9, "src1" -> 0.1)
    val once = Sampling.stratified(docs, "id", "src", rates, 0.5)
    val twice = Sampling.stratified(docs, "id", "src", rates, 0.5)
    // identical decisions on identical input (no rand() anywhere)
    assert(once.collect().toSet == twice.collect().toSet)
    val kept = once.filter(col("keep")).groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // 1000 ids per stratum; hash coin should land within a loose band
    assert(kept("src0") > 850 && kept("src0") <= 1000)
    assert(kept("src1") > 50 && kept("src1") < 150)
    assert(kept("src2") > 400 && kept("src2") < 600) // default rate
  }

  test("adding rows never flips an earlier decision") {
    val r1 = Sampling.stratified(docs.limit(100), "id", "src",
      Map.empty, 0.5).filter(col("keep")).select("id")
      .as[Long].collect().toSet
    val r2 = Sampling.stratified(docs, "id", "src", Map.empty, 0.5)
      .filter(col("keep") && col("id") <= 100L).select("id")
      .as[Long].collect().toSet
    assert(r1 == r2)
  }

  test("capPerStratum bounds each stratum with a reproducible subset") {
    val capped = Sampling.capPerStratum(docs, "id", "src", 100)
    val counts = capped.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.forall(_ == 100L)) // 1000 per stratum -> capped
    val again = Sampling.capPerStratum(docs, "id", "src", 100)
      .select("id").as[Long].collect().toSet
    assert(again == capped.select("id").as[Long].collect().toSet)
    // under-cap strata pass through untouched
    val small = Sampling.capPerStratum(docs.limit(50), "id", "src", 100)
    assert(small.count() == 50)
  }

  test("splitAssign partitions every row into named splits at ~weights") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val r = Sampling.splitAssign(docs, "id", w)
    assert(r.count() == 4000) // every row assigned
    val counts = r.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 3000 && counts("train") < 3400)
    assert(counts("val") > 250 && counts("val") < 550)
    assert(counts("test") > 250 && counts("test") < 550)
  }

  test("splitAssign is append-stable: later rows never reassign " +
      "earlier ones") {
    val w = Seq("train" -> 0.5, "val" -> 0.5)
    val first = Sampling.splitAssign(docs.limit(200), "id", w)
      .select("id", "split").as[(Long, String)].collect().toSet
    val later = Sampling.splitAssign(docs, "id", w)
      .filter(col("id") <= 200L)
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(first == later)
  }

  test("splitAssign rejects weights that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("different salts draw independent coins") {
    val a = Sampling.stratified(docs, "id", "src", Map.empty, 0.5, "a")
      .filter(col("keep")).select("id").as[Long].collect().toSet
    val b = Sampling.stratified(docs, "id", "src", Map.empty, 0.5, "b")
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(a != b)
    // ~half the keep decisions should agree by chance, not ~all
    val agree = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(agree > 0.3 && agree < 0.7)
  }

  test("epochShuffle: gap-free permutation, matches the single-window " +
    "reference at any bucket count, shards balanced") {
    val out = Sampling.epochShuffle(docs, "id", "s1", 100L, 16)
      .select("id", "pos", "shard", "shard_pos")
      .as[(Long, Long, Long, Long)].collect()
    // pos is a permutation of 0..n-1
    assert(out.map(_._2).sorted.toSeq == (0L until 4000L))
    // shard layout derives exactly from pos
    assert(out.forall { case (_, p, s, sp) => s == p / 100 && sp == p % 100 })
    // every shard full (4000 = 40 exact shards of 100)
    val perShard = out.groupBy(_._3).map(_._2.length).toSet
    assert(perShard == Set(100))
    // nBuckets is a pure execution knob: 1 bucket (the naive
    // single-window shape) and 16 buckets agree on every position
    val ref = Sampling.epochShuffle(docs, "id", "s1", 100L, 1)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, p, _, _) => ref(id) == p })
  }

  test("epochShuffle: order is seed-keyed and reproducible, not id order") {
    val a = Sampling.epochShuffle(docs, "id", "seedA", 512L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    val a2 = Sampling.epochShuffle(docs, "id", "seedA", 512L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(a == a2) // same seed -> identical order
    val b = Sampling.epochShuffle(docs, "id", "seedB", 512L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(a != b) // different seed -> different permutation
    // and it is actually shuffled: id order and pos order disagree a lot
    val sortedById = a.toSeq.sortBy(_._1).map(_._2)
    val inversionsSample = sortedById.sliding(2).count(w => w(0) > w(1))
    assert(inversionsSample > 1000)
  }

  test("epochShuffle plan is lint-clean (no global-order window)") {
    val out = Sampling.epochShuffle(docs, "id", "s1", 100L, 16)
    out.collect()
    assert(PlanLint.clean(out), PlanLint.findings(out).mkString("; "))
  }

  test("epochShuffle rejects non-power-of-two bucket counts") {
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, "id", "s", 100L, 12)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, "id", "s", 0L)
    }
  }

  test("weightedSample: k per stratum without replacement, gap-free ranks") {
    val d = (1L to 200L).map(i => (i, s"s${i % 2}", 1.0 + (i % 7)))
      .toDF("id", "grp", "w")
    val s = Sampling.weightedSample(d, "id", "w", k = 10, seed = "a",
      stratumCol = Some("grp"))
    val rows = s.select("grp", "id", "ws_rank")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._2).distinct.length == 20) // no replacement
    for (g <- Seq("s0", "s1"))
      assert(rows.filter(_._1 == g).map(_._3).sorted.toSeq ==
        (1L to 10L), s"ranks in $g")
  }

  test("weightedSample favors heavy weights and keys on the seed") {
    // one 1000x-weight item among 50: it should be drawn at rank 1 in
    // nearly every seed (P[miss] ~ 49/1049 per E-S draw)
    val d = (1L to 50L).map(i => (i, if (i == 7L) 1000.0 else 1.0))
      .toDF("id", "w")
    val seeds = (0 until 8).map(i => s"seed$i")
    val rank1 = seeds.map { sd =>
      Sampling.weightedSample(d, "id", "w", k = 1, seed = sd)
        .select("id").as[Long].head()
    }
    assert(rank1.count(_ == 7L) >= 6, s"heavy item won ${rank1} only")
    assert(seeds.map(sd => Sampling.weightedSample(d, "id", "w", 5, sd)
      .select("id").as[Long].collect().toSet).distinct.size > 1,
      "different seeds must draw different samples")
  }

  // ===== stratifiedExact ==============================================

  private def coin(key: Long, salt: String = "strat"): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(md5, 16) % Hashing.P
  }

  /** Naive reference: Hamilton quotas + per-stratum (coin, key) rank. */
  private def refStrat(rows: Seq[(Long, String)], totalN: Long)
      : Set[(String, Long)] = {
    val byG = rows.groupBy(_._2)
    val n = rows.size.toLong
    val nn = math.min(totalN, n)
    val q0 = byG.toSeq.sortBy(_._1).map { case (g, rs) =>
      val nh = rs.size.toLong
      (g, nh * nn / n, nh * nn % n)
    }
    val leftover = (nn - q0.map(_._2).sum).toInt
    val bumped = q0.sortBy { case (g, _, rem) => (-rem, g) }
      .zipWithIndex
      .map { case ((g, qb, _), i) => g -> (qb + (if (i < leftover) 1 else 0)) }
      .toMap
    byG.toSeq.flatMap { case (g, rs) =>
      rs.map(_._1).sortBy(k => (coin(k), k)).take(bumped(g).toInt)
        .map(k => (g, k))
    }.toSet
  }

  test("stratifiedExact: exact total, Hamilton quotas, smallest coins — " +
      "matches the naive rank reference") {
    val rows = (1L to 997L).map(i => (i, s"s${i % 7}"))
    val got = Sampling
      .stratifiedExact(rows.toDF("id", "src").repartition(5), "id", "src",
        totalN = 100L)
      .as[(String, Long)].collect()
    assert(got.length == 100, "exactly N rows selected")
    assert(got.toSet == refStrat(rows, 100L))
  }

  test("stratifiedExact: quotas are proportional within 1 and sum to N") {
    val rows = (1L to 1000L).map(i =>
      (i, if (i <= 700) "big" else if (i <= 950) "mid" else "small"))
    val got = Sampling
      .stratifiedExact(rows.toDF("id", "src"), "id", "src", 40L)
      .as[(String, Long)].collect()
    val perG = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(got.length == 40)
    // exact proportional shares: 28 / 10 / 2
    assert(perG("big") == 28 && perG("mid") == 10 && perG("small") == 2)
  }

  test("stratifiedExact: totalN >= n selects everything; totalN 0 none") {
    val rows = (1L to 50L).map(i => (i, s"s${i % 3}"))
    val all = Sampling
      .stratifiedExact(rows.toDF("id", "src"), "id", "src", 999L)
      .count()
    assert(all == 50L)
    val none = Sampling
      .stratifiedExact(rows.toDF("id", "src"), "id", "src", 0L)
      .count()
    assert(none == 0L)
  }

  test("weightedSample selection is invariant to weight rescaling and " +
      "excludes non-positive weights") {
    val d = (1L to 100L).map(i => (i, (i % 11).toDouble)) // some w=0
      .toDF("id", "w")
    val a = Sampling.weightedSample(d, "id", "w", 15, "s")
      .select("id", "ws_rank").as[(Long, Long)].collect().toSet
    val scaled = d.withColumn("w", col("w") * 12345.0)
    val b = Sampling.weightedSample(scaled, "id", "w", 15, "s")
      .select("id", "ws_rank").as[(Long, Long)].collect().toSet
    assert(a == b, "E-S order depends only on relative weights")
    val zeros = d.where(col("w") <= 0).select("id").as[Long].collect().toSet
    assert(a.map(_._1).intersect(zeros).isEmpty)
    // global variant returns exactly k gap-free ranks
    assert(a.map(_._2).toSeq.sorted == (1L to 15L))
  }
test("neymanAllocation: n_h tracks N_h*sd_h; largest remainder " +
      "closes the budget; zero-variance strata earn nothing; " +
      "allocations cap at the stratum size") {
    import spark.implicits._
    // A: spread 0/10, B: constant, C: tiny but WILDLY spread
    val rows = (1 to 5).flatMap(_ => Seq(("A", 0.0), ("A", 10.0))) ++
      (1 to 10).map(_ => ("B", 5.0)) ++
      (1 to 5).flatMap(_ => Seq(("C", 0.0), ("C", 100.0)))
    val got = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v",
        budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    // weights ~ 52.7 : 0 : 527 -> ideals .27 / 0 / 2.73; C wins the
    // leftover unit
    assert(got === Map("A" -> 0L, "B" -> 0L, "C" -> 3L))
    // cap: a 2-row stratum cannot absorb more than 2 even when the
    // weights say otherwise (saturation is NOT redistributed)
    val tiny = Seq(("big", 0.0), ("big", 10.0), ("big", 0.0),
      ("big", 10.0), ("small", 0.0), ("small", 100.0))
    val g2 = Sampling.neymanAllocation(tiny.toDF("s", "v"), "s", "v",
        budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(g2("small") == 2L) // capped at n_rows
    assert(g2("big") <= 4L)
  }

  test("coordinatedKeySample: k-1 smallest-hash keys exactly, " +
      "coordination across tables, merge law, sub-k exactness") {
    def keys(df: org.apache.spark.sql.DataFrame) =
      Sampling.coordinatedKeySample(df, "k", 16, "t")
        .collect().map(_.getLong(0)).toSet
    val a = (1L to 500L).map(i => (i, "x")).toDF("k", "pay")
    val got = keys(a)
    // brute force: the 15 keys with the smallest salted hashes
    val hs = (1L to 500L).map(i =>
      i -> graft.ext.Hashing.hash60Local(s"t:$i")).sortBy(_._2)
    assert(got === hs.take(15).map(_._1).toSet)
    // coordination: another table over the SAME key domain — with
    // duplicates, other payloads, different partitioning — picks the
    // IDENTICAL sample (selection is a pure function of key and salt)
    val b = (1L to 500L).flatMap(i => Seq((i, 1), (i, 2)))
      .toDF("k", "n").repartition(7)
    assert(keys(b) === got)
    // merge law: bottom-k of the union == bottom-k of the two samples'
    // key union re-sampled
    val union = (1L to 900L).map(i => (i, "u")).toDF("k", "pay")
    val hsU = (1L to 900L).map(i =>
      i -> graft.ext.Hashing.hash60Local(s"t:$i")).sortBy(_._2)
    assert(keys(union) === hsU.take(15).map(_._1).toSet)
    // sub-k input: everything kept, theta = 0 marks exactness
    val tiny = (1L to 5L).map(i => (i, "x")).toDF("k", "pay")
    val rows = Sampling.coordinatedKeySample(tiny, "k", 16, "t")
      .collect()
    assert(rows.map(_.getLong(0)).toSet === (1L to 5L).toSet)
    assert(rows.forall(_.getLong(2) === 0L))
  }
}
