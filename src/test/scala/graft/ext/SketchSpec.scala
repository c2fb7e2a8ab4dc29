package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(md5, 16)
  }

  /** Local CMS replica with the documented salted bucket hash. */
  private def refEst(stream: Seq[String], key: String, d: Int, w: Int,
      salt: String): Long = {
    val buckets = scala.collection.mutable.Map[(Int, Long), Long]()
    stream.foreach { k =>
      (0 until d).foreach { j =>
        val b = hash60(s"$salt$j:$k") % w
        buckets((j, b)) = buckets.getOrElse((j, b), 0L) + 1
      }
    }
    (0 until d).map { j =>
      buckets.getOrElse((j, hash60(s"$salt$j:$key") % w), 0L)
    }.min
  }

  private val stream = (1 to 500).map(i => s"k${i % 37}") ++
    Seq.fill(60)("hot") ++ (1 to 80).map(i => s"rare$i")

  test("point estimates match the local replica and never underestimate") {
    val items = stream.toDF("k").repartition(5)
    val sk = Sketch.countMin(items, "k", 4, 64, "t")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val keys = (stream.distinct :+ "never-seen").toDF("k")
    val est = Sketch.cmsEstimate(sk, keys, "k", 4, 64, "t")
      .as[(String, Long)].collect().toMap
    keys.as[String].collect().foreach { k =>
      assert(est(k) == refEst(stream, k, 4, 64, "t"), s"key $k")
      assert(est(k) >= exact.getOrElse(k, 0L), s"CMS must overestimate $k")
    }
  }

  test("weighted build over (key, count) pairs equals the stream build") {
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.toDF("k", "c")
    val fromStream = Sketch.countMin(stream.toDF("k"), "k", 4, 64, "t")
      .as[(Int, Long, Long)].collect().toSet
    val fromCounts = Sketch
      .countMinWeighted(counts, "k", "c", 4, 64, "t")
      .as[(Int, Long, Long)].collect().toSet
    assert(fromStream == fromCounts)
  }

  test("sketch is bounded by d*w rows and mergeable by re-summing") {
    val (a, b) = stream.splitAt(stream.size / 2)
    val skAll = Sketch.countMin(stream.toDF("k"), "k", 3, 32, "m")
    assert(skAll.count() <= 3 * 32)
    val merged = Sketch.countMin(a.toDF("k"), "k", 3, 32, "m")
      .unionByName(Sketch.countMin(b.toDF("k"), "k", 3, 32, "m"))
      .groupBy("j", "bucket").agg(sum("s").as("s"))
    val l = skAll.as[(Int, Long, Long)].collect().toSet
    val r = merged.as[(Int, Long, Long)].collect().toSet
    assert(l == r, "merge law: sketch(A++B) == resum(sketch(A) u sketch(B))")
  }

  // ===== hyperLogLog ==================================================

  /** Local replica of the documented HLL chain: same salted hash,
    * bucket/payload split, trailing-zero rank, bucket-ordered harmonic
    * fold and sig9 points. */
  private def refHll(keys: Seq[String], p: Int, salt: String): Double = {
    val m = 1L << p
    val regs = scala.collection.mutable.Map[Long, Long]()
    keys.distinct.foreach { k =>
      val h = hash60(s"$salt:$k")
      val bucket = h % m
      val w = h / m
      val rho =
        if (w == 0L) (60 - p + 1).toLong
        else java.lang.Long.numberOfTrailingZeros(w) + 1L
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
    }
    var srego = 0.0
    regs.toSeq.sortBy(_._1).foreach { case (_, mm) =>
      srego += 1.0 / (1L << mm).toDouble }
    val vz = m - regs.size
    val s = vz.toDouble + srego
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble / s
    graft.functions.GraftMath.sig9(
      if (raw <= 2.5 * m && vz > 0)
        m.toDouble * graft.functions.GraftMath.sig9(
          math.log(m.toDouble / vz.toDouble))
      else raw)
  }

  test("hyperLogLog matches the local replica and lands within the " +
      "theoretical error band") {
    val keys = (1 to 20000).map(i => s"key-$i")
    val got = Sketch.hyperLogLog(keys.toDF("k").repartition(7), "k", 9,
      "hll").head()
    val est = got.getAs[Double]("estimate")
    assert(est == refHll(keys, 9, "hll"))
    // sigma ~ 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.14,
      s"estimate $est too far from 20000")
    assert(got.getAs[Long]("m") == 512L)
  }

  test("hyperLogLog small range uses linear counting and is near-exact") {
    val keys = (1 to 40).map(i => s"s$i")
    val got = Sketch.hyperLogLog(keys.toDF("k"), "k", 9, "hll").head()
    val est = got.getAs[Double]("estimate")
    assert(est == refHll(keys, 9, "hll"))
    assert(got.getAs[Long]("v_zero") > 0)
    assert(math.abs(est - 40.0) < 4.0, s"linear counting far off: $est")
    // duplicates never move the estimate
    val dup = Sketch.hyperLogLog(
      (keys ++ keys ++ keys).toDF("k"), "k", 9, "hll").head()
    assert(dup.getAs[Double]("estimate") == est)
  }

  test("hyperLogLog register tables merge by union + max") {
    val (a, b) = (1 to 5000).map(i => s"k$i").splitAt(2500)
    // merge law at the REGISTER level: rebuild from the union equals
    // max-merging the two register tables (here checked via estimates
    // computed from identical unions)
    val whole = Sketch.hyperLogLog((a ++ b ++ a).toDF("k"), "k", 9, "x")
      .head().getAs[Double]("estimate")
    val union = Sketch.hyperLogLog((b ++ a).toDF("k"), "k", 9, "x")
      .head().getAs[Double]("estimate")
    assert(whole == union, "order/duplication must not move the estimate")
  }

  test("hllRegisters/hllEstimate: per-slice registers max-merge to the " +
      "direct register table EXACTLY, and the estimate follows") {
    val rows = (1 to 4000).map(i => (s"d${i % 7}", s"k${i % 900}"))
      .toDF("day", "k").repartition(5)
    val daily = Sketch.hllRegisters(rows, "k", 9, "mg", Seq("day"))
    val merged = daily.groupBy(col("bucket"))
      .agg(max(col("M")).cast("long").as("M"))
    val direct = Sketch.hllRegisters(rows, "k", 9, "mg")
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet ===
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val em = Sketch.hllEstimate(merged, 9).head()
    val ed = Sketch.hllEstimate(direct, 9).head()
    assert(em.getAs[Double]("estimate") == ed.getAs[Double]("estimate"))
    // and the refactored one-shot face is the same chain
    assert(Sketch.hyperLogLog(rows, "k", 9, "mg").head()
      .getAs[Double]("estimate") == ed.getAs[Double]("estimate"))
  }

  test("wider sketches only tighten estimates; unseen key without " +
      "collisions reads 0") {
    val narrow = Sketch.cmsEstimate(
      Sketch.countMin(stream.toDF("k"), "k", 2, 16, "t"),
      Seq("hot").toDF("k"), "k", 2, 16, "t").head().getAs[Long]("est")
    val wide = Sketch.cmsEstimate(
      Sketch.countMin(stream.toDF("k"), "k", 4, 4096, "t"),
      Seq("hot").toDF("k"), "k", 4, 4096, "t").head().getAs[Long]("est")
    assert(narrow >= wide && wide >= 60L)
    assert(refEst(stream, "hot", 4, 4096, "t") == wide)
  }

  // ===== KMV bottom-k =====================================================

  private def kmvRows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq.sorted

  test("kmv: sharded build equals the single-shard build (merge law) " +
      "and a sub-k set is kept whole") {
    val keys = (1 to 300).map(i => s"u$i")
    val one = keys.map((_, "s0")).toDF("k", "sh")
    val five = keys.zipWithIndex.map { case (k, i) => (k, s"s${i % 5}") }
      .toDF("k", "sh").repartition(7)
    assert(kmvRows(Sketch.kmvSketch(one, "k", "sh", 32, "t")) ===
      kmvRows(Sketch.kmvSketch(five, "k", "sh", 32, "t")))
    // 20 distinct keys < k: the sketch holds all of them and the
    // estimate is the exact count
    val tiny = (1 to 20).map(i => (s"u$i", s"s${i % 3}")).toDF("k", "sh")
    val est = Sketch.kmvEstimate(
      Sketch.kmvSketch(tiny, "k", "sh", 32, "t"), 32).head()
    assert(est.getLong(0) === 20L)
    assert(est.getAs[Double]("est") === 20.0)
  }

  test("kmv estimate tracks the true distinct count") {
    val rows = (1 to 10000).map(i => (s"u${i % 5000}", s"s${i % 11}"))
      .toDF("k", "sh").repartition(5)
    val est = Sketch.kmvEstimate(
      Sketch.kmvSketch(rows, "k", "sh", 128, "t"), 128)
      .head().getAs[Double]("est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.35)
  }

  test("kmv set estimates are exact below k and track truth above it") {
    def sk(lo: Int, hi: Int, k: Int) = Sketch.kmvSketch(
      (lo to hi).map(i => (s"u$i", s"s${i % 4}")).toDF("k", "sh"),
      "k", "sh", k, "t")
    // |A|=40, |B|=40, overlap 20, union 60 < k=128: all exact
    val small = Sketch.kmvSetEstimates(sk(1, 40, 128), sk(21, 60, 128),
      128).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("est"))).toMap
    assert(small("union") === ((60L, 60.0)))
    assert(small("intersect") === ((20L, 20.0)))
    assert(small("a_not_b") === ((20L, 20.0)))
    assert(small("b_not_a") === ((20L, 20.0)))
    // truncated regime: |A|=3000, |B|=3000, overlap 1500, union 4500
    val big = Sketch.kmvSetEstimates(sk(1, 3000, 128),
      sk(1501, 4500, 128), 128).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(math.abs(big("union") - 4500.0) / 4500.0 < 0.35)
    assert(math.abs(big("intersect") - 1500.0) / 1500.0 < 0.5)
    assert(math.abs(big("a_not_b") - 1500.0) / 1500.0 < 0.5)
    assert(math.abs(big("b_not_a") - 1500.0) / 1500.0 < 0.5)
    // the four class estimates decompose the union estimate exactly
    // (rho + rho_a + rho_b = k', and each scales by est_u / k')
    val parts = Seq("intersect", "a_not_b", "b_not_a").map(big).sum
    assert(math.abs(parts - big("union")) / big("union") < 1e-6)
  }

  // ===== CMS join cardinality =============================================

  test("cms join cardinality is exact without collisions and an upper " +
      "bound under them") {
    // A: key i repeated (i%3)+1 times over 40 keys; B: every other key
    // twice — exact |A join B| = sum over shared keys of cA*cB
    val aRows = (1 to 40).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i"))
    val bRows = (1 to 40).filter(_ % 2 == 0).flatMap(i =>
      Seq.fill(2)(s"k$i"))
    val exact = (1 to 40).filter(_ % 2 == 0)
      .map(i => (i % 3 + 1).toLong * 2L).sum
    def est(w: Int) = Sketch.cmsJoinCardinality(
      Sketch.countMin(aRows.toDF("k"), "k", 4, w, "t"),
      Sketch.countMin(bRows.toDF("k"), "k", 4, w, "t"))
      .head().getLong(0)
    assert(est(4096) === exact) // 40 keys in 4096 buckets: collision-free
    assert(est(8) >= exact)     // crowded sketch only over-counts
    // disjoint key sets: some hash row's buckets may not overlap at
    // all — its inner product is 0 (proof of an empty join) and must
    // reach the min, not be dropped by the join
    val disjoint = Sketch.cmsJoinCardinality(
      Sketch.countMin(Seq("a1", "a2").toDF("k"), "k", 4, 4096, "t"),
      Sketch.countMin(Seq("b1", "b2").toDF("k"), "k", 4, 4096, "t"))
      .head().getLong(0)
    assert(disjoint === 0L)
  }

  test("kmv set estimates on empty inputs return exact zero rows") {
    val empty = Seq.empty[(String, String)].toDF("k", "sh")
    val sk = Sketch.kmvSketch(empty, "k", "sh", 16, "t")
    val rows = Sketch.kmvSetEstimates(sk, sk, 16).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set("union", "intersect", "a_not_b",
      "b_not_a"))
    assert(rows.values.forall(_ == ((0L, 0.0))))
  }
}
