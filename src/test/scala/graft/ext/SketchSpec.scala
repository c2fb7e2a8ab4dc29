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
}
