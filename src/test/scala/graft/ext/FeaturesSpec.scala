package graft.ext

import graft.SparkSpec
import graft.functions.GraftMath
import org.apache.spark.sql.functions._

/** Feature engineering ([[Features]]): hashing-trick vectorizer and
  * leave-one-out target encoding. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("featureHash: counts per (doc, bucket) are exact and the bucket " +
      "is the portable md5 hash mod dim") {
    val docs = Seq((1L, "a b a"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val got = Features.featureHash(docs, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(tok: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 8
    }
    assert(got((1L, bucket("a"))) == (if (bucket("a") == bucket("b")) 3L
                                      else 2L))
    assert(got((2L, bucket("a"))) == 1L)
    // empty doc contributes no rows; totals conserve token counts
    assert(!got.keySet.exists(_._1 == 3L))
    assert(got.collect { case ((d, _), c) if d == 1L => c }.sum == 3L)
  }

  test("featureHash is partition-invariant and dim-bounded") {
    val docs = (1 to 50).map(i => (i.toLong, s"t${i % 7} u${i % 3} v"))
      .toDF("doc_id", "text")
    val a = Features.featureHash(docs, dim = 4).collect().toSet
    val b = Features.featureHash(docs.repartition(9), dim = 4)
      .collect().toSet
    assert(a == b)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
  }

  test("targetEncodeLoo: each row gets the mean of the OTHERS; " +
      "singletons NULL; nulls excluded") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (3L, "a", 5.0),
      (4L, "b", 7.0), (5L, null.asInstanceOf[String], 9.0))
      .toDF("id", "cat", "y")
    val got = Features.targetEncodeLoo(df, "id", "cat", "y").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    def s9(x: Double) = GraftMath.sig9(x)
    // replica of the documented chain: decimal (S - x), sig9'd cast,
    // one sig9'd division (values here are decimal-exact anyway)
    assert(got(1L) == Some(s9(s9(8.0) / 2.0)))
    assert(got(2L) == Some(s9(s9(6.0) / 2.0)))
    assert(got(3L) == Some(s9(s9(4.0) / 2.0)))
    assert(got(4L).isEmpty) // singleton category
    assert(!got.contains(5L)) // null category row excluded
  }
}
