package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed fact: 90% of rows share key 1
  private val fact = ((1 to 90).map(i => (1L, i.toLong)) ++
    (91 to 100).map(i => (i.toLong % 5 + 2, i.toLong)))
    .toDF("key", "v")
  private val dim = (1L to 10L).map(k => (k, s"d$k")).toDF("key", "name")

  test("saltedJoin equals the plain join (inner)") {
    val plain = fact.join(dim, Seq("key")).select("key", "v", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "key", saltFactor = 4)
      .select("key", "v", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join (left, unmatched NULL-padded)") {
    val factPlus = fact.unionByName(Seq((999L, 0L)).toDF("key", "v"))
    val plain = factPlus.join(dim, Seq("key"), "left")
      .select("key", "v", "name")
      .as[(Long, Long, Option[String])].collect().sorted.toSeq
    val salted = Skew.saltedJoin(factPlus, dim, "key", 4, "left")
      .select("key", "v", "name")
      .as[(Long, Long, Option[String])].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salting spreads the hot key across salt buckets") {
    val spread = fact.withColumn("__salt",
        pmod(hash(fact.columns.toSeq.map(col): _*), lit(4)))
      .filter(col("key") === 1L)
      .select("__salt").distinct().count()
    assert(spread >= 3, s"hot key landed in only $spread salt buckets")
  }
}
