package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("distinct scores split into near-equal quantile buckets") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "score")
    val r = Curriculum.buckets(df, "id", "score", nBuckets = 4)
    val sizes = r.groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
    // bucket ordering respects score ordering
    val maxB0 = r.filter(col("bucket") === 0).agg(max("score"))
      .as[Long].head()
    val minB3 = r.filter(col("bucket") === 3).agg(min("score"))
      .as[Long].head()
    assert(maxB0 < minB3)
  }

  test("constant scores collapse into bucket 0 deterministically") {
    val df = (1L to 50L).map(i => (i, 7L)).toDF("id", "score")
    val r = Curriculum.buckets(df, "id", "score", nBuckets = 4)
    assert(r.filter(col("bucket") =!= 0).count() == 0)
  }

  test("within-bucket order is reproducible") {
    val df = (1L to 60L).map(i => (i, i % 10)).toDF("id", "score")
    val a = Curriculum.buckets(df, "id", "score", 3)
      .select("id", "bucket", "ord").collect().toSet
    val b = Curriculum.buckets(df, "id", "score", 3)
      .select("id", "bucket", "ord").collect().toSet
    assert(a == b)
  }
}
