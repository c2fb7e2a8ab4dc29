package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale posture evidence: two tables bucketed on the join key join with
  * NO shuffle exchange — the co-located join layout big fact-fact joins
  * need at 100 TB (bucket the table once at write time, every later join
  * on that key is exchange-free). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("wh").toFile
      .getAbsolutePath
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 1000L).map(k => (k, k * 2)).toDF("key", "va")
      val b = (1L to 1000L).map(k => (k, k * 3)).toDF("key", "vb")
      a.write.bucketBy(8, "key").sortBy("key")
        .option("path", s"$dir/ta").mode("overwrite").saveAsTable("ta")
      b.write.bucketBy(8, "key").sortBy("key")
        .option("path", s"$dir/tb").mode("overwrite").saveAsTable("tb")
      val joined = spark.table("ta").join(spark.table("tb"), Seq("key"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS ta")
      spark.sql("DROP TABLE IF EXISTS tb")
    }
  }
}
