package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  // two well-separated direction clusters in 4-d
  private def emb = {
    val a = (0 until 10).map(i =>
      (i.toLong, Array(10f, i * 0.01f, 0f, 1f), 1))
    val b = (10 until 20).map(i =>
      (i.toLong, Array(0f, 10f, i * 0.01f, 1f), 2))
    (a ++ b).toDF("vec_id", "embedding", "label")
  }

  test("queries take the majority label of their own cluster") {
    val queries = emb.filter(col("vec_id").isin(0L, 10L))
    val refs = emb.filter(!col("vec_id").isin(0L, 10L))
    val r = Similarity.knnClassify(queries, refs, k = 3)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.size == 2)
    assert(r(0L) == ((0L, 1L, 3L, 1L, true)))  // unanimous cluster A
    assert(r(10L) == ((10L, 2L, 3L, 2L, true)))
  }

  test("vote ties break toward the closest neighbor's label") {
    // query along x; one ref very close (label 7), one further (label 3)
    val queries = Seq((100L, Array(1f, 0f, 0f, 0f), 7))
      .toDF("vec_id", "embedding", "label")
    val refs = Seq(
      (1L, Array(1f, 0.05f, 0f, 0f), 7),
      (2L, Array(1f, 0.4f, 0f, 0f), 3))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnClassify(queries, refs, k = 2)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(r.toSeq == Seq((100L, 7L, 1L, 7L, true)))
  }

  test("prediction is a pure function of the data (re-run identical)") {
    val queries = emb.filter(col("vec_id") % 5 === 0)
    val refs = emb.filter(col("vec_id") % 5 =!= 0)
    val once = Similarity.knnClassify(queries, refs, k = 4)
      .collect().toSet
    val twice = Similarity.knnClassify(queries, refs, k = 4)
      .collect().toSet
    assert(once == twice)
  }
}
