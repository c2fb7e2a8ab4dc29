package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class ProbeRangeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.ProbeRangeSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  private def nPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.size
    }.get

  test("produces the full id range across the requested slices") {
    val df = read("start" -> "100", "end" -> "199", "slices" -> "4")
    assert(nPartitions(df) == 4)
    assert(df.count() == 100)
    val ids = df.select("player_id").as[Long].collect().sorted
    assert(ids.head == 100L && ids.last == 199L && ids.distinct.length == 100)
    // every slice carries a near-equal share (the S6 fan-out semantics)
    val bySlice = df.groupBy("slice").count().as[(Int, Long)].collect().toMap
    assert(bySlice.values.forall(c => c == 25L))
  }

  test("player_id range predicates prune slices at planning time") {
    val df = read("start" -> "0", "end" -> "99999", "slices" -> "10")
      .filter(col("player_id") >= 50000L && col("player_id") < 50010L)
    // pushdown clips to [50000, 50009]: exactly one of the ten
    // 10k-wide slices survives
    assert(nPartitions(df) == 1)
    val ids = df.select("player_id").as[Long].collect().sorted
    assert(ids.toSeq == (50000L until 50010L))
  }

  test("contradictory range yields zero partitions, empty result") {
    val df = read("start" -> "0", "end" -> "100", "slices" -> "4")
      .filter(col("player_id") > 500L)
    assert(nPartitions(df) == 0)
    assert(df.count() == 0)
  }
}
