package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class VolumeMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int, n: Int, idBase: Long = 0L) = (1 to n).map(i =>
    (d * 1000L + idBase + i,
      Timestamp.valueOf(f"2024-03-$d%02d 10:00:00"), "click"))

  test("micro-batches merge additively and the spike day is flagged") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vm").toFile
      .getAbsolutePath
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = EventPipeline.volumeMonitorSink(
      ms.toDF().toDF("event_id", "ts", "event_type"),
      s"$dir/rollup", s"$dir/alerts", s"$dir/cp")
    try {
      // 10 stable days (10/11 alternating - non-zero variance)
      ms.addData((1 to 10).flatMap(d => day(d, 10 + d % 2)))
      q.processAllAvailable()
      // a spike day delivered across TWO batches: counts must fold
      // additively, not latest-wins
      ms.addData(day(11, 60))
      q.processAllAvailable()
      ms.addData(day(11, 40, idBase = 500L))
      q.processAllAvailable()
    } finally q.stop()
    val rollup = spark.read.parquet(s"$dir/rollup")
      .as[(String, java.sql.Date, Long)].collect()
    assert(rollup.length == 11)
    assert(rollup.find(_._2.toString == "2024-03-11").map(_._3)
      .contains(100L))
    val flagged = spark.read.parquet(s"$dir/alerts")
      .select("day").as[String].collect().toSet
    assert(flagged == Set("2024-03-11"))
  }
}
