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
    val rollup = EventPipeline.readVolumeRollup(spark, s"$dir/rollup")
      .as[(String, java.sql.Date, Long)].collect()
    assert(rollup.length == 11)
    assert(rollup.find(_._2.toString == "2024-03-11").map(_._3)
      .contains(100L))
    val flagged = spark.read.parquet(s"$dir/alerts")
      .select("day").as[String].collect().toSet
    assert(flagged == Set("2024-03-11"))
  }

  test("a re-delivered batch id is merged exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("vmi").toFile
      .getAbsolutePath
    val b0 = day(1, 10).toDF("event_id", "ts", "event_type")
    EventPipeline.mergeVolumeBatch(b0, 0L, s"$dir/r", s"$dir/a")
    // at-least-once re-delivery of the SAME batch id: no double count
    EventPipeline.mergeVolumeBatch(b0, 0L, s"$dir/r", s"$dir/a")
    val afterReplay = EventPipeline.readVolumeRollup(spark, s"$dir/r")
      .as[(String, java.sql.Date, Long)].collect()
    assert(afterReplay.map(_._3).toSeq == Seq(10L))
    // a NEW batch id for the same day folds in additively
    val b1 = day(1, 5, idBase = 100L).toDF("event_id", "ts", "event_type")
    EventPipeline.mergeVolumeBatch(b1, 1L, s"$dir/r", s"$dir/a")
    val after = EventPipeline.readVolumeRollup(spark, s"$dir/r")
      .as[(String, java.sql.Date, Long)].collect()
    assert(after.map(_._3).toSeq == Seq(15L))
  }
}
