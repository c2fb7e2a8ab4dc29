package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import EventPipeline.{Event, UserSession}

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val sample = Seq(
    Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 1.5),
    Event(2L, ts("2024-03-01 11:00:00"), 7L, "click", 2.5),
    Event(3L, ts("2024-03-01 12:00:00"), 8L, "view", 1.0),
    Event(4L, ts("2024-03-02 09:00:00"), 7L, "click", 4.0))

  test("windowedStats streaming run equals the batch twin") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(sample)
    val q = EventPipeline.windowedStats(ms.toDF())
      .writeStream.format("memory").queryName("ws")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streaming = spark.table("ws")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = EventPipeline.windowedStats(sample.toDF())
      .as[(String, String, Long, Double)].collect().toSet
    assert(streaming == batch)
    assert(batch == Set(
      ("2024-03-01", "click", 2L, 4.0),
      ("2024-03-01", "view", 1L, 1.0),
      ("2024-03-02", "click", 1L, 4.0)))
  }

  test("userSessions accumulates keyed state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipeline.userSessions(ms.toDS(), spark)
      .writeStream.format("memory").queryName("us")
      .outputMode("update").start()
    try {
      ms.addData(sample.take(3))
      q.processAllAvailable()
      ms.addData(sample.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("us").as[UserSession].collect()
      .groupBy(_.user_id).map { case (k, vs) => k -> vs.maxBy(_.n_events) }
    assert(last(7L) == UserSession(7L, 3L, 8.0))
    assert(last(8L) == UserSession(8L, 1L, 1.0))
  }

  test("upsertSink: micro-batches latest-wins-merge into the lake table") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sus").toFile
      .getAbsolutePath
    val ms = MemoryStream[(Long, Double, Long)]
    val q = EventPipeline.upsertSink(
      ms.toDF().toDF("key", "val", "updated_at"),
      s"$dir/t", Seq("key"), "updated_at", s"$dir/cp", numBuckets = 4)
    try {
      ms.addData(Seq((1L, 1.0, 1L), (2L, 2.0, 1L)))
      q.processAllAvailable()
      ms.addData(Seq((1L, 9.0, 2L), (3L, 3.0, 1L))) // update + insert
      q.processAllAvailable()
    } finally q.stop()
    val r = graft.sinks.UpsertWriter.readBucketed(spark, s"$dir/t")
      .as[(Long, Double, Long)].collect().toSet
    assert(r == Set((1L, 9.0, 2L), (2L, 2.0, 1L), (3L, 3.0, 1L)))
  }

  test("dueWithin selects only rows inside the lead window") {
    val games = Seq(
      ("g1", ts("2024-03-01 18:10:00")),
      ("g2", ts("2024-03-01 18:20:00")),
      ("g3", ts("2024-03-01 17:50:00")))
      .toDF("game", "game_date")
    // window is (now, now+15m]: g1 inside, g2 exactly on the boundary
    // (included), g3 already started (excluded)
    val due = EventPipeline.dueWithin(games, ts("2024-03-01 18:05:00"), 15)
      .select("game").as[String].collect().toSet
    assert(due == Set("g1", "g2"))
  }
}
