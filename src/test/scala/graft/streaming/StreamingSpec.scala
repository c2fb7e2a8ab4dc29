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

  test("windowedOhlc streaming == batch twin == TimeSeries.resample") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, date_format}
    val rows = Seq(
      Event(1L, ts("2024-03-01 10:05:00"), 7L, "click", 10.0),
      Event(2L, ts("2024-03-01 10:20:00"), 7L, "click", 30.0),
      Event(3L, ts("2024-03-01 10:50:00"), 7L, "view", 20.0),
      Event(4L, ts("2024-03-01 11:10:00"), 7L, "view", 5.0),
      Event(5L, ts("2024-03-01 10:30:00"), 8L, "view", 7.0))
    val ms = MemoryStream[Event]
    ms.addData(rows)
    val q = EventPipeline.windowedOhlc(ms.toDF())
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def bars(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7))).toSet
    val streaming = bars(spark.table("ohlc"))
    val batch = bars(EventPipeline.windowedOhlc(rows.toDF()))
    // and both equal the batch TimeSeries operator over the same rows
    val resample = bars(graft.ext.TimeSeries.resample(rows.toDF(),
        Seq("user_id"), "ts", "value", 3600L, col("event_id"))
      .select(date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_s"),
        col("user_id"), col("open_v"), col("high_v"), col("low_v"),
        col("close_v"), col("n_events"), col("sum_v")))
    assert(streaming == batch)
    assert(streaming == resample)
    assert(streaming.contains(
      ("2024-03-01 10:00:00", 7L, 10.0, 30.0, 10.0, 20.0, 3L, 60.0)))
  }

  test("cusumMonitor: streaming alarms across micro-batches equal the " +
      "batch twin's alarm rows") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // stream 'click' drifts upward (values ~ +4 over drift), 'view'
    // stays flat; threshold 6 crossed inside batch 2 for click only
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 5.0),
      Event(2L, ts("2024-03-01 11:00:00"), 7L, "click", 5.0),
      Event(3L, ts("2024-03-01 10:30:00"), 8L, "view", 1.0))
    val batch2 = Seq(
      Event(4L, ts("2024-03-01 12:00:00"), 7L, "click", 5.0),
      Event(5L, ts("2024-03-01 13:00:00"), 7L, "click", 5.0),
      Event(6L, ts("2024-03-01 12:30:00"), 8L, "view", 1.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.cusumMonitor(ms.toDS(), spark,
        drift = 1.0, threshold = 6.0)
      .writeStream.format("memory").queryName("cusum_alarms")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("cusum_alarms")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
      .toSet
    // batch twin over the same rows, alarms only
    val all = (batch1 ++ batch2).toDF()
    val batch = graft.ext.TimeSeries.cusum(all, Seq("event_type"), "ts",
        "value", drift = 1.0, threshold = 6.0, tieBreak = "event_id")
      .where(col("alarm"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
      .toSet
    assert(streaming === batch)
    // click alarms at events 2 (s=8), 4 (12), 5 (16); view never
    assert(streaming === Set(("click", 2L, 8.0), ("click", 4L, 12.0),
      ("click", 5L, 16.0)))
  }

  test("ewmaMonitor: streaming points across micro-batches equal the " +
      "batch twin bit-for-bit; lookback spans the batch boundary") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 10.0),
      Event(2L, ts("2024-03-01 11:00:00"), 7L, "click", 20.0),
      Event(3L, ts("2024-03-01 10:30:00"), 8L, "view", 1.0))
    val batch2 = Seq(
      Event(4L, ts("2024-03-01 12:00:00"), 7L, "click", 5.0),
      Event(5L, ts("2024-03-01 13:00:00"), 7L, "click", 40.0),
      Event(6L, ts("2024-03-01 12:30:00"), 8L, "view", 3.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.ewmaMonitor(ms.toDS(), spark,
        alpha = 0.25, horizon = 3)
      .writeStream.format("memory").queryName("ewma_pts")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("ewma_pts")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    val batch = graft.ext.TimeSeries.ewma((batch1 ++ batch2).toDF(),
        Seq("event_type"), "ts", "value", "event_id",
        alpha = 0.25, horizon = 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(streaming === batch)
    // event 5's window spans the batch boundary: {20, 5, 40} with the
    // horizon having evicted event 1's 10.0
    val e5 = streaming.find(_._2 == 5L).get._4
    val w = Seq(1.0, 0.75, 0.75 * 0.75)
    // fold order is oldest-first (the documented left-to-right contract)
    val want5 = graft.functions.GraftMath.sig9(
      (20.0 * w(2) + 5.0 * w(1) + 40.0 * w(0)) / (w(0) + w(1) + w(2)))
    assert(e5 == want5)
  }

  test("desMonitor: streaming s1/s2/level/trend/forecast across " +
      "micro-batches equal the batch doubleEwma bit-for-bit") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 10.0),
      Event(2L, ts("2024-03-01 11:00:00"), 7L, "click", 20.0),
      Event(3L, ts("2024-03-01 10:30:00"), 8L, "view", 1.0))
    val batch2 = Seq(
      Event(4L, ts("2024-03-01 12:00:00"), 7L, "click", 5.0),
      Event(5L, ts("2024-03-01 13:00:00"), 7L, "click", 40.0),
      Event(6L, ts("2024-03-01 12:30:00"), 8L, "view", 3.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.desMonitor(ms.toDS(), spark,
        alpha = 0.25, horizon = 3)
      .writeStream.format("memory").queryName("des_pts")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    val streaming = spark.table("des_pts").collect().map(key).toSet
    val batch = graft.ext.TimeSeries.doubleEwma(
        (batch1 ++ batch2).toDF(), Seq("event_type"), "ts", "value",
        "event_id", alpha = 0.25, horizon = 3)
      .select(col("event_type"), col("ts"), col("event_id"), col("s1"),
        col("s2"), col("level"), col("trend"), col("forecast"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSet
    // align shapes: streaming carries x at index 3 — drop it
    val streaming7 = streaming.map(t =>
      (t._1, t._2, t._4, t._5, t._6, t._7, t._8))
    assert(streaming7 === batch)
    assert(streaming.size == 6)
  }

  test("enrichedPurchases: streaming as-of enrichment equals the exact " +
      "batch twin on in-order batches; clicks never retro-enrich") {
    implicit val ctx = spark.sqlContext
    // delivered in event-time order across batches (the operator's
    // documented contract; a sub-watermark late purchase would be
    // dropped by the watermark like in any stateful streaming op)
    val events = Seq(
      Event(14L, ts("2024-03-01 08:00:00"), 8L, "purchase", 70.0), // no click before
      Event(10L, ts("2024-03-01 09:00:00"), 7L, "click", 0.0),
      Event(11L, ts("2024-03-01 09:30:00"), 7L, "purchase", 50.0),
      Event(12L, ts("2024-03-01 10:00:00"), 7L, "click", 0.0),
      Event(13L, ts("2024-03-01 10:00:00"), 7L, "purchase", 60.0), // tie: click 12 wins (inclusive)
      Event(15L, ts("2024-03-01 11:00:00"), 8L, "click", 0.0),
      Event(16L, ts("2024-03-01 12:00:00"), 8L, "purchase", 80.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.enrichedPurchases(ms.toDS(), spark)
      .writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    try {
      ms.addData(events.take(5))
      q.processAllAvailable()
      ms.addData(events.drop(5))
      q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("enr")
      .as[EventPipeline.EnrichedPurchase].collect()
      .map(e => e.purchase_id -> ((e.click_id, e.click_ts))).toMap
    assert(streaming(11L) == ((Some(10L), Some(ts("2024-03-01 09:00:00")))))
    assert(streaming(13L) == ((Some(12L), Some(ts("2024-03-01 10:00:00")))))
    assert(streaming(14L) == ((None, None)))
    assert(streaming(16L) == ((Some(15L), Some(ts("2024-03-01 11:00:00")))))
    // the exact batch twin agrees row for row on this in-order data
    val batch = EventPipeline.enrichedPurchasesBatch(events.toDF())
      .as[EventPipeline.EnrichedPurchase].collect()
      .map(e => e.purchase_id -> ((e.click_id, e.click_ts))).toMap
    assert(streaming == batch)
  }

  test("enrichedPurchases: a purchase arriving a batch AFTER a newer " +
      "click still matches the older buffered click") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipeline.enrichedPurchases(ms.toDS(), spark)
      .writeStream.format("memory").queryName("enr2")
      .outputMode("append").start()
    try {
      // batch 1: clicks A (09:00) and B (10:00) - single-latest-click
      // state would discard A here
      ms.addData(Seq(
        Event(20L, ts("2024-03-01 09:00:00"), 7L, "click", 0.0),
        Event(21L, ts("2024-03-01 10:00:00"), 7L, "click", 0.0)))
      q.processAllAvailable()
      // batch 2: purchase at 09:30 - within the 1h watermark, between
      // the two clicks: the correct match is A, not none
      ms.addData(Seq(
        Event(22L, ts("2024-03-01 09:30:00"), 7L, "purchase", 10.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enr2").as[EventPipeline.EnrichedPurchase]
      .collect().map(e => e.purchase_id -> e.click_id).toMap
    assert(got == Map(22L -> Some(20L)))
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
      // advance the watermark far past user 7's idle timeout: state is
      // evicted, and a later re-appearance restarts the rollup at 1
      ms.addData(Seq(Event(90L, ts("2024-03-04 00:00:00"), 9L, "x", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(91L, ts("2024-03-04 01:00:00"), 7L, "click", 9.9)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("us").as[UserSession].collect()
    val last = rows
      .groupBy(_.user_id).map { case (k, vs) => k -> vs.maxBy(_.n_events) }
    assert(last(7L) == UserSession(7L, 3L, 8.0))
    assert(last(8L) == UserSession(8L, 1L, 1.0))
    assert(rows.contains(UserSession(7L, 1L, 9.9)),
      "evicted key must restart from zero, not resume the old rollup")
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

  test("dedupWithinWatermark drops cross-batch re-deliveries of a key") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipeline
      .dedupWithinWatermark(ms.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      ms.addData(Seq(sample(0), sample(1)))
      q.processAllAvailable()
      ms.addData(Seq(sample(1), sample(2))) // event 2 re-delivered
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dd").select("event_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L)) // each key exactly once
  }

  test("closedSessions emits a session once, when gap or timeout closes it") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipeline.closedSessions(ms.toDS(), spark, gapMinutes = 30)
      .writeStream.format("memory").queryName("cs")
      .outputMode("append").start()
    try {
      // user 7: two events 10min apart (one session), then an in-batch
      // 2h gap opens a second session.
      ms.addData(Seq(
        Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 1.0),
        Event(2L, ts("2024-03-01 10:10:00"), 7L, "click", 2.0),
        Event(3L, ts("2024-03-01 12:30:00"), 7L, "click", 4.0)))
      q.processAllAvailable()
      // advance the watermark far past 12:30+30min so the open session
      // times out; the extra batch triggers timeout processing.
      ms.addData(Seq(Event(9L, ts("2024-03-02 12:00:00"), 8L, "view", 0.5)))
      q.processAllAvailable()
      ms.addData(Seq(Event(10L, ts("2024-03-03 12:00:00"), 8L, "view", 0.5)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cs")
      .as[EventPipeline.ClosedSession].collect()
      .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
    assert(rows.map(s => (s.session_start, s.n_events, s.total)).toSeq == Seq(
      (ts("2024-03-01 10:00:00"), 2L, 3.0), // closed by in-batch gap
      (ts("2024-03-01 12:30:00"), 1L, 4.0))) // closed by event-time timeout
  }

  test("closedSessions: late in-watermark event does not regress the end") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipeline.closedSessions(ms.toDS(), spark, gapMinutes = 30)
      .writeStream.format("memory").queryName("cslate")
      .outputMode("append").start()
    try {
      // batch 1: session [10:00, 10:20] (watermark after: 09:20)
      ms.addData(Seq(
        Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 1.0),
        Event(2L, ts("2024-03-01 10:20:00"), 7L, "click", 2.0)))
      q.processAllAvailable()
      // batch 2: a LATE but in-watermark event at 10:05 merges; the
      // session end must stay 10:20, not regress to 10:05
      ms.addData(Seq(
        Event(3L, ts("2024-03-01 10:05:00"), 7L, "click", 0.5),
        Event(4L, ts("2024-03-01 10:30:00"), 8L, "view", 0.0)))
      q.processAllAvailable()
      // batch 3: 10:45 is 25 min after the TRUE end (10:20) => same
      // session; a regressed end (10:05) would see a 40-min gap and
      // wrongly split here
      ms.addData(Seq(Event(5L, ts("2024-03-01 10:45:00"), 7L, "click", 1.5)))
      q.processAllAvailable()
      // advance the watermark far past 10:45+30min to time out + emit
      ms.addData(Seq(Event(9L, ts("2024-03-02 12:00:00"), 8L, "view", 0.5)))
      q.processAllAvailable()
      ms.addData(Seq(Event(10L, ts("2024-03-03 12:00:00"), 8L, "view", 0.5)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cslate")
      .as[EventPipeline.ClosedSession].collect()
      .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
    assert(rows.map(s => (s.session_start, s.n_events, s.total)).toSeq ==
      Seq((ts("2024-03-01 10:00:00"), 4L, 5.0)))
  }

  test("dedupIngestSink: near-dups filtered across and within batches") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ddi").toString
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val ms = MemoryStream[(Long, String)]
    val q = EventPipeline.dedupIngestSink(
      ms.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/sigs", s"$dir/kept", s"$dir/cp", 0.5)
    try {
      // batch 1: two genuinely different docs
      ms.addData(Seq(
        (1L, base),
        (2L, (1 to 30).map(i => s"x$i").mkString(" "))))
      q.processAllAvailable()
      // batch 2: 3 = near-copy of stored 1; 4 = new; 5 = in-batch
      // near-copy of 4 (smaller id wins)
      ms.addData(Seq(
        (3L, base + " tail"),
        (4L, (1 to 30).map(i => s"y$i").mkString(" ")),
        (5L, (1 to 30).map(i => s"y$i").mkString(" ") + " tail")))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
    // the store carries signatures for exactly the kept docs
    val sigIds = spark.read.parquet(s"$dir/sigs")
      .select("doc_id").as[Long].collect().toSet
    assert(sigIds == Set(1L, 2L, 4L))
  }

  test("corpusIngestSink: gate -> decontam -> dedup -> split as one " +
      "streaming ingest") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("cis").toString
    // letter-only tokens with one stopword so the quality gate passes
    def words(seed: Char) = "the " +
      (1 to 29).map(i => s"$seed${('a' + i % 26).toChar}x").mkString(" ")
    val benchText = "qq ww ee rr tt" // one benchmark 5-gram
    val bench = graft.ext.Decontam.benchNgrams(
      Seq(benchText).toDF("text")
        .select(graft.ext.Hashing.tokens(col("text")).as("tk")), "tk")
    val ms = MemoryStream[(Long, String)]
    val q = EventPipeline.corpusIngestSink(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", bench,
      s"$dir/sigs", s"$dir/kept", s"$dir/cp", threshold = 0.5)
    try {
      ms.addData(Seq(
        (1L, words('a')), // good
        (2L, words('b') + " " + benchText), // contaminated
        (3L, "tiny doc"))) // fails the quality gate
      q.processAllAvailable()
      ms.addData(Seq(
        (4L, words('a') + " tail"), // near-dup of stored 1
        (5L, words('c')))) // good
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    // split travels with the kept rows and is recomputable from the id
    val stored = kept.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    val expected = graft.ext.Sampling.splitAssign(
        kept.select("doc_id"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(stored == expected)
    assert(stored.values.forall(Set("train", "val")))
    // the signature store tracks exactly the kept docs
    assert(spark.read.parquet(s"$dir/sigs")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
  }

  test("runAvailableNow: file-source daily run, idempotent via checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("anow").toString
    // append-mode windows only finalize once the watermark passes them:
    // a far-future sentinel event closes every sample window (its own
    // window stays in state — correct streaming semantics)
    val in = sample :+ Event(99L, ts("2024-03-05 00:00:00"), 9L, "x", 0.0)
    in.toDF().write.parquet(s"$dir/in")
    val schema = in.toDF().schema
    EventPipeline.runAvailableNow(spark, s"$dir/in", schema,
      s"$dir/out", s"$dir/cp")
    val once = spark.read.parquet(s"$dir/out")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = EventPipeline.windowedStats(sample.toDF())
      .as[(String, String, Long, Double)].collect().toSet
    assert(once == batch)
    // re-run with the same checkpoint: nothing new to process, sink
    // unchanged (the S1/S2 "daily rerun is safe" property)
    EventPipeline.runAvailableNow(spark, s"$dir/in", schema,
      s"$dir/out", s"$dir/cp")
    val twice = spark.read.parquet(s"$dir/out")
      .as[(String, String, Long, Double)].collect().toSet
    assert(twice == once)
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

  test("attributedPurchases: stream-stream interval join equals batch twin") {
    implicit val ctx = spark.sqlContext
    val evts = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 0.0),
      Event(2L, ts("2024-03-01 10:20:00"), 7L, "purchase", 9.5), // <- 1
      Event(3L, ts("2024-03-01 11:30:00"), 7L, "purchase", 3.0), // no click in window
      Event(4L, ts("2024-03-01 10:10:00"), 8L, "purchase", 1.0), // other user, no click
      Event(5L, ts("2024-03-01 10:05:00"), 7L, "click", 0.0))    // second click -> also pairs with 2
    val ms = MemoryStream[Event]
    val q = EventPipeline.attributedPurchases(ms.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      ms.addData(evts.take(3))
      q.processAllAvailable()
      ms.addData(evts.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("attr")
      .as[(Long, Long, Long, String, String, Double)].collect().toSet
    val batch = EventPipeline.attributedPurchases(evts.toDF())
      .as[(Long, Long, Long, String, String, Double)].collect().toSet
    assert(batch == Set(
      (7L, 1L, 2L, "2024-03-01 10:00:00", "2024-03-01 10:20:00", 9.5),
      (7L, 5L, 2L, "2024-03-01 10:05:00", "2024-03-01 10:20:00", 9.5)))
    assert(streaming == batch)
  }

  /** PNG bytes via the JRE's own codec (same helper shape as
    * MultimodalSpec's). */
  private def pngBytes(pixels: Seq[Seq[Int]]): Array[Byte] = {
    val h = pixels.size; val w = pixels.head.size
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "no png writer")
    out.toByteArray
  }

  test("mediaIngestSink: perceptual near-dup images filtered across " +
      "and within batches; undecodable payloads kept flagged") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mdi").toString
    val (w, h) = (33, 18)
    def grey(v: Int) = (v << 16) | (v << 8) | v
    def px(f: (Int, Int) => Int): Seq[Seq[Int]] =
      Seq.tabulate(h, w)((y, x) => f(x, y)).map(_.toSeq)
    val up = px((x, _) => grey(x * 255 / (w - 1)))
    val upPerturbed = px((x, y) => grey(
      if (x == 0 && y == 0) 8 else x * 255 / (w - 1)))
    val down = px((x, _) => grey(255 - x * 255 / (w - 1)))
    // rise-then-fall: a third distinct gradient signature
    val tent = px((x, _) => grey(
      if (x < w / 2) x * 510 / w else 510 - x * 510 / w))
    val tentPerturbed = px((x, y) => grey(
      if (x == 1 && y == 0) 250
      else if (x < w / 2) x * 510 / w else 510 - x * 510 / w))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = EventPipeline.mediaIngestSink(
      ms.toDF().toDF("doc_id", "media"),
      "doc_id", s"$dir/store", s"$dir/kept", s"$dir/cp")
    try {
      // batch 1: two genuinely different images
      ms.addData(Seq((1L, pngBytes(up)), (2L, pngBytes(down))))
      q.processAllAvailable()
      // batch 2: 3 = perceptual copy of stored 1; 4 = new pattern;
      // 5 = in-batch copy of 4 (smaller id wins); 6 = undecodable
      ms.addData(Seq(
        (3L, pngBytes(upPerturbed)),
        (4L, pngBytes(tent)),
        (5L, pngBytes(tentPerturbed)),
        (6L, "not an image".getBytes("UTF-8"))))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id", "decoded").as[(Long, Boolean)].collect().toMap
    assert(kept.keySet == Set(1L, 2L, 4L, 6L))
    assert(kept(6L) == false && kept(1L) && kept(2L) && kept(4L))
    // the store carries hashes for exactly the kept DECODED items
    val stored = spark.read.parquet(s"$dir/store")
      .select("doc_id").as[Long].collect().toSet
    assert(stored == Set(1L, 2L, 4L))
    // store maintenance reuses the Dedup utilities unchanged (the
    // store is just an (id, hash) parquet table): tombstone item 1,
    // then a re-sent perceptual copy of it is KEPT by a fresh sink
    graft.ext.Dedup.deleteSignatures(
      Seq(1L).toDF("doc_id"), "doc_id", s"$dir/store")
    assert(spark.read.parquet(s"$dir/store")
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    val ms2 = MemoryStream[(Long, Array[Byte])]
    val q2 = EventPipeline.mediaIngestSink(
      ms2.toDF().toDF("doc_id", "media"),
      "doc_id", s"$dir/store", s"$dir/kept", s"$dir/cp2")
    try {
      ms2.addData(Seq((7L, pngBytes(up))))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 4L, 6L, 7L))
  }

  test("streamingFunnel emits step completions live and matches the " +
      "batch twin on the full log") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val log = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "view", 0),
      Event(2L, ts("2024-03-01 10:05:00"), 7L, "click", 0),
      Event(3L, ts("2024-03-01 10:04:00"), 8L, "click", 0), // before view
      Event(4L, ts("2024-03-01 10:06:00"), 8L, "view", 0),
      Event(5L, ts("2024-03-01 10:30:00"), 7L, "buy", 0),
      Event(6L, ts("2024-03-02 12:00:00"), 8L, "click", 0), // gap > 1h
      Event(7L, ts("2024-03-01 10:20:00"), 9L, "view", 0))
    val (b1, b2) = log.splitAt(4)
    val gapMs = Some(3600L * 1000)
    val ms = MemoryStream[Event]
    val q = EventPipeline.streamingFunnel(ms.toDS(), spark,
        Seq("view", "click", "buy"), gapMs)
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("funnel_hits")
      .select("user_id", "step_idx", "step", "ts")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3))).toSet
    // u7 completes all three; u8's early click doesn't count and the
    // next-day click misses the gap; u9 only views
    assert(live === Set(
      (7L, 0, "view", ts("2024-03-01 10:00:00")),
      (7L, 1, "click", ts("2024-03-01 10:05:00")),
      (7L, 2, "buy", ts("2024-03-01 10:30:00")),
      (8L, 0, "view", ts("2024-03-01 10:06:00")),
      (9L, 0, "view", ts("2024-03-01 10:20:00"))))
    // batch-twin equality on the same log
    val batch = graft.ext.Behavior.conversionFunnel(
        log.toDF().withColumnRenamed("event_type", "et"),
        "user_id", "ts", "et", Seq("view", "click", "buy"),
        maxGap = Some(org.apache.spark.sql.functions
          .expr("INTERVAL 1 HOUR")))
      .select(col("user"), col("step_idx"), col("step"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3))).toSet
    assert(live === batch)
  }

  test("scd2Sink maintains the historized dimension across micro-batches") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("scd2s").toString
    val hist = s"$dir/history"
    // (user, plan, seq, ts-long) change log
    val ms = MemoryStream[(String, String, Long, Long)]
    val q = EventPipeline.scd2Sink(
      ms.toDF().toDF("u", "plan", "seq", "ts"), hist,
      key = Seq("u"), ts = "ts", tracked = Seq("plan"),
      tieBreak = Seq("seq"), checkpointDir = s"$dir/cp")
    def history() = spark.read.parquet(hist)
      .select("u", "plan", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    try {
      ms.addData(Seq(("u1", "free", 1L, 10L), ("u2", "pro", 2L, 15L)))
      q.processAllAvailable()
      assert(history() === Set(
        ("u1", "free", 10L, None, true),
        ("u2", "pro", 15L, None, true)))
      // batch 2: u1 upgrades (new version), u2 no-op (collapses),
      // u3 appears; u2's rows must pass through untouched
      ms.addData(Seq(("u1", "pro", 3L, 30L), ("u2", "pro", 4L, 40L),
        ("u3", "free", 5L, 50L)))
      q.processAllAvailable()
      assert(history() === Set(
        ("u1", "free", 10L, Some(30L), false),
        ("u1", "pro", 30L, None, true),
        ("u2", "pro", 15L, None, true),
        ("u3", "free", 50L, None, true)))
    } finally q.stop()
    // the sink's result equals the batch historize of the whole log —
    // the streaming/batch twin contract
    val full = graft.ext.Scd2.historize(
      Seq(("u1", "free", 1L, 10L), ("u2", "pro", 2L, 15L),
        ("u1", "pro", 3L, 30L), ("u2", "pro", 4L, 40L),
        ("u3", "free", 5L, 50L)).toDF("u", "plan", "seq", "ts"),
      Seq("u"), "ts", Seq("plan"), Seq("seq"))
      .select("u", "plan", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(history() === full)
  }
  test("benfordMonitor: cumulative digit counts equal the batch n_obs " +
      "after every batch prefix; digit extraction parity is exact") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // boundary sweep: digit parity between the Column chain and the
    // Scala twin (one semantics, two faces)
    val sweep = Seq(0.0, -3.0, 1e-10, 4.2e-4, 0.999999999, 1.0, 9.99,
      10.0, 100.0, 123.456, 9.99e5, 0.042)
    val viaCol = graft.ext.Profile.benford(
        sweep.toDF("x"), "x")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScala = sweep.flatMap(graft.ext.Profile.benfordDigit)
      .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    (1L to 9L).foreach { d =>
      assert(viaCol(d) === viaScala.getOrElse(d, 0L), s"digit $d") }

    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 7L, "click", 123.0),
      Event(2L, ts("2024-03-01 11:00:00"), 7L, "click", 19.0),
      Event(3L, ts("2024-03-01 10:30:00"), 8L, "view", 0.25),
      Event(4L, ts("2024-03-01 10:40:00"), 8L, "view", -7.0)) // dropped
    val batch2 = Seq(
      Event(5L, ts("2024-03-01 12:00:00"), 7L, "click", 140.0),
      Event(6L, ts("2024-03-01 13:00:00"), 7L, "click", 95.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.benfordMonitor(ms.toDS(), spark)
      .writeStream.format("memory").queryName("benford_counts")
      .outputMode("update").start()
    def counts() = spark.table("benford_counts")
      .groupBy(col("digit")).agg(
        org.apache.spark.sql.functions.max(col("n_obs")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def batchCounts(evs: Seq[Event]) = graft.ext.Profile.benford(
        evs.toDF().select(col("value")), "value")
      .where(col("n_obs") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(counts() === batchCounts(batch1)) // {1->2, 2->1}
      ms.addData(batch2); q.processAllAvailable()
      assert(counts() === batchCounts(batch1 ++ batch2))
    } finally q.stop()
  }

  test("driftMonitor: per-stream battery equals Profile.binnedDrift " +
      "on every batch prefix; clamping and ties match") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // reference frame: 0..99 → lo=0, hi=99, ten bins of ten
    val refDF = (0 until 100).map(_.toDouble).toDF("value")
    val ref = EventPipeline.driftRef(refDF, "value", bins = 10)
    assert(ref.lo === 0.0 && ref.hi === 99.0 &&
      ref.refCounts.sum === 100L)
    // out-of-range values exercise edge-bin clamping on both faces
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 1L, "click", 3.0),
      Event(2L, ts("2024-03-01 10:01:00"), 2L, "click", -5.0),
      Event(3L, ts("2024-03-01 10:02:00"), 3L, "click", 250.0),
      Event(4L, ts("2024-03-01 10:03:00"), 4L, "view", 55.0))
    val batch2 = Seq(
      Event(5L, ts("2024-03-01 11:00:00"), 5L, "click", 42.0),
      Event(6L, ts("2024-03-01 11:01:00"), 6L, "click", 42.5),
      Event(7L, ts("2024-03-01 11:02:00"), 7L, "view", 90.0),
      Event(8L, ts("2024-03-01 11:03:00"), 8L, "view", 14.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.driftMonitor(ms.toDS(), spark, ref)
      .writeStream.format("memory").queryName("drift_rows")
      .outputMode("update").start()
    def latest() = spark.table("drift_rows")
      .groupBy(col("stream"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_cur"), col("n_bins_occ"), col("psi"), col("ks"),
          col("ks_bin"), col("chi2"), col("dof"))).as("s"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getStruct(1)
        (s.getLong(0), s.getLong(1), s.getDouble(2), s.getDouble(3),
          s.getLong(4), s.getDouble(5), s.getLong(6))
      }).toMap
    def batchRow(evs: Seq[Event], stream: String) = {
      val r = graft.ext.Profile.binnedDrift(refDF,
        evs.filter(_.event_type == stream).toDF().select(col("value")),
        "value", bins = 10).collect()(0)
      (r.getAs[Long]("n_cur"), r.getAs[Long]("n_bins_occ"),
        r.getAs[Double]("psi"), r.getAs[Double]("ks"),
        r.getAs[Long]("ks_bin"), r.getAs[Double]("chi2"),
        r.getAs[Long]("dof"))
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(latest()("click") === batchRow(batch1, "click"))
      assert(latest()("view") === batchRow(batch1, "view"))
      ms.addData(batch2); q.processAllAvailable()
      val all = batch1 ++ batch2
      assert(latest()("click") === batchRow(all, "click"))
      assert(latest()("view") === batchRow(all, "view"))
    } finally q.stop()
  }

  test("calibratedGate: accept set equals the batch isotonic-gate " +
      "(pipeline14's rule) on every batch prefix; unseen bins fail " +
      "closed") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, floor, least, greatest, lit, when}
    // reference: scores 0..99, label = score >= 60 (monotone-ish with
    // noise at 30 and 45 so the isotonic fit does real pooling); bin
    // width 9.9 over 10 bins
    val refRows = (0 until 100).map { i =>
      val y = if (i >= 60 || i == 30 || i == 45) 1 else 0
      (i.toDouble, y)
    }
    val refDF = refRows.toDF("sc", "y")
    val ref = EventPipeline.calibRef(refDF, "sc", "y", bins = 10)
    assert(ref.lo === 0.0 && ref.hi === 99.0 && ref.fit.size === 10)
    // batch twin of the gate: bin each value on the reference binning
    // and accept iff the bin's isotonic fit beats the base rate — the
    // exact q_x_pipeline14 accept stage
    def batchAccept(evs: Seq[Event]): Set[Long] = {
      val fit = graft.ext.Classifier
        .isotonicCalibration(refDF, "sc", "y", bins = 10)
        .select(col("bin"), col("fit")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val br = refRows.map(_._2).sum.toDouble / refRows.size
      val binned = evs.toDF()
        .withColumn("bin",
          when(lit(ref.hi) === lit(ref.lo), lit(0L))
            .otherwise(least(lit(9L), greatest(lit(0L),
              floor((col("value") - lit(ref.lo))
                / ((lit(ref.hi) - lit(ref.lo)) / 10)).cast("long")))))
        .select(col("event_id"), col("bin")).collect()
      binned.filter(r => fit.get(r.getLong(1)).exists(_ > br))
        .map(_.getLong(0)).toSet
    }
    // -5 and 250 clamp to edge bins; all reference bins are occupied
    // here, so fail-closed is exercised via a second sparse reference
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 1L, "click", 95.0),
      Event(2L, ts("2024-03-01 10:01:00"), 2L, "click", 5.0),
      Event(3L, ts("2024-03-01 10:02:00"), 3L, "view", 62.0),
      Event(4L, ts("2024-03-01 10:03:00"), 4L, "view", -5.0))
    val batch2 = Seq(
      Event(5L, ts("2024-03-01 11:00:00"), 5L, "click", 250.0),
      Event(6L, ts("2024-03-01 11:01:00"), 6L, "view", 59.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.calibratedGate(ms.toDS(), spark, ref)
      .writeStream.format("memory").queryName("gate_rows")
      .outputMode("append").start()
    def accepted() = spark.table("gate_rows")
      .where(col("accept")).select(col("event_id"))
      .collect().map(_.getLong(0)).toSet
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(accepted() === batchAccept(batch1))
      ms.addData(batch2); q.processAllAvailable()
      assert(accepted() === batchAccept(batch1 ++ batch2))
      // high scores pass, low scores are rejected (sanity on content)
      assert(accepted().contains(1L) && !accepted().contains(2L))
    } finally q.stop()
    // fail-closed: a reference occupying only bins {0, 9} gives bins
    // 1..8 no fit; a mid-range event must be rejected even though its
    // score is "good"
    val sparseRef = EventPipeline.calibRef(
      Seq((0.0, 0), (1.0, 0), (98.0, 1), (99.0, 1)).toDF("sc", "y"),
      "sc", "y", bins = 10)
    assert(sparseRef.fit.keySet === Set(0L, 9L))
    val ms2 = MemoryStream[Event]
    val q2 = EventPipeline.calibratedGate(ms2.toDS(), spark, sparseRef)
      .writeStream.format("memory").queryName("gate_sparse")
      .outputMode("append").start()
    try {
      ms2.addData(Seq(
        Event(10L, ts("2024-03-01 12:00:00"), 1L, "click", 50.0),
        Event(11L, ts("2024-03-01 12:01:00"), 1L, "click", 99.0)))
      q2.processAllAvailable()
      val rows = spark.table("gate_sparse")
        .select(col("event_id"), col("accept"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows(10L) === false) // unseen bin: fail closed
      assert(rows(11L) === true)  // calibrated high bin: pass
    } finally q2.stop()
  }

  test("mixtureRakeSink: weights equal Mixture.ipfRake on every batch " +
      "prefix; re-delivered batch ids do not double-count") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_rake_")
      .toString
    // target profile: balanced 2x2 marginals
    val target = Seq(("web", "en"), ("web", "ko"), ("book", "en"),
      ("book", "ko")).toDF("source", "lang")
    val ref = EventPipeline.mixtureRef(target, "source", "lang")
    assert(ref.rowTn === Map("web" -> 2L, "book" -> 2L))
    // corpus batches skewed toward (web, en)
    val batch1 = Seq((1L, "web", "en"), (2L, "web", "en"),
      (3L, "web", "ko"), (4L, "book", "en"))
    val batch2 = Seq((5L, "book", "ko"), (6L, "web", "en"),
      (7L, "book", "ko"))
    val ms = MemoryStream[(Long, String, String)]
    val q = EventPipeline.mixtureRakeSink(
      ms.toDF().toDF("doc_id", "source", "lang"), "source", "lang",
      ref, s"$dir/cells", s"$dir/weights", s"$dir/ckpt")
    def weights() = spark.read.parquet(s"$dir/weights")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n"), r.getAs[Double]("weight"),
        r.getAs[Double]("mass"))).toSet
    def batchTwin(rows: Seq[(Long, String, String)]) =
      graft.ext.Mixture.ipfRake(
          rows.toDF("doc_id", "source", "lang"), target,
          "source", "lang")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Long]("n"), r.getAs[Double]("weight"),
          r.getAs[Double]("mass"))).toSet
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(weights() === batchTwin(batch1))
      ms.addData(batch2); q.processAllAvailable()
      assert(weights() === batchTwin(batch1 ++ batch2))
      // idempotence: re-delivering batch 0 must not double-count
      EventPipeline.mergeMixtureBatch(
        batch1.toDF("doc_id", "source", "lang"), 0L, "source", "lang",
        ref, s"$dir/cells", s"$dir/weights")
      assert(weights() === batchTwin(batch1 ++ batch2))
    } finally q.stop()
  }

  test("distanceMonitor: per-stream W1/TV/Hellinger equal " +
      "Profile.distanceBattery on every batch prefix") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val refDF = (0 until 100).map(_.toDouble).toDF("value")
    val ref = EventPipeline.driftRef(refDF, "value", bins = 10)
    val batch1 = Seq(
      Event(1L, ts("2024-03-01 10:00:00"), 1L, "click", 3.0),
      Event(2L, ts("2024-03-01 10:01:00"), 2L, "click", -5.0),
      Event(3L, ts("2024-03-01 10:02:00"), 3L, "click", 250.0),
      Event(4L, ts("2024-03-01 10:03:00"), 4L, "view", 55.0))
    val batch2 = Seq(
      Event(5L, ts("2024-03-01 11:00:00"), 5L, "click", 42.0),
      Event(6L, ts("2024-03-01 11:01:00"), 6L, "view", 90.0))
    val ms = MemoryStream[Event]
    val q = EventPipeline.distanceMonitor(ms.toDS(), spark, ref)
      .writeStream.format("memory").queryName("dist_rows")
      .outputMode("update").start()
    def latest() = spark.table("dist_rows")
      .groupBy(col("stream"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_cur"), col("n_ref"), col("bin_width"), col("w1"),
          col("tv"), col("hellinger"))).as("s"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getStruct(1)
        (s.getLong(0), s.getLong(1), s.getDouble(2), s.getDouble(3),
          s.getDouble(4), s.getDouble(5))
      }).toMap
    def batchRow(evs: Seq[Event], stream: String) = {
      val r = graft.ext.Profile.distanceBattery(refDF,
        evs.filter(_.event_type == stream).toDF().select(col("value")),
        "value", bins = 10).collect()(0)
      (r.getAs[Long]("n_cur"), r.getAs[Long]("n_ref"),
        r.getAs[Double]("bin_width"), r.getAs[Double]("w1"),
        r.getAs[Double]("tv"), r.getAs[Double]("hellinger"))
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(latest()("click") === batchRow(batch1, "click"))
      assert(latest()("view") === batchRow(batch1, "view"))
      ms.addData(batch2); q.processAllAvailable()
      val all = batch1 ++ batch2
      assert(latest()("click") === batchRow(all, "click"))
      assert(latest()("view") === batchRow(all, "view"))
    } finally q.stop()
  }

  test("hllMonitor: per-stream estimate equals the batch HLL on every " +
      "batch prefix; registers are order-free across batches") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mkEvents = (ids: Seq[Long], stream: String, base: Long) =>
      ids.zipWithIndex.map { case (u, i) =>
        Event(base + i, ts("2024-03-01 10:00:00"), u, stream, 1.0)
      }
    // duplicates on purpose: distinct users 1..40 click / 7..18 view
    val batch1 = mkEvents((1L to 25L) ++ (1L to 10L), "click", 100L) ++
      mkEvents(7L to 12L, "view", 300L)
    val batch2 = mkEvents((20L to 40L), "click", 400L) ++
      mkEvents((9L to 18L) ++ Seq(7L), "view", 600L)
    val ms = MemoryStream[Event]
    val q = EventPipeline.hllMonitor(ms.toDS(), spark, p = 9)
      .writeStream.format("memory").queryName("hll_counts")
      .outputMode("update").start()
    def latest() = spark.table("hll_counts")
      .groupBy(col("stream"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_seen"), col("estimate"), col("n_occupied"),
          col("v_zero"))).as("s"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getStruct(1)
        (s.getDouble(1), s.getLong(2), s.getLong(3))
      }).toMap
    def batchHll(evs: Seq[Event], stream: String) = {
      val row = graft.ext.Sketch.hyperLogLog(
        evs.filter(_.event_type == stream).toDF()
          .select(col("user_id")), "user_id", p = 9, salt = "hll")
        .head()
      (row.getAs[Double]("estimate"), row.getAs[Long]("n_occupied"),
        row.getAs[Long]("v_zero"))
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(latest()("click") === batchHll(batch1, "click"))
      assert(latest()("view") === batchHll(batch1, "view"))
      ms.addData(batch2); q.processAllAvailable()
      val all = batch1 ++ batch2
      assert(latest()("click") === batchHll(all, "click"))
      assert(latest()("view") === batchHll(all, "view"))
    } finally q.stop()
  }

  test("cmsMonitor: probe estimates equal batch countMin+cmsEstimate " +
      "on every batch prefix; bucket sums are order-free") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mkEvents = (ids: Seq[Long], stream: String, base: Long) =>
      ids.zipWithIndex.map { case (u, i) =>
        Event(base + i, ts("2024-03-01 10:00:00"), u, stream, 1.0)
      }
    // heavy key 7 on click; view has its own distribution
    val batch1 = mkEvents(Seq(7L, 7L, 7L, 1L, 2L, 3L), "click", 100L) ++
      mkEvents(Seq(7L, 9L), "view", 300L)
    val batch2 = mkEvents(Seq(7L, 7L, 4L, 5L), "click", 400L) ++
      mkEvents(Seq(9L, 9L, 9L), "view", 600L)
    val probes = Seq("7", "9", "999")
    val ms = MemoryStream[Event]
    val q = EventPipeline.cmsMonitor(ms.toDS(), spark, probes,
        d = 4, w = 32)
      .writeStream.format("memory").queryName("cms_pts")
      .outputMode("update").start()
    def latest() = spark.table("cms_pts")
      .groupBy(col("stream"), col("key"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_seen"), col("est"))).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getStruct(2).getLong(1)).toMap
    def batchEst(evs: Seq[Event], stream: String) = {
      val items = evs.filter(_.event_type == stream).toDF()
        .select(col("user_id"))
      val sk = graft.ext.Sketch.countMin(items, "user_id", d = 4,
        w = 32, salt = "cms")
      graft.ext.Sketch.cmsEstimate(sk,
        probes.toDF("user_id"), "user_id", d = 4, w = 32, salt = "cms")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      val b1c = batchEst(batch1, "click")
      probes.foreach(p => assert(latest()(("click", p)) === b1c(p)))
      ms.addData(batch2); q.processAllAvailable()
      val all = batch1 ++ batch2
      val ac = batchEst(all, "click"); val av = batchEst(all, "view")
      probes.foreach(p => assert(latest()(("click", p)) === ac(p)))
      probes.foreach(p => assert(latest()(("view", p)) === av(p)))
      // the absent key estimates at (or above, on collision) zero —
      // exactly what the batch twin reports
      assert(latest()(("view", "999")) === av("999"))
    } finally q.stop()
  }

  test("skylineMonitor: frontier equals batch skyline2d coordinates " +
      "on every batch prefix, in any arrival order") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // (x = value, y = user_id): dominated, frontier, and duplicate pts
    val pts1 = Seq((10.0, 5L), (8.0, 3L), (12.0, 9L), (10.0, 5L))
    val pts2 = Seq((7.0, 2L), (9.0, 9L), (50.0, 1L)) // 9.0/9 kills 12/9
    def mk(ps: Seq[(Double, Long)], base: Long) =
      ps.zipWithIndex.map { case ((x, y), i) =>
        Event(base + i, ts("2024-03-01 10:00:00"), y, "click", x)
      }
    def batchFront(ps: Seq[(Double, Long)]) = {
      val df = ps.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y.toDouble) }
        .toDF("id", "x", "y")
      graft.ext.Skyline.skyline2d(df, "id", "x", "y", 8)
        .select("x", "y").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    }
    val ms = MemoryStream[Event]
    val q = EventPipeline.skylineMonitor(ms.toDS(), spark)
      .writeStream.format("memory").queryName("sky_pts")
      .outputMode("update").start()
    def latest() = {
      val rows = spark.table("sky_pts")
        .where(col("stream") === "click").collect()
      val maxSeen = rows.map(_.getAs[Long]("n_seen")).max
      rows.filter(_.getAs[Long]("n_seen") == maxSeen)
        .map(r => (r.getDouble(1), r.getDouble(2))).toSet
    }
    try {
      ms.addData(mk(pts1, 100L)); q.processAllAvailable()
      assert(latest() === batchFront(pts1))
      ms.addData(mk(pts2, 200L)); q.processAllAvailable()
      assert(latest() === batchFront(pts1 ++ pts2))
      // order-free: replaying the union in another order converges to
      // the same frontier
      val ms2 = MemoryStream[Event]
      val q2 = EventPipeline.skylineMonitor(ms2.toDS(), spark)
        .writeStream.format("memory").queryName("sky_pts2")
        .outputMode("update").start()
      try {
        ms2.addData(mk((pts2 ++ pts1).reverse, 500L))
        q2.processAllAvailable()
        val rows2 = spark.table("sky_pts2").collect()
        val m2 = rows2.map(_.getAs[Long]("n_seen")).max
        assert(rows2.filter(_.getAs[Long]("n_seen") == m2)
          .map(r => (r.getDouble(1), r.getDouble(2))).toSet ===
          batchFront(pts1 ++ pts2))
      } finally q2.stop()
    } finally q.stop()
  }

  test("histQuantileMonitor: points equal batch histSketch+" +
      "histQuantiles on every batch prefix") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mk = (vs: Seq[Double], stream: String, base: Long) =>
      vs.zipWithIndex.map { case (v, i) =>
        Event(base + i, ts("2024-03-01 10:00:00"), i.toLong, stream, v)
      }
    val (lo, hi, bins) = (0.0, 100.0, 10)
    val qs = Seq(500, 990)
    val batch1 = mk((1 to 40).map(_ * 2.0), "click", 100L) ++
      mk(Seq(5.0, 95.0), "view", 300L)
    val batch2 = mk(Seq(-7.0, 250.0) ++ (1 to 15).map(_ * 6.0),
      "click", 500L) // includes edge-clamped values
    val ms = MemoryStream[Event]
    val q = EventPipeline.histQuantileMonitor(ms.toDS(), spark,
        lo, hi, bins, qs)
      .writeStream.format("memory").queryName("hq_pts")
      .outputMode("update").start()
    def latest() = spark.table("hq_pts")
      .groupBy(col("stream"), col("q_permille"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_seen"), col("n"), col("bin"), col("estimate")))
        .as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getStruct(2).getLong(1), r.getStruct(2).getLong(2),
          r.getStruct(2).getDouble(3))).toMap
    def batchPts(evs: Seq[Event], stream: String) = {
      val df = evs.filter(_.event_type == stream).toDF()
        .select(col("value"), col("event_type"))
      graft.ext.Sketch.histQuantiles(
        graft.ext.Sketch.histSketch(df, "value", "event_type",
          lo, hi, bins), qs, lo, hi, bins)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      val c1 = batchPts(batch1, "click"); val v1 = batchPts(batch1, "view")
      qs.foreach { p =>
        assert(latest()(("click", p.toLong)) === c1(p.toLong))
        assert(latest()(("view", p.toLong)) === v1(p.toLong))
      }
      ms.addData(batch2); q.processAllAvailable()
      val all = batchPts(batch1 ++ batch2, "click")
      qs.foreach(p =>
        assert(latest()(("click", p.toLong)) === all(p.toLong)))
    } finally q.stop()
  }

  test("kmvMonitor: estimate equals batch kmvSketch+kmvEstimate on " +
      "every batch prefix, including past the truncation point") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mkEvents = (ids: Seq[Long], stream: String, base: Long) =>
      ids.zipWithIndex.map { case (u, i) =>
        Event(base + i, ts("2024-03-01 10:00:00"), u, stream, 1.0)
      }
    val k = 8 // small k so batch 2 pushes "click" past truncation
    val batch1 = mkEvents((1L to 5L) ++ Seq(3L, 3L), "click", 100L) ++
      mkEvents(Seq(50L, 51L), "view", 300L)
    val batch2 = mkEvents((6L to 20L), "click", 400L) ++
      mkEvents(Seq(50L, 52L), "view", 600L)
    val ms = MemoryStream[Event]
    val q = EventPipeline.kmvMonitor(ms.toDS(), spark, k = k)
      .writeStream.format("memory").queryName("kmv_counts")
      .outputMode("update").start()
    def latest() = spark.table("kmv_counts")
      .groupBy(col("stream"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          col("n_seen"), col("n_sketch"), col("est"))).as("s"))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(1).getLong(1), r.getStruct(1).getDouble(2))).toMap
    def batchEst(evs: Seq[Event], stream: String) = {
      val items = evs.filter(_.event_type == stream).toDF()
        .select(col("user_id"), col("event_type"))
      val sk = graft.ext.Sketch.kmvSketch(items, "user_id",
        "event_type", k, "kmv")
      graft.ext.Sketch.kmvEstimate(sk, k).collect()(0) match {
        case r => (r.getLong(0), r.getDouble(1))
      }
    }
    try {
      ms.addData(batch1); q.processAllAvailable()
      assert(latest()("click") === batchEst(batch1, "click"))
      assert(latest()("view") === batchEst(batch1, "view"))
      // below k the estimate is the exact distinct count
      assert(latest()("click")._2 === 5.0)
      ms.addData(batch2); q.processAllAvailable()
      val all = batch1 ++ batch2
      assert(latest()("click") === batchEst(all, "click"))
      assert(latest()("view") === batchEst(all, "view"))
      assert(latest()("click")._1 === k.toLong) // truncated at k
    } finally q.stop()
  }

  test("growthMonitor deltas aggregate to the batch growth " +
      "accounting across odd batch splits, incl. timeout churn") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val ms = MemoryStream[Event]
    val q = EventPipeline.growthMonitor(ms.toDS(), spark)
      .writeStream.format("memory").queryName("gm")
      .outputMode("append").start()
    // the BehaviorSpec scenario: u1 d1,d2,d4; u2 d1; u3 d2,d3
    val core = Seq(
      Event(1L, ts("2024-01-01 08:00:00"), 1L, "view", 0.0),
      Event(2L, ts("2024-01-01 09:00:00"), 1L, "view", 0.0), // same day
      Event(3L, ts("2024-01-01 10:00:00"), 2L, "view", 0.0),
      Event(4L, ts("2024-01-02 08:00:00"), 1L, "view", 0.0),
      Event(5L, ts("2024-01-02 09:00:00"), 3L, "view", 0.0),
      Event(6L, ts("2024-01-03 09:00:00"), 3L, "view", 0.0),
      Event(7L, ts("2024-01-04 08:00:00"), 1L, "view", 0.0))
    try {
      core.grouped(3).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // flush: advance the watermark far past every lastDay+2 so all
      // pending churn timeouts fire (two batches trigger processing)
      ms.addData(Seq(Event(90L, ts("2024-02-01 00:00:00"), 99L, "view", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(91L, ts("2024-03-01 00:00:00"), 99L, "view", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("gm").as[EventPipeline.GrowthDelta]
      .collect().filter(_.user_id != 99L)
      .groupBy(d => (d.epoch_day, d.kind)).view.mapValues(_.size.toLong)
      .toMap
    // batch twin over the same core events
    val batchDf = core.toDF()
    val got = graft.ext.Behavior.growthAccounting(batchDf, "user_id", "ts")
      .select(datediff(col("day"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned"))
      .collect()
    got.foreach { r =>
      val d = r.getLong(0)
      def want(kind: String, v: Long) =
        assert(live.getOrElse((d, kind), 0L) === v,
          s"day $d $kind: live=${live.getOrElse((d, kind), 0L)} batch=$v")
      want("new", r.getLong(1))
      want("retained", r.getLong(2))
      want("resurrected", r.getLong(3))
      want("churned", r.getLong(4))
    }
    // and nothing extra: every live delta lands on a batch day
    assert(live.keys.map(_._1).toSet ===
      got.map(_.getLong(0)).toSet.filter(d =>
        live.keys.exists(_._1 == d)))
    assert(live.values.sum === got.map(r =>
      r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum)
  }
}
