package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches latest preceding quote, inclusive at ties") {
    val probes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after q1
      (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at q2 -> inclusive
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (4L, 20L, ts("2024-01-01 10:00:00")) // other key, no quotes -> null
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 12:00:00"), 2.0)
    ).toDF("user_id", "ts", "v")

    val out = TemporalJoins
      .asOfJoin(probes, quotes, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v", "asof_time")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getDouble(1) == 1.0)
    assert(out(2L).getDouble(1) == 2.0) // quote at equal ts wins (>=)
    assert(out(2L).getTimestamp(2) == ts("2024-01-01 12:00:00"))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
    assert(out(4L).isNullAt(1))
  }

  test("asOfJoin tolerance nulls stale matches in both directions, " +
      "keeps fresh and boundary ones") {
    val probes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // 30min after q1: boundary
      (2L, 10L, ts("2024-01-01 11:00:00")), // 90min after q1: stale
      (3L, 10L, ts("2024-01-01 09:00:00"))  // no preceding quote
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq((10L, ts("2024-01-01 09:30:00"), 1.0))
      .toDF("user_id", "ts", "v")
    val back = TemporalJoins.asOfJoin(probes, quotes, Seq("user_id"), "ts",
        Seq("v"), toleranceSeconds = Some(1800L))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(back == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    // forward: probe 3 is 30min BEFORE the quote (boundary keep),
    // probe at 08:00 is 90min before (stale)
    val probesF = Seq(
      (3L, 10L, ts("2024-01-01 09:00:00")),
      (5L, 10L, ts("2024-01-01 08:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val fwd = TemporalJoins.asOfJoin(probesF, quotes, Seq("user_id"), "ts",
        Seq("v"), direction = "forward", toleranceSeconds = Some(1800L))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(fwd == Map(3L -> Some(1.0), 5L -> None))
  }

  test("asOfJoin tolerance is exact at sub-second resolution " +
      "(no whole-second truncation at the boundary)") {
    val probes = Seq((1L, 10L, ts("2024-01-01 10:30:00.1")))
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq((10L, ts("2024-01-01 09:59:59.9"), 1.0))
      .toDF("user_id", "ts", "v")
    // true staleness 1800.2s: second-truncated arithmetic would compute
    // 1800 <= 1800 and wrongly keep the match
    val r = TemporalJoins.asOfJoin(probes, quotes, Seq("user_id"), "ts",
        Seq("v"), toleranceSeconds = Some(1800L))
      .select("v").collect()
    assert(r.head.isNullAt(0), "1800.2s staleness must be stale at 1800")
  }

  test("asOfJoin tieBreak picks the greatest among equal-time quotes") {
    val probes = Seq((1L, 5L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (5L, ts("2024-01-01 09:00:00"), 100L, 1.0),
      (5L, ts("2024-01-01 09:00:00"), 200L, 2.0),
      (5L, ts("2024-01-01 09:00:00"), 150L, 3.0)
    ).toDF("user_id", "ts", "qid", "v")
    val out = TemporalJoins.asOfJoin(probes, quotes, Seq("user_id"), "ts",
      Seq("v"), tieBreak = col("qid"))
    assert(out.select("v").head.getDouble(0) == 2.0) // qid=200 wins
  }

  test("asOfJoin with NULL payload values returns the latest quote ROW, " +
      "never columns stitched from different quotes") {
    // latest quote has a=NULL, b=5; an older one has a=3, b=7. Per-column
    // last(ignoreNulls) would fabricate (a=3, b=5); the correct answer is
    // the latest row as-is: (NULL, 5).
    val probes = Seq((1L, 10L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some(3.0), Some(7L)),
      (10L, ts("2024-01-01 10:00:00"), Option.empty[Double], Some(5L))
    ).toDF("user_id", "ts", "a", "b")
    val r = TemporalJoins
      .asOfJoin(probes, quotes, Seq("user_id"), "ts", Seq("a", "b"))
      .select("a", "b", "asof_time").head
    assert(r.isNullAt(0), "a must be NULL — from the latest quote row")
    assert(r.getLong(1) == 5L)
    assert(r.getTimestamp(2) == ts("2024-01-01 10:00:00"))
  }

  test("asOfJoin direction=forward attaches the earliest following " +
      "quote, inclusive at equal time") {
    val probes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // between q1 and q2 -> q2
      (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at q2 -> inclusive
      (3L, 10L, ts("2024-01-01 13:00:00")) // after all quotes -> null
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 12:00:00"), 2.0)
    ).toDF("user_id", "ts", "v")
    val out = TemporalJoins
      .asOfJoin(probes, quotes, Seq("user_id"), "ts", Seq("v"),
        direction = "forward")
      .select("event_id", "v", "asof_time")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(1) == 2.0)
    assert(out(2L).getDouble(1) == 2.0) // equal time matches forward too
    assert(out(2L).getTimestamp(2) == ts("2024-01-01 12:00:00"))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
  }

  test("asOfJoin direction=forward matches a brute-force reference " +
      "(greatest tieBreak wins at equal time)") {
    val rnd = new scala.util.Random(17)
    def t(offsetMin: Int) =
      new java.sql.Timestamp(1700000000000L + offsetMin * 60000L)
    val probes = (1L to 300L)
      .map(i => (i, rnd.nextInt(5).toLong, t(rnd.nextInt(1000))))
    val quotes = (1L to 300L).map { i =>
      (rnd.nextInt(5).toLong, t(rnd.nextInt(1000)), i,
        if (rnd.nextInt(3) == 0) None else Some(i * 0.5))
    }
    val out = TemporalJoins.asOfJoin(
        probes.toDF("event_id", "user_id", "ts"),
        quotes.toDF("user_id", "ts", "qid", "v"),
        Seq("user_id"), "ts", Seq("v"), tieBreak = col("qid"),
        direction = "forward")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val brute = probes.map { case (id, k, ts) =>
      val eligible = quotes.filter(q => q._1 == k && !q._2.before(ts))
      id -> (if (eligible.isEmpty) None
             else eligible.minBy(q => (q._2.getTime, -q._3))._4)
    }.toMap
    assert(out == brute)
  }

  test("rangeJoinCount: boundaries inclusive, bucket-spanning, empty=0") {
    // 30-min buckets force the 2h interval to span 5 buckets.
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (2L, ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00")) // empty
    ).toDF("id", "lo", "hi")
    val points = Seq(
      ts("2024-01-01 10:00:00"), // == lo, inclusive
      ts("2024-01-01 11:15:30"),
      ts("2024-01-01 12:00:00"), // == hi, inclusive
      ts("2024-01-01 12:00:01"), // just outside
      ts("2024-01-01 09:59:59") // just outside
    ).toDF("pt")
    val out = TemporalJoins
      .rangeJoinCount(intervals, "id", "lo", "hi", points, "pt",
        bucketSeconds = 1800L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 0L))
  }

  test("asOfJoin matches a brute-force reference on random data " +
      "with NULL-bearing payload columns") {
    val rnd = new scala.util.Random(42)
    def t(offsetMin: Int) =
      new java.sql.Timestamp(1700000000000L + offsetMin * 60000L)
    val probes = (1L to 300L)
      .map(i => (i, rnd.nextInt(5).toLong, t(rnd.nextInt(1000))))
    // two payload columns, each independently NULL ~1/3 of the time —
    // exercises the whole-row (vs per-column-stitched) contract
    val quotes = (1L to 300L).map { i =>
      (rnd.nextInt(5).toLong, t(rnd.nextInt(1000)), i,
        if (rnd.nextInt(3) == 0) None else Some(i * 0.5),
        if (rnd.nextInt(3) == 0) None else Some(i * 7L))
    }
    val out = TemporalJoins.asOfJoin(
        probes.toDF("event_id", "user_id", "ts"),
        quotes.toDF("user_id", "ts", "qid", "v", "u"),
        Seq("user_id"), "ts", Seq("v", "u"), tieBreak = col("qid"))
      .select("event_id", "v", "u").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val brute = probes.map { case (id, k, ts) =>
      val eligible = quotes.filter(q => q._1 == k && !q._2.after(ts))
      id -> (if (eligible.isEmpty) (None, None)
             else {
               val w = eligible.maxBy(q => (q._2.getTime, q._3))
               (w._4, w._5)
             })
    }.toMap
    assert(out == brute)
  }

  test("rangeJoinCount matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    def t(offsetSec: Int) =
      new java.sql.Timestamp(1700000000000L + offsetSec * 1000L)
    val intervals = (1L to 100L).map { i =>
      val lo = rnd.nextInt(50000); (i, t(lo), t(lo + rnd.nextInt(8000)))
    }
    val points = (1 to 2000).map(_ => t(rnd.nextInt(60000)))
    val out = TemporalJoins.rangeJoinCount(
        intervals.toDF("id", "lo", "hi"), "id", "lo", "hi",
        points.toDF("pt"), "pt", bucketSeconds = 600L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = intervals.map { case (id, lo, hi) =>
      id -> points.count(p => !p.before(lo) && !p.after(hi)).toLong
    }.toMap
    assert(out == brute)
  }

  test("rangeJoinCount never double-counts a point (multi-bucket span)") {
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"))).toDF("id", "lo", "hi") // 48h, many buckets
    val points = (0 until 100)
      .map(i => ts(f"2024-01-01 ${i % 24}%02d:30:00")).toDF("pt")
    val n = TemporalJoins
      .rangeJoinCount(intervals, "id", "lo", "hi", points, "pt")
      .head.getLong(1)
    assert(n == 100L)
  }

  test("multiTouch: linear credit split, strict-before window, bucketing exact") {
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    // user 1: purchase 100.0 at 12:00 with clicks at 11:00 and 11:30
    // (credit 50 each); purchase 30.0 at 13:00 sees all three clicks
    // incl. 12:30 (credit 10 each). Click at exactly purchase time is
    // NOT credited (strict before); a click 25h earlier is outside.
    val conv = Seq((10L, 1L, ts("2024-01-02 12:00:00"), 100.0),
      (11L, 1L, ts("2024-01-02 13:00:00"), 30.0))
      .toDF("cid", "u", "cts", "v")
    val clicks = Seq(
      (1L, 1L, ts("2024-01-02 11:00:00")),
      (2L, 1L, ts("2024-01-02 11:30:00")),
      (3L, 1L, ts("2024-01-02 12:30:00")),
      (4L, 1L, ts("2024-01-02 12:00:00")), // == purchase 10 ts: only 11
      (5L, 1L, ts("2024-01-01 11:00:00")), // 25h before 10: only 11? no - outside both
      (6L, 2L, ts("2024-01-02 11:00:00"))) // other user
      .toDF("tid", "u", "tts")
    val out = TemporalJoins.multiTouch(conv, "cid", "cts", "v",
        clicks, "tid", "tts", Seq("u"), windowSeconds = 86400L,
        bucketSeconds = 1800L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // purchase 10 touches: clicks 1, 2 (4 excluded: not strict-before;
    // 5 outside window). purchase 11 touches: 1, 2, 3, 4 -> 7.5 each
    assert(out(1L) === ((2L, 50.0 + 7.5)))
    assert(out(2L) === ((2L, 50.0 + 7.5)))
    assert(out(3L) === ((1L, 7.5)))
    assert(out(4L) === ((1L, 7.5)))
    assert(!out.contains(5L) && !out.contains(6L))
  }
}
