package graft.ext

import graft.SparkSpec
import java.sql.Timestamp

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // days 1..10 alternate 11/10 events (non-zero variance); day 11 = 100
  private def events = {
    val base = for {
      d <- 1 to 10
      i <- 1 to (10 + d % 2)
    } yield (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), "click", 1.0)
    val spike = (1 to 100)
      .map(_ => (Timestamp.valueOf("2024-01-11 12:00:00"), "click", 1.0))
    (base ++ spike).toDF("ts", "event_type", "value")
  }

  test("planted volume spike is flagged; warm-up days stay null") {
    val r = Anomaly.dailyVolume(events)
      .as[(String, String, Long, Long, Option[Double], Option[Double],
        Boolean)]
      .collect().map(t => t._2 -> t).toMap
    assert(r.size == 11)
    // first 7 days: window not yet full -> no mean, no z, no flag
    (1 to 7).foreach { d =>
      val row = r(f"2024-01-$d%02d")
      assert(row._5.isEmpty && row._6.isEmpty && !row._7)
    }
    // stable full-window days are not anomalous
    (8 to 10).foreach { d =>
      val row = r(f"2024-01-$d%02d")
      assert(row._5.nonEmpty && row._6.nonEmpty && !row._7)
    }
    // the spike day is
    val spike = r("2024-01-11")
    assert(spike._3 == 100L && spike._6.exists(_ > 3.0) && spike._7)
  }

  test("zero-variance window yields null z, not a division blow-up") {
    val flat = (for { d <- 1 to 9; i <- 1 to 10 } yield
      (Timestamp.valueOf(f"2024-02-$d%02d 00:30:00"), "view", 0.0))
      .toDF("ts", "event_type", "value")
    val r = Anomaly.dailyVolume(flat)
      .as[(String, String, Long, Long, Option[Double], Option[Double],
        Boolean)]
      .collect().filter(_._4 == 7L)
    assert(r.nonEmpty)
    assert(r.forall(t => t._5.contains(10.0) && t._6.isEmpty && !t._7))
  }
}
