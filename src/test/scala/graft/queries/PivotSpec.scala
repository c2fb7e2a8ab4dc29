package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G11 pivot cross-tab: explicit value list fixes the output schema
  * (absent types are ZERO columns, never missing ones), counts exact. */
class PivotSpec extends SparkSpec {
  import spark.implicits._

  test("pivot: fixed columns, zero-filled absences, exact counts") {
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T12:00:00Z") // a Monday
        .plusSeconds(day * 86400L))
    val df = Seq((1L, t(0), "click"), (2L, t(0), "click"),
      (3L, t(0), "view"), (4L, t(1), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = df.withColumn("dow", dayofweek(col("ts")).cast("long"))
      .groupBy(col("dow"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1))).na.fill(0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet == Set(2L, 3L)) // Mon, Tue in Spark's 1=Sun scheme
    assert(got(2L) == ((2L, 0L, 0L, 0L, 1L)))
    assert(got(3L) == ((0L, 1L, 0L, 0L, 0L)))
  }
}
