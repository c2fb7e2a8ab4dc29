package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def ip(s: String): Option[Double] =
    Seq(s).toDF("ip").select(Exprs.ipToFloat(col("ip"))).as[Option[Double]]
      .head()

  test("F3 ipToFloat: whole + fraction") {
    assert(ip("5 2/3").contains(5.0 + 2.0 / 3.0))
    assert(ip("0 1/3").contains(1.0 / 3.0))
  }

  test("F3 ipToFloat: bare fraction and bare whole") {
    assert(ip("2/3").contains(2.0 / 3.0))
    assert(ip("5").contains(5.0))
    assert(ip("0").contains(0.0))
  }

  test("F3 ipToFloat: whitespace tolerated, garbage -> NULL") {
    assert(ip("  7 1/3  ").contains(7.0 + 1.0 / 3.0))
    assert(ip("-").isEmpty)
    assert(ip("abc").isEmpty)
    assert(ip("").isEmpty)
  }

  test("F4/F5 dashNull + percent") {
    val r = Seq("3.5", "-", " - ", "x").toDF("v")
      .select(Exprs.dashNull(col("v")).as("d"),
        Exprs.percent(col("v")).as("p"))
      .as[(Option[Double], Option[Double])].collect()
    assert(r(0) == (Some(3.5), Some(0.035)))
    assert(r(1) == (None, None))
    assert(r(2) == (None, None))
    assert(r(3) == (None, None)) // unparseable cast under try: NULL
  }

  test("F6 result bundle parse") {
    val r = Seq("HANWHA3vs11SAMSUNG").toDF("b").select(
      Exprs.bundleAway(col("b")), Exprs.bundleAScore(col("b")),
      Exprs.bundleHScore(col("b")), Exprs.bundleHome(col("b")))
      .as[(String, Int, Int, String)].head()
    assert(r == ("HANWHA", 3, 11, "SAMSUNG"))
  }

  test("F7 schedule bundle parse is non-greedy on away side") {
    val r = Seq("LGvsKIA").toDF("b")
      .select(Exprs.schedAway(col("b")), Exprs.schedHome(col("b")))
      .as[(String, String)].head()
    assert(r == ("LG", "KIA"))
  }

  test("F8 weekday-strip + year-inject datetime parse") {
    val r = Seq("03.15(수)18:30").toDF("c")
      .select(date_format(
        Exprs.parseGameDatetime(col("c"), lit(2024)),
        "yyyy-MM-dd HH:mm")).as[String].head()
    assert(r == "2024-03-15 18:30")
  }

  test("F9 date rebuild") {
    val r = Seq("03.07").toDF("c")
      .select(Exprs.rebuildDate(col("c"), lit(2024)).cast("string"))
      .as[String].head()
    assert(r == "2024-03-07")
  }

  test("F10 result sign") {
    val r = Seq((5, 3), (2, 2), (1, 4)).toDF("a", "h")
      .select(Exprs.resultSign(col("a"), col("h"))).as[Int].collect()
    assert(r.toSeq == Seq(-1, 0, 1))
  }

  test("F11 first token / marker strip") {
    assert(Seq("  KIA Tigers ").toDF("c")
      .select(Exprs.firstToken(col("c"))).as[String].head() == "KIA")
    assert(Seq("류현진선").toDF("c")
      .select(Exprs.stripMarker(col("c"), "선")).as[String].head() == "류현진")
  }

  test("F12 dot-timestamp parse") {
    val r = Seq("2024.7.9 5:05").toDF("c")
      .select(date_format(Exprs.parseDotTimestamp(col("c")),
        "yyyy-MM-dd HH:mm")).as[String].head()
    assert(r == "2024-07-09 05:05")
  }

  test("S5 KST conversion shifts +9h from UTC") {
    val r = Seq("2024-03-01 20:00:00").toDF("c")
      .select(date_format(Exprs.toKst(to_timestamp(col("c"))),
        "yyyy-MM-dd HH:mm")).as[String].head()
    assert(r == "2024-03-02 05:00")
  }
}
