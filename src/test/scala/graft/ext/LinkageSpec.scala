package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fName = Linkage.FsField("nm",
    levenshtein(col("l_nm"), col("r_nm")) <= 1, m = 0.9, u = 0.1)
  private val fCity = Linkage.FsField("city",
    col("l_city") === col("r_city"), m = 0.8, u = 0.2)

  private def df(rows: (Long, String, String, String)*) =
    rows.toDF("id", "nm", "city", "blk")

  test("weights are log2 odds and the score sums them") {
    assert(math.abs(fName.wAgree - math.log(9.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(fName.wDisagree -
      math.log(0.1 / 0.9) / math.log(2.0)) < 1e-12)
    val out = Linkage.fsLink(
      df((1L, "ann", "nyc", "b1")),
      df((2L, "anna", "nyc", "b1")),
      "id", Seq("blk"), Seq(fName, fCity), upper = 100.0, lower = -100.0)
      .collect()(0)
    // both agree (levenshtein("ann","anna")=1)
    assert(out.getBoolean(2) && out.getBoolean(3))
    val expect = fName.wAgree + fCity.wAgree
    assert(math.abs(out.getDouble(4) - expect) < 1e-6)
    assert(out.getString(5) === "possible")
  }

  test("blocking: cross-block pairs are never scored") {
    val out = Linkage.fsLink(
      df((1L, "ann", "nyc", "b1")),
      df((2L, "ann", "nyc", "b2")),
      "id", Seq("blk"), Seq(fName), upper = 1.0, lower = 0.0)
    assert(out.count() === 0)
  }

  test("thresholds classify link / possible / non_link") {
    val l = df((1L, "ann", "nyc", "b"))
    val r = df((2L, "ann", "nyc", "b"), (3L, "ann", "sfo", "b"),
      (4L, "zzzzz", "sfo", "b"))
    val out = Linkage.fsLink(l, r, "id", Seq("blk"),
      Seq(fName, fCity), upper = 5.0, lower = 0.0)
      .collect().map(rw => rw.getLong(1) -> rw.getString(5)).toMap
    assert(out(2L) === "link") // 3.17 + 2.0 = 5.17 >= 5
    assert(out(3L) === "possible") // 3.17 - 2.0 = 1.17
    assert(out(4L) === "non_link") // -3.17 - 2.0
  }

  test("self-linkage keeps each unordered pair once") {
    val s = df((1L, "ann", "nyc", "b"), (2L, "ann", "nyc", "b"))
    val out = Linkage.fsLink(s, s, "id", Seq("blk"), Seq(fName),
      upper = 1.0, lower = -100.0, selfPairs = true).collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1)) === ((1L, 2L)))
  }

  test("a NULL comparison value counts as disagreement, not NULL score") {
    val out = Linkage.fsLink(
      df((1L, "ann", null, "b")),
      df((2L, "ann", "nyc", "b")),
      "id", Seq("blk"), Seq(fCity), upper = 1.0, lower = -100.0)
      .collect()(0)
    assert(!out.getBoolean(2))
    assert(math.abs(out.getDouble(3) - fCity.wDisagree) < 1e-9)
  }
}
