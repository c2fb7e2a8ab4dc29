package graft.ext

import graft.SparkSpec

class SaxSpec extends SparkSpec {
  import spark.implicits._

  private def sax(w: Int, rows: (String, Long, Long, Double)*) =
    TimeSeries.sax(rows.toDF("k", "o", "tb", "x"), Seq("k"), "o", "x",
      tieBreak = "tb", w = w)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("a rising ramp symbolizes low-to-high, a falling one reverses") {
    val up = (1 to 8).map(i => ("u", i.toLong, i.toLong, i.toDouble))
    val down = (1 to 8).map(i => ("d", i.toLong, i.toLong, (9 - i).toDouble))
    val words = sax(4, up ++ down: _*)
    // segments of 2: means z-normalized symmetric around 0
    assert(words.keySet === Set("abcd", "dcba"))
    assert(words("abcd") === 1L)
    assert(words("dcba") === 1L)
  }

  test("identical series collapse onto one word with a count") {
    val rows = for (k <- Seq("a", "b", "c"); i <- 1 to 8)
      yield (k, i.toLong, i.toLong, i.toDouble)
    val words = sax(4, rows: _*)
    assert(words === Map("abcd" -> 3L))
  }

  test("constant series (zero variance) are excluded") {
    val rows = (1 to 8).map(i => ("flat", i.toLong, i.toLong, 5.0))
    assert(sax(4, rows: _*).isEmpty)
  }

  test("series shorter than w produce shorter words, deterministically") {
    val rows = Seq(("s", 1L, 1L, 1.0), ("s", 2L, 2L, 2.0),
      ("s", 3L, 3L, 3.0))
    val words = sax(8, rows: _*)
    assert(words.size === 1)
    assert(words.keys.head.length === 3)
  }

  test("segment order follows the order column, ties on tieBreak") {
    // same order value; tieBreak decides: x ascending under tb
    val rows = Seq(("t", 1L, 2L, 8.0), ("t", 1L, 1L, 1.0),
      ("t", 2L, 1L, 2.0), ("t", 2L, 2L, 9.0))
    // sequence is 1, 8, 2, 9 -> segments {1,8} (mean z < 0 -> 'b') and
    // {2,9} (mean z > 0 -> 'c'); any other ordering of the tied rows
    // (e.g. 8, 1, 9, 2) would produce different segment contents
    assert(sax(2, rows: _*) === Map("bc" -> 1L))
  }
}
