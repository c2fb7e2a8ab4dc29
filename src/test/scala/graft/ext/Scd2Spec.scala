package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, value, seq, ts) change log; ts is a plain long — historize is
  // generic over any orderable timestamp column.
  private def log(rows: (String, String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "seq", "ts")

  private def hist(df: DataFrame): DataFrame =
    Scd2.historize(df, Seq("k"), "ts", Seq("v"), Seq("seq"))

  private def rows(df: DataFrame): Set[(String, String, Long, Long, Option[Long], Boolean)] =
    df.select("k", "v", "seq", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).toSet

  test("no-op updates collapse; versions chain; last is current") {
    val h = hist(log(
      ("u1", "A", 1, 10), ("u1", "A", 2, 20), // collapses
      ("u1", "B", 3, 30), ("u1", "A", 4, 40),
      ("u2", "X", 5, 15)))
    assert(rows(h) === Set(
      ("u1", "A", 1L, 10L, Some(30L), false),
      ("u1", "B", 3L, 30L, Some(40L), false),
      ("u1", "A", 4L, 40L, None, true),
      ("u2", "X", 5L, 15L, None, true)))
  }

  test("a NULL tracked value opens and closes versions like any other") {
    val h = hist(log(("u1", null, 1, 10), ("u1", null, 2, 20),
      ("u1", "A", 3, 30), ("u1", null, 4, 40)))
    assert(rows(h) === Set(
      ("u1", null, 1L, 10L, Some(30L), false),
      ("u1", "A", 3L, 30L, Some(40L), false),
      ("u1", null, 4L, 40L, None, true)))
  }

  test("equal timestamps break ties on the tieBreak column, deterministically") {
    val h = hist(log(("u1", "A", 1, 10), ("u1", "B", 2, 10)))
    assert(rows(h) === Set(
      ("u1", "A", 1L, 10L, Some(10L), false),
      ("u1", "B", 2L, 10L, None, true)))
  }

  test("ordered batch merges land on exactly the full-log historization") {
    val rnd = new scala.util.Random(7)
    val full = (0 until 300).map { i =>
      (s"u${rnd.nextInt(12)}", s"v${rnd.nextInt(3)}", i.toLong,
        (i * 7 + rnd.nextInt(3)).toLong)
    }
    val sorted = full.sortBy(_._4)
    val (b1, rest) = sorted.splitAt(100)
    val (b2, b3) = rest.splitAt(120)
    val expected = rows(hist(log(sorted: _*)))
    val step1 = hist(log(b1: _*))
    val step2 = Scd2.merge(step1, log(b2: _*), Seq("k"), "ts", Seq("v"), Seq("seq"))
    val step3 = Scd2.merge(step2, log(b3: _*), Seq("k"), "ts", Seq("v"), Seq("seq"))
    assert(rows(step3) === expected)
  }

  test("merge leaves untouched keys' history rows byte-identical") {
    val base = hist(log(("u1", "A", 1, 10), ("u1", "B", 2, 20),
      ("u2", "X", 3, 15)))
    val merged = Scd2.merge(base, log(("u2", "Y", 4, 30)),
      Seq("k"), "ts", Seq("v"), Seq("seq"))
    val u1 = rows(merged.where(col("k") === "u1"))
    assert(u1 === rows(base.where(col("k") === "u1")))
    assert(rows(merged.where(col("k") === "u2")) === Set(
      ("u2", "X", 3L, 15L, Some(30L), false),
      ("u2", "Y", 4L, 30L, None, true)))
  }

  test("merge is idempotent: re-delivering the same batch changes nothing") {
    val base = hist(log(("u1", "A", 1, 10)))
    val batch = log(("u1", "B", 2, 20), ("u2", "X", 3, 15))
    val once = Scd2.merge(base, batch, Seq("k"), "ts", Seq("v"), Seq("seq"))
    val twice = Scd2.merge(once, batch, Seq("k"), "ts", Seq("v"), Seq("seq"))
    assert(rows(twice) === rows(once),
      "at-least-once re-delivery must collapse as no-ops")
  }

  test("asOf picks the version live at the probe time") {
    val h = hist(log(("u1", "A", 1, 10), ("u1", "B", 2, 30)))
    def at(t: Long) =
      h.where(Scd2.asOf(h, lit(t))).select("v").collect().map(_.getString(0))
    assert(at(5).isEmpty)          // before first version
    assert(at(10).toSeq === Seq("A"))
    assert(at(29).toSeq === Seq("A"))
    assert(at(30).toSeq === Seq("B")) // boundary: [from, to)
    assert(at(99).toSeq === Seq("B"))
  }

  test("plan is lint-clean: all windows partition by the key") {
    val h = hist(log(("u1", "A", 1, 10), ("u2", "B", 2, 20)))
    assert(PlanLint.clean(h))
  }
}
