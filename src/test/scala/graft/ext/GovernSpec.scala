package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GovernSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: class sizes, sensitive distincts, both verdicts") {
    val df = Seq(
      ("NY", "A", 1), ("NY", "A", 1), ("NY", "A", 2), // class 1: n=3, l=2
      ("SF", "A", 5), // class 2: n=1, l=1
      ("NY", "B", 1), ("NY", "B", 2), ("NY", "B", 3) // class 3: n=3, l=3
    ).toDF("city", "seg", "sv")
    val out = Govern.kAnonymity(df, Seq("city", "seg"), "sv", k = 2, l = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSet
    assert(out === Set(
      ("NY", "A", 3L, 2L, true, false),
      ("SF", "A", 1L, 1L, false, false),
      ("NY", "B", 3L, 3L, true, true)))
  }

  test("kAnonymity: NULL sensitive values count as one distinct value") {
    val df = Seq(("NY", Some(1)), ("NY", None), ("NY", None))
      .toDF("city", "sv")
    val out = Govern.kAnonymity(df, Seq("city"), "sv", k = 2, l = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((3L, 2L)))
  }

  test("fdAudit: holds / violated with group and row counts") {
    val df = Seq((1, "x"), (1, "x"), (2, "y"), (2, "z"), (3, "w"))
      .toDF("l", "r")
    val ok = Govern.fdAudit(df.where(col("l") =!= 2), "holds",
      Seq("l"), "r").collect()(0)
    assert((ok.getLong(1), ok.getLong(2), ok.getLong(3)) === ((2L, 0L, 0L)))
    assert(ok.getDouble(4) === 0.0)
    val bad = Govern.fdAudit(df, "violated", Seq("l"), "r").collect()(0)
    // group 2 sees two rhs values over two rows
    assert((bad.getLong(1), bad.getLong(2), bad.getLong(3)) ===
      ((3L, 1L, 2L)))
    assert(bad.getDouble(4) === 1.0 / 3.0)
  }

  test("fdAudit: null lhs rows are excluded from the audit") {
    val df = Seq((Some(1), "x"), (None, "y"), (None, "z"))
      .toDF("l", "r")
    val out = Govern.fdAudit(df, "fd", Seq("l"), "r").collect()(0)
    assert((out.getLong(1), out.getLong(2)) === ((1L, 0L)))
  }

  test("dpNoisyCounts: deterministic per (seed, group); seed rotation " +
      "re-draws; noise is centered Laplace scale 1/eps") {
    val df = (1 to 100).map(i => ("g" + (i % 4)).toString).toDF("g")
    val rel1 = Govern.dpNoisyCounts(df, Seq("g"), 1.0, "s1")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rel1b = Govern.dpNoisyCounts(df, Seq("g"), 1.0, "s1")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rel1 === rel1b) // reproducible release
    assert(rel1.values.forall(_._1 === 25L))
    assert(rel1.values.forall(v => v._3 === v._1 + v._2 ||
      math.abs(v._3 - (v._1 + v._2)) < 1e-6))
    val rel2 = Govern.dpNoisyCounts(df, Seq("g"), 1.0, "s2")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a different seed re-draws (at least one group's noise moves)
    assert(rel1.exists { case (g, v) => rel2(g) != v._2 })
    // eps = 0.5 doubles the scale of every draw exactly
    val rel05 = Govern.dpNoisyCounts(df, Seq("g"), 0.5, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    rel1.foreach { case (g, v) =>
      assert(math.abs(rel05(g) - 2.0 * v._2) < 1e-6 * math.abs(v._2))
    }
  }

  test("riAudit: orphan keys and rows, nulls reported separately") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Govern.riAudit(child, "ri", "fk", parent, "pk")
      .collect()(0)
    assert(out.getLong(1) === 7L) // child rows
    assert(out.getLong(2) === 1L) // null fk rows
    assert(out.getLong(3) === 3L) // distinct non-null fks
    assert(out.getLong(4) === 1L) // orphan fks (9)
    assert(out.getLong(5) === 3L) // orphan rows
    assert(out.getDouble(6) === 3.0 / 7.0)
  }

  test("riAudit: a fully-linked child reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Govern.riAudit(child, "ri", "fk", parent, "pk")
      .collect()(0)
    assert(out.getLong(4) === 0L)
    assert(out.getLong(5) === 0L)
    assert(out.getDouble(6) === 0.0)
  }

  test("keyAudit: uniqueness ratio and duplicate-row count") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val out = Govern.keyAudit(df, "k", Seq("k")).collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ===
      ((6L, 3L, 3L)))
    assert(out.getDouble(4) === 0.5)
  }

  test("tCloseness: hand-computed ordered EMD per class") {
    // global: sv1 = 3, sv2 = 3 -> p = (0.5, 0.5); domain m = 2
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L)).toDF("g", "sv")
    val out = Govern.tCloseness(df, Seq("g"), "sv", t = 0.4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // A: q = (1, 0): |cum| at sv1 = 0.5, at sv2 = 0 -> EMD = 0.5
    assert(out("A") === ((2L, 0.5, false)))
    assert(out("B") === ((2L, 0.5, false)))
    // C matches the global distribution exactly
    assert(out("C") === ((2L, 0.0, true)))
  }

  test("tCloseness: single-point domain gives t = 0 everywhere") {
    val df = Seq(("A", 7L), ("B", 7L), ("B", 7L)).toDF("g", "sv")
    val out = Govern.tCloseness(df, Seq("g"), "sv", t = 0.1)
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(out.forall(_ === ((0.0, true))))
  }

  test("tCloseness: null sensitive rows are excluded") {
    val df = Seq(("A", Some(1L)), ("A", Some(2L)), ("A", None),
      ("B", Some(1L)), ("B", Some(2L))).toDF("g", "sv")
    val out = Govern.tCloseness(df, Seq("g"), "sv", t = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // A counts 2 non-null rows, and both classes match global exactly
    assert(out === Map("A" -> 2L, "B" -> 2L))
  }
}
