package graft.ext

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("b")), (2L, Some("a")), (3L, Some("a")),
    (4L, Some("c")), (5L, None), (6L, Some("b"))
  ).toDF("id", "tag")

  test("profile reports nulls, cardinality, range, and modal value") {
    val r = Profile.profile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(r("id") == (("id", 6L, 0L, 6L, "1", "6", "1", 1L)))
    // top tie between a (2) and b (2) -> lexicographically smaller
    assert(r("tag") == (("tag", 6L, 1L, 3L, "a", "c", "a", 2L)))
  }

  test("min/max compare as strings (documented string-profile contract)") {
    val d = Seq(2L, 10L).toDF("v")
    val r = Profile.profile(d, Seq("v"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .head()
    assert(r._5 == "10" && r._6 == "2") // "10" < "2" lexicographically
  }

  test("schemaDiff flags added/removed/retyped columns, ignores order") {
    val a = Seq((1L, "x", 1.5)).toDF("id", "name", "score")
    val b = Seq(("y", 2L, 3, true)).toDF("name", "id", "score", "flag")
    val d = Profile.schemaDiff(a, b)
      .as[(String, String, Option[String], Option[String])]
      .collect().toSet
    assert(d == Set(
      ("flag", "added", None, Some("boolean")),
      ("score", "retyped", Some("double"), Some("int"))))
    // identical schema in different column order: no drift
    assert(Profile.schemaDiff(a, a.select("score", "id", "name"))
      .count() == 0)
    // removed column
    val r = Profile.schemaDiff(a, a.drop("name"))
      .as[(String, String, Option[String], Option[String])]
      .collect().toSet
    assert(r == Set(("name", "removed", Some("string"), None)))
  }
}
