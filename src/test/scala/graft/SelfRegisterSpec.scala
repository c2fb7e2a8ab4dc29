package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The query surface must work on a session built WITHOUT
  * spark.sql.extensions=graft.GraftExtensions — SparkEntry guards every
  * entry point with GraftExtensions.ensureRegistered. */
class SelfRegisterSpec extends SparkSpec {

  test("queries self-register the native functions on a bare session") {
    val s2 = spark.newSession()
    val reg = s2.sessionState.functionRegistry
    Seq("sig9_round", "dot_product", "sorted_intersect_count",
      "sorted_jaccard").foreach { n =>
      reg.dropFunction(FunctionIdentifier(n))
      assert(!reg.functionExists(FunctionIdentifier(n)))
    }
    // q_g1 routes through Q.dsum -> sig9_round; unresolvable without
    // the ensureRegistered guard
    val df = SparkEntry.queries("q_g1_groupby_agg")(s2,
      "/root/testdata/sf0.001")
    assert(df.count() > 0)
    assert(reg.functionExists(FunctionIdentifier("sig9_round")))
  }
}
