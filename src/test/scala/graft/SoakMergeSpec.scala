package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SOAK.json ledger accumulates at-scale rows across subset runs;
  * the round-11 end-of-round snapshot clobbered 284 rows down to 1
  * because the writer overwrote the file with the in-memory subset.
  * These tests pin the read-merge-write contract: a subset run may
  * update its own rows but can never shrink the ledger. */
class SoakMergeSpec extends AnyFunSuite {

  private val prior =
    """{"metric":"soak","replicas":10,"base":"/root/testdata/sf0.1","queries":{""" +
      """"q_x_hll":{"base_sec":0.5,"soak_sec":1.0,"ratio":2.0,"exponent":0.301},""" +
      """"q_x_lpa":{"base_sec":5.0,"soak_sec":30.0,"ratio":6.0,"exponent":0.778}}}"""

  test("a subset run preserves every prior row (never shrinks the ledger)") {
    val fresh = Map("q_x_new" ->
      """{"base_sec":1.0,"soak_sec":4.0,"ratio":4.0,"exponent":0.602}""")
    val merged = Soak.mergeRows(prior, fresh)
    assert(merged.keySet === Set("q_x_hll", "q_x_lpa", "q_x_new"))
    assert(merged("q_x_lpa").contains("\"exponent\":0.778"))
  }

  test("a re-measured query replaces its own row only") {
    val fresh = Map("q_x_hll" ->
      """{"base_sec":0.4,"soak_sec":0.9,"ratio":2.25,"exponent":0.352}""")
    val merged = Soak.mergeRows(prior, fresh)
    assert(merged.size === 2)
    assert(merged("q_x_hll").contains("0.352"))
    assert(merged("q_x_lpa").contains("0.778"))
  }

  test("an empty or missing prior file merges to exactly the fresh rows") {
    val fresh = Map("q_x_a" -> """{"base_sec":1.0}""")
    assert(Soak.mergeRows("", fresh) === fresh)
  }
}
