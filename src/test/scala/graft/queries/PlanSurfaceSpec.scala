package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Fleet-wide physical-plan guard: EVERY query on the oracle surface is
  * linted, and none may plan a CartesianProductExec — the one shape
  * that is never acceptable (the deliberate one-row/B-row scalar
  * attaches plan as BroadcastNestedLoopJoin, which the lint reports at
  * warn for human confirmation, and empty-partition windows over
  * post-aggregate O(groups) frames are audited per-query in PLANS.md).
  * A refactor that silently degrades an equi-join or band join into an
  * all-pairs product fails here before any bench or scale run sees it. */
class PlanSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no query on the surface plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val findings = graft.ext.PlanLint.findings(fn(spark, sf))
        findings.filter(_.check == "cartesian-product").map(f => name -> f)
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, f) => s"$n: ${f.detail}" }.mkString("\n"))
  }
}
