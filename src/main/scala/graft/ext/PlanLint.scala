package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter — the PLANS.md audit as a runnable operator. A
  * plan that passes correctness at sf0.01 can still be a 100 TB
  * scale-killer; these are the shapes this repo repeatedly hunts by
  * hand, mechanized so a job can be linted BEFORE it is submitted:
  *
  *  - `global-window`: a WindowExec with an empty PARTITION BY — the
  *    whole input sorts on one reducer (the ntile/global-rank trap;
  *    acceptable only over post-aggregate O(groups) frames, which is
  *    exactly what the finding asks the reader to confirm);
  *  - `cartesian-product`: a CartesianProductExec — an unbounded
  *    all-pairs join that made it past the optimizer;
  *  - `nested-loop-join`: a BroadcastNestedLoopJoinExec — legitimate
  *    for one-row scalar frames (the league-scalar pattern), fatal if
  *    the broadcast side is a real table; flagged for confirmation;
  *  - `shuffle-count`: informational total of exchanges in the plan.
  *
  * Findings are returned as a DataFrame so lint output composes with
  * the rest of the engine (filter by severity, union across jobs,
  * write to an audit table). Inspection walks the ADAPTIVE plan's
  * current physical tree when AQE is on. */
object PlanLint {

  case class Finding(check: String, severity: String, node: String,
                     detail: String)

  /** Full traversal: through the adaptive root (without re-yielding
    * it), INTO materialized AQE query stages (their subtree hangs off
    * `.plan`, not `children` — after an action the naive child walk
    * sees only stage leaves and would pass a cartesian product as
    * clean), and into expression subquery plans (a flagged shape inside
    * a scalar/IN subquery still runs at scale). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => q +: walk(q.plan)
    case _ =>
      (p +: p.children.flatMap(walk)) ++
        p.subqueries.flatMap(walk)
  }

  def findings(df: DataFrame): Seq[Finding] = {
    val nodes = walk(df.queryExecution.executedPlan)
    val fs = Seq.newBuilder[Finding]
    nodes.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        fs += Finding("global-window", "error", w.nodeName,
          "window with empty PARTITION BY moves ALL rows to one " +
            "reducer; acceptable only over post-aggregate O(groups) " +
            "inputs - confirm the input is aggregated, or partition it")
      case c: CartesianProductExec =>
        fs += Finding("cartesian-product", "error", c.nodeName,
          "unbounded all-pairs join; add an equi-join key, bucket/band " +
            "the candidates, or broadcast a provably tiny side")
      case j: BroadcastNestedLoopJoinExec =>
        fs += Finding("nested-loop-join", "warn", j.nodeName,
          "legitimate only when the broadcast side is a one-row/scalar " +
            "frame (league-scalar pattern); fatal on a real table - " +
            "confirm the build side cardinality")
      case _ => ()
    }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    fs += Finding("shuffle-count", "info", "ShuffleExchangeExec",
      s"$shuffles shuffle exchange(s) in the plan")
    fs.result()
  }

  /** Findings as a frame (check, severity, node, detail). */
  def lint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    findings(df).toDF()
  }

  /** True when the plan carries no error-severity findings. */
  def clean(df: DataFrame): Boolean =
    findings(df).forall(_.severity != "error")
}
