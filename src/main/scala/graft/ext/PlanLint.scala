package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
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
  *  - `exact-percentile`: Spark's exact Percentile aggregate — its
  *    buffer is an O(distinct values) OpenHashMap merged on ONE final
  *    reducer; on continuous scores distinct ~ rows, i.e. a hidden
  *    corpus-sized single-node buffer (the shape Curriculum's
  *    histogram-refine boundaries exist to avoid). Acceptable only
  *    over provably bounded value domains;
  *  - `window-after-explode`: a partitioned WindowExec with a
  *    GenerateExec below it and no aggregation barrier between — the
  *    window key's cardinality rides the exploded frame, and AQE
  *    splits skewed JOINS, not windows, so one hot key (a boilerplate
  *    n-gram) is one hot reducer. Prefer groupBy + equi-join back
  *    (the novelty shape);
  *  - `deep-plan`: the physical tree's spine depth exceeds `maxDepth`
  *    — the signature of an UN-CUT iterative fold (a per-round
  *    join/merge loop whose lineage was never truncated): each extra
  *    round deepens the plan, blows up planning/codegen time and, for
  *    RDD lineage, risks stack overflow on task serialization. Cut the
  *    loop-carried frame per round ([[Checkpoints.cut]]) — the cut
  *    version of the same loop lints clean;
  *  - `oversized-broadcast`: a broadcast exchange whose build side is
  *    estimated (or measured, post-execution) above
  *    `spark.sql.autoBroadcastJoinThreshold` — an explicit
  *    `broadcast()` hint bypasses the planner's own size check, so a
  *    "small dim table" that grew ships a multi-GB blob to every
  *    executor; confirm the side is bounded or drop the hint;
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

  /** A GenerateExec (explode) below `p` with no aggregation barrier in
    * between — an aggregate collapses the exploded cardinality, so a
    * window above one is keyed on bounded data again. */
  private def generateBelow(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => false
    case _: GenerateExec => true
    case a: AdaptiveSparkPlanExec => generateBelow(a.executedPlan)
    case q: QueryStageExec => generateBelow(q.plan)
    case other => other.children.exists(generateBelow)
  }

  /** Spine depth of the physical tree (through the adaptive root and
    * into materialized stages; subquery trees are separate spines and
    * lint on their own nodes). */
  private def depth(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => depth(a.executedPlan)
    case q: QueryStageExec => 1 + depth(q.plan)
    case _ if p.children.isEmpty => 1
    case _ => 1 + p.children.map(depth).max
  }

  def findings(df: DataFrame, maxDepth: Int = 64): Seq[Finding] = {
    val nodes = walk(df.queryExecution.executedPlan)
    val fs = Seq.newBuilder[Finding]
    val threshold = {
      val conf = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      if (conf > 0) BigInt(conf) else BigInt(10L * 1024 * 1024)
    }
    val spine = depth(df.queryExecution.executedPlan)
    if (spine > maxDepth)
      fs += Finding("deep-plan", "warn", "plan",
        s"physical plan spine is $spine nodes deep (> $maxDepth): the " +
          "shape of an un-cut iterative fold - cut the loop-carried " +
          "frame per round (Checkpoints.cut) so planning cost and " +
          "lineage stay bounded")
    nodes.foreach {
      case b: BroadcastExchangeExec =>
        val runtime = b.metrics.get("dataSize").map(_.value).filter(_ > 0)
        val est = runtime.map(BigInt(_))
          .orElse(b.child.logicalLink.map(_.stats.sizeInBytes))
        est.filter(_ > threshold).foreach { sz =>
          fs += Finding("oversized-broadcast", "warn", b.nodeName,
            s"broadcast build side ~$sz bytes exceeds the " +
              s"$threshold-byte autoBroadcastJoinThreshold: an explicit " +
              "broadcast() hint bypasses the planner's size check - " +
              "confirm the side is bounded or drop the hint")
        }
      case _ => ()
    }
    nodes.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        fs += Finding("global-window", "error", w.nodeName,
          "window with empty PARTITION BY moves ALL rows to one " +
            "reducer; acceptable only over post-aggregate O(groups) " +
            "inputs - confirm the input is aggregated, or partition it")
      case w: WindowExec if generateBelow(w.child) =>
        fs += Finding("window-after-explode", "warn", w.nodeName,
          "window keyed on an exploded frame: partition cardinality " +
            "rides the explode, and AQE skew-splits joins, not " +
            "windows - one hot key is one hot reducer. Prefer " +
            "groupBy + equi-join back, or confirm the generator " +
            "output is bounded per key")
      // flag the merging side only (Final/Complete) so a two-phase
      // aggregate yields one finding, not one per phase
      case a: BaseAggregateExec if a.aggregateExpressions.exists(e =>
          e.aggregateFunction.isInstanceOf[Percentile] &&
            (e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final ||
              e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Complete)) =>
        fs += Finding("exact-percentile", "warn", a.nodeName,
          "exact Percentile buffers O(distinct values) in one " +
            "OpenHashMap merged on a single reducer; on continuous " +
            "inputs that is a corpus-sized buffer. Use " +
            "Curriculum.exactBoundaries (histogram-refine) or " +
            "approx_percentile, or confirm the value domain is bounded")
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
  def lint(df: DataFrame, maxDepth: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    findings(df, maxDepth).toDF()
  }

  /** True when the plan carries no error-severity findings. */
  def clean(df: DataFrame, maxDepth: Int = 64): Boolean =
    findings(df, maxDepth).forall(_.severity != "error")
}
