package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark over the full oracle-checked query surface.
  *
  * Methodology (evolved over rounds 1–9):
  *  - one untimed WARM-UP pass first, so JIT/codegen compilation cost is
  *    not attributed to whichever query happens to run first;
  *  - full materialization via queryExecution.toRdd.count() — NOT
  *    DataFrame.count(), which lets Catalyst prune projections and answer
  *    unfiltered parquet scans from footer metadata;
  *  - TWO timed passes with per-pass times recorded (round-8 verdict #4:
  *    r8-vs-r7 comparison burned on ~15-20% unattributable host drift;
  *    per-pass detail makes regression calls mechanical);
  *  - per-query JVM GC-time delta recorded (round-8 verdict #3: q_g1 ran
  *    36 s in-bench vs 1.8 s isolated — if that reproduces, gcMs says
  *    whether it's heap pressure or something else);
  *  - queries whose min(p1,p2) exceeds ISO_TRIGGER_SEC get a third
  *    "quiet" run after System.gc() + settle pause — a same-JVM isolation
  *    proxy that doesn't need a second process. The headline per-query
  *    number is min over all runs (best observed steady-state), with all
  *    components in BENCH.json for audit;
  *  - failures are recorded per-query and fail the run (nonzero exit),
  *    never silently timed as fast queries;
  *  - the JSON line goes to stdout AND to BENCH.json in the working
  *    directory so log-tail truncation cannot lose it.
  */
object Bench {
  private val IsoTriggerSec = 3.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Codegen compile failures normally fall back to interpreted
      // execution — correct but several times slower, and invisible in a
      // timing-only harness. The bench is the perf gate, so make them
      // loud failures instead.
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fixture-vintage gate (same as Verify): fail loudly in one place
    // on fixture schema drift instead of timing 150 broken queries
    graft.core.Tables.preflight(spark, sfDir)

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum

    /** (wallSec, gcDeltaMs, ok) */
    def runOnce(name: String): (Double, Long, Boolean) = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, gcMillis() - g0, ok)
    }

    // SPARK_GRAFT_QUERIES=a,b,c restricts the run to a subset — the
    // isolation knob for re-measuring one query without the other 100
    // sharing the same JVM (unknown names fail loudly).
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    subset.foreach(qs => qs.foreach(q =>
      require(SparkEntry.queries.contains(q), s"unknown bench query: $q")))
    val names = subset.getOrElse(SparkEntry.queries.keys.toSeq).sorted
    names.foreach(runOnce) // warm-up pass, untimed
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    // Quiet re-run for slow queries: full GC + settle, then one more
    // timed run. If the quiet time collapses (like q_g1's r8 36 s → 1.8 s
    // isolated), the slowness was JVM state, not the plan.
    val iso: Map[String, (Double, Long, Boolean)] = names.flatMap { n =>
      val m = math.min(pass1(n)._1, pass2(n)._1)
      if (m > IsoTriggerSec && pass1(n)._3 && pass2(n)._3) {
        System.gc(); Thread.sleep(300)
        Some(n -> runOnce(n))
      } else None
    }.toMap
    val results = names.map { n =>
      val (t1, _, ok1) = pass1(n)
      val (t2, _, ok2) = pass2(n)
      val best = math.min(math.min(t1, t2), iso.get(n).map(_._1).getOrElse(Double.MaxValue))
      n -> (best, ok1 && ok2 && iso.get(n).forall(_._3))
    }
    val failed = results.collect { case (n, (_, false)) => n }
    def f(d: Double): String = (math.rint(d * 10000) / 10000).toString
    val qs = results.map { case (n, (sec, _)) => s"\"$n\":${f(sec)}" }
      .mkString("{", ",", "}")
    val detail = names.map { n =>
      val isoPart = iso.get(n).map { case (t, g, _) => s""","iso":${f(t)},"isoGcMs":$g""" }.getOrElse("")
      s""""$n":{"p1":${f(pass1(n)._1)},"p2":${f(pass2(n)._1)},"gcMs1":${pass1(n)._2},"gcMs2":${pass2(n)._2}$isoPart}"""
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"passes":$detail,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("BENCH.json"), json + "\n")
    spark.stop()
    // The log-tail consumer keeps only the last ~2000 characters; the
    // full per-query line above is longer than that, so its head (with
    // the "metric" key) falls outside the window. Emit a compact,
    // self-contained summary as the LAST line so whatever survives the
    // tail is parseable; per-query detail stays in BENCH.json and the
    // full line above.
    val compact = s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir","detail":"BENCH.json"}"""
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
