package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark over the full oracle-checked query surface.
  *
  * Methodology (fixes the round-1 harness):
  *  - one untimed WARM-UP pass first, so JIT/codegen compilation cost is
  *    not attributed to whichever query happens to run first;
  *  - full materialization via queryExecution.toRdd.count() — NOT
  *    DataFrame.count(), which lets Catalyst prune projections and answer
  *    unfiltered parquet scans from footer metadata;
  *  - failures are recorded per-query and fail the run (nonzero exit),
  *    never silently timed as fast queries;
  *  - the JSON line goes to stdout AND to BENCH.json in the working
  *    directory so log-tail truncation cannot lose it.
  */
object Bench {
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

    def runOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // SPARK_GRAFT_QUERIES=a,b,c restricts the run to a subset — the
    // isolation knob for re-measuring one query without the other 100
    // competing for the same 32 cores (unknown names fail loudly).
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    subset.foreach(qs => qs.foreach(q =>
      require(SparkEntry.queries.contains(q), s"unknown bench query: $q")))
    val names = subset.getOrElse(SparkEntry.queries.keys.toSeq).sorted
    names.foreach(runOnce) // warm-up pass, untimed
    // two timed passes, min per query: a single pass is exposed to
    // one-off JIT/GC/host noise (round-2 log had a 12 s outlier on a
    // 0.4 s regex query).
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    val results = names.map { n =>
      val ((t1, ok1), (t2, ok2)) = (pass1(n), pass2(n))
      n -> (math.min(t1, t2), ok1 && ok2)
    }
    val failed = results.collect { case (n, (_, false)) => n }
    val qs = results.map { case (n, (sec, _)) => s"\"$n\":$sec" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("BENCH.json"), json + "\n")
    spark.stop()
    // The log-tail consumer keeps only the last ~2000 characters; the
    // full per-query line above is longer than that, so its head (with
    // the "metric" key) falls outside the window. Emit a compact,
    // self-contained summary as the LAST line so whatever survives the
    // tail is parseable; per-query detail stays in BENCH.json and the
    // full line above.
    val compact = s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir","detail":"BENCH.json"}"""
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
