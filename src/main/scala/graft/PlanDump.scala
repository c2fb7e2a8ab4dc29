package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Plan/parallelism diagnostic: run ONE named [[SparkEntry]] query
  * against a data dir, print its formatted physical plan, then execute
  * it with a stage listener that reports per-stage task counts and
  * wall-clock — the fastest way to catch a stage whose task count
  * collapsed to 1 (the single-core shapes the sf1.0 soak hunts for,
  * invisible in `.explain` once AQE re-plans at runtime).
  *
  * Usage: PlanDump <queryName> [dataDir] (dir defaults to
  * SPARK_GRAFT_SF_DIR, then /root/testdata/sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [dataDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1e3).getOrElse(Double.NaN)
        println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
          f"${secs}%7.2fs  ${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    println(f"[plandump] $name rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
