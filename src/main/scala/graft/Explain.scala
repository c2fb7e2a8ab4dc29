package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dumps `explain("formatted")` for each query named on
  * the command line (or a representative default set) at the given SF
  * dir. Used to keep PLANS.md honest — the audited facts there (pushed
  * filters, pruned schemas, broadcast vs shuffle joins, codegen spans)
  * come from this output. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_g1_groupby_agg", "q_j5_revenue_rollup", "q_j2_left_null_pad",
      "q_m11m12_park_adjusted", "q_rec_wide_hitter",
      "q_x_dedup_minhash", "q_x_ann_brute", "q_s_event_window")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
