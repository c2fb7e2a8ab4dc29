package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, args(0)).queryExecution.toRdd.count()
      println(f"$q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
