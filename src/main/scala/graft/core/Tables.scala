package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver fixtures under /root/testdata (see TESTDATA.md).
  *
  * Every table is a single parquet file; Catalyst handles column pruning and
  * predicate pushdown, so callers should `.select`/`.filter` as early as
  * possible and let the scan do the work. At 100 TB these would be
  * partitioned parquet/Delta directories — nothing in the call-sites assumes
  * single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` has shipped in two vintages: TIMESTAMP(NANOS),
    * which Spark's parquet reader only surfaces as a nanos Long (legacy
    * conf), and native TIMESTAMP(MICROS), which surfaces as TIMESTAMP_NTZ.
    * Sniff the loaded type and normalize both to a session-tz
    * TimestampType (session tz is pinned to UTC by every entrypoint, so
    * the NTZ cast preserves wall-clock values). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      // `div` is exact integral division; `/` would go through double and
      // lose micros for epoch-nanos values beyond 2^53.
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
