package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.kbo.Schemas

/** The ingestion boundary (SURVEY.md §2.A A1–A11).
  *
  * The reference's Playwright scrapers stay OUTSIDE the engine (they are
  * browser I/O, not data processing); the engine-side contract is: raw
  * scraped rows land as files (json/csv) or positional tuples, and every
  * reader applies the declared catalog schema — no inference, exactly like
  * the reference's hand-written column registry
  * (dags/utils/table_columns.py:1-64).
  *
  * Scale notes: schema-applied readers keep the scan vectorized and let
  * Catalyst push filters/pruning into it; `partitionedRange` reproduces
  * the reference's 5-way player-id fan-out (dags/010_scrape_hitters_stats
  * .py:255-269) as source partitioning, which is how a fetch-per-id source
  * parallelizes on a cluster.
  */
object Ingest {

  /** Schema-applied parquet read of a catalog table (A11 lake mode). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(Schemas.all(name)).parquet(s"$dir/$name.parquet")

  /** A11 JDBC mode — the reference's `pd.read_sql("SELECT * FROM t")`
    * (dags/001_park_factor_calculation.py:40). `partitionOn` + bounds
    * turn the single-cursor read into a partition-parallel one; without
    * it Spark reads through one connection (fine for dimension tables,
    * never for facts). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: java.util.Properties = new java.util.Properties(),
                partitionOn: Option[(String, Long, Long, Int)] = None)
      : DataFrame =
    partitionOn match {
      case Some((column, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, column, lower, upper, numParts, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** Schema-applied JSON-lines read for raw scraper output (A1–A10). */
  def rawJson(spark: SparkSession, path: String, name: String): DataFrame =
    spark.read.schema(Schemas.all(name)).json(path)

  /** Schema-applied CSV read (header optional, no inference). */
  def rawCsv(spark: SparkSession, path: String, name: String,
             header: Boolean = true): DataFrame =
    spark.read.schema(Schemas.all(name))
      .option("header", header.toString).csv(path)

  /** F14 — positional tuple -> named-row binding: the reference zips value
    * tuples against its column registry (dags/000_scrape_games_result
    * .py:46-48); here a Seq of positional value sequences binds to the
    * declared StructType. */
  def bindTuples(spark: SparkSession, rows: Seq[Seq[Any]],
                 schema: StructType): DataFrame = {
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(r => jrows.add(Row.fromSeq(r)))
    spark.createDataFrame(jrows, schema)
  }

  /** S6 — the reference's id-range scrape fan-out as source partitioning:
    * ids [start, end) across `parallelism` partitions; a fetch UDF or
    * mapPartitions over this frame parallelizes the way the reference's 5
    * Celery tasks did. */
  def partitionedRange(spark: SparkSession, start: Long, end: Long,
                       parallelism: Int): DataFrame = {
    import spark.implicits._
    spark.range(start, end, 1, parallelism).toDF("player_id")
  }

  /** A13 — plain append sink. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
