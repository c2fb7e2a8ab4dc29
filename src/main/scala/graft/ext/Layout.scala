package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Physical data-layout utilities for the lake tables.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the scan
  * cost is set by layout decided at WRITE time:
  *  - many small files -> per-file open/footer overhead and starved
  *    vectorized readers (the classic streaming-ingest pathology);
  *  - rows unsorted on the hot predicate column -> every parquet row
  *    group straddles the full value range, so min/max stats prune
  *    nothing and a narrow time-range query reads the whole table.
  *
  * `compact` bin-packs small files to a target size; `sortedWrite`
  * range-partitions and sorts on the hot column so row-group stats
  * become selective (the poor man's clustering key — same idea as
  * Delta/Iceberg OPTIMIZE ... ZORDER with one dimension).
  */
object Layout {

  /** Parquet data files under a local table path (ignores _SUCCESS etc). */
  def dataFiles(path: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(path)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  /** Rewrite a parquet table into ceil(totalBytes/targetBytes) files.
    * Two full passes over the data (read + write) but only of THIS
    * table; on a partitioned lake you compact per partition, so the
    * unit of rewrite stays bounded no matter how big the table grows.
    * The rewrite goes through a staging dir and a directory swap, so a
    * reader never sees a half-written table. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val files = dataFiles(path)
    if (files.isEmpty) return
    val total = files.map(Files.size).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staging = path + ".compact-staging"
    spark.read.parquet(path)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val old = path + ".compact-old"
    Files.move(Paths.get(path), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staging), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
  }

  /** Range-partition on `sortCol` and sort rows within each partition
    * before writing: each output file (and each row group inside it)
    * covers a narrow, nearly disjoint slice of the sort-column domain,
    * so parquet min/max stats prune row groups for range predicates.
    * `partitions` sizes the files (pick totalBytes/targetBytes). */
  def sortedWrite(df: DataFrame, path: String, sortCol: String,
                  partitions: Int,
                  extraSortCols: Seq[String] = Nil): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions((sortCol +: extraSortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
