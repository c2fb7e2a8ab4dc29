package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSourceV2 source for the reference's player-id probe scan
  * (`dags/010_scrape_hitters_stats.py:255-269`: five concurrent scraper
  * tasks over id ranges 50007..99811 — SURVEY §2 A7/S6). The engine-side
  * shape is a partition-parallel id generator: each slice is an
  * `InputPartition`, so a cluster fans the probe out exactly like the
  * reference's TaskGroup — but with as many slices as there are
  * executors, not a hardcoded 5.
  *
  * Usage:
  *   spark.read.format("graft.sources.ProbeRangeSource")
  *     .option("start", 50007).option("end", 99811)
  *     .option("slices", 32).load()
  *
  * Schema: (player_id BIGINT, slice INT). Range predicates on player_id
  * are pushed into partition planning (SupportsPushDownFilters): slices
  * whose id range falls entirely outside the predicate are never
  * created — the DSv2 equivalent of partition pruning, so a probe of a
  * narrow id band costs one task no matter how wide the configured
  * range is.
  */
class ProbeRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProbeRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ProbeRangeTable(new CaseInsensitiveStringMap(properties))
}

object ProbeRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("player_id", LongType, nullable = false),
    StructField("slice", IntegerType, nullable = false)))
}

private[sources] class ProbeRangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val start = options.getLong("start", 50007L)
  private val end = options.getLong("end", 99811L) // inclusive
  private val slices = options.getInt("slices", 5)

  override def name(): String = s"probe_range($start..$end)"
  override def schema(): StructType = ProbeRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ProbeScanBuilder(start, end, slices)
}

private[sources] class ProbeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters {
  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty

  /** Accept player_id range filters by tightening [lo, hi]; everything
    * else stays a post-scan filter (returned as residual). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("player_id", _: Long) => true
      case GreaterThanOrEqual("player_id", _: Long) => true
      case LessThan("player_id", _: Long) => true
      case LessThanOrEqual("player_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("player_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("player_id", v: Long) => lo = math.max(lo, v)
      case LessThan("player_id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("player_id", v: Long) => hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ProbeScan(start, end, slices, lo, hi)
}

private[sources] case class ProbeSlice(sliceId: Int, from: Long, to: Long)
    extends InputPartition

private[sources] class ProbeScan(start: Long, end: Long, slices: Int,
                                 lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = ProbeRangeSource.schema
  override def toBatch: Batch = this

  /** Slice the ORIGINAL range (stable slice ids under pushdown), then
    * drop/clip slices against the pushed [lo, hi]. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (lo > hi) return Array.empty
    val n = math.max(1, slices)
    val span = end - start + 1
    (0 until n).iterator.map { i =>
      val from = start + span * i / n
      val to = start + span * (i + 1) / n - 1
      ProbeSlice(i, math.max(from, lo), math.min(to, hi))
    }.filter(s => s.from <= s.to).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val s = p.asInstanceOf[ProbeSlice]
        new PartitionReader[InternalRow] {
          private var cur = s.from - 1
          override def next(): Boolean = { cur += 1; cur <= s.to }
          override def get(): InternalRow =
            InternalRow(cur, s.sliceId)
          override def close(): Unit = ()
        }
      }
    }
}
