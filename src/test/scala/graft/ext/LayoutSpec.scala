package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** numOutputRows of the parquet scan node = rows the reader surfaced
    * AFTER row-group/page skipping on min/max stats (the exact filter
    * runs later in FilterExec) — i.e. a direct measure of pruning. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    scan.metrics("numOutputRows").value
  }

  test("compact bin-packs small files, preserving data") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val path = s"$dir/t"
    (1L to 10000L).toDF("k").repartition(50)
      .write.parquet(path)
    assert(Layout.dataFiles(spark, path).size == 50)
    Layout.compact(spark, path, targetBytes = 64L * 1024 * 1024)
    assert(Layout.dataFiles(spark, path).size <= 2)
    val back = spark.read.parquet(path).as[Long].collect().sorted
    assert(back.toSeq == (1L to 10000L))
  }

  test("compactPartitions rewrites fragmented buckets in place, " +
      "preserving partition values and data") {
    val dir = java.nio.file.Files.createTempDirectory("cpart").toString
    val path = s"$dir/t"
    // a stream of small appends fragments each partition (the
    // streaming-ingest pathology compaction exists for)
    (1 to 6).foreach { b =>
      Seq((b.toLong, b * 1.0, b % 2)).toDF("k", "v", "p")
        .write.mode("append").partitionBy("p").parquet(path)
    }
    val before = spark.read.parquet(path)
      .as[(Long, Double, Int)].collect().toSet
    assert(Layout.dataFiles(spark, path).size >= 6)
    Layout.compactPartitions(spark, path, minFiles = 1)
    // one file per partition now; rows and partition values intact
    assert(Layout.dataFiles(spark, path).size <= 2)
    val after = spark.read.parquet(path)
      .as[(Long, Double, Int)].collect().toSet
    assert(after == before)
  }

  test("recoverSwap restores a table stranded by a crash between the " +
      "two swap renames") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString
    val path = s"$dir/t"
    (1L to 100L).toDF("k").write.parquet(path)
    // simulate the crash window: table staged out, new one never moved in
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$dir/.t.swap-old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
    assert(Layout.recoverSwap(spark, path))
    assert(spark.read.parquet(path).count() == 100)
    // compact also self-recovers before reading
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$dir/.t.swap-old")))
    Layout.compact(spark, path)
    assert(spark.read.parquet(path).count() == 100)
  }

  test("compactPartitions recurses to LEAF partitions on a multi-level " +
      "layout — nested partition columns survive") {
    val dir = java.nio.file.Files.createTempDirectory("cp2").toString
    val path = s"$dir/t"
    (1 to 6).foreach { b =>
      Seq((b.toLong, b % 2, b % 3)).toDF("k", "p", "q")
        .write.mode("append").partitionBy("p", "q").parquet(path)
    }
    val before = spark.read.parquet(path)
      .as[(Long, Int, Int)].collect().toSet
    Layout.compactPartitions(spark, path, minFiles = 1)
    val after = spark.read.parquet(path)
      .as[(Long, Int, Int)].collect().toSet
    assert(after == before) // p and q still partition columns, data intact
    // every leaf is a single file now
    assert(Layout.dataFiles(spark, path).size <=
      before.map(t => (t._2, t._3)).size)
  }

  test("zorderValue interleaves bits (a even positions, b odd) and " +
      "masks to the bit budget") {
    val df = Seq((3L, 5L)).toDF("a", "b")
    // a=11b, b=101b: z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 39
    val z = df.select(Layout.zorderValue(col("a"), col("b"), 8))
      .as[Long].head()
    assert(z == 39L)
    // values beyond the budget wrap via masking: 7 & 3 == 3
    val z2 = df.select(Layout.zorderValue(col("a") + 4, col("b"), 2))
      .as[Long].head()
    assert(z2 == df.select(Layout.zorderValue(col("a"), col("b"), 2))
      .as[Long].head())
    // N-column form: bit i of column j lands at position i*k + j
    // a=10b, b=1b, c=1b: b0 of b -> pos 1, b0 of c -> pos 2, b1 of a -> pos 3
    val z3 = Seq((2L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 4))
      .as[Long].head()
    assert(z3 == 14L)
    intercept[IllegalArgumentException] {
      Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
  }

  test("zorderedWrite prunes scans on BOTH dimensions where a " +
      "single-column sort serves only its own") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    spark.conf.set("spark.sql.parquet.blockSize", (64 * 1024).toString)
    // 256x256 grid, scrambled input order
    val n = 256
    val df = spark.range(n.toLong * n)
      .select((col("id") * 2654435761L % (n.toLong * n)).as("i"))
      .select((col("i") % n).as("x"), (col("i") / n).as("y"))
    val predY = col("y") >= 0 && col("y") < 8 // thin slice on y

    // 32 z-range files ~= 32 spatial tiles; a thin slice on either
    // dimension intersects only the tiles straddling it
    Layout.sortedWrite(df, s"$dir/byx", "x", partitions = 4)
    Layout.zorderedWrite(df, s"$dir/z", Seq("x", "y"), partitions = 32,
      bits = 8)

    // same rows either way, helper column dropped
    assert(spark.read.parquet(s"$dir/z").columns.toSeq == Seq("x", "y"))
    assert(spark.read.parquet(s"$dir/z").filter(predY).count() ==
      spark.read.parquet(s"$dir/byx").filter(predY).count())

    val xSortedRead = scanRows(spark.read.parquet(s"$dir/byx").filter(predY))
    val zRead = scanRows(spark.read.parquet(s"$dir/z").filter(predY))
    assert(xSortedRead == n.toLong * n) // sorted on x: y stats prune nothing
    assert(zRead <= n.toLong * n / 3,
      s"z-ordered scan surfaced $zRead rows; expected spatial pruning")
    // and the x dimension still prunes too (coarser: with 2048-row
    // tiles the even-bit dimension spans 64-wide x 32-tall rectangles,
    // so an x slice crosses 2x more tiles than a y slice)
    val zReadX = scanRows(spark.read.parquet(s"$dir/z")
      .filter(col("x") >= 0 && col("x") < 8))
    assert(zReadX <= n.toLong * n * 2 / 5,
      s"z-ordered x-scan surfaced $zReadX rows; expected spatial pruning")
  }

  test("sortedWrite makes row-group stats selective for range predicates") {
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString
    // small row groups so one file holds many prunable groups
    spark.conf.set("spark.sql.parquet.blockSize", (64 * 1024).toString)
    val n = 200000L
    val df = spark.range(n)
      .select((col("id") * 2654435761L % n).as("v")) // scrambled order
    val pred = col("v") >= 1000 && col("v") < 2000

    df.write.mode("overwrite").parquet(s"$dir/unsorted")
    Layout.sortedWrite(df, s"$dir/sorted", "v", partitions = 4)

    val unsortedRead = scanRows(spark.read.parquet(s"$dir/unsorted").filter(pred))
    val sortedRead = scanRows(spark.read.parquet(s"$dir/sorted").filter(pred))
    // same answer either way...
    assert(spark.read.parquet(s"$dir/sorted").filter(pred).count() ==
      spark.read.parquet(s"$dir/unsorted").filter(pred).count())
    // ...but the sorted layout reads a small fraction of the rows
    assert(unsortedRead == n) // scrambled: stats prune nothing
    assert(sortedRead <= n / 10,
      s"sorted scan surfaced $sortedRead rows; expected heavy pruning")
  }

  test("shardedWrite: one ordered file per shard, training order " +
      "preserved on read-back") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val path = s"$dir/corpus"
    val docs = (1L to 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val laid = Sampling.epochShuffle(docs, "doc_id", "sw", 250L, 16)
      .join(docs, Seq("doc_id"))
    Layout.shardedWrite(laid, path)
    // 1000 rows / 250 per shard -> 4 shard dirs, one data file each
    val files = Layout.dataFiles(spark, path)
    assert(files.size == 4)
    assert(files.map(_.getParent.getName).toSet ==
      Set("shard=0", "shard=1", "shard=2", "shard=3"))
    // each shard file streams in exact training order without sorting
    val expected = laid.select("doc_id", "pos", "shard_pos")
      .as[(Long, Long, Long)].collect()
      .groupBy(t => t._2 / 250).map { case (s, ts) =>
        s -> ts.sortBy(_._3).map(_._1).toSeq
      }
    for (f <- files) {
      val shardId = f.getParent.getName.stripPrefix("shard=").toLong
      val inFile = spark.read.parquet(f.toString)
        .select("doc_id").as[Long].collect().toSeq
      assert(inFile == expected(shardId),
        s"shard $shardId not in training order")
      assert(inFile.size == 250)
    }
  }

  test("manifest prunedRead skips non-overlapping files and equals the " +
      "naive full filter") {
    val dir = java.nio.file.Files.createTempDirectory("manif").toString
    val n = 10000L
    val df = spark.range(n).select(col("id"),
      (col("id") * 2654435761L % n).as("v"))
    Layout.sortedWrite(df, s"$dir/t", "v", partitions = 8)
    Layout.writeManifest(spark, s"$dir/t", Seq("v"))
    val man = spark.read.parquet(Layout.manifestPath(s"$dir/t"))
    assert(man.count() == Layout.dataFiles(spark, s"$dir/t").size)
    assert(man.agg(sum("n_rows")).head().getLong(0) == n)
    // a narrow range overlaps few of the 8 range-partitioned files
    val pruned = Layout.prunedFiles(spark, s"$dir/t", "v", 100L, 600L)
    assert(pruned.nonEmpty && pruned.size <= 2,
      s"expected <=2 overlapping files, got ${pruned.size}")
    val got = Layout.prunedRead(spark, s"$dir/t", "v", 100L, 600L)
      .select("id").as[Long].collect().toSet
    val want = df.where(col("v") >= 100 && col("v") <= 600)
      .select("id").as[Long].collect().toSet
    assert(got === want)
    // empty range: no files, empty frame, correct schema
    val none = Layout.prunedRead(spark, s"$dir/t", "v", -50L, -10L)
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("id", "v"))
  }

  test("a stale manifest fails loudly instead of silently hiding rows") {
    val dir = java.nio.file.Files.createTempDirectory("manifstale").toString
    spark.range(100).select(col("id"), col("id").as("v"))
      .coalesce(1).write.parquet(s"$dir/t")
    Layout.writeManifest(spark, s"$dir/t", Seq("v"))
    // append new data behind the manifest's back
    spark.range(100, 200).select(col("id"), col("id").as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/t")
    intercept[IllegalStateException] {
      Layout.prunedFiles(spark, s"$dir/t", "v", 0L, 10L)
    }
    // rebuild heals it
    Layout.writeManifest(spark, s"$dir/t", Seq("v"))
    assert(Layout.prunedRead(spark, s"$dir/t", "v", 150L, 160L)
      .count() == 11)
  }

  test("census check scales: 10^4-entry manifest compares as a join, " +
      "and a single drifted entry still fails loudly") {
    // synthetic (file_name, size) census — the VERDICT r9 #6 regime
    // where collect-both-sides set compare would haul 10^4 rows to the
    // driver per query; censusCheck ships back only two counts
    val n = 10000
    def census(tamper: Boolean) = {
      val base = spark.range(n)
        .select(concat(lit("part-"), col("id"), lit(".parquet"))
            .as("file_name"),
          (col("id") * 131 % 99991 + 1).as("size"))
      if (tamper)
        base.withColumn("size",
          when(col("file_name") === "part-7777.parquet",
            col("size") + 1).otherwise(col("size")))
      else base
    }
    // identical censuses pass (no exception)
    Layout.censusCheck(census(tamper = false), census(tamper = false),
      "synthetic")
    // one appended file → "new" count
    val appended = census(tamper = false).unionAll(
      Seq(("part-extra.parquet", 42L)).toDF("file_name", "size"))
    val e1 = intercept[IllegalStateException] {
      Layout.censusCheck(census(tamper = false), appended, "synthetic")
    }
    assert(e1.getMessage.contains("1 new, 0 vanished"))
    // one size drift → both a "new" and a "vanished" entry
    val e2 = intercept[IllegalStateException] {
      Layout.censusCheck(census(tamper = false), census(tamper = true),
        "synthetic")
    }
    assert(e2.getMessage.contains("1 new, 1 vanished"))
  }

  /** Classic reference xy→d (Wikipedia "Hilbert curve", converted from
    * the C d2xy/xy2d pair) — the independent twin the fold must match. */
  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertValue: bijective on the full 8x8 grid, consecutive " +
      "cells are grid-adjacent, and the fold matches the reference") {
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = cells.map { case (x, y) => (x, y) }.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 3).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) === refHilbert(x, y, 3), s"($x,$y)")
    }
    assert(got.values.toSeq.sorted === (0L until 64L)) // bijection
    val byD = got.map(_.swap)
    (0L until 63L).foreach { d => // the curve never jumps
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"d=$d")
    }
    // wide-bits parity on scattered points, incl. masking wrap
    val pts = Seq((0L, 0L), (65535L, 65535L), (12345L, 54321L),
      (99999L, 3L), (1L << 20, 7L))
    val wide = pts.toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 16).as("d"))
      .collect().map(_.getLong(0))
    pts.zip(wide).foreach { case ((x, y), d) =>
      assert(d === refHilbert(x & 65535, y & 65535, 16), s"($x,$y)")
    }
  }

  test("skippingStats: clustered layout skips chunks a shuffled " +
      "layout cannot; counts are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // 4096 rows; v = row id. Clustered layout = v itself (each of 64
    // chunks holds one v-range); shuffled layout = v * 2654435761 mod
    // 2^16 (chunk min/max spans ~everything)
    val df = (0 until 4096).map(_.toLong).toDF("v")
    val out = Layout.skippingStats(df,
      Seq("clustered" -> col("v"),
        "shuffled" -> pmod(col("v") * 2654435761L, lit(65536L))),
      Seq(("v_0_63", "v", 0L, 63L)), chunks = 64)
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("scan_rows"), r.getAs[Double]("skip_frac")))
      .toMap
    // clustered: probe v in [0,63] hits exactly chunk 0 (64 rows)
    assert(out("clustered") == ((64L, 1L, 64L, Q9(1.0 - 1.0 / 64))))
    // shuffled: nearly every chunk straddles the probe range
    assert(out("shuffled")._2 > 32L,
      s"shuffled layout should hit most chunks: ${out("shuffled")}")
    // total_rows conserved on every row
    Layout.skippingStats(df,
      Seq("clustered" -> col("v")),
      Seq(("all", "v", 0L, 5000L)), chunks = 64).collect()
      .foreach { r =>
        assert(r.getAs[Long]("total_rows") == 4096L)
        assert(r.getAs[Long]("n_hit") == 64L &&
          r.getAs[Double]("scan_frac") == 1.0)
      }
  }

  private def Q9(x: Double): Double = graft.functions.GraftMath.sig9(x)
}
