package graft.sources

import graft.SparkSpec
import graft.kbo.{Records, Schemas}
import graft.sinks.CsvSidecar
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("ingest").toFile.getAbsolutePath

  test("rawJson applies the declared schema, no inference (A1-A10)") {
    val dir = tmp()
    val line = """{"stadium":"Jamsil","park_factor":1.07}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/pf.json"), line + "\n")
    val df = Ingest.rawJson(spark, s"$dir/pf.json", "park_factor")
    assert(df.schema == Schemas.parkFactor)
    assert(df.as[(String, Double)].head() == (("Jamsil", 1.07)))
  }

  test("rawCsv applies the declared schema (A1-A10)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/pf.csv"),
      "stadium,park_factor\nGocheok,0.93\n")
    val df = Ingest.rawCsv(spark, s"$dir/pf.csv", "park_factor")
    assert(df.schema == Schemas.parkFactor)
    assert(df.as[(String, Double)].head() == (("Gocheok", 0.93)))
  }

  test("bindTuples: positional tuples -> named rows (F14)") {
    val df = Ingest.bindTuples(spark,
      Seq(Seq("Jamsil", 1.07), Seq("Gocheok", 0.93)), Schemas.parkFactor)
    assert(df.schema == Schemas.parkFactor)
    assert(df.count() == 2)
  }

  test("partitionedRange reproduces the id-range fan-out (S6)") {
    val df = Ingest.partitionedRange(spark, 50007L, 50107L, 5)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 100)
    assert(df.agg(min("player_id"), max("player_id"))
      .as[(Long, Long)].head() == ((50007L, 50106L)))
  }

  test("appendParquet appends, never overwrites (A13)") {
    val dir = tmp()
    val path = s"$dir/t"
    Ingest.appendParquet(Seq((1L, "a")).toDF("k", "v"), path)
    Ingest.appendParquet(Seq((2L, "b")).toDF("k", "v"), path)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("CsvSidecar writes the per-player/date partition layout (A14)") {
    val dir = tmp()
    val recent = Seq((10L, "2024-03-01", "T2", 3L), (11L, "2024-03-01", "T1", 1L))
      .toDF("hitter_id", "game_date", "opponent_team", "hits")
    CsvSidecar.write(recent, "hitter_id", s"$dir/csv")
    val parts = new java.io.File(s"$dir/csv").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("game_date=2024-03-01"))
    val back = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(back.count() == 2)
  }

  test("wideRecord recentK=10 keeps ten games (W2)") {
    val lineup = Seq(("Kim", "T1", "T2", "A", 3))
      .toDF("player", "team", "opponent", "stadium", "position")
    val players = Seq((10L, "Kim", "T1")).toDF("hitter_id", "player_name",
      "team_name")
    val empty = Seq.empty[(Long, String)].toDF("hitter_id", "opponent_team")
    val emptyS = Seq.empty[(Long, String)].toDF("hitter_id", "stadium")
    val emptyM = Seq.empty[(Long, Double)].toDF("hitter_id", "m")
    val games = (1 to 15).map(i =>
        (10L, f"2024-02-$i%02d", "T2", i.toLong))
      .toDF("hitter_id", "game_date", "opponent_team", "game_id")
    val out = Records.wideRecord(lineup, players, emptyM, empty, emptyS,
      games, "hitter_id", isPitcher = false, recentK = 10,
      recentOrderCols = Seq("game_date", "game_id"))
    val n = out.select(size(col("recent_games"))).as[Int].head()
    assert(n == 10)
  }
}
