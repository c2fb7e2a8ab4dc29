package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed strata: 900 "big" rows vs 100 "small"
  private def docs = (1L to 1000L)
    .map(i => (i, if (i <= 900) "big" else "small"))
    .toDF("id", "stratum")

  test("alpha=0.5 upsamples the tail stratum relative to natural share") {
    val r = Sampling.temperatureMix(docs, "id", "stratum", targetFrac = 0.5)
    val rates = r.select("stratum", "rate").distinct()
      .as[(String, Double)].collect().toMap
    // w ∝ sqrt(n): big 30, small 10 -> shares 0.75 / 0.25;
    // target 500 -> big rate 375/900 ≈ 0.4167, small 125/100 -> capped 1.0
    assert(rates("small") == 1.0)
    assert(math.abs(rates("big") - 0.4166667) < 1e-6)
    val kept = r.filter(col("accept")).groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(kept("small") == 100L)                  // rate 1: all kept
    assert(kept("big") > 300L && kept("big") < 450L)
  }

  test("null strata keep their rows and get a decision (audit contract)") {
    val withNull = (1L to 100L)
      .map(i => (i, if (i <= 90) Some("big") else None))
      .toDF("id", "stratum")
    val r = Sampling.temperatureMix(withNull, "id", "stratum", 0.5)
    assert(r.count() == 100) // nothing silently dropped
    val nulls = r.filter(col("stratum").isNull)
    assert(nulls.count() == 10)
    // NULL is a stratum: it got a rate and real accept decisions
    assert(nulls.filter(col("rate").isNull).count() == 0)
    assert(nulls.filter(col("accept").isNull).count() == 0)
  }

  test("epochMix: expected multiplicity per stratum, deterministic") {
    val r = Sampling.epochMix(docs, "id", "stratum",
      Map("big" -> 0.5, "small" -> 2.5))
    val counts = r.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    // big: 900 rows x 0.5 epochs ~ 450; small: 100 x 2.5 ~ 250
    assert(counts("big") > 380 && counts("big") < 520)
    assert(counts("small") > 215 && counts("small") < 285)
    // integer epochs are exact: every small row has copies 0 and 1
    val copies = r.filter(col("stratum") === "small")
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(copies.forall(c => c._2 == 2L || c._2 == 3L))
    val again = Sampling.epochMix(docs, "id", "stratum",
      Map("big" -> 0.5, "small" -> 2.5))
      .select("id", "copy_idx").collect().toSet
    assert(again == r.select("id", "copy_idx").collect().toSet)
  }

  test("epochMix rejects non-finite and absurd epoch values loudly") {
    intercept[IllegalArgumentException] {
      Sampling.epochMix(docs, "id", "stratum",
        Map("big" -> Double.PositiveInfinity))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMix(docs, "id", "stratum", Map("big" -> 1e9))
    }
  }

  test("epochMix: zero-epoch strata vanish; 1.0-epoch strata are identity") {
    val r = Sampling.epochMix(docs, "id", "stratum",
      Map("big" -> 1.0, "small" -> 0.0))
    assert(r.filter(col("stratum") === "small").count() == 0)
    assert(r.filter(col("stratum") === "big").count() == 900)
    assert(r.filter(col("copy_idx") =!= 0).count() == 0)
  }

  test("decisions are a pure function of the input (re-run identical)") {
    val all = Sampling.temperatureMix(docs, "id", "stratum", 0.5)
      .filter(col("accept")).select("id").as[Long].collect().toSet
    val again = Sampling.temperatureMix(docs, "id", "stratum", 0.5)
      .filter(col("accept")).select("id").as[Long].collect().toSet
    assert(all == again)
  }
}
