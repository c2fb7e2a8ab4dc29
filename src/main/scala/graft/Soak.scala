package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** sf1.0 soak of the FULL oracle surface (VERDICT r7 #9, widened to
  * every query by r9 #2).
  *
  * The driver's test data tops out at sf0.1 (5k documents / 2k
  * embeddings), so every 100 TB judgment in this repo is extrapolated
  * from one decade of bench data. This main buys a second decade: it
  * scales ALL TEN fixture tables 10x DETERMINISTICALLY (the scaled dir
  * passes `Tables.preflight`), runs every `SparkEntry.queries` entry
  * at both scales (same Bench methodology: untimed warm-up, two timed
  * passes, min, full `toRdd.count()` materialization), and reports the
  * scaling exponent per query — `log10(t_sf1 / t_sf01)`, so 1.0 =
  * linear, <1 = sublinear (fixed overhead amortizing), >1 =
  * superlinear (a shape that will NOT survive 100 TB).
  *
  * Scaling construction (the part that must not lie):
  *  - documents: replica i > 0 re-ids rows by `i * (max_id + 1)` and
  *    suffixes every whitespace token with `_r$i`. Replicas are
  *    therefore DISJOINT in token/shingle space — 10 independent copies
  *    of the sf0.1 problem in one table. Near-dup candidate pairs grow
  *    linearly (within-replica only), never quadratically as exact
  *    text replication would cause (10 exact copies of each doc =
  *    45 cross-replica dup pairs per doc — a different, denser problem
  *    than "10x more data"). The BPE token dictionary, curriculum
  *    score distribution and packing load all scale 10x true-to-shape.
  *  - embeddings: replica i > 0 re-ids by `i * (max_id + 1)` and adds
  *    per-(replica, vector, dim) deterministic noise of ~±0.1 — 10x
  *    distinct vectors with the same geometry, not 10 coincident
  *    copies that would collapse IVF/PQ centroids onto sf0.1's.
  *  - replica 0 is the identity, so sf1.0 contains sf0.1 verbatim.
  *
  * Env: SPARK_GRAFT_SOAK_BASE (default /root/testdata/sf0.1),
  * SPARK_GRAFT_SOAK_DIR (default /tmp/graft_soak_sf1, generated iff
  * missing), SPARK_GRAFT_SOAK_REPLICAS (default 10),
  * SPARK_GRAFT_CPUS (default 4). Output: one JSON line to stdout +
  * SOAK.json, per-query {base_sec, soak_sec, ratio, exponent}.
  */
object Soak {

  /** Deterministic 10x scale-up of the two LLM-pipeline tables. */
  def generate(spark: SparkSession, base: String, out: String,
      replicas: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val docStep = docs.agg(max("doc_id")).head().getLong(0) + 1
    val embStep = emb.agg(max("vec_id")).head().getLong(0) + 1

    val scaledDocs = (0 until replicas).map { i =>
      if (i == 0) docs
      else {
        val text = array_join(
          transform(filter(split(col("text"), " "), t => t =!= ""),
            t => concat(t, lit(s"_r$i"))), " ")
        docs.select((col("doc_id") + lit(i * docStep)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
    }.reduce(_ unionByName _)

    val scaledEmb = (0 until replicas).map { i =>
      if (i == 0) emb
      else emb.select((col("vec_id") + lit(i * embStep)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x + (((col("vec_id") * 31 + lit(i * 17) + j) % 101 - 50)
            .cast("float") / lit(500.0f))).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

    scaledDocs.repartition(8).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    scaledEmb.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  /** Deterministic scale-up of the `part` / `events` tables (round-9
    * soak coverage for the fuzzy join and SCD2 rows). Same philosophy:
    *  - part: replica i > 0 re-ids p_partkey and suffixes every
    *    p_name/p_type token with `_r$i` — brands keep their sizes, so
    *    both join sides grow 10x while replicas stay DISJOINT in token
    *    space: 10 independent matching problems, candidate pairs grow
    *    linearly (exact copies would grow them quadratically).
    *  - events: replica i > 0 re-ids event_id and user_id — 10x
    *    dimension KEYS with the same per-key history length, the way a
    *    dimension change log actually grows.
    */
  def generateRelational(spark: SparkSession, base: String, out: String,
      replicas: Int): Unit = {
    val part = spark.read.parquet(s"$base/part.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val partStep = part.agg(max("p_partkey")).head().getLong(0) + 1
    val evStep = ev.agg(max("event_id")).head().getLong(0) + 1
    val userStep = ev.agg(max("user_id")).head().getLong(0) + 1
    // custkey step comes from the CUSTOMER table (its key domain is a
    // superset of orders' o_custkey), so the scaled customer dim and
    // the scaled orders fact re-id with the SAME stride and every
    // replica's foreign keys resolve
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val custStep0 = cust.agg(max("c_custkey")).head().getLong(0) + 1

    def suffix(c: org.apache.spark.sql.Column, i: Int) = array_join(
      transform(filter(split(c, " "), t => t =!= ""),
        t => concat(t, lit(s"_r$i"))), " ")
    val scaledPart = (0 until replicas).map { i =>
      if (i == 0) part
      else part.select((col("p_partkey") + lit(i * partStep)).as("p_partkey"),
        suffix(col("p_name"), i).as("p_name"), col("p_brand"),
        suffix(col("p_type"), i).as("p_type"), col("p_size"),
        col("p_retailprice"))
    }.reduce(_ unionByName _)

    val scaledEv = (0 until replicas).map { i =>
      if (i == 0) ev
      else ev.select((col("event_id") + lit(i * evStep)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * userStep)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)

    // lineitem feeds aggregate soak rows (histogram, group corr —
    // value distribution untouched) AND the co-purchase PageRank row:
    // re-idding l_orderkey gives 10x orders; re-idding l_partkey with
    // the SAME step as the part table gives 10 DISJOINT co-purchase
    // subgraphs (10x nodes and edges — graph growth true-to-shape;
    // keeping partkeys would only densify the same 20k nodes)
    // orders shares the order-key step with lineitem (l_orderkey is a
    // subset of o_orderkey, so the step comes from orders' max) and
    // re-ids customers — the HITS bipartite graph then grows 10x on
    // BOTH sides with replicas disjoint, true-to-shape
    val ord = spark.read.parquet(s"$base/orders.parquet")
    val orderStep = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val scaledOrd = (0 until replicas).map { i =>
      if (i == 0) ord
      else ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * orderStep))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custStep0))
    }.reduce(_ unionByName _)

    // customer scales with the shared custkey stride; nation/region are
    // BOUNDED dimension domains (a 10x corpus has the same 25 nations)
    // and copy verbatim — so the full ten-table fixture contract
    // (Tables.preflight) holds on the soak dir and every query on the
    // surface can run against it
    val scaledCust = (0 until replicas).map { i =>
      if (i == 0) cust
      else cust.withColumn("c_custkey", col("c_custkey") + lit(i * custStep0))
    }.reduce(_ unionByName _)

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val scaledLi = (0 until replicas).map { i =>
      if (i == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderStep))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partStep))
    }.reduce(_ unionByName _)

    // supplier feeds the edit-distance join row: replicas prefix names
    // with "iii_" (three repeated digits), keeping every cross-replica
    // pair at levenshtein >= 3 — replicas stay DISJOINT at d=1, so the
    // matching problem grows 10x linearly (a 1-char suffix would put
    // cross-replica pairs at distance 1 and grow pairs quadratically)
    val sup = spark.read.parquet(s"$base/supplier.parquet")
    val supStep = sup.agg(max("s_suppkey")).head().getLong(0) + 1
    val scaledSup = (0 until replicas).map { i =>
      if (i == 0) sup
      else sup
        .withColumn("s_suppkey", col("s_suppkey") + lit(i * supStep))
        .withColumn("s_name", concat(lit(i.toString * 3 + "_"),
          col("s_name")))
    }.reduce(_ unionByName _)

    scaledPart.repartition(4).write.mode("overwrite")
      .parquet(s"$out/part.parquet")
    scaledEv.repartition(8).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
    scaledLi.repartition(8).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")
    scaledSup.repartition(4).write.mode("overwrite")
      .parquet(s"$out/supplier.parquet")
    scaledOrd.repartition(8).write.mode("overwrite")
      .parquet(s"$out/orders.parquet")
    scaledCust.repartition(4).write.mode("overwrite")
      .parquet(s"$out/customer.parquet")
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SOAK_BASE",
      "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR",
      "/tmp/graft_soak_sf1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPLICAS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!Files.exists(Paths.get(out, "documents.parquet"))) {
      System.err.println(s"[soak] generating ${replicas}x fixtures at $out")
      generate(spark, base, out, replicas)
    }
    if (!Files.exists(Paths.get(out, "lineitem.parquet")) ||
        !Files.exists(Paths.get(out, "supplier.parquet")) ||
        !Files.exists(Paths.get(out, "orders.parquet")) ||
        !Files.exists(Paths.get(out, "customer.parquet")) ||
        !Files.exists(Paths.get(out, "region.parquet"))) {
      System.err.println(
        s"[soak] generating ${replicas}x relational tables at $out")
      generateRelational(spark, base, out, replicas)
    }
    // the scaled dir honors the same ten-table fixture contract as the
    // driver's — a generator bug fails here, not 150 queries deep
    graft.core.Tables.preflight(spark, out)

    // FULL surface by default (VERDICT r9 #2): every oracle query gets
    // a measured second-decade scaling exponent. SPARK_GRAFT_SOAK_QUERIES
    // =a,b,c restricts the run (fast local iteration; merge by hand).
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = sys.env.get("SPARK_GRAFT_SOAK_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(allNames)
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown soak query: $n"))

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def timeAll(dir: String): Map[String, Double] = {
      names.foreach(runOnce(_, dir)) // warm-up, untimed
      val p1 = names.map(n => n -> runOnce(n, dir)).toMap
      val p2 = names.map(n => n -> runOnce(n, dir)).toMap
      names.map(n => n -> math.min(p1(n), p2(n))).toMap
    }

    val tBase = timeAll(base)
    val tSoak = timeAll(out)
    val fresh = names.map { n =>
      val ratio = tSoak(n) / tBase(n)
      val exp = math.log(ratio) / math.log(replicas.toDouble)
      n -> f"""{"base_sec":${tBase(n)}%.3f,"soak_sec":${tSoak(n)}%.3f,"ratio":$ratio%.2f,"exponent":$exp%.3f}"""
    }.toMap
    val path = Paths.get("SOAK.json")
    val prior = if (Files.exists(path)) Files.readString(path) else ""
    val merged = mergeRows(prior, fresh)
    val json = s"""{"metric":"soak","replicas":$replicas,"base":"$base","queries":${merged.toSeq.sortBy(_._1).map { case (n, r) => s""""$n":$r""" }.mkString("{", ",", "}")}}"""
    println(json)
    Files.writeString(path, json + "\n")
    spark.stop()
  }

  /** Merge freshly-measured per-query rows over the rows already in
    * SOAK.json. The ledger accumulates across subset runs (the normal
    * way new operators get their at-scale row); a run may REPLACE a
    * query's row but can never drop another query's — the round-11
    * snapshot clobbered 284 rows down to 1 exactly because the writer
    * trusted the in-memory subset to be the whole ledger. Rows are flat
    * one-level JSON objects by construction, so a brace-free regex
    * extracts them without a JSON dependency.
    */
  private[graft] def mergeRows(prior: String,
      fresh: Map[String, String]): Map[String, String] = {
    val row = """"(q_[A-Za-z0-9_]+)"\s*:\s*(\{[^{}]*\})""".r
    val old = row.findAllMatchIn(prior).map(m => m.group(1) -> m.group(2)).toMap
    old ++ fresh
  }
}
