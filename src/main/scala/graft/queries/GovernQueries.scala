package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Govern

/** Data-governance audits under the DuckDB oracle
  * ([[graft.ext.Govern]]): k-anonymity / l-diversity over declared
  * quasi-identifiers, and the declared-constraint battery (functional
  * dependencies + candidate keys). These are the release gates a
  * training-data pipeline runs before a corpus ships — one-pass hash
  * aggregations whose verdicts must be exact, not sampled.
  */
object GovernQueries {
  type QFn = (SparkSession, String) => DataFrame

  // ===== k-anonymity / l-diversity =====================================

  /** Quasi-identifiers (c_nationkey, c_mktsegment) — the "public"
    * attributes a linker would join on; sensitive attribute = the
    * account-balance band floor(c_acctbal/1000). One row per
    * equivalence class with the k>=10 / l>=3 verdicts. */
  private val kanonQ: QFn = (s, d) =>
    Govern.kAnonymity(
      Tables.customer(s, d)
        .withColumn("bal_band", floor(col("c_acctbal") / 1000).cast("long")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", k = 10, l = 3)

  private val kanonSql =
    """WITH b AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      |  FROM customer),
      |ps AS (
      |  SELECT c_nationkey, c_mktsegment, bal_band,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2, 3)
      |SELECT c_nationkey, c_mktsegment,
      |  CAST(sum(c) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS l_distinct,
      |  sum(c) >= 10 AS k_anonymous,
      |  count(*) >= 3 AS l_diverse
      |FROM ps GROUP BY 1, 2""".stripMargin

  // ===== declared-constraint battery (FDs + keys) ======================

  /** Three declared FDs of very different truth status — the nation
    * dimension's real FD (n_nationkey -> n_regionkey, holds), a
    * catalog FD a modeler might wrongly assume (p_brand -> p_type,
    * violated), and a fact-table FD that fails because orders carry
    * multiple return flags (l_orderkey -> l_returnflag) — plus two
    * candidate-key audits (orders' true key; lineitem's order key,
    * which is NOT a key). One unioned verdict table. */
  private val fdAuditQ: QFn = (s, d) => {
    val fd1 = Govern.fdAudit(Tables.nation(s, d), "fd_nation_region",
      Seq("n_nationkey"), "n_regionkey")
    val fd2 = Govern.fdAudit(Tables.part(s, d), "fd_brand_type",
      Seq("p_brand"), "p_type")
    val fd3 = Govern.fdAudit(Tables.lineitem(s, d), "fd_order_flag",
      Seq("l_orderkey"), "l_returnflag")
    val k1 = Govern.keyAudit(Tables.orders(s, d), "key_orders",
      Seq("o_orderkey"))
      .select(col("audit"), col("n_distinct").as("n_groups"),
        lit(null).cast("long").as("violating_groups"),
        col("dup_rows").as("violating_rows"),
        (lit(1.0) - col("uniqueness")).as("violation_rate"))
    val k2 = Govern.keyAudit(Tables.lineitem(s, d), "key_lineitem_order",
      Seq("l_orderkey"))
      .select(col("audit"), col("n_distinct").as("n_groups"),
        lit(null).cast("long").as("violating_groups"),
        col("dup_rows").as("violating_rows"),
        (lit(1.0) - col("uniqueness")).as("violation_rate"))
    fd1.unionByName(fd2).unionByName(fd3).unionByName(k1).unionByName(k2)
  }

  private def sqlFd(name: String, table: String, lhs: String,
      rhs: String) =
    s"""SELECT '$name' AS audit,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS violating_groups,
       |  CAST(sum(CASE WHEN nd > 1 THEN rws ELSE 0 END) AS BIGINT)
       |    AS violating_rows,
       |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS violation_rate
       |FROM (
       |  SELECT $lhs, CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(c) AS BIGINT) AS rws
       |  FROM (SELECT $lhs, $rhs, CAST(count(*) AS BIGINT) AS c
       |        FROM $table WHERE $lhs IS NOT NULL GROUP BY 1, 2)
       |  GROUP BY 1)""".stripMargin

  private def sqlKey(name: String, table: String, keyCol: String) =
    s"""SELECT '$name' AS audit,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(NULL AS BIGINT) AS violating_groups,
       |  CAST(sum(c) - count(*) AS BIGINT) AS violating_rows,
       |  CAST(1.0 AS DOUBLE) - (CAST(count(*) AS DOUBLE) /
       |    CAST(sum(c) AS DOUBLE)) AS violation_rate
       |FROM (SELECT $keyCol, CAST(count(*) AS BIGINT) AS c
       |      FROM $table GROUP BY 1)""".stripMargin

  private val fdAuditSql = Seq(
    sqlFd("fd_nation_region", "nation", "n_nationkey", "n_regionkey"),
    sqlFd("fd_brand_type", "part", "p_brand", "p_type"),
    sqlFd("fd_order_flag", "lineitem", "l_orderkey", "l_returnflag"),
    sqlKey("key_orders", "orders", "o_orderkey"),
    sqlKey("key_lineitem_order", "lineitem", "l_orderkey"))
    .mkString("\nUNION ALL\n")

  // ===== seeded differentially-private count release ===================

  /** The release face of the privacy family: per-(nation, segment)
    * customer counts with seeded Laplace(1/eps) noise
    * ([[graft.ext.Govern.dpNoisyCounts]], eps = 1). The draw is
    * deterministic per (seed, group) — reproducible releases; the
    * oracle replays the portable-hash inverse-CDF draw exactly. */
  private val dpSeed = "r11"
  private val dpEps = 1.0

  private val dpReleaseQ: QFn = (s, d) =>
    Govern.dpNoisyCounts(Tables.customer(s, d),
      Seq("c_nationkey", "c_mktsegment"), epsilon = dpEps, seed = dpSeed)

  private val dpReleaseSql = {
    val p = graft.ext.Hashing.P
    val hash = Q.sqlHashP(
      s"'$dpSeed' || '|' || CAST(c_nationkey AS VARCHAR) || '|' || " +
        "c_mktsegment")
    val noise = Q.sqlSig9(
      s"CAST(${-1.0 / dpEps} AS DOUBLE) * CAST(sign(cc) AS DOUBLE) * " +
        "ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(cc))")
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(count(*) AS BIGINT) AS n_true
       |  FROM customer GROUP BY 1, 2),
       |h AS (
       |  SELECT *,
       |    (CAST($hash AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
       |      CAST($p AS DOUBLE) - CAST(0.5 AS DOUBLE) AS cc
       |  FROM g),
       |nz AS (SELECT c_nationkey, c_mktsegment, n_true,
       |  $noise AS noise FROM h)
       |SELECT c_nationkey, c_mktsegment, n_true, noise,
       |  ${Q.sqlSig9("CAST(n_true AS DOUBLE) + noise")} AS n_released
       |FROM nz""".stripMargin
  }

  // ===== referential-integrity audit ===================================

  /** Three declared foreign keys of the star schema: lineitem->orders
    * and orders->customer (both hold in the fixture) plus
    * lineitem->part restricted to part's Brand#11 slice (deliberately
    * violated — the "parent got filtered upstream" incident the audit
    * exists to catch). Child sides collapse to key domains before the
    * anti-join. */
  private val riAuditQ: QFn = (s, d) => {
    val ri1 = Govern.riAudit(Tables.lineitem(s, d), "ri_li_orders",
      "l_orderkey", Tables.orders(s, d), "o_orderkey")
    val ri2 = Govern.riAudit(Tables.orders(s, d), "ri_orders_customer",
      "o_custkey", Tables.customer(s, d), "c_custkey")
    val ri3 = Govern.riAudit(Tables.lineitem(s, d), "ri_li_part11",
      "l_partkey",
      Tables.part(s, d).where(col("p_brand") === "Brand#11"),
      "p_partkey")
    ri1.unionByName(ri2).unionByName(ri3)
  }

  private def sqlRi(name: String, child: String, fk: String,
      parent: String, pk: String, parentWhere: String = "") =
    s"""SELECT '$name' AS audit, n_rows, null_fk_rows, n_fks,
       |  orphan_fks, orphan_rows,
       |  CAST(orphan_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
       |    AS orphan_rate
       |FROM
       |  (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM $child),
       |  (SELECT CAST(COALESCE(sum(CASE WHEN $fk IS NULL THEN 1 END), 0)
       |     AS BIGINT) AS null_fk_rows FROM $child),
       |  (SELECT CAST(count(DISTINCT $fk) AS BIGINT) AS n_fks
       |   FROM $child WHERE $fk IS NOT NULL),
       |  (SELECT CAST(count(*) AS BIGINT) AS orphan_fks,
       |     CAST(COALESCE(sum(c), 0) AS BIGINT) AS orphan_rows
       |   FROM (SELECT $fk AS fkv, CAST(count(*) AS BIGINT) AS c
       |         FROM $child WHERE $fk IS NOT NULL GROUP BY 1) ck
       |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
       |     WHERE p.$pk = ck.fkv $parentWhere))""".stripMargin

  private val riAuditSql = Seq(
    sqlRi("ri_li_orders", "lineitem", "l_orderkey", "orders",
      "o_orderkey"),
    sqlRi("ri_orders_customer", "orders", "o_custkey", "customer",
      "c_custkey"),
    sqlRi("ri_li_part11", "lineitem", "l_partkey", "part", "p_partkey",
      "AND p.p_brand = 'Brand#11'"))
    .mkString("\nUNION ALL\n")

  val queries: Map[String, QFn] = Map(
    "q_x_kanon" -> kanonQ,
    "q_x_fd_audit" -> fdAuditQ,
    "q_x_dp_release" -> dpReleaseQ,
    "q_x_ri_audit" -> riAuditQ)

  val oracles: Map[String, String] = Map(
    "q_x_kanon" -> kanonSql,
    "q_x_fd_audit" -> fdAuditSql,
    "q_x_dp_release" -> dpReleaseSql,
    "q_x_ri_audit" -> riAuditSql)
}
