"""Fixture-vintage pre-flight for the Python oracle comparers — the
DuckDB-side twin of graft.core.Tables.preflight (which guards
Verify/Bench/Soak in-JVM).

The oracle SQL reads the RAW fixture parquet through DuckDB views, so a
driver fixture regeneration that changes a column name or type shifts
the ORACLE's answers (or errors deep inside whichever queries touch the
drifted column) while the comparer happily reports scattered reds —
the round-8 failure mode. This module pins the raw vintage the oracle
SQL was written against and refuses to compare on ANY drift, printing
every per-table difference in one message.

Timestamp columns appear as TIMESTAMP here (DuckDB reads parquet
isAdjustedToUTC both ways as TIMESTAMP); the Scala loaders own the
session-tz normalization, which Tables.preflight pins separately.
"""

# (column, duckdb_type) per table, in order — the vintage the oracle
# SQL in src/main/scala/graft/queries/*.scala assumes.
EXPECTED = {
    "region": [("r_regionkey", "INTEGER"), ("r_name", "VARCHAR")],
    "nation": [("n_nationkey", "INTEGER"), ("n_name", "VARCHAR"),
               ("n_regionkey", "INTEGER")],
    "customer": [("c_custkey", "BIGINT"), ("c_name", "VARCHAR"),
                 ("c_nationkey", "INTEGER"), ("c_acctbal", "DOUBLE"),
                 ("c_mktsegment", "VARCHAR")],
    "supplier": [("s_suppkey", "BIGINT"), ("s_name", "VARCHAR"),
                 ("s_nationkey", "INTEGER"), ("s_acctbal", "DOUBLE")],
    "part": [("p_partkey", "BIGINT"), ("p_name", "VARCHAR"),
             ("p_brand", "VARCHAR"), ("p_type", "VARCHAR"),
             ("p_size", "INTEGER"), ("p_retailprice", "DOUBLE")],
    "orders": [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
               ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DOUBLE"),
               ("o_orderdate", "TIMESTAMP"),
               ("o_orderpriority", "VARCHAR")],
    "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                 ("l_suppkey", "BIGINT"), ("l_linenumber", "INTEGER"),
                 ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
                 ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
                 ("l_returnflag", "VARCHAR"), ("l_linestatus", "VARCHAR"),
                 ("l_shipdate", "TIMESTAMP")],
    "events": [("event_id", "BIGINT"), ("ts", "TIMESTAMP"),
               ("user_id", "BIGINT"), ("event_type", "VARCHAR"),
               ("value", "DOUBLE"), ("props", "VARCHAR")],
    "documents": [("doc_id", "BIGINT"), ("text", "VARCHAR"),
                  ("lang", "VARCHAR"), ("source", "VARCHAR"),
                  ("n_chars", "BIGINT")],
    "embeddings": [("vec_id", "BIGINT"), ("embedding", "FLOAT[]"),
                   ("label", "INTEGER")],
}


def preflight(con, sfdir):
    """Raise SystemExit with every per-table diff if the fixture dir's
    raw parquet schemas drifted from EXPECTED; no-op when clean."""
    problems = []
    for table, expected in EXPECTED.items():
        try:
            rows = con.execute(
                f"DESCRIBE SELECT * FROM '{sfdir}/{table}.parquet'"
            ).fetchall()
            actual = [(r[0], r[1]) for r in rows]
        except Exception as e:  # missing table is itself a drift
            problems.append(f"{table}: unreadable ({e})")
            continue
        if actual != expected:
            problems.append(
                f"{table}: expected {expected}, got {actual}")
    if problems:
        raise SystemExit(
            "[preflight] FIXTURE DRIFT — refusing to compare: the raw "
            f"parquet vintage in {sfdir} no longer matches the schema "
            "the oracle SQL was written against (tools/"
            "fixture_preflight.py EXPECTED). Regenerate the fixtures or "
            "update the contract AND the oracle SQL together.\n  "
            + "\n  ".join(problems))
