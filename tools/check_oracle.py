#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against the DuckDB
oracle SQL, per query. Usage: check_oracle.py OUTDIR SFDIR [query ...]"""
import os, sys, json, glob, math
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_preflight import preflight

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]

def vals_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None: return False
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    # refuse to compare on fixture-vintage drift (round-8 incident):
    # a regenerated fixture the oracle SQL was not written against
    # must fail HERE with the schema diff, not as scattered reds
    preflight(con, sfdir)
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only: continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error {e}"); n_bad += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1; continue
        s, cols = canon(sdf, scols)
        o, _ = canon(odf, ocols)
        bad = None
        exact = True
        for i, (sr, orow) in enumerate(zip(s, o)):
            for j, (x, y) in enumerate(zip(sr, orow)):
                if not vals_equal(x, y):
                    bad = (i, cols[j], x, y); break
                if x != y and not (x is None and y is None):
                    exact = False
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_bad += 1
        else:
            tag = "ok" if exact else "ok(~1e-9)"
            print(f"PASS {name}: {len(sdf)} rows [{tag}]"); n_ok += 1
    print(f"== {n_ok} pass, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main())
