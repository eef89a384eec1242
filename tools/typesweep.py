#!/usr/bin/env python3
"""Static oracle type audit: DESCRIBE every oracle_sql.json query in DuckDB
and flag result columns whose DuckDB type cannot round-trip the driver's
hash against a Spark output (HUGEINT/UHUGEINT from uncast integer sums).

Usage: python3 tools/typesweep.py <sfDir> <oracle_sql.json>
Needs only the table views (no Spark run) — DESCRIBE doesn't execute.
"""
import json, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BAD = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}

def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute("DESCRIBE " + oracle[name]).fetchall()
        except Exception as ex:
            print(f"ERR  {name}: {str(ex)[:200]}")
            bad += 1
            continue
        hits = [(c, t) for c, t, *_ in desc if t.upper() in BAD]
        if hits:
            print(f"FLAG {name}: {hits}")
            bad += 1
    print(f"{len(oracle) - bad}/{len(oracle)} oracles clean")
    return 0 if bad == 0 else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
