#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
  2. registers each parquet table in DuckDB, runs outDir/oracle_sql.json
  3. compares (columns sorted by name, rows sorted by all columns)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(pq)], ignore_index=True)
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            results[name] = f"ORACLE_ERROR: {ex}"
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} oracle={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} oracle={len(w)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                results[name] = "OK"
            except AssertionError as ex:
                results[name] = "VALUE_MISMATCH: " + str(ex).split("\n")[0]
                # show first differing rows
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    results[name] += f" | row {i}: spark={g.loc[i].to_dict()} oracle={w.loc[i].to_dict()}"
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + str(v)[:300]))
    # queries with no oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            n = len(pd.concat([pd.read_parquet(f) for f in glob.glob(d + "*.parquet")], ignore_index=True)) if glob.glob(d + "*.parquet") else 0
            print(f"INFO {name} (no oracle): {n} rows")
    print(f"\n{ok}/{len(oracle)} oracle-checked queries pass")
    return 0 if ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
