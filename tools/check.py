#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
  2. registers each parquet table in DuckDB, runs outDir/oracle_sql.json
  3. compares (columns sorted by name, rows sorted by all columns)

Beyond value equality this also replicates the driver's REPRESENTATION
sensitivity (its hash sees the rendered value, not `==`): a column whose
dtype kind differs (DuckDB widening sum(BIGINT) -> HUGEINT surfaces as
float64/object while Spark stays int64) or a float that differs only in
the IEEE sign bit (-0.0 vs 0.0 after round) is flagged REPR_MISMATCH even
though pandas equality would pass. Round 5 shipped three oracles that
passed the old check and failed the driver on exactly those two classes.
"""
import json, sys, glob, os
import duckdb
import numpy as np
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


def repr_mismatch(g: pd.DataFrame, w: pd.DataFrame):
    """Representation drift the driver's hash sees but `==` does not.

    Returns a description string, or None. Checks (per column):
      * dtype KIND mismatch (int vs float vs object) — the HUGEINT class:
        an uncast DuckDB sum(BIGINT) widens to HUGEINT and lands in pandas
        as float64/object while Spark emits int64;
      * float sign-bit drift — `round` leaving -0.0 on one engine only.
    """
    for c in g.columns:
        gk, wk = g[c].dtype.kind, w[c].dtype.kind
        if gk != wk and not (gk in "OU" and wk in "OU"):
            return f"col {c}: dtype kind spark={g[c].dtype} oracle={w[c].dtype}"
        if gk == "f" and wk == "f":
            gs = np.signbit(g[c].to_numpy())
            ws = np.signbit(w[c].to_numpy())
            # NaN sign bits are unspecified; only compare where both finite
            ok = np.isnan(g[c].to_numpy()) & np.isnan(w[c].to_numpy())
            bad = (gs != ws) & ~ok
            if bad.any():
                i = int(np.argmax(bad))
                return (f"col {c}: float sign-bit drift at row {i} "
                        f"(spark={g[c].iloc[i]!r} oracle={w[c].iloc[i]!r} — -0.0 vs 0.0)")
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleData tiles): a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
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
        elif repr_mismatch(g, w):
            results[name] = "REPR_MISMATCH: " + repr_mismatch(g, w)
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
