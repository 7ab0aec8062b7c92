#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verifyOutDir> [sfDir]

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle query, and compares against the Spark result
parquet at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
exact value compare (with a float-tolerance second pass reported
separately so near-misses are visible).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sorting/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv))
                   if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                      and (math.isclose(x, y, rel_tol=0, abs_tol=0)
                                           or (math.isnan(x) and math.isnan(y)))))]
            if bad:
                close = all(math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9) for _, x, y in bad)
                return (f"VALUES col={c} n_diff={len(bad)} first={bad[0]} "
                        f"{'(all within 1e-9 — float near-miss)' if close else '(REAL diff)'}")
        else:
            neq = av != bv
            if neq.any():
                i = int(neq.argmax())
                return f"VALUES col={c} n_diff={int(neq.sum())} first=({i}, {av[i]!r}, {bv[i]!r})"
    return None


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    rows_only = []
    for name in sorted(glob.glob(f"{out}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        files = glob.glob(f"{name}/*.parquet")
        if not files:
            print(f"FAIL {qname}: no spark output parquet")
            n_bad += 1
            continue
        spark_df = pq.read_table(name).to_pandas()
        if qname not in oracle:
            rows_only.append((qname, len(spark_df)))
            continue
        try:
            oracle_df = con.execute(oracle[qname]).df()
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}")
            n_bad += 1
            continue
        diff = compare(qname, spark_df, oracle_df)
        if diff:
            print(f"FAIL {qname}: {diff}")
            n_bad += 1
        else:
            print(f"ok   {qname} ({len(spark_df)} rows)")
            n_ok += 1
    for qname, n in rows_only:
        print(f"rows {qname} ({n} rows, no oracle)" + ("  ** EMPTY **" if n == 0 else ""))
    print(f"== {n_ok} ok, {n_bad} fail, {len(rows_only)} rows-only ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
