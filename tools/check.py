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
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_key(t: pa.DataType) -> str:
    """Canonical type label for the schema-strict compare.

    Timestamps keep tz-awareness (the round-11 q3/q18 class: pandas/numpy
    silently coerce tz-aware vs naive datetimes to equal instants, so the
    value compare alone is blind to the exact mismatch the driver gate
    fails on — VERDICT r11 #2). Widths are canonicalized loosely (all
    ints -> int, etc.) because the driver's value-hash compare is
    width-agnostic, but tz/unit and container structure are strict.
    """
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    if pa.types.is_date(t):
        return "date"
    # all numerics canonicalize to one kind: DuckDB emits DECIMAL for
    # literal arithmetic where Spark emits DOUBLE, and the driver gate
    # demonstrably tolerates that (q_percentile_facet et al. were
    # hash-green in r11 with decimal-vs-double); numeric value drift is
    # the value compare's job
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "num"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_key(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_key(t.key_type)},{type_key(t.item_type)}>"
    return str(t)


def to_pandas_num(t: pa.Table) -> pd.DataFrame:
    """to_pandas with decimal columns cast to float64 first (matching
    duckdb's .df() behavior, which the value compare was written for —
    raw to_pandas would yield object columns of decimal.Decimal)."""
    arrays, names = [], []
    for f in t.schema:
        c = t.column(f.name)
        if pa.types.is_decimal(f.type):
            c = c.cast(pa.float64())
        arrays.append(c)
        names.append(f.name)
    return pa.table(dict(zip(names, arrays))).to_pandas()


def schema_diff(spark_t: pa.Table, oracle_t: pa.Table):
    """Arrow-level schema compare (sorted by column name) run BEFORE the
    pandas value compare; returns a message or None."""
    a = {f.name: type_key(f.type) for f in spark_t.schema}
    b = {f.name: type_key(f.type) for f in oracle_t.schema}
    if sorted(a) != sorted(b):
        return f"SCHEMA cols spark={sorted(a)} oracle={sorted(b)}"
    bad = [(n, a[n], b[n]) for n in sorted(a) if a[n] != b[n]]
    if bad:
        n, at, bt = bad[0]
        return f"SCHEMA-TYPES {len(bad)} col(s), first: {n} spark={at} oracle={bt}"
    return None


def type_parity_warn(spark_t: pa.Table, oracle_t: pa.Table):
    """Driver-hash type-parity probe (the r12 q_change_point class).

    The driver's VALUE hash renders integers and decimals differently
    (9671 vs 9671.0-class) even though its schema check canonicalizes
    numerics — so a Spark int64 column vs a DuckDB HUGEINT/decimal128
    oracle column (e.g. an un-cast `sum(BIGINT) OVER ...`) passes the
    schema compare and the value compare here but FAILS the driver hash.
    Flag the asymmetry as a WARNING: Spark integer vs oracle
    decimal/float (or the mirror). decimal-vs-double on columns where
    BOTH sides are non-integer is demonstrably tolerated by the driver
    (q_percentile_facet et al. hash-green) and is not flagged."""
    a = {f.name: f.type for f in spark_t.schema}
    b = {f.name: f.type for f in oracle_t.schema}
    warns = []
    for n in sorted(set(a) & set(b)):
        sa, ob = a[n], b[n]
        s_int = pa.types.is_integer(sa)
        o_int = pa.types.is_integer(ob)
        o_nonint = pa.types.is_decimal(ob) or pa.types.is_floating(ob)
        s_nonint = pa.types.is_decimal(sa) or pa.types.is_floating(sa)
        if (s_int and o_nonint) or (o_int and s_nonint):
            warns.append(f"{n} spark={sa} oracle={ob}")
    return warns


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


def selftest():
    """Regression proof for the r11 blind spot: a tz-aware (UTC) spark
    output vs a naive oracle result — identical instants — must FAIL the
    schema-strict compare even though the pandas value compare is blind
    to it (numpy coerces both to the same datetime64)."""
    import pandas as _pd
    naive = pa.table({"k": [1, 2], "ts": _pd.to_datetime(["1995-03-15", "1995-03-16"])})
    aware = pa.table({"k": [1, 2],
                      "ts": _pd.to_datetime(["1995-03-15", "1995-03-16"]).tz_localize("UTC")})
    d = schema_diff(aware, naive)
    assert d and d.startswith("SCHEMA-TYPES"), f"schema_diff missed tz-awareness: {d!r}"
    # and prove the old value-only compare is indeed blind to it (the bug)
    v = compare("selftest", aware.to_pandas(), naive.to_pandas())
    assert v is None, f"expected value-compare blindness, got {v!r}"
    print("selftest ok: schema-strict compare catches tz-aware-vs-naive; "
          "value compare alone is blind (as in r11)")
    # r12 q_change_point class: spark int64 vs oracle decimal128 — the
    # numeric canonicalization makes schema_diff + value compare blind,
    # so the parity probe MUST flag it ...
    ints = pa.table({"n": pa.array([9671, 12], type=pa.int64())})
    decs = pa.table({"n": pa.array([9671, 12], type=pa.int64()).cast(pa.decimal128(38, 0))})
    assert schema_diff(ints, decs) is None, "expected schema canonicalization blindness"
    assert compare("selftest2", to_pandas_num(ints), to_pandas_num(decs)) is None
    w = type_parity_warn(ints, decs)
    assert w == ["n spark=int64 oracle=decimal128(38, 0)"], f"parity probe missed: {w!r}"
    # ... and stay silent where both sides are non-integer (tolerated class)
    dbl = pa.table({"x": pa.array([1.5], type=pa.float64())})
    dec2 = pa.table({"x": pa.array([1.5], type=pa.float64()).cast(pa.decimal128(12, 2))})
    assert type_parity_warn(dbl, dec2) == [], "probe over-flags decimal-vs-double"
    print("selftest ok: type-parity probe flags int-vs-decimal128, "
          "silent on decimal-vs-double (r12 q_change_point class)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = n_warn = 0
    rows_only = []
    for name in sorted(glob.glob(f"{out}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        files = glob.glob(f"{name}/*.parquet")
        if not files:
            print(f"FAIL {qname}: no spark output parquet")
            n_bad += 1
            continue
        spark_t = pq.read_table(name)
        spark_df = to_pandas_num(spark_t)
        if qname not in oracle:
            rows_only.append((qname, len(spark_df)))
            continue
        try:
            oracle_t = con.execute(oracle[qname]).fetch_arrow_table()
            oracle_df = to_pandas_num(oracle_t)
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}")
            n_bad += 1
            continue
        diff = schema_diff(spark_t, oracle_t) or compare(qname, spark_df, oracle_df)
        if diff:
            print(f"FAIL {qname}: {diff}")
            n_bad += 1
        else:
            warns = type_parity_warn(spark_t, oracle_t)
            if warns:
                print(f"ok   {qname} ({len(spark_df)} rows)  "
                      f"** TYPE-PARITY WARN (driver hash may fail): {'; '.join(warns)} **")
                n_warn += 1
            else:
                print(f"ok   {qname} ({len(spark_df)} rows)")
            n_ok += 1
    for qname, n in rows_only:
        print(f"rows {qname} ({n} rows, no oracle)" + ("  ** EMPTY **" if n == 0 else ""))
    print(f"== {n_ok} ok, {n_bad} fail, {len(rows_only)} rows-only, "
          f"{n_warn} type-parity warn ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
