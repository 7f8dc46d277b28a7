#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>
  - expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  - registers each testdata parquet as a DuckDB view named after the table
  - runs each oracle_sql.json query, compares against the Spark parquet
    (columns sorted by name, rows sorted, NaN==NaN, exact values)
"""
import json, sys, math, struct, decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df

def ser(v) -> str:
    """Canonical type-prefixed serialization of one cell. STRICT on purpose:
    the driver's gate hashes exact serialized values, so the local gate must
    too — round 1's tolerant compare (float()==, Decimal(str())) passed six
    queries the driver then hash-failed. Floats compare by IEEE-754 bits,
    Decimals by exact string (scale included), and a type mismatch (int vs
    float vs Decimal) is a mismatch even at equal numeric value."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(ser(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "f:NaN" if math.isnan(f) else "f:" + struct.pack("<d", f).hex()
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return f"s:{v}"

def cells_equal(a, b) -> bool:
    return ser(a) == ser(b)

def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA mismatch: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWS mismatch: spark={len(spark_df)} oracle={len(oracle_df)}"
    s, o = canon(spark_df), canon(oracle_df)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not cells_equal(a, b)]
        if bad:
            i, a, b = bad[0]
            return f"VALUE mismatch col={col} row={i}: spark={a!r} oracle={b!r} ({len(bad)} cells)"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # duckdb sizes its memory limit from free RAM at CONNECT time; a
    # co-tenant JVM holding (but not using) a large heap makes that
    # derivation tiny and the big recursive oracles then OOM at
    # kilobyte-block allocations. Pin an explicit limit instead.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail = 0, 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}"); fail += 1; continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}"); fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
