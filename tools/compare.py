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

def mem_limit_gb() -> int:
    """Derive the DuckDB memory limit from RAM *available right now*.

    Round 12's 80-row cascade: a co-resident 48 g bench JVM exhausted the
    box, the old blind 24GB pin meant DuckDB kept trying (and dying) at
    kilobyte-block mallocs, and every query after the first OOM erred.
    A limit derived from availability (floored so tiny boxes still run,
    capped so an idle box doesn't grab everything) plus a disk-spill path
    turns co-tenant pressure into slowness, not indeterminate verdicts."""
    try:
        avail_kb = 0
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_kb = int(line.split()[1])
                    break
        gb = avail_kb // (1024 * 1024)
        return max(2, min(24, gb // 2))
    except Exception:
        return 8


def fresh_con(sf_dir: str, tmp_dir: str):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem_limit_gb()}GB'")
    # a spill path: without temp_directory an over-limit operator dies
    # instead of going out-of-core
    con.execute(f"SET temp_directory='{tmp_dir}'")
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_pattern(sf_dir, t)}')")
    return con


def table_pattern(sf_dir: str, t: str) -> str:
    """testdata tables are single files; MakeScale fixtures are Spark-written
    DIRECTORIES of part files — read_parquet needs the glob in that case."""
    import os
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import os, tempfile
    tmp_dir = tempfile.mkdtemp(prefix="graft_duckdb_spill_")
    con = fresh_con(sf_dir, tmp_dir)
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail = 0, 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
        oracle_df, oerr = None, None
        # OOM (or any error carrying per-connection corrupted state) gets
        # ONE retry on a fresh connection with a freshly derived limit —
        # r12's cascade pattern (memory accumulating across the 130
        # queries that passed, then 80 consecutive errs) says connection
        # state, not the query, was the killer
        for attempt in range(2):
            try:
                oracle_df = con.sql(sql).df()
                oerr = None
                break
            except Exception as e:
                oerr = e
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con(sf_dir, tmp_dir)
        if oerr is not None:
            print(f"FAIL {name}: oracle error: {str(oerr)[:300]}"); fail += 1; continue
        err = compare(name, spark_df, oracle_df)
        nrows = len(spark_df)
        # drop the result frames before the next query; at 200+ queries
        # the accumulated pandas frames were part of r12's pressure
        del oracle_df, spark_df
        if err:
            print(f"FAIL {name}: {err}"); fail += 1
        else:
            print(f"ok   {name} ({nrows} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
