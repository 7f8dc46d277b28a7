#!/usr/bin/env python3
"""Reconstruct a correctness verdict from verify_manifest.jsonl alone.

Usage: python3 tools/manifest_check.py <sfDir> <outDir>
  - expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
    (it writes oracle_sql.json + verify_manifest.jsonl)
  - runs each oracle SQL in DuckDB and computes the SAME canonical
    order-independent content fingerprint graft.core.Canon computed on
    the Spark side; a matching (rows, fp) pair proves value-exact
    equality without ever reading the Spark parquet.

The cell serialization here is the Python half of the spec documented in
src/main/scala/graft/core/Canon.scala — change both or neither.
"""
import json, os, sys, math, struct, hashlib, decimal, datetime
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EPOCH = datetime.date(1970, 1, 1)


def type_tree(t):
    """DuckDBPyType -> ('kind', ...) tree in graft.core.Canon's
    engine-neutral vocabulary. Needed because fetchall() returns BOTH
    structs and maps as dicts — only the declared type distinguishes
    the m{k=v;...} map form from the {v1,v2} struct form."""
    tid = t.id
    if tid == "list":
        return ("array", type_tree(dict(t.children)["child"]))
    if tid == "struct":
        return ("struct", [(n, type_tree(c)) for n, c in t.children])
    if tid == "map":
        ch = dict(t.children)
        return ("map", type_tree(ch["key"]), type_tree(ch["value"]))
    if tid == "decimal":
        ch = dict(t.children)
        return ("decimal", ch["precision"], ch["scale"])
    if tid in ("tinyint", "smallint", "integer", "bigint", "hugeint",
               "utinyint", "usmallint", "uinteger", "ubigint"):
        return ("int",)
    if tid in ("float", "double"):
        return ("float",)
    if tid == "boolean":
        return ("bool",)
    if tid == "varchar":
        return ("str",)
    if tid == "blob":
        return ("bytes",)
    if tid.startswith("timestamp"):
        return ("timestamp",)
    if tid == "date":
        return ("date",)
    return (tid,)


def sig_name(tt):
    """Canon.schemaSig type vocabulary for a type tree."""
    k = tt[0]
    if k == "array":
        return f"array<{sig_name(tt[1])}>"
    if k == "struct":
        return "struct<" + ",".join(f"{n}:{sig_name(c)}" for n, c in tt[1]) + ">"
    if k == "map":
        return f"map<{sig_name(tt[1])},{sig_name(tt[2])}>"
    if k == "decimal":
        return f"decimal({tt[1]},{tt[2]})"
    return k


def schema_sig(cols, trees):
    return ",".join(sorted(f"{c}:{sig_name(t)}" for c, t in zip(cols, trees)))


def ser(v, tt=None):
    """Serialize one cell per the Canon spec. `tt` is the type tree of
    the cell (None = scalar whose Python type decides, the proven path);
    it is REQUIRED to distinguish map from struct, and threaded through
    nested arrays/structs so inner maps serialize correctly too."""
    if v is None:
        return "N"
    if tt is not None and tt[0] == "map":
        # duckdb returns maps either as {'key': [...], 'value': [...]}
        # (columnar) or as a plain k->v dict depending on version
        if isinstance(v, dict) and set(v.keys()) == {"key", "value"} \
                and isinstance(v.get("key"), list):
            items = zip(v["key"], v["value"])
        else:
            items = v.items()
        kt, vt = tt[1], tt[2]
        pairs = sorted((ser(k, kt), ser(x, vt)) for k, x in items)
        return "m{" + ";".join(f"{k}={x}" for k, x in pairs) + "}"
    if tt is not None and tt[0] == "struct" and isinstance(v, dict):
        return "{" + ",".join(ser(v[n], c) for n, c in tt[1]) + "}"
    if tt is not None and tt[0] == "array" and isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(ser(x, tt[1]) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "b:1" if bool(v) else "b:0"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "f:NaN" if math.isnan(f) else "f:" + struct.pack("<d", f).hex()
    if isinstance(v, decimal.Decimal):
        s = format(v, "f")  # plain string, no exponent, scale preserved
        return f"d:{s}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "N"
        return f"t:{v.value // 1000}"  # ns → µs
    if isinstance(v, datetime.datetime):
        base = v.astimezone(datetime.timezone.utc).replace(tzinfo=None) \
            if v.tzinfo else v
        td = base - datetime.datetime(1970, 1, 1)
        # exact integer arithmetic — total_seconds() is a float and can
        # round the microsecond at 2026-scale epochs
        micros = (td.days * 86400 + td.seconds) * 10**6 + td.microseconds
        return f"t:{micros}"
    if isinstance(v, datetime.date):
        return f"D:{(v - EPOCH).days}"
    if isinstance(v, dict):  # DuckDB struct → declared field order
        return "{" + ",".join(ser(x) for x in v.values()) + "}"
    if isinstance(v, (np.ndarray, list, tuple)):
        et = tt[1] if tt is not None and tt[0] == "array" else None
        return "[" + ",".join(ser(x, et) for x in v) + "]"
    try:
        if pd.isna(v):
            return "N"
    except (TypeError, ValueError):
        pass
    raise TypeError(f"manifest_check: unhandled cell type {type(v)}: {v!r}")


def fingerprint(cols, rows, trees=None):
    """cols: column names in result order; rows: iterable of tuples of
    NATIVE Python values (duckdb .fetchall()). Native fetch is load-
    bearing: pandas coerces a nullable BIGINT column to float64 (ints
    become doubles, NULLs become NaN), which diverges from the typed
    Scala view and mis-fingerprints every int-with-null column.
    `trees`: per-column type trees (type_tree) for map/struct-aware
    nested serialization; optional for scalar-only callers."""
    if trees is None:
        trees = [None] * len(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    acc, n = 0, 0
    for row in rows:
        s = "\x01".join(f"{cols[i]}={ser(row[i], trees[i])}" for i in order)
        h = hashlib.md5(s.encode("utf-8")).digest()
        acc = (acc + int.from_bytes(h[:8], "big")) % (1 << 64)
        n += 1
    return n, f"{acc:016x}"


def mem_limit_gb() -> int:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    gb = int(line.split()[1]) // (1024 * 1024)
                    return max(2, min(24, gb // 2))
    except Exception:
        pass
    return 8


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import tempfile
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem_limit_gb()}GB'")
    con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='graft_spill_')}'")
    con.execute("SET threads TO 8")
    for t in TABLES:
        # testdata tables are single files; MakeScale fixtures are
        # Spark-written DIRECTORIES of part files — glob in that case
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    manifest = {}
    with open(f"{out_dir}/verify_manifest.jsonl") as f:
        for line in f:
            if line.strip():
                m = json.loads(line)
                manifest[m["name"]] = m
    ok = fail = skip = 0
    for name in sorted(manifest):
        m = manifest[name]
        if "error" in m:
            print(f"FAIL {name}: spark-side error: {m['error']}"); fail += 1
            continue
        sql = oracle_sql.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle SQL (rows={m['rows']})"); skip += 1
            continue
        try:
            rel = con.sql(sql)
            ocols = list(rel.columns)
            trees = [type_tree(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1
            continue
        n, fp = fingerprint(ocols, orows, trees)
        osig = schema_sig(ocols, trees)
        if n != m["rows"]:
            print(f"FAIL {name}: rows spark={m['rows']} oracle={n}"); fail += 1
        elif fp != m["fp"]:
            print(f"FAIL {name}: fp spark={m['fp']} oracle={fp}"); fail += 1
        elif m.get("schema") and osig != m["schema"]:
            print(f"FAIL {name}: schema spark={m['schema']} oracle={osig}")
            fail += 1
        else:
            ok += 1
    print(f"manifest_check: {ok} ok, {fail} fail, {skip} skipped "
          f"(of {len(manifest)} manifest entries)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
