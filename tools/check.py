#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps written by graft.Verify plus oracle_sql.json, re-runs each oracle
in DuckDB over the same sf tables, and strictly compares (columns
sorted by name, rows sorted, values stringified)."""
import json, sys, glob, os
import duckdb
import decimal, datetime

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float): return repr(v)
    if isinstance(v, decimal.Decimal): return str(v)
    if isinstance(v, datetime.datetime): return v.isoformat()
    if isinstance(v, datetime.date): return v.isoformat()
    if isinstance(v, bytes): return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def badtypes(sql):
    """Output-type lint: DECIMAL and HUGEINT stringify differently
    depending on which reader path touches them (Decimal('1.50') vs
    float 1.5; hugeint->float64 '5.0' vs int64 '5'), so the driver's
    asymmetric normalization flags equal values as hash mismatches.
    Only BIGINT/INT/DOUBLE/VARCHAR/DATE-shaped outputs are safe."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if "DECIMAL" in r[1] or "HUGEINT" in r[1]]

def typefam(t):
    """Collapse concrete types to stringification families: a Spark
    output whose column lands in a DIFFERENT family than the oracle's
    (e.g. DOUBLE vs BIGINT -> '5.0' vs '5') hash-mismatches on equal
    values. Same-family width differences (INT vs BIGINT) are safe."""
    t = t.upper()
    if "DECIMAL" in t or "HUGEINT" in t: return "unsafe"
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"): return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"): return "float"
    if t.startswith("TIMESTAMP"): return "timestamp"
    return t

def typedrift(name, spark_sql, oracle_sql):
    """Lint: per-column (sorted by name) stringification-family diff
    between the Spark dump and the oracle output."""
    s = {r[0]: typefam(r[1]) for r in con.execute(f"DESCRIBE {spark_sql}").fetchall()}
    o = {r[0]: typefam(r[1]) for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()}
    return [(c, s[c], o[c]) for c in sorted(set(s) & set(o)) if s[c] != o[c]]

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    res_dir = f"{OUT_DIR}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name} (no parquet dump)"); fail += 1; continue
    try:
        bt = badtypes(oracle[name]) + \
             badtypes(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        if bt:
            print(f"TYPES    {name}: unsafe output types {bt}"); fail += 1; continue
        td = typedrift(name, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')",
                       oracle[name])
        if td:
            print(f"TYPEDRIFT {name}: (col, spark, oracle) {td}"); fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        gc, gr = canon([d[0] for d in got.description], got.fetchall())
        want = con.execute(oracle[name])
        wc, wr = canon([d[0] for d in want.description], want.fetchall())
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    if gc != wc:
        print(f"SCHEMA   {name}: spark={gc} oracle={wc}"); fail += 1; continue
    if len(gr) != len(wr):
        print(f"ROWS     {name}: spark={len(gr)} oracle={len(wr)}"); fail += 1; continue
    if gr != wr:
        bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
        print(f"HASH     {name}: first diff row {bad}:\n  spark : {gr[bad]}\n  oracle: {wr[bad]}")
        fail += 1; continue
    print(f"OK       {name} ({len(gr)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail / {len(oracle)} total")
sys.exit(1 if fail else 0)
