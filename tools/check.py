#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir] [--partial]

Reads each <name>/ parquet dump written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names, NORMALIZED column types, and exact
values (columns sorted by name, rows sorted by all columns).

Types are compared after normalization, mirroring what the driver's
str(value)-per-cell hash can actually distinguish: all signed-int widths
print the same digits (indistinguishable), but HUGEINT degrades to
float64/object in pandas (str '123.0' != '123'), so HUGEINT vs BIGINT
stays a FAIL while INTEGER vs BIGINT passes.

--partial: a name-filtered Verify run dumps only a subset of queries but
always writes the FULL oracle map; with this flag, oracle entries with no
output directory are reported as a warning instead of failing the run.
Without it (a full-run check), missing outputs remain a FAIL.
"""
import sys, json, glob, os
import duckdb

partial = "--partial" in sys.argv
args = [a for a in sys.argv[1:] if a != "--partial"]
out = args[0] if len(args) > 0 else "/tmp/verify_out"
sf = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def key(r):
        return tuple("\0N" if r[i] is None else str(r[i]) for i in order)
    return sorted([tuple(r[i] for i in order) for r in rows],
                  key=lambda r: tuple("\0N" if v is None else str(v) for v in r))

fails = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1; continue
    got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
    got_cols, got = got_rel.columns, got_rel.fetchall()
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows (no oracle)")
        if len(got) == 0:
            print(f"  WARN {name}: zero rows");
        continue
    try:
        exp_rel = con.sql(oracle[name])
        exp_cols, exp = exp_rel.columns, exp_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fails += 1; continue
    # Normalize to what the driver's str(value)-per-cell compare can
    # distinguish: any signed-int width prints the same digits, so width
    # alone can't fail the driver, but HUGEINT degrades to float64/object
    # in pandas — str(123.0) != str(123) — so HUGEINT-vs-BIGINT IS a
    # driver failure. Compare as (name, normtype) multisets so duplicate
    # column names can't mask a mismatch.
    def norm(t):
        t = str(t)
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"):
            return "int64"
        if t in ("FLOAT", "DOUBLE"):
            return "float64"
        return t  # HUGEINT/UBIGINT/DECIMAL/... stay distinct on purpose
    got_nt = sorted((c, norm(t)) for c, t in zip(got_cols, got_rel.types))
    exp_nt = sorted((c, norm(t)) for c, t in zip(exp_cols, exp_rel.types))
    type_diffs = [(g[0], g[1], e[1])
                  for g, e in zip(got_nt, exp_nt) if g != e]
    if type_diffs:
        print(f"FAIL {name}: column type mismatch (spark vs oracle): "
              + ", ".join(f"{c}: {g} != {e}" for c, g, e in type_diffs))
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    g, e = canon(got, got_cols), canon(exp, exp_cols)
    if g != e:
        bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
        fails += 1; continue
    print(f"OK   {name}: {len(got)} rows")

missing = set(oracle) - set(names)
if missing and partial:
    print(f"WARN: oracle entries with no output (partial run): "
          f"{len(missing)} skipped")
elif missing:
    print(f"FAIL: oracle entries with no output: {sorted(missing)}"); fails += 1
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(names)} queries, {len(oracle)} oracles)")
sys.exit(1 if fails else 0)
