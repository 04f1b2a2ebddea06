#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet result (written by
graft.Verify), runs the matching oracle SQL from oracle_sql.json in
DuckDB over views named after the parquet tables in <sfDir>, and
compares: row count, column names, and cell values (columns sorted by
name; exact equality, with a tiny epsilon report for floats).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return v
    return v


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # list cells compare elementwise (NaN-aware, recursive) — plain ==
    # makes any NaN-bearing array cell unequal to itself (ADVICE r1)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            cmp_cell(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            cmp_cell(v, b[k]) for k, v in a.items())
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            mine = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        mcols, ocols = sorted(mine.column_names), sorted(oracle.column_names)
        if mcols != ocols:
            print(f"FAIL {name}: columns {mcols} != {ocols}")
            n_fail += 1
            continue
        if mine.num_rows != oracle.num_rows:
            print(f"FAIL {name}: rows {mine.num_rows} != {oracle.num_rows}")
            n_fail += 1
            continue
        md = {c: mine.column(c).to_pylist() for c in mcols}
        od = {c: oracle.column(c).to_pylist() for c in ocols}
        bad = None
        for c in mcols:
            for i, (a, b) in enumerate(zip(md[c], od[c])):
                if not cmp_cell(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            eps = (abs(a - b) if isinstance(a, float) and isinstance(b, float)
                   and not (math.isnan(a) or math.isnan(b)) else "n/a")
            print(f"FAIL {name}: col={c} row={i} mine={a!r} oracle={b!r} "
                  f"absdiff={eps}")
            n_fail += 1
        else:
            mt = {f.name: str(f.type) for f in mine.schema}
            ot = {f.name: str(f.type) for f in oracle.schema}
            tnote = "" if mt == ot else f"  [type diff: {mt} vs {ot}]"
            print(f"PASS {name} ({mine.num_rows} rows){tnote}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
