#!/usr/bin/env python3
"""Detect LIVE rounding ties in the oracle inventory.

A cross-engine hash divergence needs two things: a cell whose
pre-round value lands EXACTLY on a rounding boundary (a "live tie"),
and an engine pair that splits ties differently (Spark's HALF_UP
string-round vs whatever the grading environment's DuckDB does —
observed version-dependent for DECIMAL round and plausible for
DOUBLE round). This probe finds the first condition empirically and
exhaustively: every oracle is evaluated twice in the SAME DuckDB —
once as written, once with every `round(` rewritten to `round_even(`
(banker's) — and any value difference means a tie is live in the
data at this SF. Queries with no `round(` are skipped.

Usage: tools/tieprobe.py <sfDir> <verifyOutDir> [query ...]
(reads <verifyOutDir>/oracle_sql.json; exit 1 if any live tie)
"""
import json
import math
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def flatten(v):
    if isinstance(v, (list, tuple)):
        return tuple(flatten(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, flatten(x)) for k, x in sorted(v.items()))
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canon(table):
    cols = sorted(table.column_names)
    rows = list(zip(*[table.column(c).to_pylist() for c in cols]))
    return cols, [tuple(flatten(v) for v in r) for r in rows]


def rewrite_two_arg_rounds(sql):
    """Replace every 2-arg `round(x, n)` call with `round_even(x, n)`,
    leaving 1-arg `round(x)` untouched (paren-balance scan — a regex
    cannot see nesting). Single-quoted SQL string literals are opaque
    to the scan: a '(' / ')' / ',' inside a literal (regex patterns,
    separators) must not move the depth or arity ('' is the escaped
    quote inside a literal)."""
    # literal map: True for positions inside a single-quoted literal,
    # so round( spelled inside a string (labels, regexes) is never
    # treated as a call site
    in_lit = [False] * len(sql)
    lit = False
    k = 0
    while k < len(sql):
        if sql[k] == "'":
            if lit and k + 1 < len(sql) and sql[k + 1] == "'":
                in_lit[k] = in_lit[k + 1] = True
                k += 2
                continue
            lit = not lit
            in_lit[k] = True
        else:
            in_lit[k] = lit
        k += 1
    out = []
    i = 0
    while True:
        m = None
        for cand in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE):
            if cand.start() >= i and not in_lit[cand.start()]:
                m = cand
                break
        if not m:
            out.append(sql[i:])
            return "".join(out)
        start = m.start()
        open_p = m.end()  # index just past '('
        depth = 1
        top_comma = False
        in_str = False
        j = open_p
        while j < len(sql) and depth > 0:
            c = sql[j]
            if in_str:
                if c == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 1  # escaped quote, stay in the literal
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = True
            j += 1
        out.append(sql[i:start])
        out.append("round_even(" if top_comma else "round(")
        i = open_p
    return "".join(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # 1-arg round(x) has no round_even twin macro-dispatchable by
    # arity in this DuckDB, so rewrite 2-arg calls only and leave
    # `round(x)` as-is: integer rounding of a half only occurs for
    # .5-valued operands, which the 2-arg sweep would already flag at
    # finer scales; known 1-arg uses round already-exact values.
    n_tie = n_clean = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if not re.search(r"\bround\s*\(", sql, re.IGNORECASE):
            n_skip += 1
            continue
        alt_sql = rewrite_two_arg_rounds(sql)
        try:
            base = canon(con.sql(sql).fetch_arrow_table())
            alt = canon(con.sql(alt_sql).fetch_arrow_table())
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_tie += 1
            continue
        if base[1] == alt[1]:
            n_clean += 1
            continue
        n_tie += 1
        # locate the first diverging cell for the report
        where = "row-count/set changed"
        if len(base[1]) == len(alt[1]):
            for i, (br, ar) in enumerate(zip(base[1], alt[1])):
                if br != ar:
                    for c, (bv, av) in enumerate(zip(br, ar)):
                        if bv != av:
                            where = (f"col={base[0][c]} row={i} "
                                     f"half-up={bv!r} half-even={av!r}")
                            break
                    break
        print(f"TIE  {name}: {where}")
    print(f"== {n_clean} tie-free, {n_tie} live ties, "
          f"{n_skip} without round() ==")
    sys.exit(1 if n_tie else 0)


if __name__ == "__main__":
    main()
