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


def opaque_map(sql):
    """Position map: True where the character is inside a
    single-quoted literal, a double-quoted identifier, a `--` line
    comment, or a `/* */` block comment — all opaque to the call-site
    scan (an apostrophe in a comment or a quote in an identifier must
    not flip the literal state and corrupt arity detection). Raises if
    a single-quoted literal is left open at end of string (a scan that
    silently mis-tracked state could miss a live tie)."""
    opq = [False] * len(sql)
    lit = False
    k = 0
    while k < len(sql):
        c = sql[k]
        if lit:
            opq[k] = True
            if c == "'":
                if k + 1 < len(sql) and sql[k + 1] == "'":
                    opq[k + 1] = True
                    k += 2
                    continue
                lit = False
            k += 1
            continue
        if c == "'":
            lit = True
            opq[k] = True
            k += 1
            continue
        if c == '"':  # double-quoted identifier: opaque to the scan
            j = sql.find('"', k + 1)
            j = len(sql) - 1 if j < 0 else j
            for p in range(k, j + 1):
                opq[p] = True
            k = j + 1
            continue
        if c == "-" and sql[k:k + 2] == "--":
            j = sql.find("\n", k)
            j = len(sql) - 1 if j < 0 else j
            for p in range(k, j + 1):
                opq[p] = True
            k = j + 1
            continue
        if c == "/" and sql[k:k + 2] == "/*":
            j = sql.find("*/", k)
            j = len(sql) - 2 if j < 0 else j
            for p in range(k, j + 2):
                opq[p] = True
            k = j + 2
            continue
        k += 1
    if lit:
        raise ValueError("unterminated single-quoted literal in oracle "
                         "SQL — scan state corrupt, refusing to probe")
    return opq


def rewrite_two_arg_rounds(sql):
    """Replace every 2-arg `round(x, n)` call with `round_even(x, n)`,
    leaving 1-arg `round(x)` untouched (paren-balance scan — a regex
    cannot see nesting). Literals/identifiers/comments are opaque to
    the scan: a '(' / ')' / ',' inside them must not move the depth
    or arity."""
    opq = opaque_map(sql)
    # single pre-computed match list (the per-occurrence finditer
    # restart was O(n·m)); matches inside opaque spans are skipped
    matches = [m for m in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE)
               if not opq[m.start()]]
    out = []
    i = 0
    for m in matches:
        if m.start() < i:  # inside a previously consumed span (cannot
            continue       # happen for non-overlapping calls; guard)
        start = m.start()
        open_p = m.end()  # index just past '('
        depth = 1
        top_comma = False
        j = open_p
        while j < len(sql) and depth > 0:
            if opq[j]:
                j += 1
                continue
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = True
            j += 1
        out.append(sql[i:start])
        out.append("round_even(" if top_comma else "round(")
        i = open_p
    out.append(sql[i:])
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
    n_tie = n_clean = n_skip = n_warn = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        # Interpolation-convention probe (VERDICT r10 #7): any oracle
        # still carrying quantile_cont is evaluated under the witness
        # (rank-selection / quantile_disc) convention too — a cell
        # difference means the output is sensitive to the engine's
        # interpolation formula, the construct class the r10 gate
        # split. Presence without a cell diff is a warning (the
        # discipline prefers witness spellings outright).
        if re.search(r"\bquantile_cont\s*\(", sql, re.IGNORECASE):
            alt_q = re.sub(r"\bquantile_cont\s*\(", "quantile_disc(",
                           sql, flags=re.IGNORECASE)
            try:
                base_q = canon(con.sql(sql).fetch_arrow_table())
                alt_qr = canon(con.sql(alt_q).fetch_arrow_table())
            except Exception as e:
                print(f"ERR  {name}: interp probe: {e}")
                n_tie += 1
                continue
            if base_q[1] != alt_qr[1]:
                print(f"TIE  {name}: quantile_cont cells differ under "
                      "the witness (disc) convention — interpolation-"
                      "sensitive output")
                n_tie += 1
                continue
            print(f"WARN {name}: quantile_cont present (convention-"
                  "sensitive construct; prefer witness/disc spelling)")
            n_warn += 1
        if not re.search(r"\bround\s*\(", sql, re.IGNORECASE):
            n_skip += 1
            continue
        try:
            # inside the try: opaque_map raises on an unterminated
            # literal, and one malformed oracle must cost one ERR line,
            # not the whole sweep (review r11)
            alt_sql = rewrite_two_arg_rounds(sql)
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
    print(f"== {n_clean} tie-free, {n_tie} live ties, {n_warn} "
          f"quantile_cont warnings, {n_skip} without round() ==")
    sys.exit(1 if n_tie else 0)


if __name__ == "__main__":
    main()
