#!/usr/bin/env python3
"""Time the DuckDB oracle set — the same-window baseline pair partner.

Usage: tools/duckbench.py <sfDir> <oracle_sql.json> [rounds=3]

Runs every oracle SQL entry against views over <sfDir>'s parquet
tables (32 threads), best-of-N per query, and prints one JSON line
mirroring graft.Bench's shape. Run immediately BEFORE and AFTER a
graft.Bench run: this host swings ±40% between windows, so only
same-window ratios are meaningful (BASELINE.md).
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fresh_connection(sfdir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con


def main():
    sfdir, oracle_json = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = fresh_connection(sfdir)
    sql = json.load(open(oracle_json))
    best = {}
    errors = {}
    # DUCK_TIMEOUT_SEC: per-query budget for scale-up runs (an sf1
    # oracle can be super-linear in DuckDB); on expiry the query is
    # interrupted and recorded as an error — "the oracle exceeded the
    # budget" is itself a datapoint. Unset (the driver's default
    # usage): no timeout, behavior unchanged.
    budget = float(os.environ.get("DUCK_TIMEOUT_SEC", "0") or 0)
    for r in range(rounds):
        for name in sorted(sql):
            if name in errors:
                continue
            # attempt 1 is reached only on a stale interrupt: the
            # query must end up in `best` or `errors` either way, so
            # the published total/n never silently under-count it
            for attempt in range(2):
                t0 = time.time()
                timer = None
                fired = threading.Event()
                done = threading.Event()
                if budget > 0:
                    # the done-gate closes the race where the timer
                    # fires AFTER execute() returns but BEFORE
                    # cancel() runs — a bare con.interrupt there would
                    # poison the NEXT query and falsely record it as a
                    # timeout
                    cur = con

                    def expire():
                        if not done.is_set():
                            fired.set()
                            cur.interrupt()

                    timer = threading.Timer(budget, expire)
                    timer.start()
                try:
                    con.execute(sql[name]).fetchall()
                except Exception as e:  # noqa: BLE001 - record, move on
                    msg = str(e)[:200]
                    if "INTERRUPT" in msg.upper():
                        if not fired.is_set():
                            # interrupted without OUR timer firing: a
                            # stale flag — rebuild the connection and
                            # retry THIS query once in place
                            con = fresh_connection(sfdir)
                            if attempt == 0:
                                print(f"[duckbench] r{r} {name} stale"
                                      " interrupt — reconnect + retry",
                                      file=sys.stderr, flush=True)
                                continue
                            msg = "stale interrupt twice"
                        else:
                            msg = f"timeout: exceeded {budget}s budget"
                            # the interrupt flag can outlive this
                            # statement; a clean connection protects
                            # the next query
                            con = fresh_connection(sfdir)
                    errors[name] = msg
                    # a query that succeeded in an earlier round but
                    # errors now must not stay in the total —
                    # `value`/`n` cover exactly the error-free set
                    best.pop(name, None)
                    print(f"[duckbench] r{r} {name} ERROR {msg}",
                          file=sys.stderr, flush=True)
                    break
                finally:
                    done.set()
                    if timer is not None:
                        timer.cancel()
                dt = time.time() - t0
                best[name] = min(best.get(name, float("inf")), dt)
                print(f"[duckbench] r{r} {name} {dt:.3f}s",
                      file=sys.stderr, flush=True)
                break
    out = {
        "metric": "duckdb_total",
        "value": round(sum(best.values()), 4),
        "unit": "sec",
        "n": len(best),
        "nerrors": len(errors),
        "queries": {k: round(v, 4) for k, v in sorted(best.items())},
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
