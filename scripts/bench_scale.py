#!/usr/bin/env python3
"""Time the DuckDB oracle suite on a (possibly scaled) sf dir (dev tool).

The Spark half of the scale-proof comes from `graft.Bench` with
SPARK_GRAFT_SF_DIR=<dir>@<k>; this is the DuckDB half — the same
oracle SQLs `compare.py` checks, timed per query on the SAME scaled
views (`scaled_views.py`, the exact twin of graft.Tables' @k
mapping). Usage:

    python3 scripts/bench_scale.py <sfDir[@k]> <oracle_sql.json> <out.json> \
        [--timeout 300] [--runs 2] [--threads 32]

Per-query wall seconds are min-of-N; a query that exceeds the timeout
is interrupted and recorded as {"timeout": true, "limit_s": ...} —
a DNF, not a number.
"""
import argparse
import json
import threading
import time

import duckdb

from scaled_views import create_views


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_json")
    ap.add_argument("out_json")
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threads", type=int, default=32)
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={args.threads}")
    create_views(con, args.sf_dir)
    with open(args.oracle_json) as f:
        oracle = json.load(f)

    results = {}
    for name, sql in sorted(oracle.items()):
        runs = []
        timed_out = False
        for _ in range(args.runs):
            timer = threading.Timer(args.timeout, con.interrupt)
            timer.start()
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
                runs.append(time.monotonic() - t0)
            except Exception as e:
                elapsed = time.monotonic() - t0
                if elapsed >= args.timeout * 0.95:
                    timed_out = True
                else:
                    results[name] = {"error": str(e)[:200]}
                break
            finally:
                timer.cancel()
            if runs and runs[-1] > 60:
                break  # one run is measurement enough past a minute
        if timed_out:
            results[name] = {"timeout": True, "limit_s": args.timeout,
                             "runs": runs}
            print(f"DNF  {name} (> {args.timeout:.0f}s)", flush=True)
        elif runs:
            results[name] = {"min_s": min(runs), "runs": runs}
            print(f"{min(runs):8.3f}s {name}", flush=True)
    ok = {k: v["min_s"] for k, v in results.items() if "min_s" in v}
    out = {"sf": args.sf_dir, "threads": args.threads,
           "total_s": sum(ok.values()), "n_ok": len(ok),
           "n_dnf": sum(1 for v in results.values() if v.get("timeout")),
           "queries": results}
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\ntotal {out['total_s']:.1f}s over {out['n_ok']} queries, "
          f"{out['n_dnf']} DNF -> {args.out_json}")


if __name__ == "__main__":
    main()
