#!/usr/bin/env python3
"""Time the DuckDB oracle SQL of named queries at an sf dir (dev tool).

Mirrors the baseline-comparison discipline: 32 threads, min-of-2 per
query, views created by scaled_views (so "@k" dirs work). Usage:

    python3 scripts/duck_time.py <sfDir> <verifyOutDir> name [name ...]

<verifyOutDir> must contain oracle_sql.json (a graft.Verify dump).
"""
import json
import sys
import time

import duckdb

from scaled_views import create_views


def main():
    sf_dir, out_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    create_views(con, sf_dir)
    total = 0.0
    for n in names:
        sql = oracle[n]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        total += best
        print(f"{n:32s} {best:7.3f} s")
    print(f"{'total':32s} {total:7.3f} s")


if __name__ == "__main__":
    main()
