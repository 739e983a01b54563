#!/usr/bin/env python3
"""Combine Spark bench_detail + DuckDB bench_scale timings at several
scale points into the committed scale-proof artifact (dev tool).

Usage:
    python3 scripts/scale_report.py out.json \
        1x spark_1x.json duck_1x.json \
        3x spark_3x.json duck_3x.json \
        10x spark_10x.json duck_10x.json

Emits one JSON with per-query times/ratios per scale point plus
suite-level growth, and prints the markdown summary table to stdout.
"""
import json
import sys


def load_point(spark_path, duck_path):
    sd = json.load(open(spark_path))
    dd = json.load(open(duck_path))
    spark = {k: min(v["runs"]) for k, v in sd["diag"].items()
             if not v.get("failed")}
    duck = {k: v.get("min_s") for k, v in dd["queries"].items()}
    dnf = [k for k, v in dd["queries"].items() if v.get("timeout")]
    return {"spark": spark, "duck": duck, "duck_dnf": dnf,
            "spark_sf": sd["sf"], "duck_sf": dd["sf"]}


def main():
    out_path = sys.argv[1]
    points = {}
    args = sys.argv[2:]
    for i in range(0, len(args), 3):
        label, sp, dp = args[i:i + 3]
        points[label] = load_point(sp, dp)

    labels = list(points)
    base = points[labels[0]]
    report = {"points": {}}
    for lab in labels:
        p = points[lab]
        both = [q for q in p["spark"] if p["duck"].get(q) is not None]
        spark_total = sum(p["spark"][q] for q in both)
        duck_total = sum(p["duck"][q] for q in both)
        per_q = {q: {"spark_s": round(p["spark"][q], 3),
                     "duck_s": round(p["duck"][q], 3),
                     "ratio": round(p["spark"][q] / max(p["duck"][q], 1e-9), 2)}
                 for q in sorted(both)}
        for q in p["duck_dnf"]:
            if q in p["spark"]:
                per_q[q] = {"spark_s": round(p["spark"][q], 3),
                            "duck_s": None, "duck_dnf": True}
        growth = {q: round(p["spark"][q] / max(base["spark"][q], 1e-9), 2)
                  for q in sorted(p["spark"]) if q in base["spark"]}
        report["points"][lab] = {
            "spark_sf": p["spark_sf"], "duck_sf": p["duck_sf"],
            "n_queries": len(p["spark"]),
            "spark_total_s": round(sum(p["spark"].values()), 1),
            "comparable_spark_s": round(spark_total, 1),
            "comparable_duck_s": round(duck_total, 1),
            "suite_ratio": round(spark_total / max(duck_total, 1e-9), 3),
            "duck_dnf": p["duck_dnf"],
            "max_spark_growth_vs_" + labels[0]:
                max(growth.values()) if growth else None,
            "queries": per_q,
        }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    print("| point | Spark (comparable) | DuckDB (comparable) | ratio | DuckDB DNF | max per-query Spark growth |")
    print("|---|---|---|---|---|---|")
    for lab in labels:
        r = report["points"][lab]
        print(f"| {lab} | {r['comparable_spark_s']} s | "
              f"{r['comparable_duck_s']} s | {r['suite_ratio']}x | "
              f"{len(r['duck_dnf'])} | "
              f"{r['max_spark_growth_vs_' + labels[0]]}x |")


if __name__ == "__main__":
    main()
