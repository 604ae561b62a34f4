#!/usr/bin/env python3
"""Merge N single-run Bench JSON lines into the committed attestation:
per-query MEDIAN, total = sum of medians, calib = median calib.

Usage: python3 scripts/bench_median.py out.json run1.json run2.json run3.json
"""
import json
import statistics
import sys


def main():
    out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    medians = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        medians[n] = statistics.median(vals)
    merged = {
        "metric": "total",
        "value": sum(medians.values()),
        "unit": "sec",
        "queries": medians,
        "sf": runs[0].get("sf"),
        "calib_sec": statistics.median(r["calib_sec"] for r in runs),
        "runs": len(runs),
        "run_totals": [r["value"] for r in runs],
        "run_calibs": [r["calib_sec"] for r in runs],
    }
    json.dump(merged, open(out, "w"), indent=1)
    print(f"{out}: {merged['value']:.1f}s over {len(medians)} queries, "
          f"calib {merged['calib_sec']:.3f} -> "
          f"{merged['value'] / merged['calib_sec'] / len(medians):.3f} u/q")


if __name__ == "__main__":
    main()
