#!/usr/bin/env python3
"""Adjudicate bench regressions: driver single run vs committed attestation.

The driver overwrites bench.json with a SINGLE run each round; the builder
commits a quiet-window median-of-3 as bench_attestation.json. A query only
counts as a real regression if it is >THRESH x the baseline's calib-
normalized per-query units in BOTH files - a spike in just one is host
phase (see BASELINE.md round-7g note).

Usage:
  python3 scripts/bench_diff.py BASELINE.json bench.json bench_attestation.json
  (any bench-format JSON works as baseline, e.g. the prior round's
   bench_attestation.json or a BENCH_r{N}.json)
"""
import json
import sys

THRESH = 2.0


def load(path):
    with open(path) as f:
        d = json.load(f)
    calib = d.get("calib_sec") or 1.0
    return {q: t / calib for q, t in d.get("queries", {}).items()}, d


def main(base_path, driver_path, attest_path):
    base, _ = load(base_path)
    driver, dmeta = load(driver_path)
    attest, ameta = load(attest_path)

    both, driver_only, attest_only = [], [], []
    for q, b in sorted(base.items()):
        if b <= 0:
            continue
        rd = driver.get(q, 0) / b if q in driver else None
        ra = attest.get(q, 0) / b if q in attest else None
        d_hot = rd is not None and rd > THRESH
        a_hot = ra is not None and ra > THRESH
        if d_hot and a_hot:
            both.append((q, rd, ra))
        elif d_hot:
            driver_only.append((q, rd))
        elif a_hot:
            attest_only.append((q, ra))

    print(f"baseline={base_path} ({len(base)} q)  "
          f"driver={driver_path} ({len(driver)} q)  "
          f"attestation={attest_path} ({len(attest)} q)  thresh={THRESH}x")
    print(f"host-phase (driver-only >{THRESH}x, ignore): {len(driver_only)}")
    print(f"attestation-only >{THRESH}x (investigate): {len(attest_only)}")
    for q, ra in attest_only:
        print(f"  {q}: {ra:.2f}x in attestation")
    print(f"REAL regressions (>{THRESH}x in BOTH): {len(both)}")
    for q, rd, ra in both:
        print(f"  {q}: driver {rd:.2f}x, attestation {ra:.2f}x")
    return 1 if both else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) != 3:
        sys.exit(__doc__)
    sys.exit(main(*args))
