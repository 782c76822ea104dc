#!/usr/bin/env python3
"""Compare two bench_times.json files (full-line format with `queries`).

Usage: tools/bench_diff.py BEFORE.json AFTER.json [min_sec]
Prints per-query before/after/ratio sorted by absolute delta, plus totals.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.loads(f.readline())


def main():
    a = load(sys.argv[1])
    b = load(sys.argv[2])
    min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    qa, qb = a["queries"], b["queries"]
    common = [k for k in qa if k in qb and qa[k] >= 0 and qb[k] >= 0]
    rows = [(qa[k] - qb[k], qa[k], qb[k], k) for k in common
            if max(qa[k], qb[k]) >= min_sec]
    rows.sort(reverse=True)
    print(f"{'query':34s} {'before':>8s} {'after':>8s} {'delta':>8s} {'ratio':>6s}")
    for d, x, y, k in rows:
        r = y / x if x > 0 else float('inf')
        print(f"{k:34s} {x:8.3f} {y:8.3f} {d:+8.3f} {r:6.2f}")
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(f"\ncommon {len(common)}: before {ta:.1f}s after {tb:.1f}s "
          f"ratio {tb/ta:.3f}  (before contaminated={a.get('contaminated')}, "
          f"after contaminated={b.get('contaminated')})")


if __name__ == "__main__":
    main()
