#!/usr/bin/env python3
"""Fold N full-run bench_times.json files into the BASELINE.md recorded
table: per-query median across runs, sorted descending, markdown rows.

Usage: sitting_table.py runA.json runB.json runC.json [--compare prev_section_extract]
Prints the table plus sitting summary stats (totals, loadavg, spread of
the worst >1 s query, code-cache occupancy).
"""
import json, statistics, sys

paths = [p for p in sys.argv[1:] if not p.startswith("--")]
runs = [json.load(open(p)) for p in paths]
names = set(runs[0]["queries"])
for r in runs[1:]:
    assert set(r["queries"]) == names, "runs cover different registries"
med = {n: statistics.median(r["queries"][n] for r in runs) for n in names}
print("totals:", ", ".join(f"{r['value']:.1f}" for r in runs))
print("loadavg1_start:", ", ".join(str(r["loadavg1_start"]) for r in runs),
      "contaminated:", [r["contaminated"] for r in runs])
print("gc_total:", ", ".join(f"{r['gc_total_sec']:.0f}" for r in runs),
      "codecache:", ", ".join(f"{r.get('codecache_used_mb', -1):.0f}" for r in runs))
print("medians sum: %.1f over %d queries" % (sum(med.values()), len(med)))
# worst >1s spread across runs
worst = (None, 0.0)
for n in names:
    vals = [r["queries"][n] for r in runs]
    if max(vals) >= 1.0 and min(vals) > 0:
        sp = max(vals) / min(vals)
        if sp > worst[1]:
            worst = (n, sp)
print("worst >1s spread: %s %.2fx" % worst)
for k in ("multimodal_meta", "multimodal_features"):
    vals = [r["queries"][k] for r in runs]
    print("%s runs: %s  spread %.2fx" %
          (k, " ".join(f"{v:.2f}" for v in vals), max(vals) / min(vals)))
print()
for n in sorted(med, key=lambda n: -med[n]):
    print(f"| {n} | {med[n]:.2f} |")
