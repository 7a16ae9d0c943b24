#!/usr/bin/env python3
"""Board-cost ledger (round-15 verdict #3): summarize bench_out.json into
the cost table ARCHITECTURE.md carries — total pass cost vs the bench
budget, cost buckets, and the heaviest queries (the ones a new query
must not join: the per-query cost budget for NEW queries is <= 1 s at
sf0.1). Dev-loop tool only (drives no engine code).

Usage: python3 tools/board_ledger.py [bench_out.json]
"""
import json, sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
d = json.load(open(path))
qs = {k: v for k, v in d["queries"].items() if v >= 0}
n = len(qs)
total = sum(qs.values())
budget = 1500
buckets = [(0.5, 0), (1.0, 0), (2.0, 0), (5.0, 0), (float("inf"), 0)]
labels = ["<0.5s", "0.5-1s", "1-2s", "2-5s", ">=5s"]
counts = [0] * 5
for v in qs.values():
    for i, (hi, _) in enumerate(buckets):
        if v < hi:
            counts[i] += 1
            break
print(f"queries timed: {n} (skipped {len(d.get('skipped', []))}, "
      f"failed {len(d.get('failed', []))}, single_pass {len(d.get('single_pass', []))})")
print(f"one-pass board cost: {total:.1f}s = {100*total/budget:.0f}% of the {budget}s budget")
print("cost buckets: " + ", ".join(f"{l}: {c}" for l, c in zip(labels, counts)))
print("heaviest 15:")
for k, v in sorted(qs.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {k:32s} {v:7.2f}s")
over = [k for k, v in qs.items() if v > 5.0]
print(f"queries over the 5s watch line: {len(over)}")
