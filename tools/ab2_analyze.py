#!/usr/bin/env python3
"""Analyze the r10-vs-r11 same-window A/B (bench_history/r11_ab2_*)."""
import json

def load(name):
    with open(f"bench_history/r11_ab2_{name}.json") as f:
        return json.load(f)["queries"]

r10a, head, r10b = load("r10_a"), load("head"), load("r10_b")
common = sorted(set(r10a) & set(head))
tot = lambda d: sum(d[q] for q in common)
ta, th, tb = tot(r10a), tot(head), tot(r10b)
r10m = {q: (r10a[q] + r10b[q]) / 2 for q in common}
tm = sum(r10m.values())
print(f"common gates {len(common)}: r10_a {ta:.1f}s  head {th:.1f}s  "
      f"r10_b {tb:.1f}s  bracket drift {abs(ta-tb)/min(ta,tb)*100:.1f}%")
print(f"head/r10_mean ratio: {th/tm:.3f}")
print(f"head new-gate cost: "
      f"{sum(v for q, v in head.items() if q not in r10a):.2f}s "
      f"({[q for q in head if q not in r10a]})")
for q in ("q01_filter_project", "q05_groupby_agg"):
    print(f"canary {q}: r10 {r10m[q]:.2f}s  head {head[q]:.2f}s")
print("\nbiggest movers (head - r10_mean):")
rows = sorted(((head[q] - r10m[q], q) for q in common))
for d, q in rows[:10] + [("...", "...")] + rows[-6:]:
    if q == "...":
        print("...")
    else:
        print(f"{q:32s} r10 {r10m[q]:6.2f} head {head[q]:6.2f} {d:+6.2f}")
