#!/usr/bin/env python3
"""Analyze the r9-vs-r10 same-window A/B (bench_history/r11_ab_*.json).

Decomposes the r9->r10 common-gate delta into:
  - contention drift (r9_pass1 vs r9_pass2 bracket)
  - the TrackedPersist honest-cold correction (r10_drain vs r10_nodrain)
  - residue per gate (r10_drain vs mean of the r9 brackets)
Prints the gates whose same-window delta exceeds the threshold.
"""
import json, sys

def load(name):
    with open(f"bench_history/r11_ab_{name}.json") as f:
        return json.load(f)["queries"]

thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.10
r9a, r9b = load("r9_pass1"), load("r9_pass2")
r10, r10n = load("r10_drain"), load("r10_nodrain")
common = sorted(set(r9a) & set(r10))
print(f"common gates: {len(common)}")

tot = lambda d: sum(d[q] for q in common)
t9a, t9b, t10, t10n = tot(r9a), tot(r9b), tot(r10), tot(r10n)
print(f"r9 pass1 {t9a:8.1f}s   r9 pass2 {t9b:8.1f}s   "
      f"bracket drift {abs(t9a-t9b)/min(t9a,t9b)*100:.1f}%")
print(f"r10 drain {t10:7.1f}s   r10 NOdrain {t10n:7.1f}s   "
      f"honest-cold correction {t10-t10n:+.1f}s")
r9m = {q: (r9a[q] + r9b[q]) / 2 for q in common}
t9m = sum(r9m.values())
print(f"r10/r9 same-window ratio (drain):   {t10/t9m:.3f}")
print(f"r10/r9 same-window ratio (nodrain): {t10n/t9m:.3f}")

# canaries
for q in ("q01_filter_project", "q14_window_rank", "q05_groupby_agg"):
    if q in common:
        print(f"canary {q}: r9 {r9m[q]:.2f}s  r10 {r10[q]:.2f}s")

print(f"\ngates with |r10_drain - r9_mean| / r9_mean > {thresh:.0%} "
      "and delta > 0.15s:")
rows = []
for q in common:
    d = r10[q] - r9m[q]
    if abs(d) / max(r9m[q], 1e-9) > thresh and abs(d) > 0.15:
        nd = r10n[q] - r9m[q]
        rows.append((d, q, r9m[q], r10[q], r10n[q], nd))
rows.sort(reverse=True)
print(f"{'gate':30s} {'r9mean':>7s} {'r10':>7s} {'r10nod':>7s} "
      f"{'delta':>7s} {'nodrain_delta':>13s}")
for d, q, a, b, c, nd in rows:
    print(f"{q:30s} {a:7.2f} {b:7.2f} {c:7.2f} {d:+7.2f} {nd:+13.2f}")
print(f"\nsum of listed deltas: {sum(r[0] for r in rows):+.1f}s "
      f"of total {t10-t9m:+.1f}s")
