#!/usr/bin/env python3
"""Registry scaling-trend report (r13 verdict #4): compare two full-bench
per-query maps taken at two scale factors (e.g. sf0.1 and sf1 = 10x data)
and flag super-linear queries.

Usage: python3 tools/scaling_report.py bench_sf01.json bench_sf1.json [flag_ratio]

A 10x data step on a fixed 32-core box should cost <= ~12x wall for a
linear-work query (10x work + shuffle/constant overheads); queries above
the flag ratio are listed as plan-defect candidates for adjudication.
Sub-second sf0.1 walls are noise-floored at 0.3 s before the ratio so
fixed session/job overheads don't read as super-linear scaling.
"""
import json, sys

a = json.load(open(sys.argv[1]))  # smaller sf
b = json.load(open(sys.argv[2]))  # larger sf
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

def secs(q):
    return {k: (v["s"] if isinstance(v, dict) else v) for k, v in q.items()}

qa, qb = secs(a["queries"]), secs(b["queries"])
common = sorted(set(qa) & set(qb))
rows = []
for k in common:
    base = max(qa[k], 0.3)
    rows.append((qb[k] / base, qa[k], qb[k], k))
rows.sort(reverse=True)

print(f"{'ratio':>7} {'sf0.1 s':>8} {'sf1 s':>8}  query")
for r, s0, s1, k in rows[:30]:
    mark = " <-- FLAG" if r > flag else ""
    print(f"{r:7.1f} {s0:8.2f} {s1:8.2f}  {k}{mark}")
n_flag = sum(1 for r, _, _, _ in rows if r > flag)
tot_a = sum(qa[k] for k in common)
tot_b = sum(qb[k] for k in common)
print(f"\ntotals: {tot_a:.1f} s -> {tot_b:.1f} s ({tot_b / tot_a:.1f}x) over "
      f"{len(common)} queries; {n_flag} flagged above {flag}x")
