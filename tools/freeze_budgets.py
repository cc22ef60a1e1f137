#!/usr/bin/env python3
"""Re-freeze tools/bench_budget.json from two clean full-bench dumps.

Usage: python3 tools/freeze_budgets.py runA.json runB.json "source note"

Per the budget re-freeze protocol (.claude/skills/verify/SKILL.md):
per-query MAX of TWO clean exclusive full benches, never single or
loaded-host runs. Both inputs are target/bench_full.json-shaped
({"queries": {name: sec}, "value": total}).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
note = sys.argv[3] if len(sys.argv) > 3 else ""
# r12+ full-bench maps carry telemetry per query ({"s":..,"gc":..,"load":..});
# budgets are the wall seconds either way
def secs(q):
    return {k: (v["s"] if isinstance(v, dict) else v) for k, v in q.items()}
qa, qb = secs(a["queries"]), secs(b["queries"])
assert set(qa) == set(qb), f"query sets differ: {set(qa) ^ set(qb)}"
queries = {k: round(max(qa[k], qb[k]), 3) for k in sorted(qa)}
out = {
    "source": note or (
        f"per-query max of two clean benches ({a['value']:.1f} s and "
        f"{b['value']:.1f} s totals, {len(queries)} queries)"),
    "total_sec": round(max(a["value"], b["value"]), 1),
    "queries": queries,
}
with open("tools/bench_budget.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"froze {len(queries)} budgets, total {out['total_sec']} s")
