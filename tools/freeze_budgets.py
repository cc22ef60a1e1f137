#!/usr/bin/env python3
"""Re-freeze tools/bench_budget.json from two clean full-bench dumps.

Usage: python3 tools/freeze_budgets.py runA.json runB.json "source note"

Per the budget re-freeze protocol (.claude/skills/verify/SKILL.md):
per-query MAX of TWO clean exclusive full benches, never single or
loaded-host runs — and BOTH input dumps must be committed to the repo
(BENCH_full_r{N}*.json) so the freeze is reproducible from artifacts.

Input shape: target/bench_full.json. Two accepted per-query forms:
  legacy (pre-r12):  {"queries": {name: sec}, "value": total}
  telemetry (r12+):  {"queries": {name: {"s": sec, "gc": sec,
                      "load": avg}}, "value": total, ...}
Budgets are the wall seconds ("s") either way. A per-query gc >= ~0.15 s
on a trivial query is the GC-contamination signature — reject that run
rather than freezing its max (r12 ADVICE: f_root_mean_square froze a
7.75x GC-spiked value). Bench's flag logic floors every budget at 0.5 s
(max(frozen, 0.5)), so sub-second entries here are informational.
"""
import json, os, subprocess, sys

# Freeze-protocol enforcement (r13 verdict #8): both input dumps must be
# committed so the freeze is reproducible from repo artifacts alone.
for path in (sys.argv[1], sys.argv[2]):
    rel = os.path.relpath(os.path.abspath(path), os.getcwd())
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", rel],
        capture_output=True).returncode == 0
    dirty = tracked and subprocess.run(
        ["git", "diff", "--quiet", "HEAD", "--", rel],
        capture_output=True).returncode != 0
    if not tracked or dirty:
        sys.exit(f"freeze_budgets: refusing uncommitted input {path!r} — "
                 "commit both full-bench dumps (BENCH_full_r{N}*.json) "
                 "first; the freeze must be reproducible from committed "
                 "artifacts (budget re-freeze protocol).")

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
note = sys.argv[3] if len(sys.argv) > 3 else ""
# r12+ full-bench maps carry telemetry per query ({"s":..,"gc":..,"load":..});
# budgets are the wall seconds either way
def secs(q):
    return {k: (v["s"] if isinstance(v, dict) else v) for k, v in q.items()}
def gcs(q):
    return {k: (v.get("gc", 0.0) if isinstance(v, dict) else 0.0)
            for k, v in q.items()}
qa, qb = secs(a["queries"]), secs(b["queries"])
ga, gb = gcs(a["queries"]), gcs(b["queries"])
assert set(qa) == set(qb), f"query sets differ: {set(qa) ^ set(qb)}"
def pick(k):
    """Per-query max — unless the slower sample carries the
    GC-contamination signature (>=1.5x slower AND its in-query GC
    exceeds the faster sample's by >=0.15 s), in which case freeze
    the clean sample instead of baking the spike into the budget
    (r12 ADVICE: f_root_mean_square froze a 7.75x GC-spiked max)."""
    (s_lo, g_lo), (s_hi, g_hi) = sorted([(qa[k], ga[k]), (qb[k], gb[k])])
    if s_hi >= 1.5 * s_lo and g_hi - g_lo >= 0.15:
        print(f"  gc-spike rejected on {k}: {s_hi:.3f}s (gc {g_hi:.3f}) "
              f"-> froze {s_lo:.3f}s (gc {g_lo:.3f})")
        return s_lo
    return s_hi
queries = {k: round(pick(k), 3) for k in sorted(qa)}
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
