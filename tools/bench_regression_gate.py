"""Spread-aware bench regression gate (r17, VERDICT r16 #5).

Usage: python3 tools/bench_regression_gate.py <old_BENCH_LOCAL.json> <new_BENCH_LOCAL.json>
       [--floor SECONDS] [--max-spread SECONDS]

Reads two BENCH_LOCAL-format maps (Bench.scala's output: per-query medians
in `queries`, per-query 3-rep dispersion max-min in `spread`) and emits the
REGRESSION LIST the §7.2c close protocol adjudicates: a common query is
flagged iff its median moved by more than its own measured dispersion —
|new - old| > max(spread_old, spread_new, floor) — which is exactly the
"inside its own recorded 3-rep spread" call the r16 verdict made by hand.
The floor (default 0.25 s) keeps sub-noise absolute moves on sub-second
queries from flagging when a rep's spread happened to record near zero.

--max-spread S (r18, VERDICT r17 #7: the quiet-window protocol) rejects the
NEW map outright when its total recorded dispersion sum(spread_new) exceeds
S — a contended measurement window can't be adjudicated query-by-query, so
the close re-runs the bench instead of arguing with it. Exit code 2 marks
"window too hot, remeasure" as distinct from exit 1 "real regressions".

Prints a human table plus one machine-readable JSON line
{"regressions": [...], "improvements": [...], "added": [...], "removed":
[...], "common_sum_old": s, "common_sum_new": s, "spread_sum_new": s};
exits 1 iff regressions is non-empty (so the close can gate on it
mechanically), 2 iff the window fails --max-spread.
"""
import json
import sys

args = []
floor = 0.25
max_spread = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    # exact-match flags only (ADVICE r17: a prefix match silently ate
    # typos like --floors); any other --flag is a usage error
    for name in ("--floor", "--max-spread"):
        if a == name or a.startswith(name + "="):
            if "=" in a:
                val = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    sys.exit(f"{name} requires a value\n" + __doc__)
                val = float(argv[i + 1])
                i += 1
            if name == "--floor":
                floor = val
            else:
                max_spread = val
            break
    else:
        if a.startswith("--"):
            sys.exit(f"unknown flag {a}\n" + __doc__)
        args.append(a)
    i += 1
if len(args) != 2:
    sys.exit(__doc__)

old, new = (json.load(open(p)) for p in args)
qo, qn = old["queries"], new["queries"]
so, sn = old.get("spread", {}), new.get("spread", {})
common = sorted(set(qo) & set(qn))
added = sorted(set(qn) - set(qo))
removed = sorted(set(qo) - set(qn))

spread_sum_new = round(sum(sn.values()), 3)
if max_spread is not None and spread_sum_new > max_spread:
    print(f"WINDOW TOO HOT: spread_sum_new {spread_sum_new} > "
          f"--max-spread {max_spread}; remeasure instead of adjudicating")
    # stable schema across both exit paths (ADVICE r18): the standard keys
    # ship empty/null so close tooling can parse the line unconditionally
    print(json.dumps({"window_rejected": True,
                      "spread_sum_new": spread_sum_new,
                      "max_spread": max_spread,
                      "regressions": [], "improvements": [],
                      "added": [], "removed": [],
                      "common_sum_old": None, "common_sum_new": None}))
    sys.exit(2)

regressions, improvements = [], []
for q in common:
    delta = qn[q] - qo[q]
    gate = max(so.get(q, 0.0), sn.get(q, 0.0), floor)
    if abs(delta) > gate:
        row = {"query": q, "old": qo[q], "new": qn[q],
               "delta": round(delta, 3), "gate": round(gate, 3),
               "spread_old": so.get(q), "spread_new": sn.get(q)}
        (regressions if delta > 0 else improvements).append(row)
regressions.sort(key=lambda r: -r["delta"])
improvements.sort(key=lambda r: r["delta"])

sum_old = round(sum(qo[q] for q in common), 3)
sum_new = round(sum(qn[q] for q in common), 3)
ratio = f"{sum_new / sum_old:.3f}x" if sum_old else "n/a (no common queries)"
print(f"common {len(common)} queries: sum {sum_old} -> {sum_new} "
      f"({ratio}); added {len(added)}, removed {len(removed)}; "
      f"spread_sum_new {spread_sum_new}")
for title, rows in (("REGRESSIONS (|delta| > own spread)", regressions),
                    ("improvements", improvements)):
    print(f"\n{title}: {len(rows)}")
    for r in rows:
        print(f"  {r['query']:40s} {r['old']:8.3f} -> {r['new']:8.3f} "
              f"(delta {r['delta']:+7.3f}, gate {r['gate']:.3f})")
print()
print(json.dumps({"regressions": regressions, "improvements": improvements,
                  "added": added, "removed": removed,
                  "common_sum_old": sum_old, "common_sum_new": sum_new,
                  "spread_sum_new": spread_sum_new}))
sys.exit(1 if regressions else 0)
