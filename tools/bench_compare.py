#!/usr/bin/env python3
"""Compare two Bench JSON lines per-query (dev tool).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_flag]

Each file holds one Bench output line (optionally sbt-prefixed with
"[info] "). Prints per-query ratios new/old sorted descending and flags
queries above ratio_flag (default 1.5).
"""
import json
import sys


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


old, new = load(sys.argv[1]), load(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
oq, nq = old["queries"], new["queries"]
if not oq or not nq:
    raise SystemExit("empty queries map in one of the inputs")


def ratio(q):
    return nq[q] / oq[q] if oq[q] else float("inf")


common = sorted(set(oq) & set(nq), key=ratio, reverse=True)
flagged = []
for q in common:
    r = ratio(q)
    mark = " <-- FLAG" if r > flag else ""
    if r > flag:
        flagged.append(q)
    print(f"{q:32s} {oq[q]:7.3f}s -> {nq[q]:7.3f}s  x{r:.2f}{mark}")
only_new = sorted(set(nq) - set(oq))
if only_new:
    print("\nnew-only queries:")
    for q in only_new:
        print(f"{q:32s} {nq[q]:7.3f}s")
print(f"\ntotals: old={old['value']:.1f}s/{len(oq)}q "
      f"({old['value']/len(oq):.3f}s/q)  "
      f"new={new['value']:.1f}s/{len(nq)}q ({new['value']/len(nq):.3f}s/q)")
print(f"flagged >{flag}x: {flagged if flagged else 'none'}")
