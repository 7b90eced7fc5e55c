#!/usr/bin/env python3
"""Self-archive the parsed bench into the round archive.

The driver's per-round BENCH_r{N}.json stores only a truncated tail of
the bench JSON line ("parsed": null on long runs), while the full parsed
run always lands in BENCH_LATEST.json. Run this at round open (for the
previous round's archive) or after a local driver-equivalent run:

    python3 tools/archive_bench.py <round>

It rewrites BENCH_r{N}.json as the COMPLETE parsed object (metric /
value / queries / medians / sf) plus the round number, preserving any
driver-recorded metadata fields (rc, cpus) when the old archive exists.
Idempotent: re-running on an already-complete archive is a no-op apart
from re-sorting keys.
"""
import json
import os
import sys


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__, file=sys.stderr)
        return 2
    n = int(sys.argv[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_path = os.path.join(repo, "BENCH_LATEST.json")
    round_path = os.path.join(repo, f"BENCH_r{n:02d}.json")
    if not os.path.exists(round_path):
        round_path = os.path.join(repo, f"BENCH_r{n}.json")
    with open(latest_path) as f:
        latest = json.load(f)
    meta = {}
    if os.path.exists(round_path):
        with open(round_path) as f:
            old = json.load(f)
        meta = {k: old[k] for k in ("n", "rc", "cpus") if k in old}
    meta.setdefault("n", n)
    out = dict(meta)
    out.update(latest)
    with open(round_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    nq = len(latest.get("queries", {}))
    print(f"wrote {round_path}: {nq} queries, total={latest.get('value')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
