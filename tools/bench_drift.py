#!/usr/bin/env python3
"""Separate host contention from plan regressions in a bench run.

Usage: tools/bench_drift.py BENCH_rN.json [BENCH_FULL.json] [ratio]

Compares each per-query time in a (driver) bench JSON against the
committed idle-host snapshot (BENCH_FULL.json, written only by full
registry runs). A query whose time exceeds `ratio` (default 2.5) times
its committed time is flagged SUSPECTED-CONTENTION: the plan did not
change between the two runs, so a gap that size is load, not code.
When the snapshot carries raw per-pass times ("passes"), a large
pass1/pass2 spread inside the snapshot itself is reported too — that
query is variance-prone even idle.

Diagnostic only: always exits 0.
"""
import json
import sys


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    full_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5

    bench = json.load(open(bench_path))
    full = json.load(open(full_path))
    committed = full.get("queries", {})

    flagged = []
    for q, t in sorted(bench.get("queries", {}).items()):
        if q.startswith("_") or t is None:
            continue
        c = committed.get(q)
        if c and t > ratio * c:
            flagged.append((q, t, c, t / c))

    if flagged:
        print(f"SUSPECTED CONTENTION (> {ratio}x committed idle-host time):")
        for q, t, c, r in sorted(flagged, key=lambda x: -x[3]):
            print(f"  {q}: {t:.2f}s vs committed {c:.2f}s ({r:.1f}x)")
        excess = sum(t - c for _, t, c, _ in flagged)
        print(f"  total excess over committed: {excess:.2f}s")
    else:
        print(f"no query exceeds {ratio}x its committed time")

    spreads = []
    for q, ps in full.get("passes", {}).items():
        ts = [p for p in ps if p is not None]
        if len(ts) >= 2 and min(ts) > 0 and max(ts) / min(ts) > 2.0:
            spreads.append((q, ts, max(ts) / min(ts)))
    if spreads:
        print("variance-prone even on the committed run (pass spread > 2x):")
        for q, ts, r in sorted(spreads, key=lambda x: -x[2]):
            print(f"  {q}: passes {ts} ({r:.1f}x)")


if __name__ == "__main__":
    main()
