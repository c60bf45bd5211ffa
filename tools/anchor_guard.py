#!/usr/bin/env python3
"""Refuse to bless a contended bench run as the committed anchor.

The committed BENCH_FULL.json is the idle-host reference every drift
adjudication (tools/bench_drift.py) measures against. The Bench main
auto-writes it on every full-registry run — including driver-side runs
on a loaded host — so a careless `git add` can silently replace the
idle anchor with a contended one and poison every later comparison
(the round-12 near-miss: a 236.65 s driver run overwrote the 241.87 s
idle anchor in the working tree).

This guard enforces the BASELINE.md re-anchor procedure: an anchor
whose TOTAL moves more than `threshold` (default 5%) versus HEAD must
land in the same change set as a BASELINE.md edit documenting the
idle-host run. Run it before any commit that touches BENCH_FULL.json:

    python3 tools/anchor_guard.py            # working tree vs HEAD
    python3 tools/anchor_guard.py --staged   # index vs HEAD

Exit 0: anchor unchanged, or moved <= threshold, or moved > threshold
WITH a BASELINE.md edit alongside. Exit 1: moved > threshold without
the BASELINE.md entry (or a brand-new anchor without one).
"""
import json
import subprocess
import sys

ANCHOR = "BENCH_FULL.json"
BASELINE = "BASELINE.md"


def run(args):
    return subprocess.run(args, capture_output=True, text=True)


def head_version():
    p = run(["git", "show", f"HEAD:{ANCHOR}"])
    return json.loads(p.stdout) if p.returncode == 0 else None


def candidate_version(staged):
    if staged:
        p = run(["git", "show", f":{ANCHOR}"])
        return json.loads(p.stdout) if p.returncode == 0 else None
    try:
        return json.load(open(ANCHOR))
    except FileNotFoundError:
        return None


def changed_files(staged):
    args = ["git", "diff", "--name-only"]
    args += ["--cached"] if staged else ["HEAD"]
    return set(run(args).stdout.split())


def main():
    staged = "--staged" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = float(pos[0]) if pos else 0.05

    changed = changed_files(staged)
    if ANCHOR not in changed:
        print(f"{ANCHOR} unchanged vs HEAD — nothing to guard")
        return 0

    head = head_version()
    cand = candidate_version(staged)
    if cand is None:
        print(f"{ANCHOR} deleted — fine (drift tool will complain instead)")
        return 0

    blessed = BASELINE in changed
    if head is None:
        if blessed:
            print(f"first anchor ({cand['value']:.2f}s) with a "
                  f"{BASELINE} entry — ok")
            return 0
        print(f"REFUSED: first anchor ({cand['value']:.2f}s) must land "
              f"with its {BASELINE} idle-host entry in the same change set")
        return 1

    t0, t1 = head["value"], cand["value"]
    move = abs(t1 - t0) / t0
    if move <= threshold:
        print(f"anchor total {t0:.2f}s -> {t1:.2f}s ({move * 100:.1f}% "
              f"<= {threshold * 100:.0f}%) — ok")
        return 0
    if blessed:
        print(f"anchor total {t0:.2f}s -> {t1:.2f}s ({move * 100:.1f}%) "
              f"WITH a {BASELINE} edit — ok (make sure the entry records "
              "the idle-host two-run procedure)")
        return 0
    print(f"REFUSED: anchor total moved {t0:.2f}s -> {t1:.2f}s "
          f"({move * 100:.1f}% > {threshold * 100:.0f}%) without a "
          f"{BASELINE} entry in the same change set. Re-run the "
          "BASELINE.md idle-host procedure and document the new anchor, "
          "or unstage the contended BENCH_FULL.json.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
