#!/usr/bin/env python3
"""Recall of the adaptive-width blocking arms vs their fixed-width twins.

Usage: python3 tools/adaptive_recall.py <fixed_verify_out> <adaptive_verify_out>

Both args are graft.Verify output dirs for the SAME sf dir; reads
<out>/dedup_{simhash,winnow}_pairs[_adaptive] parquet and reports, per
arm, the fixed arm's gate-pair count, the adaptive arm's count, and
recall = |adaptive ∩ fixed| / |fixed| on (doc_a, doc_b). For simhash the
adaptive candidates are a strict subset by construction (extension bits
only drop); for winnowing the gram widens, so the intersection measures
how many fixed-gate pairs the adaptive arm still surfaces.
"""
import sys, glob
import duckdb


def pairs(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        raise SystemExit(f"missing {out_dir}/{name}")
    return f"(SELECT doc_a, doc_b FROM read_parquet({files!r}))"


def main():
    fixed_dir, adapt_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for fixed, adapt in [("dedup_simhash_pairs", "dedup_simhash_pairs_adaptive"),
                         ("dedup_winnow_pairs", "dedup_winnow_pairs_adaptive")]:
        f, a = pairs(fixed_dir, fixed), pairs(adapt_dir, adapt)
        nf = con.execute(f"SELECT count(*) FROM {f} t").fetchone()[0]
        na = con.execute(f"SELECT count(*) FROM {a} t").fetchone()[0]
        ni = con.execute(
            f"SELECT count(*) FROM ({f} INTERSECT {a}) t").fetchone()[0]
        rec = ni / nf if nf else float("nan")
        print(f"{fixed}: fixed={nf} adaptive={na} hit={ni} "
              f"recall={rec:.4f}")


if __name__ == "__main__":
    main()
