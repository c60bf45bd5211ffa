#!/usr/bin/env python3
"""Fixed-vs-adaptive recall tables for every adaptive blocking arm, as
one JSON document (VERDICT r17 #4: the r16/r17 per-band tables were
hand-assembled from Verify dumps; this emits them from one command so
every ladder change gets its tables the same way).

Usage:
  python3 tools/adaptive_recall.py <fixed_verify_out> [<adaptive_verify_out>]
                                   [--json out.json]

Args are graft.Verify output dirs for the SAME sf dir. With one arg the
fixed and adaptive arms are read from the same dir (the normal case —
Verify writes the whole registry into one out dir); two args support
split dumps from restricted runs.

Arms and band definitions (bands are assigned by the FIXED arm's score,
so a table row reads "of the fixed yardstick's pairs in this band, how
many does the adaptive arm surface"):
  winnow  : dedup_winnow_pairs vs dedup_winnow_pairs_adaptive,
            banded by fixed overlap  (border .5-.65 | mid .65-.8 |
            near .8-.95 | dup >= .95)
  simhash : dedup_simhash_pairs vs dedup_simhash_pairs_adaptive,
            banded by fixed hamming  (h0_1 | h2_3 | h4_5 | h6)
  embedding: dedup_embedding_pairs (the sampled exact yardstick) vs
            dedup_embedding_lsh_pairs, banded by fixed cosine
            (c40_55 | c55_70 | c70_85 | c85_100); the LSH arm runs the
            full corpus, so recall is measured on the yardstick's
            (sampled) pair set — its exactness-within-sample contract.
"""
import sys, glob, json
import duckdb


def rel(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return f"read_parquet({files!r})"


def band_table(con, fixed_rel, adapt_rel, bands):
    """Per-band fixed count / adaptive-hit count / recall, plus totals."""
    q = f"""
    WITH f AS (SELECT doc_a, doc_b, band FROM {fixed_rel}),
    a AS (SELECT doc_a, doc_b FROM {adapt_rel}),
    j AS (SELECT f.band,
                 count(*) AS n_fixed,
                 sum(CASE WHEN a.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
          FROM f LEFT JOIN a USING (doc_a, doc_b)
          GROUP BY f.band)
    SELECT band, n_fixed, n_hit FROM j"""
    rows = {b: (nf, nh) for b, nf, nh in con.execute(q).fetchall()}
    out = {}
    tot_f = tot_h = 0
    for b in bands:
        nf, nh = rows.get(b, (0, 0))
        tot_f += nf
        tot_h += nh
        out[b] = {"fixed": nf, "hit": nh,
                  "recall": round(nh / nf, 4) if nf else None}
    na = con.execute(f"SELECT count(*) FROM {adapt_rel} t").fetchone()[0]
    out["total"] = {"fixed": tot_f, "hit": tot_h, "adaptive_pairs": na,
                    "recall": round(tot_h / tot_f, 4) if tot_f else None}
    return out


ARMS = [
    ("winnow", "dedup_winnow_pairs", "dedup_winnow_pairs_adaptive",
     ("CASE WHEN overlap >= 0.95 THEN 'dup_ge95'"
      " WHEN overlap >= 0.8 THEN 'near_80_95'"
      " WHEN overlap >= 0.65 THEN 'mid_65_80'"
      " ELSE 'border_50_65' END"),
     ["border_50_65", "mid_65_80", "near_80_95", "dup_ge95"],
     ["doc_a", "doc_b"]),
    ("simhash", "dedup_simhash_pairs", "dedup_simhash_pairs_adaptive",
     ("CASE WHEN hamming <= 1 THEN 'h0_1' WHEN hamming <= 3 THEN 'h2_3'"
      " WHEN hamming <= 5 THEN 'h4_5' ELSE 'h6' END"),
     ["h0_1", "h2_3", "h4_5", "h6"],
     ["doc_a", "doc_b"]),
    ("embedding", "dedup_embedding_pairs", "dedup_embedding_lsh_pairs",
     ("CASE WHEN cosine >= 0.85 THEN 'c85_100'"
      " WHEN cosine >= 0.7 THEN 'c70_85'"
      " WHEN cosine >= 0.55 THEN 'c55_70' ELSE 'c40_55' END"),
     ["c40_55", "c55_70", "c70_85", "c85_100"],
     ["vec_a", "vec_b"]),
]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != json_out]
    if not args:
        raise SystemExit(__doc__)
    fixed_dir = args[0]
    adapt_dir = args[1] if len(args) > 1 else args[0]
    con = duckdb.connect()
    report = {}
    for arm, fixed, adapt, band_expr, bands, keys in ARMS:
        f, a = rel(fixed_dir, fixed), rel(adapt_dir, adapt)
        if f is None or a is None:
            report[arm] = {"skipped": f"missing {fixed if f is None else adapt}"}
            continue
        ka, kb = keys
        fr = (f"(SELECT {ka} AS doc_a, {kb} AS doc_b,"
              f" {band_expr} AS band FROM {f})")
        ar = f"(SELECT {ka} AS doc_a, {kb} AS doc_b FROM {a})"
        report[arm] = band_table(con, fr, ar, bands)
    text = json.dumps(report, indent=1)
    print(text)
    if json_out:
        with open(json_out, "w") as fh:
            fh.write(text + "\n")


if __name__ == "__main__":
    main()
