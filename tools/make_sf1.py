#!/usr/bin/env python3
"""Synthesize a 10x scale-up ("sf1-equivalent") of the driver's sf0.1
tables for the headroom spot-bench (VERDICT r9 #3).

The scale-up is STRUCTURE-PRESERVING replication, not naive row
duplication: each of the 10 copies is transformed so that within-copy
similarity structure is exactly the original's while cross-copy
similarity vanishes — the growth profile a real 10x corpus has
(10x rows, constant density), where plain duplication would make every
dedup operator superlinear by construction of the data:

- orders/lineitem: all key spaces (order, cust, supp, part) shift by
  copy * (max+1), so the purchase graph becomes 10 disjoint copies —
  10x nodes, 10x edges, identical degree distribution (how TPC-H
  itself scales: customers and suppliers both grow with sf).
- documents: every whitespace token gets a copy-unique suffix, so
  within-copy shingle sets are isomorphic to the original's (near-dup
  pairs and their Jaccards preserved exactly) while cross-copy
  shingle overlap is zero. Token counts and frequency profile (hence
  the df-capped index behavior) are preserved.
- embeddings: per-copy deterministic Rademacher sign pattern on the 64
  dims — within-copy dot products are exactly preserved (signs
  cancel), cross-copy cosines concentrate near 0, norms unchanged.

Usage: python3 tools/make_sf1.py [outdir=tmp/sf1synth] [copies=10]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1synth"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(42)
TAGS = ["", *(f"x{chr(97 + k)}" for k in range(1, COPIES))]
SIGNS = [np.ones(64, dtype=np.float32)] + [
    rng.choice(np.array([-1.0, 1.0], dtype=np.float32), 64)
    for _ in range(COPIES - 1)
]


def shift_keys(tbl: pa.Table, keys: dict) -> pa.Table:
    """keys: column -> stride; copy k adds k*stride to that column."""
    parts = []
    for k in range(COPIES):
        t = tbl
        for col, stride in keys.items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(k * stride,
                             type=t.schema.field(col).type))
            t = t.set_column(idx, col, shifted)
        parts.append(t)
    return pa.concat_tables(parts)


def main() -> None:
    orders = pq.read_table(f"{SRC}/orders.parquet")
    lineitem = pq.read_table(f"{SRC}/lineitem.parquet")
    customer = pq.read_table(f"{SRC}/customer.parquet")
    supplier = pq.read_table(f"{SRC}/supplier.parquet")
    part = pq.read_table(f"{SRC}/part.parquet")
    # strides come from the DIMENSION tables so fact foreign keys and
    # dimension primary keys shift in lockstep across copies
    ok = pc.max(orders.column("o_orderkey")).as_py() + 1
    ck = max(pc.max(orders.column("o_custkey")).as_py(),
             pc.max(customer.column("c_custkey")).as_py()) + 1
    sk = max(pc.max(lineitem.column("l_suppkey")).as_py(),
             pc.max(supplier.column("s_suppkey")).as_py()) + 1
    pk = max(pc.max(lineitem.column("l_partkey")).as_py(),
             pc.max(part.column("p_partkey")).as_py()) + 1

    pq.write_table(
        shift_keys(orders, {"o_orderkey": ok, "o_custkey": ck}),
        f"{DST}/orders.parquet")
    pq.write_table(
        shift_keys(lineitem,
                   {"l_orderkey": ok, "l_suppkey": sk, "l_partkey": pk}),
        f"{DST}/lineitem.parquet")
    pq.write_table(shift_keys(customer, {"c_custkey": ck}),
                   f"{DST}/customer.parquet")
    pq.write_table(shift_keys(supplier, {"s_suppkey": sk}),
                   f"{DST}/supplier.parquet")
    pq.write_table(shift_keys(part, {"p_partkey": pk}),
                   f"{DST}/part.parquet")
    # fixed-size dims pass through unchanged
    for dim in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"),
                       f"{DST}/{dim}.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    n_docs = docs.num_rows
    texts = docs.column("text").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    for k in range(COPIES):
        tag = TAGS[k]
        for i in range(n_docs):
            t = texts[i] if not tag else " ".join(
                (tok + tag if tok else tok) for tok in texts[i].split(" "))
            out["doc_id"].append(ids[i] + k * n_docs)
            out["text"].append(t)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(t))
    pq.write_table(
        pa.table(out, schema=pa.schema([
            ("doc_id", pa.int64()), ("text", pa.string()),
            ("lang", pa.string()), ("source", pa.string()),
            ("n_chars", pa.int64())])),
        f"{DST}/documents.parquet")

    # events: Bench's warmup touches its schema, and temporal spot-checks
    # can reuse it — replicate with shifted event/user ids, timestamps
    # untouched (10x the events in the same window = 10x the hourly
    # volume, which is how a 10x tenant book actually behaves)
    events = pq.read_table(f"{SRC}/events.parquet")
    ek = pc.max(events.column("event_id")).as_py() + 1
    uk = pc.max(events.column("user_id")).as_py() + 1
    pq.write_table(
        shift_keys(events, {"event_id": ek, "user_id": uk}),
        f"{DST}/events.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    n_vec = emb.num_rows
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_pylist()
    vids = emb.column("vec_id").to_pylist()
    eo = {"vec_id": [], "embedding": [], "label": []}
    for k in range(COPIES):
        flipped = vecs * SIGNS[k]
        eo["vec_id"].extend(v + k * n_vec for v in vids)
        eo["embedding"].extend(flipped.tolist())
        eo["label"].extend(labels)
    pq.write_table(
        pa.table(eo, schema=pa.schema([
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32())])),
        f"{DST}/embeddings.parquet")

    for name in ("orders", "lineitem", "events", "documents", "embeddings"):
        f = pq.ParquetFile(f"{DST}/{name}.parquet")
        print(f"{name}: {f.metadata.num_rows} rows")


if __name__ == "__main__":
    main()
