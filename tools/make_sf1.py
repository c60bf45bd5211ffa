#!/usr/bin/env python3
"""Synthesize a structure-preserving scale-up of the driver's sf0.1
tables for headroom spot-benches (VERDICT r9 #3 at 10x; r10 #3 extends
the evidence to a second decade, copies=100 ~ "sf10").

The scale-up is STRUCTURE-PRESERVING replication, not naive row
duplication: each copy is transformed so that within-copy similarity
structure is exactly the original's while cross-copy similarity
vanishes — the growth profile a real Nx corpus has (Nx rows, constant
density), where plain duplication would make every dedup operator
superlinear by construction of the data:

- orders/lineitem: all key spaces (order, cust, supp, part) shift by
  copy * (max+1), so the purchase graph becomes N disjoint copies —
  Nx nodes, Nx edges, identical degree distribution (how TPC-H
  itself scales: customers and suppliers both grow with sf).
- documents: every whitespace token gets a copy-unique suffix, so
  within-copy shingle sets are isomorphic to the original's (near-dup
  pairs and their Jaccards preserved exactly) while cross-copy
  shingle overlap is zero. Token counts and frequency profile (hence
  the df-capped index behavior) are preserved.
- embeddings: per-copy deterministic Rademacher sign pattern on the 64
  dims — within-copy dot products are exactly preserved (signs
  cancel), cross-copy cosines concentrate near 0, norms unchanged.

All id strides are k * (max_id + 1) — NOT k * num_rows — so sparse or
offset id spaces can never collide across copies (ADVICE r10).

Copies are written one at a time through a ParquetWriter, so peak
memory is one copy's tables regardless of the copy count.

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


def tag_of(k: int) -> str:
    """Copy 0 keeps the original text; copy k>0 gets an "x" marker plus
    a base-25 suffix over an alphabet that EXCLUDES 'x' ("xb", "xc",
    ..., "xba", ...). Every tag therefore contains exactly one 'x', at
    its start, which makes the tag set genuinely suffix-free for ANY
    copy count: tag1 a suffix of base2+tag2 would need an 'x' inside
    tag2's digit tail, which the alphabet forbids. (With 'x' as a valid
    base-26 digit, tag_of(599)="xxb" ended with tag_of(1)="xb" and
    cross-copy tokens differing by a trailing 'x' could collide.)"""
    if k == 0:
        return ""
    alphabet = "abcdefghijklmnopqrstuvwyz"  # 25 letters, no 'x'
    s = ""
    while k > 0:
        s = alphabet[k % 25] + s
        k //= 25
    return "x" + s


SIGNS = [np.ones(64, dtype=np.float32)] + [
    rng.choice(np.array([-1.0, 1.0], dtype=np.float32), 64)
    for _ in range(COPIES - 1)
]


def write_copies(path: str, tbl: pa.Table, transform) -> None:
    """Stream copy k = transform(tbl, k) into one parquet file."""
    writer = pq.ParquetWriter(path, tbl.schema)
    try:
        for k in range(COPIES):
            writer.write_table(transform(tbl, k))
    finally:
        writer.close()


def shifted(tbl: pa.Table, k: int, keys: dict) -> pa.Table:
    """keys: column -> stride; copy k adds k*stride to that column."""
    t = tbl
    for col, stride in keys.items():
        idx = t.schema.get_field_index(col)
        shifted_col = pc.add(t.column(col), pa.scalar(k * stride,
                             type=t.schema.field(col).type))
        t = t.set_column(idx, col, shifted_col)
    return t


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

    write_copies(f"{DST}/orders.parquet", orders,
                 lambda t, k: shifted(t, k, {"o_orderkey": ok, "o_custkey": ck}))
    write_copies(f"{DST}/lineitem.parquet", lineitem,
                 lambda t, k: shifted(t, k, {"l_orderkey": ok, "l_suppkey": sk,
                                             "l_partkey": pk}))
    write_copies(f"{DST}/customer.parquet", customer,
                 lambda t, k: shifted(t, k, {"c_custkey": ck}))
    write_copies(f"{DST}/supplier.parquet", supplier,
                 lambda t, k: shifted(t, k, {"s_suppkey": sk}))
    write_copies(f"{DST}/part.parquet", part,
                 lambda t, k: shifted(t, k, {"p_partkey": pk}))
    # fixed-size dims pass through unchanged
    for dim in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"),
                       f"{DST}/{dim}.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    did = max(ids) + 1  # stride = max_id + 1, not num_rows
    doc_schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64())])

    def doc_copy(_t, k):
        tag = tag_of(k)
        out = {"doc_id": [], "text": [], "lang": langs, "source": sources,
               "n_chars": []}
        for i in range(len(ids)):
            t = texts[i] if not tag else " ".join(
                (tok + tag if tok else tok) for tok in texts[i].split(" "))
            out["doc_id"].append(ids[i] + k * did)
            out["text"].append(t)
            out["n_chars"].append(len(t))
        return pa.table(out, schema=doc_schema)

    write_copies(f"{DST}/documents.parquet", pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
         "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
         "n_chars": pa.array([], pa.int64())}, schema=doc_schema), doc_copy)

    # events: Bench's warmup touches its schema, and temporal spot-checks
    # can reuse it — replicate with shifted event/user ids, timestamps
    # untouched (Nx the events in the same window = Nx the hourly
    # volume, which is how an Nx tenant book actually behaves)
    events = pq.read_table(f"{SRC}/events.parquet")
    ek = pc.max(events.column("event_id")).as_py() + 1
    uk = pc.max(events.column("user_id")).as_py() + 1
    write_copies(f"{DST}/events.parquet", events,
                 lambda t, k: shifted(t, k, {"event_id": ek, "user_id": uk}))

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_pylist()
    vids = emb.column("vec_id").to_pylist()
    vid = max(vids) + 1  # stride = max_id + 1
    emb_schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32())])

    def emb_copy(_t, k):
        flipped = vecs * SIGNS[k]
        return pa.table(
            {"vec_id": [v + k * vid for v in vids],
             "embedding": flipped.tolist(), "label": labels},
            schema=emb_schema)

    write_copies(f"{DST}/embeddings.parquet", pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "embedding": pa.array([], pa.list_(pa.float32())),
         "label": pa.array([], pa.int32())}, schema=emb_schema), emb_copy)

    for name in ("orders", "lineitem", "events", "documents", "embeddings"):
        f = pq.ParquetFile(f"{DST}/{name}.parquet")
        print(f"{name}: {f.metadata.num_rows} rows")


if __name__ == "__main__":
    main()
