#!/usr/bin/env python3
"""Synthesize an sf1 fixture set as a deterministic FACTOR× replication of an
existing sfDir (default 10× sf0.1), for the SCALING.md measurement — the same
generator discipline as the driver fixtures (deterministic, seed-free
transforms only), run locally because the driver only ships sf0.001/0.01/0.1.

NOT part of the engine — developer tooling (driver-side python), like
selfcheck.py.

Replication rules (copy i = 0..F-1; copy 0 is the original rows verbatim):
  - region/nation: fixed dimensions, copied once as-is.
  - supplier/customer/part/orders/lineitem: every key column is offset by
    i*(max_key+1) of its own table, so the join graph (1 lineitem -> 1 order
    -> 1 customer, etc.) is preserved per copy and cardinalities scale
    exactly F×. Non-key attributes repeat (realistic: domains don't grow).
  - events: event_id/user_id offset per copy (user_id too: per-user sessions/
    windows must not merge across copies); ts/value/props repeat, so
    event-time windows keep their range and grow F× denser.
  - documents: doc_id offset; every whitespace token of copy i>0 gets a
    deterministic "xi" suffix, so copies share NO tokens/shingles/digests —
    exact-dup groups, near-dup pair structure, vocabulary, and posting lists
    all scale F× instead of exploding quadratically across copies (10
    verbatim copies of every doc would make every pair query mine the
    cross-copy duplicates — a different workload, not a bigger one).
    n_chars is recomputed from the rewritten text.
  - embeddings: vec_id offset; copy i's vectors get their dimensions
    rotated (np.roll) by i — norm- and distance-structure-preserving within
    a copy, decorrelated across copies, so ANN/k-means workloads scale F×.

Usage: python3 scripts/make_sf1.py SRC_SF_DIR DST_DIR [FACTOR=10]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_AS_IS = ["region", "nation"]
# table -> columns to offset by i*(max_of_named_table+1); key domain comes
# from the table that OWNS the key so foreign keys stay consistent
OFFSET = {
    "supplier": {"s_suppkey": "supplier"},
    "customer": {"c_custkey": "customer"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
}
OWN_KEY = {"supplier": "s_suppkey", "customer": "c_custkey",
           "part": "p_partkey", "orders": "o_orderkey", "events": "event_id"}


def suffix_tokens(text: str, i: int) -> str:
    # alphanumeric suffix so ANY tokenizer (whitespace, \w+ regex, BPE
    # pre-split) keeps it fused to its token — copies must share no tokens
    tag = f"x{i}"
    return " ".join(t + tag for t in text.split(" "))


def main(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    domains = {}
    for t, key in OWN_KEY.items():
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"), columns=[key])
        domains[t] = int(pc.max(tbl.column(key)).as_py()) + 1
    ev = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])
    domains["events_user"] = int(pc.max(ev.column("user_id")).as_py()) + 1

    for t in COPY_AS_IS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} rows (copied)")

    for t, offsets in OFFSET.items():
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        copies = []
        for i in range(factor):
            c = tbl
            if i > 0:
                for col, dom in offsets.items():
                    idx = c.schema.get_field_index(col)
                    typ = c.schema.field(idx).type
                    shifted = pc.add(c.column(col), pa.scalar(i * domains[dom], type=typ))
                    c = c.set_column(idx, c.schema.field(idx), shifted.cast(typ))
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"),
                       row_group_size=1 << 19)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")

    # documents: token-suffix rewrite + doc_id offset + n_chars recompute
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    doc_dom = int(pc.max(docs.column("doc_id")).as_py()) + 1
    texts = docs.column("text").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    copies = []
    for i in range(factor):
        if i == 0:
            copies.append(docs)
            continue
        new_text = [suffix_tokens(s, i) for s in texts]
        c = docs.set_column(docs.schema.get_field_index("doc_id"),
                            docs.schema.field("doc_id"),
                            pa.array([d + i * doc_dom for d in ids], type=pa.int64()))
        c = c.set_column(c.schema.get_field_index("text"),
                         c.schema.field("text"), pa.array(new_text, type=pa.string()))
        if "n_chars" in c.schema.names:
            c = c.set_column(c.schema.get_field_index("n_chars"),
                             c.schema.field("n_chars"),
                             pa.array([len(s) for s in new_text], type=pa.int64()))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, "documents.parquet"), row_group_size=1 << 16)
    print(f"documents: {docs.num_rows} -> {out.num_rows} rows")

    # embeddings: dim rotation per copy + vec_id offset
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_dom = int(pc.max(emb.column("vec_id")).as_py()) + 1
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    vids = emb.column("vec_id").to_pylist()
    copies = []
    for i in range(factor):
        if i == 0:
            copies.append(emb)
            continue
        rolled = np.roll(vecs, i % vecs.shape[1], axis=1)
        c = emb.set_column(emb.schema.get_field_index("vec_id"),
                           emb.schema.field("vec_id"),
                           pa.array([v + i * vec_dom for v in vids], type=pa.int64()))
        c = c.set_column(c.schema.get_field_index("embedding"),
                         c.schema.field("embedding"),
                         pa.array([row for row in rolled.tolist()],
                                  type=emb.schema.field("embedding").type))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"), row_group_size=1 << 16)
    print(f"embeddings: {emb.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
