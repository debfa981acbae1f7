#!/usr/bin/env python3
"""Generate a sf1.0 testdata directory (10x sf0.1) for the scale sweep.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the 100x design
claims need one more decade. This reproduces the OBSERVED scaling laws of
the driver's generator (measured sf0.01 -> sf0.1, seed-42 style):

  - lineitem/orders/customer/part/supplier: rows x10 via replication with
    per-copy key offsets, so FK fan-outs (7.5 lineitem/order, order/cust,
    part/supp cardinalities) and every value distribution are preserved
    exactly while key spaces grow 10x.
  - events: x10; users x10 (users = 1.5% of events), SAME one-month ts
    window (the driver holds the window constant across SFs), value ~
    Exp(mean 50) rounded to 2dp, uniform event types, props {"k": 0..99}.
  - documents: x10 fresh synthesis from the measured recipe — uniform
    draws over the same 31-token vocabulary, token count uniform 10..100,
    lang weights en~2x others, 20 fixed sources, ~0.16% planted exact
    duplicate texts (8/5000 measured at sf0.1).
  - embeddings: x4 per decade (500 -> 2000 measured; so 8000) — uniform
    random unit 64-d float32 vectors, uniform labels 0..9 (measured
    intra-label cosine == inter-label == 0: no cluster structure).
  - region/nation: fixed dimensions, copied as-is.

Schemas are cast to the sf0.1 parquet schemas bit-for-bit (including the
events timestamp column — timestamp[us] since the 2026-08-13 driver
regeneration; ns draws truncate to µs). Deterministic: numpy PCG64 seed 42.

Usage: python3 tools/gen_sf1.py [outdir] [mult]

`mult` (integer, default 1) scales every row count by an extra factor on
top of the 10x decade — `gen_sf1.py testdata/sf3 3` writes a 30x-sf0.1
directory (the third-decade ratio check for the steep-linear query
family). Same recipes, same seed; the corpus is a fresh draw at the
larger size, not a replication of sf1.0.
"""
import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "testdata", "sf1.0")
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 1
K = 10 * MULT  # replication factor over sf0.1
rng = np.random.default_rng(42)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, table, schema):
    os.makedirs(OUT, exist_ok=True)
    # 5000-row groups (the sf0.1 shipped group SIZE): Spark splits scans
    # at row-group granularity, so a single-group multi-decade file would
    # run every map stage on ONE core of local[32] — measured 3.5x
    # distortion on the per-char text queries at sf3. A real corpus
    # arrives in thousands of splits; this layout models that.
    pq.write_table(table.cast(schema), f"{OUT}/{t}.parquet",
                   compression="snappy", row_group_size=5000)
    print(f"{t}: {table.num_rows} rows")


def replicate(t, offsets):
    """K copies with per-copy key offsets: {col: stride}."""
    src = read(t)
    df = src.to_pandas()
    parts = []
    for k in range(K):
        c = df.copy()
        for col, stride in offsets.items():
            c[col] = c[col] + k * stride
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    write(t, pa.Table.from_pandas(out, preserve_index=False), src.schema)


def main():
    # fixed dims
    for t in ("region", "nation"):
        src = read(t)
        write(t, src, src.schema)

    # star schema: strides = sf0.1 key-space sizes
    replicate("supplier", {"s_suppkey": 1000})
    replicate("customer", {"c_custkey": 15000})
    replicate("part", {"p_partkey": 20000})
    replicate("orders", {"o_orderkey": 150000, "o_custkey": 15000})
    replicate("lineitem", {"l_orderkey": 150000, "l_partkey": 20000,
                           "l_suppkey": 1000})

    # events: fresh synthesis at 10x (replication would give every event a
    # same-timestamp twin in another user — a fake tie structure).
    # KNOWN LIMIT for MULT > 1: n_users and the embedding count stay at
    # their sf1.0 values (only `documents` drives the sf3 steep-linear
    # sweep, and changing either draw would shift the downstream rng
    # state and break byte-reproducibility of the recorded seed-42
    # corpora). Scale them explicitly before using events/embeddings at
    # mult > 1.
    src = read("events")
    n = src.num_rows * K          # 1,000,000 at mult=1
    n_users = 15000               # 1.5% of events at mult=1
    t0 = pd.Timestamp("2024-01-01").value
    t1 = pd.Timestamp("2024-01-31").value
    # draw at ns (keeps the recorded seed-42 rng sequence), truncate to µs:
    # the regenerated driver fixtures store timestamp[us], and casting a
    # non-zero ns remainder to the target schema raises ArrowInvalid
    ts = np.sort(rng.integers(t0, t1, size=n)) // 1000 * 1000
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts),
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup", "error"], size=n),
        "value": np.round(rng.exponential(50.0, size=n), 2),
        "props": [json.dumps({"k": int(v)})
                  for v in rng.integers(0, 100, size=n)],
    })
    write("events", pa.Table.from_pandas(events, preserve_index=False),
          src.schema)

    # documents: measured recipe at 10x
    src = read("documents")
    d01 = src.to_pandas()
    vocab = sorted({w for t in d01.text for w in t.split()})  # the 31 tokens
    nd = len(d01) * K             # 50,000
    langs = ["en", "zh", "es", "fr", "de"]
    lang_p = [0.41, 0.15, 0.15, 0.15, 0.14]
    tok_counts = rng.integers(10, 101, size=nd)
    texts = [" ".join(rng.choice(vocab, size=c)) for c in tok_counts]
    # plant exact duplicates at the measured ~0.16% rate. The source draw
    # can hit the target itself or another overwritten target, losing the
    # plant — expected loss is n_dup * (n_dup / nd) ~ 0.13 plants at
    # sf1.0, accepted to keep the seed-42 corpus (and every recorded
    # sweep number derived from it) byte-stable.
    n_dup = int(round(nd * 8 / 5000))
    dup_targets = rng.choice(nd, size=n_dup, replace=False)
    for i in dup_targets:
        texts[i] = texts[int(rng.integers(0, nd))]
    docs = pd.DataFrame({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=nd, p=lang_p),
        "source": [f"src{i}" for i in rng.integers(0, 20, size=nd)],
    })
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    write("documents", pa.Table.from_pandas(docs, preserve_index=False),
          src.schema)

    # embeddings: x4 per decade (measured), random unit vectors
    src = read("embeddings")
    ne = src.num_rows * 4         # 8,000
    vecs = rng.standard_normal((ne, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pd.DataFrame({
        "vec_id": np.arange(ne, dtype=np.int64),
        "embedding": list(vecs),
        "label": rng.integers(0, 10, size=ne).astype(np.int32),
    })
    write("embeddings", pa.Table.from_pandas(emb, preserve_index=False),
          src.schema)


if __name__ == "__main__":
    main()
