#!/usr/bin/env python3
"""Generate Zipf-skewed document tables for the join-family skew stress.

The sf* fixtures draw tokens UNIFORMLY from a 31-token vocabulary, so the
linear-candidate claims of editDistancePairs (q143) and containmentPairs
(q116) are only evidenced on friendly data. These tables draw tokens from
a 5000-token vocabulary with Zipf(a) ranks at two skew levels:

  - skew_mild  (a = 1.3): realistic natural-text head mass
  - skew_heavy (a = 2.0): adversarial — the top token carries ~60% of
    draws, so 3-gram shingles and 40-char prefixes collide massively

50,000 docs each (sf1.0-scale), 10..60 tokens/doc, deterministic
(numpy PCG64 seed 7). Usage: python3 tools/gen_skew.py [outdir]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "testdata"
N_DOCS = 50_000
VOCAB = [f"tok{i}" for i in range(5000)]

rng = np.random.default_rng(7)

for name, a in [("skew_mild", 1.3), ("skew_heavy", 2.0)]:
    lens = rng.integers(10, 61, size=N_DOCS)
    total = int(lens.sum())
    # bounded Zipf: rejection-free via truncation (ranks beyond the vocab
    # fold into a uniform tail draw, preserving the head's mass shape)
    ranks = rng.zipf(a, size=total)
    tail = ranks > len(VOCAB)
    ranks[tail] = rng.integers(1, len(VOCAB) + 1, size=int(tail.sum()))
    toks = np.array(VOCAB)[ranks - 1]
    texts = []
    off = 0
    for ln in lens:
        texts.append(" ".join(toks[off:off + ln]))
        off += ln
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    d = os.path.join(out, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    heads = {}
    for t in texts:
        k = t[:40]
        heads[k] = heads.get(k, 0) + 1
    top = sorted(heads.values(), reverse=True)[:3]
    print(f"{name}: {N_DOCS} docs, distinct 40-char prefixes "
          f"{len(heads)}, top prefix counts {top}")
