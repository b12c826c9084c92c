#!/usr/bin/env python3
"""HIGH-DIMENSIONAL embedding corpus for the IVFPQ design-point probe
(r13 verdict item 2: the 2M-vector ANN evidence ran at 64 dims, where the
honest conclusion was "PQ pays off at 768-4096 dims" — an extrapolation.
This generates the regime PQ exists for: vectors whose raw floats are
~3 KB each, so tens-of-byte codes are a 64-400x shrink of resident bytes).

Deterministic, index-free synthesis with HIERARCHICAL cluster structure —
the shape that makes the recall question meaningful. A first attempt used
flat clusters + i.i.d. per-dimension noise and produced a degenerate
similarity profile: every in-cluster candidate sat at cosine 0.925 +- 0.005,
so ranking the top-10 required resolving i.i.d. noise SMALLER than any
quantizer's reconstruction error — ADC recall was ~0.05 at m=96/k=256 and
the number measured nothing but that degeneracy (real passage-embedding
corpora have graded neighbors: a near tier well separated from the rest of
the cell). The hierarchy restores the grade:

    v = center(c1) + 0.35 * subcenter(c1, c2) + 0.08 * noise(i)

with c1 = i mod NCLUST coarse clusters (IVF's cells) and c2 = (i div
NCLUST) mod NSUB sub-clusters of ~N/(NCLUST*NSUB) members. A query's true
top-k lives in its sub-cluster (cos ~0.99); same-cell other-subcluster
candidates sit near 0.90; cross-cell near 0. The discriminating signal is
the 0.35-amplitude LOW-RANK subcenter term — exactly the structure PQ
codebooks can learn — while the 0.08 noise keeps within-subcluster order
nontrivial. Plain sin() arithmetic keeps it cheap and reproducible.

Usage: tools/make_embeddings_hd.py [DST_FILE] [N] [DIMS] [NCLUST] [NSUB]
       tools/make_embeddings_hd.py /tmp/graft_emb_hd/embeddings.parquet 1000000 768 1024 32
"""
import os
import sys

import duckdb

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_emb_hd/embeddings.parquet"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
DIMS = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NCLUST = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
NSUB = int(sys.argv[5]) if len(sys.argv) > 5 else 32

os.makedirs(os.path.dirname(DST), exist_ok=True)
con = duckdb.connect()
con.execute("SET threads=32")
con.execute(f"""
  COPY (
    SELECT i AS vec_id,
           list_transform(range({DIMS}), j ->
             CAST(sin(((i % {NCLUST}) * 1009 + j) * 0.37)
                + 0.35 * sin((((i % {NCLUST}) * 131 + (i // {NCLUST}) % {NSUB}) * 7561 + j) * 0.53)
                + 0.08 * sin((i * 7919 + j * 104729) * 0.61) AS FLOAT)) AS embedding,
           CAST(i % {NCLUST} AS INT) AS label
    FROM range({N}) r(i)
  ) TO '{DST}' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT COUNT(*) FROM '{DST}'").fetchone()[0]
sz = os.path.getsize(DST) / 1e9
print(f"{DST}: {n} vectors x {DIMS} dims, {NCLUST}x{NSUB} hierarchical clusters, {sz:.2f} GB")
