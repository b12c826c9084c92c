#!/usr/bin/env python3
"""HIGH-DIMENSIONAL embedding corpus for the IVFPQ design-point probe
(r13 verdict item 2: the 2M-vector ANN evidence ran at 64 dims, where the
honest conclusion was "PQ pays off at 768-4096 dims" — an extrapolation.
This generates the regime PQ exists for: vectors whose raw floats are
~3 KB each, so 8-16 B codes are a 200-400x shrink of the resident bytes).

Deterministic, index-free synthesis with CLUSTER STRUCTURE (the shape real
sentence/passage embeddings have, and the one IVF's cell partitioning
exploits): vector[j] = center(c, j) + noise(i, j), where c = i mod NCLUST.
The center term dominates (amplitude 1 vs 0.25), so same-cluster vectors
are close in cosine and cross-cluster ones are not — recall@k measures
genuine neighborhood retrieval. Plain sin() arithmetic keeps it cheap and
reproducible without any randomness source.

Usage: tools/make_embeddings_hd.py [DST_FILE] [N] [DIMS] [NCLUST]
       tools/make_embeddings_hd.py /tmp/graft_emb_hd/embeddings.parquet 1000000 768 1024
"""
import os
import sys

import duckdb

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_emb_hd/embeddings.parquet"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
DIMS = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NCLUST = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

os.makedirs(os.path.dirname(DST), exist_ok=True)
con = duckdb.connect()
con.execute("SET threads=32")
con.execute(f"""
  COPY (
    SELECT i AS vec_id,
           list_transform(range({DIMS}), j ->
             CAST(sin(((i % {NCLUST}) * 1009 + j) * 0.37)
                + 0.25 * sin((i * 7919 + j * 104729) * 0.61) AS FLOAT)) AS embedding,
           CAST(i % {NCLUST} AS INT) AS label
    FROM range({N}) r(i)
  ) TO '{DST}' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT COUNT(*) FROM '{DST}'").fetchone()[0]
sz = os.path.getsize(DST) / 1e9
print(f"{DST}: {n} vectors x {DIMS} dims, {NCLUST} clusters, {sz:.2f} GB")
