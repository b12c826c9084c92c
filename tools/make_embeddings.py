#!/usr/bin/env python3
"""Replicate ONLY the embeddings table to vector-scale for the ANN probe
(r11 verdict item 5: the ANN family's recall/pruning evidence was pinned at
fixture scale — 2k vectors; the 100 TB story needs a >= 2M-vector corpus).

Same "spread" transform as make_sf1.py's embeddings branch — deterministic,
index-free, direction-DIVERSE (cross-replica cosine ~0.65, so replicas do
NOT form near-dup families and recall@k measures genuine neighborhood
retrieval, not duplicate collapse). vec_id offset per replica keeps ids
unique. Written by DuckDB with default row groups so the scan splits.

Usage: tools/make_embeddings.py [SRC_DIR] [DST_FILE] [REPLICAS]
       tools/make_embeddings.py /root/testdata/sf0.1 /tmp/graft_emb2m/embeddings.parquet 1000
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_emb2m/embeddings.parquet"
REPL = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

os.makedirs(os.path.dirname(DST), exist_ok=True)
con = duckdb.connect()
con.execute("SET threads=32")
con.execute(f"""
  COPY (
    SELECT e.vec_id + r.i * 1000000 AS vec_id,
           list_transform(e.embedding,
             x -> CAST(x * (1 + sin(x * 7919 * (r.i + 1))) AS FLOAT)) AS embedding,
           e.label
    FROM '{SRC}/embeddings.parquet' e, range({REPL}) r(i)
  ) TO '{DST}' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT COUNT(*) FROM '{DST}'").fetchone()[0]
print(f"{DST}: {n} vectors ({REPL} spread replicas)")
