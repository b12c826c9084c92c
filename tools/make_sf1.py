#!/usr/bin/env python3
"""Scale sf0.1 testdata 10x into /tmp/graft_sf1 for the bench crossover run.

Replicates each fact table 10 times with per-replica key offsets so join
keys stay consistent (lineitem replica i joins orders replica i); dimension
tables (region/nation/customer/supplier/part) are kept as-is, so star-join
selectivities match the original. Written by DuckDB with its default row
group size (~122k rows), so BOTH engines can parallelize the scans — the
single-row-group layout of the driver testdata cannot be split by either.

This dataset is for PERFORMANCE measurement only (the crossover demo asked
for in round-1 feedback); correctness remains gated on the driver testdata.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPL = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# mode "replica" (default): exact copies with offset keys — the
# duplicate-heavy profile of a web crawl, exercises dedup-first paths.
# mode "distinct": additionally perturbs text (per-replica suffix token)
# and embeddings (tiny per-replica offset) so every item is UNIQUE —
# exercises distinct-item scaling of the text/vector passes.
MODE = sys.argv[4] if len(sys.argv) > 4 else "replica"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads=32")

KEY_OFF = 1_000_000_000


def gen(table, select):
    parts = " UNION ALL ".join(
        select.replace("{off}", str(i * KEY_OFF)).replace("{rep}", str(i))
        for i in range(REPL))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


for dim in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') TO '{DST}/{dim}.parquet' (FORMAT PARQUET)")
    print(dim, "copied")

gen("orders",
    f"SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority "
    f"FROM '{SRC}/orders.parquet'")
gen("lineitem",
    f"SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey, l_suppkey, l_linenumber, "
    f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"l_shipdate FROM '{SRC}/lineitem.parquet'")
# keep the TIMESTAMP(NANOS) physical type (DuckDB's COPY downcasts to us):
# Tables.events reads it via the nanosAsLong flag and divides to micros —
# a us-typed file would bypass that. pyarrow preserves ns.
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{SRC}/events.parquet")
chunks = []
for i in range(REPL):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), i * KEY_OFF))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), i * KEY_OFF))
    chunks.append(t)
pq.write_table(pa.concat_tables(chunks), f"{DST}/events.parquet",
               row_group_size=122880)
print("events:", sum(c.num_rows for c in chunks), "rows (ns preserved)")
if MODE in ("distinct", "spread", "textspread"):
    # {rep} is the replica index: a unique trailing token per replica makes
    # every text distinct (shingle/trigram sets shift by a few grams); a
    # per-replica epsilon on every embedding dimension makes vectors
    # distinct while preserving the near-uniform cosine structure.
    #
    # "distinct" keeps epsilon tiny (1e-4/dim): cross-replica twins stay at
    # cosine ~0.999999, so the TRUE near-dup pair count grows as
    # N_base * C(R, 2) — QUADRATIC in the replica factor. That makes the
    # d-corpora an adversarial OUTPUT-scaling probe for near-dup operators
    # (any witness-enumerating algorithm pays the pair mass). "spread"
    # instead modulates each element by a value-dependent per-replica sine
    # (x * (1 + sin(x * 7919 * (rep+1)))): deterministic, index-free, and
    # direction-DIVERSE (an additive constant offset would re-correlate
    # high replicas toward the all-ones direction), pushing cross-replica
    # cosine to ~0.65; the only >= 0.9 pairs are the operators' own
    # planted mutants — pair count proportional to N, the bounded-
    # duplication profile of a real corpus, isolating INPUT scaling.
    emb = ("list_transform(embedding, x -> CAST(x + {rep} * 1e-4 AS FLOAT))"
           if MODE == "distinct" else
           "list_transform(embedding, x -> CAST(x * (1 + sin(x * 7919 * ({rep} + 1))) AS FLOAT))")
    # TEXT spreading (mode "textspread", r7): the suffix-token trick used
    # by "distinct"/"spread" leaves cross-replica word-shingle Jaccard at
    # ~(n-k)/n, so every base text's R replicas form a TRUE near-dup
    # family and text near-dup operators face N_base * C(R, 2) output
    # pairs — quadratic in the replica factor, the text twin of the
    # d-corpora's embedding pathology. Inserting a replica-specific token
    # after every 7th word breaks ~all 5-word shingles that straddle an
    # insertion point: cross-replica Jaccard drops to ~0.2, below every
    # near-dup threshold in the registry, so only each replica's own
    # planted mutants remain near-dup pairs — pair count proportional to
    # N, isolating INPUT scaling for the TEXT operator family.
    text = (r"regexp_replace(text, '((\S+ ){6}\S+)', '\1 xr{rep}q', 'g')"
            if MODE == "textspread" else "text || ' rep{rep}tok'")
    gen("documents",
        f"SELECT doc_id + {{off}} AS doc_id, {text} AS text, "
        f"lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet'")
    gen("embeddings",
        f"SELECT vec_id + {{off}} AS vec_id, {emb} AS embedding, "
        f"label FROM '{SRC}/embeddings.parquet'")
else:
    gen("documents",
        f"SELECT doc_id + {{off}} AS doc_id, text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet'")
    gen("embeddings",
        f"SELECT vec_id + {{off}} AS vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet'")
print("done ->", DST)
