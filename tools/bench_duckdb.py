#!/usr/bin/env python3
"""DuckDB twin of graft.Bench's 12 headline shapes, for crossover runs.

Usage: python3 tools/bench_duckdb.py [sfDir] [threads]

Methodology mirrors graft.Bench exactly: per-query wall clock, 2 warmups,
min of 3 timed runs, each query materialized via SELECT COUNT(*) FROM
(<shape>) — the same count() contract the Spark bench times (and the one
BASELINE.md documents). threads defaults to 4, the BASELINE.md config.
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

con = duckdb.connect()
con.execute(f"SET threads={THREADS}")
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

Q = {}
Q["q1_pricing_summary"] = """
  SELECT l_returnflag, l_linestatus, COUNT(*) count_order,
         SUM(l_quantity) sum_qty, SUM(l_extendedprice) sum_base_price,
         SUM(l_extendedprice * (1.0 - l_discount)) sum_disc_price,
         AVG(l_quantity) avg_qty, AVG(l_extendedprice) avg_price,
         AVG(l_discount) avg_disc, STDDEV_SAMP(l_quantity) std_qty
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
  GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
Q["q3_join3_topk"] = """
  SELECT o_orderkey, o_orderdate, SUM(l_extendedprice * (1.0 - l_discount)) revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey, o_orderdate
  ORDER BY revenue DESC, o_orderkey LIMIT 10"""
Q["q5_join5"] = """
  SELECT n_name, SUM(l_extendedprice * (1.0 - l_discount)) revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name ORDER BY revenue DESC, n_name"""
Q["window_rank"] = """
  SELECT * FROM (
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) rn
    FROM orders) WHERE rn <= 3"""
Q["grouping_sets"] = """
  SELECT o_orderstatus, o_orderpriority, COUNT(*) n, SUM(o_totalprice) sum_price
  FROM orders
  GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())"""
Q["pivot_transpose"] = """
  SELECT o_orderstatus,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) urgent,
         SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END) high,
         SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END) medium,
         SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END) notspec,
         SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END) low
  FROM orders GROUP BY o_orderstatus"""
Q["sessionize"] = """
  SELECT user_id, session_id, MIN(ts) session_start, MAX(ts) session_end,
         COUNT(*) n_events, SUM(value) sum_value
  FROM (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) session_id
    FROM (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts, value,
             CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR CAST(ts AS TIMESTAMP) > LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END new_session
      FROM events))
  GROUP BY user_id, session_id"""
Q["tumbling_window"] = """
  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) w, event_type,
         COUNT(*) n, SUM(value) sum_value
  FROM events GROUP BY w, event_type"""
Q["text_tokens"] = """
  SELECT lang, COUNT(*) n_docs, SUM(len(string_split(text, ' '))) total_tokens
  FROM documents GROUP BY lang"""
Q["knn_cosine"] = """
  SELECT b.vec_id,
         list_cosine_similarity(
           list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(a.embedding, x -> CAST(x AS DOUBLE))) cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id = 0
  ORDER BY cos_sim DESC NULLS LAST, b.vec_id LIMIT 11"""
Q["dedup_exact"] = """
  SELECT DISTINCT ON (text) doc_id FROM documents"""
Q["asof_like_merge"] = """
  SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
  FROM lineitem JOIN orders
    ON l_orderkey = o_orderkey
   AND l_shipdate >= o_orderdate
   AND l_shipdate < o_orderdate + INTERVAL 30 DAY"""


def run(sql):
    con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()


out = {}
for name, sql in Q.items():
    run(sql); run(sql)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(sql)
        times.append(time.perf_counter() - t0)
    out[name] = round(min(times), 4)
    # progressive progress on stderr (big-SF runs can take an hour; the
    # stdout JSON contract below is unchanged)
    print(f"[duckdb] {name} min={out[name]}s all={[round(t,2) for t in times]}",
          file=sys.stderr, flush=True)

total = round(sum(out.values()), 4)
print(json.dumps({"metric": "duckdb_headline_total_12q", "value": total,
                  "unit": "sec", "threads": THREADS, "queries": out, "sf": SF}))
