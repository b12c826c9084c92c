#!/usr/bin/env python3
"""DuckDB timing twin for the FULL registry sweep (crossover item 8).

Usage: python3 tools/bench_duckdb_registry.py <sfDir> <oracle_sql.json> [threads]

Times every oracle SQL from the given oracle_sql.json (written by
graft.Verify) against the parquet tables in sfDir: 1 warmup, min of 2, the
same SELECT COUNT(*) materialization contract as bench_duckdb.py /
graft.tools.RegistryBench. Queries that exceed the 180 s cap are
interrupted and reported as -2 (the cap exists because a handful of
oracles are deliberately brute-force — e.g. the all-pairs embedding
near-dup — whose cost at sf3 is the POINT of the banded Spark plan).

Note these are ORACLES, not always algorithmic twins: where the oracle is
exact brute force and the Spark side is banded/probed (llm_embed_neardup,
llm_knn_join_ivf), the ratio measures algorithm-vs-algorithm, not
engine-vs-engine. The crossover write-up flags those rows.
"""
import json
import sys
import threading
import time

import duckdb

SF = sys.argv[1]
ORACLES = sys.argv[2]
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CAP_S = 180.0

con = duckdb.connect()
con.execute(f"SET threads={THREADS}")
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

with open(ORACLES) as f:
    oracles = json.load(f)


def run_capped(sql):
    done = threading.Event()

    def watchdog():
        if not done.wait(CAP_S):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()
        return True
    except duckdb.InterruptException:
        return False
    finally:
        done.set()


out = {}
for name in sorted(oracles):
    sql = oracles[name]
    t0 = time.perf_counter()
    if not run_capped(sql):  # warmup doubles as the timeout probe
        out[name] = -2.0
        print(f"[duck-registry] {name:<28} TIMEOUT(>{CAP_S:.0f}s)", file=sys.stderr)
        continue
    times = []
    ok = True
    for _ in range(2):
        t0 = time.perf_counter()
        if not run_capped(sql):
            ok = False
            break
        times.append(time.perf_counter() - t0)
    out[name] = round(min(times), 4) if ok else -2.0
    print(f"[duck-registry] {name:<28} {out[name]:.3f} s", file=sys.stderr)

total = round(sum(v for v in out.values() if v >= 0), 2)
print(json.dumps({"metric": "duckdb_registry_sweep", "value": total,
                  "unit": "sec", "threads": THREADS, "queries": out, "sf": SF}))
