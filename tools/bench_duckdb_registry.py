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
# Bound the spill so one brute-force oracle cannot fill the volume and
# kill the WHOLE sweep (r16: an oracle spilled >40 GB at sf3 inside its
# 180 s cap and took the process down with an IOException the old tool
# did not catch). A query that needs more temp than this errors and is
# reported as -3 — the same "too expensive here" class as the cap, with
# the disk budget explicit.
con.execute("SET max_temp_directory_size='20GiB'")
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
    except duckdb.Error as e:  # spill-budget / OOM / IO: fail the ROW, not the sweep
        print(f"[duck-registry] row error: {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr)
        return None
    finally:
        done.set()


out = {}
for name in sorted(oracles):
    sql = oracles[name]
    t0 = time.perf_counter()
    first = run_capped(sql)  # warmup doubles as the timeout/error probe
    if first is not True:
        out[name] = -2.0 if first is False else -3.0
        label = f"TIMEOUT(>{CAP_S:.0f}s)" if first is False else "ERROR(spill/oom)"
        print(f"[duck-registry] {name:<28} {label}", file=sys.stderr)
        continue
    times = []
    ok = True  # keep the -2 (timeout) vs -3 (error) classes distinct in
    for _ in range(2):  # the timed runs too, not just the warmup probe
        t0 = time.perf_counter()
        r = run_capped(sql)
        if r is not True:
            ok = r  # False = timeout, None = row error
            break
        times.append(time.perf_counter() - t0)
    if ok is True:
        out[name] = round(min(times), 4)
        print(f"[duck-registry] {name:<28} {out[name]:.3f} s", file=sys.stderr)
    else:
        out[name] = -2.0 if ok is False else -3.0
        label = f"TIMEOUT(>{CAP_S:.0f}s)" if ok is False else "ERROR(spill/oom)"
        print(f"[duck-registry] {name:<28} {label} (timed run)", file=sys.stderr)

total = round(sum(v for v in out.values() if v >= 0), 2)
print(json.dumps({"metric": "duckdb_registry_sweep", "value": total,
                  "unit": "sec", "threads": THREADS, "queries": out, "sf": SF}))
