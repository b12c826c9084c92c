#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB over the same scale-factor tables,
and compares: schema (column names, sorted), row count, and cell-exact values
in produced row order. Exit code 1 if anything mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = set(sys.argv[3:])  # optional: restrict to named queries
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            ocols, orows = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            gcols, grows = fetch(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: our output unreadable: {e}")
            n_bad += 1
            continue
        if gcols != ocols:
            print(f"FAIL {name}: columns ours={gcols} oracle={ocols}")
            n_bad += 1
            continue
        if len(grows) != len(orows):
            print(f"FAIL {name}: rows ours={len(grows)} oracle={len(orows)}")
            n_bad += 1
            continue
        bad = [(i, g, o) for i, (g, o) in enumerate(zip(grows, orows)) if g != o]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} differing rows; first 3:")
            for i, g, o in bad[:3]:
                for c, gv, ov in zip(gcols, g, o):
                    if gv != ov:
                        print(f"  row {i} col {c}: ours={gv!r} oracle={ov!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
