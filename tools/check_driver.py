#!/usr/bin/env python3
"""Driver-faithful correctness gate (pandas-dtype-sensitive).

Usage: python3 tools/check_driver.py <sfDir> <verifyOutDir> [names...]

Mirrors the driver's t2 compare as closely as we can infer it from
CORRECTNESS_r01.json behavior, where tools/check_oracle.py was too lenient:

  - loads our parquet AND the DuckDB oracle result into pandas DataFrames
  - sorts columns by name, then sort_values over ALL columns (this is what
    crashes on array cells -- we deliberately do NOT tuple-ize, so an
    array-typed output column fails here exactly like it fails the driver)
  - hashes with pandas.util.hash_pandas_object, which is dtype-sensitive:
    int64 1 != float64 1.0 (this is what caught stream_session_windows r01)

Reports rows_match / schema_match / hash_match per query like the driver.
Exit 1 if any oracled query is not triple-green. check_oracle.py remains the
cell-level debugging tool (it prints WHICH cells differ); this is the gate.
"""
import json
import sys
import traceback

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            # Load ours through DuckDB too: r01 evidence says the driver does
            # (date32 passed as datetime64 both sides; list cells crashed as
            # numpy.ndarray; HUGEINT came back float64).
            ours = canon(con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            theirs = canon(con.execute(oracle[name]).df())
            rows = len(ours) == len(theirs)
            schema = list(ours.columns) == list(theirs.columns)
            h = rows and schema and frame_hash(ours) == frame_hash(theirs)
        except Exception:
            print(f"FAIL {name}: compare crashed (driver would report err):")
            traceback.print_exc(limit=1)
            n_bad += 1
            continue
        if rows and schema and h:
            print(f"ok   {name} ({len(ours)} rows)")
            n_ok += 1
        else:
            detail = []
            if not rows:
                detail.append(f"rows ours={len(ours)} oracle={len(theirs)}")
            if not schema:
                detail.append(f"cols ours={list(ours.columns)} oracle={list(theirs.columns)}")
            if rows and schema and not h:
                dt = [(c, str(ours[c].dtype), str(theirs[c].dtype))
                      for c in ours.columns if str(ours[c].dtype) != str(theirs[c].dtype)]
                detail.append(f"hash mismatch; dtype diffs={dt or 'none (value diff)'}")
            print(f"FAIL {name}: {'; '.join(detail)}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
