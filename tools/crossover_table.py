#!/usr/bin/env python3
"""Render the CROSSOVER.md per-query registry table from a RegistryBench
JSON line and a bench_duckdb_registry JSON output.

Usage: python3 tools/crossover_table.py <spark_sweep.json-or-log> <duck.json>

Accepts either the raw {"metric":"registry_sweep",...} JSON line or a log
file containing it. Floor/oracle annotations mirror the round-2 write-up:
sub-0.55 s-both-sides rows are floor-dominated; -2 duck values are the
180 s cap; I/O-asymmetric source/sink rows keep their standing note.
"""
import json
import sys

IO_ROWS = {
    "sink_csv_roundtrip": "writes+reads files; oracle only reads the source",
    "sink_partitioned_parquet": "writes+reads files; oracle only reads the source",
    "source_csv_typed": "writes+parses CSV; oracle reads parquet",
    "source_fixed_width": "writes+parses a text file; oracle reads parquet",
    "source_jsonl": "writes+parses JSON; oracle reads parquet",
    "catalog_introspect": "metadata-only; pure job floor",
    "etl_scd2_load": "multi-job composite; oracle is one trivial scan",
    "etl_surrogate_key": "zipWithIndex multi-job; oracle trivial",
    "etl_update_master": "multi-job composite; oracle trivial",
}


def load_spark(path):
    for line in open(path):
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])["queries"]
    raise SystemExit(f"no registry_sweep JSON line in {path}")


def main():
    spark = load_spark(sys.argv[1])
    duck = json.load(open(sys.argv[2]))
    duck = duck.get("queries", duck)
    total_s = total_d = 0.0
    n = 0
    print("| query | spark s | duckdb s | ratio | note |")
    print("|---|---|---|---|---|")
    for q in sorted(spark):
        s = spark[q]
        d = duck.get(q)
        note = ""
        if d is None:
            print(f"| {q} | {s:.2f} | — |  | no oracle |")
            continue
        if d == -2 or d <= -2:
            print(f"| {q} | {s:.2f} | **>180** |  | oracle >180 s cap |")
            continue
        if d < 0 or s < 0:
            print(f"| {q} | {s:.2f} | {d:.2f} |  | FAILED — investigate |")
            continue
        ratio = s / d if d > 0 else float("inf")
        total_s += s
        total_d += d
        n += 1
        if q in IO_ROWS:
            note = IO_ROWS[q]
        elif ratio > 2 and s < 0.55:
            note = "floor-dominated (sub-0.55 s)"
        elif ratio > 2:
            note = "data-proportional, explained below"
        rtxt = f"{ratio:.2f}×" if ratio != float("inf") else "∞"
        print(f"| {q} | {s:.2f} | {d:.2f} | {rtxt} | {note} |")
    print()
    print(f"Totals over the {n} oracled-and-timed queries: "
          f"Spark {total_s:.1f} s vs DuckDB {total_d:.1f} s = "
          f"{total_s / total_d:.2f}×")


if __name__ == "__main__":
    main()
