#!/usr/bin/env python3
"""Render the CROSSOVER.md per-query registry table from RegistryBench
JSON lines and bench_duckdb_registry JSON outputs.

Usage:
  python3 tools/crossover_table.py <spark_sf3.json-or-log> <duck_sf3.json>
  python3 tools/crossover_table.py <spark_sf3> <duck_sf3> <spark_sf6> <duck_sf6>

With 4 inputs emits the combined sf3+sf6 table with an sf3→sf6 Spark
scaling column. Accepts either the raw {"metric":"registry_sweep",...}
JSON line or a log file containing it. Floor/oracle annotations mirror the
round-2 write-up: sub-0.55 s-both-sides rows are floor-dominated; -2 duck
values are the 180 s cap; I/O-asymmetric source/sink rows keep their
standing note.
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


def load_duck(path):
    d = json.load(open(path))
    return d.get("queries", d)


def cell(v):
    if v is None:
        return "—"
    if v <= -2:
        return "**>180**"
    if v < 0:
        return "FAIL"
    return f"{v:.2f}"


def ratio_cell(s, d):
    if d is None or s is None or d <= -2 or d < 0 or s < 0:
        return ""
    if d == 0:
        return "∞"
    return f"{s / d:.2f}×"


def render_single(spark, duck):
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
        if d <= -2:
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


def render_combined(s3, d3, s6, d6):
    t = {"s3": 0.0, "d3": 0.0, "s6": 0.0, "d6": 0.0}
    n3 = n6 = 0
    print("| query | sf3 spark | sf3 duck | sf3 ratio | sf6 spark | sf6 duck | sf6 ratio | spark sf3→sf6 | note |")
    print("|---|---|---|---|---|---|---|---|---|")
    for q in sorted(s3):
        a, b = s3[q], d3.get(q)
        c, d = s6.get(q), d6.get(q)
        note = ""
        if b is None:
            note = "no oracle"
        elif q in IO_ROWS:
            note = IO_ROWS[q]
        elif b <= -2:
            note = "exact brute-force oracle >180 s cap"
        elif b > 0 and a / b > 2:
            note = ("floor-dominated (sub-0.55 s)" if a < 0.55
                    else "data-proportional, explained below")
        if b is not None and b > 0 and a >= 0:
            t["s3"] += a
            t["d3"] += b
            n3 += 1
        if c is not None and d is not None and d > 0 and c >= 0:
            t["s6"] += c
            t["d6"] += d
            n6 += 1
        scale = f"{c / a:.2f}×" if (c is not None and a and a > 0 and c >= 0) else ""
        print(f"| {q} | {cell(a)} | {cell(b)} | {ratio_cell(a, b)} "
              f"| {cell(c)} | {cell(d)} | {ratio_cell(c, d)} | {scale} | {note} |")
    print()
    print(f"Totals (oracled-and-timed): sf3 Spark {t['s3']:.1f} s vs DuckDB "
          f"{t['d3']:.1f} s = {t['s3'] / t['d3']:.2f}× over {n3} queries; "
          f"sf6 Spark {t['s6']:.1f} s vs DuckDB {t['d6']:.1f} s = "
          f"{t['s6'] / t['d6']:.2f}× over {n6} queries.")


def main():
    if len(sys.argv) >= 5:
        render_combined(load_spark(sys.argv[1]), load_duck(sys.argv[2]),
                        load_spark(sys.argv[3]), load_duck(sys.argv[4]))
    else:
        render_single(load_spark(sys.argv[1]), load_duck(sys.argv[2]))


if __name__ == "__main__":
    main()
