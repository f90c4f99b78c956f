#!/usr/bin/env python3
"""Compose BENCH_SF1.json — the sf1 scale-check bench artifact
(r13 verdict #3: the paired sf1 wall-time lived only in BENCHNOTES
prose; this makes it a machine-checked per-round artifact).

Usage:
  python3 tools/make_bench_sf1.py <bench_stdout_file> <bench_duckdb_sf1.json>

Takes graft.Bench's one-line contract JSON (run with
SPARK_GRAFT_SF_DIR=<sf1 dir>) and the sf1 pairing artifact written by
tools/bench_compare.py --out, and writes BENCH_SF1.json in the same
contract shape with the paired DuckDB denominator embedded:
  {"metric":"total","value":...,"queries":{...},"sf":"sf1",
   "duckdb_paired":{"total":...,"n":...},"ratio":...}
"""
import json
import sys


def main():
    bench_path, duck_path = sys.argv[1:3]
    raw = open(bench_path).read()
    line = next(l for l in raw.splitlines() if '"metric"' in l)
    bench = json.loads(line[line.index("{"):])
    duck = json.load(open(duck_path))
    bench["duckdb_paired"] = {"total": duck["duckdb_total"],
                              "n": duck["n_paired"]}
    if duck["duckdb_total"] > 0:
        # ratio over the PAIRED set only (bench total includes
        # rows-only queries DuckDB never runs)
        bench["ratio_paired"] = round(
            duck["spark_total"] / duck["duckdb_total"], 3)
    with open("BENCH_SF1.json", "w") as f:
        json.dump(bench, f, indent=1)
    print(f"BENCH_SF1.json: spark total {bench['value']}s, "
          f"paired duckdb {duck['duckdb_total']}s over "
          f"{duck['n_paired']} queries"
          + (f", ratio {bench.get('ratio_paired')}"
             if "ratio_paired" in bench else ""))


if __name__ == "__main__":
    main()
