#!/usr/bin/env python3
"""Side-by-side Spark-vs-DuckDB timing on the SAME oracle workload.

The ≤2x BASELINE.md target is a ratio against DuckDB running the very
oracle SQL that gates correctness — so the denominator must be measured
on the CURRENT workload, not a cached number from an earlier round's
smaller query set (round 3's "11.9x" compared against a 47-query 2.1 s
total; the md5-heavy dedup/winnow queries added since make DuckDB's
total several times larger).

Usage:
  python3 tools/bench_compare.py <sf_dir> <oracle_sql.json> <bench_json>

  sf_dir          parquet dir (e.g. /root/testdata/sf0.1)
  oracle_sql.json as written by graft.Verify
  bench_json      file holding graft.Bench's one-line JSON (the line may
                  carry an sbt "[info] " prefix; it is stripped)

DuckDB runs each oracle query N times (default 3, env BENCH_REPS) on 32
threads and keeps the minimum — the same min-of-N steady-state rule
graft.Bench applies, so both columns answer the same question.
"""
import argparse, duckdb, json, os, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_glob(sf_dir, t):
    # driver fixtures are single files; ScaleUp sf1 tables are
    # Spark-written DIRECTORIES of part files — resolve both
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_path")
    ap.add_argument("bench_path")
    ap.add_argument("--out", default="bench_duckdb.json",
                    help="pairing artifact path (default bench_duckdb"
                         ".json — pass another for the sf1 sweep so the"
                         " sf0.1 pairing isn't clobbered)")
    args = ap.parse_args()
    sf_dir, oracle_path, bench_path = \
        args.sf_dir, args.oracle_path, args.bench_path
    reps = int(os.environ.get("BENCH_REPS", "3"))
    oracle = json.load(open(oracle_path))
    raw = open(bench_path).read()
    line = next(l for l in raw.splitlines() if '"metric"' in l)
    bench = json.loads(line[line.index("{"):])
    spark_times = bench["queries"]
    # mechanical weak-entry classification inputs (r17 verdict #4):
    # jobs-per-rep and the noop job floor ride bench_detail.json — pass
    # that file as bench_json to get tags; the stdout contract line
    # lacks "jobs" and tags degrade to compute_dense/actionable only.
    jobs = bench.get("jobs", {})
    floor_noop = float(bench.get("floor_noop", 0.0))

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_glob(sf_dir, t)}')")

    duck = {}
    for name, q in sorted(oracle.items()):
        runs = []
        for _ in range(reps):
            t0 = time.time()
            con.execute(q).fetchall()
            runs.append(time.time() - t0)
        duck[name] = min(runs)

    # -1 marks a query that failed every bench rep — surface it, never
    # let the sentinel shrink a total or fabricate a ratio
    failed = sorted(n for n, t in spark_times.items() if t < 0)
    if failed:
        print(f"SPARK-FAILED (excluded): {', '.join(failed)}")
    spark_times = {n: t for n, t in spark_times.items() if t >= 0}
    common = sorted(set(duck) & set(spark_times))

    def weak_tag(n):
        """Mechanical classification of a weak entry (spark > 0.5 s AND
        > 2x paired), so weak-list membership and its reading stop
        churning with host scheduling / hand prose (r17 verdict #4):
          floor_bound   spark_s <= jobs_per_rep * floor_noop * 1.5 —
                        the entry is sequential-job-dispatch bound, not
                        compute bound; fewer jobs is the only lever.
          compute_dense duckdb_s >= 0.2 s — the oracle also burns real
                        CPU on this shape; the ratio reflects engine
                        constant factors, not a missing plan.
          actionable    neither excuse applies — a real target.
        Non-weak entries carry no tag (null)."""
        s, d = spark_times[n], duck[n]
        r = s / d if d > 0 else float("inf")
        if not (s > 0.5 and r > 2):
            return None
        j = jobs.get(n, -1)
        if j and j > 0 and floor_noop > 0 and s <= j * floor_noop * 1.5:
            return "floor_bound"
        if d >= 0.2:
            return "compute_dense"
        return "actionable"

    tags = {n: weak_tag(n) for n in common}
    print(f"{'query':24s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s} tag")
    for n in sorted(common, key=lambda n: -spark_times[n]):
        r = spark_times[n] / duck[n] if duck[n] > 0 else float("inf")
        print(f"{n:24s} {spark_times[n]:8.3f} {duck[n]:8.3f} {r:7.2f}"
              f" {tags[n] or ''}")
    s_tot = sum(spark_times[n] for n in common)
    d_tot = sum(duck[n] for n in common)
    extra = sorted(set(spark_times) - set(duck))
    print("-" * 50)
    print(f"{'TOTAL (oracled)':24s} {s_tot:8.2f} {d_tot:8.2f} "
          f"{s_tot / d_tot:7.2f}")
    if extra:
        e_tot = sum(spark_times[n] for n in extra)
        print(f"spark-only (rows-only checks, no oracle): "
              f"{', '.join(extra)} = {e_tot:.2f}s")
    # persist the pairing so the next graft.Bench run can stamp its
    # stdout line with a same-host DuckDB denominator (the r7 verdict's
    # numerator/denominator-from-different-sessions ambiguity)
    # per-query pairing included so the 2x-of-DuckDB criterion is
    # adjudicable query by query, not just in aggregate (a single query
    # 10x its oracle can no longer hide inside a green total)
    per_query = {n: {"spark_s": round(spark_times[n], 3),
                     "duckdb_s": round(duck[n], 3),
                     "ratio": round(spark_times[n] / duck[n], 3)
                              if duck[n] > 0 else None,
                     **({"tag": tags[n]} if tags[n] else {}),
                     **({"jobs": jobs[n]} if n in jobs else {})}
                 for n in common}
    weak = {t: sorted(n for n in common if tags[n] == t)
            for t in ("actionable", "floor_bound", "compute_dense")}
    weak = {t: ns for t, ns in weak.items() if ns}
    if weak:
        print("weak entries:", json.dumps(weak))
    with open(args.out, "w") as f:
        json.dump({"sf": sf_dir, "n_paired": len(common),
                   "spark_total": round(s_tot, 3),
                   "duckdb_total": round(d_tot, 3),
                   "ratio": round(s_tot / d_tot, 3),
                   "floor_noop": floor_noop,
                   "weak": weak,
                   "queries": per_query}, f)


if __name__ == "__main__":
    main()
