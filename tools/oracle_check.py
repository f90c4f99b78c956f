#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir
parquet files), sorts columns by name, and compares row counts, schemas
(loosely), and values (floats to 1e-9 relative).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            actual = normalize(
                duckdb.connect().execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
                ).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} vs oracle {list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} vs oracle {len(expected)}")
            n_fail += 1
            continue
        ok = True
        for c in expected.columns:
            e, a = expected[c], actual[c]
            ek, ak = e.dtype.kind, a.dtype.kind
            # The driver hashes values exactly after sorting columns, so a
            # DuckDB HUGEINT->float64 coercion (3 vs 3.0) is a real FAIL:
            # never tolerance-compare across an int/float dtype mismatch.
            if ("f" in (ek, ak)) and ek != ak:
                print(f"FAIL {name}: col {c}: dtype mismatch spark={a.dtype} "
                      f"oracle={e.dtype} (int-vs-float breaks the driver hash; "
                      f"CAST the oracle sum to BIGINT or round both sides)")
                ok = False
                break
            if ek == "f" and ak == "f":
                import numpy as np
                ev, av = e.astype(float).values, a.astype(float).values
                both_nan = np.isnan(ev) & np.isnan(av)
                # exact, like the driver's hash — both sides must round
                # identically in the query SQL itself
                bad = ~((av == ev) | both_nan)
            else:
                bad = a.astype(str).values != e.astype(str).values
            if bad.any():
                i = int(bad.argmax())
                print(f"FAIL {name}: col {c} row {i}: spark={a.iloc[i]!r} oracle={e.iloc[i]!r}")
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(expected)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    # surface builder-side query failures recorded by graft.Verify —
    # a query that threw has no result dir, so without this it would
    # silently vanish from the gate (the round-6 pq_scan failure mode)
    import os
    fpath = f"{out_dir}/_failures.json"
    if os.path.exists(fpath):
        failures = json.load(open(fpath))
        for name, err in sorted(failures.items()):
            print(f"FAIL {name}: query threw in Verify: {err}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
