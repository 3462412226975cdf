#!/usr/bin/env python3
"""Local replica of the driver's t2 duckdb-oracle correctness gate.

Usage: python tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB (views over the sfDir parquet tables), load the Spark result
parquet, sort columns by name and rows by all columns, and compare.
Reports exact match / float-close / mismatch per query.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    # Dtype-strict: an int64 Spark value vs a float64 oracle value must
    # FAIL here, because the driver hashes values with their types (that
    # is exactly how q40_values_join shipped red in round 5 while this
    # tool said OK). Only float-vs-float compares numerically.
    if pd.isna(a) and pd.isna(b):
        return True
    a_float = isinstance(a, float)
    b_float = isinstance(b, float)
    if a_float != b_float:
        return False
    if a_float:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"  # Spark-written directory tables (e.g. ScaleGen sf1)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    failures = 0
    checked = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        checked += 1
        sql = oracle[name]
        try:
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = []
        for cix, c in enumerate(want.columns):
            gv, wv = got[c].tolist(), want[c].tolist()
            for rix in range(len(wv)):
                if not values_equal(gv[rix], wv[rix]):
                    bad.append((c, rix, gv[rix], wv[rix]))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value mismatches, e.g. {bad[:3]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(want)} rows)")
    if only is not None and checked < len(only):
        # a typo'd filter must not read as a pass ("0/0 match", exit 0)
        missing = sorted(only - set(oracle))
        print(f"FAIL: filter names not in oracle_sql.json: {missing}")
        return 1
    print(f"\n{checked - failures}/{checked} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
