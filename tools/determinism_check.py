#!/usr/bin/env python3
"""Partitioning-determinism audit: positional diff of two Verify dumps.

Usage:
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify <sfDir> /tmp/dump_a"
  SPARK_GRAFT_CPUS=8  sbt "runMain graft.Verify <sfDir> /tmp/dump_b"
  python3 tools/determinism_check.py /tmp/dump_a /tmp/dump_b

Every query's output must be row-for-row, value-for-value identical
across thread/partition counts: the driver's hash compare keeps rows in
file order and trusts each query's ORDER BY, so a non-total sort key
(ties broken by engine/partition order) is a latent flake even when a
single gate run passes. This catches it suite-wide (found q6's
duplicate (suppkey, shipdate, orderkey, linenumber) group in round 4 —
the synthetic lineitem does not honor (orderkey, linenumber)
uniqueness: 118k dup groups at sf0.1).
"""
import json
import sys

import duckdb
import pandas as pd


def main(dir_a: str, dir_b: str) -> int:
    con = duckdb.connect()
    names = sorted(json.load(open(f"{dir_a}/oracle_sql.json")).keys())
    bad = []
    for n in names:
        try:
            da = con.execute(f"SELECT * FROM '{dir_a}/{n}/*.parquet'").df()
            db = con.execute(f"SELECT * FROM '{dir_b}/{n}/*.parquet'").df()
        except Exception as e:
            bad.append((n, f"read error: {e}"))
            continue
        if len(da) != len(db):
            bad.append((n, f"rows {len(da)} vs {len(db)}"))
            continue
        try:
            pd.testing.assert_frame_equal(da, db, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {n}")
        except AssertionError:
            bad.append((n, "positional value mismatch"))
    if bad:
        for n, why in bad:
            print(f"FAIL {n}: {why}")
        print(f"FAIL: {len(bad)}/{len(names)} queries differ across partitionings")
        return 1
    print(f"PASS: {len(names)}/{len(names)} queries identical across partitionings")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
