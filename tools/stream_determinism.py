#!/usr/bin/env python3
"""Streaming determinism audit (VERDICT r15 item 7).

Runs graft.StreamAudit (StreamNearDup + NearDupClusterMaintainer over the
documents table) under three configurations —

    (SPARK_GRAFT_CPUS=32, 1 trigger)   the reference run
    (SPARK_GRAFT_CPUS=32, 3 triggers)  trigger-boundary lever only
    (SPARK_GRAFT_CPUS=8,  3 triggers)  thread/shuffle-partition lever too

— and exact-compares the dumped pair sets and cluster labelings: both
must be invariant to partitioning and trigger boundaries, the streaming
analogue of tools/determinism_check.py's 32-vs-8 Verify discipline.

Usage: python3 tools/stream_determinism.py [sfDir] [workDir]
"""
import os
import subprocess
import sys

import pandas as pd


def run(sf_dir: str, out: str, cpus: int, batches: int) -> None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.StreamAudit {sf_dir} {out} {batches}"],
        cwd="/root/repo", env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def load(out: str, what: str) -> pd.DataFrame:
    import glob
    files = glob.glob(f"{out}/{what}/*.parquet")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, work: str) -> int:
    configs = [("a", 32, 1), ("b", 32, 3), ("c", 8, 3)]
    for tag, cpus, batches in configs:
        print(f"run {tag}: cpus={cpus} batches={batches}")
        run(sf_dir, f"{work}/{tag}", cpus, batches)
    n_fail = 0
    ref = configs[0][0]
    for what in ("pairs", "labels"):
        base = load(f"{work}/{ref}", what)
        if len(base) == 0:
            print(f"FAIL {what}: reference run emitted nothing")
            n_fail += 1
            continue
        for tag, cpus, batches in configs[1:]:
            other = load(f"{work}/{tag}", what)
            if base.equals(other):
                print(f"OK   {what}: {ref} == {tag} ({len(base)} rows)")
            else:
                print(f"FAIL {what}: {ref} != {tag} "
                      f"({len(base)} vs {len(other)} rows)")
                n_fail += 1
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: stream determinism "
          f"({len(configs)} configs, pairs+labels)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wk = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_det"
    sys.exit(main(sf, wk))
