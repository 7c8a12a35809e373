#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view over <sfDir>/<table>.parquet, runs each oracle SQL, and
compares against the Spark-written parquet at <verifyOutDir>/<name>/
(sort columns by name, sort rows, exact value compare).
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Strict: columns sorted by name, rows kept in FILE order — the driver
    # relies on the queries' own ORDER BY, so we must too.
    return df.reindex(sorted(df.columns), axis=1)


# DuckDB types SUM(BIGINT) as HUGEINT (int128); pandas then widens it to
# float64 while Spark writes int64, so the driver's value hasher reads
# "1500.0" vs "1500" and fails even though the values match. Five r07
# queries shipped with exactly this latent failure because this mirror
# used check_dtype=False. Flag any oracle whose DESCRIBE output carries a
# 128-bit type: the fix is always CAST(... AS BIGINT) in the oracle SQL.
BAD_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def hugeint_columns(con, sql: str):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # the main run will surface the real error
    return [(c, t) for c, t, *_ in desc
            if any(b in t.upper() for b in BAD_DUCK_TYPES)]


def check_one(con, out_dir: str, name: str, sql: str):
    """Run one oracle compare; returns (err_message_or_None, n_rows)."""
    bad = hugeint_columns(con, sql)
    if bad:
        cols = ", ".join(f"{c} {t}" for c, t in bad)
        return (f"oracle output types 128-bit ({cols}) — the driver's "
                f"hasher will read float vs Spark's int64; "
                f"CAST(... AS BIGINT) in the oracle SQL", 0)
    try:
        want = con.execute(sql).df()
    except Exception as e:
        return (f"duckdb error: {e}", 0)
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        return (f"spark output missing: {e}", 0)
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        return (f"columns {list(g.columns)} != {list(w.columns)}", len(g))
    if len(w) != len(g):
        return (f"rows {len(g)} != {len(w)}", len(g))
    # Driver-faithful typing gate: a pandas kind mismatch (int vs
    # float vs object) is exactly what makes the driver's value
    # hasher diverge on otherwise-equal frames.
    kind_bad = [c for c in w.columns if w[c].dtype.kind != g[c].dtype.kind]
    if kind_bad:
        det = ", ".join(
            f"{c}: duck {w[c].dtype} vs spark {g[c].dtype}"
            for c in kind_bad)
        return (f"dtype kind mismatch ({det})", len(g))
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)
        return (None, len(g))
    except AssertionError as e:
        msg = f"value mismatch\n{str(e)[:2000]}"
        # show first differing cells
        for c in w.columns:
            neq = (w[c] != g[c]) & ~(w[c].isna() & g[c].isna())
            if neq.any():
                i = neq.idxmax()
                msg += f"\n  col {c} row {i}: spark={g[c][i]!r} duck={w[c][i]!r}"
        return (msg, len(g))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    # VERDICT r16 item 2: a 717s oracle hid inside a 17-minute pass for
    # two rounds because per-query cost was invisible. Time every query —
    # on the FAIL paths too (ADVICE r17: a slow oracle that also
    # mismatches must not escape the slowest-5 cost-visibility net) —
    # and print a slowest-5 footer so an oracle-cost regression is caught
    # the round it lands, not as a driver-budget {}.
    t_start = time.time()
    timings = []
    for name, sql in sorted(oracle.items()):
        t_q = time.time()
        err, n_rows = check_one(con, out_dir, name, sql)
        dt = time.time() - t_q
        timings.append((dt, name))
        if err is None:
            print(f"OK   {name}: {n_rows} rows ({dt:.1f}s)")
        else:
            print(f"FAIL {name} ({dt:.1f}s): {err}")
            n_fail += 1
    total = time.time() - t_start
    slow = sorted(timings, reverse=True)[:5]
    print("slowest 5: " + ", ".join(f"{n}={t:.1f}s" for t, n in slow))
    print(f"oracle wall: {total:.1f}s total, "
          f"max single {slow[0][0]:.1f}s ({slow[0][1]})" if slow
          else f"oracle wall: {total:.1f}s total")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: "
          f"{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
