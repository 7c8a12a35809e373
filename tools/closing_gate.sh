#!/bin/bash
# Round-closing correctness gate (VERDICT r15 item 1): re-run the full
# Verify dump + the DuckDB oracle compare from a clean output dir, and
# FAIL LOUDLY if any artifact is empty or partial — the r15 driver
# artifact came back {} while the suite passed 261/261, so artifact
# PRESENCE is now part of the gate. The PASS line + oracle_sql.json
# checksum this prints are committed into BASELINE.md each round.
#
# Usage: tools/closing_gate.sh [sfDir] [outDir]
set -uo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_gate}

rm -rf "$OUT"
(cd /root/repo && sbt -batch "runMain graft.Verify $SF $OUT") || {
  echo "GATE FAIL: Verify run failed"; exit 1; }

test -s "$OUT/oracle_sql.json" || {
  echo "GATE FAIL: oracle_sql.json missing or empty"; exit 1; }
test -s "$OUT/SELFCHECK.json" || {
  echo "GATE FAIL: SELFCHECK.json missing or empty"; exit 1; }

python3 - "$OUT" <<'EOF' || exit 1
import json, sys
out = sys.argv[1]
sc = json.load(open(f"{out}/SELFCHECK.json"))
oracle = json.load(open(f"{out}/oracle_sql.json"))
bad = []
if sc["dumped"] == 0: bad.append("zero queries dumped")
if sc["failed"]: bad.append(f"failed queries: {sc['failed']}")
if len(oracle) == 0: bad.append("oracle_sql.json parsed empty")
if sc["oracle_entries"] != len(oracle):
    bad.append(f"oracle entry drift: SELFCHECK {sc['oracle_entries']} vs parsed {len(oracle)}")
if sc["dump_dirs_with_parquet"] < sc["dumped"]:
    bad.append(f"dump dirs {sc['dump_dirs_with_parquet']} < dumped {sc['dumped']}")
if bad:
    print("GATE FAIL: " + "; ".join(bad)); sys.exit(1)
print(f"SELFCHECK OK: dumped={sc['dumped']} oracle_entries={len(oracle)} "
      f"sha256={sc['oracle_sha256'][:16]}")
EOF

python3 tools/oracle_check.py "$SF" "$OUT" | tee "$OUT/oracle_check.log"
rc=${PIPESTATUS[0]}
echo "---- BASELINE.md rows ----"
tail -3 "$OUT/oracle_check.log"
echo "oracle_sql.json sha256[0:16]=$(sha256sum "$OUT/oracle_sql.json" | cut -c1-16)  entries=$(python3 -c "import json;print(len(json.load(open('$OUT/oracle_sql.json'))))")"
exit "$rc"
