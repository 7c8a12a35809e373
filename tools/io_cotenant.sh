#!/bin/bash
# IO co-tenant for contention profiling (VERDICT r17 item 2): the r17
# CPU-spinner cells moved queries <=1.2x, yet the driver battery showed
# 13-80x inflation on trivial and checkpoint-heavy queries alike - the
# missing variable is plausibly IO/page-cache, not CPU. This script
# emulates a disk-writing co-tenant: N workers loop fdatasync'd 2 GiB
# writes (competes for the block device and dirty-page writeback) and
# full reads of the sf0.1 testdata (churns the page cache the bench's
# parquet scans rely on).
#
# Usage: tools/io_cotenant.sh [n_workers] &   then kill %1 to stop.
set -u
N="${1:-4}"
TD="${2:-/root/testdata/sf0.1}"
trap 'kill 0' EXIT
for i in $(seq 1 "$N"); do
  (
    while :; do
      dd if=/dev/zero of="/tmp/io_load_$i" bs=1M count=2048 conv=fdatasync 2>/dev/null
      cat "$TD"/*.parquet > /dev/null 2>&1
      rm -f "/tmp/io_load_$i"
    done
  ) &
done
wait
