#!/bin/bash
# Run graft.Bench once the 1-min load average has decayed below the idle
# threshold, so recordings are comparable (CLAUDE.md: load_start > ~2 flags a
# contended recording; in practice even ~1 skews sub-second queries).
# Usage: tools/idle_bench.sh <out_log> [sidecar_copy]
set -u
OUT=$1
SIDE=${2:-}
for i in $(seq 1 60); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l < 0.30)}' && break
  sleep 10
done
cut -d' ' -f1-3 /proc/loadavg
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
sbt -batch "runMain graft.Bench" > "$OUT" 2>&1
grep -o '"load_start":[0-9.]*\|"value":[0-9.]*' "$OUT" | tail -2
if [ -n "$SIDE" ]; then cp bench_full.json "$SIDE"; fi
