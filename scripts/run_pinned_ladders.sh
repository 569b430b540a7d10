#!/bin/bash
# Pinned 1-vs-4-core re-measure of the four operator ladders whose
# round-3 N->4N numbers were taken unpinned (dedup 0.87, text analysis
# 0.801, contamination 0.843, embedding drift 0.823). Protocol matches
# the flagship headline: taskset pins each level to exactly its core
# budget so Python workers compete for the level's cores. 4-core level
# runs first so corpus-cache generation never happens inside the pinned
# 1-core measurement.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-.bench_cache/pinned_ladders.jsonl}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run() { # run <cores> <label> <cmd...>
  local cores=$1 label=$2; shift 2
  echo "# $label cores=$cores $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
  SPARK_GRAFT_CPUS=$cores taskset -c 0-$((cores - 1)) "$@" 2>/dev/null \
    | grep '^{' | sed "s/^{/{\"op\": \"$label\", \"pinned_cores\": $cores, /" >> "$OUT"
}
run 4 dedup          python scripts/bench_dedup_scale.py --docs 1000000 --cpus 4
run 1 dedup          python scripts/bench_dedup_scale.py --docs 1000000 --cpus 1
run 4 text_analysis  python scripts/bench_text_analysis.py --docs 1000000 --cpus 4
run 1 text_analysis  python scripts/bench_text_analysis.py --docs 1000000 --cpus 1
run 4 contamination  python scripts/bench_contamination_scale.py --docs 1000000 --cpus 4
run 1 contamination  python scripts/bench_contamination_scale.py --docs 1000000 --cpus 1
run 4 embedding_drift python scripts/bench_embedding_drift.py 4000000 4
run 1 embedding_drift python scripts/bench_embedding_drift.py 4000000 1
echo "# done $(date -u +%H:%M:%S)" >&2
cat "$OUT"
