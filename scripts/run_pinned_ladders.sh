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
ERRLOG=${OUT%.jsonl}.stderr.log
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
: > "$ERRLOG"
run() { # run <cores> <label> <cmd...>
  local cores=$1 label=$2; shift 2
  echo "# $label cores=$cores $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
  # a failing bench must abort the ladder with its label, not silently
  # contribute zero rows and leave the JSONL looking complete; stderr
  # goes to $ERRLOG instead of /dev/null so the failure is diagnosable
  local before after
  before=$(wc -l < "$OUT")
  SPARK_GRAFT_CPUS=$cores taskset -c 0-$((cores - 1)) "$@" 2>>"$ERRLOG" \
    | grep '^{' | sed "s/^{/{\"op\": \"$label\", \"pinned_cores\": $cores, /" >> "$OUT"
  local rc=${PIPESTATUS[0]}
  after=$(wc -l < "$OUT")
  if [ "$rc" -ne 0 ] || [ "$after" -le "$before" ]; then
    echo "FATAL: $label cores=$cores failed (rc=$rc, rows added=$((after - before))); stderr in $ERRLOG" >&2
    tail -15 "$ERRLOG" >&2
    exit 1
  fi
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
