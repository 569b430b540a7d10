"""Prepare flagship bench inputs at a scale where BOTH raw tables don't
fit on disk together (e.g. 100M rows = ~30 GB each vs ~48 GB free).

The timed flagship pass never reads the raw reference table — only its
~0.5 GB artifacts (per-partition stats + doc_id token digests) — so:

  1. generate seq_ref_<rows>            (~30 GB)
  2. build ref artifacts from it        (~1.3 GB)
  3. DELETE seq_ref's parquet files, keep the _DONE marker so
     bench._ensure_bench_data() won't regenerate it
  4. generate seq_cur_<rows>            (~30 GB)

Peak disk ≈ one raw table + artifacts. After this, run the ladder with
the markers satisfied:

  SPARK_GRAFT_SCALE_ROWS=<rows> python bench.py --scaling

Usage: python scripts/prep_large_flagship.py <rows>
"""
import glob
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

rows = int(sys.argv[1])
os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(rows)

import bench  # noqa: E402

from data_drift_monitoring_spark.generator import generate_sequences  # noqa: E402

ref_dir = os.path.join(bench.CACHE, f"seq_ref_{rows}_{bench.BENCH_PARTS}")
cur_dir = os.path.join(bench.CACHE, f"seq_cur_{rows}_{bench.BENCH_PARTS}")
art_marker = os.path.join(
    bench.CACHE, f"ref_artifacts_{rows}_{bench.BENCH_PARTS}", "_DONE"
)

t0 = time.time()
if not os.path.exists(art_marker):
    if not os.path.exists(os.path.join(ref_dir, "_DONE")):
        print(f"generating ref ({rows} rows)...", flush=True)
        generate_sequences(
            ref_dir, variant="ref", rows=rows,
            num_partitions=bench.BENCH_PARTS, seed=42,
        )
        open(os.path.join(ref_dir, "_DONE"), "w").close()
        print(f"  ref done at {time.time() - t0:.0f}s", flush=True)
    spark = bench._spark(16)  # artifact build is not a measurement
    spark.sparkContext.setLogLevel("ERROR")
    bench._ensure_ref_artifacts(spark, ref_dir)
    spark.stop()
    print(f"  artifacts done at {time.time() - t0:.0f}s", flush=True)

# reclaim the raw reference table; the marker keeps bench's cache check
# satisfied (the flagship reads only cur + artifacts)
removed = 0
for f in glob.glob(os.path.join(ref_dir, "part-*.parquet")):
    os.remove(f)
    removed += 1
print(f"  removed {removed} raw ref files", flush=True)

if not os.path.exists(os.path.join(cur_dir, "_DONE")):
    print(f"generating cur ({rows} rows)...", flush=True)
    generate_sequences(
        cur_dir, variant="ref_corrupted", rows=rows,
        num_partitions=bench.BENCH_PARTS, seed=42,
    )
    open(os.path.join(cur_dir, "_DONE"), "w").close()
print(f"prep complete at {time.time() - t0:.0f}s", flush=True)
