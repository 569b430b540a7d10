"""Streaming re-validation latency evidence (VERDICT r2 #9): time the
availableNow micro-batch monitor over a growing parquet landing dir —
cold backlog drain, then an incremental drop against the same checkpoint
(the "new data arrived, re-validate" path) — and report rows/sec and
per-batch latency. Streaming was correctness-tested but never measured.

Usage: python scripts/bench_streaming.py [--rows 500000] [--cpus 16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_drift_monitoring_spark.generator import (
        generate_allowed_sources,
        generate_sequences,
    )
    from data_drift_monitoring_spark.operators.invariants import token_digests
    from data_drift_monitoring_spark.plans.reference import build_ref_stats
    from data_drift_monitoring_spark.session import get_spark
    from data_drift_monitoring_spark.streaming.monitor import start_monitor

    spark = get_spark(
        master=f"local[{args.cpus}]", shuffle_partitions=max(args.cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_streaming_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "verdicts")
    ckpt = os.path.join(work, "ckpt")
    refdir = os.path.join(work, "ref")
    try:
        # reference artifacts (broadcast sides of the streamed checks)
        generate_sequences(refdir, "ref", rows=args.rows, num_partitions=8)
        ref_df = spark.read.parquet(refdir)
        ref_stats = build_ref_stats(ref_df)
        srcs = spark.read.parquet(
            generate_allowed_sources(os.path.join(work, "srcs"))
        )
        digests = token_digests(ref_df)

        # backlog: 4 drops; maxFilesPerTrigger=64 > 4*8 files → ONE batch
        # drains the whole backlog (throughput mode)
        for i in range(4):
            generate_sequences(
                os.path.join(landing),
                "cur_clean",
                rows=args.rows // 4,
                num_partitions=8,
                seed=100 + i,
            )
            # generate_sequences writes fixed file names; move to unique ones
            for f in os.listdir(landing):
                if f.startswith("part-") and not f.startswith("part-b"):
                    shutil.move(
                        os.path.join(landing, f),
                        os.path.join(landing, f"part-b{i}-{f[5:]}"),
                    )

        t0 = time.time()
        q = start_monitor(
            spark, landing, out, ckpt,
            ref_stats=ref_stats, allowed_sources=srcs, ref_digests=digests,
        )
        q.awaitTermination(600)
        t_backlog = time.time() - t0
        n_batches_cold = (
            spark.read.parquet(out).select("batch_id").distinct().count()
        )

        # incremental drop: one new micro-batch against the warm checkpoint
        generate_sequences(
            os.path.join(landing), "cur_drifted",
            rows=args.rows // 4, num_partitions=8, seed=999,
        )
        t0 = time.time()
        q = start_monitor(
            spark, landing, out, ckpt,
            ref_stats=ref_stats, allowed_sources=srcs, ref_digests=digests,
        )
        q.awaitTermination(600)
        t_incr = time.time() - t0

        verdicts = spark.read.parquet(out)
        n_verdicts = verdicts.count()
        n_batches = verdicts.select("batch_id").distinct().count()
        print(
            json.dumps(
                {
                    "metric": "streaming_validation",
                    "loadavg_1m": round(os.getloadavg()[0], 2),
                    "cpus": args.cpus,
                    "backlog_rows": args.rows,
                    "backlog_sec": round(t_backlog, 1),
                    "backlog_rows_per_sec": round(args.rows / t_backlog),
                    "backlog_batches": int(n_batches_cold),
                    "incremental_rows": args.rows // 4,
                    "incremental_sec": round(t_incr, 1),
                    "incremental_rows_per_sec": round(
                        (args.rows // 4) / t_incr
                    ),
                    "total_batches": int(n_batches),
                    "total_verdict_rows": int(n_verdicts),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
