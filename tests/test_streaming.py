"""Structured-Streaming monitor: micro-batch re-validation over arriving
sequence files (availableNow + foreachBatch + checkpoint resume)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_drift_monitoring_spark.generator import generate_sequences
from data_drift_monitoring_spark.streaming import (
    start_monitor,
    windowed_event_counts,
)


def test_stream_monitor_available_now(spark, tmp_path, allowed_sources_df):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    generate_sequences(inp, "ref", rows=2000, num_partitions=4)

    q = start_monitor(
        spark, inp, out, ckpt, allowed_sources=allowed_sources_df
    )
    q.awaitTermination(120)
    v = spark.read.parquet(out)
    assert v.select("batch_id").distinct().count() >= 1
    # clean fixture → every verdict passes, all 4 partitions covered
    assert v.filter("passed = false").count() == 0
    assert v.select("part_id").distinct().count() == 4

    # checkpoint resume: nothing new → no new batches, output unchanged
    n_before = v.count()
    q2 = start_monitor(
        spark, inp, out, ckpt, allowed_sources=allowed_sources_df
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before

    # new files land → exactly the new rows get validated
    extra = str(tmp_path / "extra")
    generate_sequences(extra, "cur_clean", rows=1000, num_partitions=4)
    for f in os.listdir(extra):
        shutil.copy(os.path.join(extra, f), os.path.join(inp, "new_" + f))
    q3 = start_monitor(
        spark, inp, out, ckpt, allowed_sources=allowed_sources_df
    )
    q3.awaitTermination(120)
    v3 = spark.read.parquet(out)
    assert v3.count() > n_before
    assert v3.select("batch_id").distinct().count() >= 2


def test_windowed_event_counts_batch_parity(spark, sf_dir=None):
    ev = spark.createDataFrame(
        [
            ("2026-01-01 00:10:00", "a"),
            ("2026-01-01 00:50:00", "a"),
            ("2026-01-01 01:10:00", "b"),
            ("2026-01-01 03:59:59", "a"),
        ],
        "ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in windowed_event_counts(
            ev, group_cols=["event_type"]
        ).collect()
    }
    assert out[("2026-01-01 00:00:00", "a")] == 2
    assert out[("2026-01-01 01:00:00", "b")] == 1
    assert out[("2026-01-01 03:00:00", "a")] == 1
