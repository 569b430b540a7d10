"""CUSUM / Page–Hinkley model-metric drift (README.md:64-70 semantics the
reference never implemented): a planted accuracy drop must alarm, a
stationary series must not, and the streaming stateful variant must carry
detector state across micro-batches."""

from __future__ import annotations

import numpy as np
import pytest

from data_drift_monitoring_spark.operators.model_drift import (
    metric_drift,
    streaming_metric_drift,
)


def _series(spark, name, values):
    return spark.createDataFrame(
        [(i, name, float(v)) for i, v in enumerate(values)],
        "ts long, metric string, value double",
    )


@pytest.fixture(scope="module")
def shifted(spark):
    rng = np.random.default_rng(3)
    stable = 0.92 + rng.normal(0, 0.004, 40)       # in-control accuracy
    dropped = 0.84 + rng.normal(0, 0.004, 20)      # concept drift: -8 pts
    acc = _series(spark, "accuracy", np.concatenate([stable, dropped]))
    rmse = _series(spark, "rmse", 1.0 + rng.normal(0, 0.01, 60))  # stationary
    return acc.unionByName(rmse)


def test_batch_detects_planted_shift(spark, shifted):
    out = {r["metric"]: r for r in metric_drift(shifted).collect()}
    acc = out["accuracy"]
    assert acc["drift_detected"] and acc["cusum_alarm"]
    # alarm fires shortly AFTER the change point at index 40
    assert 40 <= acc["cusum_first_alarm_idx"] <= 46
    assert acc["recommendation"] == "retrain_model"
    rmse = out["rmse"]
    assert not rmse["drift_detected"]
    assert rmse["recommendation"] == "no_action"


def test_explicit_baseline_beats_warmup(spark):
    # series drifted from the very first point: warmup would normalize it
    # away, an explicit baseline catches it
    s = _series(spark, "f1", [0.70] * 30)
    out = metric_drift(s, baseline={"f1": (0.90, 0.01)}).collect()[0]
    assert out["drift_detected"] and out["cusum_first_alarm_idx"] <= 3


def test_streaming_state_carries_across_batches(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    import os

    os.makedirs(inp)
    rng = np.random.default_rng(5)

    def write_batch(name, ts0, values):
        tbl = pa.table(
            {
                "ts": pa.array(range(ts0, ts0 + len(values)), pa.int64()),
                "metric": pa.array(["accuracy"] * len(values)),
                "value": pa.array([float(v) for v in values]),
            }
        )
        pq.write_table(tbl, os.path.join(inp, f"{name}.parquet"))

    # batch 1: in-control — no alarm yet
    write_batch("b1", 0, 0.92 + rng.normal(0, 0.004, 30))

    def run_once():
        stream = spark.readStream.schema(
            "ts long, metric string, value double"
        ).parquet(inp)
        q = (
            streaming_metric_drift(stream, {"accuracy": (0.92, 0.004)})
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    v1 = spark.read.parquet(out).collect()
    assert all(not r["drift_detected"] for r in v1)

    # batch 2: the drop — state from batch 1 must already hold the
    # in-control CUSUM so the alarm fires within this batch
    write_batch("b2", 30, 0.84 + rng.normal(0, 0.004, 15))
    run_once()
    v2 = spark.read.parquet(out).collect()
    assert any(r["drift_detected"] and r["n"] == 45 for r in v2)
    alarmed = [r for r in v2 if r["drift_detected"]]
    assert all(r["recommendation"] == "retrain_model" for r in alarmed)
