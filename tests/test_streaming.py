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


def test_stream_monitor_with_reference_artifacts(
    spark, tmp_path, ref_df, allowed_sources_df
):
    """Micro-batch re-validation with the full check set: drift vs the
    broadcast reference snapshot and per-row token equality vs digests,
    inside foreachBatch."""
    from data_drift_monitoring_spark.generator import generate_sequences
    from data_drift_monitoring_spark.operators.invariants import token_digests
    from data_drift_monitoring_spark.plans.reference import build_ref_stats

    inp = str(tmp_path / "landing2")
    out = str(tmp_path / "verdicts2")
    ckpt = str(tmp_path / "ckpt2")
    generate_sequences(inp, "cur_drifted", rows=4000, num_partitions=8)

    q = start_monitor(
        spark, inp, out, ckpt,
        ref_stats=build_ref_stats(ref_df),
        allowed_sources=allowed_sources_df,
        ref_digests=token_digests(ref_df),
    )
    q.awaitTermination(180)
    v = spark.read.parquet(out)
    checks = {r["check"] for r in v.select("check").distinct().collect()}
    assert {"missing_values", "length_consistency", "uniqueness",
            "referential", "drift_psi", "drift_ks", "token_equality"} <= checks
    # drifted partitions flagged inside the stream too
    psi_large = {
        r["part_id"]
        for r in v.filter(
            (F.col("check") == "drift_psi")
            & (F.col("column") == "n_tok")
            & (F.col("severity") == "large")
        ).collect()
    }
    assert {6, 7} <= psi_large


def test_parse_kafka_sequences_roundtrip(spark):
    """Kafka value-JSON → SEQUENCES_SCHEMA rows, tested on a batch frame
    shaped like a kafka source (no broker in the sandbox)."""
    import json

    from data_drift_monitoring_spark.streaming import parse_kafka_sequences

    docs = [
        {"part_id": 0, "doc_id": "a", "tokens": [1, 2, 3], "n_tok": 3,
         "source": "web"},
        {"part_id": 1, "doc_id": "b", "tokens": [9], "n_tok": 1,
         "source": "books"},
    ]
    raw = spark.createDataFrame(
        [
            ("k0".encode(), json.dumps(d).encode(), "seq", 0, i, None)
            for i, d in enumerate(docs)
        ],
        "key binary, value binary, topic string, partition int, offset long,"
        " timestamp timestamp",
    )
    out = sorted(
        parse_kafka_sequences(raw).collect(), key=lambda r: r["doc_id"]
    )
    assert [r["doc_id"] for r in out] == ["a", "b"]
    assert out[0]["tokens"] == [1, 2, 3] and out[0]["n_tok"] == 3
    assert out[1]["source"] == "books"


def test_alerts_from_verdicts_severity_floor(spark):
    from data_drift_monitoring_spark.streaming import alerts_from_verdicts

    v = spark.createDataFrame(
        [
            (0, "missing_values", "a", "low", False),
            (0, "uniqueness", "doc_id", "medium", False),
            (1, "referential", "source", "high", False),
            (1, "drift_psi", "n_tok", "large", False),
            (2, "missing_values", "b", "high", True),  # passed → no alert
        ],
        "part_id int, check string, column string, severity string,"
        " passed boolean",
    )
    out = {(r["part_id"], r["check"]): r for r in
           alerts_from_verdicts(v, "medium").collect()}
    assert set(out) == {(0, "uniqueness"), (1, "referential"),
                        (1, "drift_psi")}
    assert out[(0, "uniqueness")]["alert_level"] == "warning"
    assert out[(1, "referential")]["alert_level"] == "critical"
    assert out[(1, "drift_psi")]["alert_level"] == "critical"


def test_stream_monitor_alert_sink(spark, tmp_path, allowed_sources_df):
    """Planted referential violations must surface in the alerts table;
    the clean part of the stream produces none."""
    from data_drift_monitoring_spark.generator import generate_sequences

    inp = str(tmp_path / "landing3")
    out = str(tmp_path / "verdicts3")
    ckpt = str(tmp_path / "ckpt3")
    alerts = str(tmp_path / "alerts3")
    generate_sequences(inp, "cur_drifted", rows=2000, num_partitions=8)

    q = start_monitor(
        spark, inp, out, ckpt,
        allowed_sources=allowed_sources_df,
        alerts_dir=alerts,
        min_alert_severity="medium",
    )
    q.awaitTermination(120)
    a = spark.read.parquet(alerts)
    rows = a.collect()
    assert rows and all(not r["passed"] for r in rows)
    assert {"warning", "critical"} >= {r["alert_level"] for r in rows}
    assert any(r["check"] == "referential" for r in rows)


def test_alerts_to_messages(spark):
    from data_drift_monitoring_spark.streaming import (
        alerts_from_verdicts,
        alerts_to_messages,
    )

    v = spark.createDataFrame(
        [(3, "referential", "source", 12.0, 10.0, "high",
          "quarantine_unknown_sources", False)],
        "part_id int, check string, column string, value double, pct double,"
        " severity string, recommendation string, passed boolean",
    )
    msgs = alerts_to_messages(alerts_from_verdicts(v)).collect()
    assert len(msgs) == 1
    m = msgs[0]
    assert m["channel"] == "#data-quality"
    assert m["subject"] == "[CRITICAL] referential failed on partition 3"
    assert "severity=high" in m["body"]
    assert "recommendation=quarantine_unknown_sources" in m["body"]
