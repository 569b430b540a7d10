"""Deterministic sharding: assignment invariance, order reproducibility,
balance, exactly-once membership, and the one-exchange write plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators import sharding as SH

N_DOCS = 4000
N_SHARDS = 8


def _mirror_hash(key: str, seed: int) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("payload")
    )


def test_assignment_matches_python_mirror(spark, docs):
    rows = SH.assign_shards(docs, N_SHARDS, portable=True).collect()
    assert len(rows) == N_DOCS
    for r in rows[:200]:
        assert r["shard"] == _mirror_hash(str(r["doc_id"]), 0) % N_SHARDS
        assert r["sort_key"] == _mirror_hash(str(r["doc_id"]), 1)


@pytest.mark.parametrize("portable", [False, True])
def test_partitioning_invariance(spark, docs, portable):
    a = SH.assign_shards(docs.repartition(3), N_SHARDS, portable=portable)
    b = SH.assign_shards(docs.repartition(17, "payload"), N_SHARDS, portable=portable)
    diff = a.select("doc_id", "shard", "sort_key").exceptAll(
        b.select("doc_id", "shard", "sort_key")
    )
    assert diff.count() == 0


def test_layout_order_is_hash_order_and_exactly_once(spark, docs):
    out = SH.shard_layout(docs, N_SHARDS, portable=True)
    parts = out.select("shard", "sort_key", "doc_id").rdd.glom().collect()
    shard_home: dict[int, int] = {}
    seen = set()
    for pi, p in enumerate(parts):
        for r in p:
            # a shard's rows never straddle tasks
            assert shard_home.setdefault(r["shard"], pi) == pi
        keys = [(r["shard"], r["sort_key"], r["doc_id"]) for r in p]
        assert keys == sorted(keys)  # contiguous + deterministic order
        seen.update(r["doc_id"] for r in p)
    assert len(shard_home) == N_SHARDS
    assert len(seen) == N_DOCS  # every doc exactly once


def test_balance_and_stats(spark, docs):
    stats = SH.shard_stats(docs, N_SHARDS, portable=True).collect()
    assert [r["shard"] for r in stats] == list(range(N_SHARDS))
    assert sum(r["n_rows"] for r in stats) == N_DOCS
    assert sum(r["key_sum"] for r in stats) == N_DOCS * (N_DOCS - 1) // 2
    mean = N_DOCS / N_SHARDS
    for r in stats:
        assert abs(r["n_rows"] - mean) < 5 * (mean**0.5)


def test_seed_changes_order(spark, docs):
    a = SH.assign_shards(docs, N_SHARDS, seed=0, portable=True)
    b = SH.assign_shards(docs, N_SHARDS, seed=7, portable=True)
    moved = a.alias("a").join(b.alias("b"), "doc_id").filter(
        (F.col("a.shard") != F.col("b.shard"))
        | (F.col("a.sort_key") != F.col("b.sort_key"))
    )
    assert moved.count() > N_DOCS // 2


def test_single_exchange_plan(spark, docs):
    plan = (
        SH.shard_layout(docs, N_SHARDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
