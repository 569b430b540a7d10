"""Deterministic stratified sampling: reproducibility, subset composition,
rate accuracy, and the shuffle-free plan shape."""

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators.sampling import (
    SAMPLE_DENOM,
    sample_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_sample_is_deterministic(spark, corpus):
    ids1 = {
        r.doc_id
        for r in stratified_sample(corpus, {"a": 0.3, "b": 0.7}).collect()
    }
    ids2 = {
        r.doc_id
        for r in stratified_sample(
            corpus.repartition(7), {"a": 0.3, "b": 0.7}
        ).collect()
    }
    assert ids1 == ids2 and ids1


def test_lower_rate_is_subset(spark, corpus):
    """Monotone down-sampling: rate 0.2 keep set ⊆ rate 0.5 keep set."""
    big = {r.doc_id for r in stratified_sample(corpus, {"a": 0.5, "b": 0.5}).collect()}
    small = {r.doc_id for r in stratified_sample(corpus, {"a": 0.2, "b": 0.2}).collect()}
    assert small <= big


def test_rates_and_default(spark, corpus):
    kept = stratified_sample(
        corpus, {"a": 0.25}, default_rate=1.0
    ).groupBy("source").count().collect()
    by = {r.source: r["count"] for r in kept}
    n_a = corpus.filter("source = 'a'").count()
    n_b = corpus.filter("source = 'b'").count()
    assert by["b"] == n_b  # default 1.0 keeps every row
    assert by["a"] == pytest.approx(0.25 * n_a, rel=0.2)
    # zero default drops unknown strata entirely
    assert (
        stratified_sample(corpus, {"a": 0.25}).filter("source = 'b'").count()
        == 0
    )


def test_hash_uniformity_and_plan(spark, corpus):
    """Hash lands uniformly in [0, D); the sample plan has no exchange of
    the corpus (broadcast rates + filter only)."""
    mean = (
        corpus.select(sample_hash("doc_id").alias("h"))
        .agg(F.avg("h"))
        .collect()[0][0]
    )
    assert mean == pytest.approx(SAMPLE_DENOM / 2, rel=0.05)
    plan = stratified_sample(
        corpus, {"a": 0.3, "b": 0.4}
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only exchange feeding the join is the broadcast of the rate table
    assert "Exchange hashpartitioning" not in plan
