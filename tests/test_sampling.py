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


def test_mixture_rates_math(spark, corpus):
    from data_drift_monitoring_spark.operators.sampling import (
        mixture_rates,
    )

    n_a = corpus.filter("source = 'a'").count()
    n_b = corpus.filter("source = 'b'").count()
    # target 50/50 from a 2:1 corpus: the scarce stratum (b) pins T
    rates = mixture_rates(corpus, {"a": 0.5, "b": 0.5})
    t_max = min(n_a / 0.5, n_b / 0.5)
    assert rates["b"] == pytest.approx(0.5 * t_max / n_b)  # == 1.0
    assert rates["a"] == pytest.approx(0.5 * t_max / n_a)
    assert rates["b"] == pytest.approx(1.0)
    # budget cap scales every rate down proportionally
    capped = mixture_rates(corpus, {"a": 0.5, "b": 0.5}, budget_rows=100)
    assert capped["a"] == pytest.approx(50 / n_a)
    assert capped["b"] == pytest.approx(50 / n_b)


def test_mixture_infeasible_raises(spark, corpus):
    from data_drift_monitoring_spark.operators.sampling import (
        mixture_rates,
    )

    with pytest.raises(ValueError, match="infeasible"):
        mixture_rates(corpus, {"a": 0.5, "missing": 0.5})


def test_rebalance_mixture_and_determinism(spark, corpus):
    from data_drift_monitoring_spark.operators.sampling import (
        rebalance_to_mixture,
    )

    kept = rebalance_to_mixture(corpus, {"a": 0.5, "b": 0.5})
    by = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # expected-mixture within hash-sampling noise
    assert by["a"] == pytest.approx(by["b"], rel=0.15)
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(
        r.doc_id
        for r in rebalance_to_mixture(corpus, {"a": 0.5, "b": 0.5}).collect()
    )
    assert ids1 == ids2
    # untargeted strata are dropped
    only_a = rebalance_to_mixture(corpus, {"a": 1.0})
    assert only_a.filter("source = 'b'").count() == 0


def test_stratified_sample_int_strata(spark):
    """Regression: a hardcoded string rate-table schema made int strata
    join nothing (every row silently fell to default_rate)."""
    from data_drift_monitoring_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, i % 2 + 1) for i in range(2000)], "doc_id long, src_id int"
    )
    kept = stratified_sample(
        df, {1: 1.0, 2: 0.0}, strata_col="src_id", key_col="doc_id"
    )
    got = {r.src_id for r in kept.select("src_id").distinct().collect()}
    assert got == {1}
    assert kept.count() == 1000
