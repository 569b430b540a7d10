"""Logistic quality classifier: separability on a planted corpus,
layout-independent deterministic fit, numpy scoring parity, and a
UDF-free scoring plan."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators import quality_classifier as QC

GOOD_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "a",
              "lazy", "dog", "and", "runs", "to", "for", "is", "that"]


def _make_corpus(n=400, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        if good:
            text = " ".join(rng.choice(GOOD_WORDS) for _ in range(rng.randrange(40, 90)))
        else:
            text = "".join(
                rng.choice("!!##$$%%@@** ") for _ in range(rng.randrange(10, 30))
            ) + " ".join("zzz" for _ in range(rng.randrange(0, 4)))
        rows.append((f"doc{i:04d}", text, 1 if good else 0))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _make_corpus(), "doc_id string, text string, label int"
    ).repartition(6)


@pytest.fixture(scope="module")
def model(corpus):
    return QC.fit_quality_classifier(corpus, "label", seed=5)


def test_separates_planted_classes(spark, corpus, model):
    scored = QC.score_quality(corpus, model)
    agree = scored.select(
        F.avg((F.col("keep").cast("int") == F.col("label")).cast("double"))
    ).collect()[0][0]
    assert agree >= 0.9
    assert model.history[-1] > model.history[0]  # log-likelihood improved


def test_fit_is_layout_independent(spark, corpus, model):
    other = QC.fit_quality_classifier(corpus.repartition(13, "text"), "label", seed=5)
    assert other.weights == model.weights
    assert other.bias == model.bias
    assert other.mu == model.mu and other.sigma == model.sigma


def test_scoring_matches_numpy_mirror(spark, corpus, model):
    rows = QC.score_quality(corpus, model).select(
        "doc_id", *QC.FEATURES, "quality_prob"
    ).collect()
    w = np.array(model.weights)
    mu = np.array(model.mu)
    s = np.array(model.sigma)
    for r in rows:
        x = np.array([r[f] for f in QC.FEATURES])
        p = 1.0 / (1.0 + math.exp(-(float(w @ ((x - mu) / s)) + model.bias)))
        assert abs(round(p, 6) - r["quality_prob"]) <= 1e-6, r["doc_id"]


def test_zero_variance_feature_guarded(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "same text always", i % 2) for i in range(40)],
        "doc_id string, text string, label int",
    )
    m = QC.fit_quality_classifier(df, "label")
    assert all(s == 1.0 for s in m.sigma)  # identical docs: every sigma guarded
    assert all(abs(w) < 1e-9 for w in m.weights)


def test_scoring_plan_is_pure_expressions(spark, model):
    flat = spark.createDataFrame(
        _make_corpus(50), "doc_id string, text string, label int"
    )
    plan = (
        QC.score_quality(flat, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert marker not in plan
