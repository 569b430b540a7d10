"""numpy isolation forest: planted multivariate anomalies must score
higher than inliers; contamination controls the flagged fraction."""

from __future__ import annotations

import numpy as np
import pytest

from data_drift_monitoring_spark.operators.isolation_forest import (
    anomaly_stats,
    fit_isolation_forest,
    score_anomalies,
)


@pytest.fixture(scope="module")
def anomaly_df(spark):
    rng = np.random.default_rng(7)
    inliers = rng.normal(0, 1, size=(500, 2))
    outliers = rng.normal(8, 0.5, size=(25, 2))  # well-separated cluster
    rows = [
        (i, float(v[0]), float(v[1]), i >= 500, int(i % 4))
        for i, v in enumerate(np.vstack([inliers, outliers]))
    ]
    return spark.createDataFrame(
        rows, "id long, x double, y double, planted boolean, part_id int"
    )


def test_planted_anomalies_score_higher(spark, anomaly_df):
    model = fit_isolation_forest(
        anomaly_df, ["x", "y"], n_trees=50, contamination=0.05
    )
    scored = score_anomalies(anomaly_df, model).collect()
    planted = [r["anomaly_score"] for r in scored if r["planted"]]
    normal = [r["anomaly_score"] for r in scored if not r["planted"]]
    assert min(planted) > float(np.mean(normal))
    # the planted cluster dominates the flagged set (contamination=0.05
    # caps flags near the top ~26 of 525, so allow a couple of misses)
    flagged = {r["id"] for r in scored if r["is_anomaly"]}
    assert len(set(range(500, 525)) & flagged) >= 22
    # contamination bounds the flagged fraction loosely
    assert len(flagged) <= 0.12 * 525


def test_anomaly_stats_shape(spark, anomaly_df):
    model = fit_isolation_forest(
        anomaly_df, ["x", "y"], n_trees=30, contamination=0.05
    )
    out = {r["part_id"]: r for r in anomaly_stats(anomaly_df, model).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(r["n_rows"] > 0 for r in out.values())
    total_anoms = sum(r["anomalies"] for r in out.values())
    assert total_anoms >= 25  # at least the planted ones


def test_deterministic_in_seed(spark, anomaly_df):
    m1 = fit_isolation_forest(anomaly_df, ["x", "y"], n_trees=20)
    m2 = fit_isolation_forest(anomaly_df, ["x", "y"], n_trees=20)
    assert m1.threshold == m2.threshold
