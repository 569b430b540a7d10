"""Scoring and verdict when-chains: field-for-field parity with the
reference formulas (quality_scorer.py, missing_values.py, duplicates.py,
outliers.py decision trees)."""

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.functions import verdicts as V
from data_drift_monitoring_spark.functions.scoring import overall_score, quick_score


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "pct,expected",
    [(0.0, "low"), (9.99, "low"), (10.0, "medium"), (49.9, "medium"), (50.0, "high")],
)
def test_missing_severity(spark, pct, expected):
    assert _eval(spark, V.missing_severity(F.lit(pct))) == expected


@pytest.mark.parametrize(
    "pct,expected",
    [(0.0, "none"), (0.5, "low"), (1.0, "medium"), (4.9, "medium"), (5.0, "high")],
)
def test_duplicate_severity(spark, pct, expected):
    assert _eval(spark, V.duplicate_severity(F.lit(pct))) == expected


@pytest.mark.parametrize(
    "pct,expected",
    [
        (0.0, "no_action"),
        (0.5, "keep_first"),
        (3.0, "review_and_remove"),
        (10.0, "investigate_cause"),
        (25.0, "major_issue_investigate"),
    ],
)
def test_duplicate_recommendation(spark, pct, expected):
    assert _eval(spark, V.duplicate_recommendation(F.lit(pct))) == expected


@pytest.mark.parametrize(
    "pct,skew,expected",
    [
        (0.0, 0.0, "no_action"),
        (0.5, 0.0, "investigate"),
        (3.0, 2.0, "transform_log"),
        (3.0, 0.5, "winsorize"),
        (7.0, 0.0, "clip_bounds"),
        (15.0, 0.0, "investigate_data_quality"),
    ],
)
def test_outlier_recommendation(spark, pct, skew, expected):
    assert (
        _eval(spark, V.outlier_recommendation(F.lit(pct), F.lit(skew)))
        == expected
    )


@pytest.mark.parametrize(
    "psi,expected", [(0.05, "none"), (0.15, "moderate"), (0.30, "large")]
)
def test_psi_classification(spark, psi, expected):
    assert _eval(spark, V.psi_classification(F.lit(psi))) == expected


@pytest.mark.parametrize(
    "score,expected",
    [
        (95.0, "Excellent"),
        (85.0, "Very Good"),
        (75.0, "Good"),
        (65.0, "Fair"),
        (55.0, "Poor"),
        (20.0, "Critical"),
    ],
)
def test_grade(spark, score, expected):
    assert _eval(spark, V.grade(F.lit(score))) == expected


def test_overall_score_weights(spark):
    # 10% missing, 0% dup, 0% outlier → 90*0.3 + 100*0.25 + 100*0.25 + 100*0.2
    got = _eval(
        spark, overall_score(F.lit(10.0), F.lit(0.0), F.lit(0.0))
    )
    assert got == round(90 * 0.30 + 100 * 0.25 + 100 * 0.25 + 100 * 0.20, 2)


def test_overall_score_clamps_at_zero(spark):
    got = _eval(
        spark, overall_score(F.lit(100.0), F.lit(100.0), F.lit(250.0))
    )
    assert got == 20.0  # only the schema component remains


def test_quick_score(spark):
    # quality_check.py:282: 100 - (miss*0.3 + dup*0.7)
    assert _eval(spark, quick_score(F.lit(10.0), F.lit(10.0))) == 90.0


def test_missing_recommendation_dtype_tree(spark):
    rec = V.missing_recommendation
    assert (
        _eval(spark, rec(F.lit(60.0), F.lit("double"), F.lit(0.0)))
        == "drop_column"
    )
    assert (
        _eval(spark, rec(F.lit(5.0), F.lit("double"), F.lit(2.0)))
        == "impute_median"
    )
    assert (
        _eval(spark, rec(F.lit(5.0), F.lit("double"), F.lit(0.2)))
        == "impute_mean"
    )
    assert (
        _eval(spark, rec(F.lit(5.0), F.lit("string"), F.lit(None).cast("double")))
        == "impute_mode"
    )
    assert (
        _eval(spark, rec(F.lit(5.0), F.lit("timestamp"), F.lit(0.0)))
        == "forward_fill"
    )
