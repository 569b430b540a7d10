"""Outlier detection parity with the reference's IQR/z-score semantics
(outliers.py:179-235) via a pandas differential oracle."""

import numpy as np
import pandas as pd

from data_drift_monitoring_spark.operators.outliers import (
    clip_outliers,
    outlier_bounds,
    outlier_stats,
    remove_outliers,
)
from data_drift_monitoring_spark.operators.stats import column_profile


def _pandas_outliers(g: pd.Series, iqr_mult=1.5, z_t=3.0):
    data = g.dropna()
    q1, q3 = data.quantile(0.25), data.quantile(0.75)
    iqr = q3 - q1
    lo, hi = q1 - iqr_mult * iqr, q3 + iqr_mult * iqr
    iqr_mask = (data < lo) | (data > hi)
    std = data.std()
    if std == 0 or np.isnan(std):
        z_mask = pd.Series(False, index=data.index)
    else:
        z_mask = np.abs((data - data.mean()) / std) > z_t
    return int(iqr_mask.sum()), int(z_mask.sum()), int((iqr_mask | z_mask).sum())


def test_outlier_stats_vs_pandas(spark, cur_drifted_df):
    got = {
        r["part_id"]: r
        for r in outlier_stats(
            cur_drifted_df, columns=["n_tok"], exact_quantiles=True
        ).collect()
    }
    pdf = cur_drifted_df.select("part_id", "n_tok").toPandas()
    for p, g in pdf.groupby("part_id"):
        iqr_n, z_n, u_n = _pandas_outliers(g.n_tok.astype(float))
        assert got[p]["iqr_outliers"] == iqr_n, p
        assert got[p]["z_outliers"] == z_n, p
        assert got[p]["outlier_count"] == u_n, p


def test_sigma_zero_no_z_outliers(spark):
    df = spark.createDataFrame(
        [(0, 5.0)] * 30 + [(0, 500.0)], "part_id int, x double"
    )
    r = outlier_stats(df, columns=["x"], exact_quantiles=True).collect()[0]
    # constant quartiles → IQR 0 → the 500 is an IQR outlier; z fires too
    # since sd>0 here. True σ=0 case:
    df2 = spark.createDataFrame([(0, 5.0)] * 30, "part_id int, x double")
    r2 = outlier_stats(df2, columns=["x"], exact_quantiles=True).collect()[0]
    assert r2["z_outliers"] == 0 and r2["iqr_outliers"] == 0
    assert r["outlier_count"] >= 1


def test_clip_and_remove(spark):
    df = spark.createDataFrame(
        [(0, -100.0), (0, 5.0), (0, 7.0), (0, 900.0), (0, None)],
        "part_id int, x double",
    )
    clipped = [r["x"] for r in clip_outliers(df, "x", 0.0, 10.0).collect()]
    assert sorted(v for v in clipped if v is not None) == [0.0, 5.0, 7.0, 10.0]
    kept = remove_outliers(df, "x", 0.0, 10.0).count()
    assert kept == 3  # 5, 7, and the null row are kept


def test_bounds_formula(spark, cur_clean_df):
    prof = column_profile(
        cur_clean_df, columns=["n_tok"], exact_quantiles=True
    )
    b = {r["part_id"]: r for r in outlier_bounds(prof).collect()}
    p = {r["part_id"]: r for r in prof.collect()}
    for k in b:
        iqr = p[k]["q3"] - p[k]["q1"]
        assert abs(b[k]["iqr_lo"] - (p[k]["q1"] - 1.5 * iqr)) < 1e-9
        assert abs(b[k]["iqr_hi"] - (p[k]["q3"] + 1.5 * iqr)) < 1e-9
