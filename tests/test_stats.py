"""Column-profile / sequence-stats parity against pandas (the differential
oracle of SURVEY.md §5.2.3) plus the reference's edge cases."""

import pandas as pd
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators.stats import (
    column_profile,
    missing_patterns,
    sequence_stats,
)


def test_mini_profile_matches_hand_computed(spark, mini_df):
    prof = {
        (r["column"]): r.asDict()
        for r in column_profile(
            mini_df, columns=["name", "salary"], exact_quantiles=True
        ).collect()
    }
    # reference test_file_handler.py:185-213: 1 missing name, 1 missing salary
    assert prof["name"]["null_count"] == 1
    assert prof["name"]["null_pct"] == 20.0
    assert prof["salary"]["null_count"] == 1
    pdf = pd.DataFrame({"salary": [50000.0, 60000.0, 80000.0, 90000.0]})
    assert abs(prof["salary"]["mean"] - pdf.salary.mean()) < 1e-9
    assert abs(prof["salary"]["stddev"] - pdf.salary.std()) < 1e-9  # ddof=1
    assert prof["salary"]["min"] == 50000.0
    assert prof["salary"]["max"] == 90000.0
    # exact percentile with linear interpolation == pandas quantile
    assert abs(prof["salary"]["median"] - pdf.salary.quantile(0.5)) < 1e-9
    assert abs(prof["salary"]["q1"] - pdf.salary.quantile(0.25)) < 1e-9


def test_profile_differential_vs_pandas(spark, cur_drifted_df):
    prof = (
        column_profile(cur_drifted_df, columns=["n_tok"], exact_quantiles=True)
        .orderBy("part_id")
        .collect()
    )
    pdf = cur_drifted_df.select("part_id", "n_tok").toPandas()
    for r in prof:
        g = pdf[pdf.part_id == r["part_id"]].n_tok
        assert r["n_rows"] == len(g)
        assert abs(r["mean"] - g.mean()) < 1e-9
        assert abs(r["stddev"] - g.std()) < 1e-9
        assert r["min"] == g.min() and r["max"] == g.max()
        assert abs(r["median"] - g.quantile(0.5)) < 1e-9


def test_constant_column_sigma_zero(spark):
    # σ=0 guard (outliers.py:220-225): stddev present but zero, no NaNs
    df = spark.createDataFrame(
        [(0, 7.0)] * 20, "part_id int, x double"
    )
    r = column_profile(df, columns=["x"]).collect()[0]
    assert r["stddev"] == 0.0
    assert r["mean"] == 7.0


def test_all_null_column(spark):
    df = spark.createDataFrame(
        [(0, None)] * 15, "part_id int, x double"
    )
    r = column_profile(df, columns=["x"]).collect()[0]
    assert r["null_count"] == 15 and r["null_pct"] == 100.0
    assert r["mean"] is None


def test_sequence_stats_drifted_partitions(spark, cur_drifted_df):
    rows = {r["part_id"]: r for r in sequence_stats(cur_drifted_df).collect()}
    assert rows[2]["null_doc_id"] > 0
    assert all(rows[p]["null_doc_id"] == 0 for p in (0, 1, 3, 4, 5, 6, 7))
    assert rows[5]["len_mismatch"] > 0
    assert all(rows[p]["len_mismatch"] == 0 for p in range(8) if p != 5)
    # drifted partitions have ~1.5x mean n_tok
    base = sum(rows[p]["mean_n_tok"] for p in range(6)) / 6
    assert rows[6]["mean_n_tok"] > 1.25 * base
    assert rows[7]["mean_n_tok"] > 1.25 * base
    # total_tokens is the declared token throughput
    assert rows[0]["total_tokens"] == sum(
        r.n_tok
        for r in cur_drifted_df.filter("part_id=0").select("n_tok").collect()
    )


def test_missing_patterns(spark, mini_df):
    r = missing_patterns(mini_df, columns=["name", "salary"]).collect()[0]
    assert r["rows_with_missing"] == 2
    assert r["rows_with_missing_pct"] == 40.0
    assert r["rows_multiple_missing"] == 0
    assert r["rows_all_missing"] == 0
    assert r["max_missing_in_row"] == 1
    assert r["avg_missing_per_row"] == 0.4


def test_one_shuffle_plan(spark, cur_clean_df):
    """The wide agg must be scan → partial agg → ONE exchange → final agg."""
    plan = sequence_stats(cur_clean_df)._jdf.queryExecution().executedPlan().toString()
    # an executed AQE plan prints "Final Plan" and "Initial Plan" sections —
    # count shuffles only in the first (current) section
    current = plan.split("== Initial Plan ==")[0]
    assert current.count("Exchange") == 1


def test_sample_rows_seeded(spark):
    from data_drift_monitoring_spark.operators.stats import sample_rows

    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    a = sorted(r["id"] for r in sample_rows(df, 100, seed=7).collect())
    b = sorted(r["id"] for r in sample_rows(df, 100, seed=7).collect())
    c = sorted(r["id"] for r in sample_rows(df, 100, seed=8).collect())
    assert a == b            # same seed → same rows
    assert len(a) == 100     # oversample + limit hits the requested n
    assert a != c            # different seed → different selection
    # n >= total returns everything
    assert sample_rows(df.limit(50), 100).count() == 50
    # exact path: exactly n, deterministic
    e1 = sorted(r["id"] for r in sample_rows(df, 100, seed=7, exact=True).collect())
    assert len(e1) == 100
