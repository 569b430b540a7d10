"""Duplicate detection parity with pandas `duplicated` semantics
(duplicates.py:47-56) and the broadcast referential check."""

from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators.referential import (
    referential_stats,
    referential_violations,
)
from data_drift_monitoring_spark.operators.uniqueness import (
    dedup_exact,
    duplicate_stats,
    duplicate_violations,
    sample_duplicate_groups,
)


def test_duplicate_stats_exact_reference_case(spark):
    # test_file_handler.py:215-228: {col1:[1,2,2,3]} → count 1... full-row
    # semantics: duplicated(keep=False).sum() == 2 rows in dup groups;
    # the reference's "count" uses keep-default (1); we expose both.
    df = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (0, 2, "b"), (0, 3, "c")],
        "part_id int, col1 int, col2 string",
    )
    r = duplicate_stats(df, keys=["col1", "col2"]).collect()[0]
    assert r["duplicate_rows"] == 2       # rows in groups of size>1
    assert r["duplicate_groups"] == 1
    assert r["unique_keys"] == 3
    # reference's pct: extra rows / total = 1/4 = 25% — derivable:
    extra = r["duplicate_rows"] - r["duplicate_groups"]
    assert extra / r["n_rows"] * 100 == 25.0


def test_duplicates_vs_pandas(spark, cur_drifted_df):
    got = {
        r["part_id"]: r
        for r in duplicate_stats(
            cur_drifted_df, keys=["doc_id"], ignore_null_keys=True
        ).collect()
    }
    pdf = cur_drifted_df.select("part_id", "doc_id").toPandas().dropna()
    for p, g in pdf.groupby("part_id"):
        dup_rows = int(g.doc_id.duplicated(keep=False).sum())
        assert got[p]["duplicate_rows"] == dup_rows, p
    assert got[3]["duplicate_rows"] > 0
    assert all(got[p]["duplicate_rows"] == 0 for p in range(8) if p != 3)


def test_duplicate_violations_and_samples(spark):
    df = spark.createDataFrame(
        [(0, "k1", 1), (0, "k1", 2), (0, "k2", 3), (1, "k3", 4), (1, "k3", 5)],
        "part_id int, doc_id string, v int",
    )
    v = duplicate_violations(df, ["doc_id"]).collect()
    assert len(v) == 4
    keepers = [r for r in v if r["occurrence"] == 1]
    assert len(keepers) == 2
    s = sample_duplicate_groups(df, ["doc_id"]).collect()
    assert {r["doc_id"] for r in s} == {"k1", "k3"}
    assert all(len(r["sample_rows"]) <= 3 for r in s)


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "a", 3), (0, "a", 1), (0, "a", 2), (0, "b", 9)],
        "part_id int, doc_id string, ts int",
    )
    out = dedup_exact(df, ["doc_id"], order_by=["ts"]).collect()
    got = {r["doc_id"]: r["ts"] for r in out}
    assert got == {"a": 1, "b": 9}


def test_referential_counts_and_rows(spark, cur_drifted_df, allowed_sources_df):
    stats = {
        r["part_id"]: r
        for r in referential_stats(
            cur_drifted_df, allowed_sources_df, "source"
        ).collect()
    }
    assert stats[4]["violations"] > 0
    assert all(stats[p]["violations"] == 0 for p in range(8) if p != 4)
    rows = referential_violations(
        cur_drifted_df, allowed_sources_df, "source"
    )
    bad = rows.select("source").distinct().collect()
    assert {r["source"] for r in bad} == {"forum"}
    assert rows.count() == stats[4]["violations"]


def test_referential_uses_broadcast_join(spark, cur_clean_df, allowed_sources_df):
    plan = (
        referential_violations(cur_clean_df, allowed_sources_df, "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the big (probe) side must NOT shuffle: between the join node and the
    # BroadcastExchange of the build side there is only the fact scan
    probe_side = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in probe_side
