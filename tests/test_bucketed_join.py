"""Bucketed co-located join: the zero-shuffle path invariants.py promises
for pre-bucketed (Iceberg bucket-transform-shaped) tables, proven on the
executed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators.invariants import (
    token_digests,
    uniqueness_and_token_equality,
)
from data_drift_monitoring_spark.sources.tables import write_bucketed


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan ==": keep the final
    return plan.split("== Initial Plan ==")[0]


def _key_exchanges(df, key: str) -> int:
    """Shuffle exchanges partitioned on ``key`` (the row-volume shuffles;
    the final O(partitions) rollup on part_id is not counted)."""
    return sum(
        1
        for ln in _final_plan(df).splitlines()
        if "Exchange hashpartitioning" in ln and key in ln
    )


def test_bucketed_tables_join_without_exchange(spark, ref_df, bucket_db):
    cur = ref_df.selectExpr(
        "part_id", "doc_id", "xxhash64(tokens) AS tok_digest"
    )
    ref = token_digests(ref_df)
    write_bucketed(cur, f"{bucket_db}.cur_digests", "doc_id", 8)
    write_bucketed(ref, f"{bucket_db}.ref_digests", "doc_id", 8)

    bc = spark.table(f"{bucket_db}.cur_digests")
    br = spark.table(f"{bucket_db}.ref_digests")
    out = uniqueness_and_token_equality(bc, br)

    # identical semantics to the unbucketed path...
    plain = {
        r["part_id"]: r for r in uniqueness_and_token_equality(cur, ref).collect()
    }
    bucketed = {r["part_id"]: r for r in out.collect()}
    assert set(plain) == set(bucketed)
    for p in plain:
        for c in ("n_rows", "duplicate_rows", "token_mismatch", "token_match"):
            assert plain[p][c] == bucketed[p][c], (p, c)

    # ...but with ZERO row-volume shuffles: both scans read bucketed files
    # and the doc_id join + per-key aggregate run in the scan stage; the
    # only exchange left is the final O(partitions) rollup on part_id.
    plan = _final_plan(out)
    assert plan.count("Bucketed: true") == 2
    assert _key_exchanges(out, "doc_id") == 0, (
        "bucketed join must not exchange on the join key"
    )
    # the unbucketed twin pays the doc_id shuffle on the same data
    unbucketed = uniqueness_and_token_equality(cur, ref)
    unbucketed.collect()
    assert _key_exchanges(unbucketed, "doc_id") >= 1
