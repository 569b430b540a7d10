"""End-to-end pipeline: per-partition verdicts on the drifted fixture
(FIXTURES.md §1 variant 3), validation gates, resume semantics, digests."""

import os

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.plans.pipeline import run_checks
from data_drift_monitoring_spark.plans.reference import (
    init_reference,
    load_ref_stats,
    load_ref_sequences,
)
from data_drift_monitoring_spark.schema import SEQUENCES_SCHEMA, validate_schema
from data_drift_monitoring_spark.sources.tables import ParquetTableIO
from data_drift_monitoring_spark.sources import manifest as M


@pytest.fixture(scope="module")
def warehouse(spark, data_dir, ref_df, tmp_path_factory):
    io = ParquetTableIO(spark, str(tmp_path_factory.mktemp("wh")))
    snap = init_reference(spark, io, ref_df)
    return io, snap


def test_drifted_run_verdicts(spark, warehouse, cur_drifted_df, allowed_sources_df):
    io, snap = warehouse
    res = run_checks(
        spark, cur_drifted_df, io, "run_drift",
        load_ref_stats(io), allowed_sources_df, None, snapshot_id=snap,
    )
    failed = {
        (r["check"], r["column"], r["part_id"])
        for r in res.verdicts.filter("passed = false").collect()
    }
    assert ("missing_values", "doc_id", 2) in failed
    assert ("uniqueness", "doc_id", 3) in failed
    assert ("referential", "source", 4) in failed
    assert ("length_consistency", "tokens", 5) in failed
    assert ("drift_psi", "n_tok", 6) in failed
    assert ("drift_psi", "n_tok", 7) in failed
    assert ("drift_psi", "source", 4) in failed
    # no false positives on clean partitions for contract checks
    for check, col, bad in [
        ("missing_values", "doc_id", {2}),
        ("uniqueness", "doc_id", {3}),
        ("referential", "source", {4}),
        ("length_consistency", "tokens", {5}),
        ("drift_psi", "n_tok", {6, 7}),
    ]:
        got = {p for (c, co, p) in failed if c == check and co == col}
        assert got == bad, (check, got)
    # score column sanity
    sc = {r["part_id"]: r for r in res.score.collect()}
    assert sc[2]["missing_pct"] > 5
    assert sc[3]["duplicate_pct"] > 5
    assert all(sc[p]["grade"] in ("Excellent", "Very Good") for p in (0, 1))


def test_clean_run_all_pass(spark, warehouse, cur_clean_df, allowed_sources_df):
    io, snap = warehouse
    res = run_checks(
        spark, cur_clean_df, io, "run_clean",
        load_ref_stats(io), allowed_sources_df, None, snapshot_id=snap,
    )
    failing = res.verdicts.filter(
        (F.col("passed") == False) & (F.col("check") != "drift_ks")  # noqa: E712
    ).collect()
    assert failing == []
    sc = res.score.collect()
    assert all(r["overall_score"] == 100.0 for r in sc)
    assert all(r["grade"] == "Excellent" for r in sc)


def test_token_equality_in_pipeline(spark, warehouse, ref_corrupted_df, allowed_sources_df):
    io, snap = warehouse
    res = run_checks(
        spark, ref_corrupted_df, io, "run_corrupt",
        load_ref_stats(io), allowed_sources_df, load_ref_sequences(io),
        snapshot_id=snap,
    )
    te = {
        r["part_id"]: r
        for r in res.verdicts.filter("check = 'token_equality'").collect()
    }
    assert not te[5]["passed"] and te[5]["value"] > 0
    assert all(te[p]["passed"] for p in range(8) if p != 5)


def test_min_rows_gate(spark, data_dir):
    df = spark.read.parquet(os.path.join(data_dir, "invalid"))
    with pytest.raises(ValueError, match="minimum"):
        run_checks(spark, df)


def test_schema_gate(spark):
    bad = spark.createDataFrame([(1,)], "x int")
    assert not validate_schema(bad.schema, SEQUENCES_SCHEMA, strict=True).is_valid


def test_resume_prunes_done_partitions(spark, warehouse, cur_drifted_df, allowed_sources_df):
    io, snap = warehouse
    res1 = run_checks(
        spark, cur_drifted_df, io, "run_resume",
        load_ref_stats(io), allowed_sources_df, None, snapshot_id=snap,
    )
    n1 = res1.verdicts.count()
    assert M.completed_partitions(io, "run_resume") == list(range(8))
    # second invocation: everything pruned, results replayed from the table
    res2 = run_checks(
        spark, cur_drifted_df, io, "run_resume",
        load_ref_stats(io), allowed_sources_df, None, snapshot_id=snap,
    )
    assert res2.pruned_partitions == list(range(8))
    assert res2.verdicts.count() == n1  # no duplicate appends


def test_digest_idempotency(spark, warehouse, cur_drifted_df, allowed_sources_df):
    """Identical input partition → identical stats digest across runs."""
    io, snap = warehouse
    for rid in ("run_dg_a", "run_dg_b"):
        run_checks(
            spark, cur_drifted_df, io, rid,
            load_ref_stats(io), allowed_sources_df, None, snapshot_id=snap,
        )
    m = io.read_appended(M.MANIFEST_TABLE)
    rows = m.filter(
        F.col("run_id").isin("run_dg_a", "run_dg_b")
        & (F.col("status") == "done")
    ).collect()
    by_run = {}
    for r in rows:
        by_run.setdefault(r["run_id"], {})[r["part_id"]] = r["stats_digest"]
    assert by_run["run_dg_a"] == by_run["run_dg_b"]


def test_violation_rows_match_verdict_counts(
    spark, cur_drifted_df, ref_df, allowed_sources_df
):
    """Row-level violations (build_violations) must reconcile with the
    aggregate verdict values for every check family."""
    from data_drift_monitoring_spark.operators.invariants import token_digests
    from data_drift_monitoring_spark.plans.pipeline import (
        build_verdicts,
        build_violations,
    )

    rd = token_digests(ref_df)
    verd = {
        (r["part_id"], r["check"], r["column"]): r["value"]
        for r in build_verdicts(
            cur_drifted_df, allowed_sources=allowed_sources_df, ref_digests=rd
        ).collect()
    }
    viol = build_violations(
        cur_drifted_df, allowed_sources=allowed_sources_df, ref_digests=rd
    )
    counts = {
        (r["part_id"], r["check"]): r["n"]
        for r in viol.groupBy("part_id", "check")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    parts = sorted({k[0] for k in verd})
    for p in parts:
        assert counts.get((p, "missing_values"), 0) == verd[
            (p, "missing_values", "doc_id")
        ] + verd[(p, "missing_values", "tokens")]
        assert counts.get((p, "length_consistency"), 0) == verd[
            (p, "length_consistency", "tokens")
        ]
        assert counts.get((p, "uniqueness"), 0) == verd[
            (p, "uniqueness", "doc_id")
        ]
        assert counts.get((p, "referential"), 0) == verd[
            (p, "referential", "source")
        ]
        assert counts.get((p, "token_equality"), 0) == verd[
            (p, "token_equality", "tokens")
        ]


def test_score_and_check_history_trends(
    spark, cur_clean_df, cur_drifted_df, allowed_sources_df, tmp_path_factory
):
    """historical trends (reference README.md:79 promise): two persisted
    runs — clean then drifted — produce an ordered per-partition score
    trend with deltas and a per-check value history."""
    from datetime import datetime, timezone

    from data_drift_monitoring_spark.plans.trends import (
        check_history,
        score_history,
    )

    io = ParquetTableIO(spark, str(tmp_path_factory.mktemp("wh_trends")))
    t1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    t2 = datetime(2026, 1, 2, tzinfo=timezone.utc)
    run_checks(spark, cur_clean_df, io, run_id="r1",
               allowed_sources=allowed_sources_df, now=t1)
    run_checks(spark, cur_drifted_df, io, run_id="r2",
               allowed_sources=allowed_sources_df, now=t2)

    hist = score_history(io).collect()
    by = {(r["part_id"], r["run_id"]): r for r in hist}
    parts = {r["part_id"] for r in hist}
    assert len(by) == len(hist)  # one row per (part, run)
    for p in parts:
        first, second = by[(p, "r1")], by[(p, "r2")]
        assert first["direction"] == "baseline"
        assert first["prev_overall_score"] is None
        assert second["prev_overall_score"] == first["overall_score"]
        assert second["direction"] in ("degrading", "stable")
    # the drifted fixture corrupts partitions 2 (nulls) and 3 (dups):
    # their second run must actually degrade
    assert by[(2, "r2")]["direction"] == "degrading"
    assert by[(3, "r2")]["direction"] == "degrading"
    assert by[(2, "r2")]["delta"] < 0

    uh = check_history(io, "uniqueness", "doc_id").collect()
    ub = {(r["part_id"], r["run_seq"] if "run_seq" in r else r["run_ts"]): r
          for r in uh}
    assert len(uh) == 2 * len(parts)
    dup3 = [r for r in uh if r["part_id"] == 3 and r["direction"] != "baseline"]
    assert dup3 and dup3[0]["value"] > 0  # duplicate rows appear in run 2
