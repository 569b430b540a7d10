"""Per-row token-array equality invariant (input_hint) on the corrupted-copy
fixture: corruption injected only in partition 5."""

from data_drift_monitoring_spark.operators.invariants import (
    token_equality_stats,
    token_equality_violations,
)


def test_stats_flag_only_corrupted_partition(spark, ref_df, ref_corrupted_df):
    rows = {
        r["part_id"]: r
        for r in token_equality_stats(ref_corrupted_df, ref_df).collect()
    }
    assert rows[5]["token_mismatch"] > 0
    for p in range(8):
        assert rows[p]["missing_in_ref"] == 0
        if p != 5:
            assert rows[p]["token_mismatch"] == 0, p
            assert rows[p]["token_match"] == rows[p]["n_rows"]


def test_violation_rows_pinpoint_diffs(spark, ref_df, ref_corrupted_df):
    v = token_equality_violations(ref_corrupted_df, ref_df).collect()
    assert v and all(r["part_id"] == 5 for r in v)
    for r in v:
        assert r["check"] == "token_equality"
        assert r["n_diff"] >= 1
        assert 0 <= r["first_diff_idx"] <= r["len_cur"]
    # cross-check count against the digest-only stats
    stats = {
        r["part_id"]: r
        for r in token_equality_stats(ref_corrupted_df, ref_df).collect()
    }
    assert len(v) == stats[5]["token_mismatch"]


def test_identical_tables_no_violations(spark, ref_df):
    assert token_equality_violations(ref_df, ref_df).count() == 0


def test_ref_duplicates_do_not_inflate_current_counts(spark, ref_df):
    """A reference snapshot with duplicated doc_ids must not fan out the
    join: current-side n_rows / uniqueness must equal the clean-ref run."""
    from data_drift_monitoring_spark.operators.invariants import (
        token_digests,
        uniqueness_and_token_equality,
    )

    cur = ref_df.selectExpr(
        "part_id", "doc_id", "xxhash64(tokens) AS tok_digest"
    )
    ref = token_digests(ref_df)
    dup_ref = ref.unionByName(ref)  # every ref key appears twice

    clean = {
        r["part_id"]: r for r in uniqueness_and_token_equality(cur, ref).collect()
    }
    doubled = {
        r["part_id"]: r
        for r in uniqueness_and_token_equality(cur, dup_ref).collect()
    }
    assert set(clean) == set(doubled)
    for p, c in clean.items():
        d = doubled[p]
        for col in (
            "n_rows", "duplicate_rows", "duplicate_groups", "unique_keys",
            "token_mismatch", "token_match", "missing_in_ref",
        ):
            assert c[col] == d[col], (p, col)
