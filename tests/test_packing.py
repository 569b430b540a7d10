"""Sequence packing vs a pure-Python mirror; bucketed prefix-sum path
must equal the plain window path; window-fill invariant."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators.packing import (
    pack_windows,
    packing_summary,
    window_stats,
)

C = 16


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_tok int, source string"
    )


@pytest.fixture(scope="module")
def seqs(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 40), f"s{i % 3}") for i in range(300)
    ]
    rows.append((300, 0, "s0"))  # empty doc
    return _mk(spark, rows)


def _mirror(rows, c):
    out = {}
    by_src: dict[str, list] = {}
    for doc_id, n_tok, src in rows:
        by_src.setdefault(src, []).append((doc_id, n_tok))
    for src, docs in by_src.items():
        pos = 0
        for doc_id, n_tok in sorted(docs):
            first = pos // c
            last = (pos + n_tok - 1) // c if n_tok > 0 else first
            out[doc_id] = (pos, first, last, last - first + 1)
            pos += n_tok
    return out


def test_pack_matches_mirror(seqs):
    rows = [(r.doc_id, r.n_tok, r.source) for r in seqs.collect()]
    exp = _mirror(rows, C)
    got = {
        r["doc_id"]: (
            r["start_tok"],
            r["first_window"],
            r["last_window"],
            r["n_windows"],
        )
        for r in pack_windows(seqs, C).collect()
    }
    assert got == exp


def test_bucketed_path_identical(seqs):
    plain = {
        tuple(r)
        for r in pack_windows(seqs, C)
        .select("doc_id", "start_tok", "first_window", "last_window")
        .collect()
    }
    for buckets in (1, 4, 17):
        bucketed = {
            tuple(r)
            for r in pack_windows(seqs, C, prefix_buckets=buckets)
            .select(
                "doc_id", "start_tok", "first_window", "last_window"
            )
            .collect()
        }
        assert bucketed == plain, buckets


def test_window_fill_invariant(seqs):
    packed = pack_windows(seqs, C)
    stats = window_stats(packed, C).collect()
    totals = {
        r["source"]: r["total_tokens"]
        for r in packing_summary(packed, C).collect()
    }
    last_win = {
        src: (tot - 1) // C for src, tot in totals.items() if tot > 0
    }
    for r in stats:
        if r["window_id"] < last_win[r["source"]]:
            assert r["tokens_filled"] == C, r
        assert r["n_docs"] >= r["n_starting_docs"] >= 0
    # every token lands in exactly one window
    by_src: dict[str, int] = {}
    for r in stats:
        by_src[r["source"]] = by_src.get(r["source"], 0) + int(
            r["tokens_filled"]
        )
    assert by_src == {s: t for s, t in totals.items() if t > 0}


def test_summary(seqs):
    packed = pack_windows(seqs, C)
    rows = [(r.doc_id, r.n_tok, r.source) for r in seqs.collect()]
    exp_tokens: dict[str, int] = {}
    for _, n_tok, src in rows:
        exp_tokens[src] = exp_tokens.get(src, 0) + n_tok
    for r in packing_summary(packed, C).collect():
        tot = exp_tokens[r["source"]]
        assert r["total_tokens"] == tot
        assert r["n_windows"] == -(-tot // C)
        assert 0 < r["last_window_fill"] <= C
        exp_boundary = sum(
            1
            for rr in pack_windows(seqs, C).collect()
            if rr["source"] == r["source"]
            and rr["last_window"] > rr["first_window"]
        )
        assert r["n_boundary_docs"] == exp_boundary


def test_context_len_validation(seqs):
    with pytest.raises(ValueError):
        pack_windows(seqs, 0)


def test_bucketed_path_rejects_string_order_keys(spark):
    """Regression: string order keys crashed int(lo) — or silently
    diverged from the window path for numeric-looking strings."""
    import pytest as _pytest

    from data_drift_monitoring_spark.operators.packing import pack_windows

    df = spark.createDataFrame(
        [("doc-9", 5, "a"), ("doc-10", 7, "a")],
        "doc_id string, n_tok int, source string",
    )
    with _pytest.raises(ValueError, match="integral order column"):
        pack_windows(df, 8, order_col="doc_id", prefix_buckets=4)
    # the plain window path still handles string keys
    assert pack_windows(df, 8, order_col="doc_id").count() == 2


def test_window_ids_exact_past_double_precision(spark):
    """Window ids must come from integer DIV: offsets past 2^53 lose
    precision through floor(double division) and misassign windows
    (round-3 ADVICE)."""
    from data_drift_monitoring_spark.operators.packing import (
        pack_windows,
        packing_summary,
    )

    big = (1 << 60) + 3  # not representable exactly as a double
    df = spark.createDataFrame(
        [(1, big, "s"), (2, 11, "s")],
        "doc_id long, n_tok long, source string",
    )
    C = 7
    rows = {r["doc_id"]: r for r in pack_windows(df, C).collect()}
    assert rows[1]["first_window"] == 0
    assert rows[1]["last_window"] == (big - 1) // C
    assert rows[2]["first_window"] == big // C
    assert rows[2]["last_window"] == (big + 11 - 1) // C
    s = packing_summary(pack_windows(df, C), C).collect()[0]
    total = big + 11
    assert s["n_windows"] == -(-total // C)
    assert s["last_window_fill"] == total - (-(-total // C) - 1) * C
