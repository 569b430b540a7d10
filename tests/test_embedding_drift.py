"""Embedding drift: per-dim Welch z and summary vs a numpy mirror, plus
zero-variance and null-vector edges."""

from __future__ import annotations

import numpy as np
import pytest

from data_drift_monitoring_spark.operators.embedding_drift import (
    dim_stats,
    embedding_drift,
    embedding_drift_summary,
)

RNG = np.random.default_rng(7)
DIM = 6
N_ROWS = 40
REF = RNG.normal(0.0, 0.2, size=(N_ROWS, DIM))
SHIFT = np.zeros(DIM)
SHIFT[2] = 1.5  # planted drift far above the z threshold
CUR = RNG.normal(0.0, 0.2, size=(N_ROWS, DIM)) + SHIFT


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"],
    )


def test_dim_stats_match_numpy(spark):
    got = {r["dim"]: r for r in dim_stats(_df(spark, REF)).collect()}
    assert set(got) == set(range(DIM))
    for d in range(DIM):
        assert got[d]["n"] == N_ROWS
        assert got[d]["mean"] == pytest.approx(REF[:, d].mean(), abs=1e-12)
        assert got[d]["var"] == pytest.approx(
            REF[:, d].var(ddof=1), abs=1e-12
        )


def test_welch_z_and_drift_flags(spark):
    per_dim = embedding_drift(
        _df(spark, CUR), _df(spark, REF), z_threshold=3.0
    )
    got = {r["dim"]: r for r in per_dim.collect()}
    for d in range(DIM):
        se = np.sqrt(
            CUR[:, d].var(ddof=1) / N_ROWS + REF[:, d].var(ddof=1) / N_ROWS
        )
        z = (CUR[:, d].mean() - REF[:, d].mean()) / se
        assert got[d]["z_shift"] == pytest.approx(z, abs=1e-9)
    assert got[2]["drifted"] == 1
    assert sum(r["drifted"] for r in got.values()) >= 1

    summary = embedding_drift_summary(per_dim).collect()[0]
    assert summary["n_dims"] == DIM
    assert summary["n_drifted"] >= 1
    assert summary["verdict"] == "drift"
    mc, mr = CUR.mean(axis=0), REF.mean(axis=0)
    cos = mc @ mr / (np.linalg.norm(mc) * np.linalg.norm(mr))
    assert summary["centroid_cosine"] == pytest.approx(cos, abs=1e-9)


def test_no_drift_on_identical_halves(spark):
    df = _df(spark, REF)
    per_dim = embedding_drift(df, df)
    rows = per_dim.collect()
    assert all(r["drifted"] == 0 for r in rows)
    assert all(abs(r["z_shift"]) < 1e-9 for r in rows)
    s = embedding_drift_summary(per_dim).collect()[0]
    assert s["verdict"] == "none"
    assert s["centroid_cosine"] == pytest.approx(1.0, abs=1e-12)


def test_zero_variance_edges(spark):
    const_a = _df(spark, np.full((5, 3), 2.0))
    const_b = _df(spark, np.full((5, 3), 3.0))
    same = {
        r["dim"]: r for r in embedding_drift(const_a, const_a).collect()
    }
    assert all(r["z_shift"] is None and r["drifted"] == 0 for r in same.values())
    diff = {
        r["dim"]: r for r in embedding_drift(const_b, const_a).collect()
    }
    assert all(r["z_shift"] is None and r["drifted"] == 1 for r in diff.values())


def test_null_vectors_are_skipped(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["dim"]: r for r in dim_stats(df).collect()}
    assert got[0]["n"] == 2 and got[0]["mean"] == pytest.approx(2.0)
    assert got[1]["n"] == 2 and got[1]["mean"] == pytest.approx(3.0)


def test_dimensionality_change_counts_as_drift(spark):
    """Regression: dims present on only one side (encoder swap 4 -> 6)
    left NULL 'drifted' that sum() skipped — zero drift reported."""
    from data_drift_monitoring_spark.operators.embedding_drift import (
        embedding_drift,
        embedding_drift_summary,
    )

    cur = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]) for i in range(20)],
        "id long, vec array<double>",
    )
    ref = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)],
        "id long, vec array<double>",
    )
    per_dim = embedding_drift(cur, ref, vec_col="vec")
    extra = {r["dim"]: r["drifted"] for r in per_dim.collect() if r["dim"] >= 4}
    assert extra == {4: 1, 5: 1}
    s = embedding_drift_summary(per_dim).collect()[0]
    assert s["n_drifted"] >= 2
