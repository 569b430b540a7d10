"""Train/eval n-gram contamination: planted-truth tests against a pure-
Python mirror of the gram semantics (lowercase, whitespace collapse,
k-word windows, whole-doc gram when shorter than k, set semantics)."""

from __future__ import annotations

import re

import pytest

from data_drift_monitoring_spark.operators.contamination import (
    contamination_pairs,
    contamination_report,
)

N = 3
EVAL_DOCS = {
    # fully embedded verbatim in train doc 100 -> overlap 1.0
    10: "the quick brown fox jumps over the lazy dog",
    # shares a prefix with train doc 101 only -> partial overlap
    11: "alpha beta gamma delta epsilon zeta eta theta",
    # nothing in common with any train doc
    12: "completely novel holdout sentence with unseen words",
    # shorter than n -> single whole-doc gram, present in train doc 102
    13: "tiny doc",
}
TRAIN_DOCS = {
    100: "prefix words then the quick brown fox jumps over the lazy dog and a suffix",
    101: "alpha beta gamma delta UNRELATED tail of the training document",
    102: "tiny doc",  # whole-doc gram on BOTH sides (each shorter than n)
    103: "an entirely unrelated training document about something else",
}


def _grams(text: str, n: int = N) -> set[str]:
    w = re.sub(r"\s+", " ", text.lower()).split(" ")
    if len(w) <= n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _expected_pairs(min_overlap: float):
    out = {}
    for e_id, e_txt in EVAL_DOCS.items():
        eg = _grams(e_txt)
        for t_id, t_txt in TRAIN_DOCS.items():
            m = len(eg & _grams(t_txt))
            if m and m / len(eg) >= min_overlap:
                out[(t_id, e_id)] = (m, len(_grams(t_txt)), len(eg))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [(k, v) for k, v in TRAIN_DOCS.items()], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [(k, v) for k, v in EVAL_DOCS.items()], ["doc_id", "text"]
    )
    return train, ev


def test_pairs_match_planted_truth(spark, frames):
    train, ev = frames
    got = {
        (r["train_id"], r["eval_id"]): (
            r["matched_grams"],
            r["n_train_grams"],
            r["n_eval_grams"],
        )
        for r in contamination_pairs(
            train, ev, n=N, min_overlap=0.5
        ).collect()
    }
    assert got == _expected_pairs(0.5)
    # the fully-embedded eval doc is a 1.0-overlap pair with its source
    full = [
        r
        for r in contamination_pairs(
            train, ev, n=N, min_overlap=0.99
        ).collect()
        if r["eval_id"] == 10
    ]
    assert len(full) == 1 and full[0]["train_id"] == 100
    assert full[0]["overlap"] == pytest.approx(1.0)


def test_report_covers_every_eval_doc(spark, frames):
    train, ev = frames
    rep = {
        r["eval_id"]: r
        for r in contamination_report(
            train, ev, n=N, min_overlap=0.5
        ).collect()
    }
    assert set(rep) == set(EVAL_DOCS)
    # distinct-gram union across ALL train docs per eval doc
    for e_id, e_txt in EVAL_DOCS.items():
        eg = _grams(e_txt)
        matched = len(
            eg & set().union(*(_grams(t) for t in TRAIN_DOCS.values()))
        )
        assert rep[e_id]["matched_grams"] == matched
        assert rep[e_id]["n_eval_grams"] == len(eg)
    assert rep[10]["contaminated"] == 1
    assert rep[12]["contaminated"] == 0 and rep[12]["matched_grams"] == 0
    assert rep[13]["contaminated"] == 1  # whole-doc gram hit


def test_broadcast_off_same_answer(spark, frames):
    train, ev = frames
    a = sorted(
        map(
            tuple,
            contamination_pairs(
                train, ev, n=N, min_overlap=0.2, broadcast_eval=False
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            contamination_pairs(
                train, ev, n=N, min_overlap=0.2, broadcast_eval=True
            ).collect(),
        )
    )
    assert a == b
