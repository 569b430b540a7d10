"""Token-level duplicated-span removal vs a pure-Python mirror.

Planted corpus: a shared boilerplate span across docs, an internal
repeat inside one doc, a doc shorter than k, and clean docs — every
duplication mode the operator distinguishes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_drift_monitoring_spark.operators import span_dedup as SD

K = 3

# fmt: off
DOCS = {
    # "a" holds the canonical copy of the shared span 10,11,12,13,14
    "a": [10, 11, 12, 13, 14, 99, 98, 97],
    # "b" repeats the shared span mid-doc
    "c": [55, 10, 11, 12, 13, 14],
    # internal repeat: 7,8,9 appears twice inside the same doc
    "d": [7, 8, 9, 1, 2, 7, 8, 9],
    # shorter than k: contributes no grams even though it matches a span
    "e": [10, 11],
    # clean
    "f": [42, 43, 44, 45],
}
# fmt: on


def _mirror(docs: dict[str, list[int]], k: int):
    """Reference implementation: dup census, canonical = min (id, pos),
    covered = union of non-canonical k-windows."""
    occ = []  # (gram, doc, pos)
    for doc_id, toks in docs.items():
        for p in range(len(toks) - k + 1):
            occ.append((tuple(toks[p : p + k]), doc_id, p))
    from collections import Counter, defaultdict

    counts = Counter(g for g, _, _ in occ)
    canon = {}
    for g, d, p in sorted(occ, key=lambda t: (t[1], t[2])):
        if counts[g] >= 2 and g not in canon:
            canon[g] = (d, p)
    removed = defaultdict(list)
    for g, d, p in occ:
        if counts[g] >= 2 and canon[g] != (d, p):
            removed[d].append(p)
    out = {}
    for doc_id, toks in docs.items():
        cov = sorted({i for p in removed[doc_id] for i in range(p, p + k)})
        kept = [t for i, t in enumerate(toks) if i not in cov]
        out[doc_id] = {
            "removed_occurrences": len(removed[doc_id]),
            "covered_tokens": len(cov),
            "kept": kept,
        }
    return out


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id string, tokens array<int>"
    ).repartition(4)


@pytest.mark.parametrize("portable", [False, True])
def test_stats_match_mirror(spark, planted, portable):
    mirror = _mirror(DOCS, K)
    rows = {
        r["doc_id"]: r
        for r in SD.span_dedup_stats(planted, k=K, portable=portable).collect()
    }
    assert set(rows) == set(DOCS)
    for doc_id, toks in DOCS.items():
        m, r = mirror[doc_id], rows[doc_id]
        assert r["n_tok"] == len(toks)
        assert r["removed_occurrences"] == m["removed_occurrences"], doc_id
        assert r["covered_tokens"] == m["covered_tokens"], doc_id
        assert r["kept_n_tok"] == len(m["kept"]), doc_id
        assert r["kept_token_sum"] == sum(m["kept"]), doc_id


def test_removed_arrays_match_mirror(spark, planted):
    mirror = _mirror(DOCS, K)
    rows = {
        r["doc_id"]: r["tokens"]
        for r in SD.remove_duplicate_spans(planted, k=K).collect()
    }
    for doc_id in DOCS:
        assert rows[doc_id] == mirror[doc_id]["kept"], doc_id


def test_semantics_specifics(spark, planted):
    stats = {
        r["doc_id"]: r for r in SD.span_dedup_stats(planted, k=K).collect()
    }
    # canonical copy (first occurrence corpus-wide, doc "a") is untouched
    assert stats["a"]["covered_tokens"] == 0
    # doc "c"'s copy of the shared span is fully removed (positions 1-5)
    assert stats["c"]["covered_tokens"] == 5
    assert stats["c"]["kept_n_tok"] == 1
    # internal repeat: second 7,8,9 inside "d" removed, first kept
    assert stats["d"]["covered_tokens"] == 3
    assert stats["d"]["kept_n_tok"] == 5
    # shorter-than-k and clean docs pass through
    assert stats["e"]["covered_tokens"] == 0
    assert stats["f"]["covered_tokens"] == 0


def test_summary_and_conservation(spark, planted):
    s = SD.span_dedup_summary(planted, k=K).collect()[0]
    assert s["docs_total"] == len(DOCS)
    assert s["tokens_total"] == sum(len(t) for t in DOCS.values())
    kept_total = (
        SD.remove_duplicate_spans(planted, k=K)
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    assert s["tokens_total"] - s["tokens_removed"] == kept_total
    mirror = _mirror(DOCS, K)
    assert s["docs_affected"] == sum(
        1 for m in mirror.values() if m["covered_tokens"]
    )


def test_no_python_udf_in_plan(spark, planted):
    plan = SD.span_dedup_stats(planted, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
