"""PII scan/redact vs a pure-Python re mirror (same patterns)."""

from __future__ import annotations

import re

import pytest

from data_drift_monitoring_spark.operators.pii import (
    PII_PATTERNS,
    pii_summary,
    redact_pii,
    with_pii_counts,
)

DOCS = [
    (0, "reach me at alice@example.com or bob.smith+x@sub.domain.org", "s0"),
    (1, "server at 10.0.0.1 and 192.168.1.255 responded", "s0"),
    (2, "call 555-123-4567 or 555.987.6543 today", "s0"),
    (3, "ssn 123-45-6789 on file", "s1"),
    (4, "clean document with no sensitive content", "s1"),
    (5, "", "s1"),
    (6, None, "s1"),
    (7, "mixed: x@y.io then 1.2.3.4 then 111-22-3333", "s0"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )


def _mirror_counts(text):
    t = text or ""
    return {
        name: len(re.findall(pat, t)) for name, pat in PII_PATTERNS.items()
    }


def test_counts_match_re(docs_df):
    got = {
        r["doc_id"]: r.asDict() for r in with_pii_counts(docs_df).collect()
    }
    for doc_id, text, _ in DOCS:
        exp = _mirror_counts(text)
        for name, cnt in exp.items():
            assert got[doc_id][f"pii_{name}"] == cnt, (doc_id, name)
        assert got[doc_id]["pii_total"] == sum(exp.values())
        assert got[doc_id]["has_pii"] == (sum(exp.values()) > 0)


def test_redaction_removes_all_matches(docs_df):
    red = redact_pii(docs_df)
    rescanned = with_pii_counts(red, "text_redacted").collect()
    for r in rescanned:
        assert r["pii_total"] == 0, r
    # mirror the sequential-redaction semantics
    by_id = {r["doc_id"]: r["text_redacted"] for r in red.collect()}
    for doc_id, text, _ in DOCS:
        t = text or ""
        for name, pat in PII_PATTERNS.items():
            t = re.sub(pat, f"[{name.upper()}]", t)
        assert by_id[doc_id] == t, doc_id


def test_summary(docs_df):
    rows = {r["source"]: r.asDict() for r in pii_summary(docs_df).collect()}
    per_src: dict[str, list] = {}
    for _, text, src in DOCS:
        per_src.setdefault(src, []).append(_mirror_counts(text))
    for src, counts in per_src.items():
        assert rows[src]["n_docs"] == len(counts)
        assert rows[src]["n_docs_with_pii"] == sum(
            1 for c in counts if sum(c.values())
        )
        for name in PII_PATTERNS:
            assert rows[src][f"total_{name}"] == sum(
                c[name] for c in counts
            )


def test_no_shuffle_per_row(docs_df):
    plan = (
        with_pii_counts(docs_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
