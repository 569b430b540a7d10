"""URL extraction + blocklist filtering vs a Python re mirror."""

from __future__ import annotations

import re

import pytest

from data_drift_monitoring_spark.operators.urls import (
    HOST_PATTERN,
    URL_PATTERN,
    blocklist_report,
    filter_blocklisted,
    with_urls,
)

DOCS = [
    (0, "plain text with no links at all", "s0"),
    (1, "see https://example.com/page for details", "s0"),
    (2, "bad link https://spam.bad-site.org/x?y=1 here", "s0"),
    (3, "mixed http://Sub.Example.COM:8080/path and https://ok.net", "s1"),
    (4, "dup https://a.io/1 https://a.io/2 twice", "s1"),
    (5, "", "s1"),
    (6, None, "s1"),
]
BLOCKLIST = ["spam.bad-site.org", "never-seen.example"]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )


def _mirror(text):
    urls = re.findall(URL_PATTERN, text or "")
    domains = []
    for u in urls:
        m = re.match(HOST_PATTERN, u)
        d = m.group(1).lower()
        if d not in domains:
            domains.append(d)
    return urls, domains


def test_extraction_matches_re(docs_df):
    got = {r["doc_id"]: r.asDict() for r in with_urls(docs_df).collect()}
    for doc_id, text, _ in DOCS:
        urls, domains = _mirror(text)
        assert got[doc_id]["urls"] == urls, doc_id
        assert sorted(got[doc_id]["domains"]) == sorted(domains), doc_id
        assert got[doc_id]["n_urls"] == len(urls)


def _blocked(domains, blocklist):
    # domain semantics: exact host or dot-suffix match
    return any(
        d == e or d.endswith("." + e)
        for d in domains
        for e in (x.lower() for x in blocklist)
    )


def test_filter_and_report(docs_df):
    kept = {r.doc_id for r in filter_blocklisted(docs_df, BLOCKLIST).collect()}
    blocked_exp = {
        doc_id
        for doc_id, text, _ in DOCS
        if _blocked(_mirror(text)[1], BLOCKLIST)
    }
    assert kept == {d for d, _, _ in DOCS} - blocked_exp
    assert blocked_exp == {2}
    rep = {
        r["source"]: r.asDict()
        for r in blocklist_report(docs_df, BLOCKLIST).collect()
    }
    assert rep["s0"]["n_blocked"] == 1
    assert rep["s1"]["n_blocked"] == 0
    assert rep["s1"]["n_docs_with_urls"] == 2
    assert rep["s0"]["total_urls"] == 2
    assert rep["s1"]["total_urls"] == 4


def test_no_corpus_shuffle(docs_df):
    """Blocklist probing must broadcast: no hash exchange of the corpus."""
    plan = (
        filter_blocklisted(docs_df, BLOCKLIST)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_trailing_sentence_period_not_in_host(spark):
    """Regression: '.' allowed at the host edge absorbed sentence-final
    periods, so 'spam.example.' missed the blocklist entry."""
    from data_drift_monitoring_spark.operators.urls import (
        filter_blocklisted,
        with_urls,
    )

    df = spark.createDataFrame(
        [
            (1, "read this at https://spam.example. and tell me"),
            (2, "endpoint https://ok.example/path. trailing period in text"),
        ],
        "doc_id long, text string",
    )
    doms = {r.doc_id: r.domains for r in with_urls(df).collect()}
    assert doms[1] == ["spam.example"]
    assert doms[2] == ["ok.example"]
    kept = filter_blocklisted(df, ["spam.example"])
    assert {r.doc_id for r in kept.collect()} == {2}


def test_subdomain_suffix_blocking(spark):
    """A blocklist entry blocks every subdomain of it (round-3 ADVICE:
    exact-host matching was trivially bypassed by 'www.' variants) —
    but never a lookalike suffix without the dot boundary."""
    df = spark.createDataFrame(
        [
            (1, "x https://spam.example/a"),
            (2, "x https://www.spam.example/b"),
            (3, "x https://a.b.spam.example/c"),
            (4, "x https://notspam.example/d"),  # no dot boundary
            (5, "x https://spam.example.evil.net/e"),  # entry not a suffix
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in filter_blocklisted(df, ["spam.example"]).collect()}
    assert kept == {4, 5}
