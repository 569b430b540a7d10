"""Streaming corpus curation: batch-equivalence of curate_batch, and the
availableNow stream end-to-end with checkpoint resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_drift_monitoring_spark.streaming.curate import (
    curate_batch,
    start_curation,
)

ROWS = [
    (0, "good varied document with many distinct words here", "en", "a", 49),
    (1, "spam spam spam spam spam spam spam spam", "en", "a", 40),
    (2, "email me at x@y.io for info and details thanks", "en", "a", 47),
    (3, "link https://blocked.example/x plus diverse other words", "en", "b", 56),
    (4, "another clean diverse document for the corpus", "en", "b", 46),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
BLOCK = ["blocked.example"]


def test_curate_batch_semantics(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    curated, quarantine = curate_batch(df, blocklist=BLOCK)
    kept = {r.doc_id: r for r in curated.collect()}
    quar = {r.doc_id: r["quarantine_reason"] for r in quarantine.collect()}
    assert set(kept) == {0, 2, 4}
    assert quar == {1: "repetition", 3: "blocklist"}
    # PII redacted in place, raw preserved
    assert "[EMAIL]" in kept[2]["text"]
    assert "x@y.io" in kept[2]["text_raw"]
    # curated ∪ quarantined = input (row-conservation)
    assert curated.count() + quarantine.count() == len(ROWS)


def test_stream_curation_available_now(spark, tmp_path):
    inp = str(tmp_path / "landing")
    cur = str(tmp_path / "curated")
    quar = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(ROWS, SCHEMA).repartition(2).write.parquet(inp)

    q = start_curation(
        spark, inp, cur, quar, ckpt, blocklist=BLOCK
    )
    q.awaitTermination(120)
    curated = spark.read.parquet(cur)
    assert {r.doc_id for r in curated.collect()} == {0, 2, 4}
    assert {r.doc_id for r in spark.read.parquet(quar).collect()} == {1, 3}

    # resume: nothing new → no duplicate appends
    q2 = start_curation(spark, inp, cur, quar, ckpt, blocklist=BLOCK)
    q2.awaitTermination(120)
    assert spark.read.parquet(cur).count() == 3

    # a new landing batch is picked up incrementally
    extra = [(10, "fresh clean wholly distinct words arrive now", "en", "a", 44)]
    spark.createDataFrame(extra, SCHEMA).write.mode("append").parquet(inp)
    q3 = start_curation(spark, inp, cur, quar, ckpt, blocklist=BLOCK)
    q3.awaitTermination(120)
    after = spark.read.parquet(cur)
    assert after.count() == 4
    assert after.filter(F.col("doc_id") == 10).count() == 1


def test_stream_incremental_span_dedup(spark, tmp_path):
    """Cross-batch span dedup: batch 2's doc that replays batch 1's span
    is quarantined as span_duplicate; fresh docs pass; the gram index
    accumulates."""
    inp = str(tmp_path / "landing2")
    cur = str(tmp_path / "curated2")
    quar = str(tmp_path / "quarantine2")
    ckpt = str(tmp_path / "ckpt2")
    idx = str(tmp_path / "gram_index")

    span = "shared boilerplate passage with plenty of words that repeats verbatim across batches"
    b1 = [
        (0, f"{span} and a first unique tail of words", "en", "a", 0),
        (1, "wholly different clean document with diverse words", "en", "a", 0),
    ]
    spark.createDataFrame(b1, SCHEMA).write.parquet(inp)
    q = start_curation(
        spark, inp, cur, quar, ckpt, span_index_dir=idx, span_k=5
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(cur).collect()} == {0, 1}
    n_grams_1 = spark.read.parquet(idx).distinct().count()
    assert n_grams_1 > 0

    # batch 2: one doc is mostly batch-1 span (drop), one is fresh (keep)
    b2 = [
        (10, f"{span} mail me a1@b.io now", "en", "a", 0),
        (11, "completely novel text with entirely fresh vocabulary words", "en", "a", 0),
    ]
    spark.createDataFrame(b2, SCHEMA).write.mode("append").parquet(inp)
    q2 = start_curation(
        spark, inp, cur, quar, ckpt, span_index_dir=idx, span_k=5
    )
    q2.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(cur).collect()} == {0, 1, 11}
    quarantined = {
        r.doc_id: r["quarantine_reason"]
        for r in spark.read.parquet(quar).collect()
    }
    assert quarantined.get(10) == "span_duplicate"
    # quarantine text is uniformly RAW for every reason: span rows come
    # from curated (whose text is already redacted), so the raw copy
    # must be restored before the union (round-3 ADVICE)
    quar_text = {
        r.doc_id: r["text"] for r in spark.read.parquet(quar).collect()
    }
    assert "a1@b.io" in quar_text[10]
    assert "[EMAIL]" not in quar_text[10]
    assert spark.read.parquet(idx).distinct().count() > n_grams_1
