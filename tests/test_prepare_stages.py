"""plans.prepare.prepare_training_stages: the composable stage pipeline
behind jobs/prepare_training_data.py (and the q_prepare_training_data
oracle query). Planted victims pin that each stage removes exactly its
own targets; portable=True pins the md5 hash family end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_drift_monitoring_spark.plans.prepare import (
    PrepareConfig,
    prepare_training_stages,
)


def _fixture(spark):
    # Every doc gets a mostly-unique word soup: shared words across docs
    # would make them real trigram-Jaccard near-duplicates at the 0.5
    # threshold (the pipeline would then CORRECTLY collapse them), so
    # each planted victim must be catchable only by its intended stage.
    rows = []
    for i in range(40):
        words = " ".join(f"token{i}x{j}" for j in range(25))
        rows.append((i, f"doc {i} begins {words} ends", "srcA"))
    # repetition victim: one word repeated 60x
    rows.append((100, " ".join(["junk"] * 60), "srcA"))
    # PII victim: email must be redacted before dedup/tokenize
    pii_base = " ".join(f"piiword{j}" for j in range(25))
    rows.append((101, pii_base + " mail bob.smith@example.com now", "srcB"))
    # exact-dup pair: 103 duplicates 102 (keep-first = 102)
    exact_base = " ".join(f"alphaword{j}" for j in range(25))
    rows.append((102, exact_base + " unique ending alpha", "srcB"))
    rows.append((103, exact_base + " unique ending alpha", "srcB"))
    # near-dup pair: 105 is 104 with one word changed (keep min = 104)
    near_base = " ".join(f"omegaword{j}" for j in range(25))
    rows.append((104, near_base + " omega closing words here", "srcB"))
    rows.append((105, near_base + " omega closing words there", "srcB"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_stage_dict_and_victim_routing(spark):
    df = _fixture(spark)
    cfg = PrepareConfig(
        context_len=16,
        n_shards=4,
        span_k=6,
        minhash_threshold=0.5,
        num_hashes=64,
        bands=32,
        vocab=32768,
        portable=True,
    )
    st = prepare_training_stages(df, cfg)
    assert list(st) == [
        "input",
        "curate",
        "exact_dedup",
        "near_dedup",
        "tokenize",
        "span_dedup",
        "pack",
        "shard",
    ]

    ids = lambda f: {r[0] for r in f.select("doc_id").collect()}  # noqa: E731
    after_curate = ids(st["curate"])
    assert 100 not in after_curate  # repetition victim dropped
    assert 101 in after_curate
    # PII redacted in place before any downstream stage sees the text
    red = st["curate"].filter("doc_id = 101").select("text").first()[0]
    assert "bob.smith@example.com" not in red and "[EMAIL]" in red

    after_exact = ids(st["exact_dedup"])
    assert 102 in after_exact and 103 not in after_exact  # keep-first

    after_near = ids(st["near_dedup"])
    assert 104 in after_near and 105 not in after_near  # keep min key

    # token accounting is consistent span_dedup -> pack -> shard
    tok6 = st["span_dedup"].agg(F.sum("n_tok")).first()[0]
    tok7 = st["pack"].agg(F.sum("n_tok")).first()[0]
    assert tok6 == tok7
    cov = st["span_dedup"].agg(F.sum("covered_tokens")).first()[0]
    tok5 = st["tokenize"].agg(F.sum("n_tok")).first()[0]
    assert tok5 == tok6 + cov

    shards = st["shard"].select("shard").distinct().collect()
    assert all(0 <= r[0] < 4 for r in shards)
    assert ids(st["shard"]) == after_near


def test_portable_and_default_hash_same_shape(spark):
    """The hash family changes token ids, never counts or membership."""
    df = _fixture(spark)
    kw = dict(
        context_len=16,
        n_shards=4,
        span_k=6,
        minhash_threshold=0.5,
        num_hashes=64,
        bands=32,
        vocab=32768,
    )
    a = prepare_training_stages(df, PrepareConfig(portable=True, **kw))
    b = prepare_training_stages(df, PrepareConfig(portable=False, **kw))
    rows_a = a["tokenize"].agg(F.count("*"), F.sum("n_tok")).first()
    rows_b = b["tokenize"].agg(F.count("*"), F.sum("n_tok")).first()
    assert tuple(rows_a) == tuple(rows_b)
