"""Composable end-to-end training-data preparation stages.

The staged raw-documents → training-shards pipeline behind
``jobs/prepare_training_data.py`` (no reference analogue — the
reference stops at validation reports; this is the BASELINE.json
north-star "training pipeline" role), factored into a library function
so the same composition is (a) spark-submit-able from the CLI job,
(b) unit-testable stage by stage, and (c) runnable under the oracle
gate with the portable (md5-based) hash family that an external SQL
engine reproduces bit-exactly.

Stage order (each optional stage skippable):

  curate      — Gopher repetition keep-filter + in-place PII redaction
  quality     — CCNet-style logistic classifier keep-filter
  exact_dedup — keep-first (min key) per normalized-content digest
  near_dedup  — MinHash+LSH exact-verified pairs → cluster keep-one
  tokenize    — deterministic word-hash tokens
  span_dedup  — drop non-canonical duplicated k-gram token spans
  pack        — fixed context-window layout (distributed prefix sum)
  shard       — deterministic hash shards in final physical order

Every stage is declarative DataFrame algebra over the previous stage;
nothing here collects. At 100-TB scale the expensive exchanges are the
ones the underlying operators already bound: exact dedup shuffles
16-byte digests, near-dup shuffles banded 24-byte signature rows,
span dedup shuffles gram census counts, pack runs the two-level
distributed prefix sum, shard is exactly one exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators import dedup as D
from ..operators import span_dedup as SD
from ..operators.packing import pack_windows
from ..operators.pii import redact_pii
from ..operators.repetition import repetition_flags
from ..operators.sharding import shard_layout
from ..operators.text_analysis import tokenize_words


@dataclass
class PrepareConfig:
    """Knobs for :func:`prepare_training_stages`; defaults match the
    CLI job's defaults (jobs/prepare_training_data.py)."""

    text_col: str = "text"
    key_col: str = "doc_id"
    context_len: int = 2048
    n_shards: int = 64
    curate: bool = True
    near_dedup: bool = True
    span_dedup: bool = True
    span_k: int = 16
    minhash_threshold: float = 0.7
    num_hashes: int = 64
    bands: int = 16
    vocab: int = (1 << 31) - 1
    seed: int = 0
    prefix_buckets: int | None = None
    # md5-prefix hash family (tokenize/span grams/shard) that DuckDB
    # reproduces bit-exactly — the oracle-gate configuration
    portable: bool = False


def prepare_training_stages(
    df: DataFrame,
    cfg: PrepareConfig | None = None,
    quality_model=None,
    quality_threshold: float = 0.5,
) -> dict[str, DataFrame]:
    """Run the preparation pipeline and return an ordered dict of the
    frame AFTER each executed stage (insertion order = stage order).

    Keys (optional stages appear only when enabled): ``input``,
    ``curate``, ``quality``, ``exact_dedup``, ``near_dedup``,
    ``tokenize``, ``span_dedup`` (still carrying ``covered_tokens``),
    ``pack``, ``shard``. ``quality_model`` is a fitted
    :mod:`..operators.quality_classifier` model (zero-shuffle scoring
    projection when given).
    """
    cfg = cfg or PrepareConfig()
    tc, kc = cfg.text_col, cfg.key_col
    orig_cols = df.columns
    stages: dict[str, DataFrame] = {"input": df}

    if cfg.curate:
        df = (
            repetition_flags(df, text_col=tc)
            .filter(F.col("repetition_keep"))
            .select(*orig_cols)
        )
        # out_col=tc replaces the text IN PLACE — the default would
        # write '<text>_redacted' which select(*orig_cols) drops,
        # silently shipping unredacted text into the shards
        df = redact_pii(df, text_col=tc, out_col=tc).select(*orig_cols)
        stages["curate"] = df

    if quality_model is not None:
        from ..operators.quality_classifier import score_quality

        df = (
            score_quality(
                df, quality_model, text_col=tc, threshold=quality_threshold
            )
            .filter("keep")
            .select(*orig_cols)
        )
        stages["quality"] = df

    df = D.dedup_exact_content(df, kc, text_col=tc)
    stages["exact_dedup"] = df

    if cfg.near_dedup:
        pairs = D.minhash_verified_duplicates(
            df,
            kc,
            text_col=tc,
            threshold=cfg.minhash_threshold,
            num_hashes=cfg.num_hashes,
            bands=cfg.bands,
        )
        df = D.dedup_by_clusters(df, pairs, kc)
        stages["near_dedup"] = df

    df = tokenize_words(df, text_col=tc, vocab=cfg.vocab, portable=cfg.portable)
    stages["tokenize"] = df

    if cfg.span_dedup:
        df = SD.remove_duplicate_spans(
            df, k=cfg.span_k, id_col=kc, portable=cfg.portable
        ).withColumn("n_tok", F.size("tokens").cast("int"))
        stages["span_dedup"] = df
        df = df.drop("covered_tokens")

    packed = pack_windows(
        df,
        context_len=cfg.context_len,
        order_col=kc,
        prefix_buckets=cfg.prefix_buckets,
    )
    stages["pack"] = packed

    stages["shard"] = shard_layout(
        packed, cfg.n_shards, key_col=kc, seed=cfg.seed, portable=cfg.portable
    )
    return stages
