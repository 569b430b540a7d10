"""Token-level exact-substring deduplication (duplicated n-gram spans).

Doc-level dedup (exact digests, MinHash/SimHash in ``dedup.py``) misses
the dominant duplication mode in web-scale training corpora: the SAME
boilerplate span (license headers, navigation chrome, quoted passages)
repeated inside otherwise-distinct documents. Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") remove
every repeated substring of >= 50 tokens with a corpus suffix array;
this module implements the same semantics at n-gram granularity over
the ``tokens:array<int>`` column of the sequence table:

  * a k-gram (k consecutive token ids) that occurs >= 2 times anywhere
    in the corpus is a *duplicated span seed*;
  * the globally FIRST occurrence — minimum ``(doc_id, pos)`` — is
    canonical and kept; every other occurrence is removed;
  * a token is *covered* (removed) when any non-canonical duplicated
    k-gram starting at positions ``pos .. pos+k-1`` spans it; covered
    regions from overlapping grams merge naturally (the covered-index
    set is the union of the k-windows), so an L-token repeated passage
    (L >= k) is removed wholesale, exactly like the suffix-array method
    restricted to match length >= k.

Scale design (10^12 sequences):

  * gram extraction is a narrow per-row ``transform`` + ``posexplode``
    — O(n_tok * k) work, no shuffle; the exploded rows carry ONLY
    ``(gram: 8-byte xxhash64, doc_id, pos)``, never token payloads;
  * the duplicate census is one ``groupBy(gram)`` whose map-side
    partial aggregation collapses each task's repeated grams before the
    exchange, so the shuffle is bounded by distinct-grams-per-task, not
    occurrences;
  * ``count >= 2`` grams join back to the occurrence stream on the
    8-byte gram key (AQE picks the strategy; the duplicated subset is
    usually small enough to broadcast);
  * per-doc coverage/removal is pure JVM array algebra on the
    ``collect_list`` of removed start positions (bounded by n_tok) —
    no Python UDF anywhere.

The occurrence stream is consumed twice (census + join-back); pass an
already-persisted ``df`` or let the recompute cost two scans — at 100 TB
you would checkpoint the 20-byte occurrence frame instead (noted, not
forced, because the gate-scale recompute is cheaper than the cache).

Suffix-array dedup avoids materializing one row per token position;
this formulation spends that explode to stay in pure DataFrame algebra
with a map-side-combined, fixed-width shuffle — the classic Spark
trade. A BigQuery/Spark variant of the same n-gram formulation is what
RefinedWeb (Penedo et al. 2023, §3.3) actually ran in production.

The reference ships no token-level operators at all (its quality checks
are tabular: backend/app/services/quality_check.py:25-191); this module
is a training-pipeline extension over the graft's token payload, next
to ``contamination.py`` (train/eval grams) and ``packing.py``.

``portable=True`` swaps xxhash64 for the md5-hex gram key that DuckDB
reproduces bit-exactly (same construction as
``dedup.portable_word_hash``) so the driver oracle can recompute the
whole operator in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _gram_expr(tokens: F.Column, k: int, portable: bool) -> F.Column:
    """Array of per-position gram keys for one document (empty if
    n_tok < k). O(n_tok * k) inside one codegen'd projection."""
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), n - k)  # 0-based start positions
    if portable:
        gram = lambda i: F.md5(  # noqa: E731
            F.array_join(
                F.transform(F.slice(tokens, i + 1, k), lambda t: t.cast("string")),
                ",",
            )
        )
    else:
        gram = lambda i: F.xxhash64(F.slice(tokens, i + 1, k))  # noqa: E731
    # sequence(0, n-k) DESCENDS when n < k (negative stop) — guard to empty
    return F.when(n >= k, F.transform(starts, gram)).otherwise(
        F.array().cast("array<string>" if portable else "array<bigint>")
    )


def ngram_occurrences(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """One row per k-gram occurrence: (id_col, pos, gram). Narrow —
    no shuffle; rows are (key, int, 8-byte hash)."""
    return df.select(
        F.col(id_col),
        F.posexplode(_gram_expr(F.col(tokens_col), k, portable)).alias("pos", "gram"),
    )


def duplicated_span_occurrences(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Every occurrence of a gram seen >= 2 times corpus-wide, flagged
    canonical (global min (id, pos) — the one occurrence kept) or not.

    Columns: id_col, pos, gram, gram_count, is_canonical.
    """
    occ = ngram_occurrences(df, k, tokens_col, id_col, portable)
    census = (
        occ.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("gram_count"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_canon"),
        )
        .filter(F.col("gram_count") >= 2)
    )
    return occ.join(census, "gram").select(
        F.col(id_col),
        "pos",
        "gram",
        "gram_count",
        (
            (F.col("_canon")[id_col] == F.col(id_col))
            & (F.col("_canon")["pos"] == F.col("pos"))
        ).alias("is_canonical"),
    )


def _removed_starts(
    df: DataFrame, k: int, tokens_col: str, id_col: str, portable: bool
) -> DataFrame:
    """Per-doc sorted start positions of non-canonical duplicated grams."""
    return (
        duplicated_span_occurrences(df, k, tokens_col, id_col, portable)
        .filter(~F.col("is_canonical"))
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list("pos")).alias("_dup_starts"),
            F.count(F.lit(1)).alias("removed_occurrences"),
        )
    )


def _with_coverage(
    df: DataFrame, k: int, tokens_col: str, id_col: str, portable: bool
) -> DataFrame:
    """df + _dup_starts / removed_occurrences / _cov (sorted covered
    token indices); docs with no duplication get empties, not nulls."""
    removed = _removed_starts(df, k, tokens_col, id_col, portable)
    out = df.join(removed, id_col, "left")
    starts = F.coalesce(F.col("_dup_starts"), F.array().cast("array<int>"))
    cov = F.array_sort(
        F.array_distinct(
            F.flatten(F.transform(starts, lambda p: F.sequence(p, p + k - 1)))
        )
    )
    return out.withColumn(
        "removed_occurrences", F.coalesce("removed_occurrences", F.lit(0))
    ).withColumn("_cov", cov)


def span_dedup_stats(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Per-document duplication accounting (all-integer, oracle-friendly):

    id_col, n_tok, removed_occurrences (non-canonical dup-gram starts),
    covered_tokens (union of their k-windows), kept_n_tok,
    kept_token_sum (sum of surviving token ids — pins the exact kept
    set without shipping the arrays).
    """
    toks = F.col(tokens_col)
    covered_sum = F.aggregate(
        F.col("_cov"),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + F.element_at(toks, i + 1).cast("bigint"),
    )
    total_sum = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + t.cast("bigint")
    )
    return _with_coverage(df, k, tokens_col, id_col, portable).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tok"),
        F.col("removed_occurrences").cast("bigint").alias("removed_occurrences"),
        F.size("_cov").cast("bigint").alias("covered_tokens"),
        (F.size(toks) - F.size("_cov")).cast("bigint").alias("kept_n_tok"),
        (total_sum - covered_sum).alias("kept_token_sum"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """df with ``tokens_col`` rewritten to drop every token covered by a
    non-canonical duplicated span (first corpus-wide occurrence kept),
    plus ``covered_tokens``. Schema otherwise preserved; ``n_tok``-style
    derived columns are the caller's to refresh."""
    covered = _with_coverage(df, k, tokens_col, id_col, portable)
    kept = F.filter(
        F.col(tokens_col), lambda t, i: ~F.array_contains(F.col("_cov"), i)
    )
    return (
        covered.withColumn("covered_tokens", F.size("_cov"))
        .withColumn(tokens_col, kept)
        .drop("_dup_starts", "_cov", "removed_occurrences")
    )


def span_dedup_summary(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """One-row corpus roll-up: docs/tokens totals, affected docs,
    removed tokens + pct, distinct duplicated grams, removed
    occurrences. Two aggregations (per-doc stats + gram census) — the
    census is re-derived rather than threaded through to keep each
    public function standalone."""
    stats = span_dedup_stats(df, k, tokens_col, id_col, portable)
    per_doc = stats.agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum((F.col("covered_tokens") > 0).cast("bigint")).alias("docs_affected"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum("covered_tokens").alias("tokens_removed"),
        F.sum("removed_occurrences").alias("removed_occurrences"),
    )
    census = (
        ngram_occurrences(df, k, tokens_col, id_col, portable)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .agg(F.count(F.lit(1)).alias("dup_grams"))
    )
    return per_doc.crossJoin(F.broadcast(census)).select(
        "docs_total",
        "docs_affected",
        "tokens_total",
        "tokens_removed",
        F.round(
            100.0 * F.col("tokens_removed") / F.col("tokens_total"), 4
        ).alias("removed_pct"),
        F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
        "removed_occurrences",
    )
