"""Deterministic corpus sharding — the pre-training "global shuffle".

Training pipelines consume the curated corpus as N shard files in a
pseudo-random but REPRODUCIBLE order: the shard a document lands in and
its position within the shard must depend only on (key, seed), never on
Spark's physical partitioning, task scheduling, or input file order —
otherwise two materializations of "the same" training run read
different data orders. This module derives both from a deterministic
hash:

  shard    = H(key, seed)  mod n_shards
  sort_key = H(key, seed + 1)          (within-shard pseudo-random order)

Scale design (10^12 sequences): assignment is a pure per-row projection
(zero shuffle); the write is exactly ONE exchange —
``repartition(n_shards, shard)`` + ``sortWithinPartitions`` — so each
reducer task streams one shard file out in final order (the classic
total-order-write pattern without a range sampling pass, because the
target order is hash order, already uniform by construction). Shard
balance is hash-uniform: expected deviation ~sqrt(docs/n_shards) docs;
``shard_stats`` reports measured balance and pins the exact membership
via per-shard key sums.

Default hash is xxhash64 (8-byte JVM path); ``portable=True`` swaps the
md5-prefix hash (``dedup.portable_word_hash``) that DuckDB reproduces
bit-exactly, so the gate oracle recomputes assignment, order, and
balance entirely in SQL.

The reference has no training-output surface (it is a quality/drift
service); this extension sits beside ``sampling.py`` (what to keep) and
``packing.py`` (how to window) as the "how to lay it out" step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import portable_word_hash


def _shard_hash(key: F.Column, seed: int, portable: bool) -> F.Column:
    """Non-negative 60/63-bit deterministic hash of (key, seed)."""
    tagged = F.concat(key.cast("string"), F.lit(f":{seed}"))
    if portable:
        return portable_word_hash(tagged)
    return F.abs(F.xxhash64(tagged))


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``sort_key`` columns. Pure
    projection — no shuffle; deterministic in (key, seed) only."""
    key = F.col(key_col)
    return df.withColumn(
        "shard", F.pmod(_shard_hash(key, seed, portable), F.lit(n_shards)).cast("int")
    ).withColumn("sort_key", _shard_hash(key, seed + 1, portable))


def shard_layout(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """The corpus in its final physical training layout: every shard's
    rows land wholly inside one task (hash repartition on ``shard`` —
    tasks may hold 0 or 2+ whole shards, rows of one shard never
    straddle tasks), contiguous and in within-shard order. Write with
    ``.write.partitionBy("shard")`` to get exactly one ordered file per
    shard. The plan has exactly one exchange."""
    return (
        assign_shards(df, n_shards, key_col, seed, portable)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", key_col)
    )


def shard_stats(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-shard balance + exact-membership accounting: row count,
    sum/min/max of the (numeric-castable) key — pins which rows landed
    where — and the first/last sort_key (pins the order's endpoints)."""
    assigned = assign_shards(df, n_shards, key_col, seed, portable)
    key_num = F.col(key_col).cast("bigint")
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(key_num).alias("key_sum"),
            F.min(key_num).alias("key_min"),
            F.max(key_num).alias("key_max"),
            F.min("sort_key").alias("first_sort_key"),
            F.max("sort_key").alias("last_sort_key"),
        )
        .orderBy("shard")
    )
