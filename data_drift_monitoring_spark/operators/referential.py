"""Referential / allowed-values checks — broadcast anti-join (J3).

The reference only validates schema and dtypes (README.md:25-28,
file_handler.py:206-235); the north_star adds a referential check of
``source`` against an allowed-values dimension. The dimension is tiny, so the
correct distributed shape is a broadcast-hash LEFT ANTI join: no shuffle of
the fact table, each task probes an in-memory hash set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def referential_violations(
    df: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str | None = None,
) -> DataFrame:
    """Rows of ``df`` whose ``fk`` has no match in ``dim.pk`` (nulls included:
    a null FK cannot reference anything). Broadcast left-anti join."""
    pk = pk or fk
    d = dim.select(F.col(pk).alias(fk)).distinct()
    return df.join(F.broadcast(d), on=fk, how="left_anti").withColumn(
        "check", F.lit("referential")
    )


def referential_stats(
    df: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str | None = None,
    partition_col: str = "part_id",
) -> DataFrame:
    """Per-partition violation counts: left join against the broadcast dim,
    count misses — still a single pass over the fact table."""
    pk = pk or fk
    d = dim.select(F.col(pk).alias(fk), F.lit(1).alias("_hit")).distinct()
    joined = df.join(F.broadcast(d), on=fk, how="left")
    return joined.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_hit").isNull().cast("long")).alias("violations"),
        F.round(
            F.sum(F.col("_hit").isNull().cast("long")) / F.count(F.lit(1)) * 100,
            2,
        ).alias("violation_pct"),
    )
