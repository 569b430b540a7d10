"""Embedding-space drift between two snapshots of a vector column.

Extends the reference's promised drift checks (0-byte stubs under
``backend/app/core/drift/``) to the embedding payload a modern training
pipeline carries alongside text: per-dimension two-sample Welch z-tests
plus whole-space summary evidence (centroid cosine, drifted-dimension
count). Catches encoder swaps, normalization bugs, and upstream
distribution shift that n_tok / source histograms cannot see.

Scale shape: ``posexplode`` is narrow (no shuffle — rows pipeline through
the generator), and the per-dimension aggregation partial-aggregates
map-side, so the single exchange carries at most ``dim`` rows per map
task regardless of corpus size — at 10^12 sequences the shuffled bytes
are bounded by dim x tasks, never by vectors. The per-dim join and the
summary run on a dim-row frame (~64-4096 rows), negligible at any scale.

Elements are cast to double BEFORE aggregation so results are
reproducible bit-for-bit against external engines (float32 accumulation
order would otherwise differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, n, mean, var, std) over an array<float/double>
    column. ``dim`` is 0-based. Null vectors contribute nothing (explode
    drops them); ragged vectors simply contribute to the dims they have.
    """
    e = df.select(F.posexplode(F.col(vec_col)).alias("dim", "val")).select(
        "dim", F.col("val").cast("double").alias("val")
    )
    return e.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("val").alias("mean"),
        F.var_samp("val").alias("var"),
        F.stddev_samp("val").alias("std"),
    )


def embedding_drift(
    cur: DataFrame,
    ref: DataFrame,
    vec_col: str = "embedding",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-dimension drift: (dim, n_cur, n_ref, mean_cur, mean_ref,
    std_cur, std_ref, z_shift, drifted) via the two-sample Welch z
    statistic ``(mean_cur - mean_ref) / sqrt(var_cur/n_cur +
    var_ref/n_ref)``. ``drifted`` = |z| >= z_threshold (int 0/1).
    Zero-variance-on-both-sides dims get NULL z (no test possible) and
    drift by mean inequality alone.
    """
    c = dim_stats(cur, vec_col).select(
        "dim",
        F.col("n").alias("n_cur"),
        F.col("mean").alias("mean_cur"),
        F.col("var").alias("var_cur"),
        F.col("std").alias("std_cur"),
    )
    r = dim_stats(ref, vec_col).select(
        "dim",
        F.col("n").alias("n_ref"),
        F.col("mean").alias("mean_ref"),
        F.col("var").alias("var_ref"),
        F.col("std").alias("std_ref"),
    )
    j = c.join(r, on="dim", how="outer")
    se = F.sqrt(
        F.col("var_cur") / F.col("n_cur") + F.col("var_ref") / F.col("n_ref")
    )
    z = F.when(se > 0, (F.col("mean_cur") - F.col("mean_ref")) / se)
    # a dim present on only one side (outer join: encoder/dimensionality
    # change) is definitionally drifted — without the explicit clause
    # every comparison below is NULL and the summary's sum() would
    # silently count ZERO drift for a blatant 512->768 encoder swap
    one_sided = F.col("n_cur").isNull() | F.col("n_ref").isNull()
    drifted = (
        F.when(one_sided, F.lit(1))
        .when(se > 0, (F.abs(z) >= F.lit(z_threshold)).cast("int"))
        .otherwise((F.col("mean_cur") != F.col("mean_ref")).cast("int"))
    )
    return j.select(
        "dim",
        "n_cur",
        "n_ref",
        "mean_cur",
        "mean_ref",
        "std_cur",
        "std_ref",
        z.alias("z_shift"),
        drifted.alias("drifted"),
    )


def embedding_drift_summary(per_dim: DataFrame) -> DataFrame:
    """One-row whole-space verdict over :func:`embedding_drift` output:
    (n_dims, centroid_cosine, mean_abs_z, max_abs_z, n_drifted, verdict).

    ``centroid_cosine`` is the cosine similarity between the two mean
    vectors — 1.0 means the centroids coincide in direction; a drop
    signals a global shift (e.g. a different encoder checkpoint).
    """
    dot = F.sum(F.col("mean_cur") * F.col("mean_ref"))
    nc = F.sqrt(F.sum(F.col("mean_cur") * F.col("mean_cur")))
    nr = F.sqrt(F.sum(F.col("mean_ref") * F.col("mean_ref")))
    return per_dim.agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.when((nc > 0) & (nr > 0), dot / (nc * nr)).alias(
            "centroid_cosine"
        ),
        F.avg(F.abs("z_shift")).alias("mean_abs_z"),
        F.max(F.abs("z_shift")).alias("max_abs_z"),
        F.sum("drifted").cast("long").alias("n_drifted"),
    ).select(
        "n_dims",
        "centroid_cosine",
        "mean_abs_z",
        "max_abs_z",
        "n_drifted",
        F.when(F.col("n_drifted") > 0, F.lit("drift"))
        .otherwise(F.lit("none"))
        .alias("verdict"),
    )
