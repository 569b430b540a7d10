"""Structured-Streaming monitoring over arriving sequence batches.

The reference *intends* streaming but ships none of it: ``streaming/
{kafka_consumer,drift_monitor,alerts_stream}.py`` are 0-byte stubs, the
intent is described at ``README.md:23,196-199``, and the flag is off at
``config/settings.py:84`` (``streaming_enabled: False``). This module
supplies the capability Spark-natively:

- **micro-batch re-validation**: ``spark.readStream`` over the landing
  directory of sequence parquet with the ``availableNow`` trigger — each
  trigger drains everything new, runs the SAME batch pipeline
  (``plans.pipeline.build_verdicts``) via ``foreachBatch``, and appends
  verdict rows tagged with the batch id. Exactly-once bookkeeping comes
  from the checkpoint directory; on a real deployment the source would be
  Kafka (``format("kafka")``) or an Iceberg streaming read — only the
  ``readStream`` line changes.
- **windowed event aggregation with watermarks**: the canonical
  late-data-tolerant tumbling-window count used by the alerts stream the
  reference sketched.

foreachBatch is the right integration point here (not stateful operators):
every check the engine runs is an aggregate over the *batch*, so reusing
the batch operators gives identical semantics in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..schema import SEQUENCES_SCHEMA


def start_monitor(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    ref_stats: DataFrame | None = None,
    allowed_sources: DataFrame | None = None,
    ref_digests: DataFrame | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """Stream-validate arriving sequence files; returns the StreamingQuery.

    Each micro-batch runs the full verdict pipeline and appends to
    ``output_dir`` with the micro-batch id as lineage. ``available_now=True``
    processes the current backlog then stops (the "monitoring re-run" mode);
    ``False`` keeps polling — both share the checkpoint, so a crashed run
    resumes without reprocessing finished batches.
    """
    from ..plans.pipeline import build_verdicts, release_cached

    stream = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        built = build_verdicts(
            batch_df,
            ref_stats=ref_stats,
            allowed_sources=allowed_sources,
            ref_digests=ref_digests,
            config=config,
        )
        try:
            built.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(output_dir)
        finally:
            # unpersist per micro-batch: a long-running stream must not
            # accumulate cached plans in the SQL CacheManager
            release_cached(built)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts — works on a streaming OR batch
    DataFrame (same plan; watermark is a no-op in batch). The late-data
    semantics the reference's alerts stream sketched but never built."""
    gc = group_cols or []
    w = F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *gc)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), *gc, "n_events")
    )
