"""Text-analysis throughput at scale: the full per-doc enrichment stack
(token counts, quality scoring, lang-ID, rolling-hash fingerprint) over
the 1M-document dedup corpus, forced through a single aggregate so every
row is computed but nothing is collected.

This is the one-pass "curation profile" a training-data pipeline runs
over every document; all four ops are JVM expressions (no Python in the
hot path), so the job is scan + whole-stage-codegen compute with a
lang/fingerprint rollup as the only (tiny) exchange.

Usage: python scripts/bench_text_analysis.py [--docs 1000000] [--cpus 16]
Prints one JSON line. Reuses .bench_cache/dedup_corpus_<docs>_42/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)),
    )
    args = ap.parse_args()

    from data_drift_monitoring_spark.generator import generate_dedup_corpus
    from data_drift_monitoring_spark.operators.text_analysis import (
        with_fingerprint,
        with_lang_id,
        with_quality_score,
        with_token_count,
    )
    from data_drift_monitoring_spark.session import get_spark
    from pyspark.sql import functions as F

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"dedup_corpus_{args.docs}_{SEED}",
    )
    if not os.path.exists(os.path.join(cache, "truth.parquet")):
        t0 = time.time()
        stats = generate_dedup_corpus(cache, n_docs=args.docs, seed=SEED)
        print(f"# generated corpus in {time.time()-t0:.0f}s: {stats}",
              file=sys.stderr)

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(4 * args.cpus, 32),
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(args.cpus, 1)} -Xlog:disable"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(cache, "docs"))

    best = None
    row = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        enriched = with_fingerprint(
            with_lang_id(with_quality_score(with_token_count(docs)))
        )
        row = enriched.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.approx_count_distinct("fingerprint").alias("approx_fps"),
            F.count_distinct("lang_pred").alias("n_langs"),
        ).collect()[0]
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)

    print(json.dumps({
        "metric": "text_analysis",
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "n_docs": int(row["n_docs"]),
        "total_words_m": round(row["total_words"] / 1e6, 1),
        "cpus": args.cpus,
        "sec": round(best, 2),
        "docs_per_sec": round(row["n_docs"] / best),
        "words_per_sec": round(row["total_words"] / best),
        "avg_quality": float(row["avg_quality"]),
        "approx_fingerprints": int(row["approx_fps"]),
        "n_langs": int(row["n_langs"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
