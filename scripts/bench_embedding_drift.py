"""Embedding-drift throughput at scale: per-dim Welch z + summary over
the 1M-vector 64-dim corpus (parity split, planted +0.25 dim-0 shift on
the cur side — the same construction the oracle gate checks at sf0.01).

The interesting property: the posexplode path touches every element
(vecs x dim rows through the partial aggregate) but the one exchange
carries only dim rows per map task — vectors never shuffle.

Usage: python scripts/bench_embedding_drift.py [vecs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> None:
    from data_drift_monitoring_spark.session import get_spark
    from data_drift_monitoring_spark.operators.embedding_drift import (
        embedding_drift,
        embedding_drift_summary,
    )
    from pyspark.sql import functions as F

    from data_drift_monitoring_spark.generator import generate_embedding_corpus

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"emb_corpus_{VECS}_42",
    )
    if not os.path.exists(os.path.join(cache, "truth.parquet")):
        t0 = time.time()
        stats = generate_embedding_corpus(cache, n_vecs=VECS, seed=42)
        print(f"# generated corpus in {time.time()-t0:.0f}s: {stats}",
              file=sys.stderr)

    spark = get_spark(
        master=f"local[{CORES}]",
        shuffle_partitions=max(4 * CORES, 32),
        # GC threads pinned so a local[1] JVM doesn't borrow all 32 host
        # cores for GC and silently deflate the N-core baseline
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(CORES, 1)} -Xlog:disable"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(cache, "vecs"))
    n_vecs = e.count()
    dim = len(e.select("embedding").first()[0])

    shifted = F.transform(
        "embedding",
        lambda x, i: x.cast("double")
        + F.when(i == 0, F.lit(0.25)).otherwise(F.lit(0.0)),
    )
    cur = e.filter(F.col("vec_id") % 2 == 1).select(shifted.alias("embedding"))
    ref = e.filter(F.col("vec_id") % 2 == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )

    best = None
    summary = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        per_dim = embedding_drift(cur, ref, z_threshold=3.0)
        summary = embedding_drift_summary(per_dim).collect()[0]
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)

    print(json.dumps({
        "metric": "embedding_drift",
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "n_vecs": int(n_vecs),
        "dim": dim,
        "elements": int(n_vecs) * dim,
        "cores": CORES,
        "sec": round(best, 2),
        "elements_per_sec": round(n_vecs * dim / best),
        "n_dims": int(summary["n_dims"]),
        "n_drifted": int(summary["n_drifted"]),
        "centroid_cosine": round(float(summary["centroid_cosine"]), 6),
        "max_abs_z": round(float(summary["max_abs_z"]), 2),
        "verdict": summary["verdict"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
