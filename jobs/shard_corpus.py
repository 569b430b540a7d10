"""spark-submit entry: deterministic corpus sharding — the pre-training
global shuffle (no reference analogue; BASELINE.json north-star
training-pipeline role).

Cluster usage::

    spark-submit --py-files engine.zip jobs/shard_corpus.py \
        --input /path/to/corpus.parquet --output /path/to/shards \
        --n-shards 1024 [--seed 0] [--key-col doc_id] [--drop-sort-key]

Shard membership and within-shard order are pure functions of
(key, seed): rerunning — at any cluster size or partitioning —
reproduces byte-identical shards. Output is one ordered parquet file
per shard under ``shard=<i>/`` directories; the whole job is a single
exchange.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus path (parquet)")
    ap.add_argument("--output", required=True, help="sharded output dir")
    ap.add_argument("--n-shards", type=int, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--drop-sort-key", action="store_true",
                    help="omit the sort_key column from the output files")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if args.n_shards < 1:
        raise SystemExit("--n-shards must be >= 1")

    from data_drift_monitoring_spark.operators.sharding import (
        shard_layout,
        shard_stats,
    )
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="shard-corpus", master=args.master)
    df = spark.read.parquet(args.input)
    out = shard_layout(df, args.n_shards, key_col=args.key_col, seed=args.seed)
    if args.drop_sort_key:
        out = out.drop("sort_key")
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    balance = (
        shard_stats(df, args.n_shards, key_col=args.key_col, seed=args.seed)
        .select("shard", "n_rows")
        .collect()
    )
    sizes = [r["n_rows"] for r in balance]
    print(
        json.dumps(
            {
                "output": args.output,
                "n_shards": args.n_shards,
                "rows": sum(sizes),
                "min_shard_rows": min(sizes) if sizes else 0,
                "max_shard_rows": max(sizes) if sizes else 0,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
