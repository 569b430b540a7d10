"""spark-submit entry: deterministic stratified sample of a corpus —
training-data mixture control (no reference analogue; BASELINE.json
north-star training-pipeline role).

Cluster usage::

    spark-submit --py-files engine.zip jobs/sample_corpus.py \
        --input /path/to/corpus.parquet --output /path/to/sampled \
        --rates src_a=0.5,src_b=0.1 [--default-rate 0.0] \
        [--strata-col source] [--key-col doc_id]

The sample is a pure function of the key column (md5-hash Bernoulli per
stratum): rerunning — at any cluster size or partitioning — reproduces
the identical row set, and lowering a rate yields a subset of the
previous sample (monotone mixture down-sampling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not _:
            raise SystemExit(f"bad --rates entry {part!r} (want stratum=rate)")
        r = float(v)
        if not 0.0 <= r <= 1.0:
            raise SystemExit(f"rate for {k!r} must be in [0, 1], got {r}")
        out[k.strip()] = r
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus path (parquet)")
    ap.add_argument("--output", required=True, help="sampled output dir")
    ap.add_argument("--rates", required=True,
                    help="comma-separated stratum=rate pairs")
    ap.add_argument("--default-rate", type=float, default=0.0)
    ap.add_argument("--strata-col", default="source")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from data_drift_monitoring_spark.operators.sampling import (
        stratified_sample,
    )
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="sample-corpus", master=args.master)
    df = spark.read.parquet(args.input)
    kept = stratified_sample(
        df,
        parse_rates(args.rates),
        strata_col=args.strata_col,
        key_col=args.key_col,
        default_rate=args.default_rate,
    )
    kept.write.mode("overwrite").parquet(args.output)
    counts = {
        r[args.strata_col]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy(args.strata_col)
        .agg({"*": "count"})
        .withColumnRenamed("count(1)", "n")
        .collect()
    }
    print(json.dumps({"output": args.output, "sampled_by_stratum": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
