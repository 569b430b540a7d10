"""spark-submit entry: fit the logistic quality classifier on a labeled
seed set and score/filter a corpus with it (no reference analogue;
BASELINE.json north-star training-pipeline role).

Cluster usage::

    spark-submit --py-files engine.zip jobs/score_quality.py \
        --seed-set /path/to/labeled.parquet --label-col label \
        --input /path/to/corpus.parquet --output /path/to/scored \
        [--threshold 0.5] [--filter] [--max-sample 200000] \
        [--weights /path/weights.json] [--master ...]

The fit collects one bounded canonically-sorted feature sample to the
driver (layout-invariant — identical weights at any cluster size);
scoring is a single literal-weight codegen projection over the corpus,
zero shuffle. ``--filter`` writes only kept rows; otherwise every row
is written with ``quality_prob`` and ``keep`` columns. The fitted
weights (13 floats) are emitted in the JSON report and optionally to
``--weights`` for reuse/audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed-set", required=True,
                    help="labeled parquet for fitting")
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--input", required=True, help="corpus to score")
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--filter", action="store_true",
                    help="write only rows with keep=true")
    ap.add_argument("--max-sample", type=int, default=200_000)
    ap.add_argument("--weights", default=None,
                    help="optional path for the fitted-weights JSON")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from data_drift_monitoring_spark.operators.quality_classifier import (
        fit_quality_classifier,
        score_quality,
    )
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="score-quality", master=args.master)
    seed = spark.read.parquet(args.seed_set)
    model = fit_quality_classifier(
        seed, args.label_col, text_col=args.text_col,
        max_sample=args.max_sample,
    )
    corpus = spark.read.parquet(args.input)
    scored = score_quality(
        corpus, model, text_col=args.text_col, threshold=args.threshold
    )
    out = scored.filter("keep") if args.filter else scored
    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    report = {
        "output": args.output,
        "rows_in": corpus.count(),
        "rows_out": written.count(),
        "kept": written.filter("keep").count(),
        "model": {
            "features": list(model.features),
            "weights": model.weights,
            "bias": model.bias,
            "mu": model.mu,
            "sigma": model.sigma,
        },
    }
    if args.weights:
        with open(args.weights, "w") as fh:
            json.dump(report["model"], fh)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
