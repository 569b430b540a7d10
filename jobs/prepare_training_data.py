"""spark-submit entry: raw documents -> training-ready shards, end to
end — the full layout path a pre-training data pipeline runs after
curation (no reference analogue; BASELINE.json north-star
training-pipeline role).

Cluster usage::

    spark-submit --py-files engine.zip jobs/prepare_training_data.py \
        --input /path/to/docs.parquet --output /path/to/prepared \
        --context-len 2048 --n-shards 64 \
        [--no-curate] [--no-near-dedup] [--no-span-dedup] \
        [--span-k 16] [--minhash-threshold 0.7] [--vocab 2147483647] \
        [--prefix-buckets 32] [--seed 0] [--report path.json]

Stages (each skippable; per-stage row/token counts in the JSON report):

  1. curate      — Gopher repetition keep-filter + PII redaction
                   (delegates to the filter_corpus operator set)
  1b. quality    — CCNet-style logistic classifier filter: score with a
                   weights artifact (--quality-weights, emitted by
                   jobs/score_quality.py) or fit in-pipeline from a
                   labeled seed set (--quality-seed-set); scoring is a
                   zero-shuffle literal-weight projection
  2. exact dedup — keep-first on the normalized-content digest
  3. near dedup  — MinHash+LSH verified pairs -> cluster keep-one
  4. tokenize    — deterministic word-hash tokens (swap for your real
                   tokenizer's output table if you have one)
  5. span dedup  — remove non-canonical duplicated k-gram spans
                   (token-level, Lee et al. 2022 semantics)
  6. pack        — layout docs into fixed context windows (distributed
                   prefix sum when --prefix-buckets is set)
  7. shard       — deterministic hash shards, one ordered file per
                   shard under shard=<i>/

The output parquet holds (doc_id, source, tokens, n_tok, start_tok,
first_window, last_window, n_windows, shard, sort_key) — everything a
loader needs to stream fixed-length training windows in a reproducible
order.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--context-len", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--no-curate", action="store_true")
    ap.add_argument(
        "--quality-weights",
        default=None,
        help="fitted-weights JSON (jobs/score_quality.py artifact); "
        "enables the classifier filter stage",
    )
    ap.add_argument(
        "--quality-seed-set",
        default=None,
        help="labeled parquet to fit the classifier in-pipeline "
        "(ignored when --quality-weights is given)",
    )
    ap.add_argument("--quality-label-col", default="label")
    ap.add_argument("--quality-threshold", type=float, default=0.5)
    ap.add_argument("--no-near-dedup", action="store_true")
    ap.add_argument("--no-span-dedup", action="store_true")
    ap.add_argument("--span-k", type=int, default=16)
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--vocab", type=int, default=(1 << 31) - 1)
    ap.add_argument("--prefix-buckets", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--report", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from data_drift_monitoring_spark.operators import dedup as D
    from data_drift_monitoring_spark.plans.prepare import (
        PrepareConfig,
        prepare_training_stages,
    )
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="prepare-training-data", master=args.master)
    tc = args.text_col
    df = spark.read.parquet(args.input)
    report: dict = {"input_rows": df.count()}

    model = None

    if args.quality_weights or args.quality_seed_set:
        from data_drift_monitoring_spark.operators.quality_classifier import (
            fit_quality_classifier,
            model_from_dict,
        )

        if args.quality_weights:
            with open(args.quality_weights) as fh:
                model = model_from_dict(json.load(fh))
        else:
            model = fit_quality_classifier(
                spark.read.parquet(args.quality_seed_set),
                args.quality_label_col,
                text_col=tc,
            )

    cfg = PrepareConfig(
        text_col=tc,
        key_col=args.key_col,
        context_len=args.context_len,
        n_shards=args.n_shards,
        curate=not args.no_curate,
        near_dedup=not args.no_near_dedup,
        span_dedup=not args.no_span_dedup,
        span_k=args.span_k,
        minhash_threshold=args.minhash_threshold,
        vocab=args.vocab,
        seed=args.seed,
        prefix_buckets=args.prefix_buckets,
    )
    stages = prepare_training_stages(
        df, cfg, quality_model=model, quality_threshold=args.quality_threshold
    )

    if "curate" in stages:
        report["after_curate"] = stages["curate"].count()
    if "quality" in stages:
        report["after_quality_filter"] = stages["quality"].count()
        report["quality_model"] = {
            "weights": model.weights,
            "bias": model.bias,
        }
    report["after_exact_dedup"] = stages["exact_dedup"].count()
    if "near_dedup" in stages:
        report["after_near_dedup"] = stages["near_dedup"].count()
    if "span_dedup" in stages:
        report["span_tokens_removed"] = stages["span_dedup"].agg(
            F.sum("covered_tokens").cast("bigint")
        ).collect()[0][0]

    packed = stages["pack"]
    report["total_tokens"] = packed.agg(
        F.sum("n_tok").cast("bigint")
    ).collect()[0][0]

    out = stages["shard"].drop(tc)
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    final = spark.read.parquet(args.output)
    report["output_rows"] = final.count()
    report["n_shards"] = final.select("shard").distinct().count()
    report["output"] = args.output
    line = json.dumps(report)
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
