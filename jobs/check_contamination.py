"""spark-submit entry: train/eval n-gram contamination check — flag eval
examples whose word n-grams leak from the training corpus (no reference
analogue; BASELINE.json north-star training-pipeline role).

Cluster usage::

    spark-submit --py-files engine.zip jobs/check_contamination.py \
        --train /path/to/corpus.parquet --eval /path/to/evalset.parquet \
        --output /path/to/report [--pairs /path/to/pair_attribution] \
        [--ngram 8] [--min-overlap 0.5] [--text-col text] [--key-col doc_id]

The eval gram set is broadcast, so the training corpus is matched
map-side and never shuffled; at any corpus size the exchanged bytes are
bounded by |eval grams| per task. ``--pairs`` additionally writes
per-(train doc, eval doc) attribution rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", required=True, help="training corpus (parquet)")
    ap.add_argument("--eval", dest="eval_path", required=True,
                    help="eval set (parquet)")
    ap.add_argument("--output", required=True, help="per-eval-doc report dir")
    ap.add_argument("--pairs", default=None,
                    help="optional pair-attribution output dir")
    ap.add_argument("--ngram", type=int, default=8)
    ap.add_argument("--min-overlap", type=float, default=0.5)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--no-broadcast", action="store_true",
                    help="shuffle-join grams instead (eval set too big "
                         "to broadcast)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from data_drift_monitoring_spark.operators.contamination import (
        contamination_pairs,
        contamination_report,
    )
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="check-contamination", master=args.master)
    train = spark.read.parquet(args.train)
    eval_df = spark.read.parquet(args.eval_path)
    kw = dict(
        text_col=args.text_col,
        key_col=args.key_col,
        n=args.ngram,
        min_overlap=args.min_overlap,
        broadcast_eval=not args.no_broadcast,
    )
    rep = contamination_report(train, eval_df, **kw)
    rep.write.mode("overwrite").parquet(args.output)
    if args.pairs:
        contamination_pairs(train, eval_df, **kw).write.mode(
            "overwrite"
        ).parquet(args.pairs)

    back = spark.read.parquet(args.output)
    n_eval = back.count()
    n_contam = back.filter(back["contaminated"] == 1).count()
    print(json.dumps({
        "output": args.output,
        "n_eval_docs": n_eval,
        "n_contaminated": n_contam,
        "contaminated_pct": round(100.0 * n_contam / max(n_eval, 1), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
