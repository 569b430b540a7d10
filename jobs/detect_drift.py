"""spark-submit entry: standalone drift check of a dataset vs the stored
baseline (the reference's ``/detect_drift`` route intent —
``backend/app/api/routes/drift_check.py`` is a 0-byte stub there).

Cluster usage::

    spark-submit --py-files engine.zip jobs/detect_drift.py \
        --input /path/to/current.parquet --warehouse /path/to/warehouse \
        [--baseline-version vN_...] [--columns a,b,c] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="current dataset path")
    ap.add_argument("--warehouse", required=True, help="warehouse root dir")
    ap.add_argument("--baseline-version", default=None)
    ap.add_argument("--columns", default=None, help="comma-separated subset")
    ap.add_argument("--bins", type=int, default=20)
    ap.add_argument("--out", default=None, help="write the report JSON here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from data_drift_monitoring_spark.service import ValidationService
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="detect-drift", master=args.master)
    svc = ValidationService(spark, args.warehouse)
    report = svc.detect_drift(
        args.input,
        baseline_version=args.baseline_version,
        columns=args.columns.split(",") if args.columns else None,
        bins=args.bins,
    )
    text = json.dumps(report, indent=2, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0 if not report["summary"]["overall_drift"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
