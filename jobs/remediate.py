"""spark-submit entry: quality check + remediation plan for a dataset
(the reference's ``/remediation`` route intent —
``backend/app/api/routes/remediation.py`` is a 0-byte stub there).

Runs ``check_quality`` then maps the report through the remediation
rules engine (``remediation_rules.json`` semantics via ``--rules``).

Cluster usage::

    spark-submit --py-files engine.zip jobs/remediate.py \
        --input /path/to/data.parquet --warehouse /path/to/warehouse \
        [--rules remediation_rules.json] [--key-columns id] [--out plan.json]
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
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rules", default=None,
                    help="remediation_rules.json path (default: built-in)")
    ap.add_argument("--key-columns", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from data_drift_monitoring_spark.functions.remediation import load_rules
    from data_drift_monitoring_spark.service import ValidationService
    from data_drift_monitoring_spark.session import get_spark

    spark = get_spark(app_name="remediate", master=args.master)
    svc = ValidationService(spark, args.warehouse)
    report = svc.check_quality(
        args.input,
        key_columns=args.key_columns.split(",") if args.key_columns else None,
    )
    actions = svc.remediate(
        report, rules=load_rules(args.rules) if args.rules else None
    )
    out = {
        "report_id": report["report_id"],
        "quality_score": report["quality_score"]["overall_score"],
        "grade": report["quality_score"]["grade"],
        "n_actions": len(actions),
        "actions": actions,
    }
    text = json.dumps(out, indent=2, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0 if not actions else 2


if __name__ == "__main__":
    raise SystemExit(main())
