"""Metadata-level baseline comparison (versioning.py:271-364).

The reference compares a current dataset's *metadata* against a persisted
baseline's metadata — never raw rows — and that design is kept because it
is the scalable one: both sides are tiny dicts produced by one aggregation
pass (``sources.ingest.dataset_metadata``), so the comparison itself is
driver-side set algebra and arithmetic.

Differences reported (same fields as the reference):
- row-count change (+ pct; versioning.py:306-317)
- column-count change (:319-327)
- missing/extra column names (:329-341)
- per-column dtype changes (:343-361)
plus (engine extension) missing-value-rate deltas, the signal the
reference's report envelope carries but its comparator ignores.
"""

from __future__ import annotations

from datetime import datetime, timezone


def compare_metadata(
    current: dict,
    baseline: dict,
    baseline_version: str | None = None,
    now: datetime | None = None,
    missing_rate_tolerance_pct: float = 1.0,
) -> dict:
    """Compare two ``dataset_metadata`` dicts. Returns the reference-shaped
    comparison report: {has_baseline, baseline_version,
    comparison_timestamp, differences: [...]}."""
    comparison: dict = {
        "has_baseline": True,
        "baseline_version": baseline_version,
        "comparison_timestamp": (
            (now or datetime.now(timezone.utc)).isoformat()
        ),
        "differences": [],
    }
    diffs = comparison["differences"]

    cur_rows = current.get("num_rows", 0)
    base_rows = baseline.get("num_rows", 0)
    if cur_rows != base_rows:
        diffs.append(
            {
                "field": "rows",
                "baseline": base_rows,
                "current": cur_rows,
                "change": cur_rows - base_rows,
                "change_percentage": (
                    round((cur_rows - base_rows) / base_rows * 100, 2)
                    if base_rows > 0
                    else None
                ),
            }
        )

    cur_cols = current.get("num_columns", 0)
    base_cols = baseline.get("num_columns", 0)
    if cur_cols != base_cols:
        diffs.append(
            {
                "field": "columns",
                "baseline": base_cols,
                "current": cur_cols,
                "change": cur_cols - base_cols,
            }
        )

    cur_names = set(current.get("dtypes", {}))
    base_names = set(baseline.get("dtypes", {}))
    missing = sorted(base_names - cur_names)
    extra = sorted(cur_names - base_names)
    if missing or extra:
        diffs.append(
            {
                "field": "column_schema",
                "missing_columns": missing,
                "extra_columns": extra,
            }
        )

    dtype_changes = [
        {
            "column": c,
            "baseline_dtype": baseline["dtypes"][c],
            "current_dtype": current["dtypes"][c],
        }
        for c in sorted(cur_names & base_names)
        if current["dtypes"][c] != baseline["dtypes"][c]
    ]
    if dtype_changes:
        diffs.append({"field": "data_types", "changes": dtype_changes})

    # engine extension: missing-value-rate drift between snapshots
    mv_changes = []
    cur_mv, base_mv = current.get("missing_values", {}), baseline.get(
        "missing_values", {}
    )
    for c in sorted(cur_names & base_names):
        cur_pct = cur_mv.get(c, 0) / cur_rows * 100 if cur_rows else 0.0
        base_pct = base_mv.get(c, 0) / base_rows * 100 if base_rows else 0.0
        if abs(cur_pct - base_pct) > missing_rate_tolerance_pct:
            mv_changes.append(
                {
                    "column": c,
                    "baseline_pct": round(base_pct, 2),
                    "current_pct": round(cur_pct, 2),
                    "change_pct": round(cur_pct - base_pct, 2),
                }
            )
    if mv_changes:
        diffs.append({"field": "missing_value_rates", "changes": mv_changes})

    return comparison


def no_baseline() -> dict:
    """The reference's empty-baseline response (versioning.py:292-296)."""
    return {
        "has_baseline": False,
        "message": "No baseline available for comparison",
    }
