"""Human-readable report rendering — the reference's
``backend/report_formatter.py`` (0-byte stub) as a deterministic
markdown formatter over the ``check_quality`` report dict. Pure driver
code: the report is already aggregated.
"""

from __future__ import annotations


def format_report(report: dict) -> str:
    """check_quality report dict → markdown summary (score, per-section
    counts, worst offenders, recommendations)."""
    qs = report["quality_score"]
    mv = report["missing_values"]
    dup = report["duplicates"]
    out = report["outliers"]
    info = report["dataset_info"]
    lines = [
        f"# Quality report {report['report_id']}",
        "",
        f"**Score: {qs['overall_score']} — {qs['grade']} "
        f"{qs['grade_emoji']}**",
        "",
        f"Dataset: {info['rows']:,} rows × {info['columns']} columns"
        + (f" ({report['filename']})" if report.get("filename") else ""),
        "",
        "| section | finding | severity |",
        "|---|---|---|",
        f"| missing values | {mv['total_missing']:,} cells "
        f"({mv['overall_missing_percentage']}%) across "
        f"{mv['columns_affected']} columns | "
        f"worst: {mv['summary']['worst_column'] or '-'} "
        f"({mv['summary']['worst_percentage']}%) |",
        f"| duplicates | {dup['total_duplicates']:,} rows "
        f"({dup['duplicate_percentage']}%) in {dup['duplicate_groups']:,} "
        f"groups | {dup['severity']} |",
        f"| outliers | {out['total_outliers']:,} values "
        f"({out['outlier_percentage']}%) over {out['columns_analyzed']} "
        f"numeric columns | {out['severity']} |",
        "",
    ]
    recs = report.get("recommendations", [])
    if recs:
        lines.append("## Recommendations")
        for r in recs:
            col = f" `{r['column']}`" if r.get("column") else ""
            lines.append(
                f"- **{r['priority']}** [{r['category']}]{col}: {r['action']}"
            )
    else:
        lines.append("No recommendations — dataset is clean.")
    s = report["summary"]
    lines += [
        "",
        f"Issues: {s['total_issues']} "
        f"(high {s['high_priority_issues']}, "
        f"medium {s['medium_priority_issues']}, "
        f"low {s['low_priority_issues']})",
    ]
    return "\n".join(lines)


def format_drift_report(report: dict) -> str:
    """detect_drift report dict → markdown summary."""
    lines = [
        f"# Drift report vs baseline {report['baseline_version']}",
        "",
        f"{report['summary']['n_drifted']} of "
        f"{report['summary']['n_columns']} columns drifted.",
        "",
        "| column | PSI | class | KS | JS | recommendation |",
        "|---|---|---|---|---|---|",
    ]
    for col, c in sorted(
        report["columns"].items(), key=lambda kv: -kv[1]["psi"]
    ):
        lines.append(
            f"| {col} | {c['psi']:.4f} | {c['psi_drift']} | "
            f"{c['ks_stat']:.4f} | {c['js_divergence']:.4f} | "
            f"{c['recommendation']} |"
        )
    return "\n".join(lines)
