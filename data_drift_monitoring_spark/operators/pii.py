"""PII pattern scanning and redaction for training corpora.

Pattern-based detection of the high-frequency PII classes a
pre-training pipeline scrubs before the corpus reaches a trainer
(emails, phone numbers, IPv4 addresses, US-SSN-shaped ids) — the
regex tier of a PII stack (the model-based NER tier is out of scope for
this engine, as is the decode stage of multimodal.py). Counting and
redaction are pure per-row ``regexp_count`` / ``regexp_replace``
expressions: one corpus scan, zero shuffle, fully inside
WholeStageCodegen — at 10^12 docs this pipeline is scan-bound, which is
the best case.

Patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB): no backreferences, no lookaround — so the DuckDB gate
oracle runs the IDENTICAL pattern and any divergence in dialect
semantics breaks the value hash rather than hiding.

The reference has no PII surface; this is a training-pipeline
extension (SURVEY.md training-data ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# name -> (pattern, replacement tag). Order matters for redaction:
# longer/more-specific first so e.g. an SSN inside a phone-like string
# is consumed once.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def with_pii_counts(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-row match counts per PII class (``pii_<name>``), total
    (``pii_total``) and ``has_pii``. Note phone/ssn are structurally
    overlapping classes counted independently — ``pii_total`` is a sum
    of class counts, not of distinct spans."""
    pats = patterns or PII_PATTERNS
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    total = F.lit(0)
    for name, pat in pats.items():
        cnt = F.regexp_count(t, F.lit(pat)).cast("int")
        out = out.withColumn(f"pii_{name}", cnt)
        total = total + F.col(f"pii_{name}")
    return out.withColumn("pii_total", total.cast("int")).withColumn(
        "has_pii", F.col("pii_total") > 0
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every match with ``[<NAME>]``. Patterns apply in dict
    order over the progressively redacted string."""
    pats = patterns or PII_PATTERNS
    red = F.coalesce(F.col(text_col), F.lit(""))
    for name, pat in pats.items():
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return df.withColumn(out_col or f"{text_col}_redacted", red)


def pii_summary(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-group corpus exposure: docs scanned, docs with any PII, and
    total hits per class. Map-side-combinable; the exchange carries
    |groups| rows."""
    pats = patterns or PII_PATTERNS
    counted = with_pii_counts(df, text_col, pats)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_pii").cast("long")).alias("n_docs_with_pii"),
    ]
    for name in pats:
        aggs.append(
            F.sum(F.col(f"pii_{name}").cast("long")).alias(
                f"total_{name}"
            )
        )
    return counted.groupBy(group_col).agg(*aggs)
