"""Engine thresholds and constants.

Values mirror the reference's published semantics so verdict rows match:

- missing-value warn/error thresholds 10/50:
  reference ``config/settings.py:60-62`` (``WARN_MISSING_PERCENTAGE = 50``)
  and ``backend/app/core/quality/missing_values.py:21`` (warn 10, error 50).
- duplicate severity breaks 0 / 1 / 5 and recommendation breaks 0/1/5/20:
  ``backend/app/core/quality/duplicates.py:146-184``.
- outlier IQR multiplier 1.5, z-threshold 3.0, severity breaks 0/1/5,
  recommendation breaks 0/1/5/10: ``backend/app/core/quality/outliers.py:21-37,279-322``.
- quality-score weights 30/25/25/20 and grade bands 90/80/70/60/50:
  ``backend/app/utils/quality_scorer.py:19-44,145-166``.
- PSI thresholds 0.1 / 0.25 (none / moderate / large drift): ``README.md:49``.
- dataset minimums MIN_ROWS=10, MIN_COLUMNS=1: ``config/settings.py:58-59``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Thresholds:
    # missing values (percent)
    missing_warn_pct: float = 10.0
    missing_error_pct: float = 50.0
    # duplicates (percent) — severity: 0 none, <1 low, <5 medium, else high
    dup_low_pct: float = 1.0
    dup_medium_pct: float = 5.0
    dup_major_pct: float = 20.0
    # outliers
    iqr_multiplier: float = 1.5
    z_score_threshold: float = 3.0
    outlier_low_pct: float = 1.0
    outlier_medium_pct: float = 5.0
    outlier_clip_pct: float = 10.0
    skew_transform_threshold: float = 1.0
    # drift
    psi_moderate: float = 0.10
    psi_large: float = 0.25
    ks_alpha: float = 0.05
    js_moderate: float = 0.05
    js_large: float = 0.15
    chi2_alpha: float = 0.05
    # validation gates
    min_rows: int = 10
    min_columns: int = 1
    # scoring weights (normalized to 100 if they don't sum to 100,
    # mirroring quality_scorer.py:35-42)
    missing_weight: float = 30.0
    duplicate_weight: float = 25.0
    outlier_weight: float = 25.0
    schema_weight: float = 20.0


@dataclass(frozen=True)
class EngineConfig:
    """Run-scoped knobs for the distributed engine (no reference analogue —
    the reference is single-threaded pandas)."""

    partition_col: str = "part_id"
    shuffle_partitions: int = 32
    # salt fan-out for skewed groupBy keys (two-level aggregation)
    skew_salt_buckets: int = 16
    # histogram binning for drift on numeric columns
    drift_bins: int = 32
    # top-k caps, mirroring the reference's sampling caps
    topk_values: int = 5            # file_handler.py:307
    sample_dup_groups: int = 5      # duplicates.py:92-123
    sample_rows_per_group: int = 3  # duplicates.py:119
    sample_outliers: int = 5        # outliers.py:147-149
    thresholds: Thresholds = field(default_factory=Thresholds)


DEFAULT_CONFIG = EngineConfig()
ALLOWED_SOURCES = ("web", "books", "code", "wiki", "news")
TOKEN_VOCAB_SIZE = 50257
