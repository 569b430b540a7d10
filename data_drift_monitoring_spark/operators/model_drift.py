"""Model-performance drift: control-chart change detection (CUSUM,
Page–Hinkley) over metric time series.

The reference *promises* this but ships nothing: ``README.md:64-70``
("compute metrics per time window; compare to baseline metrics with
control charts and statistical tests (CUSUM, Page-Hinkley); trigger
'model drift' recommendations") — the referenced
``backend/app/models/model_performance.py`` does not exist in the tree.
Semantics implemented from the published algorithms:

- **Two-sided CUSUM** (Page 1954): S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ-μ₀)/σ₀ - k),
  S⁻ₜ = max(0, S⁻ₜ₋₁ - (xₜ-μ₀)/σ₀ - k); alarm when either exceeds h.
  Defaults k=0.5, h=5 (the standard "detect 1σ shifts" tuning).
- **Page–Hinkley** (Page 1954; Gama et al. 2014 formulation): mₜ = Σ(xᵢ -
  x̄ᵢ - δ), alarm when mₜ - min(m₁..mₜ) > λ (downward-shift variant uses
  max(m)-mₜ). Defaults δ=0.005, λ=50 as in the drift-detection literature.

Distributed shape: a metric series is tiny (one value per time window),
so each (metric) group is processed whole in ONE Arrow batch via
``applyInPandas`` — the sequential recurrences run in numpy per group,
groups run in parallel. The STREAMING variant keeps (S⁺, S⁻, m, min_m,
count) as state in ``applyInPandasWithState`` so alarms fire per
micro-batch without reprocessing history — the custom stateful operator
Structured Streaming is built for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "metric string, n long, mean double, baseline_mean double, "
    "cusum_pos double, cusum_neg double, cusum_alarm boolean, "
    "cusum_first_alarm_idx long, ph_stat double, ph_alarm boolean, "
    "ph_first_alarm_idx long, drift_detected boolean, recommendation string"
)

_STATE_SCHEMA = (
    "s_pos double, s_neg double, m double, m_min double, n long, "
    "mu double, sigma double"
)


def _cusum_path(x: np.ndarray, mu: float, sigma: float, k: float):
    """Vectorless two-sided CUSUM recurrence (series are O(windows))."""
    sp = sn = 0.0
    sp_path, sn_path = np.empty(len(x)), np.empty(len(x))
    z = (x - mu) / sigma if sigma > 0 else np.zeros(len(x))
    for i, zi in enumerate(z):
        sp = max(0.0, sp + zi - k)
        sn = max(0.0, sn - zi - k)
        sp_path[i], sn_path[i] = sp, sn
    return sp_path, sn_path


def _ph_path(x: np.ndarray, delta: float):
    """Page–Hinkley cumulative statistic (downward-shift detection: a
    metric DROP is the drift of interest for accuracy-like metrics)."""
    means = np.cumsum(x) / np.arange(1, len(x) + 1)
    # downward: accumulate (mean_so_far - x_t - delta); rises when x drops
    m = np.cumsum(means - x - delta)
    return m - np.minimum.accumulate(np.minimum(m, 0.0))


def metric_drift(
    metrics: DataFrame,
    baseline: dict[str, tuple[float, float]] | None = None,
    metric_col: str = "metric",
    value_col: str = "value",
    ts_col: str = "ts",
    k: float = 0.5,
    h: float = 5.0,
    delta: float = 0.005,
    lam: float = 50.0,
    warmup: int = 20,
) -> DataFrame:
    """Batch change detection per metric series.

    ``metrics``: (ts, metric, value) — one row per evaluation window.
    ``baseline``: optional {metric: (mu, sigma)}; without it the first
    ``warmup`` points estimate the in-control distribution (the
    reference's 'baseline test set' is the supplied dict in production).
    Short warmups bias the estimated mean and inflate the CUSUM — 20+
    calibration windows keep the standardization honest.

    Output (one row per metric): CUSUM/PH statistics, alarm flags, first
    alarm index, and the reference's promised recommendation
    ("retrain_model" on drift).
    """
    baseline = baseline or {}

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        metric = key[0]
        s = pdf.sort_values(ts_col)[value_col].to_numpy(dtype=np.float64)
        n = len(s)
        if metric in baseline:
            mu, sigma = baseline[metric]
        else:
            head = s[: min(warmup, n)]
            mu, sigma = float(head.mean()), float(head.std(ddof=1) or 0.0)
        sp, sn = _cusum_path(s, mu, sigma if sigma > 0 else 1.0, k)
        cusum_alarms = np.nonzero((sp > h) | (sn > h))[0]
        ph = _ph_path(s, delta)
        ph_alarms = np.nonzero(ph > lam)[0]
        cusum_alarm = len(cusum_alarms) > 0
        ph_alarm = len(ph_alarms) > 0
        drift = bool(cusum_alarm or ph_alarm)
        return pd.DataFrame(
            [
                {
                    "metric": metric,
                    "n": n,
                    "mean": float(s.mean()),
                    "baseline_mean": mu,
                    "cusum_pos": float(sp[-1]),
                    "cusum_neg": float(sn[-1]),
                    "cusum_alarm": bool(cusum_alarm),
                    "cusum_first_alarm_idx": (
                        int(cusum_alarms[0]) if cusum_alarm else -1
                    ),
                    "ph_stat": float(ph[-1]),
                    "ph_alarm": bool(ph_alarm),
                    "ph_first_alarm_idx": (
                        int(ph_alarms[0]) if ph_alarm else -1
                    ),
                    "drift_detected": drift,
                    "recommendation": (
                        "retrain_model" if drift else "no_action"
                    ),
                }
            ]
        )

    return metrics.groupBy(metric_col).applyInPandas(fn, _OUT_SCHEMA)


def streaming_metric_drift(
    stream: DataFrame,
    baseline: dict[str, tuple[float, float]],
    metric_col: str = "metric",
    value_col: str = "value",
    ts_col: str = "ts",
    k: float = 0.5,
    h: float = 5.0,
    delta: float = 0.005,
    lam: float = 50.0,
    timeout_ms: int = 0,
) -> DataFrame:
    """Stateful streaming variant: per-metric (S⁺, S⁻, m, min_m, count)
    carried across micro-batches in ``applyInPandasWithState`` — alarms
    fire incrementally, history is never reprocessed. ``baseline`` is
    required (streaming has no warmup lookback).

    Emits one row per (metric, micro-batch-with-data).
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def fn(key, pdfs, state: GroupState):
        metric = key[0]
        mu, sigma = baseline.get(metric, (0.0, 1.0))
        sigma = sigma if sigma > 0 else 1.0
        if state.exists:
            sp, sn, m, m_min, n, _, _ = state.get
        else:
            sp = sn = m = m_min = 0.0
            n = 0
        rows = []
        for pdf in pdfs:
            s = pdf.sort_values(ts_col)[value_col].to_numpy(np.float64)
            for x in s:
                n += 1
                z = (x - mu) / sigma
                sp = max(0.0, sp + z - k)
                sn = max(0.0, sn - z - k)
                # streaming PH uses the BASELINE mean (fixed reference)
                m += mu - x - delta
                m_min = min(m_min, m)
            rows.append(
                {
                    "metric": metric,
                    "n": n,
                    "mean": float(s.mean()) if len(s) else None,
                    "baseline_mean": mu,
                    "cusum_pos": sp,
                    "cusum_neg": sn,
                    "cusum_alarm": bool(sp > h or sn > h),
                    "cusum_first_alarm_idx": -1,
                    "ph_stat": m - m_min,
                    "ph_alarm": bool(m - m_min > lam),
                    "ph_first_alarm_idx": -1,
                    "drift_detected": bool(
                        sp > h or sn > h or (m - m_min) > lam
                    ),
                    "recommendation": (
                        "retrain_model"
                        if (sp > h or sn > h or (m - m_min) > lam)
                        else "no_action"
                    ),
                }
            )
        state.update((sp, sn, m, m_min, n, mu, sigma))
        yield pd.DataFrame(rows)

    return stream.groupBy(metric_col).applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
