"""Isolation-forest multivariate anomaly detection, scipy/sklearn-free.

The reference's only ML surface: optional sklearn ``IsolationForest``
(``backend/app/core/quality/outliers.py:237-277``; contamination=0.1,
n_estimators=100, random_state=42, guarded import at ``:92-93``). sklearn
is not in this container, so the algorithm (Liu, Ting & Zhou 2008) is
implemented directly in numpy:

- **fit** happens on the DRIVER over a bounded sample (the standard iForest
  subsample is ψ=256 rows per tree — the model is tiny by construction, so
  a driver fit is the scale-correct design, not a concession);
- **score** is distributed: the fitted trees are broadcast inside an
  Arrow-vectorized pandas UDF that walks all trees for a batch of rows in
  vectorized numpy (one (rows × trees) traversal loop over tree depth, no
  per-row Python);
- anomaly threshold = the (1 - contamination) quantile of sample scores,
  mirroring sklearn's contamination semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_SEED = 42  # outliers.py:257


def _c(n: float) -> float:
    """Average unsuccessful BST search depth c(n) — the iForest norm."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (n - 1) / n


def _fit_tree(x: np.ndarray, rng, height_limit: int) -> list:
    """One isolation tree as a flat node list:
    (feature, threshold, left, right) for splits, (-1, size, -1, -1) for
    leaves. Iterative build, arrays only."""
    nodes: list[tuple] = []
    stack = [(np.arange(len(x)), 0, -1, False)]  # idx, depth, parent, is_right
    while stack:
        idx, depth, parent, is_right = stack.pop()
        me = len(nodes)
        if parent >= 0:
            f, t, l, r = nodes[parent]
            nodes[parent] = (f, t, l, me) if is_right else (f, t, me, r)
        sub = x[idx]
        if depth >= height_limit or len(idx) <= 1 or (sub.max(0) == sub.min(0)).all():
            nodes.append((-1, float(len(idx)), -1, -1))
            continue
        usable = np.nonzero(sub.max(0) > sub.min(0))[0]
        f = int(rng.choice(usable))
        lo, hi = sub[:, f].min(), sub[:, f].max()
        t = float(rng.uniform(lo, hi))
        mask = sub[:, f] < t
        nodes.append((f, t, -2, -2))
        stack.append((idx[~mask], depth + 1, me, True))
        stack.append((idx[mask], depth + 1, me, False))
    return nodes


def _path_lengths(x: np.ndarray, nodes: list) -> np.ndarray:
    """Vectorized path length of every row through one tree: iterate depth
    levels, advancing all rows' node pointers at once."""
    feat = np.array([n[0] for n in nodes])
    thr = np.array([n[1] for n in nodes])
    left = np.array([n[2] for n in nodes])
    right = np.array([n[3] for n in nodes])
    pos = np.zeros(len(x), dtype=np.int64)
    depth = np.zeros(len(x), dtype=np.float64)
    active = np.ones(len(x), dtype=bool)
    while active.any():
        f = feat[pos[active]]
        leaf = f < 0
        if leaf.any():
            a = np.nonzero(active)[0][leaf]
            # leaf adjustment: + c(leaf_size)
            depth[a] += np.array([_c(thr[pos[i]]) for i in a])
            active[a] = False
        a = np.nonzero(active)[0]
        if not len(a):
            break
        p = pos[a]
        go_left = x[a, feat[p]] < thr[p]
        pos[a] = np.where(go_left, left[p], right[p])
        depth[a] += 1.0
    return depth


class IsolationForestModel:
    """Fitted forest + contamination threshold (picklable → broadcast)."""

    def __init__(self, trees, psi, threshold, columns):
        self.trees = trees
        self.psi = psi
        self.threshold = threshold
        self.columns = columns

    def scores(self, x: np.ndarray) -> np.ndarray:
        """Anomaly score s(x) = 2^(-E[h(x)]/c(ψ)) ∈ (0,1]; higher = more
        anomalous."""
        depths = np.zeros(len(x), dtype=np.float64)
        for t in self.trees:
            depths += _path_lengths(x, t)
        avg = depths / len(self.trees)
        return np.power(2.0, -avg / _c(self.psi))


def fit_isolation_forest(
    df: DataFrame,
    columns: list[str],
    n_trees: int = 100,           # outliers.py: n_estimators=100
    psi: int = 256,
    contamination: float = 0.1,   # outliers.py:249
    seed: int = _SEED,
    max_sample: int = 100_000,
) -> IsolationForestModel:
    """Driver-side fit over a bounded random sample of ``columns``.

    The sample is seeded-random, not ``limit()`` — a plain limit takes the
    first partitions' rows, which biases the fit (and the contamination
    threshold) on ordered or partition-skewed data. rand(seed) + TakeOrdered
    is one pass over the projected columns, O(n log k) per partition, and
    moves only ``max_sample`` rows to the driver."""
    pdf = (
        df.select(*columns)
        .dropna()
        .orderBy(F.rand(seed))
        .limit(max_sample)
        .toPandas()
    )
    x = pdf.to_numpy(dtype=np.float64)
    # canonicalize row order before fitting: toPandas row order follows
    # partition layout, which can differ across core counts / split sizes.
    # With the rows lexsorted the fitted model depends only on the row
    # MULTISET — fully reproducible across cluster shapes whenever
    # max_sample >= n (when the limit binds, the sampled set itself is
    # still rand(seed)-per-partition, i.e. layout-dependent).
    x = x[np.lexsort(x.T[::-1])]
    if len(x) == 0:
        raise ValueError("no complete rows to fit on")
    rng = np.random.default_rng(seed)
    height = int(np.ceil(np.log2(max(min(psi, len(x)), 2))))
    trees = []
    for _ in range(n_trees):
        idx = rng.choice(len(x), size=min(psi, len(x)), replace=False)
        trees.append(_fit_tree(x[idx], rng, height))
    model = IsolationForestModel(trees, min(psi, len(x)), 0.0, list(columns))
    s = model.scores(x)
    model.threshold = float(np.quantile(s, 1.0 - contamination))
    return model


def score_anomalies(df: DataFrame, model: IsolationForestModel) -> DataFrame:
    """Add ``anomaly_score`` and ``is_anomaly`` columns — distributed
    scoring via a scalar pandas UDF over the model's feature struct."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(batch: pd.DataFrame) -> pd.Series:
        # a struct column arrives as a pandas DataFrame (Arrow struct batch)
        rows = batch[model.columns].to_numpy(dtype=np.float64)
        out = np.full(len(rows), np.nan)
        ok = ~np.isnan(rows).any(axis=1)
        if ok.any():
            out[ok] = model.scores(rows[ok])
        return pd.Series(out)

    struct = F.struct(*[F.col(c) for c in model.columns])
    d = df.withColumn("anomaly_score", _score(struct))
    return d.withColumn(
        "is_anomaly", F.col("anomaly_score") > F.lit(model.threshold)
    )


def anomaly_stats(
    df: DataFrame,
    model: IsolationForestModel,
    partition_col: str = "part_id",
) -> DataFrame:
    """Per-partition anomaly fraction (the drift signal README.md:51
    describes: 'IsolationForest anomaly fraction')."""
    scored = score_anomalies(df, model)
    return scored.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_anomaly").cast("long")).alias("anomalies"),
        F.round(
            F.sum(F.col("is_anomaly").cast("long")) / F.count(F.lit(1)) * 100,
            2,
        ).alias("anomaly_pct"),
    )
