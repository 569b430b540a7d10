"""Micro-bench: batch-vectorized SimHash bit-vote vs the per-row loop it
replaced (BENCH.md 'SimHash stage' entry).

Isolates the UDF body (the Spark/Arrow plumbing is identical for both):
the round-1 per-row-numpy implementation vs the current
unpackbits + add.reduceat segment-sum in operators/dedup._simhash64.
Two regimes: many short docs (per-row Python overhead dominates) and
fewer long docs (memory-bandwidth-bound). Run:

    python scripts/bench_simhash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def perrow(words_hashes: pd.Series) -> pd.Series:
    """The round-1 implementation, kept verbatim as the comparison blank."""
    out = np.zeros(len(words_hashes), dtype=np.int64)
    for i, hs in enumerate(words_hashes):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        v = bits.sum(axis=0) * 2 - len(h)
        sig = np.uint64(0)
        for b in range(64):
            if v[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def main() -> None:
    # the current implementation, unwrapped from its pandas_udf decorator
    from data_drift_monitoring_spark.operators import dedup

    vectorized = dedup._simhash64.func

    rng = np.random.default_rng(0)
    regimes = {
        "200k short docs (5-15 words)": pd.Series(
            [
                rng.integers(0, 2**63, size=l, dtype=np.int64)
                for l in rng.integers(5, 16, size=200_000)
            ]
        ),
        "50k long docs (20-120 words)": pd.Series(
            [
                rng.integers(0, 2**63, size=l, dtype=np.int64)
                for l in rng.integers(20, 121, size=50_000)
            ]
        ),
    }
    for label, hashes in regimes.items():
        times = {}
        for fn, name in ((perrow, "per-row"), (vectorized, "vectorized")):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                res = fn(hashes)
                best = min(best, time.time() - t0)
            times[name] = best
        same = (perrow(hashes) == vectorized(hashes)).all()
        print(
            f"{label}: per-row {times['per-row']:.3f}s, "
            f"vectorized {times['vectorized']:.3f}s, "
            f"speedup {times['per-row']/times['vectorized']:.2f}x, "
            f"identical={bool(same)}"
        )


if __name__ == "__main__":
    main()
