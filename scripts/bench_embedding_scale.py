"""Large-corpus embedding similarity evidence (companion to
bench_dedup_scale.py): run embedding_near_duplicates end-to-end on a
1M-vector corpus with PLANTED cosine ground truth
(generator.generate_embedding_corpus) and report recall/precision vs the
planted ≥0.95 truth, runtime, throughput, shuffle volume — plus IVF ANN
recall@10 vs exact brute force on the same corpus.

Operating point: threshold 0.95, planes=28, tables=64. The corpus is
CLUSTERED (200 mixture components, within-cluster cosine ~0.45 — like
real embedding spaces), so the junk-candidate load is set by
within-cluster pairs, not near-orthogonal ones: p_bit(0.45) =
1-acos(0.45)/pi ~ 0.649, so junk candidates per table scale with
0.649^planes. planes=24/tables=40 (the first operating point measured)
let ~45M junk within-cluster candidates through — a 3 GB candidate
exchange plus 45M JVM dot-product verifies dominated the runtime.
planes=28 cuts the junk rate ~5.7x per table; 64 tables restore recall:
at the 0.95 edge per-table hit p = (1-acos(0.95)/pi)^28 ~ 0.051 →
1-(1-0.051)^64 ~ 0.965, rising to ~1.0 by cosine 0.97. Expected junk
~ 2.5e9 within-cluster pairs * 0.649^28 * 64 ~ 0.9M (50x fewer), for
1.6x more banded rows — the cheap side of the LSH trade.

Usage: python scripts/bench_embedding_scale.py [--vecs 1000000] [--cpus 16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# keep BLAS single-threaded inside Spark python workers so the ladder
# measures SPARK parallelism, not hidden OpenBLAS threads at local[1]
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_dedup_scale import shuffle_totals  # noqa: E402

SEED = 42
DIM = 64
THRESHOLD = 0.95
PLANES = 28
TABLES = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    )
    ap.add_argument("--skip-ann", action="store_true")
    args = ap.parse_args()

    import duckdb

    from data_drift_monitoring_spark.generator import generate_embedding_corpus
    from data_drift_monitoring_spark.operators import dedup as D
    from data_drift_monitoring_spark.operators import similarity as S
    from data_drift_monitoring_spark.session import get_spark

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"emb_corpus_{args.vecs}_{SEED}",
    )
    if not os.path.exists(os.path.join(cache, "truth.parquet")):
        t0 = time.time()
        stats = generate_embedding_corpus(
            cache, n_vecs=args.vecs, dim=DIM, seed=SEED
        )
        print(f"# generated corpus in {time.time()-t0:.0f}s: {stats}", file=sys.stderr)

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(4 * args.cpus, 32),
        # UI on for the REST status API (stage shuffle totals); GC threads
        # pinned so local[1] doesn't borrow all 32 host cores for GC
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "true",
            # default 128MB bin-packing gives the 276MB vector corpus only
            # ~7 scan tasks — the codes-UDF stage (the FLOP-heaviest) then
            # starves cores above local[4]; 8MB → ~35 splits ≥ core count
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(args.cpus, 1)} -Xlog:disable"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs = spark.read.parquet(os.path.join(cache, "vecs"))
    n_vecs = vecs.count()  # also warms the page cache

    t0 = time.time()
    pairs = D.embedding_near_duplicates(
        vecs,
        "vec_id",
        "embedding",
        threshold=THRESHOLD,
        planes=PLANES,
        tables=TABLES,
        dim=DIM,
        max_bucket_size=4096,
    )
    found = {(r["a"], r["b"]) for r in pairs.select("a", "b").collect()}
    mining_sec = time.time() - t0

    con = duckdb.connect()
    truth_rows = con.execute(
        f"SELECT a, b, cosine, kind FROM '{cache}/truth.parquet'"
    ).fetchall()
    truth = {(a, b): (c, k) for a, b, c, k in truth_rows}
    must = {p for p, (c, _) in truth.items() if c >= THRESHOLD}
    decoys = {p for p, (_, k) in truth.items() if k == "decoy"}
    hit = found & must
    missed = must - found
    unplanted = found - set(truth)
    decoy_hits = found & decoys

    by_band: dict[str, str] = {}
    for lo, hi in ((0.95, 0.96), (0.96, 0.98), (0.98, 1.01)):
        band = {p for p, (c, _) in truth.items() if lo <= c < hi}
        if band:
            by_band[f"{lo:.2f}-{hi:.2f}"] = f"{len(band & found)}/{len(band)}"

    ann = {}
    if not args.skip_ann:
        t0 = time.time()
        cents = S.kmeans_centroids(
            vecs, n_cells=256, sample_fraction=min(1.0, 20000 / n_vecs)
        )
        index = S.ivf_index(vecs, cents).persist()
        index.count()
        build_sec = time.time() - t0
        queries = vecs.filter("vec_id % 9973 = 0").limit(100).selectExpr(
            "vec_id as query_id", "embedding"
        ).persist()
        nq = queries.count()
        t0 = time.time()
        approx = S.ivf_topk(index, queries, cents, k=10, nprobe=32)
        got = {
            (r["query_id"], r["vec_id"]) for r in approx.collect()
        }
        probe_sec = time.time() - t0
        exact = S.cosine_topk_bruteforce(vecs, queries, k=10)
        want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        ann = {
            "ann_cells": 256,
            "ann_nprobe": 32,
            "ann_queries": nq,
            "ann_build_sec": round(build_sec, 1),
            "ann_probe_sec": round(probe_sec, 1),
            "ann_recall_at_10": round(len(got & want) / max(len(want), 1), 4),
        }

    out = {
        "metric": "embedding_1m_recall",
        "n_vecs": n_vecs,
        "dim": DIM,
        "threshold": THRESHOLD,
        "planes": PLANES,
        "tables": TABLES,
        "cpus": args.cpus,
        "pairs_found": len(found),
        "n_truth": len(must),
        "n_hit": len(hit),
        "n_missed": len(missed),
        "recall": round(len(hit) / max(len(must), 1), 4),
        "unplanted_found": len(unplanted),
        "decoy_hits": len(decoy_hits),
        "recall_by_band": by_band,
        "pair_mining_sec": round(mining_sec, 1),
        "vecs_per_sec": round(n_vecs / mining_sec),
        **ann,
        **shuffle_totals(spark),
    }
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
