"""Large-corpus duplicated-span dedup evidence: run
span_dedup.span_dedup_stats end-to-end on a 1M+ document token corpus
with PLANTED shared boilerplate spans and report detection vs the
planted closed-form truth, runtime, token throughput, and shuffle
volume — optionally at two parallelism levels for scaling efficiency.

Corpus (pure deterministic Spark expressions, no external data):
  * every doc: 100-249 background tokens, tok = xxhash64(doc_id, i) %
    2^31 — background 8-grams are collision-free in practice, so the
    ONLY duplicated grams are the planted ones;
  * every 50th doc carries one of 32 fixed 50-token spans (span chosen
    by doc_id) overwriting positions 20..69.

Closed-form truth: per span s with c_s carrier docs, the operator must
remove exactly (c_s - 1) * 50 tokens (the corpus-first carrier is
canonical and untouched); boundary-crossing grams mix in unique
background tokens and so are never duplicated. The script asserts
tokens_removed and docs_affected match exactly — detection recall AND
precision 1.0 by construction or the run fails.

Usage:
    python scripts/bench_span_dedup.py [--docs 1000000] [--cpus 16]
                                       [--cpus2 4] [--k 8]

Prints one JSON line. Corpus cached under .bench_cache/span_corpus_*/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 9999
VOCAB = 1 << 31
SPAN_LEN = 50
SPAN_POS = 20
N_SPANS = 32
PLANT_EVERY = 50


def shuffle_totals(spark) -> dict:
    try:
        base = spark.sparkContext.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10)
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{apps[0]['id']}/stages?status=complete",
                timeout=30,
            )
        )
        return {
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
            ),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
        }
    except Exception as ex:
        return {"shuffle_metrics_error": str(ex)}


def _generate(spark, path: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_bg = (100 + F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(150))).cast("int")
    bg = F.transform(
        F.sequence(F.lit(0), n_bg - 1),
        lambda i: F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(2)), F.lit(VOCAB)).cast(
            "int"
        ),
    )
    span_id = F.pmod(F.col("doc_id") / PLANT_EVERY, F.lit(N_SPANS)).cast("int")
    span = F.transform(
        F.sequence(F.lit(0), F.lit(SPAN_LEN - 1)),
        lambda j: F.pmod(F.xxhash64(F.lit(SEED), span_id, j), F.lit(VOCAB)).cast(
            "int"
        ),
    )
    planted = F.pmod(F.col("doc_id"), F.lit(PLANT_EVERY)) == 0
    tokens = F.when(
        planted,
        F.concat(
            F.slice(bg, 1, SPAN_POS),
            span,
            F.slice(bg, SPAN_POS + SPAN_LEN + 1, 1_000_000),
        ),
    ).otherwise(bg)
    (
        ids.repartition(64)
        .select("doc_id", tokens.alias("tokens"), planted.alias("planted"))
        .write.mode("overwrite")
        .parquet(path)
    )


def _run_once(cpus: int, path: str, k: int) -> dict:
    from data_drift_monitoring_spark.operators import span_dedup as SD
    from data_drift_monitoring_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(4 * cpus, 32),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(cpus, 1)} -Xlog:disable"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(path)
        t0 = time.time()
        summary = SD.span_dedup_summary(docs, k=k).collect()[0].asDict()
        sec = time.time() - t0

        # closed-form truth: carriers per span minus one canonical each
        carriers = (
            docs.filter("planted")
            .groupBy(F.pmod(F.col("doc_id") / PLANT_EVERY, F.lit(N_SPANS)).alias("s"))
            .count()
            .collect()
        )
        expected_removed = sum((r["count"] - 1) * SPAN_LEN for r in carriers)
        expected_docs = sum(r["count"] - 1 for r in carriers)
        ok = (
            summary["tokens_removed"] == expected_removed
            and summary["docs_affected"] == expected_docs
        )
        return {
            "cpus": cpus,
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "sec": round(sec, 2),
            "tokens_total": summary["tokens_total"],
            "tokens_per_sec": round(summary["tokens_total"] / sec, 1),
            "tokens_removed": summary["tokens_removed"],
            "expected_removed": expected_removed,
            "docs_affected": summary["docs_affected"],
            "expected_docs_affected": expected_docs,
            "dup_grams": summary["dup_grams"],
            "exact_truth_match": bool(ok),
            **shuffle_totals(spark),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    ap.add_argument("--cpus2", type=int, default=0, help="second level for scaling")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument(
        "--pin",
        action="store_true",
        help="run each level in a subprocess pinned with taskset to "
        "exactly that many host cores — honest executor-core-budget "
        "emulation: on a real cluster the Python (mapInPandas) workers "
        "compete for the executor's cores, but an unpinned local[N] "
        "lets them ride FREE host cores, flattering small N and "
        "understating measured N→4N scaling",
    )
    ap.add_argument("--single", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"span_corpus_{args.docs}_{SEED}",
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        from data_drift_monitoring_spark.session import get_spark

        gen = get_spark(master="local[16]", shuffle_partitions=32)
        gen.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        _generate(gen, cache, args.docs)
        gen.stop()
        print(f"# generated corpus in {time.time()-t0:.0f}s", file=sys.stderr)

    if args.single:
        print(json.dumps(_run_once(args.cpus, cache, args.k)))
        return

    def run_level(cpus: int) -> dict:
        if not args.pin:
            return _run_once(cpus, cache, args.k)
        import subprocess

        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--docs", str(args.docs), "--cpus", str(cpus),
            "--k", str(args.k), "--single",
        ]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
        lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
        if not lines:
            sys.stderr.write(p.stderr[-2000:] + "\n")
            raise RuntimeError(f"pinned run at {cpus} cores produced no JSON")
        r = json.loads(lines[-1])
        r["pinned_cores"] = cpus
        return r

    out = {
        "metric": "span_dedup_scale",
        "docs": args.docs,
        "k": args.k,
        "pinned": bool(args.pin),
    }
    runs = [run_level(args.cpus)]
    if args.cpus2:
        runs.append(run_level(args.cpus2))
        lo, hi = sorted(runs, key=lambda r: r["cpus"])
        out["scaling_efficiency"] = round(
            (hi["tokens_per_sec"] / lo["tokens_per_sec"])
            / (hi["cpus"] / lo["cpus"]),
            3,
        )
    out["runs"] = runs
    if not all(r["exact_truth_match"] for r in runs):
        print(json.dumps(out))
        raise SystemExit("planted-truth mismatch")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
