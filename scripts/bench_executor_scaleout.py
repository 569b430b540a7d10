"""Executor scale-out emulation for the contamination probe.

Topology A: ONE pinned 2-core process probes the full corpus.
Topology B: TWO concurrent pinned 2-core processes (disjoint core sets)
each probe half the corpus (doc_id parity) — the real 2-executor
topology for this operator, whose corpus side never shuffles (eval
grams broadcast; the only cross-executor exchange in a real cluster is
the ~8 MB matched-gram aggregation, omitted here and noted).

probe mode:    python scripts/bench_executor_scaleout.py probe <cores> <half:-1|0|1>
orchestrator:  python scripts/bench_executor_scaleout.py run

Measured round 4 (see BENCH.md "Executor scale-out emulation"): the
halves max-combine EXACTLY to the full run's flags (recall 1.0), and
the experiment turns into a direct measurement of single-VM memory
interference: the identical half-corpus probe on the identical 2 cores
runs 61.0 s solo but 145.0 s when its twin runs on four DIFFERENT
cores — 2.38× mutual slowdown across disjoint core sets, i.e. the
sandbox's shared ~2 GB/s memory system, not the operator, is what
breaks multi-process scaling here."""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_contamination_scale import build_eval  # noqa: E402  (single
# copy of the deterministic eval builder — the emulation is only comparable
# to the scale bench if both use the same code path)
STRIDE = 1000
N = 8
MIN_OVERLAP = 0.5
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", "dedup_corpus_1000000_42",
)


def probe(cores: int, half: int):
    from data_drift_monitoring_spark.session import get_spark
    from data_drift_monitoring_spark.operators.contamination import (
        contamination_report,
    )
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 32),
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={cores} -Xlog:disable"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(CACHE, "docs"))
    eval_df, truth, _ = build_eval(spark, docs, STRIDE, n=N)
    train = docs if half < 0 else docs.filter(F.pmod("doc_id", F.lit(2)) == half)
    t0 = time.time()
    rep = contamination_report(
        train, eval_df, n=N, min_overlap=MIN_OVERLAP
    ).toPandas()
    wall = time.time() - t0
    flags = {int(r.eval_id): int(r.contaminated) for r in rep.itertuples()}
    print(
        json.dumps(
            {
                "half": half,
                "cores": cores,
                "wall": round(wall, 1),
                "n_flagged": sum(flags.values()),
                "flags": flags,
                "truth_pos": sorted(
                    e for e, (_, exp) in truth.items() if exp
                ),
            }
        )
    )
    spark.stop()


def launch(half, cpu_list):
    return subprocess.Popen(
        [
            "taskset",
            "-c",
            cpu_list,
            sys.executable,
            os.path.abspath(__file__),
            "probe",
            "2",
            str(half),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def last_json(*procs):
    """Drain ALL given subprocesses concurrently, then parse each one's
    last JSON line. Sequential communicate() would deadlock: the flags
    JSON alone is ~50 KB at stride=1000, so a still-running twin fills
    its ~64 KB pipe buffer and blocks on write while we sit in the first
    process's communicate()."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(procs)) as ex:
        outs = list(ex.map(lambda p: p.communicate(), procs))
    results = []
    for p, (stdout, stderr) in zip(procs, outs):
        out = [ln for ln in stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not out:
            tail = "\n".join(stderr.strip().splitlines()[-15:])
            raise RuntimeError(
                f"probe subprocess rc={p.returncode} produced no JSON; "
                f"stderr tail:\n{tail}"
            )
        results.append(json.loads(out[-1]))
    return results if len(results) > 1 else results[0]


def run():
    import shutil

    # fail fast with a reason instead of burning Topology-A minutes
    if shutil.which("taskset") is None:
        sys.exit("taskset not found — this emulation needs pinned cores")
    if not os.path.exists(os.path.join(CACHE, "docs")):
        sys.exit(
            f"corpus cache missing at {CACHE} — run "
            "scripts/bench_dedup_scale.py (or run_pinned_ladders.sh) "
            "once to generate it"
        )
    # Topology A: one 2-core executor, full corpus
    t0 = time.time()
    a = last_json(launch(-1, "0-1"))
    wall_a = time.time() - t0
    # Topology B: two 2-core executors, concurrent, half corpus each
    t0 = time.time()
    p0, p1 = launch(0, "0-1"), launch(1, "2-3")
    r0, r1 = last_json(p0, p1)
    wall_b = time.time() - t0
    # max-combine the halves (the cross-executor aggregation a real
    # cluster would do over the ~8 MB matched-gram exchange)
    combined = {
        e: max(r0["flags"].get(str(e), r0["flags"].get(e, 0)),
               r1["flags"].get(str(e), r1["flags"].get(e, 0)))
        for e in set(list(r0["flags"]) + list(r1["flags"]))
    }
    full_flags = {int(k): v for k, v in a["flags"].items()}
    combined = {int(k): v for k, v in combined.items()}
    agree = combined == full_flags
    pos = set(a["truth_pos"])
    recall_full = sum(full_flags.get(e, 0) for e in pos) / len(pos)
    recall_comb = sum(combined.get(e, 0) for e in pos) / len(pos)
    print(
        json.dumps(
            {
                "metric": "executor_scaleout_contamination",
                "corpus_docs": 1020063,
                "stride": STRIDE,
                "probe_wall_1exec": a["wall"],
                "probe_wall_2exec_max": max(r0["wall"], r1["wall"]),
                "proc_wall_1exec": round(wall_a, 1),
                "proc_wall_2exec": round(wall_b, 1),
                "scaleout_efficiency_probe": round(
                    a["wall"] / (2 * max(r0["wall"], r1["wall"])), 3
                ),
                "flags_agree_with_full_run": agree,
                "recall_full": recall_full,
                "recall_combined": recall_comb,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    if sys.argv[1] == "probe":
        probe(int(sys.argv[2]), int(sys.argv[3]))
    else:
        run()
