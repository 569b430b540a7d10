"""spark-submit ``--py-files`` launch path (the north rule's deployment
contract): the engine ships as one deterministic zip and the jobs run with
the package importable ONLY from that zip — the entry scripts are copied
outside the repo so repo-relative imports cannot leak in. Reference
analogue: the uvicorn app launch in ``backend/app/main.py:1-40``; here the
unit of deployment is a spark-submit job, not a web worker."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _submit(script: str, zip_path: str, cwd: str, *args: str):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["SPARK_GRAFT_CPUS"] = "4"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        script, *args,
    ]
    return subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )


def test_pyfiles_zip_is_deterministic(tmp_path):
    from scripts.make_pyfiles import build_zip

    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
    # and it actually contains the package, rooted at the package name
    import zipfile

    names = zipfile.ZipFile(a).namelist()
    assert "data_drift_monitoring_spark/session.py" in names
    assert all(n.endswith(".py") for n in names)


def test_spark_submit_init_then_checks(tmp_path, spark):
    """init_reference then run_checks via real spark-submit --py-files;
    verdicts land in the warehouse and the planted corruption fails."""
    from data_drift_monitoring_spark.generator import generate_sequences
    from scripts.make_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "engine.zip"))
    # 8 partitions: the ref_corrupted variant plants dup doc_ids + flipped
    # tokens in part_id 5, which must exist for the failed-verdict assert
    ref = generate_sequences(
        str(tmp_path / "ref"), "ref", rows=2000, num_partitions=8
    )
    cur = generate_sequences(
        str(tmp_path / "cur"), "ref_corrupted", rows=2000, num_partitions=8
    )

    # copy the entry scripts OUTSIDE the repo: their sys.path bootstrap then
    # points at tmp (no package there), so imports must resolve via the zip
    app = tmp_path / "app"
    app.mkdir()
    for j in ("init_reference.py", "run_checks.py"):
        shutil.copy(os.path.join(REPO, "jobs", j), app / j)
    wh = str(tmp_path / "wh")

    p = _submit(
        str(app / "init_reference.py"), zip_path, str(tmp_path),
        "--input", ref, "--warehouse", wh,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    assert "reference snapshot: v1_" in p.stdout

    p = _submit(
        str(app / "run_checks.py"), zip_path, str(tmp_path),
        "--input", cur, "--warehouse", wh, "--run-id", "submit_r4",
    )
    assert p.returncode == 0, p.stderr[-3000:]
    assert "verdicts" in p.stdout

    verdicts = spark.read.parquet(
        os.path.join(wh, "check_results", "data")
    ).filter("run_id = 'submit_r4'")
    assert verdicts.count() > 0
    # ref_corrupted plants dup doc_ids + flipped tokens in part 5
    assert verdicts.filter("passed = false").count() > 0
