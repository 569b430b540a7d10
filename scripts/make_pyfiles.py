"""Build the ``--py-files`` artifact (``engine.zip``) for spark-submit.

The north rule's launch path is ``spark-submit --py-files engine.zip
jobs/<job>.py ...`` — the whole engine package ships as one zip that the
driver and every executor's Python workers import from. The build is
deterministic (sorted entries, fixed timestamps, no ``.pyc``): the same
source tree always produces a byte-identical zip, so cluster deploys can
be content-addressed and a re-deploy of unchanged code is a no-op.

Usage::

    python scripts/make_pyfiles.py [--out dist/engine.zip]
    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/run_checks.py --input ... --warehouse ... --run-id ...
"""

from __future__ import annotations

import argparse
import os
import zipfile

PKG = "data_drift_monitoring_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, repo: str = REPO) -> str:
    """Zip ``data_drift_monitoring_spark/**/*.py`` into ``out_path``.

    Byte-identical for identical sources: entries are walked in sorted
    order, every member gets the DOS-epoch timestamp and 0644 mode, and
    compiled/cache artifacts are excluded.
    """
    pkg_root = os.path.join(repo, PKG)
    entries: list[tuple[str, str]] = []
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for name in sorted(files):
            if name.endswith(".py"):
                full = os.path.join(root, name)
                entries.append((full, os.path.relpath(full, repo)))
    if not entries:
        raise FileNotFoundError(f"no package sources under {pkg_root}")
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(out_path, "w") as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "engine.zip"))
    args = ap.parse_args(argv)
    print(build_zip(args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
