"""Table IO with versioned snapshots.

The reference treats a dataset as one file and a baseline as a copied file +
JSON sidecar with version ids ``baseline_v{n}_{yyyymmdd}``
(``versioning.py:34-116``). The engine's primary target is an Iceberg
catalog table (snapshot ids give time travel / lineage pins for free); the
sandbox has no Iceberg runtime jar, so ``TableIO`` abstracts the catalog:

- ``IcebergTableIO`` (used when ``spark.sql.catalog.*`` is configured):
  ``spark.read.format("iceberg")`` + ``option("snapshot-id", ...)``,
  ``df.writeTo(tbl).append()``.
- ``ParquetTableIO`` (default here): a directory per table, a subdirectory
  per version ``v{n}_{yyyymmdd_HHMMSS}`` mirroring versioning.py's naming,
  and the directory name as the snapshot id. Semantics (pin a snapshot,
  list versions, read latest) are identical, so every engine feature is
  testable offline and swaps to Iceberg by configuration only.

Reads/writes always go through Spark's parquet source → predicate pushdown,
column pruning and min/max file skipping apply (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v(\d+)_(\d{8}_\d{6})$")


class ParquetTableIO:
    """Directory-versioned parquet tables (Iceberg-shaped API)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def list_snapshots(self, table: str) -> list[str]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        versions = [v for v in os.listdir(d) if _VERSION_RE.match(v)]
        return sorted(versions, key=lambda v: int(_VERSION_RE.match(v).group(1)))

    def latest_snapshot(self, table: str) -> str | None:
        snaps = self.list_snapshots(table)
        return snaps[-1] if snaps else None

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append-version",
        partition_by: list[str] | None = None,
        now: datetime | None = None,
    ) -> str:
        """Write a new snapshot; returns its id. ``now`` is injectable for
        deterministic tests (the reference bakes now() into report ids —
        quality_check.py:93-100 — we make it a parameter, SURVEY.md §7.4.6).
        """
        snaps = self.list_snapshots(table)
        n = int(_VERSION_RE.match(snaps[-1]).group(1)) + 1 if snaps else 1
        ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
        snap_id = f"v{n}_{ts}"
        path = os.path.join(self._table_dir(table), snap_id)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return snap_id

    def read(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        snap = snapshot_id or self.latest_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table} has no snapshots")
        return self.spark.read.parquet(
            os.path.join(self._table_dir(table), snap)
        )

    def append(self, df: DataFrame, table: str) -> None:
        """Un-versioned append (results / violations / manifest tables)."""
        df.write.mode("append").parquet(
            os.path.join(self._table_dir(table), "data")
        )

    def read_appended(self, table: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._table_dir(table), "data")
        )

    def exists(self, table: str) -> bool:
        """True if the table has any versioned snapshot OR appended data."""
        if self.list_snapshots(table):
            return True
        d = os.path.join(self._table_dir(table), "data")
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed managed table — Spark native bucketing, the
    parquet-catalog analogue of Iceberg's ``bucket(N, col)`` partition
    transform. Two tables bucketed on the same (column, N) equi-join with
    ZERO exchanges: each bucket file pair is joined in place, which is
    the co-located join the uniqueness/token-equality pass relies on at
    10^12 rows (operators/invariants.py). An aggregation grouped on a
    superset of the bucket column likewise needs no exchange
    (HashPartitioning(col) satisfies the clustering)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


class IcebergTableIO:
    """Thin adapter for a configured Iceberg catalog (not exercisable in the
    sandbox — no runtime jar; kept interface-compatible with ParquetTableIO
    so the pipeline swaps by config)."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"

    def read(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        reader = self.spark.read.format("iceberg")
        if snapshot_id:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(f"{self.prefix}.{table}")

    def write(self, df: DataFrame, table: str, **_) -> str:
        df.writeTo(f"{self.prefix}.{table}").createOrReplace()
        hist = self.spark.sql(
            f"SELECT snapshot_id FROM {self.prefix}.{table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(hist[0][0]) if hist else "unknown"

    def append(self, df: DataFrame, table: str) -> None:
        df.writeTo(f"{self.prefix}.{table}").append()

    def read_appended(self, table: str) -> DataFrame:
        return self.read(table)
