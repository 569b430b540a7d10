"""Shared fixtures: one SparkSession per test run, deterministic generated
tables (FIXTURES.md) in a session-scoped tmp dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_drift_monitoring_spark.generator import (  # noqa: E402
    generate_allowed_sources,
    generate_sequences,
)
from data_drift_monitoring_spark.session import get_spark  # noqa: E402

ROWS = 8000
PARTS = 8


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seqdata"))
    for variant in ("ref", "ref_corrupted", "cur_clean", "cur_drifted", "invalid"):
        generate_sequences(
            os.path.join(d, variant), variant, rows=ROWS, num_partitions=PARTS
        )
    generate_allowed_sources(d)
    return d


@pytest.fixture(scope="session")
def ref_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "ref"))


@pytest.fixture(scope="session")
def cur_clean_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "cur_clean"))


@pytest.fixture(scope="session")
def cur_drifted_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "cur_drifted"))


@pytest.fixture(scope="session")
def ref_corrupted_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "ref_corrupted"))


@pytest.fixture(scope="session")
def allowed_sources_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "allowed_sources.parquet"))


@pytest.fixture(scope="session")
def mini_df(spark):
    """FIXTURES.md §4 micro-fixture (reference test_file_handler.py:31-39)."""
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [
            (1, "Alice", 25, 50000.0),
            (2, "Bob", 30, 60000.0),
            (3, "Charlie", 35, None),
            (4, None, 40, 80000.0),
            (5, "Eve", 45, 90000.0),
        ],
        "id long, name string, age long, salary double",
    ).withColumn("part_id", F.lit(0).cast("int"))
