"""Ingestion path: format gates, csv/json/parquet round trips, dataset
validation, metadata, content digest (reference test_file_handler.py model:
format validation :42-72, read per format :75-117, validation :120-182,
metadata :185-228, hash determinism :276-300)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from data_drift_monitoring_spark.sources.ingest import (
    content_digest,
    dataset_metadata,
    read_dataset,
    validate_dataset,
    validate_format,
)


@pytest.fixture(scope="module")
def small_df(spark):
    rows = [
        (i, f"name_{i}", 20 + i % 50, float(1000 + 13 * i), ["a", "b", "c"][i % 3])
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "id long, name string, age int, salary double, department string"
    )


def test_validate_format():
    assert validate_format("x.csv") == "csv"
    assert validate_format("x.json") == "json"
    assert validate_format("x.parquet") == "parquet"
    assert validate_format("/some/dir") == "parquet"
    with pytest.raises(ValueError, match="unsupported format 'xlsx'"):
        validate_format("x.xlsx")


def test_round_trips(spark, small_df, tmp_path):
    p_csv, p_json, p_parq = (
        str(tmp_path / "d.csv"),
        str(tmp_path / "d.json"),
        str(tmp_path / "d.parquet"),
    )
    small_df.coalesce(1).write.option("header", True).csv(p_csv)
    small_df.coalesce(1).write.json(p_json)
    small_df.write.parquet(p_parq)
    for path in (p_csv, p_json, p_parq):
        back = read_dataset(spark, path, fmt=path.rsplit(".", 1)[-1])
        assert back.count() == 40
        assert set(c.lower() for c in back.columns) == set(small_df.columns)
    # explicit schema enforces types on csv
    sch = T.StructType([T.StructField("id", T.LongType())] + [
        T.StructField(n, T.StringType()) for n in
        ("name", "age", "salary", "department")
    ])
    typed = read_dataset(spark, p_csv, fmt="csv", schema=sch)
    assert dict(typed.dtypes)["id"] == "bigint"


def test_validate_dataset_gates(spark, small_df):
    ok = validate_dataset(small_df)
    assert ok.is_valid and ok.errors == ()
    tiny = small_df.limit(3)
    bad = validate_dataset(tiny)
    assert not bad.is_valid
    assert "minimum is 10" in bad.errors[0]
    empty = small_df.filter(F.lit(False))
    assert validate_dataset(empty).errors[0] == "dataset is empty"


def test_validate_dataset_schema_warnings(spark, small_df):
    expected = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("missing_col", T.StringType()),
        ]
    )
    v = validate_dataset(small_df, expected_schema=expected)
    assert v.is_valid  # warnings only, mirroring file_handler.py:206-235
    assert any("missing column: missing_col" in w for w in v.warnings)
    assert any("unexpected column: age" in w for w in v.warnings)


def test_dataset_metadata(spark, small_df):
    meta = dataset_metadata(small_df)
    assert meta["num_rows"] == 40
    assert meta["num_columns"] == 5
    assert meta["missing_values"]["name"] == 0
    assert meta["numeric_summary"]["age"]["min"] == 20.0
    dept = meta["categorical_summary"]["department"]
    assert dept["unique_count"] == 3
    assert sum(dept["top_values"].values()) == 40


def test_content_digest_deterministic_and_order_insensitive(spark, small_df):
    d1 = content_digest(small_df)
    d2 = content_digest(small_df.orderBy(F.desc("id")))
    assert d1 == d2 and len(d1) == 16
    assert content_digest(small_df.limit(39)) != d1


def test_content_digest_multiplicity_sensitive(spark, small_df):
    """An xor rollup is blind to even duplicate counts — adding two copies
    of an existing row must still change the digest (sum-mod-2^64 rollup)."""
    one = small_df.limit(1)
    doubled = small_df.unionAll(one).unionAll(one)
    assert content_digest(doubled) != content_digest(small_df)
    assert content_digest(doubled) == content_digest(
        doubled.orderBy(F.desc("id"))
    )


def test_compare_metadata_against_baseline(spark, small_df):
    """versioning.py:271-364 parity: row/column/schema/dtype differences
    plus the missing-rate extension."""
    from pyspark.sql import functions as F

    from data_drift_monitoring_spark.plans.compare import (
        compare_metadata,
        no_baseline,
    )

    base = dataset_metadata(small_df)
    cur_df = (
        small_df.limit(30)
        .withColumn("name", F.when(F.col("id") % 3 == 0, None).otherwise(F.col("name")))
        .withColumn("age", F.col("age").cast("double"))
        .withColumnRenamed("department", "dept")
    )
    cur = dataset_metadata(cur_df)
    rep = compare_metadata(cur, base, baseline_version="v1")
    fields = {d["field"]: d for d in rep["differences"]}

    assert rep["has_baseline"] and rep["baseline_version"] == "v1"
    assert fields["rows"]["change"] == -10
    assert fields["rows"]["change_percentage"] == -25.0
    assert fields["column_schema"]["missing_columns"] == ["department"]
    assert fields["column_schema"]["extra_columns"] == ["dept"]
    dt = {c["column"]: c for c in fields["data_types"]["changes"]}
    assert dt["age"]["baseline_dtype"] == "int"
    assert dt["age"]["current_dtype"] == "double"
    mv = {c["column"]: c for c in fields["missing_value_rates"]["changes"]}
    assert mv["name"]["baseline_pct"] == 0.0 and mv["name"]["current_pct"] > 20

    assert no_baseline()["has_baseline"] is False


def test_dataset_metadata_action_count_fixed(spark, small_df, monkeypatch):
    """The upload metadata path must run a fixed number of aggregate
    actions however wide the table is: one wide profile collect + one
    melted top-k collect — never an action per categorical column (the
    old path ran top_k_values once per column)."""
    import pyspark.sql as psql

    wide = small_df
    for i in range(12):  # add 12 extra categorical columns
        wide = wide.withColumn(f"cat{i}", F.concat(F.lit(f"v{i}_"),
                                                   (F.col("id") % 3)))
    calls = {"n": 0}
    orig = psql.DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(psql.DataFrame, "collect", counting)
    meta = dataset_metadata(wide)
    assert calls["n"] <= 2, f"dataset_metadata ran {calls['n']} actions"
    assert len(meta["categorical_summary"]) == 10  # max_categorical cap
    some = next(iter(meta["categorical_summary"].values()))
    assert some["top_values"] and all(
        isinstance(v, int) for v in some["top_values"].values()
    )


def test_orc_round_trip(spark, small_df, tmp_path):
    p = str(tmp_path / "t.orc")
    small_df.write.orc(p)
    from data_drift_monitoring_spark.sources.ingest import (
        read_dataset,
        validate_format,
    )

    assert validate_format(p) == "orc"
    back = read_dataset(spark, p)
    assert back.count() == small_df.count()
    assert set(back.columns) == set(small_df.columns)
