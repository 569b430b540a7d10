"""Generator determinism and variant properties (FIXTURES.md §1)."""

import os

import pyarrow.parquet as pq
import pytest

from data_drift_monitoring_spark.generator import generate_sequences


def _read_all(d):
    import pyarrow.dataset as ds

    return ds.dataset(d).to_table().to_pandas()


def test_deterministic(tmp_path):
    a = generate_sequences(str(tmp_path / "a"), "ref", rows=500, num_partitions=4)
    b = generate_sequences(str(tmp_path / "b"), "ref", rows=500, num_partitions=4)
    ta, tb = _read_all(a), _read_all(b)
    assert ta.drop(columns="tokens").equals(tb.drop(columns="tokens"))
    assert all((x == y).all() for x, y in zip(ta.tokens, tb.tokens))


def test_ref_is_clean(tmp_path):
    d = generate_sequences(str(tmp_path / "r"), "ref", rows=1000, num_partitions=4)
    t = _read_all(d)
    assert t.doc_id.notna().all()
    assert t.doc_id.is_unique
    assert (t.tokens.map(len) == t.n_tok).all()
    assert set(t.source) <= {"web", "books", "code", "wiki", "news"}


def test_corrupted_copy_differs_only_in_p5(tmp_path):
    r = _read_all(
        generate_sequences(str(tmp_path / "r"), "ref", rows=2000, num_partitions=8)
    )
    c = _read_all(
        generate_sequences(
            str(tmp_path / "c"), "ref_corrupted", rows=2000, num_partitions=8
        )
    )
    assert (r.doc_id == c.doc_id).all()
    neq = [
        i
        for i, (x, y) in enumerate(zip(r.tokens, c.tokens))
        if len(x) != len(y) or (x != y).any()
    ]
    assert neq, "expected some corrupted rows"
    assert set(c.part_id[neq]) == {5}
    assert (r.n_tok != c.n_tok).sum() > 0
    assert set(c.part_id[r.n_tok != c.n_tok]) == {5}


def test_invalid_fails_min_rows(tmp_path):
    d = generate_sequences(str(tmp_path / "i"), "invalid")
    n = pq.ParquetFile(os.path.join(d, "part-0.parquet")).metadata.num_rows
    assert n == 3
