"""expr_word_hashes (pyarrow dictionary-encode path) must stay
bit-identical to flattening ``expr_words`` output and hashing every
instance — the contract its docstring promises and every Arrow UDF
(minhash, contamination grams, repetition counts) relies on. Pure
pandas/pyarrow: no SparkSession needed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.util as pdu
import pytest

from data_drift_monitoring_spark.operators._tokenize import (
    expr_word_hashes,
    expr_words,
)

# Adversarial rows: ASCII-ws edges (trailing \n/\t, VT/FF/CR), Unicode
# whitespace that must NOT split (NBSP), full-casing edges where
# pyarrow's simple-folding utf8_lower would diverge (dotted İ, final
# sigma — mid-string and word-final with punctuation), compatibility
# ligatures, None, empty, and space-only strings.
EDGE_TEXTS = [
    "",
    " ",
    "   ",
    "hello\n",
    "tab\tsep\tend\t",
    "a\x0bb\x0cc\rd",
    "x\xa0y nbsp",
    "İstanbul VE ΟΔΟΣ",
    "ΟΔΟΣ, War",
    "STRASSE ẞ ǅungla ﬁx",
    None,
    " lead and trail ",
    "one",
    "Mixed CASE Words HERE",
]


def _reference(texts: pd.Series, trim: bool):
    words = expr_words(texts, trim=trim)
    lens = words.str.len().to_numpy(dtype=np.int64)
    flat = np.array([w for ws in words for w in ws], dtype=object)
    hw = pdu.hash_array(flat).astype(np.uint64)
    return lens, hw


@pytest.mark.parametrize("trim", [False, True])
def test_dict_encode_matches_flatten_reference(trim):
    s = pd.Series(EDGE_TEXTS)
    lens_ref, hw_ref = _reference(s, trim)
    lens, hw = expr_word_hashes(s, trim=trim)
    assert np.array_equal(lens, lens_ref)
    assert np.array_equal(hw, hw_ref)


@pytest.mark.parametrize("trim", [False, True])
def test_zero_row_batch(trim):
    # Spark hands pandas UDFs zero-row batches; an empty object Series
    # converts to a null-typed arrow array that string kernels reject —
    # regression test for the early-return guard.
    for empty in (pd.Series([], dtype=object), pd.Series([], dtype=str)):
        lens, hw = expr_word_hashes(empty, trim=trim)
        assert len(lens) == 0 and len(hw) == 0
        assert lens.dtype == np.int64 and hw.dtype == np.uint64


def test_random_text_parity():
    rng = np.random.default_rng(7)
    vocab = ["the", "Quick", "ΟΔΟΣ", "naïve", "x\xa0y", "word%d", "a"]
    rows = []
    for i in range(500):
        n = int(rng.integers(0, 12))
        ws = [vocab[int(j)] % (i,) if "%" in vocab[int(j)] else vocab[int(j)]
              for j in rng.integers(0, len(vocab), size=n)]
        sep = [" ", "  ", "\t", "\n", " \r "][int(rng.integers(0, 5))]
        rows.append(sep.join(ws) + (sep if rng.integers(0, 2) else ""))
    s = pd.Series(rows)
    for trim in (False, True):
        lens_ref, hw_ref = _reference(s, trim)
        lens, hw = expr_word_hashes(s, trim=trim)
        assert np.array_equal(lens, lens_ref)
        assert np.array_equal(hw, hw_ref)


@pytest.mark.parametrize("trim", [False, True])
def test_arrow_entry_small_and_large_offsets(trim):
    """expr_word_hashes_arrow must be bit-identical whether handed
    32-bit-offset ``string`` (what Spark's mapInArrow produces by
    default), ``large_string``, a ChunkedArray, or the pandas entry."""
    import pyarrow as pa

    from data_drift_monitoring_spark.operators._tokenize import (
        expr_word_hashes_arrow,
    )

    s = pd.Series(EDGE_TEXTS)
    lens_ref, hw_ref = _reference(s.fillna(""), trim)
    for arr in (
        pa.array(s, type=pa.string()),
        pa.array(s, type=pa.large_string()),
        pa.chunked_array([pa.array(s[:5], type=pa.string()),
                          pa.array(s[5:], type=pa.string())]),
    ):
        lens, hw = expr_word_hashes_arrow(arr, trim=trim)
        assert np.array_equal(lens, lens_ref)
        assert np.array_equal(hw, hw_ref)
    # zero-row arrow batch
    lens0, hw0 = expr_word_hashes_arrow(pa.array([], type=pa.string()), trim)
    assert len(lens0) == 0 and len(hw0) == 0
