"""Deduplication for training corpora — beyond the reference's full-row
``duplicated()`` (duplicates.py:47-56), the operations a 100 TB text
pipeline needs: exact content dedup, MinHash+LSH near-dup, SimHash,
n-gram Jaccard verification, and embedding-cosine near-dup.

Scale design:
- exact: hash-groupBy on a content digest (never on raw text) — the shuffle
  moves 16-byte digests, not documents.
- MinHash+LSH: shingle → 64 minhashes (JVM expression: array_min over a
  universal-hash transform of xxhash64 shingle hashes) → B bands hashed to
  buckets → candidate pairs ONLY within buckets (self-join on (band, hash),
  quadratic only in bucket size) → exact/estimated Jaccard verification.
- SimHash: 64-bit signature via an Arrow pandas UDF (numpy bitcount); near
  dups = identical signatures (or Hamming ≤ d by multi-table split).
- embedding cosine: random-hyperplane LSH bucket join + exact cosine within
  bucket (brute force cross-join is the small-scale baseline in
  similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# Mersenne prime 2^31-1: universal hashing a*x+b mod p. The 31-bit field
# keeps every product < 2^62, safe under ANSI int64 overflow checking
# (a 61-bit prime would overflow a*h for full-range xxhash64 inputs).
_MERSENNE = (1 << 31) - 1


def content_digest(df: DataFrame, text_col: str = "text", normalized: bool = True) -> DataFrame:
    """Stable content digest column ``digest`` (md5 — also available in
    every SQL oracle engine). Normalization: lowercase + collapsed
    whitespace, the usual exact-dedup canonicalization."""
    t = F.col(text_col)
    if normalized:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    return df.withColumn("digest", F.md5(t))


def exact_duplicates(
    df: DataFrame, key_col: str, text_col: str = "text", normalized: bool = True
) -> DataFrame:
    """Exact-content duplicate groups: (digest, group_size, doc_ids).
    Returns only groups with >1 member, doc_ids sorted for determinism."""
    d = content_digest(df, text_col, normalized)
    return (
        d.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list(key_col)).alias("members"),
        )
        .filter(F.col("group_size") > 1)
    )


def dedup_exact_content(
    df: DataFrame, key_col: str, text_col: str = "text", normalized: bool = True
) -> DataFrame:
    """Keep one representative per content digest (lowest key — explicit
    deterministic order, cf. uniqueness.dedup_exact)."""
    d = content_digest(df, text_col, normalized)
    w = Window.partitionBy("digest").orderBy(F.col(key_col).asc())
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "digest")
    )


def _shingles(text_col: str, k: int):
    """k-word shingle hash array: split → slide window → xxhash64. All JVM
    higher-order functions; no Python in the row path."""
    words = F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " ")
    n = F.greatest(F.size(words) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - 1)
    return F.transform(
        idx,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k))),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Add ``minhash`` (array<bigint>, length num_hashes): per hash i,
    min over shingles of (aᵢ·h + bᵢ mod 2⁶¹-1). Deterministic in seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    sh = _shingles(text_col, shingle_k)
    df = df.withColumn("_sh", sh)

    def _uhash(ai: int, bi: int):
        # one-arg closure: F.transform must NOT see a second (index) param.
        # reduce the 64-bit shingle hash into the field before multiplying.
        return lambda h: F.pmod(
            F.lit(ai) * F.pmod(h, F.lit(_MERSENNE)) + F.lit(bi),
            F.lit(_MERSENNE),
        )

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh"), _uhash(int(a[i]), int(b[i]))))
            for i in range(num_hashes)
        ]
    )
    return df.withColumn("minhash", sig).drop("_sh")


def lsh_candidate_pairs(
    sigs: DataFrame,
    key_col: str,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs (a < b) with
    their minhash-estimated Jaccard. The self-join is on (band, band_hash):
    shuffle keys are tiny and quadratic blowup is confined to buckets."""
    rows = num_hashes // bands
    banded = sigs.select(
        F.col(key_col).alias("k"),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("minhash")[bi * rows + r].cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "minhash", "bb.band", "bb.bh")

    left = banded.select(
        "band", "bh", F.col("k").alias("a"), F.col("minhash").alias("sig_a")
    )
    right = banded.select(
        "band", "bh", F.col("k").alias("b"), F.col("minhash").alias("sig_b")
    )
    pairs = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(num_hashes)
    )
    return pairs.select("a", "b", est.alias("est_jaccard"))


def minhash_lsh_duplicates(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-dup pairs with estimated Jaccard ≥ threshold."""
    sigs = minhash_signatures(df, text_col, num_hashes, shingle_k, seed)
    pairs = lsh_candidate_pairs(sigs, key_col, num_hashes, bands)
    return pairs.filter(F.col("est_jaccard") >= threshold)


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs: join the two
    shingle sets back and compare with array_intersect/union sizes. Only
    runs on the (small) candidate set."""
    sh = df.select(
        F.col(key_col).alias("k"),
        F.array_distinct(_shingles(text_col, shingle_k)).alias("sh"),
    )
    a = sh.select(F.col("k").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("k").alias("b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, on="a").join(b, on="b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "a",
        "b",
        (inter / union).alias("jaccard"),
    )


@pandas_udf(T.LongType())
def _simhash64(words_hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-word 64-bit hashes (Charikar 2002):
    bit b of the signature = sign of Σ_w (±1 by bit b of hash(w)).
    Arrow-vectorized numpy; no per-row Python beyond the ragged loop."""
    out = np.zeros(len(words_hashes), dtype=np.int64)
    for i, hs in enumerate(words_hashes):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        v = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 sums)
        sig = np.uint64(0)
        for b in range(64):
            if v[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a 64-bit ``simhash`` column. Word hashes are computed JVM-side
    (xxhash64 per word); only the bit-vote crosses to Arrow."""
    words = F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " ")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    return df.withColumn("simhash", _simhash64(wh))


def simhash_duplicates(
    df: DataFrame, key_col: str, text_col: str = "text"
) -> DataFrame:
    """Exact-signature SimHash collision groups (Hamming distance 0; the
    standard d≤k extension splits the 64 bits into k+1 tables of this same
    shape)."""
    s = simhash(df, text_col)
    return (
        s.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list(key_col)).alias("members"),
        )
        .filter(F.col("group_size") > 1)
    )


def embedding_near_duplicates(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: random-hyperplane LSH bucket (sign bits of
    R dot products) → exact cosine within bucket. Pairs (a<b) with
    cosine ≥ threshold. The hyperplanes are literal arrays (broadcast in
    the plan, no side table)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes_m = rng.standard_normal((planes, dim))

    d = df.select(F.col(key_col).alias("k"), F.col(vec_col).alias("v"))
    v = F.col("v")
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in planes_m[p]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int")
        for p in range(planes)
    ]
    bucket = F.concat_ws("", *[b.cast("string") for b in bits])
    d = d.withColumn("bucket", bucket)
    a = d.select("bucket", F.col("k").alias("a"), F.col("v").alias("va"))
    b = d.select("bucket", F.col("k").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
        )
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", (dot / (norm(F.col("va")) * norm(F.col("vb")))).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["a", "b"])
    )
