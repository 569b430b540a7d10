"""Deterministic synthetic `sequences` tables (FIXTURES.md §1).

Mirrors the reference's fixture triple (clean baseline / drifted current /
too-small invalid) from ``/root/reference/create_test.ipynb`` cell 0 and its
``random_state=42`` convention (``outliers.py:257``, ``missing_values.py:221``),
generalized to the target tokenized-sequence shape. Generation is vectorized
numpy writing parquet via pyarrow — one file per `part_id` so a Spark read
sees one input split per logical partition.

Variants
--------
ref          clean reference snapshot: unique doc_id, size(tokens)==n_tok,
             source in ALLOWED_SOURCES, stationary n_tok distribution.
cur_clean    fresh sample from the same distributions (all checks pass).
cur_drifted  per-partition injected violations (assertable per partition):
             p2: 10% null doc_id          p3: duplicated doc_id groups
             p4: novel source "forum"     p5: 1% size(tokens)!=n_tok and
                                              1% single-token corruption
             p6,p7: n_tok mean x1.5 (PSI > 0.25, significant KS)
ref_corrupted  byte-wise copy of `ref` except p5's corruptions (1% declared
             n_tok off-by-one, 1% single flipped token element) — the
             fixture for the per-row token-array-equality invariant.
invalid      3 rows (fails MIN_ROWS=10, settings.py:58).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import ALLOWED_SOURCES, TOKEN_VOCAB_SIZE

SOURCE_PROBS = np.array([0.70, 0.10, 0.08, 0.07, 0.05])  # skewed: 70% "web"
SOURCE_NTOK_MEAN = {  # per-source log-normal location
    "web": 4.6,
    "books": 5.5,
    "code": 5.0,
    "wiki": 4.9,
    "news": 4.4,
}
MAX_NTOK = 2048

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("part_id", pa.int32()),
    ]
)


def _partition_batch(
    variant: str, part_id: int, rows: int, seed: int, id_offset: int
) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, part_id, 42]))

    src_idx = rng.choice(len(ALLOWED_SOURCES), size=rows, p=SOURCE_PROBS)
    sources = np.array(ALLOWED_SOURCES, dtype=object)[src_idx]

    mu = np.array([SOURCE_NTOK_MEAN[s] for s in ALLOWED_SOURCES])[src_idx]
    if variant == "cur_drifted" and part_id in (6, 7):
        mu = mu + np.log(1.5)  # shifted n_tok distribution → PSI/KS drift
    n_tok = np.clip(rng.lognormal(mu, 0.6).astype(np.int64), 1, MAX_NTOK)

    ids = np.char.add(
        "doc_", np.char.zfill((np.arange(rows) + id_offset).astype(str), 10)
    ).astype(object)

    if variant == "cur_drifted":
        if part_id == 2:  # 10% null doc_id
            ids[rng.random(rows) < 0.10] = None
        if part_id == 3:  # duplicate doc_id groups (~5% rows are repeats)
            n_dup = max(2, rows // 20)
            dup_to = rng.integers(0, rows, size=n_dup)
            dup_from = rng.integers(0, rows, size=n_dup)
            ids[dup_to] = ids[dup_from]
        if part_id == 4:  # novel source value → referential violations
            sources[rng.random(rows) < 0.08] = "forum"
    # tokens: one flat draw + offsets → arrow ListArray (no Python loop)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat = rng.integers(
        0, TOKEN_VOCAB_SIZE, size=int(offsets[-1]), dtype=np.int32
    )

    declared = n_tok.astype(np.int32).copy()
    if variant in ("cur_drifted", "ref_corrupted") and part_id == 5:
        # 1%: declared length lies about the array → length-consistency hits
        bad_len = rng.random(rows) < 0.01
        declared[bad_len] += 1
        # separate 1%: flip one token element → per-row equality invariant hits
        bad_tok = (rng.random(rows) < 0.01) & ~bad_len
        for i in np.nonzero(bad_tok)[0]:
            j = int(offsets[i]) + int(rng.integers(0, n_tok[i]))
            flat[j] = (flat[j] + 1) % TOKEN_VOCAB_SIZE

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.Table.from_arrays(
        [
            pa.array(ids, type=pa.string()),
            tokens,
            pa.array(declared, type=pa.int32()),
            pa.array(sources, type=pa.string()),
            pa.array(np.full(rows, part_id, dtype=np.int32)),
        ],
        schema=ARROW_SCHEMA,
    )


def generate_sequences(
    out_dir: str,
    variant: str = "ref",
    rows: int = 10_000,
    num_partitions: int = 8,
    seed: int = 42,
) -> str:
    """Write a deterministic sequences table to ``out_dir`` (one parquet file
    per part_id). Returns ``out_dir``. Same (variant, rows, partitions, seed)
    → byte-identical logical content.
    """
    os.makedirs(out_dir, exist_ok=True)
    if variant == "invalid":
        tbl = _partition_batch("ref", 0, 3, seed + 1, 0)
        pq.write_table(
            tbl, os.path.join(out_dir, "part-0.parquet"), row_group_size=65536
        )
        return out_dir

    # distinct seeds per variant so cur_clean is a *fresh* draw, and a
    # disjoint doc_id range per partition (uniqueness holds unless injected)
    vseed = {
        "ref": seed,
        "ref_corrupted": seed,  # identical draw → corruption is the only diff
        "cur_clean": seed + 1000,
        "cur_drifted": seed + 1000,
    }[variant]
    per = rows // num_partitions
    for p in range(num_partitions):
        n = per + (rows % num_partitions if p == num_partitions - 1 else 0)
        tbl = _partition_batch(variant, p, n, vseed, id_offset=p * per)
        # small row groups → many input splits per file, so scan parallelism
        # is not capped at one task per part_id file
        pq.write_table(
            tbl, os.path.join(out_dir, f"part-{p}.parquet"), row_group_size=65536
        )
    return out_dir


def generate_allowed_sources(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.Table.from_arrays(
        [pa.array(list(ALLOWED_SOURCES), type=pa.string())], names=["source"]
    )
    path = os.path.join(out_dir, "allowed_sources.parquet")
    pq.write_table(tbl, path)
    return path


# ---------------------------------------------------------------------------
# near-dup benchmark corpus (large-scale dedup evidence)
# ---------------------------------------------------------------------------

DEDUP_VOCAB_SIZE = 50_000


def _trigram_jaccard(a: "np.ndarray", b: "np.ndarray") -> float:
    """Exact word-trigram Jaccard of two word-index sequences — the same
    shingle definition as ``operators.dedup._with_shingles`` (k=3 over the
    whitespace words), computed in numpy for planted-truth pairs."""
    sa = {tuple(a[i : i + 3]) for i in range(max(len(a) - 2, 1))}
    sb = {tuple(b[i : i + 3]) for i in range(max(len(b) - 2, 1))}
    return len(sa & sb) / len(sa | sb)


def generate_dedup_corpus(
    out_dir: str,
    n_docs: int = 1_000_000,
    seed: int = 42,
    num_partitions: int = 32,
    dup_source_frac: float = 0.01,
    min_len: int = 40,
    max_len: int = 120,
) -> dict:
    """Deterministic near-dup benchmark corpus with PLANTED ground truth —
    the large-scale recall/precision evidence fixture the sf0.01 oracle
    corpus (500 docs) cannot provide.

    ``n_docs`` word-soup documents (vocab 50k ⇒ accidental trigram overlap
    between independent docs is ≈ 0, so the planted pairs ARE the ≥-0.3
    Jaccard truth). ``dup_source_frac`` of docs are duplicate-family
    sources; each family plants, with probability 1/2 each:

      exact  — verbatim copy                     (J = 1)
      near   — 2–10% of words replaced           (J ≈ 0.55–0.95)
      border — ~15% of words replaced            (J ≈ 0.35–0.55, straddles 0.5)
      far    — 60% of words replaced             (J ≈ 0.05–0.15, must NOT match at 0.5)

    Every within-family pair's EXACT trigram Jaccard is computed in numpy
    at generation time and written to ``truth.parquet`` (a, b, jaccard,
    kind); family members are scattered uniformly over the whole doc_id
    range, so duplicate pairs cross file/partition boundaries like real
    crawl dups do. Layout: ``out_dir/docs/part-*.parquet`` (doc_id BIGINT,
    text VARCHAR), ``out_dir/truth.parquet``. Same arguments → identical
    corpus. Returns summary stats."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 1311]))
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)

    n_src = int(n_docs * dup_source_frac)
    lens = rng.integers(min_len, max_len + 1, size=n_docs)
    # base word-index lists; sources are the first n_src docs (scattered later)
    docs: list = [
        rng.integers(0, DEDUP_VOCAB_SIZE, size=int(L), dtype=np.int32)
        for L in lens
    ]

    variants: list = []
    kind_of: dict[int, str] = {}  # variant doc index → planted kind
    fam_members: list = []  # (source_doc_idx, [variant_doc_idx...])
    for s in range(n_src):
        base = docs[s]
        members = []
        for kind, frac in (
            ("exact", 0.0),
            ("near", None),
            ("border", 0.15),
            ("far", 0.60),
        ):
            if rng.random() < 0.5:
                continue
            w = base.copy()
            f = rng.uniform(0.02, 0.10) if frac is None else frac
            r = max(1, int(round(f * len(w)))) if kind != "exact" else 0
            if r:
                pos = rng.choice(len(w), size=r, replace=False)
                w[pos] = rng.integers(0, DEDUP_VOCAB_SIZE, size=r)
            idx = n_docs + len(variants)
            members.append(idx)
            kind_of[idx] = kind
            variants.append(w)
        if members:
            fam_members.append((s, members))

    total = n_docs + len(variants)
    # scatter: doc i lands at final doc_id perm[i], so family members are
    # spread uniformly across files/partitions
    final_id = rng.permutation(total).astype(np.int64)

    # planted truth: every within-family pair with its exact trigram Jaccard
    all_docs = docs + variants
    ta, tb, tj, tk = [], [], [], []
    for s, members in fam_members:
        fam = [s] + members
        for i in range(len(fam)):
            for j in range(i + 1, len(fam)):
                x, y = fam[i], fam[j]
                a_id, b_id = final_id[x], final_id[y]
                if a_id > b_id:
                    a_id, b_id = b_id, a_id
                ta.append(a_id)
                tb.append(b_id)
                tj.append(_trigram_jaccard(all_docs[x], all_docs[y]))
                # source↔variant pairs carry the variant's kind;
                # variant↔variant pairs are combinations ("near|far")
                tk.append(
                    kind_of[y]
                    if x == s
                    else f"{kind_of[x]}|{kind_of[y]}"
                )
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(ta, type=pa.int64()),
                pa.array(tb, type=pa.int64()),
                pa.array(tj, type=pa.float64()),
                pa.array(tk, type=pa.string()),
            ],
            names=["a", "b", "jaccard", "kind"],
        ),
        os.path.join(out_dir, "truth.parquet"),
    )

    # write docs by final_id range, one file per partition
    vocab = np.array([f"w{i:05d}" for i in range(DEDUP_VOCAB_SIZE)])
    order = np.argsort(final_id)  # doc index in final_id order
    per = total // num_partitions
    pos = 0
    for p in range(num_partitions):
        n = per + (total % num_partitions if p == num_partitions - 1 else 0)
        sel = order[pos : pos + n]
        ids = final_id[sel]
        texts = [" ".join(vocab[all_docs[i]]) for i in sel]
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string())],
                names=["doc_id", "text"],
            ),
            os.path.join(out_dir, "docs", f"part-{p}.parquet"),
            row_group_size=16384,
        )
        pos += n
    return {
        "n_docs": total,
        "n_base": n_docs,
        "n_variants": len(variants),
        "n_families": len(fam_members),
        "n_truth_pairs": len(ta),
    }


def generate_embedding_corpus(
    out_dir: str,
    n_vecs: int = 1_000_000,
    dim: int = 64,
    seed: int = 42,
    num_partitions: int = 32,
    pair_frac: float = 0.01,
    n_clusters: int = 200,
) -> dict:
    """Deterministic embedding near-dup benchmark corpus with PLANTED
    cosine ground truth — the large-scale recall evidence fixture the
    sf0.01 embeddings table (500 vectors, one real pair) cannot provide.

    ``n_vecs`` unit vectors (dim ``dim``, float32) drawn from a mixture
    of ``n_clusters`` spherical clusters (x = α·center + β·noise with
    α² = 0.45 — real embedding spaces are clustered, and IVF-style
    indexes are meaningless on a structureless uniform sphere; pass
    ``n_clusters=0`` for the uniform worst case). Within-cluster random
    pairs then sit at cosine ≈ 0.45 ± 0.07 — ≥7σ below the 0.95
    threshold, so planted truth is still the ≥0.95 truth. ``pair_frac``
    of vectors are pair sources; each gets ONE planted partner at a
    controlled cosine, kind drawn uniformly:

      tight — cosine ~ U(0.98, 0.999)  (must match at threshold 0.95)
      near  — cosine ~ U(0.95, 0.98)   (must match; hardest band)
      decoy — cosine ~ U(0.60, 0.85)   (must NOT match at 0.95)

    Partner construction: v = c·u + sqrt(1−c²)·w with w a unit vector
    orthogonal to u, so the planted cosine is exact up to float32
    rounding; ``truth.parquet`` (a, b, cosine, kind) records the EXACT
    float64 cosine of the rounded float32 vectors actually written.
    Random non-planted pairs concentrate at cosine ~ N(0, 1/dim)
    (σ ≈ 0.125 at dim 64), so nothing unplanted reaches 0.95 — planted
    truth IS the ≥ 0.95 truth. Pair members are scattered uniformly over
    the id range (cross-partition, like real dups). Layout:
    ``out_dir/vecs/part-*.parquet`` (vec_id BIGINT, embedding FLOAT[]),
    ``out_dir/truth.parquet``. Same arguments → identical corpus."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 2417]))
    os.makedirs(os.path.join(out_dir, "vecs"), exist_ok=True)

    base = rng.standard_normal((n_vecs, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    if n_clusters:
        centers = rng.standard_normal((n_clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        alpha = np.sqrt(0.45)
        cid = rng.integers(0, n_clusters, size=n_vecs)
        base = alpha * centers[cid] + np.sqrt(1 - alpha**2) * base
        base /= np.linalg.norm(base, axis=1, keepdims=True)

    n_src = int(n_vecs * pair_frac)
    kinds = rng.choice(np.array(["tight", "near", "decoy"]), size=n_src)
    lo = np.where(kinds == "tight", 0.98, np.where(kinds == "near", 0.95, 0.60))
    hi = np.where(kinds == "tight", 0.999, np.where(kinds == "near", 0.98, 0.85))
    c = rng.uniform(lo, hi)

    u = base[:n_src]
    w = rng.standard_normal((n_src, dim))
    w -= (w * u).sum(axis=1, keepdims=True) * u  # orthogonalize
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    partners = c[:, None] * u + np.sqrt(1.0 - c**2)[:, None] * w

    allv = np.concatenate([base, partners], axis=0).astype(np.float32)
    total = n_vecs + n_src
    final_id = rng.permutation(total).astype(np.int64)

    # exact truth from the float32 vectors actually written
    a64 = allv[:n_src].astype(np.float64)
    b64 = allv[n_vecs:].astype(np.float64)
    cos = (a64 * b64).sum(axis=1) / (
        np.linalg.norm(a64, axis=1) * np.linalg.norm(b64, axis=1)
    )
    ta = final_id[:n_src]
    tb = final_id[n_vecs:]
    swap = ta > tb
    ta2 = np.where(swap, tb, ta)
    tb2 = np.where(swap, ta, tb)
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(ta2, type=pa.int64()),
                pa.array(tb2, type=pa.int64()),
                pa.array(cos, type=pa.float64()),
                pa.array(kinds, type=pa.string()),
            ],
            names=["a", "b", "cosine", "kind"],
        ),
        os.path.join(out_dir, "truth.parquet"),
    )

    order = np.argsort(final_id)
    per = total // num_partitions
    pos = 0
    for p in range(num_partitions):
        n = per + (total % num_partitions if p == num_partitions - 1 else 0)
        sel = order[pos : pos + n]
        flat = allv[sel].reshape(-1)
        offsets = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
        emb = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, type=pa.float32())
        )
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array(final_id[sel], type=pa.int64()), emb],
                names=["vec_id", "embedding"],
            ),
            os.path.join(out_dir, "vecs", f"part-{p}.parquet"),
            row_group_size=16384,
        )
        pos += n
    n_match = int((cos >= 0.95).sum())
    return {
        "n_vecs": total,
        "n_pairs": n_src,
        "n_truth_ge95": n_match,
        "n_decoys": int((kinds == "decoy").sum()),
    }
