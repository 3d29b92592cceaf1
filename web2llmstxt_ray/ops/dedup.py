"""Deduplication operators for large text corpora.

The reference only deduplicates URLs via in-memory sets (SURVEY §2.9);
a 100 TB training-data pipeline needs document-level dedup. Five
operators, each shaped for Ray Data scale:

- **exact** — content-hash partition + per-group min: one shuffle of
  (hash, doc_id) pairs only, never the text.
- **MinHash + LSH** — shingle → minhash signature per batch
  (vectorized numpy) → explode to (band, band_hash) rows → groupby
  bands → candidate pairs → Jaccard verify → connected components by
  iterative min-label propagation (driver union-find only on the
  provably-small candidate set).
- **SimHash** — 64-bit signature per doc from token hashes; near-dups
  share signatures within Hamming distance k (bucketed by rotated
  prefixes at scale).
- **n-gram Jaccard** — direct pairwise verify within candidate groups.
- **embedding cosine** — near-dup pairs above a cosine threshold over
  an embedding column (brute-force within broadcast blocks; the ANN
  module provides the bucketed scale path).

All signatures are deterministic (fixed seeds, stable hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from ..functions.urls import hash64, hash64_batch

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "surrogatepass")).hexdigest()


def add_content_hash(ds: ray.data.Dataset, text_col: str = "text",
                     out_col: str = "content_hash") -> ray.data.Dataset:
    def _h(batch: pa.Table) -> pa.Table:
        hashes = [content_md5(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(hashes, pa.string()))
    return ds.map_batches(_h, batch_format="pyarrow")


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """(content_hash, doc_id=min id) per distinct content — the keeper
    per duplicate class. Only (hash, id) pairs shuffle; the text stays
    put (project before the groupby)."""
    hashed = add_content_hash(ds, text_col).select_columns(
        ["content_hash", id_col])
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def word_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the lowercased whitespace tokens — the
    shared input of :func:`shingles_from_hashes` and
    :func:`simhash_from_hashes` (hash the words ONCE per document)."""
    words = text.lower().split()
    return hash64_batch(words) if words else np.empty(0, dtype=np.uint64)


def shingles_from_hashes(hw: np.ndarray, k: int = 3) -> set[int]:
    """Word k-gram shingle hashes combined arithmetically from the word
    hashes — no gram strings are ever built (≈20× faster than hashing
    joined strings; values differ from string-hashing but shingle
    identity semantics are what matters: equal k-grams ⇔ equal hashes,
    order-sensitive within the gram)."""
    n = len(hw)
    if n == 0:
        return set()
    if n < k:
        k = n
    acc = hw[: n - k + 1].copy()
    for j in range(1, k):
        acc = acc * _SHINGLE_MIX ^ hw[j: n - k + 1 + j]
    return set(acc.tolist())


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingle hashes (stable 64-bit)."""
    return shingles_from_hashes(word_hashes(text), k)


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide minhash of a shingle set (vectorized over perms)."""
    if not sh:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p over the outer product, min over shingles
    prod = (np.multiply.outer(x % _MERSENNE, a) + b) % _MERSENNE
    return prod.min(axis=0)


def jaccard(sa: set[int], sb: set[int]) -> float:
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class _MinHasher:
    """map_batches stage: docs → exploded (band, band_hash, doc_id) rows.
    Permutation params are built once per actor."""

    def __init__(self, text_col: str, id_col: str, num_perm: int,
                 num_bands: int, shingle_k: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.num_bands = num_perm, num_bands
        self.rows_per_band = num_perm // num_bands
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingles(t or "", self.k), self.a, self.b)
            for band in range(self.num_bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                out_id.append(i)
                out_band.append(band)
                out_hash.append(hash64(seg.tobytes().hex()))
        return pa.table({
            self.id_col: pa.array(out_id),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
        })


def minhash_candidates(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       num_bands: int = 16, shingle_k: int = 3) -> list[tuple]:
    """Candidate duplicate pairs from LSH banding (before verification).

    Pipeline: minhash+explode (actor pool) → groupby(band, band_hash)
    → per-group pairs. Returns the (small) candidate pair list.
    """
    from .stagecache import cached_stage

    exploded = ds.map_batches(
        cached_stage(_MinHasher, text_col=text_col, id_col=id_col,
                     num_perm=num_perm, num_bands=num_bands,
                     shingle_k=shingle_k),
        batch_format="pyarrow", batch_size=None,
    )

    # shuffle by band-hash BUCKET (not the raw hash: grouping on the
    # high-cardinality key makes one map_groups call + 1-row block per
    # bucket) and enumerate colliding sets pandas-side per bucket
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (np.asarray(batch.column("band_hash")) % np.uint64(256)).astype(np.int32)
        return batch.append_column("_hbucket", pa.array(b))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, sub in group.groupby(["band", "band_hash"], sort=False):
            if len(sub) < 2:
                continue
            ids = sorted(sub[id_col].tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = exploded.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_hbucket").map_groups(pairs, batch_format="pandas")
    seen = set()
    for row in cand.take_all():
        seen.add((row["a"], row["b"]))
    return sorted(seen)


def minhash_dedup(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 64,
                  num_bands: int = 16, shingle_k: int = 3,
                  jaccard_threshold: float = 0.8) -> pa.Table:
    """Near-dup clustering: LSH candidates → exact Jaccard verify →
    union-find on verified pairs (candidate set is small by
    construction) → (doc_id, cluster_id=min doc in cluster, keep)."""
    cands = minhash_candidates(ds, text_col, id_col, num_perm, num_bands,
                               shingle_k)
    # verify with true shingle Jaccard — fetch only the involved docs
    involved = sorted({x for p in cands for x in p})
    id_set = set(involved)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in id_set for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    texts = {}
    for row in ds.map_batches(grab, batch_format="pyarrow").take_all():
        texts[row[id_col]] = row[text_col]
    sh = {i: shingles(texts.get(i, "") or "", shingle_k) for i in involved}
    verified = [(a, b) for a, b in cands
                if jaccard(sh[a], sh[b]) >= jaccard_threshold]

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = [r[id_col] for r in
               ds.select_columns([id_col]).take_all()]
    clusters = {i: find(i) if i in parent else i for i in all_ids}
    return pa.table({
        id_col: pa.array(sorted(all_ids)),
        "cluster_id": pa.array([clusters[i] for i in sorted(all_ids)]),
        "keep": pa.array([clusters[i] == i for i in sorted(all_ids)]),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_from_hashes(hashes: np.ndarray) -> int:
    """64-bit SimHash from precomputed token hashes: unpack all 64
    bit-planes in one shift broadcast, sum votes per plane."""
    if not len(hashes):
        return 0
    shifts = np.arange(64, dtype=np.uint64)[:, None]        # (64, 1)
    bits = ((hashes[None, :] >> shifts) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=1)                      # (64,)
    out = 0
    for bit in np.flatnonzero(votes > 0):
        out |= 1 << int(bit)
    return out


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (term-frequency
    weighted), fully vectorized."""
    return simhash_from_hashes(word_hashes(text))


def add_simhash(ds: ray.data.Dataset, text_col: str = "text",
                out_col: str = "simhash") -> ray.data.Dataset:
    def _s(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.uint64()))
    return ds.map_batches(_s, batch_format="pyarrow", batch_size=None)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (within candidate groups)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds: ray.data.Dataset, group_col: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, threshold: float = 0.5) -> pa.Table:
    """All (a, b, jaccard) pairs ≥ threshold within each ``group_col``
    partition — groupby bounds the quadratic verify to group size."""

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        shs = [shingles(t or "", k) for t in group[text_col].tolist()]
        rows = {"a": [], "b": [], "jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(shs[i], shs[j])
                if jac >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    rows["a"].append(a)
                    rows["b"].append(b)
                    rows["jaccard"].append(round(jac, 6))
        return pd.DataFrame(rows)

    out = ds.groupby(group_col).map_groups(per_group, batch_format="pandas")
    rows = out.take_all()
    return pa.table({
        "a": pa.array([r["a"] for r in rows]),
        "b": pa.array([r["b"] for r in rows]),
        "jaccard": pa.array([r["jaccard"] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(ds: ray.data.Dataset, threshold: float,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> pa.Table:
    """(a, b, cosine) pairs with cosine ≥ threshold, a < b.

    The full matrix broadcasts once (``ray.put``); each batch computes
    its block-row of similarities with one float64 matmul. At corpus
    sizes where the matrix can't broadcast, use the LSH/IVF bucketing in
    ``ops.ann`` first and verify within buckets.
    """
    all_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in all_rows])
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in all_rows])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    order = np.argsort(ids)
    ids, matn = ids[order], matn[order]
    ref = ray.put((ids, matn))

    class _Block:
        def __init__(self):
            self.ids, self.matn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .ann import vec_matrix

            bids = np.asarray(batch.column(id_col).to_pylist())
            vecs = vec_matrix(batch, vec_col)
            n = np.linalg.norm(vecs, axis=1)
            n[n == 0] = 1.0
            sims = (vecs / n[:, None]) @ self.matn.T
            rows = {"a": [], "b": [], "cosine": []}
            for i, bid in enumerate(bids):
                hits = np.flatnonzero(sims[i] >= threshold)
                for j in hits:
                    other = self.ids[j]
                    if bid < other:  # a<b once, skip self
                        rows["a"].append(int(bid))
                        rows["b"].append(int(other))
                        rows["cosine"].append(round(float(sims[i, j]), 6))
            return pa.table({"a": pa.array(rows["a"], pa.int64()),
                             "b": pa.array(rows["b"], pa.int64()),
                             "cosine": pa.array(rows["cosine"], pa.float64())})

    out = ds.map_batches(_Block, batch_format="pyarrow", batch_size=256,
                         concurrency=(1, 8), num_cpus=0.5)  # matmul state is heavy → pool ok
    rows = out.take_all()
    order = sorted(range(len(rows)), key=lambda i: (rows[i]["a"], rows[i]["b"]))
    return pa.table({
        "a": pa.array([rows[i]["a"] for i in order], pa.int64()),
        "b": pa.array([rows[i]["b"] for i in order], pa.int64()),
        "cosine": pa.array([rows[i]["cosine"] for i in order], pa.float64()),
    })
