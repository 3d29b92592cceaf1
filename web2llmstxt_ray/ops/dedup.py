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

from ..functions.urls import _SHINGLE_MIX, hash64_batch
from .textstats import tokenize_lower_hashes
from .scrub import _bloom_positions
from .sketch import HyperLogLog
from .veckit import vec_matrix

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
    put (project before the combine). Min is idempotent, so each block
    reduces to its local winners first and the survivors take ONE
    hash-bucketed shuffle (a keyed Aggregate over O(corpus) distinct
    hashes pays the sort-machinery tax for the same rows)."""
    hashed = add_content_hash(ds, text_col).select_columns(
        ["content_hash", id_col])

    def block_min(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("content_hash", as_index=False)[id_col].min()
        h = pd.util.hash_pandas_object(g["content_hash"], index=False)
        g["_hb"] = (h % 64).astype("int32")
        return g

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("content_hash", as_index=False)[id_col].min()

    return (hashed.map_batches(block_min, batch_format="pandas",
                               batch_size=None)
            .groupby("_hb").map_groups(bucket_min,
                                       batch_format="pandas"))


class _PriorHashFlagger:
    """Flag rows whose content hash appears in a broadcast prior-corpus
    digest: either an exact hash set (``mode='exact'``) or a bloom bit
    array (``mode='bloom'``, m bits / 4 salts — over-flags at the bloom
    FP rate, never under-flags: the safe direction for dedup)."""

    def __init__(self, digest_ref, mode: str, m: int = 0,
                 text_col: str = "text", id_col: str = "doc_id"):
        digest = (ray.get(digest_ref)
                  if isinstance(digest_ref, ray.ObjectRef) else digest_ref)
        self.mode = mode
        if mode == "exact":
            self.prior = digest if isinstance(digest, set) else set(digest)
        else:
            self.bits = np.unpackbits(
                np.frombuffer(digest, dtype=np.uint8)).astype(bool)[:m]
            self.m = m
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        if self.mode == "exact":
            dup = [content_md5(t) in self.prior for t in texts]
        else:
            hashes = hash64_batch([content_md5(t) for t in texts])
            pos = _bloom_positions(hashes, self.m)
            dup = self.bits[pos].all(axis=0).tolist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "is_dup": pa.array(dup, pa.bool_()),
        })


def prior_corpus_digest(prior: ray.data.Dataset, text_col: str = "text",
                        mode: str = "bloom",
                        bits_per_key: int = 16) -> tuple:
    """Digest of a prior corpus's content hashes for incremental dedup:
    ``('exact', set)`` (driver holds every md5 — only for priors known
    to fit) or ``('bloom', bits, m)`` (constant-size broadcast; FP rate
    set by ``bits_per_key``). Built distributively: each batch emits
    its hashes (exact) or a pre-sized OR-able bloom chunk; the text
    itself never reaches the driver."""

    def hashes_batch(batch: pa.Table) -> pa.Table:
        hs = [content_md5(t or "")
              for t in batch.column(text_col).to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string())})

    hs = [r["h"] for r in prior.map_batches(
        hashes_batch, batch_format="pyarrow").take_all()]
    if mode == "exact":
        return ("exact", set(hs))
    m = max(64, 1 << int(np.ceil(np.log2(max(1, len(hs)) * bits_per_key))))
    bits = np.zeros(m, dtype=bool)
    if hs:
        pos = _bloom_positions(hash64_batch(hs), m)
        bits[pos.ravel()] = True
    return ("bloom", np.packbits(bits).tobytes(), m)


def dedup_against_prior(ds: ray.data.Dataset, digest: tuple,
                        **kw) -> ray.data.Dataset:
    """Incremental dedup: (id, is_dup) flags for ``ds`` against a
    :func:`prior_corpus_digest` — the cross-run tier that no per-job
    shuffle can express (the corpus analogue of the crawl's persistent
    seen filter). Digest broadcasts once via ``ray.put``; exact mode is
    FP-free, bloom mode over-flags at the bloom rate (documented safe
    direction). Filter on ``is_dup`` or join back for auditing."""
    from .stagecache import cached_stage

    if digest[0] == "exact":
        ref = ray.put(digest[1])
        return ds.map_batches(
            cached_stage(_PriorHashFlagger, digest_ref=ref, mode="exact",
                         **kw),
            batch_format="pyarrow")
    ref = ray.put(digest[1])
    return ds.map_batches(
        cached_stage(_PriorHashFlagger, digest_ref=ref, mode="bloom",
                     m=digest[2], **kw),
        batch_format="pyarrow")


def exact_dedup_rows(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Exact dedup that KEEPS full rows: one hash-bucket shuffle of the
    rows, per-bucket vectorized min-id winner. Unlike :func:`exact_dedup`
    (which ships only (hash, id) pairs and returns winner ids), this
    variant pays one all-to-all of the row payload — the unavoidable
    cost when the deduped text itself is the product and the input
    isn't re-readable by key. Bucketing by ``hash(content) % B`` keeps
    every duplicate class in exactly one well-sized group (never the
    1-row-block-per-distinct-value pathology); winner = min ``id_col``
    per content, deterministic regardless of partitioning."""

    def add_keys(batch: pa.Table) -> pa.Table:
        hashes = [content_md5(t or "")
                  for t in batch.column(text_col).to_pylist()]
        b = _id_blocks(hashes, num_buckets)
        return batch.append_column(
            "content_hash", pa.array(hashes, pa.string())).append_column(
            "_hbucket", pa.array(b, pa.int32()))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        # pyarrow-native winner pick (same (hash, id)-sort + keep-first
        # semantics the pandas form had — the pandas round trip
        # materialized every TEXT as a Python object twice per group,
        # the dominant cost of this stage at 100k docs)
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("content_hash", "ascending"),
                              (id_col, "ascending")])
        g = group.take(idx)
        ch = g.column("content_hash").combine_chunks()
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = ~pc.equal(
                ch.slice(1), ch.slice(0, len(ch) - 1)) \
                .to_numpy(zero_copy_only=False)
        return g.filter(pa.array(first)) \
            .drop_columns(["_hbucket", "content_hash"])

    return ds.map_batches(add_keys, batch_format="pyarrow") \
        .groupby("_hbucket").map_groups(dedup_bucket, batch_format="pyarrow")


def exact_dedup_losers(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_buckets: int = 64) -> ray.data.Dataset:
    """LOSER ids of exact dedup (every id except the min per duplicate
    content class) as a Dataset of ``(id_col,)`` rows.

    The scale-preferred exact-dedup shape when the input is
    re-readable: only skinny (content_hash, id) pairs take the
    all-to-all (~40 B/row instead of the text payload), the output is
    O(duplicate docs), and the caller filters the original dataset
    map-only — broadcast the loser ids below a threshold, anti-join
    above it (the same tier pattern as the near-dup stage). Winner
    choice (min id per content) is identical to
    :func:`exact_dedup_rows`."""

    def add_keys(batch: pa.Table) -> pa.Table:
        hashes = [content_md5(t or "")
                  for t in batch.column(text_col).to_pylist()]
        b = _id_blocks(hashes, num_buckets)
        return pa.table({
            "content_hash": pa.array(hashes, pa.string()),
            id_col: batch.column(id_col),
            "_hbucket": pa.array(b, pa.int32()),
        })

    def bucket_losers(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("content_hash", "ascending"),
                              (id_col, "ascending")])
        g = group.take(idx)
        ch = g.column("content_hash").combine_chunks()
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = ~pc.equal(
                ch.slice(1), ch.slice(0, len(ch) - 1)) \
                .to_numpy(zero_copy_only=False)
        return g.filter(pa.array(~first)).select([id_col])

    return ds.map_batches(add_keys, batch_format="pyarrow") \
        .groupby("_hbucket").map_groups(bucket_losers,
                                        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b




def word_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the lowercased whitespace tokens — the
    shared input of :func:`shingles_from_hashes` and
    :func:`simhash_from_hashes` (hash the words ONCE per document)."""
    words = text.lower().split()
    return hash64_batch(words) if words else np.empty(0, dtype=np.uint64)


def shingle_hashes(hw: np.ndarray, k: int = 3) -> np.ndarray:
    """Raw word k-gram shingle hash ARRAY (duplicates included) —
    the allocation-free core of :func:`shingles_from_hashes`. Min-wise
    signatures are duplicate-insensitive, so hot paths feed this
    straight to :func:`minhash_signature` and never build the Python
    int set (measured ~4× on the fused suite's minhash stage)."""
    n = len(hw)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    acc = hw[: n - k + 1].copy()
    for j in range(1, k):
        acc = acc * _SHINGLE_MIX ^ hw[j: n - k + 1 + j]
    return acc


def shingles_from_hashes(hw: np.ndarray, k: int = 3) -> set[int]:
    """Word k-gram shingle hashes combined arithmetically from the word
    hashes — no gram strings are ever built (≈20× faster than hashing
    joined strings; values differ from string-hashing but shingle
    identity semantics are what matters: equal k-grams ⇔ equal hashes,
    order-sensitive within the gram)."""
    return set(shingle_hashes(hw, k).tolist())


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingle hashes (stable 64-bit)."""
    return shingles_from_hashes(word_hashes(text), k)


def minhash_signature(sh, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide minhash of a shingle set (vectorized over perms).
    Accepts a Python set OR a raw hash ndarray (:func:`shingle_hashes`)
    — min-wise signatures are duplicate-insensitive, so both forms
    yield identical output; the ndarray path skips set construction."""
    if isinstance(sh, np.ndarray):
        if sh.size == 0:
            return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.unique(sh)        # C-side dedup; min unaffected either way
    else:
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
        n = len(ids)
        # ONE Arrow tokenize+hash pass for the whole batch (the
        # per-doc ``word_hashes`` call paid hash64_batch's vectorized
        # setup per document — profiled at ~300 of the 400 µs/doc of
        # this stage); per-doc signature kernels then slice the flat
        # hash array (same L2-resident shape as the fused suite)
        hw_all, offs = tokenize_lower_hashes(batch.column(self.text_col))
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for r in range(n):
            sigs[r] = minhash_signature(
                shingle_hashes(hw_all[offs[r]:offs[r + 1]], self.k),
                self.a, self.b)
        # band hashes folded arithmetically over each segment's lanes
        # (equal segment ⇔ equal hash; one vector op per lane instead of
        # a per-(doc,band) hex string + Python FNV — profiled hot)
        seg = sigs.reshape(n, self.num_bands, self.rows_per_band)
        acc = seg[:, :, 0].copy()
        for j in range(1, self.rows_per_band):
            acc = acc * _SHINGLE_MIX ^ seg[:, :, j]
        return pa.table({
            self.id_col: pa.array(np.repeat(np.asarray(ids), self.num_bands)),
            "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(acc.ravel()),
        })


def minhash_candidate_pairs(ds: ray.data.Dataset, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 64,
                            num_bands: int = 16,
                            shingle_k: int = 3) -> ray.data.Dataset:
    """Candidate duplicate pairs from LSH banding, AS A DATASET —
    never collected to the driver. Pairs may repeat across bands
    (consumers like :func:`ops.graph.connected_components` are
    duplicate-tolerant; driver consumers dedupe on collect).

    Pipeline: minhash+explode (cached task stage) → bucket by
    band-hash → per-bucket colliding-set pair enumeration.
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

    return exploded.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_hbucket").map_groups(pairs, batch_format="pandas")


def minhash_candidates(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       num_bands: int = 16, shingle_k: int = 3) -> list[tuple]:
    """Driver-side deduped candidate pair LIST — a debugging /
    small-corpus convenience over :func:`minhash_candidate_pairs`
    (ids only, no texts). The verify tier no longer uses it:
    :func:`minhash_verified_pairs` keeps pairs distributed."""
    cand = minhash_candidate_pairs(ds, text_col, id_col, num_perm,
                                   num_bands, shingle_k)
    seen = set()
    for row in cand.take_all():
        seen.add((row["a"], row["b"]))
    return sorted(seen)


def minhash_clusters_scale(ds: ray.data.Dataset, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           num_bands: int = 16, shingle_k: int = 3,
                           num_buckets: int = 64) -> ray.data.Dataset:
    """Fully-distributed near-dup clustering — the 100-TB tier.

    ``minhash_candidate_pairs`` (Dataset, never on the driver) →
    ``ops.graph.connected_components`` (alternating star contraction,
    O(log n) bucketed shuffles) → (node, component) labels. NOTHING
    corpus-sized ever reaches the driver. Unlike :func:`minhash_dedup`
    there is no exact-verify pass at all — banding precision only.

    Semantics note: precision comes from the banding parameters alone
    (collision P ≈ J^(num_perm/num_bands) per band) — there is no
    exact-verify pass, the standard trade at web scale (NeMo-Curator /
    BigQuery-dedup style). With defaults (64 perm, 16 bands) docs at
    Jaccard 0.8 band-collide with P≈0.41 per band (≥1-of-16 P≈0.9998)
    while J=0.3 pairs are ≈1-in-125k per band. Returns one row per
    doc involved in any candidate pair; absent docs are singletons.
    """
    pairs = minhash_candidate_pairs(ds, text_col, id_col, num_perm,
                                    num_bands, shingle_k)
    from .graph import connected_components
    return connected_components(pairs, "a", "b", num_buckets=num_buckets)


def minhash_verified_pairs(ds: ray.data.Dataset, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           num_bands: int = 16, shingle_k: int = 3,
                           jaccard_threshold: float = 0.8,
                           num_buckets: int = 64) -> ray.data.Dataset:
    """LSH candidates → exact word-shingle Jaccard verify, fully
    distributed — the verified-precision analogue of
    :func:`minhash_candidate_pairs`.

    Shape: candidate (a, b) id pairs stay a Dataset; a two-stage
    bucketed exchange attaches both texts — stage 1 co-locates
    exploded (pair, role) rows with (id, text) rows on an id-hash
    bucket (corpus texts shuffle ONCE, cross-band duplicate pairs
    dedupe in the same group), stage 2 regroups the 2 text-bearing
    rows per pair on a pair-hash bucket and runs the exact-Jaccard
    verify fused in the group kernel. Returns verified (a, b) rows
    with exact Jaccard ≥ ``jaccard_threshold``. NOTHING corpus-sized
    — and in particular no candidate text — ever reaches the driver.
    """
    # materialize the skinny id-pair set (object-store-resident, never
    # driver-side): its count sizes every downstream shuffle, it is
    # consumed twice by the bucketed joins, and an empty candidate set
    # has no schema to join on
    cand = minhash_candidate_pairs(ds, text_col, id_col, num_perm,
                                   num_bands, shingle_k).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    # adaptive shuffle width: bucket count is task count, and tiny pair
    # sets pay pure scheduling overhead per task — 8 buckets until the
    # pair set is big enough for width to matter
    nb = num_buckets if n_pairs > 200_000 else min(num_buckets, 8)

    def verify_group(group: pd.DataFrame) -> pd.DataFrame:
        sh_cache: dict = {}

        def sh(i, t):
            s = sh_cache.get(i)
            if s is None:
                s = shingles(t or "", shingle_k)
                sh_cache[i] = s
            return s

        out_a, out_b = [], []
        for (a, b), sub in group.groupby(["a", "b"], sort=False):
            by_role = dict(zip(sub["_role"], sub["_vt"]))
            if len(by_role) < 2:
                continue          # a side's text vanished mid-pipeline
            if jaccard(sh(a, by_role["a"]),
                       sh(b, by_role["b"])) >= jaccard_threshold:
                out_a.append(int(a))
                out_b.append(int(b))
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    # SMALL-PAIR TIER (the common near-dup case: pairs ≪ corpus).
    # Shuffling every text through a full exchange wastes the whole
    # corpus's bandwidth on rows that die immediately, and each extra
    # groupby costs seconds of fixed scheduling latency. Instead the
    # deduped pair set broadcasts as an id→[(a, b, role)] map (ids
    # only — the same broadcast class as the loser-id set), involved
    # texts are filtered map-only (arrow is_in) and re-blocked narrow,
    # each text row expands map-only to its (pair, role, text) rows,
    # and ONE pair-bucket groupby runs the fused exact-Jaccard verify.
    # Texts never reach the driver in either tier.
    if n_pairs <= 2_000_000:
        # to_pandas, NOT take_all: on a materialized dataset take_all
        # launches a fresh streaming execution (~3-4 s of pure
        # overhead at 32 CPUs); to_pandas reads the blocks directly
        cdf = cand.to_pandas().drop_duplicates()
        inv_arr = pa.array(np.unique(np.concatenate(
            [cdf["a"].to_numpy(), cdf["b"].to_numpy()])))
        roles: dict = {}
        for a, b in zip(cdf["a"].tolist(), cdf["b"].tolist()):
            roles.setdefault(a, []).append((a, b, "a"))
            roles.setdefault(b, []).append((a, b, "b"))
        inv_ref = ray.put(inv_arr)
        roles_ref = ray.put(roles)

        class AttachRoles:
            """Filter to involved rows, expand each to its pair-role
            rows with the text attached — all map-only."""

            def __init__(self, iref, rref):
                self.ids = ray.get(iref)
                self.roles: dict = ray.get(rref)

            def __call__(self, batch: pa.Table) -> pd.DataFrame:
                import pyarrow.compute as pc

                sub = batch.filter(
                    pc.is_in(batch.column(id_col), value_set=self.ids))
                out_a, out_b, out_r, out_t = [], [], [], []
                for i, t in zip(sub.column(id_col).to_pylist(),
                                sub.column(text_col).to_pylist()):
                    for a, b, role in self.roles.get(i, ()):
                        out_a.append(a)
                        out_b.append(b)
                        out_r.append(role)
                        out_t.append(t)
                df = pd.DataFrame({
                    "a": pd.Series(out_a, dtype="int64"),
                    "b": pd.Series(out_b, dtype="int64"),
                    "_role": pd.Series(out_r, dtype="object"),
                    "_vt": pd.Series(out_t, dtype="object")})
                pb = ((df["a"].to_numpy(np.int64).astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15))
                      ^ df["b"].to_numpy(np.int64).astype(np.uint64))
                df["_pb"] = (pb % np.uint64(nb)).astype("int32")
                return df

        from .stagecache import cached_stage

        role_rows = ds.select_columns([id_col, text_col]).map_batches(
            cached_stage(AttachRoles, iref=inv_ref, rref=roles_ref),
            batch_format="pyarrow", batch_size=None).repartition(nb)
        return role_rows.groupby("_pb").map_groups(
            verify_group, batch_format="pandas")

    # LARGE-PAIR TIER — two-stage exchange, corpus texts move
    # EXACTLY ONCE:
    #   stage 1 — pairs explode to one row per (pair, role∈{a,b})
    #   keyed by that role's doc id; union with (id, text) rows and
    #   group by id-bucket, where duplicate pairs (the same pair
    #   surfaces from several bands) dedupe for free — same pair ⇒
    #   same role-key ⇒ same bucket — and each role row picks up its
    #   text. Texts of docs in no candidate pair die here.
    #   stage 2 — regroup the (pair, role, text) rows by pair-hash
    #   bucket (2 text-bearing rows per pair, bounded by pair count,
    #   NOT corpus size) and run the exact-Jaccard verify fused into
    #   the same map_groups.
    cols = ["k", "a", "b", "_role", "_vt"]

    def explode_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].astype("int64")
        b = batch["b"].astype("int64")
        out = pd.DataFrame({
            "k": pd.concat([a, b], ignore_index=True),
            "a": pd.concat([a, a], ignore_index=True),
            "b": pd.concat([b, b], ignore_index=True),
            "_role": ["a"] * len(a) + ["b"] * len(b),
            "_vt": None,
        })
        out["_kb"] = (out["k"] % nb).astype("int32")
        return out

    def tag_texts(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "k": batch[id_col].astype("int64"),
            "a": np.int64(-1), "b": np.int64(-1),
            "_role": "t", "_vt": batch[text_col],
        })
        out["_kb"] = (out["k"] % nb).astype("int32")
        return out

    unioned = cand.map_batches(explode_pairs, batch_format="pandas",
                               batch_size=None).union(
        ds.select_columns([id_col, text_col]).map_batches(
            tag_texts, batch_format="pandas", batch_size=None))

    def attach(group: pd.DataFrame) -> pd.DataFrame:
        roles = group.loc[group["_role"] != "t",
                          ["k", "a", "b", "_role"]].drop_duplicates()
        texts = group.loc[group["_role"] == "t", ["k", "_vt"]]
        if roles.empty or texts.empty:
            return pd.DataFrame(columns=cols).astype(
                {"k": "int64", "a": "int64", "b": "int64"})
        out = roles.merge(texts.drop_duplicates("k"), on="k", how="inner")
        return out[cols]

    attached = unioned.groupby("_kb").map_groups(attach,
                                                 batch_format="pandas")

    def pair_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        pb = ((batch["a"].to_numpy(np.int64).astype(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15))
              ^ batch["b"].to_numpy(np.int64).astype(np.uint64))
        batch["_pb"] = (pb % np.uint64(nb)).astype(np.int32)
        return batch

    return attached.map_batches(pair_bucket, batch_format="pandas",
                                batch_size=None) \
        .groupby("_pb").map_groups(verify_group, batch_format="pandas")


def minhash_components_verified(ds: ray.data.Dataset,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                num_perm: int = 64, num_bands: int = 16,
                                shingle_k: int = 3,
                                jaccard_threshold: float = 0.8,
                                num_buckets: int = 64) -> ray.data.Dataset:
    """Verified near-dup clusters at full distribution: exact-verified
    pairs (:func:`minhash_verified_pairs`) → alternating-star connected
    components. Returns (node, component) with component = the min doc
    id of the cluster — identical labels to min-preference union-find,
    without the driver ever seeing an edge or a text. Docs in no
    verified pair are absent (singletons by definition)."""
    from .graph import connected_components

    verified = minhash_verified_pairs(ds, text_col, id_col, num_perm,
                                      num_bands, shingle_k,
                                      jaccard_threshold, num_buckets)
    return connected_components(verified, "a", "b",
                                num_buckets=num_buckets)


def minhash_losers_ds(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      num_bands: int = 16, shingle_k: int = 3,
                      jaccard_threshold: float = 0.8,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Near-dup cluster LOSERS as a Dataset of ``(id_col,)`` rows —
    the anti-join side for filtering pipelines that can't broadcast
    the loser set (O(dup-fraction × corpus) ids at 100 TB)."""
    comp = minhash_components_verified(ds, text_col, id_col, num_perm,
                                       num_bands, shingle_k,
                                       jaccard_threshold, num_buckets)

    def losers_only(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("node"), dtype=np.int64)
        root = np.asarray(batch.column("component"), dtype=np.int64)
        return pa.table({id_col: pa.array(node[node != root])})

    return comp.map_batches(losers_only, batch_format="pyarrow")


class _ClusterEmit:
    """Distributed cluster emission: the (small) verified-pair parent
    map broadcasts once per worker; each batch is a vectorized probe —
    the dataset itself never materializes on the driver."""

    def __init__(self, pref, id_col: str):
        self.parent: dict = ray.get(pref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        p = self.parent
        clusters = [p.get(i, i) for i in ids]
        keep = [c == i for c, i in zip(clusters, ids)]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "cluster_id": pa.array(clusters),
            "keep": pa.array(keep, pa.bool_()),
        })


def minhash_dedup(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 64,
                  num_bands: int = 16, shingle_k: int = 3,
                  jaccard_threshold: float = 0.8) -> ray.data.Dataset:
    """Near-dup clustering: distributed LSH + exact-Jaccard verify
    (:func:`minhash_verified_pairs`) → distributed connected components
    → broadcast the skinny {id: root} map → distributed
    (doc_id, cluster_id, keep) emission via ``map_batches``.

    Scale shape: the only driver state is the (node, component) id map
    for docs in some verified cluster — O(dup docs) ints, no candidate
    pairs and no texts. The full corpus streams through the final
    emission stage without materializing.
    """
    from .stagecache import cached_stage

    root_map = _verified_root_map(ds, text_col, id_col, num_perm,
                                  num_bands, shingle_k, jaccard_threshold)
    pref = ray.put(root_map)
    return ds.select_columns([id_col]).map_batches(
        cached_stage(_ClusterEmit, pref=pref, id_col=id_col),
        batch_format="pyarrow")


def _verified_root_map(ds, text_col, id_col, num_perm, num_bands,
                       shingle_k, jaccard_threshold) -> dict:
    """Flat {id: cluster-root} map covering ONLY ids in some verified
    cluster. Computed entirely distributed
    (:func:`minhash_components_verified`); the driver collects just the
    skinny (node, component) id rows — O(dup docs) ints, never a
    candidate pair list and never a text (the round-2 weak tier)."""
    comp = minhash_components_verified(ds, text_col, id_col, num_perm,
                                       num_bands, shingle_k,
                                       jaccard_threshold).to_pandas()
    if "node" not in comp.columns:       # empty → schema-less frame
        return {}
    return dict(zip(comp["node"].tolist(), comp["component"].tolist()))


def minhash_losers(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id", num_perm: int = 64,
                   num_bands: int = 16, shingle_k: int = 3,
                   jaccard_threshold: float = 0.8) -> list:
    """Sorted ids of near-dup cluster LOSERS (everything but each
    cluster's min-id root) — the drop set a filtering pipeline
    broadcasts. Computed by the distributed verify tier; the driver
    holds O(losers) ids only. For corpora whose loser set itself can't
    broadcast, use :func:`minhash_losers_ds` and anti-join instead."""
    root_map = _verified_root_map(ds, text_col, id_col, num_perm,
                                  num_bands, shingle_k, jaccard_threshold)
    return sorted(x for x, r in root_map.items() if x != r)


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


def simhash_near_dup_pairs(ds: ray.data.Dataset, max_hamming: int = 3,
                           text_col: str = "text", id_col: str = "doc_id",
                           num_buckets: int = 256,
                           as_dataset: bool = False
                           ) -> "pa.Table | ray.data.Dataset":
    """All (a, b, hamming) pairs with SimHash Hamming distance ≤
    ``max_hamming`` — the signature-only near-dup tier (no shingle
    sets, no text comparison; catches heavy token overlap).

    Scale shape (the classic pigeonhole search): split each 64-bit
    signature into ``B = max_hamming + 1`` blocks — any pair within
    distance ``max_hamming`` agrees EXACTLY on at least one block — and
    shuffle (block_idx, block_value, id, sig) rows grouped by
    ``hash(block key) % num_buckets`` (bucketed: the raw key space is
    ~B·2^16 mostly-singleton groups, the 1-row-block pathology).
    Within a bucket one pandas groupby enumerates each exact-block
    collision set; the full signatures ride along so the Hamming
    verify is inline and exact. A pair can collide on several blocks
    (different buckets), so the (small, near-dup) pair list dedupes on
    the driver. Only (id, 4×uint16, sig) rows ever shuffle.
    """
    B = max_hamming + 1
    # any B-way partition of the 64 bits works for the pigeonhole;
    # linspace gives near-even widths for every B
    bounds = np.linspace(0, 64, B + 1, dtype=np.int64)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = np.array([simhash64(t or "")
                         for t in batch.column(text_col).to_pylist()],
                        dtype=np.uint64)
        out = {"_bkt": [], id_col: [], "_sig": []}
        n = len(ids)
        for bi in range(B):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            width = hi - lo
            key = (sigs >> np.uint64(lo)) & np.uint64((1 << width) - 1)
            # bucket on (block index, block value)
            mixed = HyperLogLog._fmix64(
                key ^ (np.uint64(bi) * np.uint64(0x9E3779B97F4A7C15)))
            bkt = (mixed % np.uint64(num_buckets)).astype(np.int32)
            # carry the exact block key for in-bucket grouping
            out["_bkt"].extend(
                (int(b) * (1 << 20) + bi for b in bkt))  # disambiguate bi
            out[id_col].extend(ids)
            out["_sig"].extend(int(s) for s in sigs)
        t = pa.table({
            "_bkt": pa.array(out["_bkt"], pa.int64()),
            id_col: pa.array(out[id_col]),
            "_sig": pa.array(out["_sig"], pa.uint64()),
            "_key": pa.array(
                np.concatenate([
                    ((sigs >> np.uint64(int(bounds[bi])))
                     & np.uint64((1 << int(bounds[bi + 1] - bounds[bi])) - 1)
                     ).astype(np.uint64)
                    for bi in range(B)]) if n else
                np.empty(0, dtype=np.uint64)),
        })
        return t

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, sub in group.groupby("_key", sort=False):
            if len(sub) < 2:
                continue
            ids = sub[id_col].to_numpy()
            sigs = sub["_sig"].to_numpy(dtype=np.uint64)
            order = np.argsort(ids)
            ids, sigs = ids[order], sigs[order]
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    if ids[x] == ids[y]:
                        continue
                    h = int(bin(int(sigs[x]) ^ int(sigs[y])).count("1"))
                    if h <= max_hamming:
                        out_a.append(ids[x])
                        out_b.append(ids[y])
                        out_h.append(h)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    cand = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(pairs, batch_format="pandas")
    if as_dataset:
        # a pair can collide on several pigeonhole blocks → one skinny
        # pair-hash shuffle dedupes distributed (hamming is a pure
        # function of the pair, so any duplicate row carries the same
        # value); the result never touches the driver
        def add_pb(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            pb = pd.util.hash_pandas_object(batch[["a", "b"]],
                                            index=False).to_numpy()
            batch["_pb"] = (pb % np.uint64(64)).astype(np.int32)
            return batch

        def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
            return group[["a", "b", "hamming"]].drop_duplicates(
                subset=["a", "b"])

        return cand.map_batches(add_pb, batch_format="pandas",
                                batch_size=None) \
            .groupby("_pb").map_groups(dedup_pairs,
                                       batch_format="pandas")
    seen: dict = {}
    for row in cand.take_all():
        seen[(row["a"], row["b"])] = row["hamming"]
    return pa.table({
        "a": pa.array([k[0] for k in sorted(seen)]),
        "b": pa.array([k[1] for k in sorted(seen)]),
        "hamming": pa.array([seen[k] for k in sorted(seen)], pa.int32()),
    })


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (within candidate groups)
# ---------------------------------------------------------------------------


_FIB_MIX = np.uint64(0x9E3779B97F4A7C15)


def _id_blocks(ids: list, num_blocks: int) -> np.ndarray:
    """Deterministic block id per doc id (Fibonacci-mix for ints,
    FNV for strings) — vectorized."""
    arr = np.asarray(ids)
    if np.issubdtype(arr.dtype, np.integer):
        return ((arr.astype(np.uint64) * _FIB_MIX) >> np.uint64(56)).astype(
            np.int32) % np.int32(num_blocks)
    return (hash64_batch([str(x) for x in ids])
            % np.uint64(num_blocks)).astype(np.int32)


def ngram_jaccard_pairs(ds: ray.data.Dataset, group_col: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, threshold: float = 0.5,
                        num_blocks: int = 4, as_dataset: bool = False
                        ) -> "pa.Table | ray.data.Dataset":
    """All (a, b, jaccard) pairs ≥ threshold within each ``group_col``
    partition — EXACT, with the quadratic verify distributed.

    Grouping by the raw value alone is a scale hazard when the key is
    skewed (e.g. one language ≈ the whole corpus → one O(n²) task).
    Instead each doc is assigned a block ``b = hash(id) % num_blocks``
    and replicated to every block-pair task ``(p, q), p ≤ q`` touching
    ``b``; one ``groupby(group, task)`` shuffle then verifies each
    block pair independently (cross pairs for p<q, i<j within for
    p==q), so per-task work is (n/B)² and a skewed group fans out over
    B(B+1)/2 tasks instead of one. Replication cost: each doc's
    shingle set ships B times (shingles — not text — are what shuffle).

    Every unordered pair lands in exactly ONE task (the (block_a,
    block_b) task), so the output is duplicate-free by construction
    and equal to the single-task result. Pairs output is assumed small
    (it's a report of near-dups); it collects to one Arrow table.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        groups = batch.column(group_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        blocks = _id_blocks(ids, num_blocks)
        out = {"_gtask": [], "_block": [], id_col: [], "_sh": []}
        for i, (did, grp, txt) in enumerate(zip(ids, groups, texts)):
            sh = np.fromiter(shingles(txt or "", k), dtype=np.uint64)
            sh.sort()
            b = int(blocks[i])
            for other in range(num_blocks):
                p, q = min(b, other), max(b, other)
                out["_gtask"].append(f"{grp}\x00{p}:{q}")
                out["_block"].append(b)
                out[id_col].append(did)
                out["_sh"].append(sh)
        return pa.table({
            "_gtask": pa.array(out["_gtask"], pa.string()),
            "_block": pa.array(out["_block"], pa.int32()),
            id_col: pa.array(out[id_col]),
            "_sh": pa.array([s.tolist() for s in out["_sh"]],
                            pa.list_(pa.uint64())),
        })

    def verify_task(group: pd.DataFrame) -> pd.DataFrame:
        task = group["_gtask"].iloc[0]
        p, q = (int(x) for x in task.rsplit("\x00", 1)[1].split(":"))
        rows = {"a": [], "b": [], "jaccard": []}

        def emit(ia, sa, ib, sb):
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                a, b = sorted((ia, ib))
                rows["a"].append(a)
                rows["b"].append(b)
                # raw double: both the engine and the SQL twin divide
                # the same two integers — bit-identical, no rounding
                rows["jaccard"].append(jac)

        ids = group[id_col].to_numpy()
        shs = [np.asarray(s, dtype=np.uint64) for s in group["_sh"]]
        blk = group["_block"].to_numpy()
        if p == q:
            order = np.argsort(ids)
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    emit(ids[order[x]], shs[order[x]],
                         ids[order[y]], shs[order[y]])
        else:
            left = np.flatnonzero(blk == p)
            right = np.flatnonzero(blk == q)
            for x in left:
                for y in right:
                    emit(ids[x], shs[x], ids[y], shs[y])
        return pd.DataFrame(rows)

    out = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("_gtask").map_groups(verify_task, batch_format="pandas")
    if as_dataset:
        # duplicate-free by construction (each unordered pair has one
        # task) — stays distributed for write-through consumers
        return out
    rows = out.take_all()
    return pa.table({
        "a": pa.array([r["a"] for r in rows]),
        "b": pa.array([r["b"] for r in rows]),
        "jaccard": pa.array([r["jaccard"] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _norm_block(tbl: pa.Table, id_col: str, vec_col: str):
    """(ids, L2-normalized f64 matrix, f32 copy) from one Arrow block.
    The f32 copy drives the candidate scan (~2-4× the f64 GEMM rate on
    this BLAS); the f64 matrix is the exactness source of truth."""
    ids = np.asarray(tbl.column(id_col).to_pylist())
    mat = vec_matrix(tbl, vec_col)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    mat = mat / n[:, None]
    return ids, mat, mat.astype(np.float32)


# float32 unit-dot error bound for d ≤ ~4096: |f32 − f64| ≤ d·eps32·u
# with plenty of slack at 1e-4; candidates are over-collected by the
# margin and re-verified in f64, so output equals the pure-f64 path.
_F32_MARGIN = 1e-4


def _emit_pairs(ids_a, mat_a, ids_b, mat_b, threshold: float,
                same_block: bool, row_chunk: int = 1024,
                mat_a32=None, mat_b32=None) -> dict:
    """cosine ≥ threshold pairs between two normalized blocks (i<j
    within a block when ``same_block``), a<b normalized once.

    Two-phase: a float32 GEMM scans for candidates at ``threshold −
    margin`` (slabbed so a large block never materializes an O(n²)
    matrix), then the few candidates are re-dotted in float64 and
    thresholded exactly — identical output to a full-f64 scan at
    roughly half the cost."""
    a32 = mat_a32 if mat_a32 is not None else mat_a.astype(np.float32)
    b32 = mat_b32 if mat_b32 is not None else mat_b.astype(np.float32)
    out_a, out_b, out_c = [], [], []
    for s in range(0, len(ids_a), row_chunk):
        sims = a32[s:s + row_chunk] @ b32.T          # (chunk, |B|) f32
        ii, jj = np.nonzero(sims >= threshold - _F32_MARGIN)
        if same_block:
            keep = jj > (ii + s)                      # strict upper triangle
            ii, jj = ii[keep], jj[keep]
        if not len(ii):
            continue
        # exact f64 re-verify of the candidate pairs only
        cos = np.einsum("ij,ij->i", mat_a[ii + s], mat_b[jj])
        keep = cos >= threshold
        ii, jj, cos = ii[keep], jj[keep], cos[keep]
        if not len(ii):
            continue
        a = ids_a[ii + s]
        b = ids_b[jj]
        swap = a > b
        out_a.append(np.where(swap, b, a))
        out_b.append(np.where(swap, a, b))
        # RAW f64 cosine: rounding here would manufacture exact
        # half-way values that a SECOND rounding downstream (engine
        # pandas vs DuckDB) resolves differently — consumers round
        # once, from raw (bit the sf0.1 oracle at 3 pairs)
        out_c.append(cos)
    if not out_a:
        empty = np.empty(0)
        return {"a": empty.astype(np.int64), "b": empty.astype(np.int64),
                "cosine": empty}
    return {"a": np.concatenate(out_a).astype(np.int64),
            "b": np.concatenate(out_b).astype(np.int64),
            "cosine": np.concatenate(out_c)}


class _BlockPairVerify:
    """Actor-pool stage over (i, j) block-index rows: fetch the two
    blocks from the object store (local shared memory on colocated
    nodes), normalize once per worker (memoized), matmul, emit pairs."""

    MAX_CACHED_BLOCKS = 8  # bound worker heap: ≥ 2 × batch_size pairs

    def __init__(self, refs_ref, threshold: float, id_col: str,
                 vec_col: str):
        self.refs = ray.get(refs_ref)
        self.threshold = threshold
        self.id_col, self.vec_col = id_col, vec_col
        self._cache: dict[int, tuple] = {}  # LRU via dict insertion order

    def _block(self, i: int):
        hit = self._cache.pop(i, None)
        if hit is None:
            hit = _norm_block(ray.get(self.refs[i]),
                              self.id_col, self.vec_col)
            while len(self._cache) >= self.MAX_CACHED_BLOCKS:
                self._cache.pop(next(iter(self._cache)))
        self._cache[i] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = {"a": [], "b": [], "cosine": []}
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ids_a, mat_a, a32 = self._block(i)
            ids_b, mat_b, b32 = self._block(j)
            if not len(ids_a) or not len(ids_b):
                continue
            pairs = _emit_pairs(ids_a, mat_a, ids_b, mat_b,
                                self.threshold, same_block=(i == j),
                                mat_a32=a32, mat_b32=b32)
            outs["a"].append(pairs["a"])
            outs["b"].append(pairs["b"])
            outs["cosine"].append(pairs["cosine"])
        if not outs["a"]:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "a": pa.array(np.concatenate(outs["a"])),
            "b": pa.array(np.concatenate(outs["b"])),
            "cosine": pa.array(np.concatenate(outs["cosine"])),
        })


def embedding_near_dup_pairs(ds: ray.data.Dataset, threshold: float,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             max_blocks: int = 32) -> pa.Table:
    """EXACT (a, b, cosine) pairs with cosine ≥ threshold, a < b —
    distributed block-pair verification, no driver-side matrix.

    The corpus materializes as Arrow blocks in the OBJECT STORE (never
    the driver heap); a tiny Dataset of (i, j) block-index pairs,
    i ≤ j, drives an actor pool that pulls the two blocks per task
    (zero-copy locally, spillable), normalizes each block once per
    worker (memoized), and emits its pairs from one matmul. Every
    unordered pair lands in exactly one block-pair task → exact and
    duplicate-free. Per-task memory is two blocks; compute is the
    inherent O(N²·d/ B²) per task over B(B+1)/2 tasks.

    Exact all-pairs is inherently quadratic — for 10^9-vector corpora
    use :func:`embedding_near_dup_pairs_ivf` (IVF-bucketed, approximate
    recall, linear-ish) instead; this function is the threshold-exact
    semantics the SQL oracle checks.
    """
    slim = ds.select_columns([id_col, vec_col])
    refs = slim.to_arrow_refs()
    if len(refs) > max_blocks:
        refs = slim.repartition(max_blocks).to_arrow_refs()
    nb = len(refs)
    refs_ref = ray.put(refs)
    pair_rows = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    from .stagecache import cached_stage

    pairs_ds = ray.data.from_items(pair_rows).repartition(
        min(len(pair_rows), 32))
    out = pairs_ds.map_batches(
        cached_stage(_BlockPairVerify, refs_ref=refs_ref,
                     threshold=threshold, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4)
    rows = out.take_all()
    order = sorted(range(len(rows)), key=lambda i: (rows[i]["a"], rows[i]["b"]))
    return pa.table({
        "a": pa.array([rows[i]["a"] for i in order], pa.int64()),
        "b": pa.array([rows[i]["b"] for i in order], pa.int64()),
        "cosine": pa.array([rows[i]["cosine"] for i in order], pa.float64()),
    })


def embedding_near_dup_pairs_ivf(
        ds: ray.data.Dataset, threshold: float,
        vec_col: str = "embedding", id_col: str = "vec_id",
        num_lists: int = 16, assign_probes: int = 2,
        sample_size: int = 2048) -> pa.Table:
    """APPROXIMATE near-dup pairs via IVF bucketing — the linear-ish
    scale path for corpora where all-pairs verification is infeasible.

    Every vector is multi-assigned to its ``assign_probes`` nearest
    k-means centroids (recall knob: two near-dups land in a shared
    list whenever any of their probe sets intersect — multi-probe makes
    boundary misses rare); one ``groupby(ivf_list)`` shuffle co-locates
    each list; pairs verify within lists with the same matmul kernel;
    duplicates from shared multi-assignments dedupe in the final
    groupby. Misses are possible (measured recall vs the exact path is
    pytest-gated in tests/test_dedup.py).
    """
    from .ann import train_centroids, vec_matrix

    sample = np.array([r[vec_col] for r in ds.take(sample_size)],
                      dtype=np.float64)
    centroids = train_centroids(sample, num_lists=min(num_lists, len(sample)))
    cref = ray.put(_normalize_rows(centroids))

    def multi_assign(batch: pa.Table) -> pa.Table:
        # plain task fn: ray.get of the small centroid matrix is a
        # local plasma hit per batch — no stage-cache key collisions
        # between invocations with different centroids
        cn = ray.get(cref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        mat = vec_matrix(batch, vec_col)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        matn = mat / n[:, None]
        sims = matn @ cn.T
        if assign_probes == 1:
            nearest = np.argmax(sims, axis=1)[:, None]
        else:
            nearest = np.argpartition(-sims, assign_probes - 1,
                                      axis=1)[:, :assign_probes]
        # fully vectorized explode: ids/vectors repeated per probe, the
        # normalized vectors shipped as a fixed-size-list column (no
        # per-row Python lists)
        reps = nearest.shape[1]
        flat = np.repeat(matn, reps, axis=0).ravel()
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), matn.shape[1])
        return pa.table({
            id_col: pa.array(np.repeat(ids, reps).astype(np.int64)),
            "ivf_list": pa.array(nearest.ravel().astype(np.int32)),
            "_vecn": vec_arr,
        })

    def verify_list(group: pa.Table) -> pa.Table:
        # zero-copy: fixed-size-list values buffer → (n, dim) matrix;
        # np.unique dedupes multi-assigned ids (sorted, first index)
        ids = np.asarray(group.column(id_col))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        arr = group.column("_vecn").combine_chunks()
        dim = arr.type.list_size
        mat = arr.values.to_numpy(zero_copy_only=False).reshape(len(ids), dim)
        uniq, first = np.unique(ids, return_index=True)
        mat = np.ascontiguousarray(mat[first])
        pairs = _emit_pairs(uniq, mat, uniq, mat, threshold, same_block=True)
        return pa.table({"a": pa.array(pairs["a"]),
                         "b": pa.array(pairs["b"]),
                         "cosine": pa.array(pairs["cosine"], pa.float64())})

    exploded = ds.map_batches(multi_assign, batch_format="pyarrow")
    pairs = exploded.groupby("ivf_list").map_groups(
        verify_list, batch_format="pyarrow")
    # multi-assignment can emit the same pair from ≥2 shared lists
    rows = {(r["a"], r["b"]): r["cosine"] for r in pairs.take_all()}
    keys = sorted(rows)
    return pa.table({
        "a": pa.array([k[0] for k in keys], pa.int64()),
        "b": pa.array([k[1] for k in keys], pa.int64()),
        "cosine": pa.array([rows[k] for k in keys], pa.float64()),
    })


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def _union_find_components(ids: np.ndarray, pa_: np.ndarray,
                           pb_: np.ndarray) -> np.ndarray:
    """Component root (min member id) per id, given edge lists — plain
    union-find over a bounded (per-cluster) id set."""
    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pa_.tolist(), pb_.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.asarray([find(int(i)) for i in ids], dtype=np.int64)


def semantic_dedup(ds: ray.data.Dataset, threshold: float = 0.95,
                   k: int = 16, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   kmeans_iters: int = 5) -> ray.data.Dataset:
    """SemDeDup (Abbas et al., arXiv:2303.09540): embedding-level
    semantic deduplication. K-means partitions the corpus; within each
    cluster, pairs with cosine ≥ ``threshold`` form duplicate groups
    (connected components of the similarity graph — exact within the
    cluster); each group KEEPS exactly one member — per the paper, the
    one with the LOWEST cosine similarity to the cluster centroid
    (diversity-preserving choice), ties broken by min id.

    Scale shape: one shuffle-free k-means fit (:func:`ops.ann.kmeans_fit`
    — per-batch partial sums, broadcast centroids), one
    ``groupby(cluster)`` shuffle of (id, vector) rows, then per-cluster
    work is O(n_c²·d) via the slabbed f32-scan/f64-verify GEMM kernel
    shared with :func:`embedding_near_dup_pairs`. Size ``k``
    proportionally to the corpus (n_c ≈ N/k bounded ⇒ near-linear
    total work — the paper runs k=50k at 100M scale). Duplicates
    across cluster boundaries are missed by construction (the paper's
    documented trade).

    Returns (id, sem_cluster, dup_group, keep): ``dup_group`` is the
    min member id of the duplicate component (== own id for uniques),
    ``keep`` marks the retained member.
    """
    from .ann import kmeans_assign, kmeans_fit

    ds = ds.materialize()
    centroids, _info = kmeans_fit(ds, k, vec_col=vec_col,
                                  iters=kmeans_iters)
    assigned = kmeans_assign(ds.select_columns([id_col, vec_col]),
                             centroids, vec_col=vec_col,
                             out_col="sem_cluster")
    cref = ray.put(_normalize_rows(np.asarray(centroids, dtype=np.float64)))

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        cid = int(group.column("sem_cluster")[0].as_py())
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "sem_cluster": pa.array([], pa.int32()),
            "dup_group": pa.array([], pa.int64()),
            "keep": pa.array([], pa.bool_()),
        })
        if not len(ids):
            return empty
        mat = _normalize_rows(vec_matrix(group, vec_col))
        order = np.argsort(ids)
        ids, mat = ids[order], np.ascontiguousarray(mat[order])
        pairs = _emit_pairs(ids, mat, ids, mat, threshold, same_block=True)
        roots = _union_find_components(ids, pairs["a"], pairs["b"])
        # keeper per group: LOWEST cosine to the cluster centroid
        # (paper's rule), ties → min id (ids sorted ⇒ stable argmin)
        cent = ray.get(cref)[cid]
        cos_c = mat @ cent
        keep = np.zeros(len(ids), dtype=bool)
        for root in np.unique(roots):
            members = np.flatnonzero(roots == root)
            keep[members[np.argmin(cos_c[members])]] = True
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sem_cluster": pa.array(np.full(len(ids), cid, dtype=np.int32)),
            "dup_group": pa.array(roots, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return assigned.groupby("sem_cluster").map_groups(
        dedup_cluster, batch_format="pyarrow")


def segment_dedup(ds: ray.data.Dataset, chunk: int = 16,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Within-corpus SEGMENT-level exact dedup (the C4/Gopher
    line-dedup shape): documents split into fixed ``chunk``-character
    segments; every repeated segment survives only at its first
    occurrence in global (doc_id, seg_idx) order, and each document is
    reconstructed from its kept segments.

    Fixed-width splitting keeps the splitter SQL-mirrorable
    (``substr`` + ``row_number() OVER (PARTITION BY seg)``); swap the
    segmenter for lines/paragraphs in corpora that have them — the
    dedup/reconstruct machinery is splitter-agnostic.

    Two bucketed shuffles of skinny rows, never a global sort:
    1. segments shuffle by ``hash(seg) % num_buckets``; each bucket
       picks every segment's global first occurrence vectorized
       (sort + drop_duplicates inside the bucket — a segment's
       occurrences all land in one bucket).
    2. flagged segments shuffle by ``hash(doc_id) % num_buckets`` and
       each doc concatenates its kept segments in seg_idx order.

    Output: (doc_id, text_dedup, n_segments, n_kept).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_col), pa.string())
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        counts = -(-nchars // chunk)
        total = int(counts.sum())
        parent = np.repeat(np.arange(len(batch), dtype=np.int64),
                           counts)
        starts = np.zeros(len(batch), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        seg_idx = (np.arange(total, dtype=np.int64)
                   - np.repeat(starts, counts))
        segs = np.full(total, "", dtype=object)
        for k in range(int(counts.max()) if len(counts) else 0):
            sel = np.flatnonzero(seg_idx == k)
            if not len(sel):
                continue
            sl = pc.utf8_slice_codeunits(text, k * chunk,
                                         (k + 1) * chunk)
            segs[sel] = sl.take(pa.array(parent[sel])).to_numpy(
                zero_copy_only=False)
        sb = (hash64_batch(segs.tolist())
              % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids[parent]),
            "seg_idx": pa.array(seg_idx),
            "seg": pa.array(segs, pa.string()),
            "_sb": pa.array(sb),
        })

    def flag_first(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty or "seg" not in group.columns:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "seg_idx": pd.Series([], dtype="int64"),
                "seg": pd.Series([], dtype="object"),
                "keep": pd.Series([], dtype="bool")})
        g = group.sort_values(["seg", id_col, "seg_idx"],
                              kind="stable")
        g = g.assign(keep=~g["seg"].duplicated())
        return g[[id_col, "seg_idx", "seg", "keep"]]

    def add_db(batch: pa.Table) -> pa.Table:
        b = (_id_blocks(batch.column(id_col).to_pylist(), num_buckets)
             ).astype(np.int32)
        return batch.append_column("_db", pa.array(b))

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty or id_col not in group.columns:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "text_dedup": pd.Series([], dtype="object"),
                "n_segments": pd.Series([], dtype="int64"),
                "n_kept": pd.Series([], dtype="int64")})
        g = group.sort_values([id_col, "seg_idx"], kind="stable")
        kept = g[g["keep"]]
        out = g.groupby(id_col, as_index=False, sort=False).agg(
            n_segments=("seg_idx", "size"))
        joined = kept.groupby(id_col, sort=False).agg(
            text_dedup=("seg", "".join), n_kept=("seg", "size"))
        out = out.merge(joined, on=id_col, how="left")
        out["text_dedup"] = out["text_dedup"].fillna("")
        out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
        out["n_segments"] = out["n_segments"].astype("int64")
        return out[[id_col, "text_dedup", "n_segments", "n_kept"]]

    flagged = (ds.select_columns([id_col, text_col])
               .map_batches(explode, batch_format="pyarrow")
               .groupby("_sb").map_groups(flag_first,
                                          batch_format="pandas"))
    return (flagged.map_batches(add_db, batch_format="pyarrow")
            .groupby("_db").map_groups(rebuild,
                                       batch_format="pandas"))


def similarity_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    threshold: float = 0.5, text_col: str = "text",
                    id_col: str = "doc_id", num_perm: int = 64,
                    num_bands: int = 32, shingle_k: int = 3,
                    num_buckets: int = 64,
                    max_per_band: int = 200) -> pa.Table:
    """Fuzzy JOIN between two tables: (a_id, b_id, jaccard) for every
    cross-table pair whose exact word-``shingle_k``-gram Jaccard is
    ≥ ``threshold`` — subject to the LSH recall of the banding
    parameters (with the default 32 bands × 2 rows a J=0.5 pair
    band-collides with P≈1−0.75³² ≈ 0.9999; J=0.9 is ≈certain; all
    collisions are DETERMINISTIC functions of the texts — fixed
    permutations and hashes — so a result is reproducible run to run).

    Shape (entity-resolution at corpus scale): both sides run the same
    cached minhash+banding map; band rows carry a side tag and shuffle
    ONCE by band-hash bucket; only CROSS-side collisions become
    candidates (capped per hot band, the boilerplate-band bomb guard);
    exact Jaccard verification attaches both texts via two bucketed
    hash joins — the full tables never co-locate and nothing
    corpus-sized reaches the driver except the verified matches.
    """
    from .relational import hash_join
    from .stagecache import cached_stage

    def bands(ds: ray.data.Dataset, side_id: str) -> ray.data.Dataset:
        ex = ds.map_batches(
            cached_stage(_MinHasher, text_col=text_col, id_col=id_col,
                         num_perm=num_perm, num_bands=num_bands,
                         shingle_k=shingle_k),
            batch_format="pyarrow", batch_size=None)

        def tag(batch: pa.Table) -> pa.Table:
            hb = (np.asarray(batch.column("band_hash"))
                  % np.uint64(num_buckets)).astype(np.int32)
            names = {id_col: side_id}
            cols = {names.get(n, n): batch.column(n)
                    for n in batch.schema.names}
            cols["_sjside"] = pa.array([side_id] * len(batch))
            cols["_hb"] = pa.array(hb)
            return pa.table(cols)

        return ex.map_batches(tag, batch_format="pyarrow")

    lb = bands(left.select_columns([id_col, text_col]), "a_id")
    rb = bands(right.select_columns([id_col, text_col]), "b_id")

    def cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in group.groupby(["band", "band_hash"], sort=False):
            ls = sub.loc[sub["_sjside"] == "a_id", "a_id"].dropna()
            rs = sub.loc[sub["_sjside"] == "b_id", "b_id"].dropna()
            if ls.empty or rs.empty:
                continue
            ls = np.unique(ls.to_numpy())[:max_per_band]
            rs = np.unique(rs.to_numpy())[:max_per_band]
            grid_a = np.repeat(ls, len(rs))
            grid_b = np.tile(rs, len(ls))
            out_a.append(grid_a)
            out_b.append(grid_b)
        if not out_a:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        df = pd.DataFrame({
            "a_id": np.concatenate(out_a).astype("int64"),
            "b_id": np.concatenate(out_b).astype("int64")})
        return df.drop_duplicates()

    # materialized: hash_join reads .schema() of its inputs, which on
    # a lazy all-to-all plan forces a full execution — the band
    # shuffle would otherwise run once for the schema probe and again
    # for the join itself
    cand = (lb.union(rb).groupby("_hb")
            .map_groups(cross_pairs, batch_format="pandas")
            .materialize())

    def rn(frm: str, to: str):
        def _r(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [to if n == frm else n for n in batch.schema.names])
        return _r

    la = (left.select_columns([id_col, text_col])
          .map_batches(rn(id_col, "a_id"), batch_format="pyarrow")
          .map_batches(rn(text_col, "_ta"), batch_format="pyarrow"))
    rb2 = (right.select_columns([id_col, text_col])
           .map_batches(rn(id_col, "b_id"), batch_format="pyarrow")
           .map_batches(rn(text_col, "_tb"), batch_format="pyarrow"))
    joined = hash_join(cand, la, on="a_id",
                       num_buckets=num_buckets).materialize()
    joined = hash_join(joined, rb2, on="b_id", num_buckets=num_buckets)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"a_id": [], "b_id": [], "jaccard": []}
        for a, b, ta, tb in zip(batch.get("a_id", []),
                                batch.get("b_id", []),
                                batch.get("_ta", []),
                                batch.get("_tb", [])):
            sa = shingles_from_hashes(word_hashes(ta or ""), shingle_k)
            sb = shingles_from_hashes(word_hashes(tb or ""), shingle_k)
            union = len(sa | sb)
            if union == 0:
                continue
            j = len(sa & sb) / union
            if j >= threshold:
                rows["a_id"].append(int(a))
                rows["b_id"].append(int(b))
                # raw double: both engines divide the same two ints,
                # so the IEEE result is bit-identical — no rounding
                rows["jaccard"].append(j)
        return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"])

    out = joined.map_batches(verify, batch_format="pandas").to_pandas()
    if "a_id" not in out.columns:
        out = pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                            "b_id": pd.Series([], dtype="int64"),
                            "jaccard": pd.Series([], dtype="float64")})
    out = (out.drop_duplicates(subset=["a_id", "b_id"])
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    return pa.Table.from_pandas(out)


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) ≤ 1 in O(len) without the DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _lev_le(a: str, b: str, k: int) -> int | None:
    """Exact Levenshtein(a, b) if ≤ k, else None — banded DP touching
    only the 2k+1 diagonal band, so verify cost is O(len·k), not
    O(len²)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return None
    inf = k + 1
    prev = [i if i <= k else inf for i in range(la + 1)]
    for j in range(1, lb + 1):
        lo = max(1, j - k)
        hi = min(la, j + k)
        cur = [inf] * (la + 1)
        if j <= k:
            cur[0] = j
        bj = b[j - 1]
        row_min = cur[0] if j <= k else inf
        for i in range(lo, hi + 1):
            v = prev[i - 1] + (a[i - 1] != bj)
            d = prev[i] + 1
            if d < v:
                v = d
            e = cur[i - 1] + 1
            if e < v:
                v = e
            if v > inf:
                v = inf
            cur[i] = v
            if v < row_min:
                row_min = v
        if row_min > k:
            return None
        prev = cur
    return prev[la] if prev[la] <= k else None


def edit_distance_self_join(ds: ray.data.Dataset, col: str,
                            num_buckets: int = 64,
                            max_dist: int = 1) -> pd.DataFrame:
    """FastSS (k=``max_dist``) similarity self-join: every unordered
    pair of DISTINCT ``col`` values with Levenshtein distance ≤ k — the
    spelling-variant / near-key clustering primitive (Bocek et al.'s
    deletion-neighborhood blocking). SQL twin is the quadratic
    ``JOIN … ON levenshtein ≤ k`` cross join; here candidates come
    from BLOCKING: ed(a,b) ≤ k implies a and b share a member of the
    ≤k-deletion neighborhood (delete up to k chars), so only strings
    agreeing on some variant ever meet — no false negatives, and the
    banded-DP verify kills the false positives.

    Scale shape: distinct values reduce block-locally then through
    one hash-bucket combine (exact-dedup economics); each distinct
    string explodes into O(len^k) variants (skinny string pairs; for
    k=2 that's 1 + len + C(len,2) ≈ len²/2 per DISTINCT string — the
    classic FastSS space/verify trade); ONE variant-hash shuffle
    groups candidates, the basket pair-explosion emits within-group
    pairs vectorized, a pair-hash bucket dedups globally, and only
    then does the O(candidate-pairs) exact ≤k verify run —
    candidates, not the cross product. Output:
    (name_a, name_b, dist) with name_a < name_b, dist the exact
    Levenshtein distance (1..k)."""
    from .basket import _explode_pairs
    from .windows import _add_key_bucket

    if max_dist not in (1, 2):
        raise ValueError("edit_distance_self_join supports max_dist 1 "
                         f"or 2 (deletion shells), got {max_dist}")

    def block_unique(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: b[col].unique()})

    uniq = (_add_key_bucket(
        ds.select_columns([col]).map_batches(
            block_unique, batch_format="pandas"), col, num_buckets)
        .groupby("_sbucket")
        .map_groups(lambda g: pd.DataFrame({col: g[col].unique()}),
                    batch_format="pandas"))

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        names: list[str] = []
        vs: list[str] = []
        for s in b[col]:
            seen = {s}
            if max_dist >= 1:
                for i in range(len(s)):    # per DISTINCT string, O(len)
                    seen.add(s[:i] + s[i + 1:])
            if max_dist >= 2:
                for i in range(len(s)):    # 2-deletion shell, O(len²)
                    si = s[:i] + s[i + 1:]
                    for j in range(len(si)):
                        seen.add(si[:j] + si[j + 1:])
            names.extend([s] * len(seen))
            vs.extend(seen)
        return (pd.DataFrame({"name": names, "variant": vs})
                .drop_duplicates())

    var = uniq.map_batches(variants, batch_format="pandas")

    def cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = (g[["variant", "name"]].drop_duplicates()
             .sort_values(["variant", "name"], kind="stable"))
        a, b = _explode_pairs(d["variant"].to_numpy(),
                              d["name"].to_numpy())
        out = (pd.DataFrame({"name_a": a, "name_b": b})
               .query("name_a != name_b").drop_duplicates())
        h = pd.util.hash_pandas_object(
            out["name_a"] + "\x00" + out["name_b"], index=False)
        return out.assign(_pb=(h % num_buckets).astype("int32"))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["name_a", "name_b"]].drop_duplicates()
        if max_dist == 1:
            keep = [_ed_le1(x, y)             # O(candidates), post-dedup
                    for x, y in zip(d["name_a"], d["name_b"])]
            d = d.loc[keep].copy()
            d["dist"] = np.int64(1)
            return d
        dists = [_lev_le(x, y, max_dist)      # banded DP, O(len·k)
                 for x, y in zip(d["name_a"], d["name_b"])]
        keep = [v is not None for v in dists]
        d = d.loc[keep].copy()
        d["dist"] = pd.Series([v for v in dists if v is not None],
                              index=d.index, dtype="int64")
        return d

    out = (_add_key_bucket(var, "variant", num_buckets)
           .groupby("_sbucket")
           .map_groups(cand_pairs, batch_format="pandas")
           .groupby("_pb")
           .map_groups(verify, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"name_a": pd.Series([], dtype="object"),
                             "name_b": pd.Series([], dtype="object"),
                             "dist": pd.Series([], dtype="int64")})
    if "_pb" in out.columns:
        out = out.drop(columns=["_pb"])
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram containment (asymmetric near-dup: quotes / subsets)
# ---------------------------------------------------------------------------


def containment_pairs(ds: ray.data.Dataset, n: int = 3,
                      tau: float = 0.2, text_col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 64,
                      max_gram_df: int | None = None) -> ray.data.Dataset:
    """Directed n-gram containment pairs: (a, b) where
    |grams(a) ∩ grams(b)| / |grams(a)| ≥ tau, a ≠ b — the asymmetric
    near-dup relation Jaccard misses (a short doc QUOTED inside a long
    one has high containment but low Jaccard; CCNet/Lee et al. treat
    these as dedup targets).

    Scale shape: per block, each doc reduces to its DISTINCT word
    n-grams (docs arrive whole, so totals |grams(a)| are block-local
    too — no extra pass). Gram→doc rows shuffle ONCE by hash(gram)
    bucket; inside a bucket a vectorized self-merge per gram emits
    per-pair partial intersection counts, combined by a second skinny
    (a, b)-keyed bucket shuffle (partials, never texts). Totals join
    back via the partitioned hash join on the ``a`` side. The only
    quadratic term is per-gram df² — ``max_gram_df`` caps hot grams
    (stopword-like shingles) for skewed corpora; the default None
    keeps the operator exact, matching the SQL oracle.

    Output Dataset: (a, b, inter, a_total, containment) — directed,
    unfiltered columns kept for auditing.
    """
    from .relational import hash_join, partial_groupby

    def grams_block(b: pd.DataFrame) -> pd.DataFrame:
        words = b[text_col].str.split(" ")
        ids = b[id_col].to_numpy()
        out_ids, out_grams = [], []
        for i, ws in enumerate(words):
            if len(ws) < n:
                continue
            gs = {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}
            out_ids.append(np.full(len(gs), ids[i]))
            out_grams.append(np.array(list(gs), dtype=object))
        if not out_ids:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "gram": pd.Series([], dtype=str)})
        return pd.DataFrame({id_col: np.concatenate(out_ids),
                             "gram": np.concatenate(out_grams)})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        grams_block, batch_format="pandas", batch_size=None).materialize()

    totals = partial_groupby(
        grams.map_batches(
            lambda b: b.groupby(id_col, as_index=False)
            .agg(a_total=(id_col, "size")),
            batch_format="pandas", batch_size=None),
        [id_col],
        lambda b: b.groupby(id_col, as_index=False)["a_total"].sum(),
        ["a_total"], distributed_combine=True)
    totals = totals.map_batches(
        lambda b: b.rename(columns={id_col: "a"}),
        batch_format="pandas", batch_size=None)

    def bucket_grams(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["gram"], index=False)
        return b.assign(_gb=(h % num_buckets).astype("int32"))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if max_gram_df is not None:
            df = g.groupby("gram")["gram"].transform("size")
            g = g.loc[df <= max_gram_df]
        m = g.merge(g, on="gram", suffixes=("_a", "_b"))
        m = m.loc[m[f"{id_col}_a"] != m[f"{id_col}_b"]]
        return (m.groupby([f"{id_col}_a", f"{id_col}_b"],
                          as_index=False).agg(inter=("gram", "size"))
                .rename(columns={f"{id_col}_a": "a",
                                 f"{id_col}_b": "b"}))

    pair_partials = (grams.map_batches(bucket_grams,
                                       batch_format="pandas",
                                       batch_size=None)
                     .groupby("_gb").map_groups(pairs_in_bucket,
                                                batch_format="pandas"))
    pairs = partial_groupby(
        pair_partials, ["a", "b"],
        lambda b: b.groupby(["a", "b"], as_index=False)["inter"].sum(),
        ["inter"], distributed_combine=True)

    joined = hash_join(pairs, totals, on="a")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["containment"] = (out["inter"].to_numpy(np.float64)
                              / out["a_total"].to_numpy(np.float64))
        return out.loc[out["containment"] >= tau,
                       ["a", "b", "inter", "a_total", "containment"]]

    return joined.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def exact_dedup_best(ds: ray.data.Dataset, quality_col: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     num_buckets: int = 64) -> pd.DataFrame:
    """Quality-aware exact dedup: per distinct content, keep the doc
    with the HIGHEST ``quality_col`` (ties → lowest id) — what curation
    pipelines actually do (keep the best-scored copy, not the first
    one). Same economics as :func:`exact_dedup`: the reduce key is
    (quality desc, id asc), which is idempotent, so each block
    pre-reduces to its local winners and only (hash, quality, id)
    triples take the single bucket shuffle; the text never moves.

    Output: winner (doc_id, quality) rows, sorted by id.
    """
    hashed = add_content_hash(ds, text_col).select_columns(
        ["content_hash", id_col, quality_col])

    def local_best(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values([quality_col, id_col],
                          ascending=[False, True], kind="stable")
        return g.drop_duplicates("content_hash", keep="first")

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["content_hash"], index=False)
        return b.assign(_db=(h % num_buckets).astype("int32"))

    winners = (hashed.map_batches(local_best, batch_format="pandas",
                                  batch_size=None)
               .map_batches(bucket, batch_format="pandas",
                            batch_size=None)
               .groupby("_db").map_groups(
                   lambda g: local_best(g)[[id_col, quality_col]],
                   batch_format="pandas")
               .to_pandas())
    return winners.sort_values(id_col).reset_index(drop=True)


def basket_similarity_pairs(ds: ray.data.Dataset, set_col: str,
                            elem_col: str, min_common: int = 2,
                            num_buckets: int = 64,
                            as_dataset: bool = False
                            ) -> "pd.DataFrame | ray.data.Dataset":
    """Set-similarity self-join over INTEGER element sets (orders ↔
    their part sets, docs ↔ their entity sets): every unordered pair
    of set ids sharing ≥ ``min_common`` distinct elements, with the
    exact intersection count and Jaccard — the co-basket analogue of
    the text n-gram containment join (integer sets need no shingling,
    so the inverted-element bucketing IS the candidate generator and
    the verify is a pure count).

    Shape: distinct (set, elem) pairs land whole in one elem-hash
    bucket (dedup rides the same shuffle) → per-bucket vectorized
    self-merge emits candidate (a, b) rows, one per SHARED element →
    pair-hash bucket combine sums them to exact intersection counts →
    set sizes attach via two bucketed hash joins. Jaccard =
    c / (|A| + |B| − c) from exact ints. A hub element of frequency f
    emits O(f²) candidates — the same cost the SQL replay pays; cap
    or drop stop-elements upstream for corpora with power-law element
    frequencies.
    """
    from .relational import hash_join

    def elem_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"s": b[set_col].astype("int64"),
                            "e": b[elem_col].astype("int64")})
        out = out.drop_duplicates()
        eb = (out["e"].to_numpy(np.uint64) * _FIB_MIX)
        out["_eb"] = (eb % np.uint64(num_buckets)).astype(np.int32)
        return out

    def candidates(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["s", "e"]].drop_duplicates()
        m = g.merge(g, on="e")
        m = m[m["s_x"] < m["s_y"]]
        if m.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        vc = m.groupby(["s_x", "s_y"], as_index=False).size()
        return pd.DataFrame({"a": vc["s_x"].to_numpy(np.int64),
                             "b": vc["s_y"].to_numpy(np.int64),
                             "c": vc["size"].to_numpy(np.int64)})

    pairs_partial = (ds.map_batches(elem_bucket, batch_format="pandas",
                                    batch_size=None)
                     .groupby("_eb").map_groups(candidates,
                                                batch_format="pandas"))

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        pb = (b["a"].to_numpy(np.uint64) * _FIB_MIX) \
            ^ b["b"].to_numpy(np.uint64)
        b["_pb"] = (pb % np.uint64(num_buckets)).astype(np.int32)
        return b

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["a", "b"], as_index=False)["c"].sum()
        return agg[agg["c"] >= min_common]

    verified = (pairs_partial.map_batches(pair_bucket,
                                          batch_format="pandas",
                                          batch_size=None)
                .groupby("_pb").map_groups(combine,
                                           batch_format="pandas")
                .materialize())

    def sizes(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"s": b[set_col].astype("int64"),
                            "e": b[elem_col].astype("int64")})
        out = out.drop_duplicates()
        sb = (out["s"].to_numpy(np.uint64) * _FIB_MIX)
        out["_sb"] = (sb % np.uint64(num_buckets)).astype(np.int32)
        return out

    def size_final(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["s", "e"]].drop_duplicates()
        vc = d.groupby("s", as_index=False).size()
        return pd.DataFrame({"s": vc["s"].to_numpy(np.int64),
                             "sz": vc["size"].to_numpy(np.int64)})

    size_ds = (ds.map_batches(sizes, batch_format="pandas",
                              batch_size=None)
               .groupby("_sb").map_groups(size_final,
                                          batch_format="pandas")
               .materialize())

    def as_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": b["s"], "sz_a": b["sz"]})

    def as_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": b["s"], "sz_b": b["sz"]})

    j1 = hash_join(verified, size_ds.map_batches(
        as_a, batch_format="pandas", batch_size=None),
        on="a", num_buckets=num_buckets).materialize()
    j2 = hash_join(j1, size_ds.map_batches(
        as_b, batch_format="pandas", batch_size=None),
        on="b", num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        sa = b["sz_a"].to_numpy(np.int64)
        sb = b["sz_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "a": b["a"].to_numpy(np.int64),
            "b": b["b"].to_numpy(np.int64),
            "n_common": c,
            "jaccard": c.astype(np.float64) / (sa + sb - c)})

    out = j2.map_batches(finish, batch_format="pandas",
                         batch_size=None)
    if as_dataset:
        return out
    df = out.to_pandas()
    if df.empty:                     # schema-less when every group is empty
        return pd.DataFrame({
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "n_common": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def dup_rate_by_group(ds: ray.data.Dataset, text_col: str = "text",
                      group_col: str = "source",
                      num_buckets: int = 64) -> pd.DataFrame:
    """Per-group exact-duplicate exposure: how many of a group's docs
    have text that appears MORE THAN ONCE in the whole corpus — the
    syndication/boilerplate scoreboard that tells a crawl which
    sources to de-prioritize.

    Only (content-hash, group) skinny pairs shuffle, bucketed by the
    CONTENT hash so every copy of a text co-locates and the global
    copy count is exact in-bucket; per-(group, is-dup) count partials
    come back O(buckets · groups). ``dup_rate`` = exact int/int.
    Output: (group, n_docs, n_dup_docs, dup_rate), sorted.
    """
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = hash64_batch([t if t is not None else ""
                          for t in b[text_col]])
        out = pd.DataFrame({"_h": h.astype(np.uint64),
                            group_col: b[group_col]})
        out["_hb"] = (out["_h"]
                      % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cc = group.groupby("_h")["_h"].transform("size")
        out = pd.DataFrame({group_col: group[group_col],
                            "_dup": (cc > 1).astype("int64")})
        agg = out.groupby(group_col, as_index=False).agg(
            n_docs=("_dup", "size"), n_dup_docs=("_dup", "sum"))
        return agg

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(tag, batch_format="pandas", batch_size=None)
             .groupby("_hb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    agg = parts.groupby(group_col, as_index=False)[
        ["n_docs", "n_dup_docs"]].sum()
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_dup_docs"] = agg["n_dup_docs"].astype("int64")
    agg["dup_rate"] = agg["n_dup_docs"].to_numpy(np.float64) \
        / agg["n_docs"].to_numpy(np.float64)
    return agg.sort_values(group_col).reset_index(drop=True)


def batch_novelty(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", batch_size_ids: int = 100,
                  num_buckets: int = 64) -> pd.DataFrame:
    """Crawl-batch novelty curve: docs are grouped into consecutive
    id-order batches (``doc_id // batch_size_ids`` — the crawl-wave
    proxy) and each batch reports how many of its docs carry text
    FIRST seen in that batch — the is-this-crawl-still-finding-new-
    content gauge that tells a recrawl loop when to stop.

    One content-hash bucket shuffle: every copy of a text co-locates,
    so its global first batch (min id → batch) is exact in-bucket;
    what leaves is the per-(batch) pair of counts (docs, first-seen
    docs) — O(buckets · batches) rows. Output: (batch, n_docs,
    n_novel, novelty_rate), sorted by batch.
    """
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = hash64_batch([t if t is not None else ""
                          for t in b[text_col]])
        out = pd.DataFrame({"_h": h.astype(np.uint64),
                            "_id": b[id_col].astype("int64")})
        out["_hb"] = (out["_h"]
                      % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["_b"] = g["_id"].to_numpy(np.int64) // batch_size_ids
        first_b = g.groupby("_h")["_b"].transform("min")
        g["_novel"] = (g["_b"] == first_b).astype("int64")
        agg = g.groupby("_b", as_index=False).agg(
            n_docs=("_novel", "size"), n_novel=("_novel", "sum"))
        return agg

    parts = (ds.select_columns([id_col, text_col])
             .map_batches(tag, batch_format="pandas", batch_size=None)
             .groupby("_hb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("_b", as_index=False)[
        ["n_docs", "n_novel"]].sum()
    out = pd.DataFrame({
        "batch": agg["_b"].astype("int64"),
        "n_docs": agg["n_docs"].astype("int64"),
        "n_novel": agg["n_novel"].astype("int64")})
    out["novelty_rate"] = out["n_novel"].to_numpy(np.float64) \
        / out["n_docs"].to_numpy(np.float64)
    return out.sort_values("batch").reset_index(drop=True)


def bag_dedup(ds: ray.data.Dataset, text_col: str = "text",
              id_col: str = "doc_id",
              num_buckets: int = 64) -> pd.DataFrame:
    """Order-insensitive exact dedup: docs whose TOKEN MULTISETS are
    identical collapse to one copy (min id wins) even when the token
    order differs — the paragraph-shuffled / sentence-reordered spam
    that byte-exact dedup misses and MinHash only catches softly.

    The canonical key is ``md5(' '.join(sorted(tokens)))`` with
    tokenization replaying the SQL twin exactly
    (``string_split_regex(lower(trim(text)), '\\s+')``); the text
    never leaves the map stage — only (key, id) skinny pairs shuffle,
    bucketed by the key so every permutation of a bag co-locates.
    Output: (id, n_copies) for each surviving doc, sorted by id.
    """
    import hashlib
    import re

    ws_re = re.compile(r"\s+")

    def keys(b: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for t in b[text_col]:
            toks = ws_re.split((t if t is not None else "")
                               .strip().lower())
            ks.append(hashlib.md5(
                " ".join(sorted(toks)).encode()).hexdigest())
        out = pd.DataFrame({"_k": ks,
                            "_id": b[id_col].astype("int64")})
        out["_kb"] = (pd.util.hash_pandas_object(out["_k"],
                                                 index=False)
                      % num_buckets).astype("int32")
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("_k", as_index=False).agg(
            _win=("_id", "min"), n_copies=("_id", "size"))
        return agg[["_win", "n_copies"]]

    out = (ds.select_columns([id_col, text_col])
           .map_batches(keys, batch_format="pandas", batch_size=None)
           .groupby("_kb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_copies": pd.Series([], dtype="int64")})
    out = out.rename(columns={"_win": id_col})
    out[id_col] = out[id_col].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def dup_cluster_hist(ds: ray.data.Dataset, text_col: str = "text",
                     num_buckets: int = 64) -> pd.DataFrame:
    """Exact-duplicate cluster-size histogram: how many distinct texts
    occur exactly 1×, 2×, 3×, … corpus-wide — the one-table answer to
    'how duplicated is this crawl' that sizes the dedup win before
    running it.

    Per-block (content-hash, count) partials are ADDITIVE, so raw
    texts never shuffle — partials finish in one content-hash bucket
    shuffle (every copy's counts meet in their bucket), and the
    per-bucket size histograms are additive again: the driver folds
    O(buckets · sizes) rows. Output: (cluster_size, n_clusters,
    n_docs), sorted by cluster_size.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = hash64_batch([t if t is not None else ""
                          for t in b[text_col]])
        g = pd.DataFrame({"_h": h.astype(np.uint64)})
        agg = g.groupby("_h", as_index=False).size() \
            .rename(columns={"size": "n"})
        agg["_hb"] = (agg["_h"].to_numpy(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        sizes = group.groupby("_h")["n"].sum()
        vc = sizes.value_counts()
        return pd.DataFrame({"cluster_size": vc.index.to_numpy("int64"),
                             "n_clusters": vc.to_numpy("int64")})

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pandas",
                          batch_size=None)
             .groupby("_hb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "cluster_size": pd.Series([], dtype="int64"),
            "n_clusters": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64")})
    agg = parts.groupby("cluster_size", as_index=False)[
        "n_clusters"].sum()
    agg["cluster_size"] = agg["cluster_size"].astype("int64")
    agg["n_clusters"] = agg["n_clusters"].astype("int64")
    agg["n_docs"] = (agg["cluster_size"]
                     * agg["n_clusters"]).astype("int64")
    return agg.sort_values("cluster_size").reset_index(drop=True)


def blocking_cost_audit(ds: ray.data.Dataset, group_col: str = "lang",
                        size_col: str = "n_chars",
                        block_width: int = 256,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Pre-flight cost audit for a BLOCKED similarity join: docs land
    in ``(group, size // block_width)`` blocking keys and each group
    reports its block count, largest block and the exact candidate
    pair count ``Σ c·(c−1)/2`` — the is-this-blocking-scheme-still-
    quadratic check you run BEFORE committing a 10^9-doc near-dup
    pass to it.

    Per-(group, block) count partials are additive, finish in ONE
    block-key-hash shuffle, and the per-group (n_blocks, n_docs,
    max_block, pair_cost) partials are additive/max-mergeable again —
    the driver folds O(buckets · groups) rows. Output: (group,
    n_docs, n_blocks, max_block, pair_cost), sorted.
    """
    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            group_col: b[group_col],
            "_blk": b[size_col].astype("int64") // block_width})
        agg = g.groupby([group_col, "_blk"], as_index=False).size() \
            .rename(columns={"size": "c"})
        h = pd.util.hash_pandas_object(
            agg[group_col].astype(str) + "\x00"
            + agg["_blk"].astype(str), index=False)
        agg["_bb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        blk = group.groupby([group_col, "_blk"], as_index=False)[
            "c"].sum()
        rows = []
        for gval, gh in blk.groupby(group_col):
            cs = [int(c) for c in gh["c"].tolist()]
            rows.append((gval, sum(cs), len(cs), max(cs),
                         sum(c * (c - 1) // 2 for c in cs)))
        return pd.DataFrame(rows, columns=[
            group_col, "n_docs", "n_blocks", "max_block",
            "pair_cost"])

    parts = (ds.select_columns([group_col, size_col])
             .map_batches(local, batch_format="pandas",
                          batch_size=None)
             .groupby("_bb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_blocks": pd.Series([], dtype="int64"),
            "max_block": pd.Series([], dtype="int64"),
            "pair_cost": pd.Series([], dtype="int64")})
    agg = parts.groupby(group_col, as_index=False).agg(
        n_docs=("n_docs", "sum"), n_blocks=("n_blocks", "sum"),
        max_block=("max_block", "max"), pair_cost=("pair_cost", "sum"))
    for c in ("n_docs", "n_blocks", "max_block", "pair_cost"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values(group_col).reset_index(drop=True)


def block_skew_audit(ds: ray.data.Dataset) -> pd.DataFrame:
    """Ray-native block-balance audit: per-input-block row counts
    folded to (n_blocks, min/max/mean rows, skew = max/mean) — the
    engine-level check that a Dataset's physical layout won't starve
    the pool (one fat block serializes a 32-way stage). No SQL
    analogue by design: it measures the EXECUTION layout, not the
    data. MAP-ONLY (one count row per block).
    """
    import numpy as np
    import pandas as pd

    def one(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [int(len(b))]})

    counts = ds.map_batches(one, batch_format="pandas",
                            batch_size=None).to_pandas()
    counts = counts[counts["rows"] > 0]
    if counts.empty:
        return pd.DataFrame({
            "n_blocks": pd.Series([0], dtype="int64"),
            "min_rows": pd.Series([0], dtype="int64"),
            "max_rows": pd.Series([0], dtype="int64"),
            "mean_rows": pd.Series([0.0], dtype="float64"),
            "skew": pd.Series([0.0], dtype="float64")})
    r = counts["rows"].to_numpy(np.int64)
    mean = float(r.sum()) / float(len(r))
    return pd.DataFrame({
        "n_blocks": pd.Series([len(r)], dtype="int64"),
        "min_rows": pd.Series([int(r.min())], dtype="int64"),
        "max_rows": pd.Series([int(r.max())], dtype="int64"),
        "mean_rows": pd.Series([mean], dtype="float64"),
        "skew": pd.Series([float(r.max()) / mean], dtype="float64")})


def prefix_dup_groups(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id",
                      prefix_chars: int = 128,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Prefix-duplicate groups: docs whose normalized text shares the
    first ``prefix_chars`` characters (``md5(lower(trim(text))
    [:prefix_chars])``) — the truncation/expansion duplicate class
    (same article cut at different lengths, feed snippets vs full
    pages) that byte-exact dedup misses entirely.

    Text never leaves the map stage — only (prefix-key, id) pairs
    shuffle, bucketed by the key; winners are min-id and ONLY groups
    with ≥ 2 members return. Output: (id, n_copies) per duplicate
    group, sorted by id.
    """
    import hashlib

    def keys(b: pd.DataFrame) -> pd.DataFrame:
        ks = [hashlib.md5(
            (t if t is not None else "")
            .strip().lower()[:prefix_chars].encode()).hexdigest()
            for t in b[text_col]]
        out = pd.DataFrame({"_k": ks,
                            "_id": b[id_col].astype("int64")})
        out["_kb"] = (pd.util.hash_pandas_object(out["_k"],
                                                 index=False)
                      % num_buckets).astype("int32")
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("_k", as_index=False).agg(
            _win=("_id", "min"), n_copies=("_id", "size"))
        agg = agg[agg["n_copies"] > 1]
        return agg[["_win", "n_copies"]]

    out = (ds.select_columns([id_col, text_col])
           .map_batches(keys, batch_format="pandas", batch_size=None)
           .groupby("_kb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_copies": pd.Series([], dtype="int64")})
    out = out.rename(columns={"_win": id_col})
    out[id_col] = out[id_col].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def cross_group_dup_matrix(ds: ray.data.Dataset,
                           text_col: str = "text",
                           group_col: str = "source",
                           num_buckets: int = 64) -> pd.DataFrame:
    """Cross-group exact-duplicate overlap matrix: for every unordered
    pair of groups (sources/hosts), the number of DISTINCT text
    contents present in both — the mirror/syndication detector that
    tells a crawl planner which source pairs are republishing each
    other (and which half of the fetch budget is buying bytes it
    already has under another hostname).

    Scale shape: texts never pairwise-compare — each block reduces to
    its distinct (md5(text), group) pairs (skinny strings), ONE
    content-hash bucket shuffle co-locates every copy of a text, the
    within-bucket self-merge explodes each hash's tiny group set into
    its C(G,2) pairs (G ≤ #groups, not corpus-sized), and per-bucket
    (group_a, group_b, n) counts are additive — the driver folds
    O(buckets · groups²). md5 (not the engine's 64-bit content hash)
    so the SQL twin's ``md5()`` replays the key verbatim. Output:
    (group_a, group_b, n_shared) with group_a < group_b, sorted."""
    from .windows import _add_key_bucket

    def block_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": [content_md5(t or "") for t in b[text_col]],
            "g": b[group_col]}).drop_duplicates()

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["h", "g"]].drop_duplicates()
        m = d.merge(d, on="h")
        m = m[m["g_x"] < m["g_y"]]
        if m.empty:
            return pd.DataFrame({
                "group_a": pd.Series([], dtype="object"),
                "group_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        out = m.groupby(["g_x", "g_y"], as_index=False).size() \
            .rename(columns={"g_x": "group_a", "g_y": "group_b",
                             "size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    parts = (_add_key_bucket(
        ds.select_columns([text_col, group_col]).map_batches(
            block_pairs, batch_format="pandas", batch_size=None),
        "h", num_buckets)
        .groupby("_sbucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "group_a": pd.Series([], dtype="object"),
            "group_b": pd.Series([], dtype="object"),
            "n_shared": pd.Series([], dtype="int64")})
    out = parts.groupby(["group_a", "group_b"], as_index=False)["n"] \
        .sum().rename(columns={"n": "n_shared"})
    out["n_shared"] = out["n_shared"].astype("int64")
    return out.sort_values(["group_a", "group_b"]) \
        .reset_index(drop=True)


def snm_pairs(ds: ray.data.Dataset, window: int = 5,
              threshold: float = 0.8, key_col: str = "n_chars",
              id_col: str = "doc_id", text_col: str = "text",
              chunk_size: int = 512,
              num_buckets: int = 32) -> pd.DataFrame:
    """Sorted-Neighborhood Method dedup blocking (Hernández-Stolfo):
    sort the corpus by a cheap key ``(key_col, id)``, slide a
    ``window``-record window down the sorted order, and verify only
    pairs inside the window — the linear-candidate alternative to
    hash blocking when near-duplicates have NEARLY equal keys (here:
    document length) rather than an equal one. Emits ``(a, b,
    rank_dist, jaccard)`` for window pairs whose distinct-token
    Jaccard ≥ ``threshold``; ``a``/``b`` are the lower/higher-ranked
    doc ids, ordered by (a, b).

    Tokenization (SQL-replayable, exact): distinct matches of
    ``[a-z0-9]+`` over the lowercased text; Jaccard = |∩| / |∪|, one
    float division of exact ints on both sides.

    Scale shape — global sliding window WITHOUT a global sort: the
    global rank of every doc is computed from a skinny per-key-value
    histogram (driver holds O(distinct key values); exclusive prefix
    sums broadcast once) plus a bucketed shuffle of the skinny
    ``(key, id)`` pairs for within-value order — the
    ``curriculum_schedule`` pattern. Text then moves ONCE: a bucketed
    hash join ships each doc's tokens to its rank-chunk, docs within
    ``window−1`` of a chunk boundary replicate to the next chunk
    (every window pair meets in exactly one chunk — the one owning
    its LOWER rank), and per-chunk verification is a local sorted
    sweep. No all-to-all sort barrier, no quadratic candidate set.
    """
    import re as _re

    from .relational import partial_groupby
    from .windows import _add_key_bucket

    w = int(window)
    assert w >= 2 and 2 * (w - 1) <= chunk_size

    # ---- stage 1: global rank from skinny (key, id) pairs ----
    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(key_col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    hist = partial_groupby(
        ds.select_columns([key_col]), [key_col], batch_agg, ["n"])
    hist = hist.sort_values(key_col)
    offs = dict(zip(hist[key_col],
                    hist["n"].cumsum().shift(fill_value=0).astype(int)))
    oref = ray.put(offs)

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(oref)
        g = group.sort_values([key_col, id_col],
                              kind="stable").reset_index(drop=True)
        within = g.groupby(key_col, sort=False).cumcount().to_numpy()
        rank = np.array([offsets[k] for k in g[key_col]],
                        dtype=np.int64) + within
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "_rank": rank})

    ranks = _add_key_bucket(ds.select_columns([key_col, id_col]),
                            key_col, num_buckets) \
        .groupby("_sbucket").map_groups(rank_bucket,
                                        batch_format="pandas")

    # ---- stage 2: tokens join ranks, chunk + boundary replication ----
    tok_re = _re.compile(r"[a-z0-9]+")

    def tokens_batch(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "_toks": [sorted(set(tok_re.findall(t.lower())))
                      for t in b[text_col]]})

    toks = ds.select_columns([id_col, text_col]).map_batches(
        tokens_batch, batch_format="pandas")
    from .relational import hash_join
    joined = hash_join(toks, ranks, on=id_col,
                       num_buckets=num_buckets).materialize()

    def chunk_expand(b: pd.DataFrame) -> pd.DataFrame:
        r = b["_rank"].to_numpy()
        home = b.assign(_chunk=r // chunk_size)
        spill = b[(r % chunk_size) < (w - 1)].copy()
        spill["_chunk"] = (spill["_rank"].to_numpy() // chunk_size) - 1
        out = pd.concat([home, spill[spill["_chunk"] >= 0]],
                        ignore_index=True)
        return out

    def verify_chunk(g: pd.DataFrame) -> pd.DataFrame:
        chunk = int(g["_chunk"].iloc[0])
        lo_rank = chunk * chunk_size
        g = g.sort_values("_rank", kind="stable").reset_index(drop=True)
        ranks_v = g["_rank"].to_numpy()
        ids_v = g[id_col].to_numpy()
        toks_v = [set(t) for t in g["_toks"]]
        out_a, out_b, out_d, out_j = [], [], [], []
        for i in range(len(g)):
            # guests (replicated from the NEXT chunk's first w−1
            # ranks) may only appear as the higher side of a pair —
            # their own pairs are owned by their home chunk
            if ranks_v[i] >= lo_rank + chunk_size:
                continue
            for j in range(i + 1, len(g)):
                d = ranks_v[j] - ranks_v[i]
                if d >= w:
                    break
                ti, tj = toks_v[i], toks_v[j]
                inter = len(ti & tj)
                union = len(ti) + len(tj) - inter
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    out_a.append(int(ids_v[i]))
                    out_b.append(int(ids_v[j]))
                    out_d.append(int(d))
                    out_j.append(jac)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "rank_dist": pd.Series(out_d, dtype="int64"),
                             "jaccard": pd.Series(out_j,
                                                  dtype="float64")})

    pairs = (joined.map_batches(chunk_expand, batch_format="pandas")
             .groupby("_chunk").map_groups(verify_chunk,
                                           batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "rank_dist": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def pair_transitivity(pairs: pd.DataFrame) -> pd.DataFrame:
    """Transitivity audit of a similarity-pair graph — the statistic
    that justifies (or indicts) cluster-style dedup: threshold graphs
    are not transitive in general (a~b, b~c do NOT imply a~c), and
    the global clustering coefficient 3·triangles / wedges measures
    how close this one comes. Low transitivity = transitive-closure
    dedup is over-merging through chains.

    Exact integers: wedges = Σ_v C(deg(v), 2) from the degree
    histogram; triangles by the standard ordered two-path join (each
    triangle counted once). Input is the (a, b) pair table (already
    the skinny O(pairs) artifact of a blocked join); at 10^9 pairs
    both counts run as bucketed joins — here the pair table is
    driver-sized by construction. Output one row: (n_nodes, n_pairs,
    n_wedges, n_triangles, transitivity)."""
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    deg: dict = {}
    adj: dict = {}
    for u, v in zip(a, b):
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    edge_set = {(u, v) if u < v else (v, u) for u, v in zip(a, b)}
    for u, v in edge_set:
        tri += len(adj[u] & adj[v])
    tri //= 3          # each triangle counted once per edge
    return pd.DataFrame({
        "n_nodes": pd.Series([len(deg)], dtype="int64"),
        "n_pairs": pd.Series([len(edge_set)], dtype="int64"),
        "n_wedges": pd.Series([wedges], dtype="int64"),
        "n_triangles": pd.Series([tri], dtype="int64"),
        "transitivity": [3.0 * tri / wedges if wedges else 0.0]})
