"""DSIR-style data selection via importance resampling.

DSIR (Xie et al., NeurIPS 2023 — "Data Selection for Language Models
via Importance Resampling") selects raw-corpus documents that look
like a small trusted TARGET corpus: fit bag-of-hashed-n-gram unigram
models p (target) and q (raw), weight every raw document by
``log w(x) = Σ_features c_x(f)·(log p_f − log q_f)``, then sample
without replacement with Gumbel-perturbed top-k (equivalent to
sampling ∝ w). The reference engine has nothing like it; at 100 TB
this is the standard "get me Wikipedia-like slices of the crawl" tier
above the heuristic (`ops/textstats.py`) and model-perplexity
(`ops/lm.py`) filters.

Distributed shape (no corpus shuffle anywhere):

- **features**: unigram + bigram word hashes (FNV via
  ``functions.urls.hash64_batch`` — dictionary-encoded, vectorized)
  folded into ``num_buckets`` hash buckets.
- **fit** (:func:`hashed_ngram_counts`): one map pass per corpus;
  each batch emits ONE partial row (a ``num_buckets`` int64 vector =
  the batch's bucket histogram); the driver sums O(batches) rows.
- **score** (:func:`dsir_logweights`): the add-α-smoothed log-ratio
  vector λ (num_buckets floats) broadcasts once; per batch the doc
  scores are one ``np.bincount(doc_ids, weights=λ[buckets])`` — fully
  vectorized after the per-doc tokenize.
- **select** (:func:`dsir_sample`): Gumbel keys are derived from
  ``hash64(seed|doc_id)`` (deterministic across runs, partitionings
  and cluster shapes — no RNG state); per-batch partial top-k rows
  stream to the driver which merges O(batches × k).

Determinism: integer bucket counts are order-free; λ is a pure
function of the folded counts; per-doc weight sums accumulate in
token order within each doc (bincount element order), independent of
batching because bigrams never cross document boundaries.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.urls import hash64, hash64_batch

__all__ = ["hashed_ngram_counts", "dsir_logweights", "dsir_sample"]

_BI_PRIME = np.uint64(0x100000001B3)


def _doc_ngram_buckets(texts: list, num_buckets: int):
    """Flatten a batch of texts into (bucket_id, doc_id) pairs over
    unigram + within-doc bigram hash features. One ``hash64_batch``
    call for the whole batch; bigrams mix adjacent token hashes with
    an FNV-prime multiply (never across doc boundaries)."""
    toks_per_doc = [(t or "").lower().split() for t in texts]
    lengths = np.asarray([len(x) for x in toks_per_doc], dtype=np.int64)
    flat = [w for toks in toks_per_doc for w in toks]
    n_docs = len(texts)
    if not flat:
        return (np.empty(0, np.int64), np.empty(0, np.int64), n_docs)
    h = hash64_batch(flat)                                   # uint64
    uni_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    nb = np.uint64(num_buckets)
    uni_b = (h % nb).astype(np.int64)
    # bigrams: adjacent positions whose pair stays inside one doc
    if len(h) > 1:
        with np.errstate(over="ignore"):
            mix = (h[:-1] * _BI_PRIME) ^ h[1:]
        same_doc = uni_doc[:-1] == uni_doc[1:]
        bi_b = (mix[same_doc] % nb).astype(np.int64)
        bi_doc = uni_doc[:-1][same_doc]
        return (np.concatenate([uni_b, bi_b]),
                np.concatenate([uni_doc, bi_doc]), n_docs)
    return uni_b, uni_doc, n_docs


def hashed_ngram_counts(ds: ray.data.Dataset, num_buckets: int = 8192,
                        text_col: str = "text") -> np.ndarray:
    """Corpus bucket histogram: one int64 vector, folded from one
    partial row per batch."""
    def partial(batch: pa.Table) -> pa.Table:
        b, _, _ = _doc_ngram_buckets(batch.column(text_col).to_pylist(),
                                     num_buckets)
        counts = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pa.table({"_counts": pa.array([counts.tolist()],
                                             pa.list_(pa.int64()))})

    total = np.zeros(num_buckets, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total += np.asarray(row["_counts"], dtype=np.int64)
    return total


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
              alpha: float = 1.0) -> np.ndarray:
    """λ = log p − log q with add-α smoothing on both models."""
    tc = target_counts.astype(np.float64)
    rc = raw_counts.astype(np.float64)
    b = len(tc)
    logp = np.log(tc + alpha) - math.log(tc.sum() + alpha * b)
    logq = np.log(rc + alpha) - math.log(rc.sum() + alpha * b)
    return logp - logq


def dsir_logweights(ds: ray.data.Dataset, lam: np.ndarray,
                    num_buckets: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """(id, logw) per document; λ broadcasts once via ``ray.put``."""
    nb = num_buckets or len(lam)
    lref = ray.put(np.asarray(lam, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        lv = ray.get(lref)
        texts = batch.column(text_col).to_pylist()
        b, d, n_docs = _doc_ngram_buckets(texts, nb)
        logw = np.bincount(d, weights=lv[b], minlength=n_docs)
        return pa.table({
            id_col: batch.column(id_col),
            "logw": pa.array(logw, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _gumbel_keys(ids: np.ndarray, logw: np.ndarray,
                 seed: int) -> np.ndarray:
    """key = logw + Gumbel(0,1) noise from a stable per-id hash —
    sampling ∝ exp(logw) without replacement when taking top-k."""
    u = np.asarray([hash64(f"{seed}|{i}") for i in ids],
                   dtype=np.float64)
    u = (u + 1.0) / 18446744073709551618.0              # (0, 1) open
    return logw - np.log(-np.log(u))


def dsir_sample(raw: ray.data.Dataset, target: ray.data.Dataset,
                k: int, num_buckets: int = 8192, alpha: float = 1.0,
                seed: int = 0, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Full DSIR pass: fit target/raw hashed-n-gram models, weight
    every raw doc, Gumbel-top-k select ``k`` docs. Returns
    (doc_id, logw, rank) sorted by rank. Driver state is
    O(num_buckets + batches × k); the corpus never shuffles."""
    raw = raw.materialize()                  # consumed twice: fit + score
    tc = hashed_ngram_counts(target, num_buckets, text_col)
    rc = hashed_ngram_counts(raw, num_buckets, text_col)
    lam = log_ratio(tc, rc, alpha)
    scored = dsir_logweights(raw, lam, num_buckets, text_col, id_col)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist())
        logw = np.asarray(batch.column("logw").to_pylist(), np.float64)
        keys = _gumbel_keys(ids, logw, seed)
        take = min(k, len(ids))
        idx = np.argpartition(-keys, take - 1)[:take] if take else []
        return pa.table({
            id_col: pa.array(ids[idx]),
            "logw": pa.array(logw[idx], pa.float64()),
            "_key": pa.array(keys[idx], pa.float64()),
        })

    rows = scored.map_batches(partial_topk,
                              batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["_key"], r[id_col]))
    rows = rows[:k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows]),
        "logw": pa.array([round(r["logw"], 6) for r in rows],
                         pa.float64()),
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
    })
