"""Product quantization (PQ) for embedding columns — the memory-scale
ANN path (Jégou, Douze, Schmid: "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Why this tier exists: brute-force (`ops.ann.brute_force_topk`) streams
the full float vectors through every scan — at 10^9 × 768-d float32
that is ~3 TB moved per query batch. PQ splits each (L2-normalized)
vector into ``m`` subvectors, quantizes each against a 2^b-entry
per-subspace codebook, and stores only the ``m`` uint8 codes: 768-d
float32 → 8 bytes is a 384× compression, so the scan reads codes, not
vectors, and distance evaluation is ``m`` table lookups per vector
(ADC — asymmetric distance computation: the *query* stays exact).

Scale shape:
  - codebooks train driver-side on a sample (k-means over m subspaces —
    the model is m·ks·(d/m) = ks·d floats, tiny) and broadcast once
    via ``ray.put``;
  - encoding is a map-only pass (one GEMM per subspace per batch);
  - the query scan precomputes per-query distance tables (Q, m, ks)
    once per actor, then each code batch costs m fancy-indexed adds —
    no shuffle, partial top-k per batch, driver merges k×Q rows.
  - compose with IVF (`ops.ann.assign_ivf_lists`) for IVFPQ: partition
    codes by list, probe only ``nprobe`` partitions.

Cosine geometry: inputs are L2-normalized before training/encoding, so
squared-L2 ADC order == descending-cosine order (‖a−b‖² = 2−2·cosθ on
the unit sphere).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .ann import _normalize
from .veckit import vec_matrix


def pq_train(sample: np.ndarray, m: int = 8, ks: int = 32,
             iters: int = 12, seed: int = 13) -> np.ndarray:
    """Per-subspace Lloyd k-means on a driver-side sample.

    Returns codebooks of shape (m, ks, d//m); d must divide by m.
    Deterministic (fixed seed, ties to lowest index via argmin).
    """
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        cent = x[rng.choice(n, ks, replace=(n < ks))].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                mem = x[assign == c]
                if len(mem):
                    cent[c] = mem.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(ds: ray.data.Dataset, codebooks: np.ndarray,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """Map-only encode: (id, pq_code:list<uint8>) — m bytes per vector.

    Per batch, per subspace: one ‖x−c‖² argmin via the expanded form
    (x² colapses under argmin, so just −2·x·cᵀ + ‖c‖²) — a GEMM, not a
    Python loop. Codebooks broadcast once via ``ray.put``.
    """
    m, ks, sub = codebooks.shape
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(bref)
        x = _normalize(vec_matrix(batch, vec_col))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]
            cj = books[j]                              # (ks, sub)
            scores = -2.0 * (xj @ cj.T) + (cj * cj).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(scores, axis=1).astype(np.uint8)
        return pa.table({
            id_col: batch.column(id_col),
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def _code_matrix(batch: pa.Table, col: str = "pq_code") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = arr.type.list_size
    flat = arr.values.to_numpy(zero_copy_only=False)
    off = arr.offset * m
    return flat[off:off + len(arr) * m].reshape(len(arr), m)


def pq_topk(codes: ray.data.Dataset, codebooks: np.ndarray,
            queries: np.ndarray, query_ids: list, k: int = 10,
            id_col: str = "vec_id",
            exclude_self: bool = True) -> pa.Table:
    """ADC top-k scan over PQ codes: (query_id, rank, vec_id, adc_dist).

    Distance tables (Q, m, ks) build once per task from the exact
    queries; each code batch then costs m fancy-indexed (Q, B) adds.
    Ties break by ascending vec_id (deterministic). ``adc_dist`` is the
    approximate squared L2 on the unit sphere (2−2·cos estimate).
    """
    m, ks, sub = codebooks.shape
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    tables = np.empty((len(qn), m, ks), dtype=np.float64)
    for j in range(m):
        qj = qn[:, j * sub:(j + 1) * sub]              # (Q, sub)
        cj = codebooks[j]                              # (ks, sub)
        tables[:, j, :] = (
            (qj * qj).sum(axis=1)[:, None]
            - 2.0 * (qj @ cj.T)
            + (cj * cj).sum(axis=1)[None, :])
    tref = ray.put((tables, list(query_ids)))

    def partial(batch: pa.Table) -> pa.Table:
        tabs, qids = ray.get(tref)
        cm = _code_matrix(batch)                       # (B, m)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        dist = np.zeros((tabs.shape[0], len(cm)))      # (Q, B)
        for j in range(m):
            dist += tabs[:, j, cm[:, j]]
        take = min(k + 1, dist.shape[1])
        idx = np.argpartition(dist, take - 1, axis=1)[:, :take]
        return pa.table({
            "query_id": pa.array(np.repeat(np.asarray(qids), take)),
            "vec_id": pa.array(ids[idx].ravel().astype(np.int64)),
            "adc_dist": pa.array(
                np.take_along_axis(dist, idx, axis=1).ravel(),
                pa.float64()),
        })

    partials = codes.map_batches(partial, batch_format="pyarrow",
                                 batch_size=8192).take_all()
    per_query: dict = {}
    for r in partials:
        per_query.setdefault(r["query_id"], []).append(
            (r["adc_dist"], r["vec_id"]))
    rows = {"query_id": [], "rank": [], "vec_id": [], "adc_dist": []}
    for qid in query_ids:
        cands = per_query.get(qid, [])
        if exclude_self:
            cands = [c for c in cands if c[1] != qid]
        for rank, (dist, vid) in enumerate(heapq.nsmallest(k, cands), 1):
            rows["query_id"].append(qid)
            rows["rank"].append(rank)
            rows["vec_id"].append(vid)
            rows["adc_dist"].append(round(dist, 6))
    return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int64()),
                     "vec_id": pa.array(rows["vec_id"], pa.int64()),
                     "adc_dist": pa.array(rows["adc_dist"], pa.float64())})


def ivfpq_topk(ds: ray.data.Dataset, codebooks: np.ndarray,
               centroids: np.ndarray, queries: np.ndarray,
               query_ids: list, k: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id",
               exclude_self: bool = True) -> "pa.Table":
    """IVF + PQ composed (the FAISS ``IVFx,PQy`` shape): vectors are
    assigned to IVF lists (`ops.ann.assign_ivf_lists`) and PQ-encoded
    in ONE fused map pass; the query scan prunes to the ``nprobe``
    nearest lists with a vectorized Arrow ``is_in`` filter and runs the
    ADC table scan only over surviving codes. At 10^9 vectors this is
    the full recipe: codes are m bytes/vector AND only
    nprobe/num_lists of them are read per query batch — with a
    ``write_parquet(partition_cols=["ivf_list"])`` layout the pruning
    happens at the read.

    All queries share one probe-list union here (one filtered scan —
    right when queries are a batch over the same corpus); per-query
    list routing would shard the scan instead.
    """
    import pyarrow.compute as pc

    from .ann import assign_ivf_lists

    m, ks, sub = codebooks.shape
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # nprobe nearest lists per query, unioned
    sims = qn @ cn.T                                   # (Q, L)
    nprobe = min(nprobe, sims.shape[1])
    probe = np.unique(
        np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe])
    probe_arr = pa.array(probe.astype(np.int32))

    assigned = assign_ivf_lists(ds, cn, vec_col=vec_col)

    def encode_pruned(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.is_in(batch.column("ivf_list"),
                                     value_set=probe_arr))
        books = codebooks
        x = _normalize(vec_matrix(keep, vec_col))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]
            cj = books[j]
            scores = -2.0 * (xj @ cj.T) + (cj * cj).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(scores, axis=1).astype(np.uint8)
        return pa.table({
            id_col: keep.column(id_col),
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m),
        })

    codes = assigned.map_batches(encode_pruned, batch_format="pyarrow")
    return pq_topk(codes, codebooks, queries, query_ids, k=k,
                   id_col=id_col, exclude_self=exclude_self)
