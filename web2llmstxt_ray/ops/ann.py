"""Similarity search over an embedding column (``list<float>``).

Two paths:

- **Brute-force top-k** (the correctness baseline): the query matrix is
  tiny and broadcasts via ``ray.put``; each data batch computes one
  float64 matmul block and its per-batch partial top-k; the driver
  merges partials (k × queries rows — small). One pass, no shuffle.
- **IVF (inverted file)**: k-means centroids trained on a sample
  (driver-side numpy — the model is small), every vector assigned to
  its nearest centroid inside ``map_batches``, queries probe only the
  ``nprobe`` nearest lists. The scale path: at 10^9+ vectors the
  assignment column doubles as the partition key for a
  ``write_parquet(partition_cols=["ivf_list"])`` layout so probes read
  only matching partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


from .veckit import vec_matrix  # noqa: F401  (re-export: public API here)


class _PartialTopK:
    """Per-batch partial top-k against the broadcast query matrix
    (task stage with per-worker memoized state — see ops.stagecache)."""

    def __init__(self, qref, k: int, vec_col: str, id_col: str):
        self.qn, self.qids = ray.get(qref)
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        sims = self.qn @ _normalize(vec_matrix(batch, self.vec_col)).T  # (Q, B)
        take = min(self.k + 1, sims.shape[1])
        # vectorized partial top-k across all queries at once
        idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]   # (Q, take)
        rows_q = np.repeat(np.asarray(self.qids), take)
        rows_v = ids[idx].ravel()
        rows_c = np.take_along_axis(sims, idx, axis=1).ravel()
        return pa.table({"query_id": pa.array(rows_q),
                         "vec_id": pa.array(rows_v.astype(np.int64)),
                         "cosine": pa.array(rows_c, pa.float64())})


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k: (query_id, rank, vec_id, cosine).

    Ties broken by ascending ``vec_id`` (total order → deterministic
    and oracle-matchable). ``exclude_self`` drops hits where
    ``vec_id == query_id`` (querying the corpus by its own members).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qn, list(query_ids)))

    from .stagecache import cached_stage

    partials = ds.map_batches(
        cached_stage(_PartialTopK, qref=qref, k=k, vec_col=vec_col,
                     id_col=id_col),
        batch_format="pyarrow", batch_size=4096).take_all()
    # driver merge: k per query from the partial top-k's
    per_query: dict = {}
    for r in partials:
        per_query.setdefault(r["query_id"], []).append(
            (-r["cosine"], r["vec_id"]))
    rows = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
    for qid in query_ids:
        cands = per_query.get(qid, [])
        if exclude_self:
            cands = [c for c in cands if c[1] != qid]
        best = heapq.nsmallest(k, cands)   # (-cos, vec_id): ties → low id
        for rank, (negcos, vid) in enumerate(best, 1):
            rows["query_id"].append(qid)
            rows["rank"].append(rank)
            rows["vec_id"].append(vid)
            rows["cosine"].append(round(-negcos, 6))
    return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int64()),
                     "vec_id": pa.array(rows["vec_id"], pa.int64()),
                     "cosine": pa.array(rows["cosine"], pa.float64())})


def label_centroids(ds: ray.data.Dataset, label_col: str = "label",
                    vec_col: str = "embedding",
                    round_to: int = 6):
    """Per-label mean embedding via the partial-aggregation pattern:
    each batch emits one (label, sum-vector, count) partial — a handful
    of rows per block regardless of row count — and the driver combines
    ``O(blocks × labels)`` partials and divides. The embedding-QA /
    class-prototype primitive; no shuffle of the vectors themselves.

    Returns a pandas frame (label, dim, mean_v) — flat so it is
    SQL-oracle-comparable.
    """
    import pandas as pd
    import pyarrow as pa

    from .veckit import vec_matrix

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        mat = vec_matrix(batch, vec_col)
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            sel = mat[labels == lab]
            out_l.append(int(lab))
            out_s.append(sel.sum(axis=0).tolist())
            out_n.append(len(sel))
        return pa.table({
            label_col: pa.array(out_l, pa.int64()),
            "_sum": pa.array(out_s, pa.list_(pa.float64())),
            "_n": pa.array(out_n, pa.int64()),
        })

    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        lab = row[label_col]
        v = np.asarray(row["_sum"], dtype=np.float64)
        if lab in sums:
            sums[lab] += v
            counts[lab] += row["_n"]
        else:
            sums[lab] = v
            counts[lab] = row["_n"]
    rows = []
    for lab in sorted(sums):
        mean = sums[lab] / counts[lab]
        for d, v in enumerate(mean):
            rows.append((lab, d + 1, round(float(v), round_to)))
    return pd.DataFrame(rows, columns=[label_col, "dim", "mean_v"])


def centroid_cosine_matrix(ds: ray.data.Dataset,
                           label_col: str = "label",
                           vec_col: str = "embedding",
                           round_to: int = 6) -> pd.DataFrame:
    """Pairwise cosine similarity between the per-label mean
    embeddings — the class-separation / embedding-QA matrix (low
    inter-centroid cosine = well-separated prototypes). Rides the SAME
    O(blocks × labels) sum-vector partials as :func:`label_centroids`
    (one map-only pass, vectors never shuffle); the k² cosine matrix
    is O(labels²) driver work on the tiny centroid table.

    Output: (label_a, label_b, cosine) for label_a < label_b, sorted.
    """
    import pandas as pd

    cent = label_centroids(ds, label_col, vec_col, round_to=12)
    wide = cent.pivot(index=label_col, columns="dim", values="mean_v")
    labs = wide.index.to_numpy()
    m = wide.to_numpy(np.float64)
    dots = m @ m.T
    norms = np.sqrt(np.einsum("ij,ij->i", m, m))
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            c = dots[i, j] / (norms[i] * norms[j])
            rows.append((int(labs[i]), int(labs[j]),
                         round(float(c), round_to)))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cosine"])


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, num_lists: int, iters: int = 10,
                    seed: int = 11) -> np.ndarray:
    """Plain Lloyd k-means on a driver-side sample (deterministic)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    centroids = sample[rng.choice(len(sample), num_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(num_lists):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                centroids[c] = v / n if n else centroids[c]
    return centroids


def kmeans_fit(ds: ray.data.Dataset, k: int, vec_col: str = "embedding",
               iters: int = 10, seed: int = 11, sample_size: int = 4096,
               tol: float = 1e-6) -> tuple[np.ndarray, dict]:
    """Distributed spherical Lloyd k-means over the FULL dataset.

    ``train_centroids`` runs on a driver-side sample — fine for IVF
    bootstrap, but at 10^9+ vectors the sample can miss cluster
    structure. This refinement keeps every iteration shuffle-free:
    each batch assigns its vectors to the nearest centroid (one GEMM)
    and emits ONE partial row of per-centroid (sum-vector, count, sse);
    the driver folds O(blocks × k) partials — k×d state, never the
    vectors — and broadcasts the new centroids for the next pass. The
    classic MapReduce-Lloyd shape.

    Init: deterministic driver-sample Lloyd (``train_centroids`` on
    the first ``sample_size`` rows). Cosine geometry throughout
    (inputs and centroids L2-normalized — matches the IVF index).
    Empty clusters keep their previous centroid. Stops early when the
    max centroid shift drops below ``tol``.

    Returns (centroids, info) with info = {iters_run, sse_per_iter}.
    """
    ds = ds.materialize()
    # to_pandas, not take_all: take_all on a materialized dataset
    # launches a fresh streaming execution (~seconds of overhead)
    sample = np.asarray(
        ds.limit(sample_size).to_pandas()[vec_col].tolist(),
        dtype=np.float64)
    centroids = train_centroids(sample, k, iters=3, seed=seed)

    sse_hist: list[float] = []
    it_run = 0
    for it in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cent = ray.get(cref)
            vn = _normalize(vec_matrix(batch, vec_col))
            sims = vn @ cent.T                       # (B, k)
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(vn)), assign]
            sums = np.zeros_like(cent)
            np.add.at(sums, assign, vn)
            counts = np.bincount(assign, minlength=len(cent))
            # spherical SSE: sum of (1 - cos) to the assigned centroid
            sse = float(np.sum(1.0 - best))
            return pa.table({
                "cid": pa.array(np.arange(len(cent), dtype=np.int64)),
                "_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "_n": pa.array(counts.astype(np.int64)),
                "_sse": pa.array([sse] + [0.0] * (len(cent) - 1),
                                 pa.float64()),
            })

        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        sse = 0.0
        for row in ds.map_batches(partial,
                                  batch_format="pyarrow").take_all():
            sums[row["cid"]] += np.asarray(row["_sum"], dtype=np.float64)
            counts[row["cid"]] += row["_n"]
            sse += row["_sse"]
        newc = centroids.copy()
        nonempty = counts > 0
        means = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(means, axis=1)
        ok = norms > 0
        rows_idx = np.flatnonzero(nonempty)[ok]
        newc[rows_idx] = means[ok] / norms[ok, None]
        shift = float(np.max(np.linalg.norm(newc - centroids, axis=1)))
        centroids = newc
        sse_hist.append(sse)
        it_run = it + 1
        if shift < tol:
            break
    return centroids, {"iters_run": it_run, "sse_per_iter": sse_hist}


def kmeans_assign(ds: ray.data.Dataset, centroids: np.ndarray,
                  vec_col: str = "embedding",
                  out_col: str = "cluster") -> ray.data.Dataset:
    """Append the nearest-centroid id (cosine) — identical broadcast
    shape to :func:`assign_ivf_lists`, with a caller-chosen column."""
    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        a = np.argmax(_normalize(vec_matrix(batch, vec_col)) @ cent.T,
                      axis=1)
        return batch.append_column(out_col, pa.array(a.astype(np.int32)))

    return ds.map_batches(assign, batch_format="pyarrow")


def assign_ivf_lists(ds: ray.data.Dataset, centroids: np.ndarray,
                     vec_col: str = "embedding") -> ray.data.Dataset:
    """Append ``ivf_list`` (nearest-centroid id) — the partition key."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    class _Assign:
        def __init__(self):
            self.centroids = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = vec_matrix(batch, vec_col)
            assign = np.argmax(_normalize(vecs) @ self.centroids.T, axis=1)
            return batch.append_column("ivf_list",
                                       pa.array(assign.astype(np.int32)))

    return ds.map_batches(_Assign, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=0.5)


def ivf_topk(ds: ray.data.Dataset, centroids: np.ndarray,
             queries: np.ndarray, query_ids: list, k: int = 10,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", exclude_self: bool = True) -> pa.Table:
    """Approximate top-k: probe only the ``nprobe`` nearest inverted
    lists per query. Same output schema as :func:`brute_force_topk`;
    recall measured against it in tests."""
    assigned = assign_ivf_lists(ds, centroids, vec_col)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    probe_lists = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    wanted = sorted({int(l) for row in probe_lists for l in row})
    wanted_arr = pa.array(wanted, pa.int32())

    def probe_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("ivf_list"),
                                     value_set=wanted_arr))

    sub = assigned.map_batches(probe_filter, batch_format="pyarrow")
    qsel: dict[int, list[int]] = {}
    for qi, row in enumerate(probe_lists):
        for l in row:
            qsel.setdefault(int(l), []).append(qi)
    ref = ray.put((qn, list(query_ids), qsel))

    class _Probe:
        def __init__(self):
            self.qn, self.qids, self.qsel = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist())
            lists = np.asarray(batch.column("ivf_list").to_pylist())
            vn = _normalize(vec_matrix(batch, vec_col))
            out = {"query_id": [], "vec_id": [], "cosine": []}
            for lst in np.unique(lists):
                qis = self.qsel.get(int(lst), [])
                if not qis:
                    continue
                mask = lists == lst
                sims = self.qn[qis] @ vn[mask].T
                sel_ids = ids[mask]
                for row_i, qi in enumerate(qis):
                    take = min(k, sims.shape[1])
                    idx = np.argpartition(-sims[row_i], take - 1)[:take]
                    for j in idx:
                        out["query_id"].append(self.qids[qi])
                        out["vec_id"].append(int(sel_ids[j]))
                        out["cosine"].append(float(sims[row_i, j]))
            return pa.table({"query_id": pa.array(out["query_id"]),
                             "vec_id": pa.array(out["vec_id"], pa.int64()),
                             "cosine": pa.array(out["cosine"], pa.float64())})

    partials = sub.map_batches(_Probe, batch_format="pyarrow",
                               batch_size=2048, concurrency=(1, 8),
                               num_cpus=0.5).take_all()
    per_query: dict = {}
    for r in partials:
        per_query.setdefault(r["query_id"], []).append(
            (-r["cosine"], r["vec_id"]))
    rows = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
    for qid in query_ids:
        cands = per_query.get(qid, [])
        if exclude_self:
            cands = [c for c in cands if c[1] != qid]
        best = heapq.nsmallest(k, set(cands))
        for rank, (negcos, vid) in enumerate(best, 1):
            rows["query_id"].append(qid)
            rows["rank"].append(rank)
            rows["vec_id"].append(vid)
            rows["cosine"].append(round(-negcos, 6))
    return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int64()),
                     "vec_id": pa.array(rows["vec_id"], pa.int64()),
                     "cosine": pa.array(rows["cosine"], pa.float64())})


# ---------------------------------------------------------------------------
# KNN self-join (per-document neighbor graph)
# ---------------------------------------------------------------------------


def knn_join(ds: ray.data.Dataset, k: int = 5, chunk_size: int = 4096,
             vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Exact k-nearest-neighbor SELF-join: for every vector, its top-k
    cosine neighbors (excluding itself) — the document-similarity-graph
    primitive behind SemDeDup-style curation and diversity analysis.

    Exact all-pairs KNN is inherently O(N²); the distributed shape
    keeps every pass streaming: queries are taken CHUNK at a time
    (``iter_batches`` — one chunk of driver memory, never the corpus),
    each chunk broadcasts via ``ray.put`` and scans the corpus with the
    same per-batch partial-top-k GEMM as :func:`brute_force_topk`.
    Total passes = N / chunk_size; per-pass driver state is
    O(chunk × k). The sub-quadratic scale tier is
    :func:`knn_join_ivf`.

    Ties broken by ascending neighbor id (oracle-matchable).
    """
    ds = ds.select_columns([id_col, vec_col]).materialize()
    parts: list[pa.Table] = []
    for qb in ds.iter_batches(batch_size=chunk_size,
                              batch_format="pyarrow"):
        qids = qb.column(id_col).to_pylist()
        parts.append(brute_force_topk(
            ds, vec_matrix(qb, vec_col), qids, k=k,
            vec_col=vec_col, id_col=id_col, exclude_self=True))
    return pa.concat_tables(parts)


def knn_join_ivf(ds: ray.data.Dataset, k: int = 5, num_lists: int = 16,
                 nprobe: int = 3, vec_col: str = "embedding",
                 id_col: str = "vec_id", sample_size: int = 4096,
                 merge_buckets: int = 32, seed: int = 11,
                 as_dataset: bool = False
                 ) -> "pa.Table | ray.data.Dataset":
    """Approximate KNN self-join, fully distributed — nothing
    corpus-sized touches the driver and no corpus broadcast:

    1. k-means centroids on a bounded sample (small model, broadcast).
    2. Every vector is REPLICATED to its ``nprobe`` nearest lists
       (×nprobe expansion) tagged ``_owner`` on its rank-0 list.
    3. ``groupby(list).map_groups``: within a list, queries = all
       replicas, members = owners only; one GEMM + per-query partial
       top-k. List count ~sqrt(N) keeps group cardinality bounded
       (no 1-row-block pathology); balance comes from k-means.
    4. Per-query merge of the ≤ nprobe×k candidates via hash-bucketed
       pandas top-k (a (q, m) pair occurs at most once globally: m has
       one owner list).

    Recall vs :func:`knn_join` is measured in tests; raise ``nprobe``
    / ``num_lists`` to trade cost for recall.
    """
    import pandas as pd

    ds = ds.select_columns([id_col, vec_col]).materialize()
    # to_pandas, not take_all (fresh-execution overhead on a
    # materialized dataset — see BASELINE.md round-3 finding)
    sample = np.asarray(
        ds.limit(sample_size).to_pandas()[vec_col].tolist(),
        dtype=np.float64)
    centroids = train_centroids(sample, num_lists, seed=seed)
    cref = ray.put(_normalize(centroids))

    def replicate(batch: pa.Table) -> pa.Table:
        # vectors normalized ONCE here and shipped as a fixed-size-list
        # f64 column: zero-copy reshape on the other side of the
        # shuffle, no per-row conversion anywhere
        cent = ray.get(cref)
        vn = _normalize(vec_matrix(batch, vec_col))
        order = np.argsort(-(vn @ cent.T), axis=1)[:, :nprobe]  # (B, P)
        n = len(vn)
        take_idx = pa.array(np.repeat(np.arange(n), nprobe))
        owner = np.tile(np.arange(nprobe) == 0, n)
        flat = np.repeat(vn, nprobe, axis=0).ravel()
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), vn.shape[1])
        return pa.table({
            id_col: batch.column(id_col).take(take_idx),
            "_vecn": vec_arr,
            "_plist": pa.array(order.ravel().astype(np.int32)),
            "_owner": pa.array(owner),
        })

    replicated = ds.map_batches(replicate, batch_format="pyarrow")

    _empty = pa.table({"query_id": pa.array([], pa.int64()),
                       "vec_id": pa.array([], pa.int64()),
                       "cosine": pa.array([], pa.float64())})

    def knn_within(group: pa.Table) -> pa.Table:
        own = group.column("_owner").to_numpy(zero_copy_only=False)
        if not own.any():
            return _empty
        arr = group.column("_vecn").combine_chunks()
        mat = arr.values.to_numpy(zero_copy_only=False).reshape(
            len(own), arr.type.list_size)
        qids = group.column(id_col).to_numpy(zero_copy_only=False)
        mids = qids[own]
        sims = mat @ mat[own].T                        # (Q, M)
        sims[qids[:, None] == mids[None, :]] = -2.0    # exclude self
        take = min(k, sims.shape[1])
        idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        return pa.table({
            "query_id": pa.array(np.repeat(qids, take)),
            "vec_id": pa.array(mids[idx].ravel()),
            "cosine": pa.array(
                np.take_along_axis(sims, idx, axis=1).ravel(),
                pa.float64()),
        })

    cands = replicated.groupby("_plist").map_groups(
        knn_within, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch.column("query_id").to_pylist(), np.uint64)
        b = ((q * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
             ).astype(np.int32) % merge_buckets
        return batch.append_column("_mb", pa.array(b))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        group = group[group["cosine"] > -2.0]
        group = group.sort_values(
            ["query_id", "cosine", "vec_id"],
            ascending=[True, False, True], kind="mergesort")
        top = group.groupby("query_id", sort=True).head(k).copy()
        top["rank"] = top.groupby("query_id").cumcount() + 1
        top["cosine"] = top["cosine"].round(6)
        return top[["query_id", "rank", "vec_id", "cosine"]]

    out = (cands.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_mb")
                .map_groups(merge_bucket, batch_format="pandas"))
    if as_dataset:
        # O(N·k) result rows stay distributed (write_parquet / further
        # stages); row set identical to the collected form, unsorted
        return out
    df = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(df.reset_index(drop=True))


def mmr_select(ds: ray.data.Dataset, query_vec: np.ndarray,
               k: int = 20, lam: float = 0.5,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> "pa.Table":
    """Diverse subset selection by greedy Maximal Marginal Relevance:
    repeatedly pick ``argmax lam·cos(query, x) − (1−lam)·max_{s∈S}
    cos(s, x)`` — the standard redundancy-penalized selection a
    curated training subset or retrieval result list uses.

    Distribution shape: the greedy step is inherently sequential in k,
    but each step is ONE map-only pass — the ≤k selected vectors
    broadcast (ray.put), every block computes its candidates'
    relevance and max-sim-to-selected in two GEMMs and emits only its
    block argmax (O(blocks) rows to the driver per step). Nothing
    corpus-sized leaves the workers; total work is k passes (k is
    user-small). Ties break by ascending id. Input is materialized
    once so the k passes don't re-execute parent lineage.

    Greedy selection is not SQL-expressible without recursion — the
    conformance gate is the sequential-oracle pytest
    (tests/test_ann_textstats.py)."""
    ds = ds.materialize()
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    selected_ids: list[int] = []
    selected_rows: list[np.ndarray] = []
    out = {"rank": [], id_col: [], "relevance": [], "mmr_score": []}
    for step in range(k):
        sel_mat = (np.stack(selected_rows)
                   if selected_rows else np.zeros((0, len(q))))
        state = ray.put((q, sel_mat, set(selected_ids), float(lam)))

        def block_best(batch: pa.Table, state_ref=state) -> pa.Table:
            qv, sel, taken, l = ray.get(state_ref)
            X = vec_matrix(batch, vec_col).astype(np.float64)
            Xn = _normalize(X)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            rel = Xn @ qv
            pen = (Xn @ sel.T).max(axis=1) if len(sel) else \
                np.zeros(len(ids))
            score = l * rel - (1.0 - l) * pen
            mask = np.fromiter((int(i) not in taken for i in ids),
                               bool, len(ids))
            if not mask.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "relevance": pa.array([], pa.float64()),
                                 "mmr_score": pa.array([], pa.float64()),
                                 "_vec": pa.array([], pa.list_(
                                     pa.float64()))})
            cand = np.flatnonzero(mask)
            # block argmax, ties -> low id
            order = np.lexsort((ids[cand], -score[cand]))
            b = cand[order[0]]
            return pa.table({
                id_col: pa.array([int(ids[b])], pa.int64()),
                "relevance": pa.array([float(rel[b])], pa.float64()),
                "mmr_score": pa.array([float(score[b])], pa.float64()),
                "_vec": pa.array([Xn[b].tolist()],
                                 pa.list_(pa.float64())),
            })

        parts = ds.map_batches(block_best,
                               batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        parts = parts.sort_values(["mmr_score", id_col],
                                  ascending=[False, True],
                                  kind="stable")
        top = parts.iloc[0]
        selected_ids.append(int(top[id_col]))
        selected_rows.append(np.asarray(top["_vec"], dtype=np.float64))
        out["rank"].append(step + 1)
        out[id_col].append(int(top[id_col]))
        out["relevance"].append(float(top["relevance"]))
        out["mmr_score"].append(float(top["mmr_score"]))
    return pa.table({
        "rank": pa.array(out["rank"], pa.int64()),
        id_col: pa.array(out[id_col], pa.int64()),
        "relevance": pa.array(out["relevance"], pa.float64()),
        "mmr_score": pa.array(out["mmr_score"], pa.float64()),
    })


def centroid_silhouette(ds: ray.data.Dataset, label_col: str = "label",
                        vec_col: str = "embedding",
                        round_to: int = 6) -> pd.DataFrame:
    """Simplified (centroid-based) silhouette per label — the
    cluster-separation QA score: for each vector, ``a`` = distance to
    its own label's centroid, ``b`` = distance to the nearest OTHER
    centroid, ``s = (b − a)/max(a, b)``; report the per-label mean.

    Same scale shape as :func:`label_centroids`: centroids come from
    O(blocks × labels) sum-vector partials (rounded to 12 decimals —
    the :func:`centroid_cosine_matrix` convention the SQL oracle
    mirrors), broadcast once, and the per-vector pass is map-only
    (one ``(X − c_l)²`` row-sum per label — the direct form, NOT the
    GEMM expansion, so near-centroid cancellation can't amplify float
    error past the 6-decimal hash gate). Only O(blocks × labels)
    (sum_s, n) partials reach the driver. Output:
    (label, n, silhouette).
    """
    from .veckit import vec_matrix

    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col,
                           round_to=12)
    labs = np.array(sorted(cent[label_col].unique()), dtype=np.int64)
    dmax = int(cent["dim"].max())
    C = np.zeros((len(labs), dmax), dtype=np.float64)
    pos = {int(l): i for i, l in enumerate(labs)}
    for lab, dim, m in cent.itertuples(index=False):
        C[pos[int(lab)], int(dim) - 1] = m
    C_ref = ray.put(C)
    labs_ref = ray.put(labs)

    def partial(batch: pa.Table) -> pa.Table:
        Cm = ray.get(C_ref)
        lv = ray.get(labs_ref)
        X = vec_matrix(batch, vec_col).astype(np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d2 = np.empty((len(X), len(lv)), dtype=np.float64)
        for j in range(len(lv)):
            diff = X - Cm[j]
            d2[:, j] = (diff * diff).sum(axis=1)
        own = np.searchsorted(lv, y)
        a2 = d2[np.arange(len(X)), own]
        d2[np.arange(len(X)), own] = np.inf
        b2 = d2.min(axis=1)
        a, b = np.sqrt(a2), np.sqrt(b2)
        s = (b - a) / np.maximum(a, b)
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(y):
            sel = s[y == lab]
            out_l.append(int(lab))
            out_s.append(float(sel.sum()))
            out_n.append(len(sel))
        return pa.table({
            label_col: pa.array(out_l, pa.int64()),
            "_s": pa.array(out_s, pa.float64()),
            "_n": pa.array(out_n, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    agg = parts.groupby(label_col, as_index=False).agg(
        _s=("_s", "sum"), n=("_n", "sum"))
    agg["silhouette"] = (agg["_s"] / agg["n"]).round(round_to)
    agg["n"] = agg["n"].astype("int64")
    return (agg[[label_col, "n", "silhouette"]]
            .sort_values(label_col).reset_index(drop=True))


def mutual_top1_pairs(ds: ray.data.Dataset, id_col: str = "vec_id",
                      vec_col: str = "embedding", scale_bits: int = 15,
                      num_blocks: int = 4, num_buckets: int = 32,
                      as_dataset: bool = False
                      ) -> "pd.DataFrame | ray.data.Dataset":
    """Reciprocal nearest-neighbor pairs — (a, b) where b is a's single
    best match AND a is b's: the high-precision alignment/dedup seed
    set (mutual-NN is the standard filter that survives when one-sided
    top-1 is polluted by hubs).

    EXACT and deterministic: vectors quantize once to integers
    ``floor(x·2^scale_bits + 0.5)`` (the float64 product of two
    quantized coords is exact below 2^53 — asserted from the
    component bound), similarity is the integer dot product, and ties
    break to the LOWER candidate id, so the result is independent of
    partitioning and replayable integer-for-integer in SQL.

    Scale shape (the :func:`~web2llmstxt_ray.ops.dedup.ngram_jaccard_pairs`
    block-pair scheme): each vector lands in block ``hash(id) % B`` and
    ships to the B tasks whose block-pair touches it; every task runs
    ONE float64 GEMM over its two block matrices ((N/B)² · d work,
    hub-free by construction) and emits per-id partial argmax rows;
    a bucket combine folds partials by ``(dot desc, id asc)``; the
    mutual check is an in-bucket pair match on the O(N) best-match
    table (never a driver union-find). ``as_dataset=True`` keeps the
    O(pairs) result distributed. Output: (a, b, dot), sorted.
    """
    import pandas as pd

    from .dedup import _id_blocks
    from .veckit import vec_matrix

    scale = float(1 << scale_bits)
    # |q| ≤ 8·2^sb ⇒ dot ≤ d·(8·2^sb)² must stay below 2^53 for the
    # float64 GEMM to be exact — asserted per batch on the raw bound
    def quantize(batch: pa.Table) -> pa.Table:
        X = vec_matrix(batch, vec_col).astype(np.float64)
        if X.size and np.abs(X).max() > 8.0:
            raise ValueError("mutual_top1_pairs: |component| > 8 breaks "
                             "the exact-integer-dot contract at "
                             f"scale_bits={scale_bits}")
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        blocks = _id_blocks(ids.tolist(), num_blocks).astype(np.int64)
        n, d = Q.shape if Q.size else (0, 0)
        # replicate each vector to its B touching block-pair tasks —
        # all-numpy (no per-row Python), list column built zero-copy
        others = np.arange(num_blocks, dtype=np.int64)
        p = np.minimum(blocks[:, None], others[None, :])
        q = np.maximum(blocks[:, None], others[None, :])
        tasks = (p * num_blocks + q).reshape(-1)
        rep_ids = np.repeat(ids, num_blocks)
        rep_blk = np.repeat(blocks, num_blocks)
        rep_q = np.repeat(Q, num_blocks, axis=0) if n else \
            np.empty((0, 0), dtype=np.int64)
        iv = pa.FixedSizeListArray.from_arrays(
            pa.array(rep_q.reshape(-1), pa.int64()), d or 1)
        return pa.table({
            "_task": pa.array(tasks.astype(np.int32)),
            "_block": pa.array(rep_blk.astype(np.int32)),
            id_col: pa.array(rep_ids, pa.int64()),
            "_iv": iv,
        })

    def _best(D: np.ndarray, cand_ids: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """Per-row (max dot, min candidate id among ties); -inf rows
        (no candidates) return dot = INT64_MIN sentinel."""
        m = D.max(axis=1)
        tie = D == m[:, None]
        idc = np.where(tie, cand_ids[None, :], np.iinfo(np.int64).max)
        return m, idc.min(axis=1)

    NEG = float(-(1 << 62))

    def scan_task(group: pd.DataFrame) -> pd.DataFrame:
        task = int(group["_task"].iloc[0])
        p, q = task // num_blocks, task % num_blocks
        ids = group[id_col].to_numpy()
        blk = group["_block"].to_numpy()
        M = np.array([np.asarray(v, dtype=np.int64) for v in group["_iv"]],
                     dtype=np.float64)
        out_ids, out_dot, out_best = [], [], []
        if p == q:
            if len(ids) < 2:
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "_dot": pd.Series([], dtype="int64"),
                                     "_cand": pd.Series([], dtype="int64")})
            D = M @ M.T
            np.fill_diagonal(D, NEG)
            dot, best = _best(D, ids)
            out_ids, out_dot, out_best = ids, dot, best
        else:
            li = np.flatnonzero(blk == p)
            ri = np.flatnonzero(blk == q)
            if not len(li) or not len(ri):
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "_dot": pd.Series([], dtype="int64"),
                                     "_cand": pd.Series([], dtype="int64")})
            D = M[li] @ M[ri].T
            dl, bl = _best(D, ids[ri])
            dr, br = _best(D.T, ids[li])
            out_ids = np.concatenate([ids[li], ids[ri]])
            out_dot = np.concatenate([dl, dr])
            out_best = np.concatenate([bl, br])
        keep = out_dot > NEG
        return pd.DataFrame({id_col: np.asarray(out_ids)[keep],
                             "_dot": np.asarray(out_dot)[keep]
                             .astype(np.int64),
                             "_cand": np.asarray(out_best)[keep]})

    partials = (ds.select_columns([id_col, vec_col])
                .map_batches(quantize, batch_format="pyarrow")
                .groupby("_task").map_groups(scan_task,
                                             batch_format="pandas"))

    def id_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_cb"] = (_id_blocks(b[id_col].tolist(), num_buckets)
                    .astype(np.int32))
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "_dot", "_cand"],
                          ascending=[True, False, True], kind="stable")
        return g.groupby(id_col, as_index=False).head(1)[
            [id_col, "_dot", "_cand"]]

    best = (partials.map_batches(id_bucket, batch_format="pandas",
                                 batch_size=None)
            .groupby("_cb").map_groups(combine, batch_format="pandas"))

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(b[id_col].to_numpy(), b["_cand"].to_numpy())
        b = b.copy()
        b["_pb"] = _id_blocks(lo.tolist(), num_buckets).astype(np.int32)
        return b

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        i = g[id_col].to_numpy()
        c = g["_cand"].to_numpy()
        d = g["_dot"].to_numpy()
        fwd = i < c
        left = pd.DataFrame({"a": i[fwd], "b": c[fwd], "dot": d[fwd]})
        right = pd.DataFrame({"a": c[~fwd], "b": i[~fwd]})
        out = left.merge(right, on=["a", "b"])
        return out[["a", "b", "dot"]]

    pairs = (best.map_batches(pair_bucket, batch_format="pandas",
                              batch_size=None)
             .groupby("_pb").map_groups(mutual, batch_format="pandas"))
    if as_dataset:
        return pairs
    df = pairs.to_pandas()
    for col in ("a", "b", "dot"):
        df[col] = df[col].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def lsh_bucket_balance(ds: ray.data.Dataset,
                       vec_col: str = "embedding",
                       n_planes: int = 8,
                       scale_bits: int = 15) -> "pd.DataFrame":
    """Random-hyperplane LSH bucket occupancy histogram — the
    pre-flight audit that tells you whether a signed-projection
    bucketing will balance BEFORE you shuffle 10^9 vectors by it
    (a skewed embedding distribution collapses into few buckets and
    turns the LSH near-dup join quadratic).

    EXACT and deterministic: hyperplane weights derive from md5
    (``int(md5(f'{plane},{dim}')[:8], 16) % 2001 − 1000`` — stateless,
    replayed verbatim by the SQL twin), vectors quantize to integers
    ``floor(x·2^scale_bits + 0.5)`` (the :func:`mutual_top1_pairs`
    rule), and each sign bit comes from an INTEGER dot product — no
    float summation order can flip a bit. MAP-ONLY: per-block bucket
    histograms are additive, the driver folds O(blocks · 2^planes)
    rows and never sees a vector. Output: (bucket, n_vecs) for the
    non-empty buckets, sorted by bucket.
    """
    import hashlib

    import pandas as pd

    from .veckit import vec_matrix

    scale = float(1 << scale_bits)
    state: dict[str, np.ndarray] = {}

    def weights(d: int) -> np.ndarray:
        W = state.get("W")
        if W is None or W.shape[1] != d:
            W = np.array(
                [[int(hashlib.md5(f"{p},{dim}".encode())
                      .hexdigest()[:8], 16) % 2001 - 1000
                  for dim in range(d)] for p in range(n_planes)],
                dtype=np.int64)
            state["W"] = W
        return W

    pows = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        X = vec_matrix(batch, vec_col).astype(np.float64)
        if not X.size:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        if np.abs(X).max() > 8.0:
            raise ValueError("lsh_bucket_balance: |component| > 8 "
                             "breaks the exact-integer-dot contract "
                             f"at scale_bits={scale_bits}")
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        W = weights(Q.shape[1])
        bits = (Q @ W.T >= 0).astype(np.int64)      # (n, planes)
        bucket = bits @ pows
        b, c = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n_vecs": pa.array(c.astype(np.int64),
                                            pa.int64())})

    parts = ds.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                             "n_vecs": pd.Series([], dtype="int64")})
    agg = parts.groupby("bucket", as_index=False)["n_vecs"].sum()
    agg["bucket"] = agg["bucket"].astype("int64")
    agg["n_vecs"] = agg["n_vecs"].astype("int64")
    return agg.sort_values("bucket").reset_index(drop=True)


def emb_norm_profile(ds: ray.data.Dataset,
                     vec_col: str = "embedding",
                     label_col: str = "label",
                     scale_bits: int = 15,
                     num_buckets: int = 32) -> "pd.DataFrame":
    """Per-label embedding-norm profile: exact discrete quartiles of
    the INTEGER squared norm ``Σ floor(x·2^sb + 0.5)²`` — the
    did-the-encoder-drift / is-this-label-degenerate gauge (collapsed
    or exploded norms are the first symptom of a bad embedding
    batch), with no float summation anywhere.

    Block-local (label, norm², count) histogram partials are additive
    and finish in ONE label-hash shuffle; quartiles follow the exact
    integer-ceil rule (smallest value with cum ≥ ceil(q·n)) per label
    in-bucket. Output: (label, n_vecs, p25, p50, p75), sorted.
    """
    import pandas as pd

    from .veckit import vec_matrix

    scale = float(1 << scale_bits)

    def partial(batch: pa.Table) -> pa.Table:
        X = vec_matrix(batch, vec_col).astype(np.float64)
        if not X.size:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n2": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "_lb": pa.array([], pa.int32())})
        if np.abs(X).max() > 8.0:
            raise ValueError("emb_norm_profile: |component| > 8 "
                             "breaks the exact-integer contract at "
                             f"scale_bits={scale_bits}")
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        n2 = (Q * Q).sum(axis=1)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"label": lab, "n2": n2})
        agg = df.groupby(["label", "n2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        agg["_lb"] = (pd.util.hash_pandas_object(agg["label"],
                                                 index=False)
                      % num_buckets).astype("int32")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_bucket(group: "pd.DataFrame") -> "pd.DataFrame":
        hist = group.groupby(["label", "n2"], as_index=False)[
            "c"].sum()

        def disc_q(vals, cum, n, num, den):
            # smallest value with cum >= ceil(num*n/den), exact ints
            need = (num * n + den - 1) // den
            return int(vals[int(np.searchsorted(cum, need,
                                                side="left"))])

        rows = []
        for lab, gh in hist.groupby("label"):
            gh = gh.sort_values("n2")
            vals = gh["n2"].to_numpy(np.int64)
            cum = np.cumsum(gh["c"].to_numpy(np.int64))
            n = int(cum[-1])
            rows.append((int(lab), n,
                         disc_q(vals, cum, n, 1, 4),
                         disc_q(vals, cum, n, 1, 2),
                         disc_q(vals, cum, n, 3, 4)))
        return pd.DataFrame(rows, columns=["label", "n_vecs",
                                           "p25", "p50", "p75"])

    out = (ds.select_columns([vec_col, label_col])
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
           .groupby("_lb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({
            "label": pd.Series([], dtype="int64"),
            "n_vecs": pd.Series([], dtype="int64"),
            "p25": pd.Series([], dtype="int64"),
            "p50": pd.Series([], dtype="int64"),
            "p75": pd.Series([], dtype="int64")})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


def dimension_drift(ds: ray.data.Dataset,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    split_id: int | None = None,
                    scale_bits: int = 15,
                    num_buckets: int = 0) -> "pd.DataFrame":
    """Per-dimension embedding drift between two halves of the corpus
    (ids below vs at-or-above ``split_id``): exact quantized-integer
    coordinate sums per dimension, so each half's per-dim mean — and
    their delta — involves exactly one float division. A single
    dimension drifting is the classic symptom of an encoder version
    change or a bad feature pipeline; norms alone won't show it.

    MAP-ONLY: per-block O(2·d) integer sum vectors are additive, the
    driver folds O(blocks · d) rows and never sees a vector. If
    ``split_id`` is None the median id splits (computed from an
    O(blocks) min/max — callers wanting the exact median pass it).
    Output: (dim, n_a, n_b, mean_a, mean_b, delta), sorted by dim.
    """
    import pandas as pd

    from .veckit import vec_matrix

    scale = float(1 << scale_bits)

    if split_id is None:
        mm = ds.select_columns([id_col]).map_batches(
            lambda b: pd.DataFrame({"lo": [int(b[id_col].min())],
                                    "hi": [int(b[id_col].max())]})
            if len(b) else pd.DataFrame({"lo": [], "hi": []}),
            batch_format="pandas", batch_size=None).to_pandas()
        split_id = (int(mm["lo"].min()) + int(mm["hi"].max()) + 1) // 2

    def partial(batch: pa.Table) -> pa.Table:
        X = vec_matrix(batch, vec_col).astype(np.float64)
        if not X.size:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "side": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        if np.abs(X).max() > 8.0:
            raise ValueError("dimension_drift: |component| > 8 "
                             "breaks the exact-integer contract")
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = Q.shape[1]
        rows = {"dim": [], "side": [], "n": [], "s": []}
        for side, mask in (("a", ids < split_id),
                           ("b", ids >= split_id)):
            if mask.any():
                sums = Q[mask].sum(axis=0)
                rows["dim"].extend(range(d))
                rows["side"].extend([side] * d)
                rows["n"].extend([int(mask.sum())] * d)
                rows["s"].extend(int(v) for v in sums)
        return pa.table({"dim": pa.array(rows["dim"], pa.int64()),
                         "side": pa.array(rows["side"], pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "s": pa.array(rows["s"], pa.int64())})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "dim": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "mean_a": pd.Series([], dtype="float64"),
            "mean_b": pd.Series([], dtype="float64"),
            "delta": pd.Series([], dtype="float64")})
    agg = parts.groupby(["dim", "side"], as_index=False)[
        ["n", "s"]].sum()
    a = agg[agg["side"] == "a"].set_index("dim")
    b = agg[agg["side"] == "b"].set_index("dim")
    dims = sorted(set(agg["dim"]))
    out_rows = []
    for d in dims:
        na = int(a["n"].get(d, 0))
        nb = int(b["n"].get(d, 0))
        sa = int(a["s"].get(d, 0))
        sb = int(b["s"].get(d, 0))
        ma = float(sa) / (scale * float(na)) if na else float("nan")
        mb = float(sb) / (scale * float(nb)) if nb else float("nan")
        out_rows.append((d, na, nb, ma, mb, mb - ma))
    out = pd.DataFrame(out_rows, columns=["dim", "n_a", "n_b",
                                          "mean_a", "mean_b",
                                          "delta"])
    for c in ("dim", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values("dim").reset_index(drop=True)


def knn_label_accuracy(ds: ray.data.Dataset,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label",
                       scale_bits: int = 15,
                       num_blocks: int = 4,
                       num_buckets: int = 32) -> "pd.DataFrame":
    """Leave-one-out 1-NN label coherence of an embedding space: for
    every vector, does its single nearest OTHER vector carry the same
    label? Per-label accuracy is the fastest honest answer to 'is
    this embedding any good for classification' — no training, no
    hyperparameters, and a collapsed/noisy space scores at chance.

    EXACT: the :func:`mutual_top1_pairs` contract — vectors quantize
    to ``floor(x·2^sb + 0.5)`` integers, similarity is the integer
    dot, ties break to the lower candidate id — so the chosen
    neighbor (and the accuracy) is partitioning-proof and replayed
    verbatim by the CROSS-JOIN-argmax SQL twin. Scale shape: the
    hub-free block-pair GEMM + per-id argmax combine, then the label
    attach is TWO skinny hash joins of the O(N) best-match table
    against the (id, label) table; per-label (n, n_correct) partials
    are additive. Output: (label, n, n_correct, accuracy), sorted.
    """
    import pandas as pd

    from .dedup import _id_blocks
    from .veckit import vec_matrix

    scale = float(1 << scale_bits)

    def quantize(batch: pa.Table) -> pa.Table:
        X = vec_matrix(batch, vec_col).astype(np.float64)
        if X.size and np.abs(X).max() > 8.0:
            raise ValueError("knn_label_accuracy: |component| > 8 "
                             "breaks the exact-integer-dot contract")
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        blocks = _id_blocks(ids.tolist(), num_blocks).astype(np.int64)
        n, d = Q.shape if Q.size else (0, 0)
        others = np.arange(num_blocks, dtype=np.int64)
        p = np.minimum(blocks[:, None], others[None, :])
        q = np.maximum(blocks[:, None], others[None, :])
        tasks = (p * num_blocks + q).reshape(-1)
        rep_ids = np.repeat(ids, num_blocks)
        rep_blk = np.repeat(blocks, num_blocks)
        rep_q = np.repeat(Q, num_blocks, axis=0) if n else \
            np.empty((0, 0), dtype=np.int64)
        iv = pa.FixedSizeListArray.from_arrays(
            pa.array(rep_q.reshape(-1), pa.int64()), d or 1)
        return pa.table({
            "_task": pa.array(tasks.astype(np.int32)),
            "_block": pa.array(rep_blk.astype(np.int32)),
            id_col: pa.array(rep_ids, pa.int64()),
            "_iv": iv,
        })

    def _best(D: np.ndarray, cand_ids: np.ndarray):
        m = D.max(axis=1)
        tie = D == m[:, None]
        idc = np.where(tie, cand_ids[None, :],
                       np.iinfo(np.int64).max)
        return m, idc.min(axis=1)

    NEG = float(-(1 << 62))

    def scan_task(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "_dot": pd.Series([], dtype="int64"),
                              "_cand": pd.Series([], dtype="int64")})
        ids = group[id_col].to_numpy()
        blk = group["_block"].to_numpy()
        task = int(group["_task"].iloc[0])
        p, q = task // num_blocks, task % num_blocks
        M = np.array([np.asarray(v, dtype=np.int64)
                      for v in group["_iv"]], dtype=np.float64)
        if p == q:
            if len(ids) < 2:
                return empty
            D = M @ M.T
            np.fill_diagonal(D, NEG)
            dot, best = _best(D, ids)
            out_ids, out_dot, out_best = ids, dot, best
        else:
            li = np.flatnonzero(blk == p)
            ri = np.flatnonzero(blk == q)
            if not len(li) or not len(ri):
                return empty
            D = M[li] @ M[ri].T
            dl, bl = _best(D, ids[ri])
            dr, br = _best(D.T, ids[li])
            out_ids = np.concatenate([ids[li], ids[ri]])
            out_dot = np.concatenate([dl, dr])
            out_best = np.concatenate([bl, br])
        keep = np.asarray(out_dot) > NEG
        return pd.DataFrame({id_col: np.asarray(out_ids)[keep],
                             "_dot": np.asarray(out_dot)[keep]
                             .astype(np.int64),
                             "_cand": np.asarray(out_best)[keep]})

    partials = (ds.select_columns([id_col, vec_col])
                .map_batches(quantize, batch_format="pyarrow")
                .groupby("_task").map_groups(scan_task,
                                             batch_format="pandas"))

    def id_bucket(col: str):
        def _b(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_cb"] = (_id_blocks(b[col].tolist(), num_buckets)
                        .astype(np.int32))
            return b
        return _b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "_dot", "_cand"],
                          ascending=[True, False, True],
                          kind="stable")
        return g.groupby(id_col, as_index=False).head(1)[
            [id_col, "_dot", "_cand"]]

    best = (partials.map_batches(id_bucket(id_col),
                                 batch_format="pandas",
                                 batch_size=None)
            .groupby("_cb").map_groups(combine,
                                       batch_format="pandas"))

    def join_own(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_s"] == "b"][[id_col, "_cand"]]
        rhs = g[g["_s"] == "l"][[id_col, "_lab"]]
        return lhs.merge(rhs, on=id_col)

    # explicit block-level schema alignment (see tagged2 below)
    def b_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "_cand": b["_cand"].astype("int64"),
            "_lab": np.int64(-1), "_s": "b"})

    def lab_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "_cand": np.int64(-1),
            "_lab": b[label_col].astype("int64"), "_s": "l"})

    tagged = best.map_batches(b_side, batch_format="pandas",
                              batch_size=None).union(
        ds.select_columns([id_col, label_col]).map_batches(
            lab_side, batch_format="pandas", batch_size=None))

    own = (tagged.map_batches(id_bucket(id_col),
                              batch_format="pandas",
                              batch_size=None)
           .groupby("_cb").map_groups(join_own,
                                      batch_format="pandas"))

    def join_cand(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_s"] == "o"][["_key", "_lab"]]
        rhs = g[g["_s"] == "l"][["_key", "_clab"]]
        m = lhs.merge(rhs, on="_key")
        m["_ok"] = (m["_lab"] == m["_clab"]).astype("int64")
        return m.groupby("_lab", as_index=False).agg(
            n=("_ok", "size"), n_correct=("_ok", "sum"))

    # align both union sides to ONE explicit (key, lab, clab, side)
    # schema — map_batches sees raw per-block frames, so the union
    # must be well-typed block-by-block, not by groupby alignment
    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_key": b["_cand"].astype("int64"),
            "_lab": b["_lab"].astype("int64"),
            "_clab": np.int64(-1), "_s": "o"})

    def l_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_key": b[id_col].astype("int64"),
            "_lab": np.int64(-1),
            "_clab": b[label_col].astype("int64"), "_s": "l"})

    tagged2 = own.map_batches(o_side, batch_format="pandas",
                              batch_size=None).union(
        ds.select_columns([id_col, label_col]).map_batches(
            l_side, batch_format="pandas", batch_size=None))

    def cand_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_cb"] = (_id_blocks(b["_key"].tolist(), num_buckets)
                    .astype(np.int32))
        return b

    parts = (tagged2.map_batches(cand_bucket,
                                 batch_format="pandas",
                                 batch_size=None)
             .groupby("_cb").map_groups(join_cand,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "label": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "n_correct": pd.Series([], dtype="int64"),
            "accuracy": pd.Series([], dtype="float64")})
    agg = parts.groupby("_lab", as_index=False)[
        ["n", "n_correct"]].sum()
    out = pd.DataFrame({"label": agg["_lab"].astype("int64"),
                        "n": agg["n"].astype("int64"),
                        "n_correct": agg["n_correct"]
                        .astype("int64")})
    out["accuracy"] = out["n_correct"].to_numpy(np.float64) \
        / out["n"].to_numpy(np.float64)
    return out.sort_values("label").reset_index(drop=True)


def davies_bouldin(ds: ray.data.Dataset, label_col: str = "label",
                   vec_col: str = "embedding",
                   round_to: int = 6) -> pd.DataFrame:
    """Davies–Bouldin cluster-quality components per label: scatter
    ``s_i = sqrt(Σ‖x − C_i‖² / n_i)`` (RMS distance to own centroid)
    and ``db_i = max_{j≠i} (s_i + s_j)/‖C_i − C_j‖`` — the
    worst-confusable-neighbor ratio whose mean is the classic DB
    index (lower = tighter, better-separated clusters). The companion
    gauge to :func:`centroid_silhouette` that names WHICH cluster each
    one is most confusable with.

    Same scale shape as the silhouette: centroids from
    O(blocks × labels) sum-vector partials (12-decimal rounding — the
    convention the SQL twin mirrors), broadcast once; ONE map-only
    pass accumulates per-label (Σ‖x − C_i‖², n) partials — squared
    sums, so the per-block partials are additive and no sqrt happens
    before the driver fold; the k² ratio matrix is O(labels²) driver
    work. Output: (label, n, scatter, db_component), sorted."""
    import pandas as pd

    from .veckit import vec_matrix

    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col,
                           round_to=12)
    labs = np.array(sorted(cent[label_col].unique()), dtype=np.int64)
    dmax = int(cent["dim"].max())
    C = np.zeros((len(labs), dmax), dtype=np.float64)
    pos = {int(l): i for i, l in enumerate(labs)}
    for lab, dim, m in cent.itertuples(index=False):
        C[pos[int(lab)], int(dim) - 1] = m
    C_ref = ray.put(C)
    labs_ref = ray.put(labs)

    def partial(batch: pa.Table) -> pa.Table:
        Cm = ray.get(C_ref)
        lv = ray.get(labs_ref)
        X = vec_matrix(batch, vec_col).astype(np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        own = np.searchsorted(lv, y)
        diff = X - Cm[own]                 # direct form, no GEMM
        d2 = (diff * diff).sum(axis=1)
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(y):
            sel = d2[y == lab]
            out_l.append(int(lab))
            out_s.append(float(sel.sum()))
            out_n.append(len(sel))
        return pa.table({
            label_col: pa.array(out_l, pa.int64()),
            "_d2": pa.array(out_s, pa.float64()),
            "_n": pa.array(out_n, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    agg = parts.groupby(label_col, as_index=False).agg(
        _d2=("_d2", "sum"), n=("_n", "sum")).sort_values(label_col)
    s = np.sqrt(agg["_d2"].to_numpy(np.float64)
                / agg["n"].to_numpy(np.float64))
    k = len(labs)
    db = np.full(k, np.nan)
    if k >= 2:
        cd = np.sqrt(((C[:, None, :] - C[None, :, :]) ** 2)
                     .sum(axis=2))
        for i in range(k):
            r = [(s[i] + s[j]) / cd[i, j]
                 for j in range(k) if j != i and cd[i, j] > 0]
            if r:
                db[i] = max(r)
    return pd.DataFrame({
        label_col: agg[label_col].astype("int64").to_numpy(),
        "n": agg["n"].astype("int64").to_numpy(),
        "scatter": np.round(s, round_to),
        "db_component": np.round(db, round_to)})


def kcenter_select(ds: ray.data.Dataset, k: int = 16,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> "pa.Table":
    """Gonzalez farthest-point traversal — the classic 2-approximation
    k-center CORESET selection a curated training subset uses when the
    objective is coverage RADIUS (every point near some center) rather
    than MMR's relevance-diversity blend: start from the smallest id,
    then repeatedly add the point whose cosine distance
    ``1 − max_{s∈S} cos(s, x)`` to its nearest selected center is
    MAXIMAL (ties → ascending id).

    Same distribution shape as :func:`mmr_select`: inherently
    sequential in k, but each step is ONE map-only pass — the ≤k
    selected vectors broadcast, every block computes its candidates'
    nearest-center similarity in one GEMM and emits only its block
    arg-max (O(blocks) rows to the driver per step). The DuckDB twin
    replays the traversal exactly with a recursive CTE. Output:
    (rank, id, dist) where dist is the selection-time distance to the
    nearest prior center (rank 1 = the seed, dist 0)."""
    ds = ds.materialize()

    first = ds.map_batches(
        lambda b: pa.table({id_col: pa.array(
            [np.asarray(b.column(id_col), dtype=np.int64).min()],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()[id_col].min()

    def fetch_vec(doc_id: int) -> np.ndarray:
        rows = ds.map_batches(
            lambda b, d=doc_id: b.filter(pa.array(
                np.asarray(b.column(id_col), dtype=np.int64) == d)),
            batch_format="pyarrow").take_all()
        return np.asarray(rows[0][vec_col], dtype=np.float64)

    sel_ids = [int(first)]
    sel_rows = [_normalize(fetch_vec(int(first))[None, :])[0]]
    out = {"rank": [1], id_col: [int(first)], "dist": [0.0]}
    for step in range(1, k):
        state = ray.put((np.stack(sel_rows), set(sel_ids)))

        def block_far(batch: pa.Table, state_ref=state) -> pa.Table:
            sel, taken = ray.get(state_ref)
            X = vec_matrix(batch, vec_col).astype(np.float64)
            Xn = _normalize(X)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            dist = 1.0 - (Xn @ sel.T).max(axis=1)
            mask = np.fromiter((int(i) not in taken for i in ids),
                               bool, len(ids))
            if not mask.any():
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                    "_vec": pa.array([], pa.list_(pa.float64()))})
            cand = np.flatnonzero(mask)
            order = np.lexsort((ids[cand], -dist[cand]))
            b = cand[order[0]]
            return pa.table({
                id_col: pa.array([int(ids[b])], pa.int64()),
                "dist": pa.array([float(dist[b])], pa.float64()),
                "_vec": pa.array([Xn[b].tolist()],
                                 pa.list_(pa.float64()))})

        parts = ds.map_batches(block_far,
                               batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        parts = parts.sort_values(["dist", id_col],
                                  ascending=[False, True], kind="stable")
        top = parts.iloc[0]
        sel_ids.append(int(top[id_col]))
        sel_rows.append(np.asarray(top["_vec"], dtype=np.float64))
        out["rank"].append(step + 1)
        out[id_col].append(int(top[id_col]))
        out["dist"].append(float(top["dist"]))
    return pa.table({
        "rank": pa.array(out["rank"], pa.int64()),
        id_col: pa.array(out[id_col], pa.int64()),
        "dist": pa.array(out["dist"], pa.float64()),
    })


class _MedoidScoreArgmin:
    """Second medoid pass: score every member against the broadcast
    per-label moments and emit one (label, argmin-id, score) partial
    per block; exact score ties break to the smaller id."""

    def __init__(self, mref, label_col: str, id_col: str, vec_col: str):
        self.sums, self.qs, self.ns = ray.get(mref)
        self.label_col, self.id_col = label_col, id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels = batch.column(self.label_col).to_numpy(
            zero_copy_only=False)
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        mat = vec_matrix(batch, self.vec_col)
        sq = (mat * mat).sum(axis=1)
        out = {"label": [], "id": [], "score": []}
        for lab in np.unique(labels):
            sel = np.nonzero(labels == lab)[0]
            s, q, n = self.sums[lab], self.qs[lab], self.ns[lab]
            scores = n * sq[sel] - 2.0 * (mat[sel] @ s) + q
            order = np.lexsort((ids[sel], scores))
            out["label"].append(int(lab))
            out["id"].append(int(ids[sel][order[0]]))
            out["score"].append(float(scores[order[0]]))
        return pa.table({
            "label": pa.array(out["label"], pa.int64()),
            "id": pa.array(out["id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64())})


def label_medoids(ds: ray.data.Dataset, label_col: str = "label",
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact per-label MEDOID under the sum-of-squared-L2 objective —
    the representative REAL member (unlike the centroid, which is
    synthetic): argmin_i Σ_j ‖x_i − x_j‖². The naive form is O(n²·d)
    per label; the moment identity

        Σ_j ‖x_i − x_j‖² = n·‖x_i‖² − 2·x_i·s + q,
        s = Σ_j x_j (vector),  q = Σ_j ‖x_j‖²

    makes it TWO LINEAR passes: one partial-agg pass folds (n, s, q)
    per label (O(blocks × labels) skinny rows to the driver — the
    ``label_centroids`` shape), the moments broadcast once, and a
    second pass scores every member locally and emits one per-block
    argmin partial. Exact ties break to the smaller id; float-sum
    reassociation vs the SQL twin is tolerance-registered and the
    winner's margin over the runner-up is pytest-asserted to dwarf
    it. Output: (label, medoid_id, n, score) ordered by label."""
    import pandas as pd

    from .stagecache import cached_stage
    from .veckit import vec_matrix

    def moments(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        mat = vec_matrix(batch, vec_col)
        sq = (mat * mat).sum(axis=1)
        out_l, out_s, out_q, out_n = [], [], [], []
        for lab in np.unique(labels):
            sel = labels == lab
            out_l.append(int(lab))
            out_s.append(mat[sel].sum(axis=0).tolist())
            out_q.append(float(sq[sel].sum()))
            out_n.append(int(sel.sum()))
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "_s": pa.array(out_s, pa.list_(pa.float64())),
                         "_q": pa.array(out_q, pa.float64()),
                         "_n": pa.array(out_n, pa.int64())})

    slim = ds.select_columns([id_col, label_col, vec_col])
    sums: dict[int, np.ndarray] = {}
    qs: dict[int, float] = {}
    ns: dict[int, int] = {}
    for row in slim.map_batches(moments,
                                batch_format="pyarrow").take_all():
        lab = row["label"]
        vec = np.asarray(row["_s"], dtype=np.float64)
        sums[lab] = sums.get(lab, 0.0) + vec
        qs[lab] = qs.get(lab, 0.0) + row["_q"]
        ns[lab] = ns.get(lab, 0) + row["_n"]
    mref = ray.put((sums, qs, ns))
    parts = slim.map_batches(
        cached_stage(_MedoidScoreArgmin, mref=mref, label_col=label_col,
                     id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow").take_all()
    best: dict[int, tuple] = {}
    for r in parts:
        key = (r["score"], r["id"])
        if r["label"] not in best or key < best[r["label"]]:
            best[r["label"]] = key
    rows = [(lab, best[lab][1], ns[lab], best[lab][0])
            for lab in sorted(best)]
    return pd.DataFrame(rows, columns=[
        "label", "medoid_id", "n", "score"]).astype(
        {"label": "int64", "medoid_id": "int64", "n": "int64"})
