"""Density-based clustering (DBSCAN) over an embedding column.

The missing member of the clustering family next to k-means
(``semantic_dedup``'s partitioner) and the connectivity family
(``ops/graph.py``): clusters are ε-density-connected regions, points
classify as CORE (≥ ``min_pts`` neighbors within ``eps``, self
included), BORDER (non-core within ``eps`` of a core) or NOISE — the
shape-agnostic, outlier-aware segmentation a fixed-k partitioner
can't give.

Deterministic by construction (no seed, no visit order): the classic
sequential DBSCAN's border-assignment order-dependence is resolved by
the MIN rule — a border point joins the smallest component label among
its core neighbors — so the output is a pure function of the point
set, replayable by the SQL twin's transitive-closure recursion.

Scale shape: ε-edges come from the same distributed block-pair
exchange as ``embedding_near_dup_pairs`` (object-store blocks, one
GEMM per block pair, every unordered pair in exactly one task); core
flags are one skinny degree groupby; components run on
``ops/graph.py:connected_components`` (core-core edges only); border
assignment is two bucketed hash joins of skinny (node, label) rows.
Nothing corpus-sized touches the driver. Exact all-pairs edge
discovery is inherently quadratic — at 10^9 vectors swap the edge
stage for the IVF bucketed variant (``embedding_near_dup_pairs_ivf``'s
exchange) and accept approximate recall at the ε boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .veckit import vec_matrix


def _l2_block(tbl: pa.Table, id_col: str, vec_col: str):
    ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
    mat = vec_matrix(tbl, vec_col)
    sq = (mat * mat).sum(axis=1)
    return ids, mat, sq


class _BlockPairEps:
    """Actor-pool stage over (i, j) block-index rows: ε-radius L2
    pairs from one GEMM per block pair (d² = |a|² + |b|² − 2a·b;
    callers assert the data's |d − eps| margin dwarfs the ~1e-13
    relative kernel drift vs the SQL twin's per-dim loop)."""

    MAX_CACHED_BLOCKS = 8

    def __init__(self, refs_ref, eps: float, id_col: str, vec_col: str):
        self.refs = ray.get(refs_ref)
        self.eps2 = float(eps) * float(eps)
        self.id_col, self.vec_col = id_col, vec_col
        self._cache: dict[int, tuple] = {}

    def _block(self, i: int):
        hit = self._cache.pop(i, None)
        if hit is None:
            hit = _l2_block(ray.get(self.refs[i]),
                            self.id_col, self.vec_col)
            while len(self._cache) >= self.MAX_CACHED_BLOCKS:
                self._cache.pop(next(iter(self._cache)))
        self._cache[i] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ids_a, mat_a, sq_a = self._block(i)
            ids_b, mat_b, sq_b = self._block(j)
            if not len(ids_a) or not len(ids_b):
                continue
            d2 = sq_a[:, None] + sq_b[None, :] - 2.0 * (mat_a @ mat_b.T)
            hit = d2 <= self.eps2
            if i == j:
                hit &= ids_a[:, None] < ids_b[None, :]
            ra, rb = np.nonzero(hit)
            if len(ra):
                a, b = ids_a[ra], ids_b[rb]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b)})


def eps_edges(ds: ray.data.Dataset, eps: float, id_col: str = "vec_id",
              vec_col: str = "embedding",
              max_blocks: int = 32) -> ray.data.Dataset:
    """Distributed exact ε-radius L2 self-join: Dataset of (a, b)
    edges with ``a < b`` and ``‖x_a − x_b‖₂ ≤ eps``."""
    from .stagecache import cached_stage

    slim = ds.select_columns([id_col, vec_col])
    refs = slim.to_arrow_refs()
    if len(refs) > max_blocks:
        refs = slim.repartition(max_blocks).to_arrow_refs()
    nb = len(refs)
    refs_ref = ray.put(refs)
    pair_rows = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    pairs_ds = ray.data.from_items(pair_rows).repartition(
        min(len(pair_rows), 32))
    return pairs_ds.map_batches(
        cached_stage(_BlockPairEps, refs_ref=refs_ref, eps=eps,
                     id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4)


def dbscan(ds: ray.data.Dataset, eps: float, min_pts: int,
           id_col: str = "vec_id", vec_col: str = "embedding",
           max_blocks: int = 32) -> pd.DataFrame:
    """DBSCAN labels: ``(vec_id, role, cluster)`` per input point,
    role ∈ {core, border, noise}, cluster = MIN core id of the
    density-connected component (−1 for noise), ordered by vec_id.
    Semantics (all deterministic, SQL-replayable):

    - neighbor count INCLUDES the point itself; core ⟺ count ≥
      ``min_pts``;
    - clusters are connected components of the core-core ε-graph,
      labeled by minimum member id; a core with no core neighbor is
      its own singleton cluster;
    - a border point takes the MINIMUM cluster label among its core
      neighbors (the order-free resolution of the classic
      first-visitor tie);
    - non-core points with no core neighbor are noise.
    """
    from .graph import connected_components
    from .relational import hash_join

    edges = eps_edges(ds, eps, id_col=id_col, vec_col=vec_col,
                      max_blocks=max_blocks).materialize()
    n_edges = edges.count()

    # degree per node: one skinny both-ends groupby count
    deg_map: dict = {}
    if n_edges:
        both = edges.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [t.column("a").combine_chunks().cast(pa.int64()),
                 t.column("b").combine_chunks().cast(pa.int64())])}),
            batch_format="pyarrow")
        deg = both.groupby("node").count().to_pandas()  # skinny
        deg_map = dict(zip(deg["node"].astype("int64"),
                           deg["count()"].astype("int64")))

    all_ids = ds.select_columns([id_col]).to_pandas()[id_col] \
        .astype("int64").to_numpy()
    nbr = np.array([deg_map.get(int(i), 0) + 1 for i in all_ids],
                   dtype=np.int64)
    is_core = nbr >= int(min_pts)
    core_set = set(all_ids[is_core].tolist())
    core_ref = ray.put(core_set)

    # core-core subgraph → components (min-id labels)
    def cc_filter(t: pa.Table) -> pa.Table:
        cs = ray.get(core_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        m = np.array([x in cs and y in cs for x, y in zip(a, b)])
        return t.filter(pa.array(m)) if len(m) else t

    comp_map: dict = {}
    if n_edges:
        comp = connected_components(
            edges.map_batches(cc_filter, batch_format="pyarrow")) \
            .to_pandas()
        if len(comp):
            comp_map = dict(zip(comp["node"].astype("int64"),
                                comp["component"].astype("int64")))
    # isolated cores: own component
    label = {int(i): comp_map.get(int(i), int(i))
             for i in all_ids[is_core]}

    # border: min core-neighbor's component, via the skinny edge list
    lab_ref = ray.put(label)

    def border_partial(t: pa.Table) -> pa.Table:
        cs = ray.get(core_ref)
        lm = ray.get(lab_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        nodes, labs = [], []
        for x, y in zip(a, b):
            if (x in cs) != (y in cs):       # exactly one end core
                nc, cc = (y, x) if x in cs else (x, y)
                nodes.append(int(nc))
                labs.append(lm[int(cc)])
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "lab": pa.array(labs, pa.int64())})

    border_map: dict = {}
    if n_edges:
        border = edges.map_batches(border_partial,
                                   batch_format="pyarrow") \
            .groupby("node").min("lab").to_pandas()
        if len(border):
            border_map = dict(zip(border["node"].astype("int64"),
                                  border["min(lab)"].astype("int64")))

    roles, clusters = [], []
    for i, c in zip(all_ids, is_core):
        ii = int(i)
        if c:
            roles.append("core")
            clusters.append(label[ii])
        elif ii in border_map:
            roles.append("border")
            clusters.append(border_map[ii])
        else:
            roles.append("noise")
            clusters.append(-1)
    out = pd.DataFrame({id_col: all_ids, "role": roles,
                        "cluster": pd.Series(clusters, dtype="int64"),
                        "n_in_eps": nbr})
    return out.sort_values(id_col).reset_index(drop=True)
