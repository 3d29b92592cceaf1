"""Distributed PCA / whitening over an embedding column.

The embedding-pipeline preprocessor (whitening before cosine dedup /
ANN quantization; SemDeDup and retrieval papers both assume it):
project vectors onto the top-k principal directions, optionally
scaling each direction to unit variance.

Scale shape — covariance is ADDITIVE, so fitting is ONE ``map_batches``
pass: each block emits (n, Σx: d floats, ΣxxT: d² floats) computed as
a single GEMM; the driver folds O(blocks) partials (d=768 → 4.7 MB
per partial, fine) and runs one d×d eigendecomposition. The transform
is a broadcast map-only matmul. Vectors never shuffle, nothing
iterates, and the model (mean + components) is k·d floats.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .veckit import vec_matrix


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = eigenvectors (desc eigval)
    eigvals: np.ndarray       # (k,) variances along components
    n: int
    cov: np.ndarray | None = None   # (d, d) sample covariance — the
    # distributed pass's folded result, kept for audit/oracle use


def fit_pca(ds: ray.data.Dataset, k: int,
            vec_col: str = "embedding") -> PCAModel:
    """One-pass covariance fit → top-k eigenpairs.

    Sign convention: each component's largest-|coordinate| entry is
    made positive, so the model is deterministic across eigensolver
    sign flips (partition order still perturbs float sums at ~1e-12 —
    tolerance-compare across runs, not bit-compare).
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = vec_matrix(batch, vec_col)                 # (b, d) float64
        s = x.sum(axis=0)
        ss = x.T @ x                                   # (d, d) one GEMM
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.ravel().tolist()], pa.list_(pa.float64())),
        })

    n = 0
    s = None
    ss = None
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096).take_all():
        n += row["n"]
        rs = np.asarray(row["s"], dtype=np.float64)
        rss = np.asarray(row["ss"], dtype=np.float64)
        s = rs if s is None else s + rs
        ss = rss if ss is None else ss + rss
    d = len(s)
    mean = s / n
    cov = (ss.reshape(d, d) - n * np.outer(mean, mean)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)                   # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                           # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return PCAModel(mean=mean, components=comps,
                    eigvals=np.maximum(vals[order], 0.0), n=int(n),
                    cov=cov)


def transform_pca(ds: ray.data.Dataset, model: PCAModel,
                  vec_col: str = "embedding", out_col: str = "pca",
                  whiten: bool = False) -> ray.data.Dataset:
    """Broadcast map-only projection: append ``out_col`` =
    (x−mean)·componentsᵀ, divided by √eigval per direction when
    ``whiten`` (unit variance along every kept direction)."""
    scale = (1.0 / np.sqrt(np.maximum(model.eigvals, 1e-12))
             if whiten else np.ones(len(model.eigvals)))
    mref = ray.put((model.mean, model.components, scale))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps, sc = ray.get(mref)
        x = vec_matrix(batch, vec_col)
        z = ((x - mean) @ comps.T) * sc
        return batch.append_column(
            out_col, pa.array(z.tolist(),
                              pa.list_(pa.float64())))

    return ds.map_batches(project, batch_format="pyarrow")
