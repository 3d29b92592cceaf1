"""Distributed PCA: numpy-oracle eigenstructure, whitening variance,
partition tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.embed_pca import fit_pca, transform_pca


def _vecs(n=3000, d=16, seed=8):
    rng = np.random.default_rng(seed)
    # anisotropic gaussian: distinct spectrum so eigvecs are stable
    scales = np.linspace(5.0, 0.5, d)
    x = rng.normal(size=(n, d)) * scales
    return x + rng.normal(size=d) * 3.0  # nonzero mean


def _ds(x, parts=6):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
    })).repartition(parts)


class TestFitPCA:
    def test_matches_numpy(self):
        x = _vecs()
        xf = x.astype(np.float32).astype(np.float64)  # storage trip
        model = fit_pca(_ds(x), k=5)
        assert model.n == len(x)
        np.testing.assert_allclose(model.mean, xf.mean(axis=0),
                                   atol=1e-9)
        cov = np.cov(xf.T)
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:5]
        np.testing.assert_allclose(model.eigvals, vals[order],
                                   rtol=1e-8)
        for i, col in enumerate(order):
            v = vecs[:, col]
            got = model.components[i]
            # eigenvectors up to sign
            assert min(np.abs(got - v).max(),
                       np.abs(got + v).max()) < 1e-8

    def test_partition_tolerant(self):
        x = _vecs(2000, seed=3)
        a = fit_pca(_ds(x, 1), k=3)
        b = fit_pca(_ds(x, 11), k=3)
        np.testing.assert_allclose(a.eigvals, b.eigvals, rtol=1e-9)
        np.testing.assert_allclose(a.components, b.components,
                                   atol=1e-7)


class TestTransformPCA:
    def test_projection_variance_equals_eigvals(self):
        x = _vecs(4000, seed=5)
        model = fit_pca(_ds(x), k=4)
        out = transform_pca(_ds(x), model).to_pandas()
        z = np.stack(out["pca"].to_numpy())
        np.testing.assert_allclose(z.var(axis=0, ddof=1),
                                   model.eigvals, rtol=1e-6)
        # projections are centered
        assert np.abs(z.mean(axis=0)).max() < 1e-9

    def test_whitening_unit_variance(self):
        x = _vecs(4000, seed=7)
        model = fit_pca(_ds(x), k=4)
        out = transform_pca(_ds(x), model, whiten=True).to_pandas()
        z = np.stack(out["pca"].to_numpy())
        np.testing.assert_allclose(z.var(axis=0, ddof=1),
                                   np.ones(4), rtol=1e-6)
