"""t-digest: rank accuracy vs exact quantiles, merge ≡ build-at-once
(within sketch tolerance), serialization, distributed path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from web2llmstxt_ray.ops.sketch import TDigest, tdigest_quantiles


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    """|empirical CDF at the estimate − q| — the metric t-digest bounds."""
    return abs(np.searchsorted(np.sort(values), est) / len(values) - q)


class TestTDigestCore:
    @pytest.mark.parametrize("dist", ["lognormal", "uniform", "normal"])
    def test_rank_accuracy(self, dist):
        rng = np.random.default_rng(7)
        vals = getattr(rng, dist)(size=50_000)
        d = TDigest(200).add(vals)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            assert _rank_error(vals, d.quantile(q), q) < 0.01, (dist, q)

    def test_tails_clamped_to_observed_extremes(self):
        vals = np.arange(1000, dtype=np.float64)
        d = TDigest(100).add(vals)
        assert d.quantile(0.0) >= 0.0
        assert d.quantile(1.0) <= 999.0

    def test_merge_matches_build_at_once(self):
        rng = np.random.default_rng(3)
        a, b = rng.lognormal(size=20_000), rng.lognormal(size=30_000)
        merged = TDigest(200).add(a).merge(TDigest(200).add(b))
        both = np.concatenate([a, b])
        for q in (0.05, 0.5, 0.95):
            assert _rank_error(both, merged.quantile(q), q) < 0.015

    def test_bounded_memory(self):
        rng = np.random.default_rng(1)
        d = TDigest(100)
        for _ in range(20):
            d.add(rng.normal(size=10_000))
        assert len(d.means) <= 2 * 100  # O(delta) centroids, not O(n)
        assert d.count() == 200_000

    def test_serialization_roundtrip(self):
        d = TDigest(100).add(np.random.default_rng(5).uniform(size=5000))
        r = TDigest.loads(d.dumps())
        for q in (0.1, 0.5, 0.9):
            assert r.quantile(q) == d.quantile(q)
        assert r.count() == d.count()

    def test_nan_ignored_empty_nan(self):
        d = TDigest(50).add(np.array([np.nan, 1.0, np.nan, 3.0]))
        assert d.count() == 2
        assert np.isnan(TDigest(50).quantile(0.5))


class TestTDigestDistributed:
    def test_matches_exact_within_tolerance(self):
        rng = np.random.default_rng(11)
        vals = rng.lognormal(size=40_000)
        ds = ray.data.from_pandas(
            pd.DataFrame({"v": vals})).repartition(8)
        out = tdigest_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99])
        assert len(out) == 4
        assert (out["n"] == 40_000).all()
        for _, r in out.iterrows():
            assert _rank_error(vals, r["value"], r["q"]) < 0.015

    def test_grouped(self):
        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 30_000),
            "v": rng.normal(size=30_000),
        })
        df.loc[df["g"] == "b", "v"] += 10.0
        out = tdigest_quantiles(ray.data.from_pandas(df).repartition(6),
                                "v", [0.5], group_col="g")
        med = {r["g"]: r["value"] for _, r in out.iterrows()}
        assert abs(med["a"] - 0.0) < 0.1
        assert abs(med["b"] - 10.0) < 0.1
