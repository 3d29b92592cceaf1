"""Planted-data oracles for ANSI set ops, the Bloom-prefiltered semi
join, and the normalization tier (min-max / robust scaling)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.relational import (bloom_build, bloom_semi_join,
                                            set_op)
from web2llmstxt_ray.ops.stats import (grouped_minmax_norm,
                                       grouped_robust_scale)


class TestSetOp:
    def test_intersect_and_except_int_keys(self):
        a = ray.data.from_pandas(pd.DataFrame(
            {"k": [1, 2, 2, 3, 5, 8, 13]})).repartition(3)
        b = ray.data.from_pandas(pd.DataFrame(
            {"k": [2, 3, 4, 8, 8]})).repartition(2)
        inter = sorted(set_op(a, b, "k", "intersect").to_pandas()["k"])
        exc = sorted(set_op(a, b, "k", "except").to_pandas()["k"])
        assert inter == [2, 3, 8]
        assert exc == [1, 5, 13]

    def test_string_keys(self):
        a = ray.data.from_items([{"k": s} for s in "abcdeff"])
        b = ray.data.from_items([{"k": s} for s in "bdfxy"])
        inter = sorted(set_op(a, b, "k", "intersect").to_pandas()["k"])
        exc = sorted(set_op(a, b, "k", "except").to_pandas()["k"])
        assert inter == ["b", "d", "f"]
        assert exc == ["a", "c", "e"]

    def test_partition_invariant(self):
        rng = np.random.default_rng(3)
        a = pd.DataFrame({"k": rng.integers(0, 500, 2000)})
        b = pd.DataFrame({"k": rng.integers(250, 750, 2000)})
        outs = []
        for parts in (1, 9):
            ds_a = ray.data.from_pandas(a).repartition(parts)
            ds_b = ray.data.from_pandas(b).repartition(parts)
            outs.append(sorted(
                set_op(ds_a, ds_b, "k", "except").to_pandas()["k"]))
        assert outs[0] == outs[1]
        want = sorted(set(a["k"]) - set(b["k"]))
        assert outs[0] == want


class TestBloom:
    def test_no_false_negatives(self):
        keys = pd.DataFrame({"k": np.arange(0, 50000, 7, dtype=np.int64)})
        bits = bloom_build(ray.data.from_pandas(keys).repartition(5), "k")
        # probe every build key through the same hash scheme
        k = keys["k"].to_numpy().astype(np.uint64)
        h1 = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
        h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        ok = np.ones(len(k), dtype=bool)
        for i in range(4):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(1 << 20)
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            ok &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        assert ok.all()

    def test_semi_join_exact_vs_pandas(self):
        rng = np.random.default_rng(11)
        probe = pd.DataFrame({
            "k": rng.integers(0, 10000, 5000).astype(np.int64),
            "v": rng.integers(0, 100, 5000)})
        build = pd.DataFrame(
            {"k": rng.choice(10000, 300, replace=False).astype(np.int64)})
        out = bloom_semi_join(
            ray.data.from_pandas(probe).repartition(4),
            ray.data.from_pandas(build).repartition(2), "k").to_pandas()
        want = probe[probe["k"].isin(set(build["k"]))]
        assert sorted(map(tuple, out[["k", "v"]].itertuples(index=False))) \
            == sorted(map(tuple, want[["k", "v"]].itertuples(index=False)))


class TestNormalization:
    def _planted(self):
        rng = np.random.default_rng(7)
        return pd.DataFrame({
            "id": np.arange(1500, dtype=np.int64),
            "g": np.repeat(["a", "b", "c"], 500),
            "x": rng.integers(-1000, 1000, 1500).astype(np.int64),
        })

    def test_minmax_matches_pandas(self):
        df = self._planted()
        out = grouped_minmax_norm(
            ray.data.from_pandas(df).repartition(6), "g", "x"
        ).to_pandas().sort_values("id")
        mn = df.groupby("g")["x"].transform("min")
        mx = df.groupby("g")["x"].transform("max")
        want = (df["x"] - mn) / (mx - mn)
        np.testing.assert_allclose(out["x_norm"].to_numpy(),
                                   want.to_numpy(), rtol=0, atol=0)
        # range check
        assert out["x_norm"].between(0, 1).all()

    def test_minmax_zero_range_is_null(self):
        df = pd.DataFrame({"id": [0, 1], "g": ["z", "z"],
                           "x": np.int64([5, 5])})
        out = grouped_minmax_norm(ray.data.from_pandas(df), "g", "x"
                                  ).to_pandas()
        assert out["x_norm"].isna().all()

    def test_robust_matches_quantile_disc(self):
        df = self._planted()
        out = grouped_robust_scale(
            ray.data.from_pandas(df).repartition(5), "g", "x"
        ).to_pandas().sort_values("id").reset_index(drop=True)
        # nearest-rank (quantile_disc) oracle per group
        for g, sub in df.groupby("g"):
            v = np.sort(sub["x"].to_numpy())
            n = len(v)

            def nr(q):
                return v[max(0, int(np.ceil(q * n)) - 1)]

            med, iqr = nr(0.5), nr(0.75) - nr(0.25)
            got = out[out.index.isin(sub.index)]
            want = (sub["x"].to_numpy() - med) / iqr
            np.testing.assert_allclose(
                got.set_index(got["id"]).loc[sub["id"], "x_robust"]
                .to_numpy(), want, rtol=0, atol=0)

    def test_partition_invariant(self):
        df = self._planted()
        a = grouped_robust_scale(ray.data.from_pandas(df).repartition(1),
                                 "g", "x").to_pandas().sort_values("id")
        b = grouped_robust_scale(ray.data.from_pandas(df).repartition(11),
                                 "g", "x").to_pandas().sort_values("id")
        np.testing.assert_array_equal(a["x_robust"].to_numpy(),
                                      b["x_robust"].to_numpy())
