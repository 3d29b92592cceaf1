"""Edge-case tests for the fourteenth-wave operators (pairwise EMD,
binary AUC, exponential-fit KS)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.stats import binary_auc, grouped_emd_pairs
from web2llmstxt_ray.ops.windows import gap_expfit_ks

US = 1_000_000


class TestGroupedEmd:
    def test_point_masses_distance(self):
        # all of a at 10, all of b at 17 → EMD = 7 exactly
        df = pd.DataFrame({"g": ["a"] * 3 + ["b"] * 5,
                           "v": [10] * 3 + [17] * 5})
        got = grouped_emd_pairs(ray.data.from_pandas(df), "g", "v")
        assert got.loc[0, "emd"] == 7.0

    def test_identical_distributions_zero(self):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [1, 5, 1, 5]})
        got = grouped_emd_pairs(ray.data.from_pandas(df), "g", "v")
        assert got.loc[0, "emd"] == 0.0

    def test_matches_sorted_quantile_reference(self):
        # with equal sample sizes EMD = mean |sorted_a - sorted_b|
        rng = np.random.default_rng(4)
        a = rng.integers(0, 1000, 64)
        b = rng.integers(0, 1000, 64)
        df = pd.DataFrame({"g": ["a"] * 64 + ["b"] * 64,
                           "v": np.concatenate([a, b])})
        got = grouped_emd_pairs(
            ray.data.from_pandas(df).repartition(5), "g", "v")
        want = np.abs(np.sort(a) - np.sort(b)).mean()
        assert abs(got.loc[0, "emd"] - want) < 1e-12

    def test_all_pairs_emitted_sorted(self):
        df = pd.DataFrame({"g": ["x", "y", "z"], "v": [1, 2, 3]})
        got = grouped_emd_pairs(ray.data.from_pandas(df), "g", "v")
        assert list(zip(got["group_a"], got["group_b"])) == \
            [("x", "y"), ("x", "z"), ("y", "z")]


class TestBinaryAuc:
    def _ref(self, scores, labels):
        pos = [s for s, y in zip(scores, labels) if y]
        neg = [s for s, y in zip(scores, labels) if not y]
        tot = 0.0
        for p in pos:
            for q in neg:
                tot += 1.0 if p > q else (0.5 if p == q else 0.0)
        return tot / (len(pos) * len(neg))

    def test_perfect_separation(self):
        df = pd.DataFrame({"s": [1.0, 2.0, 10.0, 11.0],
                           "y": [0, 0, 1, 1]})
        got = binary_auc(ray.data.from_pandas(df), "s", "y")
        assert got.loc[0, "auc"] == 1.0

    def test_all_tied_is_half(self):
        df = pd.DataFrame({"s": [5.0] * 6, "y": [0, 1] * 3})
        got = binary_auc(ray.data.from_pandas(df), "s", "y")
        assert got.loc[0, "auc"] == 0.5

    def test_matches_pairwise_reference(self):
        rng = np.random.default_rng(9)
        s = rng.integers(0, 20, 150).astype(float)  # heavy ties
        y = rng.integers(0, 2, 150)
        df = pd.DataFrame({"s": s, "y": y})
        got = binary_auc(ray.data.from_pandas(df).repartition(6),
                         "s", "y", num_buckets=8)
        assert int(got.loc[0, "n_pos"]) == int(y.sum())
        assert abs(got.loc[0, "auc"] - self._ref(s, y)) < 1e-12


class TestGapExpfitKs:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([int(r[1] * US) for r in rows],
                                 unit="us"),
            "event_id": list(range(len(rows)))})

    def test_reference_replay(self):
        rng = np.random.default_rng(3)
        rows = [(int(u), float(t)) for u, t in
                zip(rng.integers(0, 6, 200),
                    rng.uniform(0, 86_400, 200))]
        got = gap_expfit_ks(ray.data.from_pandas(self._mk(rows)),
                            num_buckets=8)
        # sequential reference
        df = self._mk(rows).sort_values(["user_id", "ts", "event_id"])
        gaps = []
        for _, g in df.groupby("user_id"):
            us = g["ts"].astype("int64").to_numpy() // 1000
            gaps += list(np.diff(us))
        gaps = np.sort(np.array(gaps, dtype=np.int64))
        n = len(gaps)
        lam = n / (gaps.sum() / 86_400_000_000.0)
        vals, counts = np.unique(gaps, return_counts=True)
        cum = counts.cumsum()
        f = 1 - np.exp(-lam * (vals / 86_400_000_000.0))
        d = max(np.abs(cum / n - f).max(),
                np.abs((cum - counts) / n - f).max())
        assert int(got.loc[0, "n_gaps"]) == n
        assert abs(got.loc[0, "lambda_per_day"] - lam) < 1e-9
        assert abs(got.loc[0, "ks_d"] - d) < 1e-12

    def test_gaps_never_span_users(self):
        # two users, one event each → zero gaps
        got = gap_expfit_ks(
            ray.data.from_pandas(self._mk([(1, 0), (2, 100)])),
            num_buckets=4)
        assert int(got.loc[0, "n_gaps"]) == 0
        assert math.isnan(got.loc[0, "ks_d"])

    def test_constant_gaps_reject_exponential(self):
        # perfectly periodic arrivals: KS vs exponential is large
        rows = [(1, i * 60.0) for i in range(50)]
        got = gap_expfit_ks(ray.data.from_pandas(self._mk(rows)),
                            num_buckets=4)
        # all mass at gap=60s; F_fit(60s) = 1 − e⁻¹ ≈ 0.632 → D ≈ 0.632
        assert abs(got.loc[0, "ks_d"] - (1 - math.exp(-1))) < 1e-12
