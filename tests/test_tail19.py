"""Edge-case tests for the twenty-first-wave operators (pigeonhole
frequent items, cohort LTV curve, conditional decile profile)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import cohort_value_curve
from web2llmstxt_ray.ops.sketch import frequent_items
from web2llmstxt_ray.ops.stats import conditional_decile_profile


class TestFrequentItems:
    def test_hand_threshold(self):
        df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 3 + ["c"]})
        got = frequent_items(ray.data.from_pandas(df), "k", k=3)
        # N=10: a needs 6·3 > 10 ✓, b 3·3 > 10 ✗ (strict), c ✗
        assert got["k"].tolist() == ["a"]
        assert got["n"].tolist() == [6]
        np.testing.assert_allclose(got["share"], [0.6])

    def test_no_false_negatives_across_partitions(self):
        # 'x' is globally frequent (14 of 66: 14·5 > 66) but thinly
        # spread: the pigeonhole union must still nominate it
        rows = ["x"] * 14 + [f"u{i}" for i in range(52)]
        rng = np.random.default_rng(3)
        rng.shuffle(rows)
        df = pd.DataFrame({"k": rows})
        got = frequent_items(
            ray.data.from_pandas(df).repartition(8), "k", k=5)
        assert "x" in set(got["k"])
        assert int(got.loc[got["k"] == "x", "n"].item()) == 14

    def test_all_unique_returns_empty(self):
        df = pd.DataFrame({"k": [f"u{i}" for i in range(5)]})
        got = frequent_items(ray.data.from_pandas(df), "k", k=2)
        assert len(got) == 0

    def test_exactly_at_threshold_excluded(self):
        # count·k == N must NOT pass the strict rule
        df = pd.DataFrame({"k": ["a", "a", "b", "c"]})
        got = frequent_items(ray.data.from_pandas(df), "k", k=2)
        assert "a" not in set(got["k"])


class TestCohortValueCurve:
    def _mk(self, rows):
        return pd.DataFrame({
            "k": [r[0] for r in rows],
            "d": pd.to_datetime([r[1] for r in rows]),
            "v": [float(r[2]) for r in rows]})

    def test_hand_fixture(self):
        rows = [(1, "2024-01-15", 1.00), (1, "2024-03-02", 2.00),
                (2, "2024-01-20", 5.00)]
        got = cohort_value_curve(ray.data.from_pandas(self._mk(rows)),
                                 "k", "d", "v", num_buckets=4)
        assert got["cohort"].tolist() == ["2024-01", "2024-01"]
        assert got["month_offset"].tolist() == [0, 2]
        assert got["n_keys"].tolist() == [2, 1]
        assert got["revenue_cents"].tolist() == [600, 200]
        assert got["cum_revenue_cents"].tolist() == [600, 800]

    def test_distinct_cohorts(self):
        rows = [(1, "2023-12-31", 1.00), (2, "2024-01-01", 1.00)]
        got = cohort_value_curve(ray.data.from_pandas(self._mk(rows)),
                                 "k", "d", "v", num_buckets=4)
        assert got["cohort"].tolist() == ["2023-12", "2024-01"]

    def test_partition_invariant(self):
        rng = np.random.default_rng(41)
        rows = [(int(k), f"2024-{m:02d}-10", float(v)) for k, m, v in
                zip(rng.integers(0, 20, 300),
                    rng.integers(1, 13, 300),
                    rng.integers(1, 500, 300))]
        a = cohort_value_curve(
            ray.data.from_pandas(self._mk(rows)).repartition(1),
            "k", "d", "v", num_buckets=4)
        b = cohort_value_curve(
            ray.data.from_pandas(self._mk(rows)).repartition(9),
            "k", "d", "v", num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestConditionalDecileProfile:
    def test_uniform_grid(self):
        df = pd.DataFrame({"x": [float(i) for i in range(1, 101)],
                           "y": [float(2 * i) for i in range(1, 101)]})
        got = conditional_decile_profile(
            ray.data.from_pandas(df), "x", "y",
            x_scale=1, y_scale=1, n_tiles=10)
        assert got["decile"].tolist() == list(range(1, 11))
        assert got["n"].tolist() == [10] * 10
        np.testing.assert_allclose(got.loc[0, "mean_x"], 5.5)
        np.testing.assert_allclose(got.loc[9, "mean_y"], 2 * 95.5)

    def test_constant_x_collapses(self):
        df = pd.DataFrame({"x": [3.0] * 8, "y": [1.0] * 8})
        got = conditional_decile_profile(
            ray.data.from_pandas(df), "x", "y",
            x_scale=1, y_scale=1, n_tiles=10)
        assert got["decile"].tolist() == [1]
        assert int(got.loc[0, "n"]) == 8

    def test_boundary_value_lands_low(self):
        # values 1..10, decile boundaries at 1..9: x == bound → low
        df = pd.DataFrame({"x": [float(i) for i in range(1, 11)],
                           "y": [0.0] * 10})
        got = conditional_decile_profile(
            ray.data.from_pandas(df), "x", "y",
            x_scale=1, y_scale=1, n_tiles=10)
        assert got["n"].tolist() == [1] * 10

    def test_partition_invariant(self):
        rng = np.random.default_rng(43)
        df = pd.DataFrame({
            "x": rng.integers(0, 50, 400).astype(float),
            "y": rng.integers(0, 90, 400).astype(float)})
        a = conditional_decile_profile(
            ray.data.from_pandas(df).repartition(1), "x", "y",
            x_scale=1, y_scale=1)
        b = conditional_decile_profile(
            ray.data.from_pandas(df).repartition(9), "x", "y",
            x_scale=1, y_scale=1)
        pd.testing.assert_frame_equal(a, b)
