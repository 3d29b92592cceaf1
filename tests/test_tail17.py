"""Edge-case tests for the nineteenth-wave operators (hourly peak
profile, Wilson short-doc rate, grouped top share, grouped HHI)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import hourly_peak_profile
from web2llmstxt_ray.ops.stats import grouped_hhi, grouped_top_share
from web2llmstxt_ray.ops.textstats import short_doc_wilson


class TestHourlyPeakProfile:
    def _mk(self, rows):
        return pd.DataFrame({
            "ts": pd.to_datetime([f"2024-01-01 {h:02d}:00:00"
                                  for h, _ in rows]),
            "event_type": [t for _, t in rows]})

    def test_hand_fixture(self):
        rows = [(3, "a"), (3, "a"), (5, "a"), (7, "b")]
        got = hourly_peak_profile(ray.data.from_pandas(self._mk(rows)))
        a = got[got["event_type"] == "a"].iloc[0]
        assert (int(a["peak_hour"]), int(a["n_peak"]),
                int(a["n_total"])) == (3, 2, 3)
        np.testing.assert_allclose(a["peak_share"], 2 / 3)

    def test_tie_breaks_to_smallest_hour(self):
        rows = [(9, "x"), (4, "x")]
        got = hourly_peak_profile(ray.data.from_pandas(self._mk(rows)))
        assert got["peak_hour"].tolist() == [4]

    def test_partition_invariant(self):
        rng = np.random.default_rng(7)
        rows = [(int(h), str(t)) for h, t in
                zip(rng.integers(0, 24, 400),
                    rng.choice(list("pq"), 400))]
        a = hourly_peak_profile(
            ray.data.from_pandas(self._mk(rows)).repartition(1))
        b = hourly_peak_profile(
            ray.data.from_pandas(self._mk(rows)).repartition(9))
        pd.testing.assert_frame_equal(a, b)


class TestShortDocWilson:
    def test_matches_closed_form(self):
        df = pd.DataFrame({"source": ["A"] * 4,
                           "text": ["w", "w w", " ".join(["w"] * 40),
                                    " ".join(["w"] * 50)]})
        got = short_doc_wilson(ray.data.from_pandas(df),
                               max_tokens=30)
        n, k, z = 4.0, 2.0, 1.96
        p = k / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = (z * math.sqrt(p * (1.0 - p) / n
                              + z2 / (4.0 * n * n))) / denom
        assert got.loc[0, "wilson_lo"] == center - half
        assert got.loc[0, "wilson_hi"] == center + half
        assert got.loc[0, "short_rate"] == 0.5

    def test_boundary_exactly_30_tokens_not_short(self):
        df = pd.DataFrame({"source": ["A", "A"],
                           "text": [" ".join(["w"] * 30),
                                    " ".join(["w"] * 29)]})
        got = short_doc_wilson(ray.data.from_pandas(df),
                               max_tokens=30)
        assert int(got.loc[0, "n_short"]) == 1

    def test_degenerate_rates_bounded(self):
        df = pd.DataFrame({"source": ["Z"] * 3, "text": ["a"] * 3})
        got = short_doc_wilson(ray.data.from_pandas(df),
                               max_tokens=30)
        assert got.loc[0, "short_rate"] == 1.0
        assert 0.0 < got.loc[0, "wilson_lo"] < 1.0
        assert got.loc[0, "wilson_hi"] <= 1.0 + 1e-12


class TestGroupedTopShare:
    def test_hand_fixture(self):
        # values 1..100 cents, k = ceil(100/100) = 1 → top = 100
        df = pd.DataFrame({"g": ["a"] * 100,
                           "v": [i / 100 for i in range(1, 101)]})
        got = grouped_top_share(ray.data.from_pandas(df), "g", "v",
                                top_denominator=100, num_buckets=4)
        assert (int(got.loc[0, "k"]),
                int(got.loc[0, "top_value_cents"]),
                int(got.loc[0, "total_value_cents"])) == (1, 100, 5050)
        np.testing.assert_allclose(got.loc[0, "top_share"], 100 / 5050)

    def test_all_tied_values(self):
        df = pd.DataFrame({"g": ["a"] * 3, "v": [0.05] * 3})
        got = grouped_top_share(ray.data.from_pandas(df), "g", "v",
                                top_denominator=100, num_buckets=4)
        assert int(got.loc[0, "top_value_cents"]) == 5
        np.testing.assert_allclose(got.loc[0, "top_share"], 1 / 3)

    def test_k_spans_tie_at_cutoff(self):
        # k=2 over values [9, 5, 5]: cutoff 5, top = 9 + 1·5 = 14
        df = pd.DataFrame({"g": ["a"] * 3, "v": [0.09, 0.05, 0.05]})
        got = grouped_top_share(ray.data.from_pandas(df), "g", "v",
                                top_denominator=2, num_buckets=4)
        assert (int(got.loc[0, "k"]),
                int(got.loc[0, "top_value_cents"])) == (2, 14)

    def test_partition_invariant(self):
        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "g": rng.choice(list("xy"), 500),
            "v": rng.integers(1, 2000, 500) / 100.0})
        a = grouped_top_share(ray.data.from_pandas(df).repartition(1),
                              "g", "v", num_buckets=4)
        b = grouped_top_share(ray.data.from_pandas(df).repartition(9),
                              "g", "v", num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestGroupedHHI:
    def _run(self, rows, **kw):
        df = pd.DataFrame({"g": [r[0] for r in rows],
                           "m": [r[1] for r in rows],
                           "c": [r[2] for r in rows]})
        return grouped_hhi(ray.data.from_pandas(df), "g", "m", "c",
                           **kw)

    def test_monopoly_is_one(self):
        got = self._run([("t", 1, 50), ("t", 1, 50)], num_buckets=4)
        assert got.loc[0, "hhi"] == 1.0
        assert int(got.loc[0, "n_members"]) == 1

    def test_even_split(self):
        got = self._run([("t", i, 10) for i in range(4)],
                        num_buckets=4)
        assert got.loc[0, "hhi"] == 0.25

    def test_exact_uneven(self):
        got = self._run([("t", 1, 1), ("t", 2, 3)], num_buckets=4)
        assert got.loc[0, "hhi"] == 10 / 16

    def test_square_beyond_int64_is_exact(self):
        # rev = 4e9 cents → rev² = 1.6e19 > int64 max; the string
        # carry keeps the fold exact
        r = 4_000_000_000
        got = self._run([("t", 1, r), ("t", 2, r), ("t", 2, r)],
                        num_buckets=4)
        s, sq = 3 * r, r * r + (2 * r) ** 2
        assert got.loc[0, "hhi"] == float(sq) / float(s * s)
        assert int(got.loc[0, "total_cents"]) == s

    def test_partition_invariant(self):
        rng = np.random.default_rng(23)
        rows = [(str(g), int(m), int(c)) for g, m, c in
                zip(rng.choice(list("ab"), 300),
                    rng.integers(0, 12, 300),
                    rng.integers(1, 1000, 300))]
        df = pd.DataFrame({"g": [r[0] for r in rows],
                           "m": [r[1] for r in rows],
                           "c": [r[2] for r in rows]})
        a = grouped_hhi(ray.data.from_pandas(df).repartition(1),
                        "g", "m", "c", num_buckets=4)
        b = grouped_hhi(ray.data.from_pandas(df).repartition(9),
                        "g", "m", "c", num_buckets=16)
        pd.testing.assert_frame_equal(a, b)
