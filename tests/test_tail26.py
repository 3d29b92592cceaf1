"""Edge-case tests for the twenty-eighth-wave operators (weekday
anomalies, cross-source dup matrix, FD audit, Davies-Bouldin, Jain
fairness)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import davies_bouldin
from web2llmstxt_ray.ops.dedup import cross_group_dup_matrix
from web2llmstxt_ray.ops.stats import jain_fairness
from web2llmstxt_ray.ops.validate import fd_audit
from web2llmstxt_ray.ops.windows import dow_anomaly


def _days_df(values_by_day: dict[int, float]) -> pd.DataFrame:
    return pd.DataFrame(
        [(np.datetime64("1970-01-01") + np.timedelta64(d, "D"), v)
         for d, v in values_by_day.items()],
        columns=["o_orderdate", "o_totalprice"])


class TestDowAnomaly:
    def test_planted_weekday_spike(self):
        # 10 weeks; days 0,7,...,63 share dow 0; spike on day 63.
        # (With few samples a lone outlier masks itself: max |z| is
        # (n-1)/sqrt(n), so n must exceed 5 for a z=2 flag at all.)
        vals = {d: 10.0 for d in range(70)}
        vals[63] = 500.0
        got = dow_anomaly(ray.data.from_pandas(_days_df(vals)), z=2)
        assert got["day"].tolist() == [63]
        assert got["dow"].tolist() == [0]
        assert got["cents"].tolist() == [50_000]
        xs = [1000] * 9 + [50_000]
        n, S = 10, sum(xs)
        Q = sum(v * v for v in xs)
        want_z = float(n * 50_000 - S) / math.sqrt(float(n * Q
                                                         - S * S))
        assert got["z_score"].tolist() == [want_z]

    def test_constant_weekdays_no_anomaly(self):
        # each weekday always sees the same value: variance 0
        vals = {d: float(10 + (d % 7)) for d in range(35)}
        got = dow_anomaly(ray.data.from_pandas(_days_df(vals)), z=2)
        assert got.empty

    def test_boundary_is_strict(self):
        # two days per dow: dev² == z²·var_n2 exactly -> NOT flagged
        # xs = (0, 4): S=4, Q=16, var_n2 = 2*16-16 = 16
        # dev for x=4: 2*4-4 = 4; dev² = 16; z=1 -> equal, excluded
        df = _days_df({0: 0.0, 7: 0.04})
        got = dow_anomaly(ray.data.from_pandas(df), z=1)
        assert got.empty

    def test_partition_invariant(self):
        rng = np.random.default_rng(3)
        vals = {d: float(rng.integers(1, 1000)) for d in range(60)}
        a = dow_anomaly(
            ray.data.from_pandas(_days_df(vals)).repartition(1), z=2)
        b = dow_anomaly(
            ray.data.from_pandas(_days_df(vals)).repartition(7), z=2)
        pd.testing.assert_frame_equal(a, b)


class TestCrossGroupDupMatrix:
    def test_hand_fixture(self):
        df = pd.DataFrame({
            "text": ["aa", "bb", "aa", "cc", "bb", "aa", "dd"],
            "source": ["s1", "s1", "s2", "s2", "s3", "s3", "s3"]})
        got = cross_group_dup_matrix(
            ray.data.from_pandas(df).repartition(3), num_buckets=8)
        # aa in s1,s2,s3; bb in s1,s3 -> pairs:
        # (s1,s2):1  (s1,s3):2  (s2,s3):1
        assert got.values.tolist() == [["s1", "s2", 1],
                                       ["s1", "s3", 2],
                                       ["s2", "s3", 1]]

    def test_within_source_dups_dont_count(self):
        df = pd.DataFrame({"text": ["x", "x", "y"],
                           "source": ["s1", "s1", "s2"]})
        got = cross_group_dup_matrix(ray.data.from_pandas(df))
        assert got.empty

    def test_partition_invariant(self):
        rng = np.random.default_rng(12)
        df = pd.DataFrame({
            "text": [f"t{rng.integers(0, 30)}" for _ in range(300)],
            "source": [f"s{rng.integers(0, 5)}" for _ in range(300)]})
        a = cross_group_dup_matrix(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = cross_group_dup_matrix(
            ray.data.from_pandas(df).repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestFdAudit:
    def test_holding_fd(self):
        df = pd.DataFrame({"k": ["a", "a", "b", "b"],
                           "v": ["1", "1", "2", "2"]})
        got = fd_audit(ray.data.from_pandas(df), "k", "v")
        assert got["n_keys"].tolist() == [2]
        assert got["n_violating"].tolist() == [0]
        assert got["violation_rate"].tolist() == [0.0]
        assert got["max_rhs_variants"].tolist() == [1]

    def test_violations_and_top_offender_tie_rule(self):
        df = pd.DataFrame({
            "k": ["a", "a", "b", "b", "c", "z", "z"],
            "v": ["1", "2", "1", "2", "1", "1", "2"]})
        got = fd_audit(ray.data.from_pandas(df).repartition(3),
                       "k", "v", num_buckets=8)
        assert got["n_keys"].tolist() == [4]
        assert got["n_violating"].tolist() == [3]
        assert got["violation_rate"].tolist() == [0.75]
        assert got["max_rhs_variants"].tolist() == [2]
        # ties at 2 variants: a < b < z -> 'a' wins
        assert got["top_key"].tolist() == ["a"]
        assert got["top_key_variants"].tolist() == [2]

    def test_partition_invariant(self):
        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "k": [f"k{rng.integers(0, 20)}" for _ in range(400)],
            "v": [f"v{rng.integers(0, 4)}" for _ in range(400)]})
        a = fd_audit(ray.data.from_pandas(df).repartition(1),
                     "k", "v", num_buckets=4)
        b = fd_audit(ray.data.from_pandas(df).repartition(11),
                     "k", "v", num_buckets=32)
        pd.testing.assert_frame_equal(a, b)


class TestDaviesBouldin:
    def test_two_separated_clusters(self):
        # cluster 0 at (0,0)±1 on x; cluster 1 at (10,0)±1
        df = pd.DataFrame({
            "vec_id": range(4),
            "embedding": [[-1.0, 0.0], [1.0, 0.0],
                          [9.0, 0.0], [11.0, 0.0]],
            "label": [0, 0, 1, 1]})
        got = davies_bouldin(ray.data.from_pandas(df))
        # centroids (0,0) and (10,0); scatter = 1 each; dist = 10
        assert got["label"].tolist() == [0, 1]
        assert got["n"].tolist() == [2, 2]
        assert got["scatter"].tolist() == [1.0, 1.0]
        assert got["db_component"].tolist() == [0.2, 0.2]

    def test_confusable_neighbor_is_the_max(self):
        # three clusters on a line: 0 at 0, 1 at 2, 2 at 100
        df = pd.DataFrame({
            "vec_id": range(6),
            "embedding": [[-1.0], [1.0], [1.0], [3.0],
                          [99.0], [101.0]],
            "label": [0, 0, 1, 1, 2, 2]})
        got = davies_bouldin(ray.data.from_pandas(df))
        # s = 1 everywhere; db_0 vs 1: 2/2=1; db_2 vs 1: 2/98
        assert got["db_component"].tolist() == [1.0, 1.0,
                                                round(2 / 98, 6)]

    def test_single_label_nan(self):
        df = pd.DataFrame({"vec_id": range(3),
                           "embedding": [[1.0], [2.0], [3.0]],
                           "label": [5, 5, 5]})
        got = davies_bouldin(ray.data.from_pandas(df))
        assert got["label"].tolist() == [5]
        assert np.isnan(got["db_component"].iloc[0])

    def test_partition_invariant(self):
        rng = np.random.default_rng(21)
        X = rng.normal(size=(80, 5))
        df = pd.DataFrame({"vec_id": range(80),
                           "embedding": [x.tolist() for x in X],
                           "label": rng.integers(0, 4, 80)})
        a = davies_bouldin(ray.data.from_pandas(df).repartition(1))
        b = davies_bouldin(ray.data.from_pandas(df).repartition(7))
        pd.testing.assert_frame_equal(a, b)


class TestJainFairness:
    def test_equal_groups_is_one(self):
        df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5 + ["c"] * 5})
        got = jain_fairness(ray.data.from_pandas(df), "g")
        assert got["n_groups"].tolist() == [3]
        assert got["total_rows"].tolist() == [15]
        assert got["min_n"].tolist() == [5]
        assert got["max_n"].tolist() == [5]
        assert got["jain"].tolist() == [1.0]

    def test_dominant_group(self):
        df = pd.DataFrame({"g": ["a"] * 98 + ["b", "c"]})
        got = jain_fairness(ray.data.from_pandas(df).repartition(4),
                            "g", num_buckets=8)
        # J = 100² / (3 · (98²+1+1)) exactly
        want = float(100 * 100) / float(3 * (98 * 98 + 2))
        assert got["jain"].tolist() == [want]
        assert got["min_n"].tolist() == [1]
        assert got["max_n"].tolist() == [98]

    def test_partition_invariant(self):
        rng = np.random.default_rng(31)
        df = pd.DataFrame(
            {"g": [f"g{rng.integers(0, 9)}" for _ in range(500)]})
        a = jain_fairness(ray.data.from_pandas(df).repartition(1),
                          "g", num_buckets=4)
        b = jain_fairness(ray.data.from_pandas(df).repartition(13),
                          "g", num_buckets=32)
        pd.testing.assert_frame_equal(a, b)
