"""Edge-case tests for the twenty-fourth-wave operators (coverage
curve, transition gap medians, stratified quota split)."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.corpus import stratified_quota_split
from web2llmstxt_ray.ops.events import transition_gap_stats
from web2llmstxt_ray.ops.textstats import group_coverage_curve

US = 1_000_000


class TestGroupCoverageCurve:
    def test_hand_fixture(self):
        df = pd.DataFrame({"source": ["a"] * 6 + ["b"] * 3
                           + ["c"] * 1})
        got = group_coverage_curve(ray.data.from_pandas(df))
        assert got["source"].tolist() == ["a", "b", "c"]
        assert got["rank"].tolist() == [1, 2, 3]
        np.testing.assert_allclose(got["cum_share"],
                                   [0.6, 0.9, 1.0])

    def test_tie_breaks_by_name(self):
        df = pd.DataFrame({"source": ["z", "y"]})
        got = group_coverage_curve(ray.data.from_pandas(df))
        assert got["source"].tolist() == ["y", "z"]

    def test_partition_invariant(self):
        rng = np.random.default_rng(61)
        df = pd.DataFrame({"source":
                           rng.choice(list("pqrst"), 500)})
        a = group_coverage_curve(
            ray.data.from_pandas(df).repartition(1))
        b = group_coverage_curve(
            ray.data.from_pandas(df).repartition(9))
        pd.testing.assert_frame_equal(a, b)


class TestTransitionGapStats:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * US for r in rows],
                                 unit="us"),
            "event_id": list(range(len(rows))),
            "event_type": [r[2] for r in rows]})

    def test_hand_median(self):
        # a→b gaps: 1 s, 3 s, 9 s → median 3 s
        rows = [(1, 0, "a"), (1, 1, "b"),
                (2, 10, "a"), (2, 13, "b"),
                (3, 20, "a"), (3, 29, "b")]
        got = transition_gap_stats(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert got["cur_type"].tolist() == ["a"]
        assert int(got.loc[0, "n"]) == 3
        assert int(got.loc[0, "median_gap_us"]) == 3 * US

    def test_no_cross_user_transition(self):
        rows = [(1, 0, "a"), (2, 1, "b")]
        got = transition_gap_stats(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert len(got) == 0

    def test_even_count_takes_lower_median(self):
        rows = [(1, 0, "a"), (1, 2, "b"),
                (2, 10, "a"), (2, 14, "b")]
        got = transition_gap_stats(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert int(got.loc[0, "median_gap_us"]) == 2 * US


class TestStratifiedQuotaSplit:
    def test_exact_quotas_per_stratum(self):
        df = pd.DataFrame({
            "source": ["a"] * 20 + ["b"] * 35,
            "doc_id": range(55)})
        got = stratified_quota_split(ray.data.from_pandas(df),
                                     num_buckets=4)
        m = got.merge(df, on="doc_id")
        ca = m[m["source"] == "a"]["split"].value_counts()
        cb = m[m["source"] == "b"]["split"].value_counts()
        assert (ca.get("train", 0), ca.get("val", 0),
                ca.get("test", 0)) == (16, 2, 2)
        assert (cb.get("train", 0), cb.get("val", 0),
                cb.get("test", 0)) == (29, 3, 3)

    def test_md5_rank_rule_replayed(self):
        df = pd.DataFrame({"source": ["s"] * 10,
                           "doc_id": range(10)})
        got = stratified_quota_split(ray.data.from_pandas(df),
                                     num_buckets=4)
        order = sorted(range(10),
                       key=lambda i: (hashlib.md5(str(i).encode())
                                      .hexdigest(), i))
        want = {}
        for rk, i in enumerate(order, 1):
            want[i] = ("train" if rk <= 8 else
                       "val" if rk <= 9 else "test")
        assert dict(zip(got["doc_id"], got["split"])) == want

    def test_tiny_stratum_all_train(self):
        df = pd.DataFrame({"source": ["t"] * 5, "doc_id": range(5)})
        got = stratified_quota_split(ray.data.from_pandas(df),
                                     num_buckets=4)
        assert got["split"].tolist() == ["train"] * 5

    def test_partition_invariant(self):
        rng = np.random.default_rng(67)
        df = pd.DataFrame({
            "source": rng.choice(["x", "y", "z"], 300),
            "doc_id": range(300)})
        a = stratified_quota_split(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = stratified_quota_split(
            ray.data.from_pandas(df).repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)
