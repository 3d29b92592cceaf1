"""Edge-case tests for the twenty-second-wave operators (degree
histogram, daily value bands, prefix-dup groups, join-size audit)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.dedup import prefix_dup_groups
from web2llmstxt_ray.ops.graph import degree_histogram
from web2llmstxt_ray.ops.relational import join_size_audit
from web2llmstxt_ray.ops.windows import daily_value_bands


def _pairs(rows):
    return ray.data.from_pandas(pd.DataFrame(
        {"u": [r[0] for r in rows], "v": [r[1] for r in rows]}))


class TestDegreeHistogram:
    def test_triangle(self):
        got = degree_histogram(_pairs([(1, 2), (2, 3), (1, 3)]),
                               num_buckets=4)
        assert got["degree"].tolist() == [2]
        assert got["n_nodes"].tolist() == [3]

    def test_duplicate_edges_collapse(self):
        got = degree_histogram(_pairs([(1, 2), (1, 2), (2, 1)]),
                               num_buckets=4)
        assert got["degree"].tolist() == [1]
        assert got["n_nodes"].tolist() == [2]

    def test_star_and_edge_conservation(self):
        rows = [(0, i) for i in range(1, 8)]
        got = degree_histogram(_pairs(rows), num_buckets=4)
        m = dict(zip(got["degree"], got["n_nodes"]))
        assert m == {1: 7, 7: 1}
        total = (got["degree"] * got["n_nodes"]).sum()
        assert int(total) == 2 * 7


class TestDailyValueBands:
    def test_hand_quantiles(self):
        df = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01"] * 10),
            "value": [i / 100 for i in range(1, 11)]})
        got = daily_value_bands(ray.data.from_pandas(df),
                                num_buckets=4)
        assert (int(got.loc[0, "p10"]), int(got.loc[0, "p50"]),
                int(got.loc[0, "p90"])) == (1, 5, 9)
        assert int(got.loc[0, "n"]) == 10

    def test_days_independent(self):
        df = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01"] * 3
                                 + ["2024-01-02"] * 3),
            "value": [1.0, 1.0, 1.0, 9.0, 9.0, 9.0]})
        got = daily_value_bands(ray.data.from_pandas(df),
                                num_buckets=4)
        assert got["p50"].tolist() == [100, 900]

    def test_partition_invariant(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "ts": pd.to_datetime(rng.integers(0, 5, 400),
                                 unit="D"),
            "value": rng.integers(1, 3000, 400) / 100.0})
        a = daily_value_bands(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = daily_value_bands(
            ray.data.from_pandas(df).repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestPrefixDupGroups:
    def test_shared_long_prefix_groups(self):
        base = "w" * 200
        df = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": [base + " tail one", base + " other tail",
                     "completely different"]})
        got = prefix_dup_groups(ray.data.from_pandas(df),
                                prefix_chars=128, num_buckets=4)
        assert got["doc_id"].tolist() == [0]
        assert got["n_copies"].tolist() == [2]

    def test_short_texts_differ_within_prefix(self):
        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["short a", "short b"]})
        got = prefix_dup_groups(ray.data.from_pandas(df),
                                prefix_chars=128, num_buckets=4)
        assert len(got) == 0

    def test_normalization_rule(self):
        df = pd.DataFrame({"doc_id": [3, 9],
                           "text": ["  ABC def  ", "abc def"]})
        got = prefix_dup_groups(ray.data.from_pandas(df),
                                prefix_chars=128, num_buckets=4)
        assert got["doc_id"].tolist() == [3]


class TestJoinSizeAudit:
    def _run(self, lk, rk):
        left = ray.data.from_pandas(pd.DataFrame({"lk": lk}))
        right = ray.data.from_pandas(pd.DataFrame({"rk": rk}))
        return join_size_audit(left, right, "lk", "rk",
                               num_buckets=4)

    def test_hand_fixture(self):
        got = self._run([1, 1, 2], [1, 2, 2, 3])
        r = got.iloc[0]
        assert (int(r["n_keys_left"]), int(r["n_keys_right"]),
                int(r["n_matched_keys"])) == (2, 3, 2)
        assert (int(r["left_rows"]), int(r["right_rows"])) == (3, 4)
        assert int(r["exact_pairs"]) == 2 * 1 + 1 * 2

    def test_disjoint_keys(self):
        got = self._run([1, 2], [3, 4])
        assert int(got.loc[0, "exact_pairs"]) == 0
        assert int(got.loc[0, "n_matched_keys"]) == 0

    def test_matches_real_join_and_partitions(self):
        rng = np.random.default_rng(47)
        lk = rng.integers(0, 30, 300).tolist()
        rk = rng.integers(0, 30, 200).tolist()
        got = self._run(lk, rk)
        want = pd.DataFrame({"k": lk}).merge(
            pd.DataFrame({"k": rk}), on="k")
        assert int(got.loc[0, "exact_pairs"]) == len(want)
