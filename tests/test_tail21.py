"""Edge-case tests for the twenty-third-wave operators (dimension
drift, char entropy, length tail ratio, sorted-run audit)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import dimension_drift
from web2llmstxt_ray.ops.relational import sorted_run_audit
from web2llmstxt_ray.ops.textstats import char_entropy, \
    length_tail_ratio


class TestDimensionDrift:
    def test_planted_drift(self):
        df = pd.DataFrame({
            "vec_id": [0, 1, 2, 3],
            "embedding": [[0.0], [0.0], [1.0], [1.0]]})
        got = dimension_drift(ray.data.from_pandas(df), split_id=2)
        assert got["dim"].tolist() == [0]
        assert (int(got.loc[0, "n_a"]), int(got.loc[0, "n_b"])) == \
            (2, 2)
        np.testing.assert_allclose(got.loc[0, "mean_a"], 0.0)
        np.testing.assert_allclose(got.loc[0, "mean_b"], 1.0)
        np.testing.assert_allclose(got.loc[0, "delta"], 1.0)

    def test_no_drift_and_default_split(self):
        df = pd.DataFrame({
            "vec_id": [0, 1, 2, 3],
            "embedding": [[0.5, -0.25]] * 4})
        got = dimension_drift(ray.data.from_pandas(df))
        np.testing.assert_allclose(got["delta"], [0.0, 0.0])
        assert got["dim"].tolist() == [0, 1]

    def test_partition_invariant(self):
        rng = np.random.default_rng(53)
        X = rng.normal(size=(120, 6)).astype(np.float32)
        df = pd.DataFrame({"vec_id": np.arange(120),
                           "embedding": [x.tolist() for x in X]})
        a = dimension_drift(ray.data.from_pandas(df).repartition(1))
        b = dimension_drift(ray.data.from_pandas(df).repartition(7))
        pd.testing.assert_frame_equal(a, b)


class TestCharEntropy:
    def _run(self, texts):
        df = pd.DataFrame({"doc_id": range(len(texts)),
                           "text": texts})
        out = char_entropy(ray.data.from_pandas(df)).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def test_hand_values(self):
        got = self._run(["aab", "aaaa"])
        np.testing.assert_allclose(
            got.loc[0, "entropy"],
            math.log(3) - (2 * math.log(2)) / 3)
        assert got.loc[1, "entropy"] == 0.0
        assert got["n_distinct_chars"].tolist() == [2, 1]

    def test_uniform_alphabet_is_ln_k(self):
        got = self._run(["abcd"])
        np.testing.assert_allclose(got.loc[0, "entropy"],
                                   math.log(4))


class TestLengthTailRatio:
    def test_hand_quantiles(self):
        df = pd.DataFrame({"source": ["A"] * 10,
                           "n_chars": list(range(1, 11))})
        got = length_tail_ratio(ray.data.from_pandas(df),
                                num_buckets=4)
        r = got.iloc[0]
        assert (int(r["p50"]), int(r["p90"]), int(r["p99"])) == \
            (5, 9, 10)
        np.testing.assert_allclose(r["tail_ratio"], 9 / 5)

    def test_partition_invariant(self):
        rng = np.random.default_rng(59)
        df = pd.DataFrame({
            "source": rng.choice(["x", "y", "z"], 500),
            "n_chars": rng.integers(10, 5000, 500)})
        a = length_tail_ratio(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = length_tail_ratio(
            ray.data.from_pandas(df).repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestSortedRunAudit:
    def test_sorted_dataset_passes(self):
        ds = ray.data.from_pandas(
            pd.DataFrame({"v": np.arange(100)})).repartition(4)
        got = sorted_run_audit(ds.sort("v"), "v")
        assert bool(got.loc[0, "globally_sorted"])
        assert int(got.loc[0, "n_rows"]) == 100

    def test_unsorted_within_block_fails(self):
        ds = ray.data.from_pandas(pd.DataFrame({"v": [3, 1, 2]}))
        got = sorted_run_audit(ds, "v")
        assert not bool(got.loc[0, "globally_sorted"])
        assert int(got.loc[0, "blocks_sorted_within"]) == 0

    def test_boundary_violation_detected(self):
        a = ray.data.from_pandas(pd.DataFrame({"v": [1, 5]}))
        b = ray.data.from_pandas(pd.DataFrame({"v": [3, 9]}))
        got = sorted_run_audit(a.union(b), "v")
        assert int(got.loc[0, "blocks_sorted_within"]) == 2
        assert not bool(got.loc[0, "boundaries_sorted"])
        assert not bool(got.loc[0, "globally_sorted"])
