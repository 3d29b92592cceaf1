"""Edge-case tests for the eighteenth-wave operators (LSH bucket
balance, next-event accuracy, RFM segments, hapax rate)."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from web2llmstxt_ray.ops.ann import lsh_bucket_balance
from web2llmstxt_ray.ops.events import next_event_accuracy
from web2llmstxt_ray.ops.stats import rfm_segments
from web2llmstxt_ray.ops.textstats import hapax_rate

US = 1_000_000


def _emb_df(n: int, d: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    return pd.DataFrame({"embedding": [x.tolist() for x in X]})


class TestLshBucketBalance:
    def test_matches_sequential_rule(self):
        df = _emb_df(40, 8, 2)
        got = lsh_bucket_balance(ray.data.from_pandas(df),
                                 n_planes=4)
        W = np.array([[int(hashlib.md5(f"{p},{d}".encode())
                           .hexdigest()[:8], 16) % 2001 - 1000
                       for d in range(8)] for p in range(4)],
                     dtype=np.int64)
        want: dict[int, int] = {}
        for x in df["embedding"]:
            q = np.floor(np.asarray(x, dtype=np.float64) * 32768.0
                         + 0.5).astype(np.int64)
            bits = (W @ q >= 0).astype(int)
            b = int(sum(bit << p for p, bit in enumerate(bits)))
            want[b] = want.get(b, 0) + 1
        assert dict(zip(got["bucket"], got["n_vecs"])) == want

    def test_total_conserved_partition_invariant(self):
        df = _emb_df(300, 16, 5)
        a = lsh_bucket_balance(
            ray.data.from_pandas(df).repartition(1), n_planes=8)
        b = lsh_bucket_balance(
            ray.data.from_pandas(df).repartition(7), n_planes=8)
        pd.testing.assert_frame_equal(a, b)
        assert int(a["n_vecs"].sum()) == 300

    def test_large_component_raises(self):
        df = pd.DataFrame({"embedding": [[9.0, 0.0]]})
        with pytest.raises(Exception):
            lsh_bucket_balance(ray.data.from_pandas(df), n_planes=2)


class TestNextEventAccuracy:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * US for r in rows],
                                 unit="us"),
            "event_id": list(range(len(rows))),
            "event_type": [r[2] for r in rows]})

    def test_hand_fixture(self):
        rows = [(1, 0, "a"), (1, 1, "b"), (2, 2, "a"), (2, 3, "b"),
                (3, 4, "a"), (3, 5, "c")]
        got = next_event_accuracy(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert got["cur_type"].tolist() == ["a"]
        assert got["predicted_next"].tolist() == ["b"]
        assert got["n_transitions"].tolist() == [3]
        assert got["n_correct"].tolist() == [2]
        np.testing.assert_allclose(got["accuracy"], [2 / 3])

    def test_tie_breaks_to_smallest_next(self):
        rows = [(1, 0, "x"), (1, 1, "q"), (2, 2, "x"), (2, 3, "b")]
        got = next_event_accuracy(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert got["predicted_next"].tolist() == ["b"]

    def test_transitions_never_span_users(self):
        rows = [(1, 0, "a"), (2, 1, "b")]
        got = next_event_accuracy(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert len(got) == 0 or got["n_transitions"].sum() == 0


class TestRfmSegments:
    def _mk(self, rows):
        return pd.DataFrame({
            "k": [r[0] for r in rows],
            "d": pd.to_datetime([r[1] for r in rows], unit="D"),
            "v": [float(r[2]) for r in rows]})

    def test_quintiles_over_distinct_frequencies(self):
        # customer i places i+1 orders, all on day 0 of value 1.00 —
        # F values 1..10, ceil-rule boundaries 2,4,6,8 → scores
        # 1,1,2,2,3,3,4,4,5,5; R and M follow the same histograms
        rows = [(i, 0, 1.0) for i in range(10) for _ in range(i + 1)]
        got = rfm_segments(ray.data.from_pandas(self._mk(rows)),
                           key_col="k", ts_col="d", value_col="v",
                           n_tiles=5, num_buckets=4)
        assert got["f_score"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
        # same-day activity → recency 0 for everyone → all r_score 1
        assert got["r_score"].tolist() == [1] * 10
        assert got["rfm"].tolist() == [
            f"1{f}{f}" for f in [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]]

    def test_ties_land_low_and_recency(self):
        # two keys: key 0 last active day 0, key 1 last active day 9
        rows = [(0, 0, 5.0), (1, 9, 5.0), (1, 0, 5.0)]
        got = rfm_segments(ray.data.from_pandas(self._mk(rows)),
                           key_col="k", ts_col="d", value_col="v",
                           n_tiles=5, num_buckets=4)
        assert got.loc[got["k"] == 0, "r_days"].item() == 9
        assert got.loc[got["k"] == 1, "r_days"].item() == 0
        assert got.loc[got["k"] == 1, "value_cents"].item() == 1000

    def test_constant_dimension_collapses_to_score_1(self):
        rows = [(i, i, 2.0) for i in range(6)]
        got = rfm_segments(ray.data.from_pandas(self._mk(rows)),
                           key_col="k", ts_col="d", value_col="v",
                           n_tiles=5, num_buckets=4)
        # every key has F=1 and M=200: single distinct value → all
        # quantile boundaries equal → collapse → everyone scores 1
        assert got["f_score"].tolist() == [1] * 6
        assert got["m_score"].tolist() == [1] * 6


class TestHapaxRate:
    def test_hand_fixture(self):
        df = pd.DataFrame({"source": ["A", "A", "B"],
                           "text": ["a b a", "c", "z z"]})
        got = hapax_rate(ray.data.from_pandas(df), num_buckets=4)
        a = got[got["source"] == "A"].iloc[0]
        assert (int(a["n_types"]), int(a["n_hapax"]),
                int(a["n_tokens"])) == (3, 2, 4)
        np.testing.assert_allclose(a["hapax_rate"], 2 / 3)
        b = got[got["source"] == "B"].iloc[0]
        assert (int(b["n_types"]), int(b["n_hapax"])) == (1, 0)

    def test_blank_docs_skipped(self):
        df = pd.DataFrame({"source": ["A", "A"],
                           "text": ["tok", "   "]})
        got = hapax_rate(ray.data.from_pandas(df), num_buckets=4)
        assert int(got.loc[0, "n_tokens"]) == 1

    def test_partition_invariant(self):
        rng = np.random.default_rng(21)
        words = list("abcdefghij")
        df = pd.DataFrame({
            "source": [f"s{i % 4}" for i in range(200)],
            "text": [" ".join(rng.choice(words, 5))
                     for _ in range(200)]})
        a = hapax_rate(ray.data.from_pandas(df).repartition(1),
                       num_buckets=4)
        b = hapax_rate(ray.data.from_pandas(df).repartition(9),
                       num_buckets=16)
        pd.testing.assert_frame_equal(a, b)
