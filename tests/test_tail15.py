"""Edge-case tests for the seventeenth-wave operators (bag dedup,
duplicate-cluster histogram, calibration bins, bounce rate)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.dedup import bag_dedup, dup_cluster_hist
from web2llmstxt_ray.ops.events import session_bounce_by_entry
from web2llmstxt_ray.ops.stats import calibration_bins

US = 1_000_000
MIN = 60 * US


class TestBagDedup:
    def test_permuted_copies_collapse(self):
        df = pd.DataFrame({"doc_id": [0, 1, 2],
                           "text": ["a b c", "c b a", "a b"]})
        got = bag_dedup(ray.data.from_pandas(df), num_buckets=4)
        assert got["doc_id"].tolist() == [0, 2]
        assert got["n_copies"].tolist() == [2, 1]

    def test_case_and_run_whitespace_insensitive(self):
        # lower(trim) + \s+ split: "  A   b " and "b a" share a bag
        df = pd.DataFrame({"doc_id": [5, 9],
                           "text": ["  A   b ", "b a"]})
        got = bag_dedup(ray.data.from_pandas(df), num_buckets=4)
        assert got["doc_id"].tolist() == [5]
        assert got["n_copies"].tolist() == [2]

    def test_multiset_not_set(self):
        # "a a b" and "a b" differ as MULTISETS — no collapse
        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["a a b", "a b"]})
        got = bag_dedup(ray.data.from_pandas(df), num_buckets=4)
        assert len(got) == 2

    def test_partition_invariant(self):
        rng = np.random.default_rng(11)
        words = list("abcdefg")
        texts = [" ".join(rng.choice(words, 4))
                 for _ in range(300)]
        df = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
        a = bag_dedup(ray.data.from_pandas(df).repartition(1),
                      num_buckets=4)
        b = bag_dedup(ray.data.from_pandas(df).repartition(7),
                      num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestDupClusterHist:
    def test_hand_fixture(self):
        df = pd.DataFrame({"text": ["x", "x", "x", "y", "y", "z"]})
        got = dup_cluster_hist(ray.data.from_pandas(df),
                               num_buckets=4)
        assert got["cluster_size"].tolist() == [1, 2, 3]
        assert got["n_clusters"].tolist() == [1, 1, 1]
        assert got["n_docs"].tolist() == [1, 2, 3]

    def test_docs_total_conserved_and_partition_invariant(self):
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "text": [f"t{i}" for i in rng.integers(0, 80, 500)]})
        a = dup_cluster_hist(ray.data.from_pandas(df).repartition(1),
                             num_buckets=4)
        b = dup_cluster_hist(ray.data.from_pandas(df).repartition(9),
                             num_buckets=16)
        pd.testing.assert_frame_equal(a, b)
        assert int(a["n_docs"].sum()) == 500


class TestCalibrationBins:
    def test_uniform_grid(self):
        # cents 0..99, 10 bins over span 100 → bin = c // 10,
        # positives are c >= 50
        df = pd.DataFrame({"score": np.arange(100) / 100.0,
                           "y": (np.arange(100) >= 50).astype("int64")})
        got = calibration_bins(ray.data.from_pandas(df),
                               "score", "y", n_bins=10)
        assert got["bin"].tolist() == list(range(10))
        assert got["n"].tolist() == [10] * 10
        assert got["pos_rate"].tolist() == [0.0] * 5 + [1.0] * 5
        np.testing.assert_allclose(
            got["mean_score"], [(b * 10 + 4.5) / 100 for b in range(10)])

    def test_empty_bins_dropped(self):
        df = pd.DataFrame({"score": [0.00, 0.99], "y": [0, 1]})
        got = calibration_bins(ray.data.from_pandas(df),
                               "score", "y", n_bins=10)
        assert got["bin"].tolist() == [0, 9]

    def test_degenerate_single_value(self):
        df = pd.DataFrame({"score": [2.5] * 7, "y": [1, 0, 1, 0, 1, 0, 1]})
        got = calibration_bins(ray.data.from_pandas(df),
                               "score", "y", n_bins=10)
        assert got["bin"].tolist() == [0]
        assert int(got.loc[0, "n"]) == 7
        assert got.loc[0, "mean_score"] == 2.5


class TestBounceRate:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "event_id": list(range(len(rows))),
            "event_type": [r[2] for r in rows]})

    def test_hand_fixture(self):
        # user 1: two single-event sessions (31-min gap) → 2 bounces
        # user 2: one 2-event session → not a bounce
        rows = [(1, 0, "view"), (1, 31 * MIN, "view"),
                (2, 0, "click"), (2, 1 * MIN, "view")]
        got = session_bounce_by_entry(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        m = {r.entry_type: (r.n_sessions, r.n_bounce)
             for r in got.itertuples()}
        assert m == {"view": (2, 2), "click": (1, 0)}

    def test_exact_30min_gap_same_session(self):
        rows = [(1, 0, "view"), (1, 30 * MIN, "click")]
        got = session_bounce_by_entry(
            ray.data.from_pandas(self._mk(rows)), num_buckets=4)
        assert got["n_sessions"].tolist() == [1]
        assert got["n_bounce"].tolist() == [0]

    def test_matches_sequential(self):
        rng = np.random.default_rng(17)
        rows = [(int(u), int(t) * US, str(e)) for u, t, e in
                zip(rng.integers(0, 8, 400),
                    rng.integers(0, 3 * 86_400, 400),
                    rng.choice(list("pq"), 400))]
        got = session_bounce_by_entry(
            ray.data.from_pandas(self._mk(rows)).repartition(5),
            num_buckets=8)
        df = self._mk(rows).sort_values(["user_id", "ts", "event_id"])
        want: dict[str, list[int]] = {}
        for _, g in df.groupby("user_id"):
            us = g["ts"].astype("int64").to_numpy() // 1000
            types = g["event_type"].tolist()
            start = 0
            for i in range(1, len(g) + 1):
                if i == len(g) or us[i] - us[i - 1] > 30 * MIN:
                    ent = types[start]
                    w = want.setdefault(ent, [0, 0])
                    w[0] += 1
                    w[1] += int(i - start == 1)
                    start = i
        for r in got.itertuples():
            assert want[r.entry_type] == [r.n_sessions, r.n_bounce]
        assert sum(w[0] for w in want.values()) == \
            int(got["n_sessions"].sum())
