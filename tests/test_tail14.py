"""Edge-case tests for the sixteenth-wave operators (batch novelty,
event trigrams, demand classification)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.dedup import batch_novelty
from web2llmstxt_ray.ops.events import top_event_trigrams
from web2llmstxt_ray.ops.stats import demand_classification

US = 1_000_000


class TestBatchNovelty:
    def test_hand_fixture(self):
        # batch 0: ids 0,1 both new; batch 1: id 100 repeats id 0's
        # text, id 101 is new
        df = pd.DataFrame({"doc_id": [0, 1, 100, 101],
                           "text": ["t0", "t1", "t0", "t2"]})
        got = batch_novelty(ray.data.from_pandas(df),
                            batch_size_ids=100, num_buckets=4)
        assert got["batch"].tolist() == [0, 1]
        assert got["n_novel"].tolist() == [2, 1]
        np.testing.assert_allclose(got["novelty_rate"], [1.0, 0.5])

    def test_duplicate_within_first_batch_both_novel(self):
        # both copies live in the first-seen batch → both count novel
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["x", "x"]})
        got = batch_novelty(ray.data.from_pandas(df),
                            batch_size_ids=100, num_buckets=4)
        assert got["n_novel"].tolist() == [2]

    def test_partition_invariant(self):
        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "doc_id": np.arange(400),
            "text": [f"d{i}" for i in rng.integers(0, 120, 400)]})
        a = batch_novelty(ray.data.from_pandas(df).repartition(1),
                          batch_size_ids=50, num_buckets=4)
        b = batch_novelty(ray.data.from_pandas(df).repartition(9),
                          batch_size_ids=50, num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestEventTrigrams:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * US for r in rows],
                                 unit="us"),
            "event_id": list(range(len(rows))),
            "event_type": [r[2] for r in rows]})

    def test_windows_never_span_users(self):
        rows = [(1, 0, "a"), (1, 1, "b"), (2, 2, "c"), (2, 3, "d"),
                (2, 4, "e")]
        got = top_event_trigrams(ray.data.from_pandas(self._mk(rows)),
                                 k=10, num_buckets=4)
        assert got["trigram"].tolist() == ["c>d>e"]

    def test_matches_sequential(self):
        rng = np.random.default_rng(4)
        rows = [(int(u), int(t), str(e)) for u, t, e in
                zip(rng.integers(0, 6, 300),
                    rng.integers(0, 10_000, 300),
                    rng.choice(list("pqr"), 300))]
        got = top_event_trigrams(
            ray.data.from_pandas(self._mk(rows)).repartition(5),
            k=100, num_buckets=8)
        df = self._mk(rows).sort_values(["user_id", "ts", "event_id"])
        cnt: dict[str, int] = {}
        for _, g in df.groupby("user_id"):
            t = g["event_type"].tolist()
            for i in range(len(t) - 2):
                s = f"{t[i]}>{t[i+1]}>{t[i+2]}"
                cnt[s] = cnt.get(s, 0) + 1
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert list(zip(got["trigram"], got["n"])) == \
            [(s, n) for s, n in want[:100]]


class TestDemandClassification:
    def _mk(self, rows):
        return pd.DataFrame({
            "l_partkey": [r[0] for r in rows],
            "l_shipdate": pd.to_datetime([r[1] for r in rows],
                                         unit="D"),
            "l_quantity": [float(r[2]) for r in rows]})

    def test_smooth_vs_lumpy(self):
        # part 1 ships EVERY day with constant qty → smooth
        # part 2 ships on 2 of 10 days with wildly different sizes →
        # lumpy (ADI = 10/2 = 5 ≥ 1.32; CV² of (1, 99) ≥ 0.49)
        rows = [(1, d, 10) for d in range(10)] \
            + [(2, 0, 1), (2, 9, 99)]
        got = demand_classification(
            ray.data.from_pandas(self._mk(rows)),
            key_col="l_partkey", ts_col="l_shipdate",
            qty_col="l_quantity", num_buckets=4)
        m = dict(zip(got["l_partkey"], got["demand_class"]))
        assert m == {1: "smooth", 2: "lumpy"}
        assert got.loc[got["l_partkey"] == 1, "adi"].item() == 1.0
        assert got.loc[got["l_partkey"] == 1, "cv2"].item() == 0.0

    def test_same_day_shipments_collapse(self):
        # two shipments on one day are ONE demand occurrence of
        # summed size
        rows = [(1, 0, 3), (1, 0, 4), (1, 1, 7)]
        got = demand_classification(
            ray.data.from_pandas(self._mk(rows)),
            key_col="l_partkey", ts_col="l_shipdate",
            qty_col="l_quantity", num_buckets=4)
        assert int(got.loc[0, "n_demand_days"]) == 2
        assert got.loc[0, "cv2"] == 0.0   # sizes (7, 7)

    def test_exact_boundary_is_integer_decided(self):
        # ADI exactly 1.32 (P=33 periods, D=25 demand days) → the
        # >= boundary fires: intermittent, not smooth
        rows = [(1, d, 5) for d in range(25)] + [(2, d, 5)
                                                 for d in range(33)]
        got = demand_classification(
            ray.data.from_pandas(self._mk(rows)),
            key_col="l_partkey", ts_col="l_shipdate",
            qty_col="l_quantity", num_buckets=4)
        m = dict(zip(got["l_partkey"], got["demand_class"]))
        assert m[1] == "intermittent"
        assert m[2] == "smooth"
