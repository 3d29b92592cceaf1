"""Edge-case tests for the twentieth-wave operators (U-shaped
attribution, embedding norm profile, blocking cost audit, block skew
audit)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import emb_norm_profile
from web2llmstxt_ray.ops.dedup import blocking_cost_audit, \
    block_skew_audit
from web2llmstxt_ray.ops.windows import ushape_touch_attribution

US = 1_000_000


def _mk_events(rows):
    return pd.DataFrame({
        "event_id": list(range(len(rows))),
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] * US for r in rows], unit="us"),
        "event_type": [r[2] for r in rows],
        "value": [float(r[3]) for r in rows]})


class TestUshapeAttribution:
    def _run(self, rows):
        return ushape_touch_attribution(
            ray.data.from_pandas(_mk_events(rows)), num_buckets=4)

    def test_three_touches_40_20_40(self):
        rows = [(1, 0, "a", 0.0), (1, 1, "b", 0.0), (1, 2, "c", 0.0),
                (1, 3, "purchase", 10.00)]
        got = self._run(rows)
        m = dict(zip(got["channel"], got["revenue_i"]))
        assert m == {"a": 400, "b": 200, "c": 400}

    def test_single_touch_takes_all(self):
        rows = [(1, 0, "a", 0.0), (1, 1, "purchase", 3.33)]
        got = self._run(rows)
        assert dict(zip(got["channel"], got["revenue_i"])) == \
            {"a": 333}

    def test_two_touches_odd_cents(self):
        rows = [(1, 0, "a", 0.0), (1, 1, "b", 0.0),
                (1, 2, "purchase", 0.05)]
        got = self._run(rows)
        m = dict(zip(got["channel"], got["revenue_i"]))
        assert m == {"a": 3, "b": 2}

    def test_middle_remainder_to_earliest(self):
        # cents=1003: ends get 401 each, middles split 201 → 101, 100
        rows = [(1, 0, "a", 0.0), (1, 1, "m1", 0.0),
                (1, 2, "m2", 0.0), (1, 3, "z", 0.0),
                (1, 4, "purchase", 10.03)]
        got = self._run(rows)
        m = dict(zip(got["channel"], got["revenue_i"]))
        assert m == {"a": 401, "m1": 101, "m2": 100, "z": 401}

    def test_windowless_purchase_is_direct(self):
        rows = [(1, 0, "purchase", 2.00)]
        got = self._run(rows)
        assert dict(zip(got["channel"], got["revenue_i"])) == \
            {"direct": 200}

    def test_credits_reconcile(self):
        rng = np.random.default_rng(31)
        rows = [(int(u), int(t), str(e), float(v)) for u, t, e, v in
                zip(rng.integers(0, 6, 300),
                    rng.integers(0, 86_400, 300),
                    rng.choice(["view", "click", "purchase"], 300),
                    rng.integers(1, 10_000, 300) / 100.0)]
        got = self._run(rows)
        want = sum(int(np.rint(v * 100)) for _, _, e, v in rows
                   if e == "purchase")
        assert int(got["revenue_i"].sum()) == want


class TestEmbNormProfile:
    def test_hand_quartiles(self):
        df = pd.DataFrame({
            "embedding": [[1.0], [2.0], [3.0], [4.0]],
            "label": [0, 0, 0, 0]})
        got = emb_norm_profile(ray.data.from_pandas(df),
                               num_buckets=4)
        q = [32768, 65536, 98304, 131072]
        assert int(got.loc[0, "n_vecs"]) == 4
        assert int(got.loc[0, "p25"]) == q[0] ** 2
        assert int(got.loc[0, "p50"]) == q[1] ** 2
        assert int(got.loc[0, "p75"]) == q[2] ** 2

    def test_partition_invariant(self):
        rng = np.random.default_rng(19)
        X = rng.normal(size=(200, 8)).astype(np.float32)
        df = pd.DataFrame({"embedding": [x.tolist() for x in X],
                           "label": rng.integers(0, 4, 200)})
        a = emb_norm_profile(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = emb_norm_profile(
            ray.data.from_pandas(df).repartition(7), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestBlockingCostAudit:
    def test_hand_fixture(self):
        df = pd.DataFrame({"lang": ["en", "en", "en", "fr"],
                           "n_chars": [0, 10, 300, 5]})
        got = blocking_cost_audit(ray.data.from_pandas(df),
                                  block_width=256, num_buckets=4)
        en = got[got["lang"] == "en"].iloc[0]
        assert (int(en["n_docs"]), int(en["n_blocks"]),
                int(en["max_block"]), int(en["pair_cost"])) == \
            (3, 2, 2, 1)
        fr = got[got["lang"] == "fr"].iloc[0]
        assert int(fr["pair_cost"]) == 0

    def test_partition_invariant(self):
        rng = np.random.default_rng(37)
        df = pd.DataFrame({
            "lang": rng.choice(["a", "b"], 400),
            "n_chars": rng.integers(0, 2000, 400)})
        a = blocking_cost_audit(
            ray.data.from_pandas(df).repartition(1), num_buckets=4)
        b = blocking_cost_audit(
            ray.data.from_pandas(df).repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestBlockSkewAudit:
    def test_counts_fold(self):
        df = pd.DataFrame({"x": range(100)})
        got = block_skew_audit(
            ray.data.from_pandas(df).repartition(4))
        nb = int(got.loc[0, "n_blocks"])
        assert 1 <= nb <= 4
        total = got.loc[0, "mean_rows"] * nb
        np.testing.assert_allclose(total, 100.0)
        assert got.loc[0, "skew"] >= 1.0
        assert int(got.loc[0, "max_rows"]) >= int(got.loc[0,
                                                          "min_rows"])
