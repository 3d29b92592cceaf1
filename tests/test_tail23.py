"""Edge-case tests for the twenty-fifth-wave operators (DAU overlap,
new-vs-returning, label purity)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import dau_overlap, new_vs_returning
from web2llmstxt_ray.ops.textstats import group_label_purity

DAY = 86_400 * 1_000_000


def _ev(rows):
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] * DAY for r in rows], unit="us")})


class TestDauOverlap:
    def test_hand_fixture(self):
        # day0: {1,2}; day1: {2,3}; common {2} → J = 1/3
        rows = [(1, 0), (2, 0), (2, 1), (3, 1)]
        got = dau_overlap(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        assert len(got) == 1
        r = got.iloc[0]
        assert (int(r["n_a"]), int(r["n_b"]), int(r["n_common"])) \
            == (2, 2, 1)
        np.testing.assert_allclose(r["jaccard"], 1 / 3)

    def test_disjoint_days(self):
        rows = [(1, 0), (2, 1)]
        got = dau_overlap(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        assert int(got.loc[0, "n_common"]) == 0

    def test_gap_day_produces_no_pair(self):
        rows = [(1, 0), (1, 2)]
        got = dau_overlap(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        assert len(got) == 0

    def test_partition_invariant(self):
        rng = np.random.default_rng(71)
        rows = [(int(u), int(d)) for u, d in
                zip(rng.integers(0, 25, 500),
                    rng.integers(0, 10, 500))]
        a = dau_overlap(
            ray.data.from_pandas(_ev(rows)).repartition(1),
            num_buckets=4)
        b = dau_overlap(
            ray.data.from_pandas(_ev(rows)).repartition(9),
            num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestNewVsReturning:
    def test_hand_fixture(self):
        rows = [(1, 0), (2, 0), (1, 1), (3, 1), (1, 1)]
        got = new_vs_returning(ray.data.from_pandas(_ev(rows)),
                               num_buckets=4)
        assert got["n_new"].tolist() == [2, 1]
        assert got["n_returning"].tolist() == [0, 1]
        assert got["n_active"].tolist() == [2, 2]

    def test_all_new_on_single_day(self):
        rows = [(i, 0) for i in range(5)]
        got = new_vs_returning(ray.data.from_pandas(_ev(rows)),
                               num_buckets=4)
        assert got["n_new"].tolist() == [5]
        assert got["n_returning"].tolist() == [0]

    def test_partition_invariant(self):
        rng = np.random.default_rng(73)
        rows = [(int(u), int(d)) for u, d in
                zip(rng.integers(0, 30, 400),
                    rng.integers(0, 8, 400))]
        a = new_vs_returning(
            ray.data.from_pandas(_ev(rows)).repartition(1),
            num_buckets=4)
        b = new_vs_returning(
            ray.data.from_pandas(_ev(rows)).repartition(9),
            num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestGroupLabelPurity:
    def test_hand_fixture(self):
        df = pd.DataFrame({"source": ["A"] * 4 + ["B"],
                           "lang": ["en", "en", "en", "fr", "de"]})
        got = group_label_purity(ray.data.from_pandas(df))
        a = got[got["source"] == "A"].iloc[0]
        assert a["modal_label"] == "en"
        np.testing.assert_allclose(a["purity"], 0.75)
        b = got[got["source"] == "B"].iloc[0]
        assert (b["modal_label"], b["purity"]) == ("de", 1.0)

    def test_tie_breaks_to_smallest_label(self):
        df = pd.DataFrame({"source": ["S", "S"],
                           "lang": ["zz", "aa"]})
        got = group_label_purity(ray.data.from_pandas(df))
        assert got.loc[0, "modal_label"] == "aa"

    def test_partition_invariant(self):
        rng = np.random.default_rng(79)
        df = pd.DataFrame({
            "source": rng.choice(["x", "y"], 300),
            "lang": rng.choice(["en", "fr", "de"], 300)})
        a = group_label_purity(
            ray.data.from_pandas(df).repartition(1))
        b = group_label_purity(
            ray.data.from_pandas(df).repartition(9))
        pd.testing.assert_frame_equal(a, b)
