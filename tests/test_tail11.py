"""Edge-case tests for the thirteenth-wave operators (Kaplan-Meier
survival, label propagation, source cosine pairs, power means)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import km_survival
from web2llmstxt_ray.ops.graph import label_propagation
from web2llmstxt_ray.ops.stats import grouped_power_means
from web2llmstxt_ray.ops.textstats import source_cosine_pairs

DAY_US = 86_400_000_000


def _ev(rows):
    """rows: (user, day_float, type) → events frame."""
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([int(r[1] * DAY_US) for r in rows],
                             unit="us"),
        "event_type": [r[2] for r in rows]})


class TestKmSurvival:
    def test_hand_computed_curve(self):
        # users 1,2 repeat after 2 and 5 days; user 3 never repeats
        # (censored at day 10 − 1 = 9); horizon = max ts = day 10
        rows = [(1, 0, "purchase"), (1, 2, "purchase"),
                (2, 0, "purchase"), (2, 5, "purchase"),
                (3, 1, "purchase"),
                (9, 10, "view")]
        got = km_survival(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        # durations: 2 (event), 5 (event), 9 (censored)
        # t=2: n=3, d=1 → S=2/3 ; t=5: n=2, d=1 → S=1/3
        assert got["t_days"].tolist() == [2, 5]
        assert got["n_at_risk"].tolist() == [3, 2]
        assert got["n_events"].tolist() == [1, 1]
        np.testing.assert_allclose(got["survival"].to_numpy(),
                                   [2 / 3, 1 / 3], rtol=1e-15)

    def test_all_convert_reaches_zero(self):
        rows = [(1, 0, "purchase"), (1, 1, "purchase"),
                (2, 0, "purchase"), (2, 3, "purchase")]
        got = km_survival(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        assert got["survival"].iloc[-1] == 0.0

    def test_same_timestamp_repeat_not_counted(self):
        # duplicate purchase at the IDENTICAL instant is not a repeat
        rows = [(1, 0, "purchase"), (1, 0, "purchase"),
                (2, 0, "purchase"), (2, 4, "purchase")]
        got = km_survival(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        # only user 2 repeats (4 days); user 1 censored at horizon 4
        assert got["t_days"].tolist() == [4]
        assert got["n_at_risk"].tolist() == [2]

    def test_censored_only_is_empty(self):
        rows = [(1, 0, "purchase"), (2, 3, "purchase"),
                (9, 8, "view")]
        got = km_survival(ray.data.from_pandas(_ev(rows)),
                          num_buckets=4)
        assert len(got) == 0

    def test_partition_invariant(self):
        rng = np.random.default_rng(7)
        rows = [(int(u), float(d), "purchase")
                for u, d in zip(rng.integers(0, 25, 300),
                                rng.uniform(0, 30, 300))]
        a = km_survival(ray.data.from_pandas(_ev(rows)).repartition(1),
                        num_buckets=4)
        b = km_survival(ray.data.from_pandas(_ev(rows)).repartition(9),
                        num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


def _lpa_seq(edges, rounds):
    adj: dict[int, list[int]] = {}
    dedup = sorted({(min(a, b), max(a, b)) for a, b in edges
                    if a != b})
    for a, b in dedup:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt: dict[int, int] = {}
            for w in nbrs:
                cnt[lab[w]] = cnt.get(lab[w], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0][0]
        lab = new
    return lab


class TestLabelPropagation:
    def test_matches_sequential(self):
        rng = np.random.default_rng(2)
        edges = list(zip(rng.integers(0, 30, 120).tolist(),
                         rng.integers(0, 30, 120).tolist()))
        df = pd.DataFrame(edges, columns=["u", "v"])
        got = label_propagation(ray.data.from_pandas(df), rounds=3,
                                num_buckets=8)
        want = _lpa_seq(edges, 3)
        assert dict(zip(got["node"].astype(int),
                        got["label"].astype(int))) == want

    def test_driver_and_distributed_paths_agree(self):
        rng = np.random.default_rng(5)
        edges = list(zip(rng.integers(0, 20, 80).tolist(),
                         rng.integers(0, 20, 80).tolist()))
        df = pd.DataFrame(edges, columns=["u", "v"])
        a = label_propagation(ray.data.from_pandas(df), rounds=3,
                              num_buckets=4)
        b = label_propagation(ray.data.from_pandas(df).repartition(7),
                              rounds=3, num_buckets=16,
                              driver_threshold=0)
        pd.testing.assert_frame_equal(a, b)

    def test_two_cliques_with_bridge(self):
        # cliques {0,1,2,3} and {10,11,12,13} joined by one bridge
        def clique(ns):
            return [(a, b) for i, a in enumerate(ns)
                    for b in ns[i + 1:]]
        edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) \
            + [(3, 10)]
        df = pd.DataFrame(edges, columns=["u", "v"])
        got = label_propagation(ray.data.from_pandas(df), rounds=4,
                                num_buckets=4)
        m = dict(zip(got["node"].astype(int),
                     got["label"].astype(int)))
        assert len({m[0], m[1], m[2]}) == 1
        assert len({m[11], m[12], m[13]}) == 1
        assert m[0] != m[11]


class TestSourceCosine:
    def test_hand_fixture(self):
        df = pd.DataFrame({
            "source": ["s1", "s2", "s3"],
            "text": ["a a b", "a b b", "c c c"]})
        got = source_cosine_pairs(ray.data.from_pandas(df),
                                  num_buckets=4)
        # s1=(2,1), s2=(1,2): dot=4, cos=4/5; s3 shares nothing
        assert len(got) == 1
        assert (got.loc[0, "source_a"], got.loc[0, "source_b"]) \
            == ("s1", "s2")
        assert int(got.loc[0, "dot"]) == 4
        assert abs(got.loc[0, "cosine"] - 0.8) < 1e-15

    def test_identical_distributions_cosine_one(self):
        df = pd.DataFrame({
            "source": ["x", "y"],
            "text": ["w1 w2 w2 w3", "w1 w2 w2 w3"]})
        got = source_cosine_pairs(ray.data.from_pandas(df),
                                  num_buckets=4)
        assert abs(got.loc[0, "cosine"] - 1.0) < 1e-12

    def test_partition_invariant(self):
        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(20)]
        df = pd.DataFrame({
            "source": rng.choice(["a", "b", "c", "d"], 80),
            "text": [" ".join(rng.choice(words,
                                         rng.integers(1, 10)))
                     for _ in range(80)]})
        x = source_cosine_pairs(ray.data.from_pandas(df)
                                .repartition(1), num_buckets=4)
        y = source_cosine_pairs(ray.data.from_pandas(df)
                                .repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(
            x[["source_a", "source_b", "dot"]],
            y[["source_a", "source_b", "dot"]])
        np.testing.assert_allclose(x["cosine"], y["cosine"],
                                   rtol=1e-12)


class TestPowerMeans:
    def test_constant_values_all_equal(self):
        df = pd.DataFrame({"g": ["a"] * 5, "x": [7.0] * 5})
        got = grouped_power_means(ray.data.from_pandas(df), "g", "x")
        for c in ("geo_mean", "har_mean", "rms"):
            assert abs(got.loc[0, c] - 7.0) < 1e-12

    def test_reference_formulas(self):
        rng = np.random.default_rng(11)
        x = rng.uniform(1, 100, 200)
        g = rng.choice(["p", "q"], 200)
        df = pd.DataFrame({"g": g, "x": x})
        got = grouped_power_means(
            ray.data.from_pandas(df).repartition(5), "g", "x")
        for grp in ("p", "q"):
            xs = x[g == grp]
            row = got[got["g"] == grp].iloc[0]
            assert abs(row["geo_mean"]
                       - math.exp(np.log(xs).sum() / len(xs))) < 1e-9
            assert abs(row["har_mean"]
                       - len(xs) / (1.0 / xs).sum()) < 1e-9
            assert abs(row["rms"]
                       - math.sqrt((xs * xs).sum() / len(xs))) < 1e-9
