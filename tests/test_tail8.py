"""Edge-case tests for the tenth-wave operators (Adamic-Adar link
prediction, Hill power-law estimator, integer set-similarity join,
daily autocorrelation)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.dedup import basket_similarity_pairs
from web2llmstxt_ray.ops.graph import adamic_adar_topk, degree_powerlaw
from web2llmstxt_ray.ops.windows import daily_acf


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    keep = u != v
    return pd.DataFrame({"u": u[keep], "v": v[keep]})


def _aa_seq(df: pd.DataFrame, top_n: int) -> pd.DataFrame:
    """Sequential Adamic-Adar oracle: adjacency sets + per-pair fold."""
    adj: dict[int, set[int]] = {}
    for u, v in zip(df["u"], df["v"]):
        a, b = int(min(u, v)), int(max(u, v))
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], tuple[int, float]] = {}
    for w, nbrs in adj.items():
        ns = sorted(nbrs)
        wt = 1.0 / math.log(len(ns))
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                c, s = scores.get(key, (0, 0.0))
                scores[key] = (c + 1, s + wt)
    rows = [(a, b, c, s) for (a, b), (c, s) in scores.items()
            if b not in adj[a]]
    out = pd.DataFrame(rows, columns=["a", "b", "common_neighbors",
                                      "aa_score"])
    out = out.sort_values(["common_neighbors", "a", "b"],
                          ascending=[False, True, True], kind="stable")
    return out.head(top_n).reset_index(drop=True).astype(
        {"a": "int64", "b": "int64", "common_neighbors": "int64"})


class TestAdamicAdar:
    def test_matches_sequential(self):
        df = _random_edges(60, 400, seed=7)
        got = adamic_adar_topk(ray.data.from_pandas(df).repartition(5),
                               top_n=50, num_buckets=8)
        want = _aa_seq(df, top_n=50)
        pd.testing.assert_frame_equal(got, want, check_exact=False,
                                      rtol=1e-12)

    def test_partition_invariant(self):
        df = _random_edges(40, 200, seed=3)
        a = adamic_adar_topk(ray.data.from_pandas(df).repartition(1),
                             top_n=30, num_buckets=4)
        b = adamic_adar_topk(ray.data.from_pandas(df).repartition(9),
                             top_n=30, num_buckets=16)
        pd.testing.assert_frame_equal(a, b, check_exact=False,
                                      rtol=1e-12)

    def test_planted_non_adjacent_hub_pair(self):
        # 0 and 1 share neighbors 2..11 but are NOT adjacent → they
        # must rank first with cn=10; every shared neighbor has deg 2
        # so aa = 10/ln(2)
        rows = [(0, w) for w in range(2, 12)] + \
               [(1, w) for w in range(2, 12)]
        df = pd.DataFrame(rows, columns=["u", "v"])
        got = adamic_adar_topk(ray.data.from_pandas(df), top_n=5,
                               num_buckets=4)
        assert (int(got.loc[0, "a"]), int(got.loc[0, "b"])) == (0, 1)
        assert int(got.loc[0, "common_neighbors"]) == 10
        assert abs(got.loc[0, "aa_score"] - 10 / math.log(2)) < 1e-12

    def test_adjacent_pairs_excluded(self):
        # triangle 0-1-2: every 2-path closes, so no predictions
        df = pd.DataFrame({"u": [0, 1, 0], "v": [1, 2, 2]})
        got = adamic_adar_topk(ray.data.from_pandas(df), top_n=10,
                               num_buckets=4)
        assert len(got) == 0


class TestDegreePowerlaw:
    def test_closed_form(self):
        # star around 0 with 9 leaves: deg(0)=9, deg(leaf)=1; with
        # d_min=5 the tail is just node 0
        df = pd.DataFrame({"u": [0] * 9, "v": range(1, 10)})
        got = degree_powerlaw(ray.data.from_pandas(df), d_min=5,
                              num_buckets=4)
        assert int(got.loc[0, "n_tail"]) == 1
        want_alpha = 1.0 + 1.0 / math.log(9 / 5.0)
        assert abs(got.loc[0, "alpha"] - want_alpha) < 1e-12

    def test_matches_degree_multiset(self):
        df = _random_edges(50, 500, seed=11)
        got = degree_powerlaw(ray.data.from_pandas(df).repartition(7),
                              d_min=3, num_buckets=8)
        # sequential degrees over the distinct undirected edge set
        e = set()
        for u, v in zip(df["u"], df["v"]):
            if u != v:
                e.add((min(u, v), max(u, v)))
        deg: dict[int, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        tail = [d for d in deg.values() if d >= 3]
        s = math.fsum(math.log(d / 3.0) for d in sorted(tail))
        assert int(got.loc[0, "n_tail"]) == len(tail)
        assert abs(got.loc[0, "sum_ln"] - s) < 1e-9
        assert abs(got.loc[0, "alpha"] - (1 + len(tail) / s)) < 1e-9


class TestBasketPairs:
    def test_matches_sequential(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({"s": rng.integers(0, 40, 600),
                           "e": rng.integers(0, 30, 600)})
        got = basket_similarity_pairs(
            ray.data.from_pandas(df).repartition(6), set_col="s",
            elem_col="e", min_common=2, num_buckets=8)
        d = df.drop_duplicates()
        sets = d.groupby("s")["e"].agg(set).to_dict()
        ids = sorted(sets)
        rows = []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                c = len(sets[a] & sets[b])
                if c >= 2:
                    rows.append((a, b, c,
                                 c / len(sets[a] | sets[b])))
        want = pd.DataFrame(rows, columns=["a", "b", "n_common",
                                           "jaccard"]).astype(
            {"a": "int64", "b": "int64", "n_common": "int64"})
        pd.testing.assert_frame_equal(got, want)

    def test_duplicate_input_rows_ignored(self):
        # the same (set, elem) row repeated must count ONCE
        df = pd.DataFrame({"s": [1, 1, 1, 2, 2, 2, 2],
                           "e": [7, 7, 8, 7, 7, 8, 8]})
        got = basket_similarity_pairs(ray.data.from_pandas(df),
                                      set_col="s", elem_col="e",
                                      min_common=2, num_buckets=4)
        assert len(got) == 1
        assert int(got.loc[0, "n_common"]) == 2
        assert got.loc[0, "jaccard"] == 1.0

    def test_below_threshold_dropped(self):
        df = pd.DataFrame({"s": [1, 2], "e": [9, 9]})
        got = basket_similarity_pairs(ray.data.from_pandas(df),
                                      set_col="s", elem_col="e",
                                      min_common=2, num_buckets=4)
        assert len(got) == 0


class TestDailyAcf:
    def _ref_acf(self, x: np.ndarray, max_lag: int) -> list[float]:
        xm = x - x.mean()
        den = float((xm * xm).sum())
        return [float((xm[k:] * xm[:-k]).sum()) / den
                for k in range(1, max_lag + 1)]

    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(2)
        days = np.arange(20)
        counts = rng.integers(1, 50, len(days))
        ts = np.repeat(days * 86_400_000_000, counts) \
            + np.arange(int(counts.sum())) % 1000
        df = pd.DataFrame({"ts": ts.astype("datetime64[us]")})
        got = daily_acf(ray.data.from_pandas(df).repartition(5),
                        max_lag=5)
        want = self._ref_acf(counts.astype(float), 5)
        np.testing.assert_allclose(got["acf"].to_numpy(), want,
                                   rtol=1e-12)

    def test_gap_days_count_zero(self):
        # events on day 0 and day 4 only → the grid is 5 days with
        # zeros between; a perfectly alternating-free series
        ts = np.array([0, 0, 4 * 86_400_000_000],
                      dtype="int64").astype("datetime64[us]")
        got = daily_acf(ray.data.from_pandas(pd.DataFrame({"ts": ts})),
                        max_lag=4)
        x = np.array([2.0, 0, 0, 0, 1.0])
        want = self._ref_acf(x, 4)
        np.testing.assert_allclose(got["acf"].to_numpy(), want,
                                   rtol=1e-12)

    def test_short_series_nan_past_n(self):
        # days [0, 1] with counts [2, 1]: lag 1 is defined, lags ≥ n
        # are NaN (no overlapping window exists)
        ts = np.array([0, 1, 86_400_000_000],
                      dtype="int64").astype("datetime64[us]")
        got = daily_acf(ray.data.from_pandas(pd.DataFrame({"ts": ts})),
                        max_lag=3)
        assert not math.isnan(got.loc[0, "acf"])
        assert math.isnan(got.loc[1, "acf"])
        assert math.isnan(got.loc[2, "acf"])

    def test_constant_series_is_nan(self):
        # identical counts every day → zero variance → undefined acf
        ts = np.array([0, 86_400_000_000],
                      dtype="int64").astype("datetime64[us]")
        got = daily_acf(ray.data.from_pandas(pd.DataFrame({"ts": ts})),
                        max_lag=1)
        assert math.isnan(got.loc[0, "acf"])
