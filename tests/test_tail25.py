"""Edge-case tests for the twenty-seventh-wave operators (robust
trend, exact change point, edit-distance-2 join, frequent triples,
incremental view maintenance)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from web2llmstxt_ray.ops.cdc import ivm_groupby_update
from web2llmstxt_ray.ops.dedup import _lev_le, edit_distance_self_join
from web2llmstxt_ray.ops.events import frequent_triples
from web2llmstxt_ray.ops.windows import change_point, trend_robust


def _days_df(values_by_day: dict[int, list[float]]) -> pd.DataFrame:
    rows = []
    for day, vals in values_by_day.items():
        for v in vals:
            rows.append((np.datetime64("2024-01-01")
                         + np.timedelta64(day, "D"), v))
    return pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])


class TestTrendRobust:
    def test_strictly_increasing_daily_sums(self):
        df = _days_df({d: [float(d + 1)] for d in range(10)})
        got = trend_robust(ray.data.from_pandas(df))
        assert got["n_days"].tolist() == [10]
        # every pair increases: S = n(n-1)/2 = 45, tau = 1
        assert got["s_stat"].tolist() == [45]
        assert got["tau"].tolist() == [1.0]
        # unit slope: 100 cents/day exactly (all pairwise slopes equal)
        assert got["sen_slope_cents_per_day"].tolist() == [100.0]

    def test_outlier_does_not_drag_sen_slope(self):
        # flat series with one huge spike: OLS slope would move,
        # the Theil-Sen median slope stays 0
        vals = {d: [5.0] for d in range(11)}
        vals[5] = [1e6]
        got = trend_robust(ray.data.from_pandas(_days_df(vals)))
        assert got["sen_slope_cents_per_day"].tolist() == [0.0]

    def test_matches_naive_pairwise(self):
        rng = np.random.default_rng(71)
        days = np.sort(rng.choice(np.arange(60), size=25,
                                  replace=False))
        cents = rng.integers(100, 10_000, size=25)
        df = _days_df({int(d): [int(c) / 100.0]
                       for d, c in zip(days, cents)})
        got = trend_robust(ray.data.from_pandas(df).repartition(5))
        s = 0
        slopes = []
        for i in range(25):
            for j in range(i + 1, 25):
                dy = int(cents[j]) - int(cents[i])
                s += (dy > 0) - (dy < 0)
                slopes.append(float(dy)
                              / float(int(days[j]) - int(days[i])))
        m = len(slopes)
        slopes.sort()
        assert got["s_stat"].tolist() == [s]
        assert got["tau"].tolist() == [float(s) / float(m)]
        assert got["sen_slope_cents_per_day"].tolist() == \
            [slopes[(m + 1) // 2 - 1]]

    def test_single_day_degenerate(self):
        got = trend_robust(
            ray.data.from_pandas(_days_df({3: [1.0, 2.0]})))
        assert got["n_days"].tolist() == [1]
        assert got["s_stat"].tolist() == [0]
        assert np.isnan(got["tau"].iloc[0])


class TestChangePoint:
    def test_planted_level_shift(self):
        # 10 days at 100.00, 10 days at 900.00 -> split at day 10
        vals = {d: [100.0] for d in range(10)}
        vals.update({d: [900.0] for d in range(10, 20)})
        got = change_point(ray.data.from_pandas(_days_df(vals)))
        assert got["n_left"].tolist() == [10]
        assert got["n_right"].tolist() == [10]
        assert got["mean_left_cents"].tolist() == [10_000.0]
        assert got["mean_right_cents"].tolist() == [90_000.0]
        assert got["sse_split"].tolist() == [0.0]
        # split_day is the first day of the RIGHT segment's index k
        day0 = (np.datetime64("2024-01-01", "us").astype(np.int64)
                // 86_400_000_000)
        assert got["split_day"].tolist() == [int(day0) + 10]

    def test_matches_naive_argmin(self):
        rng = np.random.default_rng(9)
        cents = rng.integers(1, 500, size=17)
        df = _days_df({d: [int(c) / 100.0]
                       for d, c in enumerate(cents)})
        got = change_point(ray.data.from_pandas(df).repartition(4))
        ys = [int(c) for c in cents]
        n = len(ys)
        best = None
        for k in range(1, n):
            left, right = ys[:k], ys[k:]
            sl, sr = sum(left), sum(right)
            ql = sum(v * v for v in left)
            qr = sum(v * v for v in right)
            cost = ((float(ql) - float(sl) * float(sl) / float(k))
                    + (float(qr) - float(sr) * float(sr)
                       / float(n - k)))
            if best is None or cost < best[0]:
                best = (cost, k)
        assert got["n_left"].tolist() == [best[1]]
        assert got["sse_split"].tolist() == [best[0]]

    def test_ties_pick_smallest_k(self):
        # constant series: every split has cost 0; k=1 wins
        df = _days_df({d: [7.0] for d in range(6)})
        got = change_point(ray.data.from_pandas(df))
        assert got["n_left"].tolist() == [1]
        assert got["sse_split"].tolist() == [0.0]


def _lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


class TestEditDistance2:
    def test_banded_dp_matches_full_dp(self):
        rng = np.random.default_rng(5)
        alpha = "abc"
        for _ in range(400):
            a = "".join(rng.choice(list(alpha),
                                   size=rng.integers(0, 8)))
            b = "".join(rng.choice(list(alpha),
                                   size=rng.integers(0, 8)))
            for k in (1, 2, 3):
                want = _lev_full(a, b)
                got = _lev_le(a, b, k)
                assert got == (want if want <= k else None), \
                    (a, b, k)

    def test_join_matches_bruteforce(self):
        names = ["apple", "appl", "aple", "apples", "banana",
                 "banaan", "bananna", "cherry", "chery", "cheryy",
                 "date", "daze", "doze", "fig", "fog", "fg"]
        df = pd.DataFrame({"p_name": names * 2})  # dup rows collapse
        got = edit_distance_self_join(
            ray.data.from_pandas(df).repartition(3), "p_name",
            num_buckets=8, max_dist=2)
        want = []
        for i, x in enumerate(names):
            for y in names[i + 1:]:
                d = _lev_full(x, y)
                if 0 < d <= 2:
                    want.append((min(x, y), max(x, y), d))
        want_df = pd.DataFrame(
            sorted(set(want)), columns=["name_a", "name_b", "dist"])
        got = got.sort_values(["name_a", "name_b"]) \
            .reset_index(drop=True)
        want_df["dist"] = want_df["dist"].astype("int64")
        pd.testing.assert_frame_equal(got, want_df)

    def test_k1_unchanged_and_k3_rejected(self):
        df = pd.DataFrame({"p_name": ["ab", "ac", "abcd"]})
        got = edit_distance_self_join(ray.data.from_pandas(df),
                                      "p_name", max_dist=1)
        assert got[["name_a", "name_b"]].values.tolist() == \
            [["ab", "ac"]]
        assert got["dist"].tolist() == [1]
        with pytest.raises(ValueError):
            edit_distance_self_join(ray.data.from_pandas(df),
                                    "p_name", max_dist=3)


def _ev(user: int, day: int, typ: str) -> tuple:
    return (user, np.datetime64("2024-03-01")
            + np.timedelta64(day, "D"), typ)


class TestFrequentTriples:
    def test_planted_triple(self):
        rows = []
        # 4 baskets; triple (a,b,c) in 3 of them; d only once
        for u in range(3):
            rows += [_ev(u, 0, "a"), _ev(u, 0, "b"), _ev(u, 0, "c"),
                     _ev(u, 0, "a")]          # dup event collapses
        rows += [_ev(9, 0, "a"), _ev(9, 0, "d")]
        df = pd.DataFrame(rows, columns=["user_id", "ts",
                                         "event_type"])
        got = frequent_triples(
            ray.data.from_pandas(df).repartition(3),
            sup_num=1, sup_den=2, num_buckets=8)
        assert got[["t1", "t2", "t3"]].values.tolist() == \
            [["a", "b", "c"]]
        assert got["n_both"].tolist() == [3]
        assert got["n_baskets"].tolist() == [4]
        assert got["support"].tolist() == [0.75]

    def test_apriori_prune_no_false_negatives(self):
        # item 'z' infrequent -> pruned; but (a,b,c) still found
        rows = []
        for u in range(10):
            rows += [_ev(u, 0, "a"), _ev(u, 0, "b"), _ev(u, 0, "c")]
        rows += [_ev(0, 1, "z")]
        df = pd.DataFrame(rows, columns=["user_id", "ts",
                                         "event_type"])
        got = frequent_triples(ray.data.from_pandas(df),
                               sup_num=1, sup_den=2)
        assert got[["t1", "t2", "t3"]].values.tolist() == \
            [["a", "b", "c"]]
        assert got["n_both"].tolist() == [10]
        assert got["n_baskets"].tolist() == [11]

    def test_support_boundary_exact(self):
        # n*den >= N*num at exactly the threshold: 1 of 4 with den=4
        rows = [_ev(0, 0, "a"), _ev(0, 0, "b"), _ev(0, 0, "c")]
        rows += [_ev(u, 0, "x") for u in range(1, 4)]
        df = pd.DataFrame(rows, columns=["user_id", "ts",
                                         "event_type"])
        got = frequent_triples(ray.data.from_pandas(df),
                               sup_num=1, sup_den=4)
        assert got["n_both"].tolist() == [1]
        got2 = frequent_triples(ray.data.from_pandas(df),
                                sup_num=1, sup_den=3)
        assert got2.empty

    def test_partition_invariant(self):
        rng = np.random.default_rng(44)
        rows = [_ev(int(rng.integers(0, 6)), int(rng.integers(0, 3)),
                    "abcde"[rng.integers(0, 5)]) for _ in range(300)]
        df = pd.DataFrame(rows, columns=["user_id", "ts",
                                         "event_type"])
        a = frequent_triples(ray.data.from_pandas(df).repartition(1),
                             sup_num=1, sup_den=10, num_buckets=4)
        b = frequent_triples(ray.data.from_pandas(df).repartition(9),
                             sup_num=1, sup_den=10, num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestIvmGroupbyUpdate:
    def _fold(self, out) -> dict[int, tuple[int, int]]:
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        return {int(r.k): (int(r.n), int(r.s))
                for r in df.itertuples()}

    def test_matches_full_recompute(self):
        base = pd.DataFrame({"k": [1, 2, 3],
                             "n": [2, 1, 3],
                             "s": [20, 7, 33]})
        chg = pd.DataFrame({
            "k":     [1,   1,   2,   4,   4],
            "value": [5,   20,  7,   100, 1],
            "op":    ["i", "d", "d", "i", "i"]})
        got = ivm_groupby_update(
            ray.data.from_pandas(base).repartition(2),
            ray.data.from_pandas(chg).repartition(3),
            key_col="k", num_buckets=4)
        # full recompute: k1: n=2+1-1=2, s=20+5-20=5; k2 leaves
        # (n=0); k3 untouched; k4 born with n=2, s=101
        assert self._fold(got) == {1: (2, 5), 3: (3, 33),
                                   4: (2, 101)}

    def test_key_leaves_view_at_zero(self):
        base = pd.DataFrame({"k": [7], "n": [1], "s": [9]})
        chg = pd.DataFrame({"k": [7], "value": [9], "op": ["d"]})
        got = ivm_groupby_update(ray.data.from_pandas(base),
                                 ray.data.from_pandas(chg),
                                 key_col="k")
        # the view empties but keeps its typed schema
        assert got.schema().names == ["k", "n", "s"]
        assert got.count() == 0

    def test_string_keys_and_empty_changelog(self):
        base = pd.DataFrame({"k": ["x", "y"], "n": [1, 2],
                             "s": [3, 4]})
        chg = pd.DataFrame({"k": pd.Series([], dtype="object"),
                            "value": pd.Series([], dtype="int64"),
                            "op": pd.Series([], dtype="object")})
        got = ivm_groupby_update(ray.data.from_pandas(base),
                                 ray.data.from_pandas(chg),
                                 key_col="k")
        df = got.to_pandas().sort_values("k").reset_index(drop=True)
        assert df["k"].tolist() == ["x", "y"]
        assert df["n"].tolist() == [1, 2]
        assert df["s"].tolist() == [3, 4]
