"""NTILE / rolling-frame edge cases the sf-data oracle may not hit:
partitions smaller than the tile count, exact tile-size convention,
window shorter than the frame."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.windows import ntile, rolling_sum


def _events(sizes: dict[int, int]) -> pd.DataFrame:
    rows = []
    eid = 0
    for uid, n in sizes.items():
        for i in range(n):
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=eid),
                         "value": float(eid % 7) + 0.25})
            eid += 1
    return pd.DataFrame(rows)


class TestNtile:
    def test_ansi_tile_sizes(self):
        # 10 rows into 4 tiles -> sizes 3,3,2,2 (first count%n larger)
        df = _events({1: 10})
        out = ntile(ray.data.from_pandas(df), n=4).to_pandas()
        sizes = out["tile"].value_counts().sort_index().tolist()
        assert sizes == [3, 3, 2, 2]
        # order within the partition: tiles are monotone in event order
        tiles = out.sort_values("event_id")["tile"].tolist()
        assert tiles == sorted(tiles)

    def test_partition_smaller_than_n(self):
        # 2 rows, 4 tiles -> tiles 1 and 2 (q=0 branch)
        df = _events({7: 2, 8: 1})
        out = ntile(ray.data.from_pandas(df), n=4).to_pandas()
        u7 = out[out.user_id == 7].sort_values("event_id")
        assert u7["tile"].tolist() == [1, 2]
        assert out[out.user_id == 8]["tile"].tolist() == [1]

    def test_exact_division(self):
        df = _events({3: 8})
        out = ntile(ray.data.from_pandas(df), n=4).to_pandas()
        assert out["tile"].value_counts().sort_index().tolist() == [2] * 4

    def test_bucket_count_invariance(self):
        df = _events({i: 3 + i % 5 for i in range(20)})
        a = ntile(ray.data.from_pandas(df), n=3, num_buckets=2).to_pandas()
        b = ntile(ray.data.from_pandas(df), n=3, num_buckets=64).to_pandas()
        a = a.sort_values("event_id").reset_index(drop=True)
        b = b.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestRollingSum:
    def test_matches_pandas_oracle(self):
        df = _events({1: 9, 2: 3, 3: 1})
        out = rolling_sum(ray.data.from_pandas(df), window=4).to_pandas()
        out = out.sort_values("event_id").reset_index(drop=True)
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        ref = df.assign(_c=cents).groupby("user_id")["_c"].rolling(
            4, min_periods=1).sum().reset_index(drop=True)
        got = out.sort_values("event_id")["win_sum_cents"].to_numpy()
        assert (got == ref.to_numpy().astype("int64")).all()

    def test_frame_shorter_than_window(self):
        df = _events({5: 2})
        out = rolling_sum(ray.data.from_pandas(df), window=10).to_pandas()
        out = out.sort_values("event_id")
        assert out["win_n"].tolist() == [1, 2]


class TestWindowRanks:
    def test_matches_duckdb_bitexact(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.windows import window_ranks

        rng = np.random.default_rng(17)
        n = 5000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            "value": rng.integers(0, 12, n).astype(np.int64),
        })
        out = window_ranks(ray.data.from_pandas(df).repartition(9),
                           key_col="user_id", order_col="value",
                           id_col="event_id").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql("""
            SELECT event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value, event_id) AS row_no,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS dense_rnk,
                   cume_dist() OVER w AS cume_d
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY value)
            ORDER BY event_id""").df()
        for c in ("row_no", "rnk", "dense_rnk"):
            assert out[c].astype(int).tolist() == \
                want[c].astype(int).tolist(), c
        assert np.array_equal(out["cume_d"].to_numpy(),
                              want["cume_d"].to_numpy())

    def test_partition_invariant(self):
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.windows import window_ranks

        rng = np.random.default_rng(23)
        df = pd.DataFrame({
            "event_id": np.arange(2000, dtype=np.int64),
            "user_id": rng.integers(0, 25, 2000).astype(np.int64),
            "value": rng.integers(0, 6, 2000).astype(np.int64),
        })
        outs = []
        for parts in (1, 13):
            out = window_ranks(ray.data.from_pandas(df).repartition(parts),
                               key_col="user_id", order_col="value",
                               id_col="event_id").to_pandas() \
                .sort_values("event_id").reset_index(drop=True)
            outs.append(out)
        assert outs[0].equals(outs[1])


class TestResampleFfill:
    def _events(self, n=2000, seed=5):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
            "value": rng.normal(size=n).round(2),
        })

    def test_matches_pandas_oracle(self):
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.windows import resample_ffill

        df = self._events()
        start = int(pd.Timestamp("2024-01-01").value // 1000)
        end = int(pd.Timestamp("2024-01-20").value // 1000)
        day = 86_400_000_000
        out = resample_ffill(ray.data.from_pandas(df).repartition(7),
                             start, end, day).to_pandas() \
            .sort_values(["user_id", "grid_ts"]).reset_index(drop=True)
        grid = pd.to_datetime(np.arange(start, end, day), unit="us")
        rows = []
        dd = df.copy()
        dd["value_max"] = dd.groupby(["user_id", "ts"])["value"] \
            .transform("max")
        dd = dd.drop_duplicates(["user_id", "ts"])
        for u, sub in dd.groupby("user_id"):
            sub = sub.sort_values("ts")
            for t in grid:
                past = sub[sub["ts"] <= t]
                rows.append((u, t, past["value_max"].iloc[-1]
                             if len(past) else np.nan))
        want = pd.DataFrame(rows, columns=["user_id", "grid_ts",
                                           "value"]) \
            .sort_values(["user_id", "grid_ts"]).reset_index(drop=True)
        assert len(out) == len(want)
        assert out["user_id"].tolist() == want["user_id"].tolist()
        assert out["grid_ts"].tolist() == want["grid_ts"].tolist()
        np.testing.assert_allclose(out["value"].to_numpy(),
                                   want["value"].to_numpy(),
                                   rtol=0, atol=0, equal_nan=True)

    def test_null_before_first_observation(self):
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.windows import resample_ffill

        df = pd.DataFrame({
            "user_id": pd.array([1], dtype="int64"),
            "ts": pd.to_datetime(["2024-01-05"]),
            "value": [7.0],
        })
        start = int(pd.Timestamp("2024-01-01").value // 1000)
        end = int(pd.Timestamp("2024-01-08").value // 1000)
        out = resample_ffill(ray.data.from_pandas(df), start, end,
                             86_400_000_000).to_pandas() \
            .sort_values("grid_ts").reset_index(drop=True)
        assert out["value"].isna().sum() == 4      # Jan 1-4
        assert (out["value"].dropna() == 7.0).all()


class TestRollingMedianAndAboveMedian:
    def _events(self, n=3000, seed=4):
        rng = np.random.RandomState(seed)
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "value": np.round(rng.uniform(0, 50, n), 2),
        })

    def test_rolling_median_sequential_oracle(self):
        from web2llmstxt_ray.ops.windows import rolling_median

        df = self._events()
        got = rolling_median(ray.data.from_pandas(df).repartition(7),
                             window=5).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        g = df.sort_values(["user_id", "ts", "event_id"]).copy()
        g["_c"] = np.rint(g["value"] * 100).astype("int64")
        want = g.groupby("user_id")["_c"].rolling(
            5, min_periods=1).median().reset_index(level=0)
        g["med"] = want["_c"].to_numpy()
        ref = dict(zip(g["event_id"], g["med"]))
        assert all(ref[e] == m for e, m in
                   zip(got["event_id"], got["win_med_cents"]))
        assert len(got) == len(df)

    def test_above_median_strictness_and_partition_invariance(self):
        from web2llmstxt_ray.ops.windows import above_partition_median

        df = self._events(800, seed=9)
        outs = []
        for parts in (1, 6):
            out = above_partition_median(
                ray.data.from_pandas(df).repartition(parts),
                key_col="user_id", value_col="value",
                id_col="event_id").to_pandas()
            outs.append(sorted(out["event_id"].tolist()))
        assert outs[0] == outs[1]
        g = df.copy()
        g["_c"] = np.rint(g["value"] * 100).astype("int64")
        med = g.groupby("user_id")["_c"].transform("median")
        want = sorted(g.loc[g["_c"] > med, "event_id"].tolist())
        assert outs[0] == want and 0 < len(want) < len(df)


class TestRangeWindowAndDrawdown:
    def _events(self, n=2500, seed=11, users=30):
        rng = np.random.RandomState(seed)
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.Timestamp("2025-03-01")
            + pd.to_timedelta(rng.randint(0, 3 * 10**5, n), unit="s"),
            "value": np.round(rng.uniform(0, 80, n), 2),
        })

    def test_range_window_sequential_oracle_and_peers(self):
        from web2llmstxt_ray.ops.windows import range_window_sum

        df = self._events()
        # force equal-ts peers inside one user: RANGE must include all
        df.loc[1:4, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]].values
        got = range_window_sum(
            ray.data.from_pandas(df).repartition(6),
            range_seconds=3600).to_pandas() \
            .set_index("event_id").sort_index()
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
        for eid in list(df["event_id"].sample(60, random_state=0)) + [0, 1]:
            u, t = df.loc[eid, "user_id"], us[eid]
            m = ((df["user_id"] == u) & (us >= t - 3600 * 10**6)
                 & (us <= t)).to_numpy()
            assert got.loc[eid, "win_sum_cents"] == cents[m].sum()
            assert got.loc[eid, "win_n"] == m.sum()
        # peers (equal user+ts) must share identical window values
        assert got.loc[0:4, "win_sum_cents"].nunique() == 1
        assert len(got) == len(df)

    def test_peak_drawdown_sequential_oracle(self):
        from web2llmstxt_ray.ops.windows import running_peak_drawdown

        df = self._events(1200, seed=3)
        outs = []
        for parts in (1, 5):
            out = running_peak_drawdown(
                ray.data.from_pandas(df).repartition(parts)) \
                .to_pandas().sort_values("event_id") \
                .reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        g = df.sort_values(["user_id", "ts", "event_id"]).copy()
        g["_c"] = np.rint(g["value"] * 100).astype("int64")
        g["peak"] = g.groupby("user_id")["_c"].cummax()
        ref = g.set_index("event_id").sort_index()
        got = outs[0].set_index("event_id").sort_index()
        assert (got["peak_cents"] == ref["peak"]).all()
        assert (got["drawdown_cents"]
                == ref["peak"] - ref["_c"]).all()


class TestFrameFirstNth:
    @staticmethod
    def _rand_events(n, seed):
        rng = np.random.RandomState(seed)
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 30, n).astype(np.int64),
            # coarse ts -> plenty of equal-(user, ts) peers to prove
            # the (ts, id) tie order matters and is honored
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 50, n), unit="m"),
            "value": np.round(rng.uniform(0.5, 90, n), 2),
        })

    def test_sequential_oracle_and_partition_invariance(self):
        from web2llmstxt_ray.ops.windows import frame_first_nth

        df = self._rand_events(1500, seed=5)
        outs = []
        for parts in (1, 6):
            out = frame_first_nth(
                ray.data.from_pandas(df).repartition(parts),
                window=5).to_pandas().sort_values("event_id") \
                .reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = outs[0].set_index("event_id")
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="stable")
        cents = np.rint(g["value"].to_numpy() * 100).astype("int64")
        i = g.groupby("user_id", sort=False).cumcount().to_numpy()
        pos = np.arange(len(g))
        fs = pos - np.minimum(i, 4)
        for row in range(len(g)):
            eid = int(g["event_id"].iloc[row])
            assert got.loc[eid, "first_cents"] == cents[fs[row]]
            if row - fs[row] >= 1:
                assert got.loc[eid, "nth2_cents"] == cents[fs[row] + 1]
            else:
                assert np.isnan(got.loc[eid, "nth2_cents"])

    def test_frame_narrower_than_window_start(self):
        from web2llmstxt_ray.ops.windows import frame_first_nth

        # one user, 3 rows, window 10: frame always starts at row 0
        df = pd.DataFrame({
            "event_id": [0, 1, 2],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                                  "2024-01-03"]),
            "value": [1.0, 2.0, 3.0],
        })
        out = frame_first_nth(ray.data.from_pandas(df), window=10) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert out["first_cents"].tolist() == [100, 100, 100]
        assert np.isnan(out["nth2_cents"].iloc[0])
        assert out["nth2_cents"].iloc[1] == 200
        assert out["nth2_cents"].iloc[2] == 200
