"""Wave-42 conformance: weighted interval scheduling, LIS DP, MASE
seasonal accuracy, Borda rank fusion — sequential oracles + planted
semantic checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestIntervalScheduling:
    def test_sequential_dp(self, ray_session):
        from web2llmstxt_ray.ops.events import interval_scheduling

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "event_type", "ts"])
        df = ev.to_pandas()
        out = interval_scheduling(rd.from_arrow(ev).repartition(8))
        spans = df.groupby(["user_id", "event_type"]).agg(
            s=("ts", "min"), e=("ts", "max"),
            w=("ts", "size")).reset_index()
        spans["s"] = spans["s"].astype("datetime64[us]").astype(np.int64)
        spans["e"] = spans["e"].astype("datetime64[us]").astype(np.int64)
        for _, r in out.iterrows():
            sub = spans[spans["user_id"] == r["user_id"]]
            iv = sorted(zip(sub["e"], sub["s"], sub["event_type"],
                            sub["w"]))
            n = len(iv)
            dp = [0] * (n + 1)
            for i in range(1, n + 1):
                e_i, s_i, _, w_i = iv[i - 1]
                p = 0
                for j in range(i - 1, 0, -1):
                    if iv[j - 1][0] < s_i:
                        p = j
                        break
                dp[i] = max(dp[i - 1], int(w_i) + dp[p])
            assert int(r["best_events"]) == dp[n]
            assert int(r["n_intervals"]) == n
            assert int(r["total_events"]) == int(sub["w"].sum())
            assert r["best_events"] <= r["total_events"]

    def test_planted_overlap(self, ray_session):
        from web2llmstxt_ray.ops.events import interval_scheduling

        ts0 = pd.Timestamp("2024-01-01")
        rows = []
        # type a: [0, 10] w=2 ; type b: [5, 15] w=3 (overlaps a);
        # type c: [20, 25] w=2 (compatible with either)
        for t, offs in (("a", [0, 10]), ("b", [5, 15]),
                        ("b", [7]), ("c", [20, 25])):
            for o in offs:
                rows.append((1, t, ts0 + pd.Timedelta(minutes=o)))
        ev = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
        out = interval_scheduling(rd.from_pandas(ev)).iloc[0]
        # best = b(3) + c(2) = 5, not a+c = 4, never a+b (overlap)
        assert int(out["best_events"]) == 5
        assert int(out["total_events"]) == 7


class TestLis:
    def test_dp_equals_bruteforce(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 lis_revenue)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = lis_revenue(ds)
        _, cents = _daily_cents_series(ds, "o_orderdate",
                                       "o_totalprice")
        n = len(cents)
        lis = [1] * n
        for i in range(n):
            for j in range(i):
                if cents[j] < cents[i]:
                    lis[i] = max(lis[i], lis[j] + 1)
        assert out["lis_len"].tolist() == lis
        assert out["lis_len"].max() >= 2

    def test_sorted_and_reversed(self, ray_session):
        from web2llmstxt_ray.ops.windows import lis_revenue

        days = pd.date_range("2024-01-01", periods=10)
        inc = pd.DataFrame({"o_orderdate": days,
                            "o_totalprice": np.arange(1.0, 11.0)})
        assert lis_revenue(rd.from_pandas(inc))["lis_len"].max() == 10
        dec = pd.DataFrame({"o_orderdate": days,
                            "o_totalprice": np.arange(10.0, 0.0, -1)})
        assert lis_revenue(rd.from_pandas(dec))["lis_len"].max() == 1


class TestMase:
    def test_exact_lag_errors(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 mase_weekly)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = mase_weekly(ds).iloc[0]
        days, cents = _daily_cents_series(ds, "o_orderdate",
                                          "o_totalprice")
        dmap = dict(zip(days.tolist(), cents.tolist()))
        ae1 = [abs(c - dmap[d - 1]) for d, c in dmap.items()
               if d - 1 in dmap]
        ae7 = [abs(c - dmap[d - 7]) for d, c in dmap.items()
               if d - 7 in dmap]
        assert int(out["n_naive"]) == len(ae1)
        assert int(out["n_seasonal"]) == len(ae7)
        assert out["mae_naive"] == sum(ae1) / len(ae1)
        assert out["mase"] == (sum(ae7) / len(ae7)) / (sum(ae1)
                                                       / len(ae1))

    def test_strong_weekly_signal(self, ray_session):
        from web2llmstxt_ray.ops.windows import mase_weekly

        days = pd.date_range("2024-01-01", periods=56)
        vals = [100.0 + 80.0 * (d.dayofweek in (5, 6)) for d in days]
        ev = pd.DataFrame({"o_orderdate": days, "o_totalprice": vals})
        out = mase_weekly(rd.from_pandas(ev)).iloc[0]
        assert out["mae_seasonal"] == 0.0      # perfect weekly cycle
        assert out["mase"] == 0.0


class TestBorda:
    def test_rank_fusion_sequential(self, ray_session):
        from web2llmstxt_ray.ops.relational import borda_fusion

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount",
                     "l_quantity"])
        df = li.to_pandas()
        cents = np.rint(df["l_extendedprice"] * 100).astype(np.int64)
        disc = np.rint(df["l_discount"] * 100).astype(np.int64)
        agg = pd.DataFrame({
            "k": df["l_partkey"],
            "rev": cents * (100 - disc),
            "qty": np.rint(df["l_quantity"]).astype(np.int64),
            "n": 1}).groupby("k", as_index=False).sum()

        def rk(col):
            o = agg.sort_values([col, "k"], ascending=[False, True])
            return pd.Series(range(1, len(o) + 1),
                             index=o.index).sort_index()

        agg["borda"] = rk("rev") + rk("qty") + rk("n")
        expect = agg.sort_values(["borda", "k"]).head(20)
        out = borda_fusion(rd.from_arrow(li).repartition(8), top_n=20)
        assert out["l_partkey"].tolist() == expect["k"].tolist()
        assert out["borda"].tolist() == expect["borda"].tolist()
        assert (out["borda"].to_numpy()[1:]
                >= out["borda"].to_numpy()[:-1]).all()
