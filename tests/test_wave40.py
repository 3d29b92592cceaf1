"""Wave-40 conformance: Kadane max-run, v-optimal histogram DP,
subsequence chain mass, Hilbert layout — sequential oracles plus the
structural properties (DP optimality vs heuristics, Hilbert unit-step
locality) each operator exists for."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestMaxRevenueRun:
    def test_kadane_bruteforce(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 max_revenue_run)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = max_revenue_run(ds).iloc[0]
        days, cents = _daily_cents_series(ds, "o_orderdate",
                                          "o_totalprice")
        n = len(days)
        total = int(cents.sum())
        d = [int(c) * n - total for c in cents]
        best = None
        for a in range(n):
            run = 0
            for b in range(a, n):
                run += d[b]
                cand = (-run, b, a)
                if best is None or cand < best:
                    best = cand
        score, end, start = -best[0], best[1], best[2]
        assert int(out["run_sum_scaled"]) == score
        assert int(out["start_day"]) == int(days[start])
        assert int(out["end_day"]) == int(days[end])
        assert int(out["run_days"]) == end - start + 1
        assert score > 0

    def test_planted_run(self, ray_session):
        from web2llmstxt_ray.ops.windows import max_revenue_run

        days = pd.date_range("2024-01-01", periods=30)
        vals = [100.0] * 30
        for i in range(12, 17):
            vals[i] = 900.0                     # the hot stretch
        ev = pd.DataFrame({"o_orderdate": days, "o_totalprice": vals})
        out = max_revenue_run(rd.from_pandas(ev)).iloc[0]
        base = int(pd.Timestamp("2024-01-01").value // 10 ** 9 // 86400)
        assert int(out["start_day"]) == base + 12
        assert int(out["end_day"]) == base + 16
        assert int(out["run_days"]) == 5


class TestVOptimal:
    def test_dp_beats_heuristics_and_bruteforce_small(self,
                                                      ray_session):
        from web2llmstxt_ray.ops.windows import voptimal_histogram

        # small planted series: exhaustive check over all 3-splits
        days = pd.date_range("2024-01-01", periods=12)
        counts = [5, 5, 5, 20, 20, 20, 20, 3, 3, 3, 3, 3]
        rows = []
        for d, c in zip(days, counts):
            rows += [{"o_orderdate": d, "o_orderkey": len(rows) + i}
                     for i in range(c)]
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = voptimal_histogram(ds, n_buckets=3)
        v = np.array(counts, dtype=np.int64)

        def sse(seg):
            s = v[list(seg)]
            return float((s * s).sum()) - float(s.sum()) ** 2 / len(s)

        best = None
        for c1, c2 in itertools.combinations(range(1, 12), 2):
            segs = [range(0, c1), range(c1, c2), range(c2, 12)]
            tot = sum(sse(s) for s in segs)
            if best is None or tot < best[0] - 1e-9:
                best = (tot, (c1, c2))
        assert abs(out["sse"].sum() - best[0]) < 1e-6
        # the planted level changes are the optimal cuts
        assert out["n_days"].tolist() == [3, 4, 5]

    def test_sf_data_dp_invariants(self, ray_session):
        from web2llmstxt_ray.ops.windows import voptimal_histogram

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_orderkey"])
        out = voptimal_histogram(rd.from_arrow(orders).repartition(4),
                                 n_buckets=6)
        assert len(out) == 6
        # buckets tile the calendar in order
        assert (out["start_day"].to_numpy()[1:]
                > out["end_day"].to_numpy()[:-1]).all()
        assert (out["sse"] >= -1e-9).all()


class TestSubsequenceCounts:
    def test_sequential_dp(self, ray_session):
        from web2llmstxt_ray.ops.events import subsequence_counts

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"])
        df = ev.to_pandas().sort_values(["user_id", "ts", "event_id"])
        expect = {}
        for uid, g in df.groupby("user_id"):
            c1 = c2 = c3 = 0
            for et in g["event_type"]:
                if et == "view":
                    c1 += 1
                elif et == "click":
                    c2 += c1
                elif et == "purchase":
                    c3 += c2
            expect[int(uid)] = (c1, c2, c3)
        out = subsequence_counts(rd.from_arrow(ev).repartition(8))
        assert len(out) == len(expect)
        for _, r in out.iterrows():
            assert (int(r["n_first"]), int(r["n_pairs"]),
                    int(r["n_chains"])) == expect[int(r["user_id"])]
        assert out["n_chains"].sum() > 0

    def test_chain_mass_vs_funnel(self, ray_session):
        from web2llmstxt_ray.ops.events import subsequence_counts

        ts0 = pd.Timestamp("2024-01-01")
        rows = [(i, 1, t, ts0 + pd.Timedelta(minutes=i))
                for i, t in enumerate(
                    ["view", "view", "click", "purchase"])]
        ev = pd.DataFrame(rows, columns=["event_id", "user_id",
                                         "event_type", "ts"])
        out = subsequence_counts(rd.from_pandas(ev)).iloc[0]
        # 2 views × 1 click × 1 purchase = 2 distinct chains
        assert (int(out["n_first"]), int(out["n_pairs"]),
                int(out["n_chains"])) == (2, 2, 2)


class TestHilbert:
    def test_curve_properties_all_orders(self):
        from web2llmstxt_ray.ops.layout import hilbert_d_vec

        for order in (2, 3, 4):
            n = 1 << order
            xs, ys = np.meshgrid(np.arange(n), np.arange(n))
            d = hilbert_d_vec(xs.ravel(), ys.ravel(), order=order)
            assert sorted(d.tolist()) == list(range(n * n))
            pos = {int(dd): (int(x), int(y))
                   for dd, x, y in zip(d, xs.ravel(), ys.ravel())}
            for i in range(n * n - 1):
                (x1, y1), (x2, y2) = pos[i], pos[i + 1]
                assert abs(x1 - x2) + abs(y1 - y2) == 1

    def test_locality_beats_zorder(self, ray_session):
        """The reason to offer Hilbert next to Morton: consecutive
        curve positions are always grid-adjacent (step 1), while the
        Z curve takes long diagonal jumps — compare mean step."""
        from web2llmstxt_ray.ops.layout import (hilbert_d_vec,
                                                zorder_values)

        n = 32
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        x, y = xs.ravel(), ys.ravel()
        hd = hilbert_d_vec(x, y, 5)
        order_h = np.argsort(hd)
        steps_h = (np.abs(np.diff(x[order_h]))
                   + np.abs(np.diff(y[order_h])))
        zd = zorder_values(x.astype(np.float64), y.astype(np.float64),
                           (0.0, float(n - 1)), (0.0, float(n - 1)),
                           bits=5)
        order_z = np.argsort(zd)
        steps_z = (np.abs(np.diff(x[order_z]))
                   + np.abs(np.diff(y[order_z])))
        assert steps_h.mean() == 1.0
        assert steps_z.mean() > steps_h.mean()

    def test_query_shape(self, ray_session):
        from web2llmstxt_ray.ops.layout import hilbert_order

        part = pq.read_table(
            f"{SF}/part.parquet",
            columns=["p_partkey", "p_retailprice", "p_size"])
        out = hilbert_order(rd.from_arrow(part).repartition(4),
                            "p_partkey", "p_retailprice", "p_size")
        assert len(out) == part.num_rows
        assert (out["hilbert_d"] >= 0).all()
        assert out["hilbert_d"].nunique() > 1
