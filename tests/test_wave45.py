"""Wave-45 conformance: Welch t one-vs-rest, Chapman capture-
recapture, Wald-Wolfowitz runs test."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestWelch:
    def test_sequential_moments(self, ray_session):
        from web2llmstxt_ray.ops.stats import welch_t_by_group

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["n_chars", "source"])
        out = welch_t_by_group(rd.from_arrow(docs).repartition(8),
                               "n_chars", "source")
        df = docs.to_pandas()
        for _, r in out.iterrows():
            a = df[df["source"] == r["group"]]["n_chars"] \
                .astype(int).to_numpy()
            b = df[df["source"] != r["group"]]["n_chars"] \
                .astype(int).to_numpy()
            assert int(r["n_g"]) == len(a)
            assert abs(r["mean_g"] - a.mean()) < 1e-9
            v1, v2 = a.var(ddof=1), b.var(ddof=1)
            t = (a.mean() - b.mean()) / math.sqrt(
                v1 / len(a) + v2 / len(b))
            assert abs(r["t_stat"] - t) < 1e-6
            assert r["df"] > min(len(a), len(b)) - 1

    def test_planted_shift(self, ray_session):
        from web2llmstxt_ray.ops.stats import welch_t_by_group

        rng = np.random.RandomState(3)
        d = pd.DataFrame({
            "n_chars": np.concatenate([
                rng.randint(100, 120, 200),
                rng.randint(200, 220, 200)]),
            "source": ["lo"] * 200 + ["hi"] * 200})
        out = welch_t_by_group(rd.from_pandas(d), "n_chars",
                               "source").set_index("group")
        assert out.loc["hi", "t_stat"] > 20
        assert out.loc["lo", "t_stat"] < -20


class TestCaptureRecapture:
    def test_chapman_formula_and_independence_case(self, ray_session):
        from web2llmstxt_ray.ops.phonetic import capture_recapture

        # synthetic truth with known sampler coverage
        truth = pd.DataFrame({
            "a": ["alpha x", "beta yy", "gamma z", "delta w"],
            "b": ["alpha xx", "beta y", "gXmma z", "pelta w"]})
        reg = rd.from_pandas(pd.DataFrame({
            "name": pd.concat([truth["a"], truth["b"]],
                              ignore_index=True)}))
        out = capture_recapture(
            reg, rd.from_pandas(truth), col="name").iloc[0]
        from web2llmstxt_ray.ops.phonetic import soundex
        fa = [int(a[:1] == b[:1] and abs(len(a) - len(b)) <= 1)
              for a, b in zip(truth["a"], truth["b"])]
        fb = [int(soundex(a) == soundex(b))
              for a, b in zip(truth["a"], truth["b"])]
        na, nb = sum(fa), sum(fb)
        m = sum(x * y for x, y in zip(fa, fb))
        assert int(out["n_a"]) == na and int(out["n_b"]) == nb
        assert out["chapman_est"] == \
            (na + 1) * (nb + 1) / (m + 1) - 1.0

    def test_sf_catalog_estimate_quality(self, ray_session):
        import __ray_entry__ as E

        out = E.queries()["capture_recapture"](SF).iloc[0]
        # both samplers have decent recall here, so Chapman should
        # land within a factor of ~2 of the planted truth
        assert 0.5 < out["est_over_truth"] < 2.0
        assert out["n_both"] <= min(out["n_a"], out["n_b"])


class TestRunsTest:
    def test_sequential_replay(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 runs_test)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = runs_test(ds).iloc[0]
        days, cents = _daily_cents_series(ds, "o_orderdate",
                                          "o_totalprice")
        n = len(days)
        order = np.lexsort((days, cents))
        med = int(cents[order[(n - 1) // 2]])
        signs = [1 if int(c) > med else 0 for c in cents
                 if int(c) != med]
        runs = 1 + sum(1 for x, y in zip(signs, signs[1:]) if x != y)
        assert int(out["n_runs"]) == runs
        assert int(out["n_above"]) == sum(signs)

    def test_planted_regimes(self, ray_session):
        from web2llmstxt_ray.ops.windows import runs_test

        days = pd.date_range("2024-01-01", periods=40)
        trend = pd.DataFrame({"o_orderdate": days,
                              "o_totalprice":
                              np.arange(1.0, 41.0)})
        z_trend = runs_test(rd.from_pandas(trend)).iloc[0]["z"]
        assert z_trend < -3           # monotone → far too few runs
        # jitter so no day ties the median exactly (ties drop)
        vals = [(10.0 if i % 2 == 0 else 90.0) + i * 0.01
                for i in range(40)]
        alt = pd.DataFrame({"o_orderdate": days,
                            "o_totalprice": vals})
        z_alt = runs_test(rd.from_pandas(alt)).iloc[0]["z"]
        assert z_alt > 3              # near-perfect alternation
