"""Recrawl scheduler: exact-formula oracle, tie determinism,
partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.recrawl import recrawl_priorities

NOW = int(pd.Timestamp("2025-06-01").value // 1000)  # us


def _events(n=4000, seed=12):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 300 * 86400, n), unit="s"),
    })


def _oracle(df, top_n):
    g = df.copy()
    g["us"] = g["ts"].astype("datetime64[us]").astype("int64")
    a = g.groupby("user_id").agg(n_obs=("us", "size"), mn=("us", "min"),
                                 mx=("us", "max")).reset_index()
    age = NOW - a["mx"]
    span = np.maximum(a["mx"] - a["mn"], 1)
    a["priority"] = (age * (a["n_obs"] - 1)).astype(float) / span
    a = a.sort_values(["priority", "user_id"],
                      ascending=[False, True], kind="stable")
    return a.head(top_n)


class TestRecrawl:
    def test_matches_oracle_bitexact(self):
        df = _events()
        got = recrawl_priorities(
            ray.data.from_pandas(df).repartition(9), NOW, top_n=30)
        want = _oracle(df, 30)
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert np.array_equal(got["priority"].to_numpy(),
                              want["priority"].to_numpy())
        assert got["n_obs"].tolist() == want["n_obs"].tolist()

    def test_single_observation_zero_priority(self):
        df = pd.DataFrame({
            "user_id": np.int64([1, 2, 2]),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-01",
                                  "2024-02-01"]),
        })
        out = recrawl_priorities(ray.data.from_pandas(df), NOW, top_n=5)
        pri = dict(zip(out["user_id"], out["priority"]))
        assert pri[1] == 0.0          # n=1 → no observed change rate
        assert pri[2] > 0.0

    def test_no_int64_overflow_on_huge_age_times_nobs(self):
        # age_us ~3e15 × n_obs ~1e5 ≈ 3e20 wraps int64 (silently, in
        # numpy); the exact Python-int numerator must stay positive and
        # rank the high-observation key first
        n_obs = 120_000
        base = pd.Timestamp("1995-01-01")
        hot = pd.DataFrame({
            "user_id": np.full(n_obs, 7, dtype=np.int64),
            "ts": base + pd.to_timedelta(
                np.arange(n_obs) % 86_400, unit="s"),
        })
        cold = pd.DataFrame({
            "user_id": np.int64([1, 1]),
            "ts": pd.to_datetime(["2025-01-01", "2025-05-01"]),
        })
        df = pd.concat([hot, cold], ignore_index=True)
        out = recrawl_priorities(
            ray.data.from_pandas(df).repartition(5), NOW, top_n=5)
        assert (out["priority"] >= 0).all()
        age = NOW - int(hot["ts"].max().value // 1000)
        span = int(hot["ts"].max().value // 1000) \
            - int(hot["ts"].min().value // 1000)
        want = float(age * (n_obs - 1)) / float(span)
        got = dict(zip(out["user_id"], out["priority"]))[7]
        assert got == want
        assert out["user_id"].iloc[0] == 7

    def test_partition_invariant(self):
        df = _events(2000, seed=3)
        outs = []
        for parts in (1, 7):
            out = recrawl_priorities(
                ray.data.from_pandas(df).repartition(parts), NOW,
                top_n=20)
            outs.append(out.values.tolist())
        assert outs[0] == outs[1]
