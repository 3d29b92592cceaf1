"""One-pass table profiler: exact stats vs pandas, HLL estimates,
partition invariance of the additive fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.profile import table_profile


def _df(n: int = 5000, seed: int = 4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "x": rng.normal(size=n),
        "k": rng.integers(0, 37, n).astype(np.int64),
        "s": rng.choice(["a", "b", "c", None], n, p=[.3, .3, .3, .1]),
        "t": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
    })
    df.loc[rng.choice(n, 100, replace=False), "x"] = np.nan
    return df


class TestTableProfile:
    def test_exact_stats(self):
        df = _df()
        out = table_profile(
            ray.data.from_pandas(df).repartition(7),
            ["x", "k", "s", "t"], approx_distinct=False
        ).set_index("column")
        assert (out["n_rows"] == len(df)).all()
        assert out.loc["x", "n_nulls"] == int(df["x"].isna().sum())
        assert out.loc["s", "n_nulls"] == int(df["s"].isna().sum())
        assert float(out.loc["k", "min_v"]) == df["k"].min()
        assert float(out.loc["k", "max_v"]) == df["k"].max()
        assert abs(float(out.loc["x", "sum_v"])
                   - df["x"].sum()) < 1e-6
        # temporal min/max as ISO strings
        assert out.loc["t", "min_v"] == df["t"].min().isoformat()
        assert out.loc["t", "max_v"] == df["t"].max().isoformat()
        # non-numeric: no min/max/sum
        assert out.loc["s", "min_v"] is None

    def test_approx_distinct_accuracy(self):
        df = _df(20_000, seed=9)
        out = table_profile(
            ray.data.from_pandas(df).repartition(5),
            ["k", "s"], approx_distinct=True).set_index("column")
        assert abs(out.loc["k", "approx_distinct"] - 37) <= 2
        assert abs(out.loc["s", "approx_distinct"] - 3) <= 1

    def test_partition_invariant_exact(self):
        df = _df(3000, seed=2)
        outs = []
        for parts in (1, 11):
            out = table_profile(
                ray.data.from_pandas(df).repartition(parts),
                ["x", "k"], approx_distinct=False)
            outs.append(out[["column", "n_rows", "n_nulls",
                             "min_v", "max_v"]].values.tolist())
        assert outs[0] == outs[1]
