"""Planted-data oracles for the co-moment statistics tier and the
interpolated-quantile histogram path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.corpus import int_quantiles_cont
from web2llmstxt_ray.ops.stats import grouped_corr_slope


def _planted() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    g = np.repeat(["a", "b", "c"], 400)
    x = rng.integers(0, 1000, len(g))
    # per-group known linear structure + noise
    slope = np.select([g == "a", g == "b"], [3, -2], default=0)
    y = slope * x + rng.integers(-50, 50, len(g))
    return pd.DataFrame({"g": g, "x": x, "y": y})


class TestGroupedCorrSlope:
    def test_matches_numpy_oracle(self):
        df = _planted()
        out = grouped_corr_slope(
            ray.data.from_pandas(df).repartition(7), ["g"], "x", "y")
        for _, r in out.iterrows():
            sub = df[df["g"] == r["g"]]
            want_corr = np.corrcoef(sub["x"], sub["y"])[0, 1]
            want_slope = np.polyfit(sub["x"], sub["y"], 1)[0]
            assert abs(r["corr_xy"] - want_corr) < 1e-6, r["g"]
            assert abs(r["slope_xy"] - want_slope) < 1e-6, r["g"]
            assert r["n"] == len(sub)

    def test_partition_invariant(self):
        df = _planted()
        a = grouped_corr_slope(
            ray.data.from_pandas(df).repartition(2), ["g"], "x", "y")
        b = grouped_corr_slope(
            ray.data.from_pandas(df).repartition(19), ["g"], "x", "y")
        pd.testing.assert_frame_equal(a, b)

    def test_overflow_beyond_int64_partials(self):
        # values whose squared-sum total exceeds int64 across blocks:
        # per-block partials fit, the driver combine must not wrap
        n = 4000
        df = pd.DataFrame({"g": ["z"] * n,
                           "x": np.full(n, 2_000_000, dtype=np.int64),
                           "y": np.arange(n, dtype=np.int64)})
        # Σx² = 4e12 · 4000 = 1.6e16 per full set; push higher via x=3e6
        df["x"] = 3_000_000 + (np.arange(n) % 7)
        out = grouped_corr_slope(
            ray.data.from_pandas(df).repartition(11), ["g"], "x", "y")
        sub = df
        want_corr = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(out["corr_xy"].iloc[0] - want_corr) < 1e-6


class TestIntQuantilesCont:
    def test_matches_numpy_linear(self):
        rng = np.random.default_rng(3)
        df = pd.DataFrame({"g": np.repeat(["u", "v"], 500),
                           "x": rng.integers(0, 200, 1000)})
        qs = (0.1, 0.5, 0.9)
        out = int_quantiles_cont(
            ray.data.from_pandas(df).repartition(9), "x", qs=qs,
            group_col="g")
        for grp in ("u", "v"):
            vals = df[df["g"] == grp]["x"].to_numpy()
            for q in qs:
                got = out[(out["g"] == grp) & (out["q"] == q)][
                    "value"].iloc[0]
                want = np.quantile(vals, q)  # numpy default = linear
                assert abs(got - want) < 1e-6, (grp, q)

    def test_ungrouped_and_exact_positions(self):
        # n=5, values 10..50: q=0.25 → pos 1.0 exactly → value 20
        df = pd.DataFrame({"x": [10, 20, 30, 40, 50]})
        out = int_quantiles_cont(ray.data.from_pandas(df), "x",
                                 qs=(0.25, 0.375, 1.0))
        assert out[out["q"] == 0.25]["value"].iloc[0] == 20.0
        # pos = 0.375*4 = 1.5 → 20 + 0.5*(30-20) = 25
        assert out[out["q"] == 0.375]["value"].iloc[0] == 25.0
        assert out[out["q"] == 1.0]["value"].iloc[0] == 50.0


class TestGroupedDistinctCount:
    def test_matches_pandas_nunique(self):
        from web2llmstxt_ray.ops.stats import grouped_distinct_count
        rng = np.random.default_rng(9)
        df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 3000),
                           "v": rng.integers(0, 150, 3000)})
        out = grouped_distinct_count(
            ray.data.from_pandas(df).repartition(13), "g", "v",
            num_buckets=8)
        want = df.groupby("g")["v"].nunique()
        for _, r in out.iterrows():
            assert r["n_distinct"] == want[r["g"]]

    def test_string_values(self):
        from web2llmstxt_ray.ops.stats import grouped_distinct_count
        df = pd.DataFrame({"g": ["x", "x", "x", "y"],
                           "v": ["aa", "aa", "bb", "aa"]})
        out = grouped_distinct_count(ray.data.from_pandas(df), "g", "v")
        got = dict(zip(out["g"], out["n_distinct"]))
        assert got == {"x": 2, "y": 1}


class TestGroupedZscore:
    def test_matches_scipy_formula(self):
        from web2llmstxt_ray.ops.stats import grouped_zscore
        rng = np.random.default_rng(21)
        df = pd.DataFrame({"g": rng.choice(["a", "b"], 800),
                           "x": rng.integers(-500, 500, 800)})
        out = grouped_zscore(
            ray.data.from_pandas(df).repartition(7), ["g"], "x") \
            .to_pandas()
        for grp in ("a", "b"):
            sub = out[out["g"] == grp]
            vals = sub["x"].to_numpy().astype(float)
            want = (vals - vals.mean()) / vals.std(ddof=1)
            np.testing.assert_allclose(sub["z"].to_numpy(), want,
                                       atol=1e-6)


class TestSkewKurtMI:
    def test_skew_kurt_vs_scipy_population(self):
        from web2llmstxt_ray.ops.stats import grouped_skew_kurt
        rng = np.random.default_rng(4)
        df = pd.DataFrame({"g": np.repeat(["a", "b"], 600),
                           "x": np.concatenate([
                               rng.integers(0, 40, 600),
                               (rng.integers(0, 7, 600) ** 2)])})
        out = grouped_skew_kurt(
            ray.data.from_pandas(df).repartition(5), "g", "x")
        for _, r in out.iterrows():
            v = df[df["g"] == r["g"]]["x"].to_numpy().astype(float)
            m = v.mean()
            m2 = ((v - m) ** 2).mean()
            m3 = ((v - m) ** 3).mean()
            m4 = ((v - m) ** 4).mean()
            assert abs(r["skew_pop"] - m3 / m2 ** 1.5) < 1e-6
            assert abs(r["kurt_excess"] - (m4 / m2 ** 2 - 3)) < 1e-6

    def test_mutual_information_independent_and_dependent(self):
        from web2llmstxt_ray.ops.stats import mutual_information
        rng = np.random.default_rng(8)
        a = rng.choice(["p", "q"], 4000)
        indep = pd.DataFrame({"a": a, "b": rng.choice(["u", "v"], 4000)})
        dep = pd.DataFrame({"a": a, "b": np.where(a == "p", "u", "v")})
        mi_i = mutual_information(
            ray.data.from_pandas(indep).repartition(6), "a", "b")
        mi_d = mutual_information(
            ray.data.from_pandas(dep).repartition(6), "a", "b")
        assert mi_i["mi_nats"].iloc[0] < 0.01
        # fully dependent binary ≈ H(A) ≈ ln 2
        assert abs(mi_d["mi_nats"].iloc[0] - np.log(2)) < 0.01


class TestEwma:
    def test_matches_sequential_pandas(self):
        from web2llmstxt_ray.ops.windows import ewma
        rng = np.random.default_rng(14)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 60, n),
            "ts": pd.Timestamp("2024-01-01")
                  + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "value": rng.normal(0, 10, n),
        })
        out = ewma(ray.data.from_pandas(df).repartition(9),
                   alpha=0.3).to_pandas().sort_values(
            "event_id").reset_index(drop=True)
        # sequential oracle: per user in (ts, event_id) order
        want = df.sort_values(["user_id", "ts", "event_id"]).copy()
        want["ewma"] = (want.groupby("user_id")["value"]
                        .transform(lambda s: s.ewm(alpha=0.3,
                                                   adjust=False).mean())
                        .round(6))
        want = want.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(out["ewma"], want["ewma"])
        assert (out["event_id"].to_numpy()
                == want["event_id"].to_numpy()).all()

    def test_partition_invariant(self):
        from web2llmstxt_ray.ops.windows import ewma
        rng = np.random.default_rng(15)
        df = pd.DataFrame({
            "event_id": np.arange(500),
            "user_id": rng.integers(0, 9, 500),
            "ts": pd.Timestamp("2024-01-01")
                  + pd.to_timedelta(np.arange(500), unit="s"),
            "value": rng.normal(0, 1, 500),
        })
        a = ewma(ray.data.from_pandas(df).repartition(2)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        b = ewma(ray.data.from_pandas(df).repartition(17)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestGroupedMadEntropy:
    def test_mad_sequential_oracle_and_partition_invariance(self):
        from web2llmstxt_ray.ops.stats import grouped_mad

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "user_id": rng.randint(0, 30, 2000).astype(np.int64),
            "value": np.round(rng.uniform(0, 90, 2000), 2),
        })
        outs = []
        for parts in (1, 6):
            out = grouped_mad(ray.data.from_pandas(df)
                              .repartition(parts),
                              "user_id", "value").to_pandas() \
                .sort_values("user_id").reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        g = df.copy()
        g["_c"] = np.rint(g["value"] * 100).astype("int64")
        med = g.groupby("user_id")["_c"].transform("median")
        g["_dev"] = (g["_c"] - med).abs()
        ref = g.groupby("user_id", as_index=False).agg(
            med_cents=("_c", "median"), mad_cents=("_dev", "median"))
        got = outs[0]
        assert (got["med_cents"].to_numpy()
                == ref["med_cents"].to_numpy()).all()
        assert (got["mad_cents"].to_numpy()
                == ref["mad_cents"].to_numpy()).all()
        # exactness contract: every MAD lands on a .25 multiple
        assert (np.mod(got["mad_cents"].to_numpy() * 4, 1) == 0).all()

    def test_entropy_exact_counts_and_bounds(self):
        from web2llmstxt_ray.ops.stats import grouped_entropy

        rng = np.random.RandomState(9)
        df = pd.DataFrame({
            "user_id": rng.randint(0, 20, 3000).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], 3000,
                                     p=[0.5, 0.3, 0.15, 0.05]),
        })
        # one single-type user: entropy must be exactly 0
        df.loc[df["user_id"] == 0, "event_type"] = "a"
        out = grouped_entropy(ray.data.from_pandas(df).repartition(5),
                              "user_id", "event_type")
        assert len(out) == df["user_id"].nunique()
        z = out.loc[out["user_id"] == 0].iloc[0]
        assert z["entropy"] == 0.0 and z["n_types"] == 1
        # sequential oracle
        cnt = df.groupby(["user_id", "event_type"]).size()
        for uid, grp in cnt.groupby(level=0):
            p = grp.to_numpy() / grp.sum()
            want = float(-(p * np.log(p)).sum())
            got = float(out.loc[out["user_id"] == uid, "entropy"]
                        .iloc[0])
            assert abs(got - want) < 1e-12
        # bound: entropy <= ln(n_types)
        assert (out["entropy"].to_numpy()
                <= np.log(out["n_types"].to_numpy()) + 1e-12).all()


class TestWeightedMedianHistHH:
    def test_weighted_median_sequential_oracle(self):
        from web2llmstxt_ray.ops.stats import grouped_weighted_median

        rng = np.random.RandomState(3)
        df = pd.DataFrame({
            "k": rng.randint(0, 25, 1500).astype(np.int64),
            "v": np.round(rng.uniform(1, 50, 1500), 2),
            "w": rng.randint(1, 10, 1500).astype(np.int64),
        })
        outs = []
        for parts in (1, 6):
            out = grouped_weighted_median(
                ray.data.from_pandas(df).repartition(parts),
                "k", "v", "w").to_pandas() \
                .sort_values("k").reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        g = df.copy()
        g["_c"] = np.rint(g["v"] * 100).astype("int64")
        for _, row in outs[0].iterrows():
            sub = (g.loc[g["k"] == row["k"]]
                   .groupby("_c", as_index=False)["w"].sum()
                   .sort_values("_c"))
            cw = sub["w"].cumsum()
            tw = sub["w"].sum()
            want = int(sub.loc[(2 * cw >= tw).to_numpy(), "_c"]
                       .iloc[0])
            assert row["wmedian_cents"] == want
            assert row["total_weight"] == tw
        # half-weight property: >= half the weight sits at or below
        # the weighted median, and the answer is row-order invariant
        shuf = df.sample(frac=1, random_state=1).reset_index(drop=True)
        out2 = grouped_weighted_median(
            ray.data.from_pandas(shuf).repartition(4),
            "k", "v", "w").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(outs[0], out2)

    def test_histogram_counts_and_edges(self):
        from web2llmstxt_ray.ops.stats import equi_width_histogram

        rng = np.random.RandomState(8)
        vals = np.round(rng.uniform(10, 500, 4000), 2)
        df = pd.DataFrame({"v": vals})
        out = equi_width_histogram(
            ray.data.from_pandas(df).repartition(7), "v", nbins=16)
        assert out["n"].sum() == len(df)
        assert out["bin"].between(0, 15).all()
        c = np.rint(vals * 100).astype("int64")
        lo, hi = int(c.min()), int(c.max())
        span = hi - lo + 1
        bins = np.minimum(15, (c - lo) * 16 // span)
        want = pd.Series(bins).value_counts().sort_index()
        got = out.set_index("bin")["n"]
        assert (got.to_numpy() == want.to_numpy()).all()
        # min and max rows land in the first and last bin
        assert got.index.min() == 0 and got.index.max() == 15

    def test_heavy_hitters_exact_topk_and_ties(self):
        from web2llmstxt_ray.ops.stats import grouped_heavy_hitters

        rng = np.random.RandomState(2)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 5000),
            "v": rng.zipf(1.6, 5000).astype(np.int64) % 40,
        })
        outs = []
        for parts in (1, 8):
            out = grouped_heavy_hitters(
                ray.data.from_pandas(df).repartition(parts),
                "g", "v", k=4).to_pandas() \
                .sort_values(["g", "rnk"]).reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        cnt = df.groupby(["g", "v"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        for grp, sub in cnt.groupby("g"):
            want = sub.sort_values(["cnt", "v"],
                                   ascending=[False, True]).head(4)
            got = outs[0].loc[outs[0]["g"] == grp]
            assert got["v"].tolist() == want["v"].tolist()
            assert got["cnt"].tolist() == want["cnt"].tolist()
            assert got["rnk"].tolist() == [1, 2, 3, 4]


class TestRegressionKsTrimmed:
    def test_regression_vs_numpy_and_split_sum(self):
        from web2llmstxt_ray.ops.stats import grouped_regression

        rng = np.random.RandomState(4)
        n = 2000
        df = pd.DataFrame({
            "k": rng.randint(0, 8, n).astype(np.int64),
            "x": rng.randint(1, 51, n).astype(np.int64),
        })
        # wide-magnitude y (price-cents scale) exercises the split sum
        df["y"] = (df["x"] * 200_000
                   + rng.randint(-5_000_000, 5_000_000, n)) \
            .astype(np.int64)
        outs = []
        for parts in (1, 6):
            out = grouped_regression(
                ray.data.from_pandas(df).repartition(parts),
                ["k"], "x", "y")
            outs.append(out.reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        for _, row in outs[0].iterrows():
            sub = df.loc[df["k"] == row["k"]]
            slope, icept = np.polyfit(sub["x"], sub["y"], 1)
            assert abs(row["slope"] - slope) < 1e-4 * abs(slope)
            assert abs(row["intercept"] - icept) < 1e-3 * max(
                1.0, abs(icept))
            r = np.corrcoef(sub["x"], sub["y"])[0, 1]
            assert abs(row["r2"] - r * r) < 1e-6

    def test_ks_matches_scipy_style_brute_force(self):
        from web2llmstxt_ray.ops.stats import two_sample_ks

        rng = np.random.RandomState(9)
        df = pd.DataFrame({
            "label": rng.choice(["a", "b", "c"], 3000),
            "v": np.round(np.where(
                rng.rand(3000) < 0.5,
                rng.uniform(0, 50, 3000),
                rng.uniform(20, 90, 3000)), 2),
        })
        outs = []
        for parts in (1, 5):
            out = two_sample_ks(
                ray.data.from_pandas(df).repartition(parts),
                "v", "label", "a", "b")
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        row = outs[0].iloc[0]
        a = np.sort(np.rint(
            df.loc[df["label"] == "a", "v"].to_numpy() * 100))
        b = np.sort(np.rint(
            df.loc[df["label"] == "b", "v"].to_numpy() * 100))
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        d = np.abs(fa - fb).max()
        assert abs(row["ks_d"] - d) < 1e-12
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        # exact rational identity
        assert row["ks_num"] == round(
            row["ks_d"] * row["n_a"] * row["n_b"])

    def test_trimmed_mean_sequential_oracle(self):
        from web2llmstxt_ray.ops.stats import grouped_trimmed_mean

        rng = np.random.RandomState(6)
        df = pd.DataFrame({
            "k": rng.randint(0, 12, 900).astype(np.int64),
            # duplicate-heavy values → tie-handling must not matter
            "v": np.round(rng.randint(0, 40, 900) / 4.0, 2),
        })
        outs = []
        for parts in (1, 6):
            out = grouped_trimmed_mean(
                ray.data.from_pandas(df).repartition(parts),
                "k", "v", trim_pct=10).to_pandas() \
                .sort_values("k").reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        for _, row in outs[0].iterrows():
            c = np.sort(np.rint(
                df.loc[df["k"] == row["k"], "v"].to_numpy() * 100)
                .astype("int64"))
            k = len(c) * 10 // 100
            kept = c[k:len(c) - k]
            assert row["trim_sum_i"] == kept.sum()
            assert row["trim_n"] == len(kept)
            assert row["trim_mean"] == kept.sum() / len(kept)

    def test_trimmed_mean_degenerate_groups_vanish(self):
        from web2llmstxt_ray.ops.stats import grouped_trimmed_mean

        # trim 50%: a 2-row group keeps 0 rows (k=1, 2k>=n) and
        # VANISHES; a 5-row group keeps exactly its middle row (k=2)
        df = pd.DataFrame({"k": [1, 1, 2, 2, 2, 2, 2],
                           "v": [1.0, 2.0, 1.0, 2.0, 3.0, 4.0, 5.0]})
        out = grouped_trimmed_mean(
            ray.data.from_pandas(df), "k", "v",
            trim_pct=50).to_pandas()
        assert out["k"].tolist() == [2]
        assert out["trim_n"].tolist() == [1]
        assert out["trim_sum_i"].tolist() == [300]
        assert out["trim_mean"].tolist() == [300.0]


class TestCorrelationMatrix:
    def test_vs_numpy_and_partition_invariant(self):
        from web2llmstxt_ray.ops.stats import correlation_matrix

        rng = np.random.RandomState(5)
        n = 5000
        a = rng.randint(1, 51, n).astype("int64")
        b = (a * 300 + rng.randint(-2000, 2000, n)).astype("int64")
        c = rng.randint(0, 11, n).astype("int64")
        df = pd.DataFrame({"a": a, "b": b, "c": c})
        outs = []
        for parts in (1, 13):
            ds = ray.data.from_pandas(df).repartition(parts)
            outs.append(correlation_matrix(ds, ["a", "b", "c"],
                                           ndigits=12))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        want = np.corrcoef(np.stack([a, b, c]))
        got = {(r["col_x"], r["col_y"]): r["corr"]
               for _, r in outs[0].iterrows()}
        assert abs(got[("a", "b")] - want[0, 1]) < 1e-9
        assert abs(got[("a", "c")] - want[0, 2]) < 1e-9
        assert abs(got[("b", "c")] - want[1, 2]) < 1e-9

    def test_constant_column_nan(self):
        from web2llmstxt_ray.ops.stats import correlation_matrix

        df = pd.DataFrame({"x": [1, 2, 3, 4], "y": [7, 7, 7, 7]})
        out = correlation_matrix(ray.data.from_pandas(df), ["x", "y"])
        assert np.isnan(out["corr"].iloc[0])

    def test_split_sum_wide_magnitudes(self):
        """price-cents-scale values whose squared block sums would
        overflow a plain int64 partial at large blocks: the hi/lo
        split keeps the moments exact."""
        from web2llmstxt_ray.ops.stats import correlation_matrix

        rng = np.random.RandomState(9)
        n = 200_000
        x = rng.randint(9_000_000, 10_000_000, n).astype("int64")
        y = x + rng.randint(-500_000, 500_000, n)
        df = pd.DataFrame({"x": x, "y": y})
        out = correlation_matrix(
            ray.data.from_pandas(df).repartition(2), ["x", "y"])
        want = np.corrcoef(x, y)[0, 1]
        assert abs(out["corr"].iloc[0] - want) < 1e-6


class TestSpearmanChi2:
    def test_spearman_vs_pandas(self):
        from web2llmstxt_ray.ops.stats import spearman_corr

        rng = np.random.RandomState(4)
        n = 4000
        x = rng.randint(1, 30, n).astype("int64")      # heavy ties
        y = (x + rng.randint(-8, 9, n)).astype("int64")
        df = pd.DataFrame({"x": x, "y": y})
        outs = []
        for parts in (1, 9):
            ds = ray.data.from_pandas(df).repartition(parts)
            outs.append(spearman_corr(ds, "x", "y"))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # scipy-free oracle: Pearson over average-tie ranks
        want = np.corrcoef(df["x"].rank(method="average"),
                           df["y"].rank(method="average"))[0, 1]
        assert outs[0]["n"].iloc[0] == n
        assert abs(outs[0]["spearman"].iloc[0] - want) < 1e-12

    def test_spearman_perfect_monotone(self):
        from web2llmstxt_ray.ops.stats import spearman_corr

        df = pd.DataFrame({"x": np.arange(100, dtype="int64"),
                           "y": (np.arange(100, dtype="int64") ** 2)})
        out = spearman_corr(ray.data.from_pandas(df), "x", "y")
        assert out["spearman"].iloc[0] == 1.0

    def test_chi2_vs_hand_formula(self):
        from web2llmstxt_ray.ops.stats import chi2_independence

        rng = np.random.RandomState(6)
        n = 5000
        a = rng.choice(list("ABC"), n)
        # dependence: B skews toward category 'y'
        b = np.where((a == "B") & (rng.rand(n) < 0.6), "y",
                     rng.choice(list("xyz"), n))
        df = pd.DataFrame({"a": a, "b": b})
        out = chi2_independence(
            ray.data.from_pandas(df).repartition(7), "a", "b")
        # hand contingency chi2
        ct = pd.crosstab(df["a"], df["b"])
        exp = np.outer(ct.sum(1), ct.sum(0)) / n
        want = float(((ct.to_numpy() - exp) ** 2 / exp).sum())
        assert abs(out["chi2"].iloc[0] - want) < 1e-8 * max(1, want)
        assert out["dof"].iloc[0] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        k = min(ct.shape) - 1
        assert abs(out["cramers_v"].iloc[0]
                   - np.sqrt(want / (n * k))) < 1e-12

    def test_chi2_independent_near_zero_v(self):
        from web2llmstxt_ray.ops.stats import chi2_independence

        rng = np.random.RandomState(8)
        n = 20000
        df = pd.DataFrame({"a": rng.choice(list("AB"), n),
                           "b": rng.choice(list("xy"), n)})
        out = chi2_independence(ray.data.from_pandas(df), "a", "b")
        assert out["cramers_v"].iloc[0] < 0.03


class TestKendallPsiJsd:
    def test_kendall_vs_bruteforce(self):
        from web2llmstxt_ray.ops.stats import kendall_tau_b

        rng = np.random.RandomState(12)
        n = 500
        x = rng.randint(0, 12, n).astype("int64")
        y = (x + rng.randint(-4, 5, n)).astype("int64")
        df = pd.DataFrame({"x": x, "y": y})
        outs = []
        for parts in (1, 8):
            outs.append(kendall_tau_b(
                ray.data.from_pandas(df).repartition(parts), "x", "y"))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # brute force over all pairs
        C = D = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx, dy = x[i] - x[j], y[i] - y[j]
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif (dx > 0) == (dy > 0):
                    C += 1
                else:
                    D += 1
        n0 = n * (n - 1) // 2
        want = (C - D) / np.sqrt(float(n0 - tx) * float(n0 - ty))
        assert abs(outs[0]["tau_b"].iloc[0] - want) < 1e-12
        assert outs[0]["n"].iloc[0] == n

    def test_kendall_perfect_and_reversed(self):
        from web2llmstxt_ray.ops.stats import kendall_tau_b

        df = pd.DataFrame({"x": np.arange(50, dtype="int64"),
                           "y": np.arange(50, dtype="int64")})
        assert kendall_tau_b(ray.data.from_pandas(df), "x",
                             "y")["tau_b"].iloc[0] == 1.0
        df["y"] = -df["y"]
        assert kendall_tau_b(ray.data.from_pandas(df), "x",
                             "y")["tau_b"].iloc[0] == -1.0

    def test_psi_zero_on_identical_and_positive_on_shift(self):
        from web2llmstxt_ray.ops.stats import psi_drift

        rng = np.random.RandomState(5)
        base = rng.randint(0, 1000, 8000).astype("int64")
        same = pd.DataFrame({"v": np.concatenate([base, base]),
                             "f": np.repeat([0, 1], len(base))})
        out = psi_drift(ray.data.from_pandas(same).repartition(5),
                        "v", "f")
        assert abs(out["psi"].iloc[0]) < 1e-12  # identical bins
        shifted = pd.DataFrame({
            "v": np.concatenate([base, base + 400]),
            "f": np.repeat([0, 1], len(base))})
        out2 = psi_drift(ray.data.from_pandas(shifted).repartition(5),
                         "v", "f")
        assert out2["psi"].iloc[0] > 0.25  # industry "major shift" bar

    def test_jsd_bounds(self):
        from web2llmstxt_ray.ops.stats import js_divergence

        same = pd.DataFrame({"c": ["a", "b"] * 500,
                             "f": [0, 0, 1, 1] * 250})
        out = js_divergence(ray.data.from_pandas(same), "c", "f")
        assert abs(out["jsd"].iloc[0]) < 1e-12
        disjoint = pd.DataFrame({
            "c": ["a"] * 500 + ["b"] * 500,
            "f": [0] * 500 + [1] * 500})
        out2 = js_divergence(ray.data.from_pandas(disjoint), "c", "f")
        assert abs(out2["jsd"].iloc[0] - np.log(2)) < 1e-12
