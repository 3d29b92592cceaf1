"""Edge-case tests for the seventh-wave operators (centroid cosine,
inter-arrival stats, Benford audit, daily open counts, as-of
tolerance)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import centroid_cosine_matrix
from web2llmstxt_ray.ops.joins import asof_join
from web2llmstxt_ray.ops.stats import benford_digit_counts
from web2llmstxt_ray.ops.windows import daily_open_counts, interarrival_stats


class TestCentroidCosine:
    def test_known_geometry(self):
        # label 0 -> mean (1,0); label 1 -> mean (0,1); label 2 -> (1,1)/sqrt2
        df = pd.DataFrame({
            "label": np.int32([0, 0, 1, 1, 2]),
            "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                          [0.0, 1.0], [1.0, 1.0]],
        })
        out = centroid_cosine_matrix(
            ray.data.from_pandas(df).repartition(3))
        got = {(r.label_a, r.label_b): r.cosine
               for r in out.itertuples()}
        assert got[(0, 1)] == 0.0
        assert abs(got[(0, 2)] - round(1 / np.sqrt(2), 6)) < 1e-9
        assert abs(got[(1, 2)] - round(1 / np.sqrt(2), 6)) < 1e-9

    def test_partition_invariant(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "label": rng.integers(0, 4, 200).astype("int32"),
            "embedding": [v.tolist() for v in
                          rng.normal(size=(200, 8)).astype("float32")],
        })
        a = centroid_cosine_matrix(ray.data.from_pandas(df)
                                   .repartition(1))
        b = centroid_cosine_matrix(ray.data.from_pandas(df)
                                   .repartition(9))
        pd.testing.assert_frame_equal(a, b)


class TestInterarrivalStats:
    def test_matches_sequential(self):
        rng = np.random.default_rng(9)
        n = 1500
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 30, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 ** 7, n), unit="s"),
        })
        out = interarrival_stats(
            ray.data.from_pandas(df).repartition(7))
        for uid, g in df.sort_values(["user_id", "ts", "event_id"]) \
                         .groupby("user_id"):
            us = g["ts"].astype("datetime64[us]").astype("int64")
            gaps = (np.diff(us) // 1_000_000).astype("int64")
            row = out[out["user_id"] == uid].iloc[0]
            assert row["n_gaps"] == len(gaps)
            assert row["sum_gap_s"] == gaps.sum()
            mean = gaps.sum() / len(gaps)
            assert abs(row["mean_gap_s"] - mean) < 1e-9

    def test_single_event_user_excluded_and_zero_gap_cv_nan(self):
        df = pd.DataFrame({
            "event_id": np.int64([1, 2, 3]),
            "user_id": np.int64([7, 8, 8]),
            "ts": pd.to_datetime(["2024-01-01"] * 3),
        })
        out = interarrival_stats(ray.data.from_pandas(df))
        assert out["user_id"].tolist() == [8]
        assert out["sum_gap_s"].iloc[0] == 0
        assert np.isnan(out["cv_gap"].iloc[0])


class TestBenford:
    def test_counts_and_expectations(self):
        vals = np.int64([1, 12, 123, 19, 2, 25, 31, 9, 99, 910])
        df = pd.DataFrame({"c": vals})
        out = benford_digit_counts(ray.data.from_pandas(df)
                                   .repartition(3), "c")
        got = dict(zip(out["digit"], out["n"]))
        assert got == {1: 4, 2: 2, 3: 1, 9: 3}
        n = 10
        for _, r in out.iterrows():
            e = n * np.log10(1 + 1 / r["digit"])
            assert abs(r["expected"] - e) < 1e-9
            assert abs(r["chi2_part"] - (r["n"] - e) ** 2 / e) < 1e-9


class TestDailyOpenCounts:
    def test_small_case_and_inverted_dropped(self):
        iv = pd.DataFrame({
            "s": pd.to_datetime(["2024-01-01", "2024-01-02",
                                 "2024-01-05"]),
            "e": pd.to_datetime(["2024-01-03", "2024-01-02",
                                 "2024-01-01"]),  # last is inverted
        })
        out = daily_open_counts(ray.data.from_pandas(iv)
                                .repartition(2), "s", "e")
        days = out["day"].dt.strftime("%m-%d").tolist()
        assert days == ["01-01", "01-02", "01-03"]
        assert out["n_open"].tolist() == [1, 2, 1]

    def test_partition_invariant(self):
        rng = np.random.default_rng(3)
        s = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 60, 400), unit="D")
        e = s + pd.to_timedelta(rng.integers(0, 20, 400), unit="D")
        iv = pd.DataFrame({"s": s, "e": e})
        a = daily_open_counts(ray.data.from_pandas(iv).repartition(1),
                              "s", "e")
        b = daily_open_counts(ray.data.from_pandas(iv).repartition(13),
                              "s", "e")
        pd.testing.assert_frame_equal(a, b)
        # brute force a middle day
        d = pd.Timestamp("2024-01-20")
        exp = int(((s.normalize() <= d) & (d <= e.normalize())).sum())
        assert a.loc[a["day"] == d, "n_open"].iloc[0] == exp


class TestAsofTolerance:
    def test_stale_match_becomes_nat(self):
        left = pd.DataFrame({
            "event_id": np.int64([1, 2]),
            "user_id": np.int64([5, 5]),
            "ts": pd.to_datetime(["2024-01-01 10:00",
                                  "2024-01-01 12:00"]),
        })
        right = pd.DataFrame({
            "event_id": np.int64([10, 11]),
            "user_id": np.int64([5, 5]),
            "ts": pd.to_datetime(["2024-01-01 09:30",
                                  "2024-01-01 09:45"]),
        })
        out = (asof_join(ray.data.from_pandas(left),
                         ray.data.from_pandas(right),
                         tolerance_s=3600).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        # 10:00 matches 09:45 (15 min <= 1h); 12:00's best match is
        # 09:45 but 2h15m stale -> NaT
        assert out["prior_ts"].iloc[0] == pd.Timestamp(
            "2024-01-01 09:45")
        assert pd.isna(out["prior_ts"].iloc[1])

    def test_none_tolerance_unchanged_semantics(self):
        left = pd.DataFrame({
            "event_id": np.int64([1]), "user_id": np.int64([5]),
            "ts": pd.to_datetime(["2024-01-02"])})
        right = pd.DataFrame({
            "event_id": np.int64([10]), "user_id": np.int64([5]),
            "ts": pd.to_datetime(["2024-01-01"])})
        out = asof_join(ray.data.from_pandas(left),
                        ray.data.from_pandas(right)).to_pandas()
        assert out["prior_ts"].iloc[0] == pd.Timestamp("2024-01-01")


class TestTrailingPeakCounts:
    def test_matches_bruteforce(self):
        from web2llmstxt_ray.ops.windows import trailing_peak_counts
        rng = np.random.default_rng(21)
        n = 1200
        df = pd.DataFrame({
            "user_id": rng.integers(0, 20, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 5000, n), unit="s"),
        })
        out = trailing_peak_counts(
            ray.data.from_pandas(df).repartition(6), window_s=120)
        for uid, g in df.groupby("user_id"):
            ts = np.sort(g["ts"].astype("datetime64[us]")
                         .astype("int64").to_numpy())
            w = 120 * 1_000_000
            peak = max(int(((t - w < ts) & (ts <= t)).sum())
                       for t in ts)
            assert out.loc[out["user_id"] == uid,
                           "peak"].iloc[0] == peak

    def test_burst_of_equal_timestamps(self):
        from web2llmstxt_ray.ops.windows import trailing_peak_counts
        df = pd.DataFrame({
            "user_id": np.int64([1] * 5),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 5)})
        out = trailing_peak_counts(ray.data.from_pandas(df),
                                   window_s=1)
        assert out["peak"].iloc[0] == 5


class TestLocfDaily:
    def test_carries_forward_and_tie_breaks(self):
        from web2llmstxt_ray.ops.windows import locf_daily
        df = pd.DataFrame({
            "event_id": np.int64([1, 2, 3]),
            "user_id": np.int64([7, 7, 7]),
            "ts": pd.to_datetime(["2024-01-01 08:00",
                                  "2024-01-01 08:00",
                                  "2024-01-04 09:00"]),
            "value": [1.0, 2.0, 9.0],
        })
        out = locf_daily(ray.data.from_pandas(df).repartition(2))
        # 4 days; day 1-3 carry the tie-broken (higher id) value 200
        assert len(out) == 4
        assert out["value_cents"].tolist() == [200, 200, 200, 900]

    def test_matches_sequential(self):
        from web2llmstxt_ray.ops.windows import locf_daily
        rng = np.random.default_rng(31)
        n = 800
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 15, n),
            "ts": pd.Timestamp("2024-02-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n),
                              unit="s"),
            "value": rng.uniform(0, 50, n).round(2),
        })
        out = locf_daily(ray.data.from_pandas(df).repartition(5))
        day_us = 86_400_000_000
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            us = g["ts"].astype("datetime64[us]").astype("int64")
            cents = (g["value"] * 100).round().astype("int64")
            d0, d1 = us.min() // day_us, us.max() // day_us
            sub = out[out["user_id"] == uid]
            assert len(sub) == d1 - d0 + 1
            for _, r in sub.iterrows():
                probe = ((r["day"].value // 1000) // day_us + 1) \
                    * day_us - 1
                sel = us[us <= probe]
                exp = cents[us <= probe].iloc[-1]
                assert r["value_cents"] == exp


class TestPolitenessSchedule:
    def test_matches_sequential_simulation(self):
        from web2llmstxt_ray.ops.windows import politeness_schedule
        rng = np.random.default_rng(41)
        n = 900
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 12, n),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
        })
        out = politeness_schedule(
            ray.data.from_pandas(df).repartition(5), delay_s=7)
        d = 7_000_000
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            us = g["ts"].astype("datetime64[us]").astype("int64")
            disp = None
            for eid, a in zip(g["event_id"], us):
                disp = a if disp is None else max(a, disp + d)
                got = out.loc[out["event_id"] == eid,
                              "wait_us"].iloc[0]
                assert got == disp - a

    def test_burst_at_same_instant(self):
        from web2llmstxt_ray.ops.windows import politeness_schedule
        df = pd.DataFrame({
            "event_id": np.int64([3, 1, 2]),
            "user_id": np.int64([1, 1, 1]),
            "ts": pd.to_datetime(["2024-01-01"] * 3)})
        out = politeness_schedule(ray.data.from_pandas(df), delay_s=2)
        # id order breaks the tie: waits 0s, 2s, 4s for ids 1,2,3
        assert out.sort_values("event_id")["wait_us"].tolist() == [
            0, 2_000_000, 4_000_000]


class TestDailyOhlc:
    def test_matches_pandas_oracle(self):
        from web2llmstxt_ray.ops.windows import daily_ohlc
        rng = np.random.default_rng(51)
        n = 1000
        df = pd.DataFrame({
            "event_id": rng.permutation(n).astype("int64"),
            "user_id": rng.integers(0, 10, n),
            "ts": pd.Timestamp("2024-05-01")
            + pd.to_timedelta(rng.integers(0, 6 * 86400, n), unit="s"),
            "value": rng.uniform(0, 90, n).round(2),
        })
        out = daily_ohlc(ray.data.from_pandas(df).repartition(7))
        g = df.assign(
            day=df["ts"].dt.floor("D"),
            c=(df["value"] * 100).round().astype("int64"))
        g = g.sort_values(["ts", "event_id"])
        exp = g.groupby(["user_id", "day"], as_index=False).agg(
            open_cents=("c", "first"), high_cents=("c", "max"),
            low_cents=("c", "min"), close_cents=("c", "last"),
            n=("c", "size"))
        exp = exp.sort_values(["user_id", "day"]).reset_index(drop=True)
        out["day"] = out["day"].astype("datetime64[ns]")
        pd.testing.assert_frame_equal(
            out.astype({"n": "int64"}), exp.astype({"n": "int64"}),
            check_dtype=False)

    def test_partial_combine_idempotent_single_block(self):
        from web2llmstxt_ray.ops.windows import daily_ohlc
        df = pd.DataFrame({
            "event_id": np.int64([2, 1]),
            "user_id": np.int64([5, 5]),
            "ts": pd.to_datetime(["2024-01-01 09:00",
                                  "2024-01-01 09:00"]),
            "value": [3.0, 7.0]})
        one = daily_ohlc(ray.data.from_pandas(df))
        two = daily_ohlc(ray.data.from_pandas(df).repartition(2))
        # same-instant tie: open = lower id (700), close = higher (300)
        assert one["open_cents"].iloc[0] == 700
        assert one["close_cents"].iloc[0] == 300
        pd.testing.assert_frame_equal(one, two)


class TestGroupedGini:
    @staticmethod
    def _brute(vals):
        v = sorted(int(x) for x in vals)
        n, s = len(v), sum(v)
        num = 2 * sum((i + 1) * x for i, x in enumerate(v)) \
            - (n + 1) * s
        return float(num) / float(n * s)

    def test_matches_bruteforce_with_ties(self):
        from web2llmstxt_ray.ops.stats import grouped_gini
        rng = np.random.default_rng(61)
        n = 900
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], n),
            "value": rng.integers(1, 40, n) / 4.0,  # heavy cent ties
        })
        out = grouped_gini(ray.data.from_pandas(df).repartition(6),
                           "g", "value")
        for gname, grp in df.groupby("g"):
            cents = (grp["value"] * 100).round().astype(int)
            exp = self._brute(cents)
            row = out[out["g"] == gname].iloc[0]
            assert row["gini"] == exp
            assert row["n"] == len(grp)
            assert row["total_cents"] == cents.sum()

    def test_extremes(self):
        from web2llmstxt_ray.ops.stats import grouped_gini
        df = pd.DataFrame({
            "g": ["eq"] * 4 + ["conc"] * 4,
            "value": [5.0] * 4 + [0.0, 0.0, 0.0, 80.0]})
        out = grouped_gini(ray.data.from_pandas(df), "g", "value")
        assert out.set_index("g").loc["eq", "gini"] == 0.0
        assert out.set_index("g").loc["conc", "gini"] == 0.75


class TestZipfFit:
    def test_exact_power_law_recovers_slope(self):
        from web2llmstxt_ray.ops.corpus import zipf_fit
        # counts = round(1000 * rank^-1): ln-ln is near-linear
        docs = []
        for r in range(1, 21):
            docs += [f"tok{r:02d}"] * round(1000 / r)
        rng = np.random.default_rng(71)
        rng.shuffle(docs)
        texts = [" ".join(docs[i::7]) for i in range(7)]
        out = zipf_fit(ray.data.from_pandas(
            pd.DataFrame({"text": texts})).repartition(3), k=20)
        assert out["n_terms"].iloc[0] == 20
        assert -1.05 < out["zipf_slope"].iloc[0] < -0.95

    def test_matches_closed_form(self):
        from web2llmstxt_ray.ops.corpus import zipf_fit
        import math
        df = pd.DataFrame({"text": ["a a a a b b c", "a b c", ""]})
        out = zipf_fit(ray.data.from_pandas(df), k=10)
        # counts: a=5, b=3, c=2 -> ranks 1,2,3
        x = np.log([1.0, 2.0, 3.0]); y = np.log([5.0, 3.0, 2.0])
        n = 3
        sx, sy = math.fsum(x), math.fsum(y)
        sxy, sxx = math.fsum(x * y), math.fsum(x * x)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert out["n_terms"].iloc[0] == 3
        assert out["zipf_slope"].iloc[0] == slope
        assert out["zipf_intercept"].iloc[0] == (sy - slope * sx) / n


class TestRelationalDivision:
    def test_covering_groups_only(self):
        from web2llmstxt_ray.ops.relational import relational_division
        df = pd.DataFrame({
            "u": np.int64([1, 1, 1, 2, 2, 3, 3, 3, 3]),
            "t": ["a", "b", "c", "a", "b", "a", "b", "c", "c"]})
        out = relational_division(
            ray.data.from_pandas(df).repartition(4), "u", "t")
        assert out["u"].tolist() == [1, 3]
        assert out["n_attrs"].tolist() == [3, 3]

    def test_all_cover_single_attr(self):
        from web2llmstxt_ray.ops.relational import relational_division
        df = pd.DataFrame({"u": np.int64([5, 6, 5]), "t": ["x"] * 3})
        out = relational_division(ray.data.from_pandas(df), "u", "t")
        assert out["u"].tolist() == [5, 6]


class TestDecayedValueSum:
    def test_matches_closed_form(self):
        from web2llmstxt_ray.ops.windows import decayed_value_sum
        rng = np.random.default_rng(91)
        n = 500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 8, n),
            "ts": pd.Timestamp("2024-06-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "value": rng.uniform(0, 10, n).round(2)})
        out = decayed_value_sum(
            ray.data.from_pandas(df).repartition(5),
            half_life_s=3600.0)
        tref = df["ts"].max()
        for uid, g in df.groupby("user_id"):
            dt = (tref - g["ts"]).dt.total_seconds().to_numpy()
            exp = float((g["value"].to_numpy()
                         * np.power(0.5, dt / 3600.0)).sum())
            got = out.loc[out["user_id"] == uid,
                          "decayed_value"].iloc[0]
            assert abs(got - exp) < 1e-9

    def test_event_at_reference_weighs_one(self):
        from web2llmstxt_ray.ops.windows import decayed_value_sum
        df = pd.DataFrame({
            "user_id": np.int64([1, 1]),
            "ts": pd.to_datetime(["2024-01-01 00:00",
                                  "2024-01-01 01:00"]),
            "value": [4.0, 8.0]})
        out = decayed_value_sum(ray.data.from_pandas(df),
                                half_life_s=3600.0)
        # later event weighs 1.0, earlier exactly one half-life: 0.5
        assert out["decayed_value"].iloc[0] == 8.0 + 2.0


class TestReadabilityScores:
    def test_counts_and_formula(self):
        from web2llmstxt_ray.ops.textstats import readability_scores
        df = pd.DataFrame({
            "doc_id": np.int64([1, 2, 3]),
            "text": ["The cat sat. It purred!",
                     "no sentence marks here",
                     "12345 !!!"]})  # doc 3: zero words -> dropped
        out = readability_scores(
            ray.data.from_pandas(df)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [1, 2]
        r1 = out.iloc[0]
        assert (r1["n_words"], r1["n_sentences"]) == (5, 2)
        # vowel runs: e,a,a,(sat:a),I,u,e -> count via regex
        import re
        assert r1["n_vowel_groups"] == len(
            re.findall(r"[aeiouyAEIOUY]+", df["text"][0]))
        assert r1["flesch"] == 206.835 - 1.015 * (5 / 2) \
            - 84.6 * (r1["n_vowel_groups"] / 5)
        assert out.iloc[1]["n_sentences"] == 1  # floored


class TestCentroidSilhouette:
    def test_matches_numpy_oracle(self):
        from web2llmstxt_ray.ops.ann import centroid_silhouette
        rng = np.random.default_rng(101)
        n, d = 300, 8
        y = rng.integers(0, 3, n)
        X = rng.normal(0, 1, (n, d)) + y[:, None] * 3.0
        df = pd.DataFrame({
            "label": y.astype("int32"),
            "embedding": [r.astype("float32").tolist() for r in X]})
        out = centroid_silhouette(
            ray.data.from_pandas(df).repartition(4))
        Xf = np.stack([np.asarray(v, dtype=np.float64)
                       for v in df["embedding"]])
        C = np.stack([
            np.round(Xf[y == l].mean(axis=0), 12) for l in range(3)])
        d2 = ((Xf[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a2 = d2[np.arange(n), y]
        d2[np.arange(n), y] = np.inf
        b2 = d2.min(axis=1)
        s = (np.sqrt(b2) - np.sqrt(a2)) / np.maximum(
            np.sqrt(a2), np.sqrt(b2))
        for l in range(3):
            exp = round(float(s[y == l].mean()), 6)
            row = out[out["label"] == l].iloc[0]
            assert abs(row["silhouette"] - exp) < 2e-6
            assert row["n"] == int((y == l).sum())
        # well-separated clusters: strongly positive
        assert (out["silhouette"] > 0.5).all()
