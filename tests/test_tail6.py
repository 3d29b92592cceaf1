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
