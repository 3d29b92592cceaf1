"""Edge-case tests for the fifth-wave operators (WAU, CUSUM,
robust outliers, equi-depth buckets, KWIC)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.retrieval import kwic_contexts
from web2llmstxt_ray.ops.stats import (equi_depth_bucket_counts,
                                       grouped_median_mad_outliers)
from web2llmstxt_ray.ops.windows import cusum_stats, rolling_active_users


class TestRollingActiveUsers:
    def test_matches_bruteforce_and_partition_invariant(self):
        rng = np.random.default_rng(7)
        n = 3000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 45 * 86400, n), unit="s"),
        })
        out = rolling_active_users(
            ray.data.from_pandas(df).repartition(9), window_days=7)
        # brute force: for each event day, distinct users in [d-6, d]
        days = np.sort(df["ts"].dt.normalize().unique())
        exp = []
        for d in days:
            lo = d - pd.Timedelta(days=6)
            m = (df["ts"].dt.normalize() >= lo) & (df["ts"] <= d
                                                   + pd.Timedelta(days=1))
            m = (df["ts"].dt.normalize().between(lo, d))
            exp.append((d, df.loc[m, "user_id"].nunique()))
        exp_df = pd.DataFrame(exp, columns=["day", "wau"])
        exp_df["day"] = exp_df["day"].astype("datetime64[us]")
        exp_df["wau"] = exp_df["wau"].astype("int64")
        pd.testing.assert_frame_equal(out, exp_df)
        out1 = rolling_active_users(
            ray.data.from_pandas(df).repartition(1), window_days=7)
        pd.testing.assert_frame_equal(out, out1)

    def test_single_user_single_day(self):
        df = pd.DataFrame({"user_id": [5, 5],
                           "ts": pd.to_datetime(["2024-01-03 04:00",
                                                 "2024-01-03 09:00"])})
        out = rolling_active_users(ray.data.from_pandas(df))
        assert len(out) == 1 and out["wau"].iloc[0] == 1


class TestCusum:
    @staticmethod
    def _sequential(df, k_cents, h_cents):
        rows = []
        for uid, g in df.sort_values(["user_id", "ts", "event_id"]) \
                         .groupby("user_id"):
            s = 0
            mx = 0
            for v in g["value"]:
                s = max(0, s + int(round(v * 100)) - k_cents)
                mx = max(mx, s)
            rows.append((uid, len(g), mx, mx >= h_cents))
        return pd.DataFrame(rows, columns=["user_id", "n_events",
                                           "max_cusum_cents", "alarm"])

    def test_matches_sequential_recurrence(self):
        rng = np.random.default_rng(11)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 25, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 ** 6, n), unit="s"),
            "value": rng.uniform(0, 120, n).round(2),
        })
        out = cusum_stats(ray.data.from_pandas(df).repartition(7),
                          k_cents=5000, h_cents=20000)
        exp = self._sequential(df, 5000, 20000)
        exp["n_events"] = exp["n_events"].astype("int64")
        exp["max_cusum_cents"] = exp["max_cusum_cents"].astype("int64")
        exp = exp.sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_never_negative_and_flat_when_below_k(self):
        df = pd.DataFrame({
            "event_id": np.arange(4, dtype="int64"),
            "user_id": [1, 1, 1, 1],
            "ts": pd.date_range("2024-01-01", periods=4, freq="h"),
            "value": [1.0, 2.0, 1.5, 0.5],
        })
        out = cusum_stats(ray.data.from_pandas(df),
                          k_cents=1000, h_cents=1)
        assert out["max_cusum_cents"].iloc[0] == 0
        assert not out["alarm"].iloc[0]


class TestGroupedMedianMadOutliers:
    def test_matches_numpy_rule(self):
        rng = np.random.default_rng(3)
        n = 1200
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype="int64"),
            "lang": rng.choice(["a", "b", "c"], n),
            "n_chars": rng.integers(50, 500, n).astype("int64"),
        })
        out = grouped_median_mad_outliers(
            ray.data.from_pandas(df).repartition(6),
            "lang", "n_chars", "doc_id", thresh=1.5)

        def disc_median(vals):
            v = np.sort(vals)
            return int(v[int(np.ceil(0.5 * len(v))) - 1])

        exp_rows = []
        for lang, g in df.groupby("lang"):
            med = disc_median(g["n_chars"].to_numpy())
            mad = disc_median(np.abs(g["n_chars"].to_numpy() - med))
            m = np.abs(g["n_chars"] - med) > 1.5 * mad
            sub = g.loc[m, ["doc_id", "lang", "n_chars"]].copy()
            sub["med"] = np.int64(med)
            sub["mad"] = np.int64(mad)
            exp_rows.append(sub)
        exp = (pd.concat(exp_rows).sort_values("doc_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp)

    def test_zero_mad_constant_group(self):
        df = pd.DataFrame({"doc_id": np.arange(6, dtype="int64"),
                           "lang": ["x"] * 5 + ["x"],
                           "n_chars": np.int64([7, 7, 7, 7, 7, 9])})
        out = grouped_median_mad_outliers(
            ray.data.from_pandas(df), "lang", "n_chars", "doc_id",
            thresh=2.0)
        # MAD is 0: every value != median is an outlier
        assert out["doc_id"].tolist() == [5]


class TestEquiDepthBuckets:
    def test_counts_sum_and_near_uniform(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({"v": rng.integers(0, 10 ** 6, 20000)
                           .astype("int64")})
        out = equi_depth_bucket_counts(
            ray.data.from_pandas(df).repartition(8), "v",
            num_buckets=10)
        assert out["n_rows"].sum() == 20000
        assert out["bucket"].tolist() == list(range(10))
        assert out["n_rows"].max() - out["n_rows"].min() <= 2

    def test_heavy_ties_collapse_boundaries(self):
        # one value is 80% of the data: duplicate boundaries collapse,
        # ties land in the LOW bucket, counts still total n
        df = pd.DataFrame({"v": np.int64([5] * 800 + list(range(200)))})
        out = equi_depth_bucket_counts(ray.data.from_pandas(df), "v",
                                       num_buckets=10)
        assert out["n_rows"].sum() == 1000
        assert len(out) < 10


class TestKwic:
    def test_contexts_and_positions(self):
        df = pd.DataFrame({
            "doc_id": np.int64([1, 2, 3]),
            "text": ["merge a b c merge",
                     "x merge y",
                     "no hits here"],
        })
        out = (kwic_contexts(ray.data.from_pandas(df).repartition(2),
                             "merge", window=3).to_pandas()
               .sort_values(["doc_id", "pos"]).reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 1, 2]
        assert out["pos"].tolist() == [1, 5, 2]
        assert out["left_ctx"].tolist() == ["", "a b c", "x"]
        assert out["right_ctx"].tolist() == ["a b c", "", "y"]

    def test_empty_result_schema_stable(self):
        df = pd.DataFrame({"doc_id": np.int64([1]), "text": ["a b"]})
        ds = kwic_contexts(ray.data.from_pandas(df), "zzz", window=2)
        # zero hits: the Dataset still carries the typed schema
        # (per_block emits typed empty Arrow tables, never
        # schema-less pandas blocks)
        assert ds.schema().names == ["doc_id", "pos", "left_ctx",
                                     "right_ctx"]
        assert ds.count() == 0
