"""Wave-44 conformance: CDC dedup census, rolling OLS slope, Hill
tail index."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestCdcDedupRatio:
    def test_sequential_oracle(self, ray_session):
        import hashlib

        from web2llmstxt_ray.ops.substr import (cdc_dedup_ratio,
                                                gear_hash_boundaries)

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        out = cdc_dedup_ratio(rd.from_arrow(docs).repartition(8)) \
            .iloc[0]
        seen: dict = {}
        n_chunks = chars_total = 0
        for t in docs.column("text").to_pylist():
            b = gear_hash_boundaries(t, 6).tolist()
            if len(t) and (not b or b[-1] != len(t)):
                b.append(len(t))
            prev = 0
            for e in b:
                seg = t[prev:e]
                seen[hashlib.md5(seg.encode()).hexdigest()] = len(seg)
                n_chunks += 1
                chars_total += len(seg)
                prev = e
        assert int(out["n_chunks"]) == n_chunks
        assert int(out["n_distinct"]) == len(seen)
        assert int(out["chars_total"]) == chars_total
        assert int(out["chars_distinct"]) == sum(seen.values())
        assert out["dup_chunk_frac"] == \
            (n_chunks - len(seen)) / n_chunks

    def test_planted_duplication(self, ray_session):
        """Varied text (a short repeated sentence has too few distinct
        64-char windows to ever hit the 1/64 mask — zero boundaries,
        a documented property of content-defined cuts)."""
        from web2llmstxt_ray.ops.substr import cdc_dedup_ratio

        rng = np.random.RandomState(11)
        words = ["w%03d" % i for i in range(400)]
        base = " ".join(words[i] for i in rng.randint(0, 400, 600))
        docs = pd.DataFrame({"doc_id": [1, 2],
                             "text": [base, "PREFIX CONTENT " + base]})
        out = cdc_dedup_ratio(rd.from_pandas(docs)).iloc[0]
        # shift-robust chunking ⇒ deep interior chunks dedup
        assert int(out["n_chunks"]) > 20
        assert out["dup_chunk_frac"] > 0.3


class TestRollingSlope:
    def test_window_moments_sequential(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 rolling_slope)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = rolling_slope(ds, window_days=28)
        days, cents = _daily_cents_series(ds, "o_orderdate",
                                          "o_totalprice")
        dmap = dict(zip(days.tolist(), (int(c) for c in cents)))
        for _, r in out.head(60).iterrows():
            d = int(r["day"])
            xs = [(dd, dmap[dd]) for dd in range(d - 27, d + 1)
                  if dd in dmap]
            assert int(r["n_win"]) == len(xs)
            if len(xs) >= 2:
                n = len(xs)
                sx = sum(x for x, _ in xs)
                sy = sum(y for _, y in xs)
                num = n * sum(x * y for x, y in xs) - sx * sy
                den = n * sum(x * x for x, _ in xs) - sx * sx
                assert r["slope"] == float(num) / float(den)

    def test_planted_trend(self, ray_session):
        from web2llmstxt_ray.ops.windows import rolling_slope

        days = pd.date_range("2024-01-01", periods=60)
        vals = [10.0 + 0.5 * i for i in range(60)]   # 50 cents/day
        ev = pd.DataFrame({"o_orderdate": days, "o_totalprice": vals})
        out = rolling_slope(rd.from_pandas(ev), window_days=28)
        full = out[out["n_win"] == 28]
        assert np.allclose(full["slope"], 50.0)


class TestHillTail:
    def test_sequential_and_heavy_tail_detection(self, ray_session):
        from web2llmstxt_ray.ops.stats import hill_tail_index

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["n_chars", "doc_id"])
        out = hill_tail_index(rd.from_arrow(docs).repartition(8),
                              k=50).iloc[0]
        df = docs.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True])
        top = df.head(51)["n_chars"].astype(int).tolist()
        xt = top[50]
        s = sum(math.log(v / xt) for v in top[:50])
        assert int(out["x_tail"]) == xt
        assert abs(out["mean_log_ratio"] - s / 50) < 1e-12
        # planted Pareto(α=2) sample → α̂ near 2
        rng = np.random.RandomState(7)
        x = np.rint(100 * (rng.uniform(size=5000) ** -0.5)) \
            .astype(np.int64)
        p = pd.DataFrame({"n_chars": x,
                          "doc_id": np.arange(len(x))})
        est = hill_tail_index(rd.from_pandas(p), k=200).iloc[0]
        assert 1.5 < est["tail_alpha"] < 2.6
