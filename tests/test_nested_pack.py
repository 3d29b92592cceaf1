"""Interleaved span-doc packing invariants + journey string oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import user_journeys
from web2llmstxt_ray.ops.nested import (build_span_docs, pack_interleaved,
                                        span_costs)


def _docs(n: int = 60, seed: int = 21) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, rng.integers(5, 400)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(n)],
                         "text": texts})


def _cost_oracle(df: pd.DataFrame, media_cost: int = 16) -> dict[str, int]:
    out = {}
    for _, r in df.iterrows():
        t = r["text"]
        cost = 0
        n_spans = (len(t) + 63) // 64
        for i in range(n_spans):
            if i % 3 == 2:
                cost += media_cost
            else:
                chunk = t[i * 64:(i + 1) * 64].strip()
                cost += len(chunk.split()) if chunk else 0
        out[r["doc_id"]] = cost
    return out


class TestSpanCosts:
    def test_matches_sequential_oracle(self):
        df = _docs()
        got = span_costs(
            build_span_docs(ray.data.from_pandas(df).repartition(5))
        ).to_pandas()
        want = _cost_oracle(df)
        assert dict(zip(got["doc_id"], got["cost"])) == want


class TestPackInterleaved:
    def test_invariants(self):
        df = _docs(80, seed=4)
        budget = 300
        packs = pack_interleaved(
            build_span_docs(ray.data.from_pandas(df).repartition(3)),
            max_tokens=budget).to_pandas()
        costs = _cost_oracle(df)
        seen: list[str] = []
        for _, p in packs.iterrows():
            ids = list(p["doc_ids"])
            seen.extend(ids)
            assert p["n_docs"] == len(ids)
            assert p["total_cost"] == sum(costs[d] for d in ids)
            # budget respected unless a single oversized doc
            assert p["total_cost"] <= budget or len(ids) == 1
        assert sorted(seen) == sorted(df["doc_id"])

    def test_deterministic(self):
        df = _docs(40, seed=8)
        ds = build_span_docs(ray.data.from_pandas(df).repartition(1))
        a = pack_interleaved(ds, max_tokens=256).to_pandas()
        b = pack_interleaved(ds, max_tokens=256).to_pandas()
        assert sorted(a["pack_id"]) == sorted(b["pack_id"])


class TestUserJourneys:
    def test_matches_pandas_oracle(self):
        rng = np.random.default_rng(2)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
        })
        out = user_journeys(ray.data.from_pandas(df).repartition(7)
                            ).to_pandas()
        g = df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id", as_index=False).agg(
            journey=("event_type", ">".join),
            n_events=("event_type", "size"))
        merged = out.merge(g, on="user_id", suffixes=("", "_want"))
        assert len(merged) == len(g) == len(out)
        assert (merged["journey"] == merged["journey_want"]).all()
        assert (merged["n_events"] == merged["n_events_want"]).all()
