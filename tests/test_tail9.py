"""Edge-case tests for the eleventh-wave operators (personalized
PageRank, association rules, session entry/exit matrix, type-token
ratio)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import (association_rules,
                                        session_entry_exit)
from web2llmstxt_ray.ops.graph import pagerank
from web2llmstxt_ray.ops.textstats import type_token_ratio

US = 1_000_000


def _ppr_seq(edges: list[tuple[int, int]], seeds: set[int],
             iters: int = 3, scale: int = 10 ** 12,
             num: int = 85, den: int = 100) -> dict[int, int]:
    """Sequential integer fixed-point PPR replay."""
    dedup = sorted(set(edges))
    nodes = sorted({x for e in dedup for x in e})
    deg: dict[int, int] = {}
    for s, _ in dedup:
        deg[s] = deg.get(s, 0) + 1
    sv = [n for n in nodes if n in seeds]
    r0 = scale // len(sv)
    base = ((den - num) * scale) // den // len(sv)
    r = {n: (r0 if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        inflow: dict[int, int] = {}
        for s, d in dedup:
            inflow[d] = inflow.get(d, 0) + (num * r[s]) // (den * deg[s])
        r = {n: (base if n in seeds else 0) + inflow.get(n, 0)
             for n in nodes}
    return r


class TestPersonalizedPagerank:
    EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1)]

    def test_matches_sequential(self):
        seeds = {0, 3}
        df = pd.DataFrame(self.EDGES, columns=["src", "dst"])
        got = pagerank(ray.data.from_pandas(df).repartition(3),
                       iters=3, seeds=sorted(seeds),
                       num_buckets=4).to_pandas()
        want = _ppr_seq(self.EDGES, seeds)
        got_map = dict(zip(got["node"].astype(int),
                           got["r"].astype(int)))
        assert got_map == want

    def test_all_seeds_equals_uniform(self):
        df = pd.DataFrame(self.EDGES, columns=["src", "dst"])
        nodes = sorted({x for e in self.EDGES for x in e})
        a = pagerank(ray.data.from_pandas(df), iters=2,
                     num_buckets=4).to_pandas().sort_values("node") \
            .reset_index(drop=True)
        b = pagerank(ray.data.from_pandas(df), iters=2, seeds=nodes,
                     num_buckets=4).to_pandas().sort_values("node") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_unreachable_non_seed_is_zero(self):
        # 5→6 is disconnected from seed 0's component: both stay 0
        edges = [(0, 1), (5, 6)]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = pagerank(ray.data.from_pandas(df), iters=3, seeds=[0],
                       num_buckets=4).to_pandas()
        m = dict(zip(got["node"].astype(int), got["r"].astype(int)))
        assert m[5] == 0 and m[6] == 0
        assert m[0] > 0 and m[1] > 0

    def test_no_seed_in_graph_raises(self):
        df = pd.DataFrame([(0, 1)], columns=["src", "dst"])
        try:
            pagerank(ray.data.from_pandas(df), iters=1, seeds=[99],
                     num_buckets=4)
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestAssociationRules:
    def test_matches_sequential(self):
        rng = np.random.default_rng(4)
        n = 400
        df = pd.DataFrame({
            "user_id": rng.integers(0, 10, n),
            "ts": pd.to_datetime(
                rng.integers(0, 5 * 86_400, n) * US * 1000 // 1000,
                unit="us"),
            "event_type": rng.choice(list("abcd"), n),
        })
        got = association_rules(ray.data.from_pandas(df)
                                .repartition(5), num_buckets=8)
        # sequential: baskets = (user, date) distinct item sets
        d = df.copy()
        d["d"] = d["ts"].dt.normalize()
        b = d[["user_id", "d", "event_type"]].drop_duplicates()
        baskets = b.groupby(["user_id", "d"])["event_type"] \
            .agg(set).tolist()
        N = len(baskets)
        items = sorted({i for s in baskets for i in s})
        cnt = {i: sum(1 for s in baskets if i in s) for i in items}
        rows = []
        for a in items:
            for c in items:
                if a == c:
                    continue
                nb = sum(1 for s in baskets if a in s and c in s)
                if nb == 0:
                    continue
                rows.append((a, c, nb, cnt[a], cnt[c], N,
                             float(nb) / N, float(nb) / cnt[a],
                             float(nb * N) / float(cnt[a] * cnt[c])))
        want = pd.DataFrame(rows, columns=[
            "antecedent", "consequent", "n_both", "n_ante", "n_cons",
            "n_baskets", "support", "confidence", "lift"])
        for c in ("n_both", "n_ante", "n_cons", "n_baskets"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_duplicate_events_count_once(self):
        ts = pd.to_datetime([0, 1, 2, 3], unit="s")
        df = pd.DataFrame({"user_id": [1, 1, 1, 1], "ts": ts,
                           "event_type": ["x", "x", "y", "y"]})
        got = association_rules(ray.data.from_pandas(df),
                                num_buckets=4)
        assert len(got) == 2
        assert (got["n_both"] == 1).all()
        assert (got["confidence"] == 1.0).all()
        assert (got["lift"] == 1.0).all()


class TestSessionEntryExit:
    def _mk(self, rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * US for r in rows], unit="us"),
            "event_id": list(range(len(rows))),
            "event_type": [r[2] for r in rows]})

    def test_gap_exactly_30min_is_same_session(self):
        df = self._mk([(1, 0, "a"), (1, 1800, "b")])
        got = session_entry_exit(ray.data.from_pandas(df),
                                 num_buckets=4)
        assert len(got) == 1
        assert tuple(got.iloc[0][["entry_type", "exit_type"]]) \
            == ("a", "b")

    def test_gap_over_30min_breaks(self):
        df = self._mk([(1, 0, "a"), (1, 1801, "b")])
        got = session_entry_exit(ray.data.from_pandas(df),
                                 num_buckets=4)
        assert len(got) == 2
        assert int(got["n_sessions"].sum()) == 2

    def test_tie_on_ts_ordered_by_id(self):
        # two events at the SAME timestamp: event_id orders them
        df = self._mk([(1, 100, "first"), (1, 100, "second")])
        got = session_entry_exit(ray.data.from_pandas(df),
                                 num_buckets=4)
        assert len(got) == 1
        assert tuple(got.iloc[0][["entry_type", "exit_type"]]) \
            == ("first", "second")

    def test_matches_sequential(self):
        rng = np.random.default_rng(9)
        n = 500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 8, n),
            "ts": pd.to_datetime(
                rng.integers(0, 86_400, n) * US, unit="us"),
            "event_id": np.arange(n),
            "event_type": rng.choice(list("pqr"), n)})
        got = session_entry_exit(ray.data.from_pandas(df)
                                 .repartition(6), num_buckets=8)
        cells = {}
        for _, g in df.sort_values(["user_id", "ts", "event_id"]) \
                .groupby("user_id"):
            us = g["ts"].astype("int64").to_numpy() // 1000
            types = g["event_type"].tolist()
            start = 0
            for i in range(1, len(g) + 1):
                if i == len(g) or us[i] - us[i - 1] > 1800 * US:
                    key = (types[start], types[i - 1])
                    cells[key] = cells.get(key, 0) + 1
                    start = i
        want = pd.DataFrame(
            [(a, b, n) for (a, b), n in sorted(cells.items())],
            columns=["entry_type", "exit_type", "n_sessions"])
        want["n_sessions"] = want["n_sessions"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestTypeTokenRatio:
    def test_small_exact(self):
        df = pd.DataFrame({
            "source": ["s1", "s1", "s2", "s2"],
            "text": ["the cat  sat", "The CAT ran", "x y z", "   "]})
        got = type_token_ratio(ray.data.from_pandas(df),
                               num_buckets=4)
        # s1: tokens [the cat sat the cat ran] → 6 tokens, 4 types
        # s2: the blank doc is excluded → 3 tokens, 3 types
        assert got.loc[got["source"] == "s1", "n_tokens"].item() == 6
        assert got.loc[got["source"] == "s1", "n_types"].item() == 4
        assert got.loc[got["source"] == "s2", "n_tokens"].item() == 3
        assert got.loc[got["source"] == "s2", "ttr"].item() == 1.0

    def test_partition_invariant(self):
        rng = np.random.default_rng(1)
        words = [f"w{i}" for i in range(30)]
        df = pd.DataFrame({
            "source": rng.choice(["a", "b", "c"], 100),
            "text": [" ".join(rng.choice(words,
                                         rng.integers(1, 12)))
                     for _ in range(100)]})
        x = type_token_ratio(ray.data.from_pandas(df).repartition(1),
                             num_buckets=4)
        y = type_token_ratio(ray.data.from_pandas(df).repartition(9),
                             num_buckets=16)
        pd.testing.assert_frame_equal(x, y)
