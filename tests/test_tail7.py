"""Edge-case tests for the ninth-wave operators (mutual top-1 pairs,
degree assortativity, local clustering, out-of-order stats)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import mutual_top1_pairs
from web2llmstxt_ray.ops.graph import (degree_assortativity,
                                       local_clustering, triangle_count)
from web2llmstxt_ray.ops.windows import out_of_order_stats


def _emb_df(n: int, d: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [v.tolist() for v in
                      rng.normal(size=(n, d)).astype("float32")],
    })


def _mutual_seq(df: pd.DataFrame, scale_bits: int = 15) -> pd.DataFrame:
    X = np.array([np.asarray(v, dtype=np.float64)
                  for v in df["embedding"]])
    ids = df["vec_id"].to_numpy().astype(np.int64)
    Q = np.floor(X * float(1 << scale_bits) + 0.5).astype(np.int64)
    D = Q.astype(np.float64) @ Q.astype(np.float64).T
    np.fill_diagonal(D, -np.inf)
    best = {}
    for i in range(len(ids)):
        m = D[i].max()
        best[int(ids[i])] = (int(m),
                             int(ids[np.flatnonzero(D[i] == m)].min()))
    rows = [(a, b, d) for a, (d, b) in best.items()
            if a < b and best[b][1] == a]
    return pd.DataFrame(rows, columns=["a", "b", "dot"]).sort_values(
        ["a", "b"]).reset_index(drop=True).astype("int64")


class TestMutualTop1:
    def test_matches_sequential(self):
        df = _emb_df(160, 6, seed=3)
        got = mutual_top1_pairs(ray.data.from_pandas(df).repartition(7),
                                num_blocks=3, num_buckets=8)
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      _mutual_seq(df))

    def test_partition_and_block_invariant(self):
        df = _emb_df(90, 5, seed=11)
        a = mutual_top1_pairs(ray.data.from_pandas(df).repartition(1),
                              num_blocks=2, num_buckets=4)
        b = mutual_top1_pairs(ray.data.from_pandas(df).repartition(9),
                              num_blocks=5, num_buckets=16)
        pd.testing.assert_frame_equal(a, b)

    def test_planted_reciprocal_pair(self):
        # two near-identical vectors far from a noise cloud must pair
        rng = np.random.default_rng(0)
        base = rng.normal(size=12).astype("float32")
        rows = [base, base + 1e-4] + [
            rng.normal(size=12).astype("float32") * 0.1
            for _ in range(30)]
        df = pd.DataFrame({
            "vec_id": np.arange(32, dtype="int64"),
            "embedding": [np.asarray(v, dtype="float32").tolist()
                          for v in rows],
        })
        got = mutual_top1_pairs(ray.data.from_pandas(df).repartition(4),
                                num_blocks=3, num_buckets=4)
        assert [0, 1] in got[["a", "b"]].values.tolist()

    def test_dataset_mode_parity(self):
        df = _emb_df(70, 4, seed=7)
        eager = mutual_top1_pairs(
            ray.data.from_pandas(df).repartition(5), num_blocks=3)
        ds = mutual_top1_pairs(
            ray.data.from_pandas(df).repartition(5), num_blocks=3,
            as_dataset=True)
        lazy = ds.to_pandas().astype("int64").sort_values(
            ["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(eager.astype("int64"), lazy)

    def test_component_bound_enforced(self):
        df = pd.DataFrame({"vec_id": np.int64([0, 1]),
                           "embedding": [[9.0, 0.0], [1.0, 0.0]]})
        import pytest
        with pytest.raises(Exception, match="exact-integer-dot"):
            mutual_top1_pairs(ray.data.from_pandas(df), num_blocks=2)


def _edges_df(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    keep = u != v
    lo = np.minimum(u, v)[keep]
    hi = np.maximum(u, v)[keep]
    return pd.DataFrame({"u": lo.astype("int64"),
                         "v": hi.astype("int64")})


class TestDegreeAssortativity:
    def test_matches_sequential(self):
        pdf = _edges_df(40, 300, seed=2)
        got = degree_assortativity(
            ray.data.from_pandas(pdf).repartition(6), num_buckets=8)
        e = pdf.drop_duplicates()
        deg = pd.concat([e["u"], e["v"]]).value_counts()
        du = e["u"].map(deg).to_numpy().astype("int64")
        dv = e["v"].map(deg).to_numpy().astype("int64")
        x = np.concatenate([du, dv]).astype(object)
        y = np.concatenate([dv, du]).astype(object)
        M = len(x)
        num = M * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = M * int((x * x).sum()) - int(x.sum()) ** 2
        assert int(got["n_edges"].iloc[0]) == len(e)
        assert abs(got["assortativity"].iloc[0]
                   - float(num) / float(den)) < 1e-12

    def test_star_is_disassortative(self):
        # star graph: hub degree n-1 links only to leaves of degree 1
        pdf = pd.DataFrame({"u": np.zeros(10, dtype="int64"),
                            "v": np.arange(1, 11, dtype="int64")})
        got = degree_assortativity(ray.data.from_pandas(pdf),
                                   num_buckets=4)
        assert got["assortativity"].iloc[0] == -1.0

    def test_partition_invariant(self):
        pdf = _edges_df(25, 150, seed=9)
        a = degree_assortativity(
            ray.data.from_pandas(pdf).repartition(1), num_buckets=4)
        b = degree_assortativity(
            ray.data.from_pandas(pdf).repartition(11), num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestLocalClustering:
    def test_matches_sequential(self):
        pdf = _edges_df(30, 220, seed=4)
        got = local_clustering(
            ray.data.from_pandas(pdf).repartition(6), num_buckets=8)
        e = pdf.drop_duplicates()
        adj: dict[int, set[int]] = {}
        for u, v in e.itertuples(index=False):
            adj.setdefault(int(u), set()).add(int(v))
            adj.setdefault(int(v), set()).add(int(u))
        rows = []
        for node, nb in sorted(adj.items()):
            d = len(nb)
            if d < 2:
                continue
            nbl = sorted(nb)
            t = sum(1 for i in range(len(nbl))
                    for j in range(i + 1, len(nbl))
                    if nbl[j] in adj[nbl[i]])
            rows.append((node, d, t,
                         round(2.0 * t / (d * (d - 1)), 12)))
        exp = pd.DataFrame(rows, columns=["node", "deg", "n_triangles",
                                          "clustering"])
        pd.testing.assert_frame_equal(
            got.astype({"node": "int64", "deg": "int64",
                        "n_triangles": "int64"}),
            exp.astype({"node": "int64", "deg": "int64",
                        "n_triangles": "int64"}))

    def test_triangle_sum_consistency(self):
        pdf = _edges_df(30, 180, seed=12)
        got = local_clustering(
            ray.data.from_pandas(pdf).repartition(4), num_buckets=8)
        tc = triangle_count(
            ray.data.from_pandas(pdf).repartition(4), num_buckets=8)
        assert int(got["n_triangles"].sum()) == 3 * tc

    def test_complete_graph_coefficient_one(self):
        n = 6
        rows = [(i, j) for i in range(n) for j in range(i + 1, n)]
        pdf = pd.DataFrame(rows, columns=["u", "v"]).astype("int64")
        got = local_clustering(ray.data.from_pandas(pdf), num_buckets=4)
        assert (got["clustering"] == 1.0).all()
        assert (got["n_triangles"] == (n - 1) * (n - 2) // 2).all()

    def test_dataset_mode_parity(self):
        pdf = _edges_df(20, 90, seed=6)
        eager = local_clustering(
            ray.data.from_pandas(pdf).repartition(3), num_buckets=4)
        lazy = local_clustering(
            ray.data.from_pandas(pdf).repartition(3), num_buckets=4,
            as_dataset=True).to_pandas().sort_values(
            "node").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            eager.astype({"node": "int64"}).reset_index(drop=True),
            lazy.astype({"node": "int64"}))


class TestOutOfOrderStats:
    def test_matches_sequential(self):
        rng = np.random.default_rng(8)
        n = 2000
        df = pd.DataFrame({
            "event_id": rng.permutation(n).astype("int64"),
            "user_id": rng.integers(0, 25, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 ** 6, n), unit="s"),
        })
        got = out_of_order_stats(
            ray.data.from_pandas(df).repartition(9), num_buckets=8)
        for uid, g in df.sort_values(["user_id", "event_id"]) \
                        .groupby("user_id"):
            us = g["ts"].astype("datetime64[us]").astype("int64") \
                .to_numpy()
            wm = np.maximum.accumulate(us)
            late = np.maximum(wm[:-1] - us[1:], 0)
            row = got[got["user_id"] == uid].iloc[0]
            assert row["n_events"] == len(g)
            assert row["n_late"] == int((late > 0).sum())
            assert row["max_late_us"] == (int(late.max())
                                          if len(late) else 0)

    def test_fully_ordered_has_no_late(self):
        n = 300
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.arange(n, dtype="int64") % 5,
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
        })
        got = out_of_order_stats(ray.data.from_pandas(df).repartition(4))
        assert (got["n_late"] == 0).all()
        assert (got["max_late_us"] == 0).all()

    def test_single_swap_lateness(self):
        # events at t=0,10,5 arriving in that order: one late by 5 s
        df = pd.DataFrame({
            "event_id": np.int64([0, 1, 2]),
            "user_id": np.int64([7, 7, 7]),
            "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                  "2024-01-01 00:00:10",
                                  "2024-01-01 00:00:05"]),
        })
        got = out_of_order_stats(ray.data.from_pandas(df))
        assert got.iloc[0]["n_late"] == 1
        assert got.iloc[0]["max_late_us"] == 5_000_000

    def test_partition_invariant(self):
        rng = np.random.default_rng(13)
        n = 800
        df = pd.DataFrame({
            "event_id": rng.permutation(n).astype("int64"),
            "user_id": rng.integers(0, 10, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 ** 5, n), unit="s"),
        })
        a = out_of_order_stats(ray.data.from_pandas(df).repartition(1),
                               num_buckets=4)
        b = out_of_order_stats(ray.data.from_pandas(df).repartition(13),
                               num_buckets=32)
        pd.testing.assert_frame_equal(a, b)
