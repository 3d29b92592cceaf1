"""Wave-43 conformance: Pareto layers (Mirsky == peeling), similarity-
graph transitivity, Huffman optimality, Simpson's-paradox flags."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestParetoLayers:
    def test_equals_peeling_bruteforce(self, ray_session):
        from web2llmstxt_ray.ops.relational import pareto_layers

        part = pq.read_table(
            f"{SF}/part.parquet",
            columns=["p_partkey", "p_retailprice", "p_size"])
        df = part.to_pandas()
        x = df["p_retailprice"].to_numpy()
        y = df["p_size"].to_numpy()
        n = len(df)
        # iterative skyline peeling (the definition)
        remaining = np.ones(n, dtype=bool)
        peel = np.zeros(n, dtype=np.int64)
        lvl = 0
        while remaining.any():
            lvl += 1
            idx = np.nonzero(remaining)[0]
            sky = []
            for i in idx:
                dominated = ((x[idx] < x[i]) & (y[idx] < y[i])).any()
                if not dominated:
                    sky.append(i)
            peel[sky] = lvl
            remaining[sky] = False
        got = pareto_layers(rd.from_arrow(part).repartition(4),
                            "p_partkey", "p_retailprice", "p_size",
                            y_domain=64)
        ref = pd.DataFrame({"p_partkey": df["p_partkey"],
                            "layer": peel}).sort_values("p_partkey")
        assert got["layer"].tolist() == ref["layer"].tolist()
        assert got["layer"].min() == 1


class TestTransitivity:
    def test_counts_bruteforce(self, ray_session):
        from web2llmstxt_ray.ops.dedup import pair_transitivity

        pairs = pd.DataFrame({"a": [1, 1, 2, 4, 5],
                              "b": [2, 3, 3, 5, 6]})
        out = pair_transitivity(pairs).iloc[0]
        # triangle {1,2,3}; wedges: 1:(2,3) 2:(1,3) 3:(1,2) 5:(4,6)
        assert int(out["n_triangles"]) == 1
        assert int(out["n_wedges"]) == 4
        assert out["transitivity"] == 3.0 * 1 / 4
        assert int(out["n_nodes"]) == 6
        assert int(out["n_pairs"]) == 5

    def test_snm_graph_statistic(self, ray_session):
        from web2llmstxt_ray.ops.dedup import (pair_transitivity,
                                               snm_pairs)

        docs = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text", "n_chars"])
        pairs = snm_pairs(rd.from_arrow(docs), window=5, threshold=0.8)
        out = pair_transitivity(pairs).iloc[0]
        assert 0.0 <= out["transitivity"] <= 1.0
        # independent wedge count
        deg = pd.concat([pairs["a"], pairs["b"]]).value_counts()
        assert int(out["n_wedges"]) == int(
            (deg * (deg - 1) // 2).sum())


class TestHuffman:
    def test_optimality_vs_all_codes(self, ray_session):
        """Huffman lengths satisfy Kraft equality and beat/equal every
        other prefix code's weighted length (checked against all
        length assignments satisfying Kraft for 5 symbols)."""
        from web2llmstxt_ray.ops.lm import huffman_lengths

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type"])
        out = huffman_lengths(rd.from_arrow(ev).repartition(4))
        lens = out["code_len"].tolist()
        ns = out["n"].tolist()
        assert sum(2.0 ** -l for l in lens) <= 1.0 + 1e-12
        total = int(out["weighted_bits"].sum())
        # exhaustive Kraft-feasible length profiles for 5 symbols
        best = None
        for ls in itertools.product(range(1, 6), repeat=5):
            if sum(2.0 ** -l for l in ls) <= 1.0 + 1e-12:
                w = sum(n * l for n, l in zip(ns, ls))
                best = w if best is None or w < best else best
        assert total == best
        # entropy lower bound in bits
        ent = out["entropy_bits"].sum()
        assert ent <= total <= ent + sum(ns)   # H ≤ L < H+1 per sym

    def test_skewed_counts_shape(self, ray_session):
        from web2llmstxt_ray.ops.lm import huffman_lengths

        ev = pd.DataFrame({"event_type":
                           ["a"] * 50 + ["b"] * 20 + ["c"] * 20
                           + ["d"] * 5 + ["e"] * 5})
        out = huffman_lengths(rd.from_pandas(ev)).set_index("symbol")
        assert out.loc["a", "code_len"] < out.loc["d", "code_len"]
        assert out.loc["d", "code_len"] == out.loc["e", "code_len"]


class TestSimpson:
    def test_integer_sign_and_sequential(self, ray_session):
        from web2llmstxt_ray.ops.stats import simpson_flags

        # planted paradox: within each group slope negative, pooled
        # positive (classic)
        rows = []
        for g, x0, y0 in (("A", 0, 0), ("B", 10, 30)):
            for i in range(10):
                rows.append((g, x0 + i, y0 - 2 * i))
        df = pd.DataFrame(rows, columns=["p_brand", "l_quantity",
                                         "l_discount"])
        df["l_discount"] = df["l_discount"] / 100.0
        out = simpson_flags(rd.from_pandas(df))
        assert out["flipped"].all()             # both groups flip
        assert (out["slope_num"] < 0).all()
        assert out["pooled_slope"].iloc[0] > 0

    def test_sf_data_consistency(self, ray_session):
        from web2llmstxt_ray.ops.stats import simpson_flags

        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_discount"]
        ).to_pandas()
        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_brand"]
                             ).to_pandas()
        joined = li.merge(part, left_on="l_partkey",
                          right_on="p_partkey")
        out = simpson_flags(rd.from_pandas(
            joined[["p_brand", "l_quantity", "l_discount"]]
        ).repartition(8))
        # sign(slope) must equal sign(slope_num) exactly
        for _, r in out.iterrows():
            if r["slope_num"] != 0:
                assert math.copysign(1, r["slope"]) == \
                    math.copysign(1, r["slope_num"])
            assert r["flipped"] == ((r["slope_num"] > 0 >
                                     np.sign(r["pooled_slope"]))
                                    or (r["slope_num"] < 0 <
                                        np.sign(r["pooled_slope"])))
