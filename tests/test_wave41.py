"""Wave-41 conformance: bottom-k KMV sketch (with ground truth),
distributed Merkle tree, held-out bigram perplexity."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestBottomKJaccard:
    def test_sequential_oracle_and_estimator_sanity(self, ray_session):
        from web2llmstxt_ray.ops.sketch import bottomk_jaccard

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source", "text"])
        out = bottomk_jaccard(rd.from_arrow(docs).repartition(8), k=32)
        df = docs.to_pandas()
        tok = re.compile(r"[a-z0-9]+")
        sets: dict = {}
        for s, t in zip(df["source"], df["text"]):
            sets.setdefault(s, set()).update(tok.findall(t.lower()))
        for _, r in out.iterrows():
            a, b = sets[r["group_a"]], sets[r["group_b"]]
            it, un = len(a & b), len(a | b)
            assert int(r["inter"]) == it and int(r["uni"]) == un
            assert r["jaccard_exact"] == it / un
            ha = sorted(hashlib.md5(w.encode()).hexdigest()
                        for w in a)[:32]
            hb = sorted(hashlib.md5(w.encode()).hexdigest()
                        for w in b)[:32]
            ub = sorted(set(ha) | set(hb))[:32]
            en = sum(1 for h in ub if h in set(ha) and h in set(hb))
            assert int(r["est_num"]) == en
        # with vocab ≈ sketch size the estimator should be near-exact
        assert out["abs_err"].mean() < 0.2

    def test_identical_groups_estimate_one(self, ray_session):
        from web2llmstxt_ray.ops.sketch import bottomk_jaccard

        d = pd.DataFrame({"source": ["a", "b"],
                          "text": ["x y z common words here"] * 2})
        out = bottomk_jaccard(rd.from_pandas(d), k=8)
        assert out["jaccard_est"].tolist() == [1.0]
        assert out["jaccard_exact"].tolist() == [1.0]


class TestMerkle:
    def _reference(self, keys, cents, emit_max=16):
        nodes = [hashlib.md5(f"{k}:{c}".encode()).hexdigest()
                 for k, c in sorted(zip(keys, cents))]
        n = len(nodes)
        level = 0
        levels = {0: nodes}
        while len(nodes) > 1:
            nxt = []
            for i in range(0, len(nodes) - 1, 2):
                nxt.append(hashlib.md5(
                    (nodes[i] + nodes[i + 1]).encode()).hexdigest())
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
            level += 1
            levels[level] = nodes
        l0 = 0
        while (n + (1 << l0) - 1) >> l0 > emit_max:
            l0 += 4
        return {(lv, i): h for lv, ns in levels.items() if lv >= l0
                for i, h in enumerate(ns)}

    def test_equals_reference_and_partition_invariance(self,
                                                       ray_session):
        from web2llmstxt_ray.ops.validate import merkle_levels

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice"])
        df = orders.to_pandas()
        cents = np.rint(df["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        expect = self._reference(df["o_orderkey"].astype(int).tolist(),
                                 cents.tolist())
        out = merkle_levels(rd.from_arrow(orders).repartition(9))
        got = {(int(r["level"]), int(r["idx"])): r["node_hash"]
               for _, r in out.iterrows()}
        assert got == expect
        again = merkle_levels(rd.from_arrow(orders).repartition(3))
        got2 = {(int(r["level"]), int(r["idx"])): r["node_hash"]
                for _, r in again.iterrows()}
        assert got2 == expect

    def test_detects_single_value_change(self, ray_session):
        from web2llmstxt_ray.ops.validate import merkle_levels

        df = pd.DataFrame({"o_orderkey": range(100),
                           "o_totalprice": [10.0] * 100})
        a = merkle_levels(rd.from_pandas(df))
        df2 = df.copy()
        df2.loc[41, "o_totalprice"] = 10.01
        b = merkle_levels(rd.from_pandas(df2))
        ra = a[a["level"] == a["level"].max()]["node_hash"].iloc[0]
        rb = b[b["level"] == b["level"].max()]["node_hash"].iloc[0]
        assert ra != rb
        # divergence localizes: only the ancestor path differs
        m = a.merge(b, on=["level", "idx"])
        diff = m[m["node_hash_x"] != m["node_hash_y"]]
        assert 1 <= len(diff) <= a["level"].nunique()

    def test_duplicate_keys_rejected(self, ray_session):
        import pytest

        from web2llmstxt_ray.ops.validate import merkle_levels

        df = pd.DataFrame({"o_orderkey": [1, 1, 2],
                           "o_totalprice": [1.0, 2.0, 3.0]})
        with pytest.raises(Exception, match="unique"):
            merkle_levels(rd.from_pandas(df))


class TestLmHeldout:
    def test_sequential_replay_and_smoothing_fires(self, ray_session):
        from web2llmstxt_ray.ops.lm import lm_heldout_ppl

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        out = lm_heldout_ppl(rd.from_arrow(docs).repartition(8))
        df = docs.to_pandas()
        tok = re.compile(r"[a-z0-9]+")
        c2: dict = {}
        c1: dict = {}
        vocab = set()
        for did, t in zip(df["doc_id"].astype(int), df["text"]):
            ts = tok.findall(t.lower())
            if did % 5 != 0:
                for p, w in zip(ts, ts[1:]):
                    c2[(p, w)] = c2.get((p, w), 0) + 1
                    c1[p] = c1.get(p, 0) + 1
                    vocab.add(p)
                    vocab.add(w)
        V = len(vocab)
        held = df[df["doc_id"] % 5 == 0]
        assert len(out) == len(held)
        for _, row in held.iterrows():
            ts = tok.findall(row["text"].lower())
            s = 0.0
            unseen = 0
            for p, w in zip(ts, ts[1:]):
                cv = c2.get((p, w), 0)
                unseen += cv == 0
                s += math.log2((cv + 0.5) / (c1.get(p, 0) + 0.5 * V))
            r = out[out["doc_id"] == row["doc_id"]].iloc[0]
            assert int(r["n_bigrams"]) == len(ts) - 1
            assert int(r["n_unseen_bigrams"]) == unseen
            assert abs(r["logprob_sum"] - s) < 1e-9
            assert abs(r["ppl"] - 2.0 ** (-s / (len(ts) - 1))) < 1e-9

    def test_unseen_bigram_smoothing_fires(self, ray_session):
        """The tiny synthetic vocab covers every held-out bigram, so
        plant a genuinely novel pair to prove the smoothing branch."""
        from web2llmstxt_ray.ops.lm import lm_heldout_ppl

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 5],         # 5 is held out (≡0 mod 5)
            "text": ["alpha beta gamma", "beta gamma alpha",
                     "gamma alpha beta", "alpha gamma zzz beta"]})
        out = lm_heldout_ppl(rd.from_pandas(docs))
        r = out.iloc[0]
        # all three bigrams unseen; "zzz" even lacks a context count
        assert int(r["n_unseen_bigrams"]) == 3
        V = 3
        exp = (math.log2(0.5 / (2 + 0.5 * V))           # alpha gamma
               + math.log2(0.5 / (2 + 0.5 * V))         # gamma zzz
               + math.log2(0.5 / (0 + 0.5 * V)))        # zzz beta
        assert abs(r["logprob_sum"] - exp) < 1e-12
