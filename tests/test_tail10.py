"""Edge-case tests for the twelfth-wave operators (bounded Bellman-Ford
SSSP, two-hop reach, OOV rate, corpus token entropy)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.corpus import oov_rate, token_entropy
from web2llmstxt_ray.ops.graph import sssp_hops, two_hop_reach


def _sssp_seq(edges, seed, hops):
    """Sequential synchronous (Jacobi) bounded Bellman-Ford."""
    best = {}
    for s, t, w in edges:
        best[(s, t)] = min(best.get((s, t), w), w)
    d = {seed: 0}
    for _ in range(hops):
        cand = {}
        for (s, t), w in best.items():
            if s in d:
                c = d[s] + w
                if c < cand.get(t, c + 1):
                    cand[t] = c
        for t, c in cand.items():
            if c < d.get(t, c + 1):
                d[t] = c
    return d


class TestSsspHops:
    def _rand_edges(self, seed):
        rng = np.random.default_rng(seed)
        n = 300
        return list(zip(rng.integers(0, 40, n).tolist(),
                        rng.integers(0, 40, n).tolist(),
                        rng.integers(1, 10, n).tolist()))

    def test_matches_sequential(self):
        edges = self._rand_edges(3)
        df = pd.DataFrame(edges, columns=["src", "dst", "w"])
        got = sssp_hops(ray.data.from_pandas(df).repartition(5),
                        seed=0, hops=4, num_buckets=8)
        want = _sssp_seq(edges, 0, 4)
        assert dict(zip(got["node"].astype(int),
                        got["dist"].astype(int))) == want

    def test_distributed_path_matches_driver_path(self):
        edges = self._rand_edges(8)
        df = pd.DataFrame(edges, columns=["src", "dst", "w"])
        a = sssp_hops(ray.data.from_pandas(df), seed=1, hops=3,
                      num_buckets=4)
        b = sssp_hops(ray.data.from_pandas(df).repartition(7), seed=1,
                      hops=3, num_buckets=16, driver_threshold=0)
        pd.testing.assert_frame_equal(a, b)

    def test_parallel_edges_take_min_weight(self):
        df = pd.DataFrame({"src": [0, 0], "dst": [1, 1], "w": [9, 2]})
        got = sssp_hops(ray.data.from_pandas(df), seed=0, hops=1)
        m = dict(zip(got["node"].astype(int), got["dist"].astype(int)))
        assert m == {0: 0, 1: 2}

    def test_hop_bound_truncates(self):
        # chain 0→1→2→3 with hops=2: node 3 unreachable
        df = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3],
                           "w": [1, 1, 1]})
        got = sssp_hops(ray.data.from_pandas(df), seed=0, hops=2)
        m = dict(zip(got["node"].astype(int), got["dist"].astype(int)))
        assert m == {0: 0, 1: 1, 2: 2}

    def test_longer_path_can_be_shorter(self):
        # direct 0→2 weight 10 vs 0→1→2 weight 2+3
        df = pd.DataFrame({"src": [0, 0, 1], "dst": [2, 1, 2],
                           "w": [10, 2, 3]})
        got = sssp_hops(ray.data.from_pandas(df), seed=0, hops=3)
        m = dict(zip(got["node"].astype(int), got["dist"].astype(int)))
        assert m[2] == 5


class TestTwoHopReach:
    def test_path_graph(self):
        # 0-1-2: exactly-2 shells are {2} for 0 and {0} for 2; 1 has none
        df = pd.DataFrame({"u": [0, 1], "v": [1, 2]})
        got = two_hop_reach(ray.data.from_pandas(df), num_buckets=4)
        m = dict(zip(got["node"].astype(int),
                     got["n_two_hop"].astype(int)))
        assert m == {0: 1, 2: 1}

    def test_matches_sequential(self):
        rng = np.random.default_rng(6)
        df = pd.DataFrame({"u": rng.integers(0, 30, 150),
                           "v": rng.integers(0, 30, 150)})
        got = two_hop_reach(ray.data.from_pandas(df).repartition(5),
                            num_buckets=8)
        adj: dict[int, set[int]] = {}
        for u, v in zip(df["u"], df["v"]):
            if u == v:
                continue
            adj.setdefault(int(u), set()).add(int(v))
            adj.setdefault(int(v), set()).add(int(u))
        want = {}
        for n, nbrs in adj.items():
            shell = set()
            for w in nbrs:
                shell |= adj[w]
            shell -= nbrs | {n}
            if shell:
                want[n] = len(shell)
        assert dict(zip(got["node"].astype(int),
                        got["n_two_hop"].astype(int))) == want

    def test_triangle_has_no_two_hop(self):
        df = pd.DataFrame({"u": [0, 1, 0], "v": [1, 2, 2]})
        got = two_hop_reach(ray.data.from_pandas(df), num_buckets=4)
        assert len(got) == 0


class TestOovRate:
    def test_small_fixture(self):
        # vocab_k=2 → vocab = {"a", "b"} (a×3, b×2 beat c×1)
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a a b", "A b c", "   "]})
        got = oov_rate(ray.data.from_pandas(df), vocab_k=2,
                       num_buckets=4)
        assert got["doc_id"].tolist() == [1, 2]  # blank doc excluded
        assert got.loc[0, "n_oov"] == 0
        assert got.loc[1, "n_oov"] == 1
        assert abs(got.loc[1, "oov_rate"] - 1 / 3) < 1e-15

    def test_vocab_tiebreak_deterministic(self):
        # equal counts → lexicographic wins the last vocab slot
        df = pd.DataFrame({"doc_id": [1], "text": ["z y z y"]})
        got = oov_rate(ray.data.from_pandas(df), vocab_k=1,
                       num_buckets=4)
        # vocab = {"y"} (2 vs 2, "y" < "z") → two z tokens are OOV
        assert got.loc[0, "n_oov"] == 2


class TestTokenEntropy:
    def test_uniform_is_ln_vocab(self):
        df = pd.DataFrame({"text": ["a b c d"]})
        got = token_entropy(ray.data.from_pandas(df), num_buckets=4)
        assert int(got.loc[0, "vocab_size"]) == 4
        assert abs(got.loc[0, "entropy_nats"] - math.log(4)) < 1e-12
        assert abs(got.loc[0, "perplexity"] - 4.0) < 1e-9

    def test_single_token_zero_entropy(self):
        df = pd.DataFrame({"text": ["x x", "x x x"]})
        got = token_entropy(ray.data.from_pandas(df), num_buckets=4)
        assert int(got.loc[0, "n_tokens"]) == 5
        assert abs(got.loc[0, "entropy_nats"]) < 1e-12
        assert abs(got.loc[0, "perplexity"] - 1.0) < 1e-12

    def test_partition_invariant(self):
        rng = np.random.default_rng(12)
        words = [f"t{i}" for i in range(50)]
        df = pd.DataFrame({"text": [
            " ".join(rng.choice(words, rng.integers(1, 20)))
            for _ in range(200)]})
        a = token_entropy(ray.data.from_pandas(df).repartition(1),
                          num_buckets=4)
        b = token_entropy(ray.data.from_pandas(df).repartition(9),
                          num_buckets=16)
        assert a.loc[0, "n_tokens"] == b.loc[0, "n_tokens"]
        assert a.loc[0, "vocab_size"] == b.loc[0, "vocab_size"]
        assert abs(a.loc[0, "entropy_nats"]
                   - b.loc[0, "entropy_nats"]) < 1e-12
