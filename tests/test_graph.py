"""Distributed connected components (alternating star contraction) —
verified against a sequential union-find oracle, plus the fully
distributed minhash clustering tier built on it."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops import dedup as D
from web2llmstxt_ray.ops.graph import connected_components


def _uf_oracle(pairs):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _pairs_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    }))


def _cc_dict(pairs, **kw):
    # exercise BOTH execution tiers: the small-edge driver union-find
    # (default threshold) and the distributed star contraction
    # (driver_threshold=0) must agree exactly
    results = []
    for thresh in (1_000_000, 0):
        out = connected_components(_pairs_ds(pairs),
                                   driver_threshold=thresh,
                                   **kw).take_all()
        got = {r["node"]: r["component"] for r in out}
        assert len(got) == len(out), "duplicate node rows emitted"
        results.append(got)
    assert results[0] == results[1], "driver/distributed tier mismatch"
    return results[0]


class TestConnectedComponents:
    def test_long_chain_multiple_rounds(self):
        # a 150-node path needs several contraction rounds — the case
        # naive one-hop propagation gets wrong / slow
        pairs = [(i, i + 1) for i in range(150)]
        assert _cc_dict(pairs, num_buckets=8) == _uf_oracle(pairs)

    def test_random_clusters(self):
        rng = random.Random(11)
        pairs = []
        for _ in range(40):
            nodes = rng.sample(range(100000), rng.randint(2, 30))
            for i in range(len(nodes) - 1):
                pairs.append((nodes[rng.randint(0, i)], nodes[i + 1]))
        rng.shuffle(pairs)
        assert _cc_dict(pairs, num_buckets=16) == _uf_oracle(pairs)

    def test_self_loops_and_duplicates(self):
        pairs = [(1, 1), (2, 3), (3, 2), (2, 3), (4, 5), (5, 6), (6, 4)]
        got = _cc_dict(pairs)
        assert got == {2: 2, 3: 2, 4: 4, 5: 4, 6: 4}

    def test_star_already(self):
        pairs = [(10, 11), (10, 12), (10, 13)]
        assert _cc_dict(pairs) == {10: 10, 11: 10, 12: 10, 13: 10}

    def test_empty(self):
        assert _cc_dict([]) == {}

    def test_bucket_count_invariance(self):
        pairs = [(i, i + 3) for i in range(0, 90)]
        assert _cc_dict(pairs, num_buckets=4) == \
            _cc_dict(pairs, num_buckets=32)


class TestMinhashClustersScale:
    def _corpus(self):
        rng = random.Random(5)
        words = [f"tok{i}" for i in range(400)]
        rows = {"doc_id": [], "text": []}
        did = 0
        for g in range(12):
            base = " ".join(rng.choices(words, k=80))
            rows["doc_id"].append(did)
            rows["text"].append(base)
            did += 1
            for _ in range(rng.randint(1, 3)):   # true near-dups
                toks = base.split()
                toks[rng.randrange(len(toks))] = rng.choice(words)
                rows["doc_id"].append(did)
                rows["text"].append(" ".join(toks))
                did += 1
        return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "text": rows["text"]})

    def test_matches_exact_tier_on_high_precision_corpus(self):
        """On a corpus whose LSH candidates are all true near-dups
        (planted ≥0.97-Jaccard groups, unrelated docs far below any
        band-collision odds), the LSH-precision scale tier must equal
        the exact-verify tier's clustering."""
        tbl = self._corpus()
        ds = ray.data.from_arrow(tbl)

        exact = {r["doc_id"]: r["cluster_id"]
                 for r in D.minhash_dedup(ds, jaccard_threshold=0.7).take_all()}
        scale = {r["node"]: r["component"]
                 for r in D.minhash_clusters_scale(ds).take_all()}
        # scale tier emits only docs in some candidate pair; fill
        # singletons with identity to compare like-for-like
        for i in exact:
            scale.setdefault(i, i)
        assert scale == exact

    def test_no_corpus_sized_driver_state(self):
        """The pairs stay a Dataset: candidate generation feeding the
        scale tier returns ray.data.Dataset, not a list."""
        ds = ray.data.from_arrow(self._corpus())
        pairs = D.minhash_candidate_pairs(ds)
        assert isinstance(pairs, ray.data.Dataset)


class TestPageRank:
    def _seq_oracle(self, pairs, iters=3, num=85, den=100,
                    scale=10 ** 12):
        edges = sorted(set(pairs))
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        n = len(nodes)
        base = ((den - num) * scale) // den // n
        r = {v: scale // n for v in nodes}
        for _ in range(iters):
            inflow = {v: 0 for v in nodes}
            for u, v in edges:
                inflow[v] += (num * r[u]) // (den * deg[u])
            r = {v: base + inflow[v] for v in nodes}
        return r

    def _run(self, pairs, reps=5, **kw):
        import pyarrow as pa
        import ray.data

        from web2llmstxt_ray.ops.graph import pagerank

        t = pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                      "dst": pa.array([p[1] for p in pairs], pa.int64())})
        ds = ray.data.from_arrow(t).repartition(reps)
        out = pagerank(ds, **kw).to_pandas()
        return dict(zip(out["node"], out["r"]))

    def test_matches_sequential_oracle(self):
        rng = np.random.RandomState(3)
        pairs = [(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
                 for _ in range(300)]
        pairs = [(u, v) for u, v in pairs if u != v]
        got = self._run(pairs, num_buckets=8)
        want = self._seq_oracle(pairs)
        assert got == want

    def test_multi_edges_deduped_and_partition_invariant(self):
        pairs = [(1, 2), (1, 2), (2, 3), (3, 1), (1, 4), (4, 2)]
        a = self._run(pairs, reps=1, num_buckets=4)
        b = self._run(pairs, reps=6, num_buckets=16)
        assert a == b == self._seq_oracle(pairs)

    def test_mass_conservation_bound(self):
        # total rank ≤ scale (dangling + floor loss only shrink mass)
        rng = np.random.RandomState(9)
        pairs = [(int(rng.randint(0, 30)), int(rng.randint(30, 60)))
                 for _ in range(120)]
        got = self._run(pairs, num_buckets=8)
        assert 0 < sum(got.values()) <= 10 ** 12


class TestHitsBipartite:
    @staticmethod
    def _sequential(edges, iters=4, scale=10 ** 9):
        """Bit-exact integer replay of the distributed recurrence."""
        import collections
        E = sorted(set(edges))
        srcs = sorted({s for s, _ in E})
        h = {s: scale for s in srcs}
        a = {}
        for _ in range(iters):
            a = collections.defaultdict(int)
            for s, d in E:
                a[d] += h[s]
            m = max(a.values())
            a = {k: v * scale // m for k, v in a.items()}
            h = collections.defaultdict(int)
            for s, d in E:
                h[s] += a[d]
            m = max(h.values())
            h = {k: v * scale // m for k, v in h.items()}
        return dict(h), dict(a)

    def _edges_df(self, seed=81, n=400):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "src": rng.integers(0, 25, n).astype("int64"),
            "dst": rng.integers(100, 160, n).astype("int64")})

    def test_matches_sequential_integer_replay(self):
        from web2llmstxt_ray.ops.graph import hits_bipartite
        df = self._edges_df()
        out = hits_bipartite(ray.data.from_pandas(df).repartition(6),
                             iters=3)
        h, a = self._sequential(
            list(zip(df["src"], df["dst"])), iters=3)
        got_h = out[out["side"] == "hub"].set_index("node")["score"]
        got_a = out[out["side"] == "authority"] \
            .set_index("node")["score"]
        assert got_h.to_dict() == h
        assert got_a.to_dict() == a

    def test_partition_invariance(self):
        from web2llmstxt_ray.ops.graph import hits_bipartite
        df = self._edges_df(seed=83)
        one = hits_bipartite(ray.data.from_pandas(df), iters=2)
        many = hits_bipartite(
            ray.data.from_pandas(df).repartition(9), iters=2)
        pd.testing.assert_frame_equal(one, many)

    def test_planted_authority_wins(self):
        from web2llmstxt_ray.ops.graph import hits_bipartite
        # every hub points at doc 500; other docs get one link each
        rows = [(s, 500) for s in range(10)] + \
            [(s, 600 + s) for s in range(10)]
        df = pd.DataFrame(rows, columns=["src", "dst"]) \
            .astype("int64")
        out = hits_bipartite(ray.data.from_pandas(df), iters=4)
        auth = out[out["side"] == "authority"]
        top = auth.loc[auth["score"].idxmax(), "node"]
        assert top == 500
        assert auth.set_index("node").loc[500, "score"] == 10 ** 9

    def test_as_dataset_parity(self):
        from web2llmstxt_ray.ops.graph import hits_bipartite
        df = self._edges_df(seed=85, n=120)
        coll = hits_bipartite(ray.data.from_pandas(df), iters=2)
        ds = hits_bipartite(ray.data.from_pandas(df), iters=2,
                            as_dataset=True).to_pandas()
        ds = ds.sort_values(["side", "node"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(coll, ds[coll.columns.tolist()])
