"""Sparse lexical dot-product similarity join: brute-force oracle,
df-cap semantics, partition invariance."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.retrieval import sparse_dot_pairs


def _docs(n: int = 40, seed: int = 17) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 60)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _oracle(df: pd.DataFrame, max_df: int, min_dot: int) -> dict:
    tf = {r["doc_id"]: Counter(r["text"].lower().split())
          for _, r in df.iterrows()}
    dfreq = Counter(t for c in tf.values() for t in c)
    keep = {t for t, d in dfreq.items() if d <= max_df}
    out = {}
    ids = sorted(tf)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = sum(tf[a][t] * tf[b][t] for t in keep
                      if t in tf[a] and t in tf[b])
            if dot >= min_dot:
                out[(a, b)] = dot
    return out


class TestSparseDotPairs:
    def test_matches_bruteforce(self):
        df = _docs()
        got = sparse_dot_pairs(ray.data.from_pandas(df).repartition(5),
                               max_df=30, min_dot=2).to_pandas()
        want = _oracle(df, 30, 2)
        assert {(r["a"], r["b"]): r["dot"]
                for _, r in got.iterrows()} == want

    def test_df_cap_excludes_stopwords(self):
        # one token in every doc, one rare shared token
        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["stop rare", "stop rare", "stop", "stop"],
        })
        got = sparse_dot_pairs(ray.data.from_pandas(df),
                               max_df=2, min_dot=1).to_pandas()
        # 'stop' (df=4) capped out; only the rare pair survives
        assert [(r["a"], r["b"], r["dot"]) for _, r in got.iterrows()] \
            == [(0, 1, 1)]

    def test_partition_invariant(self):
        df = _docs(30, seed=9)
        outs = []
        for parts in (1, 8):
            got = sparse_dot_pairs(
                ray.data.from_pandas(df).repartition(parts),
                max_df=30, min_dot=1).to_pandas()
            outs.append(sorted(map(tuple, got[["a", "b", "dot"]]
                                   .itertuples(index=False))))
        assert outs[0] == outs[1]
