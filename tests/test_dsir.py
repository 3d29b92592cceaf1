"""DSIR importance resampling: sequential oracle for the hashed-n-gram
log-weights, partition invariance, Gumbel top-k selection behavior."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from web2llmstxt_ray.functions.urls import hash64
from web2llmstxt_ray.ops.dsir import (
    dsir_logweights, dsir_sample, hashed_ngram_counts, log_ratio)

_MASK = (1 << 64) - 1
_PRIME = 0x100000001B3


def _seq_buckets(text, num_buckets):
    """Sequential reference: per-doc bucket list in accumulation order
    (all unigrams in token order, then all bigrams in token order) —
    mirrors the vectorized path bit-for-bit."""
    toks = (text or "").lower().split()
    hs = [hash64(w) for w in toks]
    uni = [h % num_buckets for h in hs]
    bi = [(((hs[i] * _PRIME) & _MASK) ^ hs[i + 1]) % num_buckets
          for i in range(len(hs) - 1)]
    return uni + bi


def _corpus(n=60, seed=7):
    rng = np.random.RandomState(seed)
    sci = ["quantum", "tensor", "manifold", "operator", "lemma"]
    web = ["click", "subscribe", "deal", "buy", "free"]
    texts, kinds = [], []
    for i in range(n):
        kind = "sci" if i % 2 == 0 else "web"
        vocab = sci if kind == "sci" else web
        texts.append(" ".join(rng.choice(vocab, size=rng.randint(8, 25))))
        kinds.append(kind)
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts),
                     "kind": pa.array(kinds)})


class TestCountsAndWeights:
    B = 512

    def test_counts_match_sequential(self):
        t = _corpus()
        ds = ray.data.from_arrow(t).repartition(5)
        got = hashed_ngram_counts(ds, self.B)
        want = Counter()
        for txt in t.column("text").to_pylist():
            want.update(_seq_buckets(txt, self.B))
        exp = np.zeros(self.B, dtype=np.int64)
        for b, c in want.items():
            exp[b] = c
        assert (got == exp).all()

    def test_logweights_match_sequential(self):
        t = _corpus()
        ds = ray.data.from_arrow(t).repartition(4)
        tc = hashed_ngram_counts(ds, self.B)
        lam = log_ratio(tc, tc * 2 + 1)
        got = {r["doc_id"]: r["logw"]
               for r in dsir_logweights(ds, lam).take_all()}
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            want = 0.0
            for b in _seq_buckets(txt, self.B):
                want += lam[b]
            assert got[did] == pytest.approx(want, rel=0, abs=1e-12), did

    def test_partition_invariance(self):
        t = _corpus()
        a = ray.data.from_arrow(t).repartition(1)
        b = ray.data.from_arrow(t).repartition(9)
        tc = hashed_ngram_counts(a, self.B)
        assert (tc == hashed_ngram_counts(b, self.B)).all()
        lam = log_ratio(tc, tc + 3)
        wa = sorted(dsir_logweights(a, lam).take_all(),
                    key=lambda r: r["doc_id"])
        wb = sorted(dsir_logweights(b, lam).take_all(),
                    key=lambda r: r["doc_id"])
        assert [r["logw"] for r in wa] == [r["logw"] for r in wb]


class TestSample:
    def test_selects_target_like_docs(self):
        t = _corpus(n=120)
        ds = ray.data.from_arrow(t)
        import pyarrow.compute as pc

        target_tbl = t.filter(pc.equal(t.column("kind"), "sci"))
        target = ray.data.from_arrow(
            target_tbl.select(["doc_id", "text"]))
        out = dsir_sample(ds.select_columns(["doc_id", "text"]), target,
                          k=20, num_buckets=512, seed=3)
        assert out.num_rows == 20
        assert out.column("rank").to_pylist() == list(range(1, 21))
        # 'sci' docs are even ids; the sci-trained weights should
        # dominate the selection despite Gumbel noise
        sel = out.column("doc_id").to_pylist()
        assert sum(1 for i in sel if i % 2 == 0) >= 16

    def test_deterministic_and_seed_sensitive(self):
        t = _corpus(n=80)
        ds = ray.data.from_arrow(t).select_columns(["doc_id", "text"])
        target = ray.data.from_arrow(t.slice(0, 10)).select_columns(
            ["doc_id", "text"])
        a = dsir_sample(ds, target, k=10, num_buckets=256, seed=1)
        b = dsir_sample(ray.data.from_arrow(t).repartition(6)
                        .select_columns(["doc_id", "text"]),
                        target, k=10, num_buckets=256, seed=1)
        assert a.equals(b)          # partitioning-independent
        # seed sensitivity needs weights that don't drown the noise:
        # target == raw → λ = 0 → logw = 0 → pure Gumbel permutation
        c = dsir_sample(ds, ds, k=10, num_buckets=256, seed=2)
        d = dsir_sample(ds, ds, k=10, num_buckets=256, seed=3)
        assert (c.column("doc_id").to_pylist()
                != d.column("doc_id").to_pylist())
