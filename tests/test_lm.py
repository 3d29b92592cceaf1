"""Char-n-gram LM quality scoring — sequential-oracle and invariance
tests for ops/lm.py."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.lm import (
    CharLM, _doc_ngrams, perplexity_scores, train_char_lm)

ENGLISH = [
    "the quick brown fox jumps over the lazy dog",
    "a journey of a thousand miles begins with a single step",
    "to be or not to be that is the question",
    "all that glitters is not gold",
    "the early bird catches the worm every single morning",
    "practice makes perfect and perfect needs practice",
    "actions speak louder than words in the long run",
    "the pen is mightier than the sword they say",
] * 3


def _corpus(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _train_sequential(texts, n=3, add_k=0.1):
    ctx_counts: dict = {}
    uni: Counter = Counter()
    for t in texts:
        uni.update(t)
        for ctx, ch in _doc_ngrams(t, n):
            ctx_counts.setdefault(ctx, Counter())[ch] += 1
    return CharLM(n, {k: dict(v) for k, v in ctx_counts.items()},
                  dict(uni), add_k=add_k)


class TestTrain:
    def test_unpruned_equals_sequential(self):
        ds = ray.data.from_arrow(_corpus(ENGLISH)).repartition(5)
        got = train_char_lm(ds, n=3, max_contexts=10**6)
        want = _train_sequential(ENGLISH, n=3)
        assert got.contexts == want.contexts
        assert got.unigram == want.unigram

    def test_partition_invariance_unpruned(self):
        a = train_char_lm(ray.data.from_arrow(_corpus(ENGLISH))
                          .repartition(2), max_contexts=10**6)
        b = train_char_lm(ray.data.from_arrow(_corpus(ENGLISH))
                          .repartition(9), max_contexts=10**6)
        assert a.contexts == b.contexts
        assert a.unigram == b.unigram

    def test_pruning_keeps_top_contexts(self):
        ds = ray.data.from_arrow(_corpus(ENGLISH)).repartition(3)
        full = train_char_lm(ds, max_contexts=10**6)
        pruned = train_char_lm(ds, max_contexts=20)
        assert len(pruned.contexts) == 20
        # every kept context is at least as frequent as every dropped one
        totals = {c: sum(v.values()) for c, v in full.contexts.items()}
        kept_min = min(totals[c] for c in pruned.contexts)
        dropped = set(full.contexts) - set(pruned.contexts)
        assert all(totals[c] <= kept_min for c in dropped)


class TestScore:
    def test_matches_sequential_oracle(self):
        model = _train_sequential(ENGLISH)
        ds = ray.data.from_arrow(_corpus(ENGLISH[:8])).repartition(3)
        got = perplexity_scores(ds, model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = [model.doc_log2_ppl(t) for t in ENGLISH[:8]]
        assert np.allclose(got["log2_ppl"].to_numpy(), want, atol=0)

    def test_in_domain_beats_gibberish(self):
        model = _train_sequential(ENGLISH)
        texts = ["the quick brown fox jumps over fences",
                 "zxqj wvk pfh qqq xjz zzyx wqp jjj"]
        ds = ray.data.from_arrow(_corpus(texts))
        out = perplexity_scores(ds, model).to_pandas() \
            .sort_values("doc_id")
        assert out["log2_ppl"].iloc[0] < out["log2_ppl"].iloc[1] - 2.0

    def test_empty_and_null_text(self):
        model = _train_sequential(ENGLISH)
        tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                        "text": pa.array(["", None], pa.string())})
        out = perplexity_scores(ray.data.from_arrow(tbl), model) \
            .to_pandas().sort_values("doc_id")
        assert (out["log2_ppl"] == 0.0).all()

    def test_probabilities_normalize(self):
        """Smoothed next-char distribution sums to 1 over the vocab for
        both a seen and an unseen context."""
        model = _train_sequential(ENGLISH[:4], n=3, add_k=0.5)
        seen_ctx = next(iter(model.contexts))
        for ctx in (seen_ctx, "ZZ"):
            p = sum(2.0 ** model.log2p(ctx, ch) for ch in model.vocab)
            assert math.isclose(p, 1.0, rel_tol=1e-9)
