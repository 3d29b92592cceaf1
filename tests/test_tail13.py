"""Edge-case tests for the fifteenth-wave operators (rendezvous-hash
assignment, duplicate rate by group, Heaps'-law curve)."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.corpus import heaps_curve
from web2llmstxt_ray.ops.dedup import dup_rate_by_group
from web2llmstxt_ray.ops.layout import hrw_assignment


class TestHrwAssignment:
    def _ref(self, keys, n_shards):
        counts = [0] * n_shards
        for k in set(keys):
            best, best_h = 0, ""
            for s in range(n_shards):
                h = hashlib.md5(f"{k}|{s}".encode()).hexdigest()
                if h > best_h:
                    best, best_h = s, h
            counts[best] += 1
        return counts

    def test_matches_reference(self):
        keys = [f"host{i}.example" for i in range(200)]
        df = pd.DataFrame({"k": keys})
        got = hrw_assignment(ray.data.from_pandas(df).repartition(5),
                             key_col="k", num_shards=8)
        assert got["n_keys"].tolist() == self._ref(keys, 8)
        assert got["shard"].tolist() == list(range(8))

    def test_duplicate_keys_count_once(self):
        df = pd.DataFrame({"k": ["a", "a", "b", "b", "b"]})
        got = hrw_assignment(ray.data.from_pandas(df), key_col="k",
                             num_shards=4)
        assert int(got["n_keys"].sum()) == 2

    def test_empty_shards_reported_zero(self):
        df = pd.DataFrame({"k": ["only-one-key"]})
        got = hrw_assignment(ray.data.from_pandas(df), key_col="k",
                             num_shards=16)
        assert len(got) == 16
        assert int(got["n_keys"].sum()) == 1
        assert (got["n_keys"] == 0).sum() == 15


class TestDupRateByGroup:
    def test_hand_fixture(self):
        df = pd.DataFrame({
            "source": ["s1", "s1", "s2", "s2"],
            "text": ["same", "uniq1", "same", "uniq2"]})
        got = dup_rate_by_group(ray.data.from_pandas(df),
                                num_buckets=4)
        # "same" occurs twice corpus-wide → one dup doc per source
        assert got["n_docs"].tolist() == [2, 2]
        assert got["n_dup_docs"].tolist() == [1, 1]
        np.testing.assert_allclose(got["dup_rate"], [0.5, 0.5])

    def test_within_group_duplicates(self):
        df = pd.DataFrame({"source": ["a"] * 3,
                           "text": ["x", "x", "y"]})
        got = dup_rate_by_group(ray.data.from_pandas(df),
                                num_buckets=4)
        assert int(got.loc[0, "n_dup_docs"]) == 2

    def test_no_duplicates(self):
        df = pd.DataFrame({"source": ["a", "b"],
                           "text": ["p", "q"]})
        got = dup_rate_by_group(ray.data.from_pandas(df),
                                num_buckets=4)
        assert (got["dup_rate"] == 0).all()

    def test_partition_invariant(self):
        rng = np.random.default_rng(2)
        df = pd.DataFrame({
            "source": rng.choice(["a", "b", "c"], 300),
            "text": [f"t{i}" for i in rng.integers(0, 100, 300)]})
        x = dup_rate_by_group(ray.data.from_pandas(df)
                              .repartition(1), num_buckets=4)
        y = dup_rate_by_group(ray.data.from_pandas(df)
                              .repartition(9), num_buckets=16)
        pd.testing.assert_frame_equal(x, y)


class TestHeapsCurve:
    def test_hand_fixture(self):
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a b", "a c", "   "]})
        got = heaps_curve(ray.data.from_pandas(df), num_buckets=4)
        # blank doc 3 excluded; doc1: 2 tokens 2 new; doc2: 2 tokens,
        # 1 new ("c")
        assert got["doc_id"].tolist() == [1, 2]
        assert got["n_tokens_cum"].tolist() == [2, 4]
        assert got["vocab_cum"].tolist() == [2, 3]

    def test_final_vocab_is_corpus_distinct(self):
        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(words, rng.integers(1, 15)))
                 for _ in range(50)]
        df = pd.DataFrame({"doc_id": range(50), "text": texts})
        got = heaps_curve(ray.data.from_pandas(df).repartition(7),
                          num_buckets=8)
        all_tokens = [w for t in texts for w in t.lower().split()]
        assert int(got["n_tokens_cum"].iloc[-1]) == len(all_tokens)
        assert int(got["vocab_cum"].iloc[-1]) == len(set(all_tokens))
        # both curves are monotone non-decreasing
        assert (np.diff(got["n_tokens_cum"]) >= 0).all()
        assert (np.diff(got["vocab_cum"]) >= 0).all()

    def test_repeated_doc_adds_tokens_not_vocab(self):
        df = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["x y z", "x y z"]})
        got = heaps_curve(ray.data.from_pandas(df), num_buckets=4)
        assert got["n_tokens_cum"].tolist() == [3, 6]
        assert got["vocab_cum"].tolist() == [3, 3]
