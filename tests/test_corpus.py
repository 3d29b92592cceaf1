"""Corpus-prep operators: vocabulary top-k, deterministic sampling,
sequence packing (invariants + direct oracles)."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from web2llmstxt_ray.ops.corpus import pack_sequences, sample_mod, top_tokens


def _docs(n=80, seed=3):
    rng = np.random.RandomState(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the",
             "and", "of", "data"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 40)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


class TestTopTokens:
    def test_matches_counter_oracle(self):
        t = _docs()
        ds = ray.data.from_arrow(t).repartition(4)
        got = top_tokens(ds, k=5)
        c = Counter()
        for txt in t.column("text").to_pylist():
            c.update(txt.lower().split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert list(zip(got["token"], got["n"])) == want

    def test_empty_and_null_texts(self):
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["", None, "a a b"], pa.string())})
        got = top_tokens(ray.data.from_arrow(t), k=10)
        assert list(zip(got["token"], got["n"])) == [("a", 2), ("b", 1)]


class TestSampleMod:
    def test_exact_membership(self):
        t = _docs(200)
        out = sample_mod(ray.data.from_arrow(t), "doc_id",
                         modulus=10, keep_below=3).to_pandas()
        assert set(out.doc_id) == {i for i in range(200) if i % 10 < 3}

    def test_deterministic_across_runs(self):
        ds = ray.data.from_arrow(_docs(100)).repartition(5)
        a = sorted(sample_mod(ds, "doc_id").to_pandas().doc_id)
        b = sorted(sample_mod(ds, "doc_id").to_pandas().doc_id)
        assert a == b


class TestPackSequences:
    def _toks(self, n=60, seed=8, big=2):
        rng = np.random.RandomState(seed)
        toks = rng.randint(10, 900, n).tolist()
        for i in range(big):
            toks[i] = 5000   # oversized docs → singleton packs
        return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                         "n_tokens": pa.array(toks, pa.int64())})

    def test_invariants(self):
        t = self._toks()
        toks = dict(zip(t.column("doc_id").to_pylist(),
                        t.column("n_tokens").to_pylist()))
        out = pack_sequences(ray.data.from_arrow(t).repartition(3),
                             max_tokens=2048).take_all()
        seen: list = []
        for p in out:
            ids = list(p["doc_ids"])
            seen.extend(ids)
            assert p["n_docs"] == len(ids)
            assert p["total_tokens"] == sum(toks[i] for i in ids)
            # budget respected unless a single oversized doc
            assert p["total_tokens"] <= 2048 or len(ids) == 1
        assert sorted(seen) == sorted(toks)   # exactly-once cover

    def test_packing_is_tight(self):
        """FFD on uniform sizes should do far better than one doc per
        pack: utilization ≥ 70%."""
        t = self._toks(200, big=0)
        out = pack_sequences(ray.data.from_arrow(t), max_tokens=2048).take_all()
        total = sum(p["total_tokens"] for p in out)
        assert total / (2048 * len(out)) > 0.7

    def test_deterministic(self):
        t = self._toks()
        a = sorted(r["pack_id"] for r in
                   pack_sequences(ray.data.from_arrow(t), 2048).take_all())
        b = sorted(r["pack_id"] for r in
                   pack_sequences(ray.data.from_arrow(t), 2048).take_all())
        assert a == b


class TestTopTokensByGroup:
    def test_matches_counter_oracle(self):
        from web2llmstxt_ray.ops.corpus import top_tokens_by_group

        rng = np.random.RandomState(6)
        vocab = ["alpha", "beta", "gamma", "delta", "the", "and"]
        rows = {"lang": [], "text": []}
        for _ in range(100):
            rows["lang"].append(str(rng.choice(["en", "de"])))
            rows["text"].append(" ".join(rng.choice(vocab, size=20)))
        t = pa.table({"lang": pa.array(rows["lang"]),
                      "text": pa.array(rows["text"])})
        got = top_tokens_by_group(
            ray.data.from_arrow(t).repartition(5), "lang", k=3)
        for g in ("en", "de"):
            c = Counter()
            for lg, txt in zip(rows["lang"], rows["text"]):
                if lg == g:
                    c.update(txt.lower().split())
            want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            sub = got[got.lang == g]
            assert list(zip(sub["token"], sub["n"])) == want, g

    def test_empty_group_col_values(self):
        from web2llmstxt_ray.ops.corpus import top_tokens_by_group

        t = pa.table({"lang": pa.array(["en", "en"]),
                      "text": pa.array(["a b a", None])})
        got = top_tokens_by_group(ray.data.from_arrow(t), "lang", k=5)
        assert list(zip(got["token"], got["n"])) == [("a", 2), ("b", 1)]


class TestEpochShuffle:
    def _ids(self, n=500):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), pa.int64())})
        ).repartition(7)

    def test_permutation_and_sorted(self):
        from web2llmstxt_ray.ops.corpus import epoch_shuffle

        out = epoch_shuffle(self._ids(), seed=3).to_pandas()
        # bijective: every input id appears exactly once
        assert sorted(out["doc_id"]) == list(range(500))
        # distinct keys (A odd => multiplicative permutation mod 2^64)
        assert out["shuffle_key"].nunique() == 500
        # globally sorted output realizes the permutation
        assert out["shuffle_key"].is_monotonic_increasing
        # actually shuffled, not identity-ordered
        assert list(out["doc_id"]) != list(range(500))

    def test_deterministic_and_seed_sensitive(self):
        from web2llmstxt_ray.ops.corpus import epoch_shuffle

        a = epoch_shuffle(self._ids(), seed=1).to_pandas()
        b = epoch_shuffle(self._ids(200), seed=1).to_pandas()
        # same seed => same relative order regardless of partitioning
        sub = a[a.doc_id < 200].reset_index(drop=True)
        assert list(sub["doc_id"]) == list(b["doc_id"])
        c = epoch_shuffle(self._ids(200), seed=2).to_pandas()
        assert list(b["doc_id"]) != list(c["doc_id"])

    def test_matches_int_oracle(self):
        from web2llmstxt_ray.ops.corpus import _SHUFFLE_MULT, epoch_shuffle

        out = epoch_shuffle(self._ids(64), seed=9).to_pandas()
        for did, key in zip(out["doc_id"], out["shuffle_key"]):
            assert int(key) == ((int(did) + 9) * _SHUFFLE_MULT) % (1 << 64)


class TestQuantileThresholdFilter:
    def test_matches_numpy_oracle(self):
        from web2llmstxt_ray.ops.corpus import quantile_threshold_filter

        rng = np.random.RandomState(2)
        vals = rng.randint(10, 500, size=200)
        t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                      "n": pa.array(vals, pa.int64())})
        ds = ray.data.from_arrow(t).repartition(6)
        out = quantile_threshold_filter(ds, "n", 0.75).to_pandas()
        thr = np.sort(vals)[int(np.ceil(0.75 * 200)) - 1]  # nearest-rank
        want = {i for i, v in enumerate(vals) if v >= thr}
        assert set(out["doc_id"]) == want
        lo = quantile_threshold_filter(ds, "n", 0.25, keep="le").to_pandas()
        thr_lo = np.sort(vals)[int(np.ceil(0.25 * 200)) - 1]
        assert set(lo["doc_id"]) == {i for i, v in enumerate(vals)
                                     if v <= thr_lo}


class TestWeightedSampleAES:
    def test_matches_bruteforce_and_block_invariant(self):
        from web2llmstxt_ray.ops.corpus import weighted_sample_aes

        n = 2000
        ids = np.arange(n, dtype=np.int64)
        w = (ids % 97 + 1).astype(np.int64)
        t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
        outs = []
        for parts in (1, 9):
            ds = ray.data.from_arrow(t).repartition(parts)
            outs.append(weighted_sample_aes(ds, k=150)
                        ["doc_id"].tolist())
        assert outs[0] == outs[1]
        u = ((ids * 2654435761) % (1 << 32) + 0.5) / float(1 << 32)
        key = np.log(u) / w
        want = sorted(ids[np.argsort(-key, kind="stable")][:150].tolist())
        assert outs[0] == want

    def test_heavier_weights_oversampled(self):
        from web2llmstxt_ray.ops.corpus import weighted_sample_aes

        n = 4000
        ids = np.arange(n, dtype=np.int64)
        w = np.where(ids < 200, 1000, 1).astype(np.int64)  # 5% heavy
        t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
        out = weighted_sample_aes(ray.data.from_arrow(t), k=200)
        heavy = (out["doc_id"] < 200).sum()
        assert heavy > 120     # heavy ids dominate the sample


class TestGroupedSplit:
    def test_group_purity_and_determinism(self):
        import hashlib
        from web2llmstxt_ray.ops.corpus import grouped_split

        n = 3000
        rng = np.random.RandomState(3)
        src = np.array([f"site{int(i)}" for i in rng.randint(0, 40, n)])
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "source": pa.array(src)})
        outs = []
        for parts in (1, 11):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = grouped_split(ds, "source").to_pandas()
            outs.append(out.sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        out = outs[0]
        # every group entirely on one side
        assert (out.groupby("source")["split"].nunique() == 1).all()
        # rule replay
        for s in np.unique(src):
            want = ("train" if int(hashlib.md5(s.encode())
                                   .hexdigest()[:8], 16) % 100 < 80
                    else "test")
            assert (out.loc[out["source"] == s, "split"] == want).all()
        # both sides populated at 40 groups
        assert set(out["split"]) == {"train", "test"}

    def test_salt_changes_assignment(self):
        from web2llmstxt_ray.ops.corpus import grouped_split

        t = pa.table({"doc_id": pa.array(range(200)),
                      "source": pa.array([f"s{i % 50}"
                                          for i in range(200)])})
        a = grouped_split(ray.data.from_arrow(t), "source",
                          salt="").to_pandas()
        b = grouped_split(ray.data.from_arrow(t), "source",
                          salt="fold2").to_pandas()
        a = a.sort_values("doc_id")["split"].tolist()
        b = b.sort_values("doc_id")["split"].tolist()
        assert a != b


class TestChunkText:
    def test_vs_sequential_and_overlap_property(self):
        from web2llmstxt_ray.ops.corpus import chunk_text

        rng = np.random.RandomState(4)
        texts = ["".join(chr(rng.randint(97, 123))
                         for _ in range(int(ln)))
                 for ln in rng.randint(0, 900, 60)]
        texts[0] = ""                       # zero-length doc
        texts[1] = "x" * 100                # single short chunk
        texts[2] = "y" * 256                # exactly one window
        texts[3] = "z" * 257                # one char spills
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        outs = []
        for parts in (1, 7):
            out = (chunk_text(ray.data.from_arrow(t).repartition(parts),
                              size=256, overlap=64).to_pandas()
                   .sort_values(["doc_id", "chunk_idx"])
                   .reset_index(drop=True))
            out["chunk_idx"] = out["chunk_idx"].astype("int64")
            out["start"] = out["start"].astype("int64")
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = outs[0]
        step = 256 - 64
        for did, text in enumerate(texts):
            sub = got[got["doc_id"] == did]
            if not text:
                assert sub.empty
                continue
            n = 1 + max(0, -(-(len(text) - 256) // step))
            assert len(sub) == n, (did, len(text))
            for _, r in sub.iterrows():
                s = int(r["chunk_idx"]) * step
                assert r["start"] == s
                assert r["chunk"] == text[s:s + 256]
            # reconstruction: drop each chunk's first `overlap` chars
            # (except chunk 0) and the concat equals the original
            rebuilt = "".join(
                (r["chunk"] if r["chunk_idx"] == 0 else r["chunk"][64:])
                for _, r in sub.iterrows())
            assert rebuilt == text

    def test_overlap_validation(self):
        from web2llmstxt_ray.ops.corpus import chunk_text
        with pytest.raises(ValueError):
            chunk_text(ray.data.from_items([{"doc_id": 1, "text": "a"}]),
                       size=64, overlap=64)


class TestBigramPMI:
    def test_vs_counter_oracle(self):
        from collections import Counter
        from web2llmstxt_ray.ops.corpus import bigram_pmi

        rng = np.random.RandomState(9)
        vocab = ["red", "fox", "jumps", "high", "very"]
        texts = [" ".join(rng.choice(vocab, rng.randint(2, 20)))
                 for _ in range(120)]
        t = pa.table({"text": pa.array(texts)})
        outs = []
        for parts in (1, 7):
            outs.append(bigram_pmi(
                ray.data.from_arrow(t).repartition(parts),
                min_count=3, k=10))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        uni, big = Counter(), Counter()
        for s in texts:
            ws = s.split()
            uni.update(ws)
            big.update(zip(ws[:-1], ws[1:]))
        n_tok, n_big = sum(uni.values()), sum(big.values())
        scored = sorted(
            ((np.log((c * n_tok * n_tok)
                     / (float(n_big) * uni[a] * uni[b])), a, b, c)
             for (a, b), c in big.items() if c >= 3),
            key=lambda r: (-r[0], r[1], r[2]))[:10]
        got = list(zip(outs[0]["w1"], outs[0]["w2"], outs[0]["cnt"]))
        want = [(a, b, c) for _, a, b, c in scored]
        assert got == want
        np.testing.assert_allclose(
            outs[0]["pmi"].to_numpy(),
            [p for p, *_ in scored], rtol=1e-12)

    def test_min_count_filters(self):
        from web2llmstxt_ray.ops.corpus import bigram_pmi

        t = pa.table({"text": pa.array(["a b a b a b", "c d"])})
        out = bigram_pmi(ray.data.from_arrow(t), min_count=2, k=10)
        pairs = set(zip(out["w1"], out["w2"]))
        assert ("c", "d") not in pairs          # count 1 < 2
        assert ("a", "b") in pairs              # count 3
