"""Dedup operator family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine — verified against small sequential oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from web2llmstxt_ray.ops import dedup as D


def _docs_table():
    base = ("the quick brown fox jumps over the lazy dog while engineers "
            "build distributed systems that stream arrow batches through "
            "object stores with careful partitioning of skewed keys")
    near = base.replace("lazy dog", "sleepy dog")          # near-dup of base
    other = ("completely different content about cooking recipes and "
             "gardening tips for the enthusiastic home chef with many "
             "seasonal vegetables and herbs from the garden plot")
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "lang": ["en", "en", "en", "en", "en"],
        "text": [base, base, near, other, other + " extended tail words"],
    })


class TestExactDedup:
    def test_keeps_min_id_per_content(self):
        ds = ray.data.from_arrow(_docs_table())
        out = D.exact_dedup(ds).to_pandas()
        # docs 1,2 identical → one row with doc_id 1; 3,4,5 distinct
        assert len(out) == 4
        kept = set(out["doc_id"])
        assert 1 in kept and 2 not in kept
        assert {3, 4, 5} <= kept

    def test_hash_is_md5(self):
        import hashlib

        ds = ray.data.from_arrow(_docs_table())
        out = D.exact_dedup(ds).to_pandas()
        texts = dict(zip(_docs_table().column("doc_id").to_pylist(),
                         _docs_table().column("text").to_pylist()))
        row = out[out.doc_id == 3].iloc[0]
        assert row["content_hash"] == hashlib.md5(
            texts[3].encode()).hexdigest()


class TestMinHash:
    def test_signature_approximates_jaccard(self):
        a, b = D._perm_params(256)
        t = _docs_table()
        s1 = D.shingles(t.column("text")[0].as_py())
        s3 = D.shingles(t.column("text")[2].as_py())
        sig1 = D.minhash_signature(s1, a, b)
        sig3 = D.minhash_signature(s3, a, b)
        est = (sig1 == sig3).mean()
        true = D.jaccard(s1, s3)
        assert abs(est - true) < 0.15

    def test_lsh_finds_near_dups(self):
        ds = ray.data.from_arrow(_docs_table())
        out = D.minhash_dedup(ds, num_perm=64, num_bands=16,
                              jaccard_threshold=0.5).take_all()
        by_id = {r["doc_id"]: r for r in out}
        # identical pair clusters together under min id
        assert by_id[2]["cluster_id"] == 1
        assert not by_id[2]["keep"]
        # near-dup (one word changed) clusters with base
        assert by_id[3]["cluster_id"] == 1
        # unrelated docs stay their own clusters
        assert by_id[4]["cluster_id"] == 4

    def test_deterministic(self):
        ds = ray.data.from_arrow(_docs_table())
        key = lambda r: r["doc_id"]
        o1 = sorted(D.minhash_dedup(ds).take_all(), key=key)
        o2 = sorted(D.minhash_dedup(ds).take_all(), key=key)
        assert o1 == o2


class TestSimHash:
    def test_near_dup_small_hamming(self):
        t = _docs_table()
        h_base = D.simhash64(t.column("text")[0].as_py())
        h_near = D.simhash64(t.column("text")[2].as_py())
        h_other = D.simhash64(t.column("text")[3].as_py())
        assert D.hamming64(h_base, h_near) < 12
        assert D.hamming64(h_base, h_other) > 16

    def test_empty(self):
        assert D.simhash64("") == 0

    def test_stage(self):
        ds = ray.data.from_arrow(_docs_table())
        out = D.add_simhash(ds).to_pandas()
        assert out.loc[0, "simhash"] == out.loc[1, "simhash"]  # identical docs


class TestNgramJaccard:
    def test_pairs_above_threshold(self):
        ds = ray.data.from_arrow(_docs_table())
        out = D.ngram_jaccard_pairs(ds, group_col="lang", threshold=0.5)
        pairs = {(r["a"], r["b"]): r["jaccard"] for r in out.to_pylist()}
        assert pairs[(1, 2)] == 1.0
        assert (1, 3) in pairs
        assert all(j >= 0.5 for j in pairs.values())

    def test_matches_direct_computation(self):
        t = _docs_table()
        ds = ray.data.from_arrow(t)
        out = D.ngram_jaccard_pairs(ds, group_col="lang", threshold=0.0)
        pairs = {(r["a"], r["b"]): r["jaccard"] for r in out.to_pylist()}
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
        for (a, b), j in pairs.items():
            direct = D.jaccard(D.shingles(texts[a]), D.shingles(texts[b]))
            assert j == pytest.approx(direct, abs=1e-6)


class TestEmbeddingNearDup:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(4)
        vecs = rng.randn(60, 16).astype(np.float32)
        vecs[10] = vecs[3] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup
        tbl = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        out = D.embedding_near_dup_pairs(ray.data.from_arrow(tbl),
                                         threshold=0.9)
        got = {(r["a"], r["b"]) for r in out.to_pylist()}
        v = vecs.astype(np.float64)
        n = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = n @ n.T
        want = {(i, j) for i in range(60) for j in range(i + 1, 60)
                if sims[i, j] >= 0.9}
        assert got == want
        assert (3, 10) in got


class TestEmbeddingNearDupIVF:
    def test_recall_vs_exact(self):
        import web2llmstxt_ray.ops.dedup as D2

        rng = np.random.RandomState(9)
        # clustered corpus: near-dups are perturbations of cluster reps
        reps = rng.randn(12, 16)
        vecs = []
        for i in range(300):
            vecs.append(reps[i % 12] + 0.15 * rng.randn(16))
        vecs = np.asarray(vecs)
        tbl = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl)
        exact = {(r["a"], r["b"])
                 for r in D2.embedding_near_dup_pairs(ds, threshold=0.92).to_pylist()}
        approx = {(r["a"], r["b"])
                  for r in D2.embedding_near_dup_pairs_ivf(
                      ds, threshold=0.92, num_lists=8,
                      assign_probes=2).to_pylist()}
        assert approx <= exact  # no false pairs: same exact verify kernel
        assert exact, "test needs at least one qualifying pair"
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"IVF recall {recall:.2f} too low"



class TestIncrementalDedup:
    def _tables(self):
        rng = np.random.RandomState(17)
        vocab = [f"w{i}" for i in range(300)]
        prior = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
        fresh = [" ".join(rng.choice(vocab, size=30)) for _ in range(35)]
        new_docs = fresh + prior[:5]            # 5 cross-run dups
        pt = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                       "text": pa.array(prior, pa.string())})
        nt = pa.table({"doc_id": pa.array(range(100, 100 + len(new_docs)),
                                          pa.int64()),
                       "text": pa.array(new_docs, pa.string())})
        return pt, nt

    def test_exact_mode_flags_exactly(self):
        from web2llmstxt_ray.ops.dedup import (
            dedup_against_prior, prior_corpus_digest)

        pt, nt = self._tables()
        digest = prior_corpus_digest(
            ray.data.from_arrow(pt).repartition(3), mode="exact")
        out = dedup_against_prior(
            ray.data.from_arrow(nt).repartition(4), digest).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert list(out["is_dup"]) == [False] * 35 + [True] * 5

    def test_bloom_mode_no_false_negatives(self):
        from web2llmstxt_ray.ops.dedup import (
            dedup_against_prior, prior_corpus_digest)

        pt, nt = self._tables()
        digest = prior_corpus_digest(
            ray.data.from_arrow(pt).repartition(3), mode="bloom")
        assert digest[0] == "bloom"
        out = dedup_against_prior(
            ray.data.from_arrow(nt).repartition(4), digest).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        # every true dup flagged; over-flagging bounded by bloom FP
        assert out["is_dup"].iloc[35:].all()
        assert out["is_dup"].iloc[:35].sum() <= 2

    def test_empty_prior(self):
        from web2llmstxt_ray.ops.dedup import (
            dedup_against_prior, prior_corpus_digest)

        _, nt = self._tables()
        empty = ray.data.from_arrow(nt.slice(0, 0))
        for mode in ("exact", "bloom"):
            digest = prior_corpus_digest(empty, mode=mode)
            out = dedup_against_prior(
                ray.data.from_arrow(nt), digest).to_pandas()
            assert not out["is_dup"].any(), mode


class TestSimhashNearDupPairs:
    def _corpus(self):
        rng = np.random.RandomState(23)
        vocab = [f"w{i}" for i in range(400)]
        base = [" ".join(rng.choice(vocab, size=80)) for _ in range(25)]
        near = []
        for i in range(6):
            toks = base[i].split()
            toks[10] = "edited"                  # tiny perturbation
            near.append(" ".join(toks))
        return base + near

    def test_matches_bruteforce(self):
        docs = self._corpus()
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        got = D.simhash_near_dup_pairs(
            ray.data.from_arrow(t).repartition(4), max_hamming=6)
        got_pairs = {(a, b): h for a, b, h in
                     zip(got["a"].to_pylist(), got["b"].to_pylist(),
                         got["hamming"].to_pylist())}
        sigs = [D.simhash64(d) for d in docs]
        want = {}
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                h = D.hamming64(sigs[i], sigs[j])
                if h <= 6:
                    want[(i, j)] = h
        assert got_pairs == want and len(want) >= 5

    def test_zero_distance_exact_dups(self):
        docs = ["alpha beta gamma delta"] * 3 + ["something else entirely"]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        got = D.simhash_near_dup_pairs(ray.data.from_arrow(t),
                                       max_hamming=0)
        assert got["a"].to_pylist() == [0, 0, 1]
        assert got["b"].to_pylist() == [1, 2, 2]
        assert got["hamming"].to_pylist() == [0, 0, 0]


class TestSemanticDedup:
    def _corpus(self, seed=23, n_clusters=5, per=40, dim=12, n_dup=15):
        """Clustered corpus with planted within-cluster near-dups."""
        rng = np.random.RandomState(seed)
        reps = rng.randn(n_clusters, dim) * 4
        base = np.vstack([
            reps[c] + 0.5 * rng.randn(per, dim) for c in range(n_clusters)])
        n = len(base)
        # planted near-dups: tiny perturbations of the first n_dup rows
        dups = base[:n_dup] + 1e-3 * rng.randn(n_dup, dim)
        vecs = np.vstack([base, dups]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        return tbl, vecs, n, n_dup

    def test_planted_dups_grouped_one_keeper(self):
        tbl, vecs, n, n_dup = self._corpus()
        out = D.semantic_dedup(
            ray.data.from_arrow(tbl).repartition(6), threshold=0.999,
            k=5, kmeans_iters=8).to_pandas()
        assert len(out) == len(vecs)
        by_id = out.set_index("vec_id")
        for i in range(n_dup):
            dup_id = n + i
            # original and its copy share a group and a cluster…
            assert by_id.loc[i, "dup_group"] == by_id.loc[dup_id, "dup_group"]
            # …and exactly one of the group's members is kept
            grp = out[out.dup_group == by_id.loc[i, "dup_group"]]
            assert int(grp.keep.sum()) == 1
        # singletons are their own kept group
        singles = out[~out.vec_id.isin(
            list(range(n_dup)) + list(range(n, n + n_dup)))]
        assert singles.keep.all()
        assert (singles.dup_group == singles.vec_id).all()

    def test_keeper_is_lowest_centroid_cosine(self):
        """Paper rule: within a dup group, keep the member with the
        LOWEST cosine to the cluster centroid (ties → min id)."""
        tbl, vecs, n, n_dup = self._corpus(seed=7)
        out = D.semantic_dedup(
            ray.data.from_arrow(tbl).repartition(4), threshold=0.999,
            k=4, kmeans_iters=8).to_pandas()
        # reconstruct per-cluster centroids from the output grouping
        v = vecs.astype(np.float64)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        for gid, grp in out.groupby("dup_group"):
            if len(grp) == 1:
                continue
            cl = grp.sem_cluster.iloc[0]
            members = out[out.sem_cluster == cl].vec_id.to_numpy()
            cent = vn[members].mean(axis=0)
            cent /= np.linalg.norm(cent)
            gids = np.sort(grp.vec_id.to_numpy())
            cos = vn[gids] @ cent
            kept = grp[grp.keep].vec_id.to_numpy()
            assert len(kept) == 1
            # kept member has (approximately) the minimal centroid
            # cosine — exact equality isn't assertable because the test
            # recomputes the centroid from member means while the op
            # uses the kmeans centroid, so allow a small slack
            assert cos[np.flatnonzero(gids == kept[0])[0]] <= cos.min() + 1e-3

    def test_partition_invariance(self):
        tbl, *_ = self._corpus(seed=13)
        a = D.semantic_dedup(ray.data.from_arrow(tbl).repartition(3),
                             threshold=0.99, k=5).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        b = D.semantic_dedup(ray.data.from_arrow(tbl).repartition(9),
                             threshold=0.99, k=5).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestSegmentDedup:
    def _run(self, texts, chunk, parts=3):
        import pyarrow as pa
        import ray.data

        from web2llmstxt_ray.ops.dedup import segment_dedup

        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        return (segment_dedup(ray.data.from_arrow(t).repartition(parts),
                              chunk=chunk)
                .to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    def test_first_occurrence_wins(self):
        # doc0 and doc2 share a 16-char-aligned segment; doc0 keeps it
        seg = "ABCDEFGHIJKLMNOP"          # exactly one chunk
        texts = [seg + "0123456789abcdef",
                 "zzzzzzzzzzzzzzzz",
                 seg + "qrstuvwxyz!!!!!!"]
        out = self._run(texts, chunk=16)
        assert out.loc[0, "text_dedup"] == texts[0]
        assert out.loc[0, "n_kept"] == 2
        assert out.loc[2, "text_dedup"] == "qrstuvwxyz!!!!!!"
        assert out.loc[2, "n_kept"] == 1
        assert out.loc[2, "n_segments"] == 2

    def test_within_doc_repeat_collapses(self):
        seg = "ABCDEFGHIJKLMNOP"
        out = self._run([seg + seg + seg], chunk=16, parts=1)
        assert out.loc[0, "text_dedup"] == seg
        assert out.loc[0, "n_segments"] == 3
        assert out.loc[0, "n_kept"] == 1

    def test_all_dup_doc_empties(self):
        seg = "ABCDEFGHIJKLMNOP"
        out = self._run([seg, seg], chunk=16)
        assert out.loc[1, "text_dedup"] == ""
        assert out.loc[1, "n_kept"] == 0

    def test_partition_invariant(self):
        import numpy as np
        rng = np.random.RandomState(2)
        segs = ["".join(chr(rng.randint(97, 110)) for _ in range(8))
                for _ in range(30)]
        texts = ["".join(segs[i] for i in rng.randint(0, 30, 12))
                 for _ in range(25)]
        a = self._run(texts, chunk=8, parts=1)
        b = self._run(texts, chunk=8, parts=9)
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)


class TestSimilarityJoin:
    def test_planted_fuzzy_matches(self):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from web2llmstxt_ray.ops.dedup import similarity_join

        rng = np.random.RandomState(8)
        vocab = [f"w{i}" for i in range(50)]

        def doc(n):
            return " ".join(rng.choice(vocab, n))

        base = doc(60)
        words = base.split()
        words[5] = "CHANGED"                      # high-jaccard variant
        near = " ".join(words)
        left = [base, doc(50), doc(55)]           # ids 0..2
        right = [near, doc(52), base]             # ids 10..12
        lt = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                       "text": pa.array(left)})
        rt = pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()),
                       "text": pa.array(right)})
        out = similarity_join(
            ray.data.from_arrow(lt).repartition(2),
            ray.data.from_arrow(rt).repartition(2),
            threshold=0.5).to_pandas()
        got = set(zip(out.a_id, out.b_id))
        assert (0, 12) in got                     # exact dup: J = 1.0
        assert (0, 10) in got                     # near variant
        exact = out[(out.a_id == 0) & (out.b_id == 12)]
        assert float(exact["jaccard"].iloc[0]) == 1.0
        # no random-pair pollution
        assert (1, 11) not in got

    def test_partition_invariant(self):
        import numpy as np
        import pyarrow as pa
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.dedup import similarity_join

        rng = np.random.RandomState(3)
        vocab = [f"t{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, 40)) for _ in range(20)]
        texts[17] = texts[2]                       # cross-side dup
        lt = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                       "text": pa.array(texts[:10])})
        rt = pa.table({"doc_id": pa.array(range(10, 20), pa.int64()),
                       "text": pa.array(texts[10:])})
        runs = []
        for p in (1, 7):
            runs.append(similarity_join(
                ray.data.from_arrow(lt).repartition(p),
                ray.data.from_arrow(rt).repartition(p),
                threshold=0.4).to_pandas())
        pd.testing.assert_frame_equal(runs[0], runs[1])
        assert (2, 17) in set(zip(runs[0].a_id, runs[0].b_id))


class TestPairOpsDatasetMode:
    """as_dataset=True must return the identical pair set as the
    collected form, as a Dataset that never touches the driver."""

    def test_simhash_pairs_dataset_parity(self):
        rng = np.random.RandomState(6)
        vocab = [f"t{i}" for i in range(300)]
        base = [" ".join(rng.choice(vocab, size=60)) for _ in range(25)]
        near = []
        for i in range(6):
            toks = base[i].split()
            toks[10] = "edited"
            near.append(" ".join(toks))
        docs = base + near
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        ds = ray.data.from_arrow(t).repartition(4)
        tbl = D.simhash_near_dup_pairs(ds, max_hamming=6)
        dset = D.simhash_near_dup_pairs(ds, max_hamming=6,
                                        as_dataset=True)
        import ray.data as rd

        assert isinstance(dset, rd.Dataset)
        got = dset.to_pandas().sort_values(["a", "b"])
        want = tbl.to_pandas().sort_values(["a", "b"])
        assert got.values.tolist() == want.values.tolist()
        assert len(want) >= 5

    def test_ngram_pairs_dataset_parity(self):
        ds = ray.data.from_arrow(_docs_table())
        tbl = D.ngram_jaccard_pairs(ds, group_col="lang", threshold=0.3)
        dset = D.ngram_jaccard_pairs(ds, group_col="lang", threshold=0.3,
                                     as_dataset=True)
        got = sorted(map(tuple, dset.to_pandas()
                         [["a", "b", "jaccard"]].values.tolist()))
        want = sorted(map(tuple, tbl.to_pandas()
                          [["a", "b", "jaccard"]].values.tolist()))
        assert got == want and len(want) >= 2
