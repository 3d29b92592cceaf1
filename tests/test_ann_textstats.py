"""ANN search (brute-force exactness, IVF recall) and text-stats ops."""

import numpy as np
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops import ann as A
from web2llmstxt_ray.ops import textstats as T


def _emb_table(n=200, d=16, seed=9):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d)
    return vecs, pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


class TestBruteForce:
    def test_matches_numpy_oracle(self):
        vecs, tbl = _emb_table()
        ds = ray.data.from_arrow(tbl).repartition(8)
        qids = [0, 5, 17]
        queries = vecs[qids]
        out = A.brute_force_topk(ds, queries, qids, k=5).to_pylist()
        # numpy oracle (float32 values, float64 math — same as pipeline)
        v32 = np.stack([np.asarray(r, dtype=np.float64) for r in
                        tbl.column("embedding").to_pylist()])
        n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
        qn = A._normalize(np.asarray(queries, dtype=np.float64))
        # NOTE: oracle must use the same query source as the pipeline
        qn = n[qids]
        sims = qn @ n.T
        for qi, qid in enumerate(qids):
            order = sorted(range(len(v32)), key=lambda j: (-sims[qi, j], j))
            order = [j for j in order if j != qid][:5]
            got = [r["vec_id"] for r in out if r["query_id"] == qid]
            assert got == order

    def test_ranks_sequential(self):
        vecs, tbl = _emb_table(50)
        out = A.brute_force_topk(ray.data.from_arrow(tbl), vecs[:2], [0, 1],
                                 k=7).to_pandas()
        for qid in (0, 1):
            assert out[out.query_id == qid]["rank"].tolist() == list(range(1, 8))


class TestIVF:
    def test_recall_vs_bruteforce(self):
        vecs, tbl = _emb_table(400, 24)
        ds = ray.data.from_arrow(tbl).repartition(8)
        qids = list(range(5))
        queries = vecs[qids]
        exact = A.brute_force_topk(ds, queries, qids, k=10).to_pylist()
        centroids = A.train_centroids(vecs[:256], num_lists=8)
        approx = A.ivf_topk(ds, centroids, queries, qids, k=10,
                            nprobe=4).to_pylist()
        recalls = []
        for qid in qids:
            e = {r["vec_id"] for r in exact if r["query_id"] == qid}
            a = {r["vec_id"] for r in approx if r["query_id"] == qid}
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 lists

    def test_full_probe_equals_bruteforce(self):
        vecs, tbl = _emb_table(150, 16)
        ds = ray.data.from_arrow(tbl).repartition(4)
        qids = [3, 7]
        exact = A.brute_force_topk(ds, vecs[qids], qids, k=5).to_pylist()
        centroids = A.train_centroids(vecs, num_lists=4)
        approx = A.ivf_topk(ds, centroids, vecs[qids], qids, k=5,
                            nprobe=4).to_pylist()
        for qid in qids:
            e = [(r["vec_id"], r["cosine"]) for r in exact if r["query_id"] == qid]
            a = [(r["vec_id"], r["cosine"]) for r in approx if r["query_id"] == qid]
            assert e == a

    def test_partitioned_layout_probe(self, tmp_path):
        """The 10^9-vector layout: assign ivf_list, write Parquet
        partitioned by it, then PROBE BY READING ONLY the wanted list
        partitions — results identical to probing the full dataset
        (the partition column prunes the read at scale)."""
        vecs, tbl = _emb_table(300, 16)
        ds = ray.data.from_arrow(tbl).repartition(4)
        centroids = A.train_centroids(vecs[:128], num_lists=8)
        assigned = A.assign_ivf_lists(ds, centroids)
        root = str(tmp_path / "ivf_layout")
        assigned.write_parquet(root, partition_cols=["ivf_list"])

        qids = [1, 4]
        queries = vecs[qids]
        import numpy as _np

        qn = queries / _np.linalg.norm(queries, axis=1, keepdims=True)
        cn = centroids / _np.linalg.norm(centroids, axis=1, keepdims=True)
        wanted = sorted({int(l) for row in _np.argsort(-(qn @ cn.T), axis=1)[:, :2]
                         for l in row})
        # read ONLY the wanted partitions back (partition pruning)
        import os as _os

        import glob as _glob

        parts = [f for l in wanted
                 for f in _glob.glob(f"{root}/ivf_list={l}/*.parquet")]
        pruned = ray.data.read_parquet(parts)
        assert pruned.count() < 300          # genuinely pruned
        full = A.ivf_topk(ds, centroids, queries, qids, k=5,
                          nprobe=2).to_pylist()
        via_layout = A.ivf_topk(pruned.drop_columns(["ivf_list"]), centroids,
                                queries, qids, k=5, nprobe=2).to_pylist()
        assert via_layout == full

    def test_centroids_deterministic(self):
        vecs, _ = _emb_table(100)
        c1 = A.train_centroids(vecs, 4)
        c2 = A.train_centroids(vecs, 4)
        np.testing.assert_array_equal(c1, c2)


class TestKMeans:
    def _blobs(self, n_per=120, d=12, k=3, seed=3):
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, d) * 6
        vecs = np.concatenate([c + rng.randn(n_per, d) * 0.2
                               for c in centers])
        labels = np.repeat(np.arange(k), n_per)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs.tolist(),
                                  pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        })
        return vecs, labels, tbl

    def test_recovers_separated_blobs(self):
        vecs, labels, tbl = self._blobs()
        ds = ray.data.from_arrow(tbl).repartition(6)
        cent, info = A.kmeans_fit(ds, k=3, iters=8, sample_size=64)
        assert cent.shape == (3, 12)
        assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
        out = A.kmeans_assign(ds, cent).to_pandas()[["vec_id", "cluster"]]
        # perfect purity: every true blob maps to exactly one cluster
        m = out.merge(
            __import__("pandas").DataFrame(
                {"vec_id": np.arange(len(labels)), "label": labels}),
            on="vec_id")
        for lab, grp in m.groupby("label"):
            assert grp["cluster"].nunique() == 1
        assert m.groupby("cluster")["label"].nunique().max() == 1

    def test_sse_decreases(self):
        _, _, tbl = self._blobs(seed=17)
        ds = ray.data.from_arrow(tbl).repartition(4)
        _, info = A.kmeans_fit(ds, k=3, iters=6, sample_size=16)
        sse = info["sse_per_iter"]
        assert all(b <= a + 1e-9 for a, b in zip(sse, sse[1:]))

    def test_more_clusters_than_blobs_stays_finite(self):
        _, _, tbl = self._blobs(n_per=40, k=2, seed=5)
        ds = ray.data.from_arrow(tbl)
        cent, _ = A.kmeans_fit(ds, k=8, iters=4, sample_size=80)
        assert cent.shape[0] == 8
        assert np.isfinite(cent).all()

    def test_full_corpus_refinement_beats_tiny_sample_init(self):
        """The point of the distributed pass: a 12-vector sample init
        mis-places centroids; full-data Lloyd recovers them."""
        vecs, labels, tbl = self._blobs(n_per=200, seed=23)
        ds = ray.data.from_arrow(tbl).repartition(6)
        cent, info = A.kmeans_fit(ds, k=3, iters=10, sample_size=12)
        out = A.kmeans_assign(ds, cent).to_pandas()[["vec_id", "cluster"]]
        m = out.merge(
            __import__("pandas").DataFrame(
                {"vec_id": np.arange(len(labels)), "label": labels}),
            on="vec_id")
        purity = (m.groupby("cluster")["label"]
                   .agg(lambda s: s.value_counts().iloc[0] / len(s)).min())
        assert purity > 0.95


class TestTextStats:
    def test_token_counts(self):
        batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": ["one  two three", ""]})
        out = T.TokenCounter()(batch)
        assert out.column("n_tokens").to_pylist() == [3, 0]
        assert out.column("n_subtokens").to_pylist()[0] == 3

    def test_subtokens_split_mixed(self):
        assert T.tokenize_bpeish("abc123-def") == ["abc", "123", "-", "def"]

    def test_quality_scores(self):
        batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": ["The cat, the hat."]})
        out = T.QualityScorer()(batch).to_pylist()[0]
        assert out["n_words"] == 4
        assert out["n_chars2"] == 17
        assert out["punct_ratio"] == round(2 / 17, 6)  # ',' and '.'
        assert out["stop_ratio"] == round(2 / 4, 6)

    def test_language_detection(self):
        assert T.detect_language(
            "the quick brown fox is jumping over the lazy dog and this "
            "sentence is clearly written with the english language") == "en"
        assert T.detect_language(
            "der hund und die katze sind mit dem mann ist das haus und "
            "schöne dinge schnell") == "de"
        assert T.detect_language(
            "los gatos y los perros que viven con una familia para la "
            "casa grande") == "es"
        assert T.detect_language(
            "les chats et les chiens est que avec pour la maison des "
            "choses merveilleuses") == "fr"
        assert T.detect_language("这是一个中文句子，用于测试语言检测功能。") == "zh"
        assert T.detect_language("") == "unknown"

    def test_fingerprint_canonical(self):
        assert T.canonical_fingerprint("A  B\nC") == \
            T.canonical_fingerprint("a b c")

    def test_rolling_fingerprints_shift_property(self):
        text = "x" * 30 + "anchor content here for the window" + "y" * 80
        shifted = "pad " + text
        f1 = set(T.rolling_fingerprints(text, window=20, stride=1))
        f2 = set(T.rolling_fingerprints(shifted, window=20, stride=1))
        # shifted text still shares most window hashes (shift-resistant)
        assert len(f1 & f2) / len(f1) > 0.8


class TestWindows:
    def test_tumbling_matches_pandas(self):
        import pandas as pd

        from web2llmstxt_ray.ops.windows import tumbling_window

        ts = pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:55",
                             "2024-01-01 11:05", "2024-01-01 10:30"])
        tbl = pa.table({"event_type": ["a", "a", "a", "b"],
                        "ts": pa.array(ts, pa.timestamp("us")),
                        "value": [1.0, 2.0, 3.0, 4.0]})
        out = tumbling_window(ray.data.from_arrow(tbl))
        out = out.sort_values(["event_type", "window_start"]).reset_index(drop=True)
        assert out["n_events"].tolist() == [2, 1, 1]
        assert out["sum_value"].tolist() == [3.0, 3.0, 4.0]

    def test_sessionize_gap(self):
        import pandas as pd

        from web2llmstxt_ray.ops.windows import sessionize

        ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:10",
                             "2024-01-01 11:30", "2024-01-01 11:40"])
        tbl = pa.table({"user_id": pa.array([7, 7, 7, 7], pa.int64()),
                        "ts": pa.array(ts, pa.timestamp("us"))})
        out = sessionize(ray.data.from_arrow(tbl)).to_pandas()
        assert out.iloc[0]["n_sessions"] == 2
        assert out.iloc[0]["n_events"] == 4

    def test_running_totals_sequential_oracle(self):
        import numpy as np
        import pandas as pd

        from web2llmstxt_ray.ops.windows import running_totals

        rng = np.random.RandomState(5)
        n = 500
        tbl = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 20, n), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(rng.randint(0, 10**6, n),
                                             unit="s"),
                           pa.timestamp("us")),
            "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
        })
        got = (running_totals(ray.data.from_arrow(tbl).repartition(5))
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        # sequential per-user oracle
        df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        df["_c"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
        by = df.groupby("user_id", sort=False)
        want = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "run_n": (by.cumcount() + 1).to_numpy(),
            "run_sum_cents": by["_c"].cumsum().to_numpy(),
            "run_max": by["value"].cummax().to_numpy(),
        }).sort_values("event_id").reset_index(drop=True)
        for c in ("run_n", "run_sum_cents", "run_max"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
        # partition invariance
        got1 = (running_totals(ray.data.from_arrow(tbl).repartition(1))
                .to_pandas().sort_values("event_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, got1)


class TestMultimodal:
    def test_fake_decode_roundtrip(self):
        from web2llmstxt_ray.ops import multimodal as M

        media = M.synth_media_table(["d1", "d2"], per_doc=3)
        out = M.extract_media_features(
            ray.data.from_arrow(media), batch_size=4).to_pandas()
        assert len(out) == 6
        merged = out.merge(media.select(
            ["media_id", "kind", "declared_width", "declared_ms"]).to_pandas(),
            on="media_id", suffixes=("", "_declared"))
        assert (merged["kind"] == merged["kind_declared"]).all()
        img = merged[merged.kind == "image"]
        if len(img):
            assert (img["width"] == img["declared_width"]).all()

    def test_stub_decoder_raises(self):
        import pytest

        from web2llmstxt_ray.ops import multimodal as M

        with pytest.raises(NotImplementedError):
            M.StubDecoder().decode(b"anything")

    def test_payload_deterministic(self):
        from web2llmstxt_ray.ops import multimodal as M

        assert M.make_fake_payload("m1", "image", 10, 10) == \
            M.make_fake_payload("m1", "image", 10, 10)


class TestKnnJoin:
    def _clustered(self, n=240, d=16, c=6, seed=4):
        rng = np.random.RandomState(seed)
        centers = rng.randn(c, d)
        vecs = np.stack([centers[i % c] + 0.3 * rng.randn(d)
                         for i in range(n)]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        return vecs, tbl

    def _oracle(self, vecs, k):
        vn = vecs.astype(np.float64)
        vn = vn / np.linalg.norm(vn, axis=1)[:, None]
        sims = vn @ vn.T
        np.fill_diagonal(sims, -2.0)
        want = {}
        for q in range(len(vecs)):
            want[q] = sorted(range(len(vecs)),
                             key=lambda j: (-sims[q, j], j))[:k]
        return want

    def test_exact_matches_numpy_oracle_any_chunk(self):
        vecs, tbl = self._clustered()
        ds = ray.data.from_arrow(tbl).repartition(6)
        want = self._oracle(vecs, 5)
        for chunk in (64, 1000):
            out = A.knn_join(ds, k=5, chunk_size=chunk).to_pandas()
            assert len(out) == 240 * 5
            for q, grp in out.groupby("query_id"):
                assert list(grp.sort_values("rank")["vec_id"]) == want[q]

    def test_ivf_recall_and_schema(self):
        vecs, tbl = self._clustered()
        ds = ray.data.from_arrow(tbl).repartition(6)
        want = self._oracle(vecs, 5)
        out = A.knn_join_ivf(ds, k=5, num_lists=6, nprobe=3).to_pandas()
        assert list(out.columns) == ["query_id", "rank", "vec_id",
                                     "cosine"]
        hits = sum(len(set(g["vec_id"]) & set(want[q]))
                   for q, g in out.groupby("query_id"))
        assert hits / (240 * 5) >= 0.9
        # ranks contiguous from 1, cosine non-increasing per query
        for q, g in out.groupby("query_id"):
            g = g.sort_values("rank")
            assert list(g["rank"]) == list(range(1, len(g) + 1))
            assert (g["cosine"].diff().dropna() <= 1e-12).all()

    def test_ivf_deterministic(self):
        _, tbl = self._clustered(n=120)
        ds = ray.data.from_arrow(tbl).repartition(4)
        a = A.knn_join_ivf(ds, k=3, num_lists=5, nprobe=2).to_pandas()
        b = A.knn_join_ivf(ds, k=3, num_lists=5, nprobe=2).to_pandas()
        assert a.equals(b)


class TestCompressionRatio:
    def test_vs_direct_zlib(self):
        import zlib

        import pyarrow as pa
        import ray.data

        from web2llmstxt_ray.ops.textstats import compression_ratio

        texts = ["abc " * 200, "the quick brown fox", "", "x"]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(texts)})
        out = (compression_ratio(ray.data.from_arrow(t).repartition(2))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for i, s in enumerate(texts):
            raw = s.encode()
            comp = zlib.compress(raw, 6)
            assert out.loc[i, "n_bytes"] == len(raw)
            assert out.loc[i, "n_compressed"] == len(comp)
        # repetitive text compresses far better than prose
        assert out.loc[0, "ratio"] < 0.1 < out.loc[1, "ratio"]
        assert out.loc[2, "ratio"] == 1.0


class TestKnnJoinDatasetMode:
    def test_dataset_parity(self):
        rng = np.random.RandomState(4)
        centers = rng.randn(6, 16)
        vecs = np.stack([centers[i % 6] + 0.3 * rng.randn(16)
                         for i in range(120)]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(4)
        collected = A.knn_join_ivf(ds, k=3, num_lists=5,
                                   nprobe=2).to_pandas()
        dset = A.knn_join_ivf(ds, k=3, num_lists=5, nprobe=2,
                              as_dataset=True)
        import ray.data as rd

        assert isinstance(dset, rd.Dataset)
        got = dset.to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        assert got.values.tolist() == collected.values.tolist()


class TestMMRSelect:
    def _oracle(self, vecs, ids, q, k, lam):
        qn = q / np.linalg.norm(q)
        Xn = vecs / np.linalg.norm(vecs, axis=1)[:, None]
        rel = Xn @ qn
        chosen = []
        taken = set()
        for _ in range(k):
            best = None
            for i in range(len(ids)):
                if ids[i] in taken:
                    continue
                pen = max((float(Xn[i] @ Xn[j]) for j in chosen),
                          default=0.0)
                s = lam * rel[i] - (1 - lam) * pen
                key = (-s, ids[i])
                if best is None or key < best[0]:
                    best = (key, i)
            chosen.append(best[1])
            taken.add(ids[best[1]])
        return [ids[i] for i in chosen]

    def test_vs_sequential_oracle_and_partitions(self):
        from web2llmstxt_ray.ops.ann import mmr_select

        rng = np.random.RandomState(7)
        n, d, k = 400, 16, 12
        vecs = rng.randn(n, d)
        ids = list(range(n))
        q = rng.randn(d)
        want = self._oracle(vecs, np.array(ids), q, k, 0.6)
        got_sets = []
        for parts in (1, 7):
            emb = ray.data.from_arrow(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            })).repartition(parts)
            out = mmr_select(emb, q, k=k, lam=0.6)
            got_sets.append(out.column("vec_id").to_pylist())
        assert got_sets[0] == got_sets[1] == want

    def test_diversity_beats_topk(self):
        """With near-duplicate top hits, MMR must skip the clones that
        pure relevance ranking would take."""
        from web2llmstxt_ray.ops.ann import mmr_select

        rng = np.random.RandomState(3)
        d = 8
        q = rng.randn(d)
        base = q + 0.01 * rng.randn(d)
        vecs = np.stack([base + 1e-4 * rng.randn(d) for _ in range(5)]
                        + [rng.randn(d) for _ in range(50)])
        emb = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64()))}))
        out = mmr_select(emb, q, k=5, lam=0.5)
        picked = out.column("vec_id").to_pylist()
        # only one of the 5 clones (ids 0-4) makes the diverse set
        assert sum(1 for i in picked if i < 5) == 1
        assert len(picked) == 5


class TestExtractPatternAll:
    def test_order_and_counts(self):
        from web2llmstxt_ray.ops.textstats import extract_pattern_all

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["ab12cd34ef", "xx", "9z87y6"])})
        out = (extract_pattern_all(
            ray.data.from_arrow(t), r"[0-9]+").to_pandas()
            .sort_values(["doc_id", "match_idx"])
            .reset_index(drop=True))
        got = list(zip(out["doc_id"], out["match_idx"], out["match"]))
        assert got == [(1, 0, "12"), (1, 1, "34"),
                       (3, 0, "9"), (3, 1, "87"), (3, 2, "6")]

    def test_partition_invariant(self):
        from web2llmstxt_ray.ops.textstats import extract_pattern_all

        rng = np.random.RandomState(3)
        texts = [" ".join(rng.choice(["alpha", "be", "gamma9", "x2y"],
                                     rng.randint(0, 30)))
                 for _ in range(100)]
        t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                      "text": pa.array(texts)})
        outs = []
        for parts in (1, 9):
            out = (extract_pattern_all(
                ray.data.from_arrow(t).repartition(parts),
                r"[a-z]+[0-9]").to_pandas()
                .sort_values(["doc_id", "match_idx"])
                .reset_index(drop=True))
            outs.append(out)
        import pandas as pd
        pd.testing.assert_frame_equal(outs[0], outs[1])
