"""BM25 retrieval: stats, scoring (vs a direct-formula oracle), top-k."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from web2llmstxt_ray.ops.retrieval import bm25_scores, bm25_stats, bm25_topk


def _corpus():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "spark table merge table table",
            "hash join hash probe build",
            "window agg over partition",
            "",
            "   ",                        # whitespace-only → 0 tokens
        ],
    })


def _oracle_scores(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[d] = s
    return out


class TestBM25:
    def test_stats(self):
        ds = ray.data.from_arrow(_corpus()).repartition(3)
        n, avgdl, df = bm25_stats(ds, ["table", "hash", "missing"])
        assert n == 5
        assert avgdl == pytest.approx(14 / 5)
        assert df.tolist() == [1, 1, 0]

    def test_scores_match_formula(self):
        tbl = _corpus()
        docs = list(zip(tbl.column("doc_id").to_pylist(),
                        tbl.column("text").to_pylist()))
        terms = ["table", "hash", "window"]
        got = {r["doc_id"]: r["score"]
               for r in bm25_scores(ray.data.from_arrow(tbl).repartition(3),
                                    terms).take_all()}
        exp = _oracle_scores(docs, terms)
        assert set(got) == set(exp)
        for d in exp:
            assert got[d] == pytest.approx(exp[d])

    def test_repeated_term_raises_tf(self):
        got = {r["doc_id"]: r["score"]
               for r in bm25_scores(ray.data.from_arrow(_corpus()),
                                    ["table"]).take_all()}
        assert list(got) == [1]        # only doc 1 contains it

    def test_topk_order_and_tiebreak(self):
        tbl = pa.table({
            "doc_id": pa.array([10, 2, 7, 5], pa.int64()),
            "text": ["x y", "x y", "x x y", "z z"],
        })
        top = bm25_topk(ray.data.from_arrow(tbl).repartition(2), ["x"], k=3)
        assert [r["doc_id"] for r in top] == [7, 2, 10]  # tf desc, id asc
        assert top[0]["score"] > top[1]["score"]
        assert top[1]["score"] == pytest.approx(top[2]["score"])

    def test_term_scores_sum_to_doc_scores(self):
        from web2llmstxt_ray.ops.retrieval import bm25_term_scores

        terms = ["table", "hash", "window"]
        ds = ray.data.from_arrow(_corpus()).repartition(2)
        per_term = bm25_term_scores(ds, terms).to_pandas()
        summed = per_term.groupby("doc_id")["score"].sum()
        direct = {r["doc_id"]: r["score"]
                  for r in bm25_scores(ds, terms).take_all()}
        assert set(summed.index) == set(direct)
        for d, s in summed.items():
            assert s == pytest.approx(direct[d])

    def test_empty_terms_rejected(self):
        with pytest.raises(ValueError):
            bm25_scores(ray.data.from_arrow(_corpus()), [])


class TestHybridRRF:
    def test_fusion_semantics(self):
        from web2llmstxt_ray.ops.retrieval import hybrid_rrf

        # doc 0: lexically perfect, vector-orthogonal
        # doc 1: both lists (moderate each) → should fuse to the top
        # doc 2: vector-perfect, lexically absent
        texts = ["table hash merge window", "table window filler filler",
                 "filler filler filler filler"]
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts)}))
        q = np.array([1.0, 0.0, 0.0])
        emb = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([0, 1, 2, 99], pa.int64()),
            "embedding": pa.array([[0.0, 1.0, 0.0],
                                   [0.9, 0.1, 0.0],
                                   [1.0, 0.0, 0.0],
                                   list(q)], pa.list_(pa.float64()))}))
        out = hybrid_rrf(docs, emb, ["table", "hash", "merge", "window"],
                         q, 99, k_each=3, k_out=4)
        got = dict(zip(out["doc_id"], out["rrf_score"]))
        # doc 1 carries BOTH contributions, docs 0/2 at most one good +
        # one weak; rrf of (2,2)-ish beats (1, worst) pairs
        r = {int(i): (out.loc[out["doc_id"] == i, "lex_rank"].iloc[0],
                      out.loc[out["doc_id"] == i, "vec_rank"].iloc[0])
             for i in out["doc_id"]}
        assert not np.isnan(r[1][0]) and not np.isnan(r[1][1])
        # every rrf equals the recomputed formula from its ranks
        for i, (lr, vr) in r.items():
            want = ((0.0 if np.isnan(lr) else 1.0 / (60 + lr))
                    + (0.0 if np.isnan(vr) else 1.0 / (60 + vr)))
            assert got[i] == pytest.approx(want, abs=0)

    def test_partition_invariant(self):
        from web2llmstxt_ray.ops.retrieval import hybrid_rrf

        rng = np.random.RandomState(11)
        n, d = 300, 8
        words = ["table", "hash", "merge", "window", "filler", "x", "y"]
        texts = [" ".join(rng.choice(words, rng.randint(3, 30)))
                 for _ in range(n)]
        vecs = rng.randn(n, d)
        outs = []
        for parts in (1, 9):
            docs = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts)})).repartition(parts)
            emb = ray.data.from_arrow(pa.table({
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            })).repartition(parts)
            outs.append(hybrid_rrf(docs, emb,
                                   ["table", "hash", "merge", "window"],
                                   vecs[0], 0, k_each=25, k_out=10))
        import pandas as pd
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestTfidfTopTerms:
    def test_vs_counter_oracle(self):
        from collections import Counter
        from web2llmstxt_ray.ops.retrieval import tfidf_top_terms

        rng = np.random.RandomState(4)
        vocab = ["common", "rare1", "rare2", "mid", "filler"]
        texts = []
        for i in range(60):
            ws = list(rng.choice(["common", "filler"], 10))
            if i % 20 == 0:
                ws += ["rare1", "rare1"]
            if i % 15 == 0:
                ws += ["rare2"]
            texts.append(" ".join(ws))
        t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                      "text": pa.array(texts)})
        outs = []
        for parts in (1, 6):
            out = (tfidf_top_terms(
                ray.data.from_arrow(t).repartition(parts), top_m=2)
                .to_pandas().sort_values(["doc_id", "rank"])
                .reset_index(drop=True))
            out["doc_id"] = out["doc_id"].astype("int64")
            outs.append(out)
        import pandas as pd
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # brute-force oracle
        df = Counter()
        for s in texts:
            df.update(set(s.split()))
        n = len(texts)
        for did, s in enumerate(texts):
            tf = Counter(s.split())
            scored = sorted(((c * np.log(n / df[w]), w, c)
                             for w, c in tf.items()),
                            key=lambda r: (-r[0], r[1]))[:2]
            sub = outs[0][outs[0]["doc_id"] == did]
            assert list(sub["term"]) == [w for _, w, _ in scored], did
            assert list(sub["tf"]) == [c for *_, c in scored], did
        # rare terms dominate the docs that contain them
        assert (outs[0].loc[outs[0]["rank"] == 1, "term"]
                .isin(["rare1", "rare2"]).any())
