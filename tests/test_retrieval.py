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
