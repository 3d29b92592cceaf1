"""End-to-end corpus-prep pipeline: planted defects of every drop
class, verdict precedence, stage-checkpoint resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from web2llmstxt_ray.pipelines.corpus_prep import prepare_corpus


def _corpus():
    rng = np.random.RandomState(33)
    vocab = [f"tok{i}" for i in range(200)]
    mk = lambda n: " ".join(rng.choice(vocab, size=n))
    docs = {}
    nid = iter(range(1000))
    # 40 good english-looking docs (inject stopwords so lang ID says en)
    good = []
    for _ in range(40):
        base = mk(60).split()
        for j in range(0, 60, 6):
            base[j] = ["the", "and", "of", "is", "with", "this"][j // 6 % 6]
        good.append(" ".join(base))
    for g in good:
        docs[next(nid)] = g
    # exact duplicates of the first 5 good docs
    exact_dup_ids = []
    for i in range(5):
        did = next(nid)
        docs[did] = good[i]
        exact_dup_ids.append(did)
    # near-dups: good doc with 2 words changed
    near_ids = []
    for i in range(5, 9):
        toks = good[i].split()
        toks[3], toks[7] = "changed", "words"
        did = next(nid)
        docs[did] = " ".join(toks)
        near_ids.append(did)
    # short
    short_id = next(nid)
    docs[short_id] = "the of tiny"
    # repetitive
    rep_id = next(nid)
    docs[rep_id] = "the spam " * 40
    bench = [good[-1]]          # contaminates the last good doc
    return docs, bench, exact_dup_ids, near_ids, short_id, rep_id, good


class TestPrepareCorpus:
    @pytest.fixture()
    def run(self, tmp_path):
        docs, bench, exact_ids, near_ids, short_id, rep_id, good = _corpus()
        t = pa.table({
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        })
        ds = ray.data.from_arrow(t).repartition(4)
        wd = str(tmp_path / "prep")
        manifest = prepare_corpus(
            ds, wd, bench_texts=bench, min_words=20, langs=("en",),
            max_bigram_frac=0.3, jaccard_threshold=0.7)
        return docs, bench, exact_ids, near_ids, short_id, rep_id, \
            good, wd, manifest

    def test_verdicts(self, run):
        (docs, bench, exact_ids, near_ids, short_id, rep_id, good, wd,
         manifest) = run
        from web2llmstxt_ray.sinks import read_span_docs

        ann = read_span_docs(os.path.join(wd, "annotated")).to_pandas() \
            .set_index("doc_id")
        # exact duplicates never reach the annotated table (stage 1)
        surviving = set(ann.index)
        assert sum(1 for i in exact_ids if i in surviving) == 0 or \
            all(docs[i] in set(docs[j] for j in surviving) for i in exact_ids)
        # near-dups flagged (either the original or the copy loses)
        assert manifest["dropped"].get("near_dup", 0) >= len(near_ids) - 1
        assert ann.loc[short_id, "drop_reason"] == "short"
        assert ann.loc[rep_id, "drop_reason"] == "repetitive"
        # the contaminated good doc is flagged with reason contaminated
        assert manifest["dropped"].get("contaminated", 0) >= 1
        # most good docs survive
        assert manifest["kept"] >= 30
        # packs exist and cover exactly the kept docs
        packs = read_span_docs(os.path.join(wd, "packs")).to_pandas()
        packed = sorted(x for lst in packs["doc_ids"] for x in lst)
        kept_ids = sorted(ann[ann["keep"]].index)
        assert packed == kept_ids
        assert manifest["n_packs"] == len(packs)

    def test_manifest_totals(self, run):
        *_, wd, manifest = run
        from web2llmstxt_ray.sinks import read_span_docs

        ann = read_span_docs(os.path.join(wd, "annotated"),
                             columns=["keep"]).to_pandas()
        assert manifest["kept"] == int(ann["keep"].sum())
        assert manifest["kept"] + sum(manifest["dropped"].values()) \
            == len(ann)
        on_disk = json.load(open(os.path.join(wd, "manifest.json")))
        assert on_disk == manifest

    def test_anti_join_tier_matches_broadcast(self, run, tmp_path):
        """max_broadcast_losers=0 forces the bucketed-left-join tier;
        every verdict (and the manifest, minus the tier marker) must be
        identical to the default broadcast run on the same fixture."""
        (docs, bench, *_, wd, manifest) = run
        from web2llmstxt_ray.sinks import read_span_docs

        t = pa.table({
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        })
        wd2 = str(tmp_path / "prep_aj")
        m2 = prepare_corpus(
            ray.data.from_arrow(t).repartition(4), wd2,
            bench_texts=bench, min_words=20, langs=("en",),
            max_bigram_frac=0.3, jaccard_threshold=0.7,
            max_broadcast_losers=0)
        assert manifest["near_dup_tier"] == "broadcast"
        assert m2["near_dup_tier"] == "anti_join"
        strip = lambda m: {k: v for k, v in m.items()
                           if k != "near_dup_tier"}
        assert strip(m2) == strip(manifest)
        a = read_span_docs(os.path.join(wd, "annotated")).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = read_span_docs(os.path.join(wd2, "annotated")).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert sorted(a.columns) == sorted(b.columns)
        for col in ("doc_id", "keep", "drop_reason", "n_words"):
            assert a[col].tolist() == b[col].tolist()

    def test_resume_skips_completed_stages(self, run, tmp_path):
        docs, bench, *_ , wd, manifest = run
        t = pa.table({
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        })
        before = os.path.getmtime(os.path.join(wd, "annotated", ".done"))
        m2 = prepare_corpus(
            ray.data.from_arrow(t).repartition(4), wd,
            bench_texts=bench, min_words=20, langs=("en",),
            max_bigram_frac=0.3, jaccard_threshold=0.7)
        assert m2 == manifest
        assert os.path.getmtime(
            os.path.join(wd, "annotated", ".done")) == before


class TestMinhashLosers:
    def test_losers_match_dedup_emission(self):
        import ray.data as rd

        from web2llmstxt_ray.ops.dedup import minhash_dedup, minhash_losers

        rng = np.random.RandomState(8)
        vocab = [f"v{i}" for i in range(150)]
        base = [" ".join(rng.choice(vocab, size=50)) for _ in range(30)]
        near = []
        for i in range(6):
            toks = base[i].split()
            toks[5] = "tweaked"
            near.append(" ".join(toks))
        docs = base + near
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        ds = ray.data.from_arrow(t).repartition(3)
        emitted = minhash_dedup(ds, jaccard_threshold=0.7).to_pandas()
        want = sorted(emitted[~emitted["keep"]]["doc_id"])
        got = minhash_losers(ds, jaccard_threshold=0.7)
        assert got == want and len(got) >= 5

    def test_no_dups_returns_empty(self):
        rng = np.random.RandomState(9)
        docs = [" ".join(rng.choice([f"w{i}" for i in range(500)], size=40))
                for _ in range(20)]
        t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        from web2llmstxt_ray.ops.dedup import minhash_losers
        assert minhash_losers(ray.data.from_arrow(t)) == []


class TestDistributedVerifyTier:
    def _dup_corpus(self, n_base=30, n_near=6, seed=8):
        rng = np.random.RandomState(seed)
        vocab = [f"v{i}" for i in range(150)]
        base = [" ".join(rng.choice(vocab, size=50)) for _ in range(n_base)]
        near = []
        for i in range(n_near):
            toks = base[i].split()
            toks[5] = "tweaked"
            near.append(" ".join(toks))
        docs = base + near
        return pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                         "text": pa.array(docs, pa.string())})

    def test_driver_never_holds_candidate_texts(self, monkeypatch):
        # the round-2 weak tier collected candidate texts with take_all
        # and ran a driver union-find; the distributed tier must only
        # ever collect skinny (node, component) id rows
        import ray.data as rd

        from web2llmstxt_ray.ops.dedup import minhash_losers

        collected: list[set] = []
        orig_take_all = rd.Dataset.take_all
        orig_to_pandas = rd.Dataset.to_pandas

        def spy_take_all(self, *a, **kw):
            rows = orig_take_all(self, *a, **kw)
            if rows:
                collected.append(set(rows[0].keys()))
            return rows

        def spy_to_pandas(self, *a, **kw):
            df = orig_to_pandas(self, *a, **kw)
            if len(df):
                collected.append(set(df.columns))
            return df

        monkeypatch.setattr(rd.Dataset, "take_all", spy_take_all)
        monkeypatch.setattr(rd.Dataset, "to_pandas", spy_to_pandas)
        ds = ray.data.from_arrow(self._dup_corpus()).repartition(3)
        got = minhash_losers(ds, jaccard_threshold=0.7)
        assert len(got) >= 5
        assert collected, "expected the skinny id-map collect"
        for cols in collected:
            assert "text" not in cols
            assert "_ta" not in cols and "_tb" not in cols

    def test_losers_ds_matches_list_api(self):
        from web2llmstxt_ray.ops.dedup import (minhash_losers,
                                               minhash_losers_ds)

        ds = ray.data.from_arrow(self._dup_corpus(seed=21)).repartition(4)
        want = minhash_losers(ds, jaccard_threshold=0.7)
        got = sorted(minhash_losers_ds(ds, jaccard_threshold=0.7)
                     .to_pandas()["doc_id"])
        assert got == want and len(got) >= 5

    def test_verified_pairs_match_bruteforce(self):
        from web2llmstxt_ray.ops.dedup import (jaccard,
                                               minhash_verified_pairs,
                                               shingles)

        t = self._dup_corpus(seed=33)
        ds = ray.data.from_arrow(t).repartition(3)
        got = minhash_verified_pairs(ds, jaccard_threshold=0.7) \
            .to_pandas().sort_values(["a", "b"]).values.tolist()
        texts = t.column("text").to_pylist()
        sh = [shingles(x) for x in texts]
        want = [[a, b] for a in range(len(texts))
                for b in range(a + 1, len(texts))
                if jaccard(sh[a], sh[b]) >= 0.7]
        # LSH recall gates candidates; every emitted pair must be a
        # true >= threshold pair, and the planted near-dups must appear
        assert all(p in want for p in got)
        planted = [[i, 30 + i] for i in range(6)]
        assert all(p in got for p in planted)
