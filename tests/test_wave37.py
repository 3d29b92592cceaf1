"""Wave-37 conformance: per-label medoids, NDCG/RBO retrieval eval,
Poisson bootstrap, blocking-quality metrics — each distributed
operator checked against an independent sequential oracle, plus the
float-margin assertions the SQL twins lean on."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _emb(columns):
    return pq.read_table(f"{SF}/embeddings.parquet", columns=columns)


class TestLabelMedoids:
    def test_equals_bruteforce_with_margin(self, ray_session):
        from web2llmstxt_ray.ops.ann import label_medoids

        t = _emb(["vec_id", "label", "embedding"])
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        labs = np.asarray(t.column("label").to_pylist(), dtype=np.int64)
        X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        expect = {}
        for lab in np.unique(labs):
            sel = np.nonzero(labs == lab)[0]
            d2 = ((X[sel][:, None, :] - X[sel][None, :, :]) ** 2).sum(-1)
            scores = d2.sum(1)
            order = np.lexsort((ids[sel], scores))
            # winner margin must dwarf the ~1e-12 cross-engine drift
            gaps = np.diff(np.sort(scores))
            assert gaps[gaps > 0][0] > 1e-6
            expect[int(lab)] = (int(ids[sel][order[0]]), len(sel),
                                float(scores[order[0]]))
        got = label_medoids(rd.from_arrow(t).repartition(8))
        assert list(got["label"]) == sorted(expect)
        for _, r in got.iterrows():
            mid, n, score = expect[int(r["label"])]
            assert int(r["medoid_id"]) == mid
            assert int(r["n"]) == n
            # moment identity vs direct pairwise sum: float reassoc
            assert abs(r["score"] - score) < 1e-6 * max(1.0, score)


def _rankings_bruteforce(t, k=10, query_mod=50):
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    qsel = np.nonzero(ids % query_mod == 0)[0]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for qi in qsel:
        cos = Xn[qi] @ Xn.T
        dot = X[qi] @ X.T
        mask = ids != ids[qi]
        oc = sorted(zip(-cos[mask], ids[mask]))[:k]
        od = sorted(zip(-dot[mask], ids[mask]))[:k]
        out[int(ids[qi])] = ([int(v) for _, v in oc],
                             [int(v) for _, v in od],
                             cos, mask)
    return ids, out


class TestRetrievalEval:
    def test_ndcg_equals_bruteforce(self, ray_session):
        from web2llmstxt_ray.ops.retrieval import retrieval_ndcg_label

        t = _emb(["vec_id", "label", "embedding"])
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        labs = np.asarray(t.column("label").to_pylist(), dtype=np.int64)
        lab_of = dict(zip(ids.tolist(), labs.tolist()))
        _, ranks = _rankings_bruteforce(t)
        got = retrieval_ndcg_label(rd.from_arrow(t).repartition(8),
                                   k=10, query_mod=50)
        assert list(got["query_id"]) == sorted(ranks)
        for _, r in got.iterrows():
            qid = int(r["query_id"])
            top, _, cos, mask = ranks[qid]
            # rank-10/11 cosine boundary margin ≫ kernel drift
            cs = np.sort(cos[mask])[::-1]
            assert cs[9] - cs[10] > 1e-9
            dcg = sum(1.0 / math.log2(rk + 1)
                      for rk, vid in enumerate(top, 1)
                      if lab_of[vid] == lab_of[qid])
            nrel = int((labs == lab_of[qid]).sum()) - 1
            idcg = sum(1.0 / math.log2(i + 1)
                       for i in range(1, min(10, nrel) + 1))
            assert int(r["n_rel"]) == nrel
            assert abs(r["dcg"] - dcg) < 1e-12
            assert abs(r["ndcg"] - dcg / idcg) < 1e-12

    def test_rbo_equals_bruteforce_and_bounds(self, ray_session):
        from web2llmstxt_ray.ops.retrieval import retrieval_rbo

        t = _emb(["vec_id", "embedding"])
        _, ranks = _rankings_bruteforce(t)
        got = retrieval_rbo(rd.from_arrow(t).repartition(8),
                            k=10, p=0.9, query_mod=50)
        for _, r in got.iterrows():
            a, b, _, _ = ranks[int(r["query_id"])]
            rbo = 0.0
            for d in range(1, 11):
                rbo += (0.9 ** (d - 1)) * (
                    len(set(a[:d]) & set(b[:d])) / d)
            rbo *= 0.1
            assert abs(r["rbo"] - rbo) < 1e-12
            assert 0.0 <= r["rbo"] <= 1.0
            assert int(r["overlap_k"]) == len(set(a) & set(b))


class TestPoissonBootstrap:
    def test_multiplicities_exact_and_partition_invariant(
            self, ray_session):
        from web2llmstxt_ray.ops.stats import (POISSON1_T32, _BOOT_A,
                                               _BOOT_C,
                                               poisson_bootstrap)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice"])
        keys = np.asarray(orders.column("o_orderkey").to_pylist(),
                          dtype=np.int64)
        cents = np.rint(np.asarray(
            orders.column("o_totalprice").to_pylist()) * 100
        ).astype(np.int64)
        got = poisson_bootstrap(rd.from_arrow(orders).repartition(7),
                                "o_orderkey", "o_totalprice",
                                n_replicates=16)
        # sequential replay with exact integer hash
        for b in range(16):
            mult = []
            for k in keys:
                h = (int(k) * _BOOT_A + b * _BOOT_C) % (2 ** 32)
                mult.append(sum(1 for t in POISSON1_T32 if t <= h))
            mult = np.asarray(mult, dtype=np.int64)
            row = got[got["replicate"] == b].iloc[0]
            assert int(row["n_eff"]) == int(mult.sum())
            assert int(row["total_cents"]) == int((mult * cents).sum())
        # Poisson(1): replicate sizes concentrate around n
        n = len(keys)
        assert abs(got["n_eff"].mean() - n) < 0.05 * n
        # partitioning invariance (the no-RNG-state claim)
        again = poisson_bootstrap(
            rd.from_arrow(orders).repartition(23),
            "o_orderkey", "o_totalprice", n_replicates=16)
        pd.testing.assert_frame_equal(got, again)


class TestBlockingQuality:
    def test_histogram_formula_equals_enumeration(self, ray_session):
        from web2llmstxt_ray.ops.phonetic import (blocking_quality,
                                                  catalog_corrupt_names,
                                                  soundex)

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_name"]).to_pandas()
        cd = catalog_corrupt_names(part)
        names = sorted(set(cd["clean"]) | set(cd["dirty"]))
        truth = sorted({(min(a, b), max(a, b))
                        for a, b in zip(cd["clean"], cd["dirty"])
                        if a != b})
        # brute-force candidate enumeration per scheme
        cand_fl = cand_sx = 0
        codes = {n: soundex(n) for n in names}
        for a, b in itertools.combinations(names, 2):
            if a[:1] == b[:1] and abs(len(a) - len(b)) <= 1:
                cand_fl += 1
            if codes[a] == codes[b]:
                cand_sx += 1
        cov_fl = sum(1 for a, b in truth
                     if a[:1] == b[:1] and abs(len(a) - len(b)) <= 1)
        cov_sx = sum(1 for a, b in truth if codes[a] == codes[b])

        reg_ds = rd.from_pandas(pd.DataFrame({
            "name": pd.concat([cd["clean"], cd["dirty"]],
                              ignore_index=True)}))
        truth_ds = rd.from_pandas(pd.DataFrame(
            truth, columns=["a", "b"]))
        got = blocking_quality(reg_ds, truth_ds, col="name") \
            .set_index("scheme")
        n = len(names)
        for scheme, cand, cov in [("first_len", cand_fl, cov_fl),
                                  ("soundex", cand_sx, cov_sx)]:
            r = got.loc[scheme]
            assert int(r["n_names"]) == n
            assert int(r["total_pairs"]) == n * (n - 1) // 2
            assert int(r["n_candidates"]) == cand
            assert int(r["n_truth"]) == len(truth)
            assert int(r["n_covered"]) == cov
            assert r["recall"] == cov / len(truth)
            assert 0.0 < r["reduction_ratio"] < 1.0
