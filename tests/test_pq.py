"""Product-quantization ANN: encode shape/determinism, ADC recall vs
brute force, compression accounting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.ann import brute_force_topk
from web2llmstxt_ray.ops.pq import (_code_matrix, pq_encode, pq_topk,
                                    pq_train)


def _clustered(n: int = 800, d: int = 32, n_clusters: int = 12,
               seed: int = 3) -> np.ndarray:
    """Mixture-of-gaussians embeddings (realistic neighborhood
    structure — PQ recall on pure iid noise is meaningless)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3.0
    assign = rng.integers(0, n_clusters, n)
    return centers[assign] + rng.normal(size=(n, d)) * 0.4


def _ds(vecs: np.ndarray) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs.tolist(),
                              pa.list_(pa.float32())),
    })).repartition(5)


class TestPQEncode:
    def test_codes_shape_and_range(self):
        vecs = _clustered()
        books = pq_train(vecs[:400], m=8, ks=16)
        codes = pq_encode(_ds(vecs), books).to_pandas()
        assert len(codes) == len(vecs)
        cm = np.stack(codes["pq_code"].to_numpy())
        assert cm.shape == (len(vecs), 8)
        assert cm.max() < 16
        # m uint8 codes per 32-d float vector: 16x compression vs f32
        assert cm.dtype == np.uint8

    def test_encode_deterministic(self):
        vecs = _clustered(300, seed=9)
        books = pq_train(vecs, m=4, ks=16)
        a = pq_encode(_ds(vecs), books).to_pandas().sort_values("vec_id")
        b = pq_encode(_ds(vecs), books).to_pandas().sort_values("vec_id")
        assert (np.stack(a["pq_code"].to_numpy())
                == np.stack(b["pq_code"].to_numpy())).all()

    def test_code_matrix_roundtrip(self):
        codes = np.arange(24, dtype=np.uint8).reshape(6, 4)
        t = pa.table({"pq_code": pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), 4)})
        assert (_code_matrix(t) == codes).all()


class TestPQTopK:
    def test_recall_vs_bruteforce(self):
        # ~11 members per cluster so the true top-10 IS the cluster —
        # recall then measures cluster identification, which PQ must
        # get right; with one giant blob the 10th-vs-50th neighbor gap
        # sits below quantization resolution and recall@10 is
        # meaningless for any quantizer.
        vecs = _clustered(1000, d=32, n_clusters=90, seed=5)
        train = vecs[:500]
        books = pq_train(train, m=8, ks=32)
        codes = pq_encode(_ds(vecs), books)
        qidx = [3, 77, 401, 888]
        queries = vecs[qidx]
        k = 10
        approx = pq_topk(codes, books, queries, qidx, k=k).to_pandas()
        exact = brute_force_topk(_ds(vecs), queries, qidx,
                                 k=k).to_pandas()
        recalls = []
        for q in qidx:
            a = set(approx.loc[approx["query_id"] == q, "vec_id"])
            e = set(exact.loc[exact["query_id"] == q, "vec_id"])
            recalls.append(len(a & e) / k)
        # clustered data, 8x4-bit codes over 32-d: recall@10 well
        # above chance (k/n = 1%); typical observed ~0.8+
        assert float(np.mean(recalls)) >= 0.6

    def test_self_hit_ranks_first_without_exclusion(self):
        vecs = _clustered(400, seed=11)
        books = pq_train(vecs, m=8, ks=32)
        codes = pq_encode(_ds(vecs), books)
        out = pq_topk(codes, books, vecs[[42]], [42], k=3,
                      exclude_self=False).to_pandas()
        # the query's own code has the minimal possible ADC distance
        # among identical codes; it must appear in the top-3
        assert 42 in set(out["vec_id"])

    def test_partition_invariant(self):
        vecs = _clustered(500, seed=13)
        books = pq_train(vecs, m=4, ks=16)
        outs = []
        for parts in (1, 7):
            ds = ray.data.from_arrow(pa.table({
                "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs.tolist(),
                                      pa.list_(pa.float32())),
            })).repartition(parts)
            codes = pq_encode(ds, books)
            out = pq_topk(codes, books, vecs[[7, 99]], [7, 99],
                          k=5).to_pandas()
            outs.append(sorted(map(tuple,
                                   out[["query_id", "rank", "vec_id"]]
                                   .itertuples(index=False))))
        assert outs[0] == outs[1]


class TestIVFPQ:
    def test_recall_and_pruning(self):
        from web2llmstxt_ray.ops.ann import train_centroids
        from web2llmstxt_ray.ops.pq import ivfpq_topk

        vecs = _clustered(1000, d=32, n_clusters=90, seed=5)
        books = pq_train(vecs[:500], m=8, ks=32)
        cents = train_centroids(vecs[:500], num_lists=16)
        qidx = [3, 77, 401, 888]
        k = 10
        approx = ivfpq_topk(_ds(vecs), books, cents, vecs[qidx], qidx,
                            k=k, nprobe=6).to_pandas()
        exact = brute_force_topk(_ds(vecs), vecs[qidx], qidx,
                                 k=k).to_pandas()
        recalls = []
        for q in qidx:
            a = set(approx.loc[approx["query_id"] == q, "vec_id"])
            e = set(exact.loc[exact["query_id"] == q, "vec_id"])
            recalls.append(len(a & e) / k)
        # IVF pruning (6/16 lists) stacked on PQ: still must find the
        # bulk of true neighbors on clustered data
        assert float(np.mean(recalls)) >= 0.5

    def test_probe_all_lists_equals_plain_pq(self):
        from web2llmstxt_ray.ops.ann import train_centroids
        from web2llmstxt_ray.ops.pq import ivfpq_topk

        vecs = _clustered(400, d=32, seed=21)
        books = pq_train(vecs, m=4, ks=16)
        cents = train_centroids(vecs, num_lists=4)
        qidx = [11, 200]
        full = ivfpq_topk(_ds(vecs), books, cents, vecs[qidx], qidx,
                          k=5, nprobe=4).to_pandas()
        plain = pq_topk(pq_encode(_ds(vecs), books), books,
                        vecs[qidx], qidx, k=5).to_pandas()
        cols = ["query_id", "rank", "vec_id"]
        assert full[cols].values.tolist() == plain[cols].values.tolist()
