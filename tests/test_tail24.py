"""Edge-case tests for the twenty-sixth-wave operators (1-NN label
coherence, cheapest cross-brand substitute)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.ann import knn_label_accuracy
from web2llmstxt_ray.ops.relational import cheapest_substitute


class TestKnnLabelAccuracy:
    def test_separated_clusters_score_one(self):
        vecs = [[1.0, 0.0], [0.9, 0.1], [0.95, 0.0],
                [-1.0, 0.0], [-0.9, -0.1], [-0.95, 0.0]]
        df = pd.DataFrame({"vec_id": range(6),
                           "embedding": vecs,
                           "label": [0, 0, 0, 1, 1, 1]})
        got = knn_label_accuracy(ray.data.from_pandas(df),
                                 num_blocks=2, num_buckets=4)
        assert got["label"].tolist() == [0, 1]
        assert got["accuracy"].tolist() == [1.0, 1.0]
        assert got["n"].tolist() == [3, 3]

    def test_interleaved_labels_score_zero(self):
        # nearest neighbor always carries the other label
        vecs = [[1.0, 0.0], [0.99, 0.0], [-1.0, 0.0], [-0.99, 0.0]]
        df = pd.DataFrame({"vec_id": range(4),
                           "embedding": vecs,
                           "label": [0, 1, 0, 1]})
        got = knn_label_accuracy(ray.data.from_pandas(df),
                                 num_blocks=2, num_buckets=4)
        assert got["accuracy"].tolist() == [0.0, 0.0]

    def test_tie_breaks_to_lower_id(self):
        df = pd.DataFrame({"vec_id": [0, 1, 2],
                           "embedding": [[1.0, 0.0]] * 3,
                           "label": [0, 0, 1]})
        got = knn_label_accuracy(ray.data.from_pandas(df),
                                 num_blocks=2, num_buckets=4)
        m = dict(zip(got["label"], got["accuracy"]))
        # ids 0,1 pick each other (label 0, correct); id 2 picks id 0
        assert m == {0: 1.0, 1: 0.0}

    def test_partition_invariant(self):
        rng = np.random.default_rng(83)
        X = rng.normal(size=(60, 6)).astype(np.float32)
        df = pd.DataFrame({"vec_id": range(60),
                           "embedding": [x.tolist() for x in X],
                           "label": rng.integers(0, 3, 60)})
        a = knn_label_accuracy(
            ray.data.from_pandas(df).repartition(1),
            num_blocks=2, num_buckets=4)
        b = knn_label_accuracy(
            ray.data.from_pandas(df).repartition(7),
            num_blocks=5, num_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestCheapestSubstitute:
    def _run(self, rows, **kw):
        df = pd.DataFrame({
            "k": [r[0] for r in rows],
            "brand": [r[1] for r in rows],
            "t": [r[2] for r in rows],
            "price": [float(r[3]) for r in rows]})
        return cheapest_substitute(
            ray.data.from_pandas(df), key_col="k",
            group_cols=["t"], brand_col="brand",
            price_col="price", **kw)

    def test_hand_fixture(self):
        rows = [(1, "A", "x", 0.10), (2, "A", "x", 0.05),
                (3, "B", "x", 0.07)]
        got = self._run(rows, num_buckets=4)
        m = {r.k: (r.sub_key, r.sub_price_cents,
                   r.price_delta_cents)
             for r in got.itertuples()}
        assert m == {1: (3, 7, 3), 2: (3, 7, -2), 3: (2, 5, 2)}

    def test_single_brand_group_omitted(self):
        rows = [(1, "A", "x", 0.10), (2, "A", "x", 0.05)]
        got = self._run(rows, num_buckets=4)
        assert len(got) == 0

    def test_price_tie_breaks_to_lower_key(self):
        rows = [(5, "A", "x", 0.10), (6, "B", "x", 0.03),
                (7, "C", "x", 0.03)]
        got = self._run(rows, num_buckets=4)
        m = dict(zip(got["k"], got["sub_key"]))
        assert m[5] == 6          # 6 and 7 tie on price → lower key
        assert m[6] == 7          # 6 can't pick itself or brand B
        assert m[7] == 6

    def test_partition_invariant(self):
        rng = np.random.default_rng(89)
        rows = [(i, str(b), str(t), float(p) / 100) for i, (b, t, p)
                in enumerate(zip(rng.choice(list("ABC"), 300),
                                 rng.choice(list("uvw"), 300),
                                 rng.integers(1, 500, 300)))]
        df = pd.DataFrame({
            "k": [r[0] for r in rows],
            "brand": [r[1] for r in rows],
            "t": [r[2] for r in rows],
            "price": [r[3] for r in rows]})
        a = cheapest_substitute(
            ray.data.from_pandas(df).repartition(1), "k", ["t"],
            "brand", "price", num_buckets=4)
        b = cheapest_substitute(
            ray.data.from_pandas(df).repartition(9), "k", ["t"],
            "brand", "price", num_buckets=16)
        pd.testing.assert_frame_equal(a, b)
