"""HyperLogLog sketch: accuracy, mergeability, shuffle-free distinct."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.sketch import HyperLogLog, approx_distinct, approx_distinct_by_key


class TestHLL:
    def test_accuracy_within_bound(self):
        hll = HyperLogLog(p=12)  # std error ≈ 1.04/sqrt(4096) ≈ 1.6%
        n = 50_000
        hll.add([f"item-{i}" for i in range(n)])
        assert abs(hll.estimate() - n) / n < 0.05

    def test_small_range_linear_counting(self):
        hll = HyperLogLog(p=12)
        hll.add([f"x{i}" for i in range(100)])
        assert abs(hll.estimate() - 100) < 5

    def test_duplicates_ignored(self):
        hll = HyperLogLog(p=12)
        hll.add(["a", "b", "c"] * 1000)
        assert abs(hll.estimate() - 3) < 1

    def test_merge_equals_union(self):
        a, b, u = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
        xs = [f"x{i}" for i in range(5000)]
        ys = [f"y{i}" for i in range(5000)]
        a.add(xs)
        b.add(ys)
        u.add(xs + ys)
        a.merge(b)
        assert np.array_equal(a.registers, u.registers)

    def test_serialization_roundtrip(self):
        hll = HyperLogLog(10)
        hll.add([f"v{i}" for i in range(1000)])
        again = HyperLogLog.loads(hll.dumps())
        assert again.estimate() == hll.estimate()


class TestDatasetIntegration:
    def test_approx_distinct_vs_exact(self):
        vals = [f"user-{i % 3000}" for i in range(30_000)]
        ds = ray.data.from_arrow(pa.table({"u": vals})).repartition(8)
        est = approx_distinct(ds, "u", p=12)
        assert abs(est - 3000) / 3000 < 0.05

    def test_by_key(self, ):
        rows = {"k": [], "v": []}
        for i in range(12_000):
            rows["k"].append("a" if i % 3 else "b")
            rows["v"].append(f"u{i % 500}" if i % 3 else f"u{i % 50}")
        ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
        est = approx_distinct_by_key(ds, "k", "v", p=12)
        assert abs(est["a"] - 500) / 500 < 0.08
        assert abs(est["b"] - 50) / 50 < 0.08


class TestCountMin:
    def test_overestimate_and_accuracy(self):
        from web2llmstxt_ray.ops.sketch import CountMinSketch

        rng = np.random.RandomState(7)
        vals = [f"k{int(v)}" for v in rng.zipf(1.3, size=20_000)]
        cms = CountMinSketch(depth=4, width=4096)
        cms.add(vals)
        true = Counter(vals)
        keys = list(true)
        est = cms.estimate(keys)
        for k, e in zip(keys, est):
            assert e >= true[k]                      # never underestimates
        heavy = [k for k in keys if true[k] > 100]
        for k, e in zip(keys, est):
            if k in heavy:
                assert e - true[k] <= 0.01 * len(vals)

    def test_merge_equals_single(self):
        from web2llmstxt_ray.ops.sketch import CountMinSketch

        a, b, whole = (CountMinSketch(4, 512) for _ in range(3))
        v1, v2 = ["x"] * 30 + ["y"] * 5, ["y"] * 7 + ["z"] * 2
        a.add(v1), b.add(v2), whole.add(v1 + v2)
        merged = a.merge(b)
        assert (merged.table == whole.table).all()

    def test_serialization_roundtrip(self):
        from web2llmstxt_ray.ops.sketch import CountMinSketch

        cms = CountMinSketch(3, 256)
        cms.add(["a", "b", "a"])
        again = CountMinSketch.loads(cms.dumps())
        assert (again.table == cms.table).all()
        assert (again.estimate(["a", "b", "c"]) == cms.estimate(["a", "b", "c"])).all()

    def test_heavy_hitters_dataset(self):
        from web2llmstxt_ray.ops.sketch import heavy_hitters

        vals = (["hot1"] * 4000 + ["hot2"] * 2500 + ["hot3"] * 1500
                + [f"cold{i}" for i in range(4000)])
        np.random.RandomState(1).shuffle(vals)
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(6)
        top = heavy_hitters(ds, "v", k=3)
        assert [v for v, _ in top] == ["hot1", "hot2", "hot3"]
        true = {"hot1": 4000, "hot2": 2500, "hot3": 1500}
        for v, est in top:
            assert true[v] <= est <= true[v] + 0.01 * 12000
