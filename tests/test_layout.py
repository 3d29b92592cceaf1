"""Range-partitioned layout: boundary assignment, directory pruning,
round-trip completeness, pruned range reads vs exact filter."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.layout import (parts_for_range,
                                        read_range_partitioned,
                                        write_range_partitioned)


def _df(n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": rng.lognormal(size=n),
    })


class TestPartsForRange:
    def test_pruning_math(self):
        bounds = [10.0, 20.0, 30.0]
        assert parts_for_range(bounds, None, None) == [0, 1, 2, 3]
        assert parts_for_range(bounds, 12.0, 18.0) == [1]
        assert parts_for_range(bounds, 5.0, 15.0) == [0, 1]
        assert parts_for_range(bounds, 20.0, 20.5) == [2]  # v>=20 → part 2
        assert parts_for_range(bounds, 35.0, None) == [3]
        assert parts_for_range(bounds, None, 10.0) == [0]


class TestRangeLayout:
    def test_roundtrip_and_pruned_reads(self, tmp_path):
        df = _df()
        path = str(tmp_path / "lay")
        manifest = write_range_partitioned(
            ray.data.from_pandas(df).repartition(8), path, "v",
            num_parts=8)
        assert len(manifest["bounds"]) == 7
        # every partition directory exists and is disjoint + complete
        full = read_range_partitioned(path).to_pandas()
        assert sorted(full["id"]) == sorted(df["id"])
        # partition dirs hold only in-range rows
        import pyarrow.parquet as pq
        b = manifest["bounds"]
        for p in range(manifest["num_parts"]):
            d = os.path.join(path, f"_range_part={p}")
            if not os.path.isdir(d):
                continue
            t = pq.read_table(d).to_pandas()
            if p > 0:
                assert (t["v"] > b[p - 1]).all()
            if p < len(b):
                assert (t["v"] <= b[p]).all()

        lo, hi = float(np.quantile(df["v"], 0.3)), \
            float(np.quantile(df["v"], 0.6))
        got = read_range_partitioned(path, lo, hi).to_pandas()
        want = df[(df["v"] >= lo) & (df["v"] < hi)]
        assert sorted(got["id"]) == sorted(want["id"])
        # pruning actually skipped most partitions
        assert len(parts_for_range(manifest["bounds"], lo, hi)) \
            <= manifest["num_parts"] - 2

    def test_empty_range(self, tmp_path):
        df = _df(2000, seed=7)
        path = str(tmp_path / "lay2")
        write_range_partitioned(ray.data.from_pandas(df), path, "v",
                                num_parts=4)
        got = read_range_partitioned(path, 10**9, None).to_pandas()
        assert len(got) == 0


class TestZOrder:
    def test_spread_and_zvalue_props(self):
        from web2llmstxt_ray.ops.layout import (_spread_bits_32,
                                                zorder_values)
        import numpy as np

        # spread: bit i of x lands at bit 2i
        x = np.array([0b1011], dtype=np.uint32)
        assert int(_spread_bits_32(x)[0]) == 0b1000101
        # coordinate monotonicity (the soundness property)
        r = (0.0, 100.0)
        z = lambda a, b: int(zorder_values(np.array([a]),
                                           np.array([b]), r, r)[0])
        assert z(10, 10) <= z(20, 10) <= z(20, 20)
        assert z(5, 50) <= z(5, 60)

    def test_box_read_exact_and_pruned(self, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.layout import (read_zorder_box,
                                                write_zorder_partitioned,
                                                zorder_parts_for_box)

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "id": np.arange(30_000, dtype=np.int64),
            "x": rng.uniform(0, 1000, 30_000),
            "y": rng.uniform(0, 1000, 30_000),
        })
        path = str(tmp_path / "zlay")
        manifest = write_zorder_partitioned(
            ray.data.from_pandas(df).repartition(8), path, "x", "y",
            num_parts=32)
        box = (100.0, 200.0, 300.0, 400.0)
        got = read_zorder_box(path, *box).to_pandas()
        want = df[(df["x"] >= box[0]) & (df["x"] < box[1])
                  & (df["y"] >= box[2]) & (df["y"] < box[3])]
        assert sorted(got["id"]) == sorted(want["id"])
        # the 10%x10% box must prune a substantial share of partitions
        touched = len(zorder_parts_for_box(manifest, *box))
        assert touched < manifest["num_parts"]

    def test_full_read_complete(self, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.layout import (read_zorder_box,
                                                write_zorder_partitioned)

        rng = np.random.default_rng(2)
        df = pd.DataFrame({
            "id": np.arange(3000, dtype=np.int64),
            "x": rng.uniform(-5, 5, 3000),
            "y": rng.uniform(10, 20, 3000),
        })
        path = str(tmp_path / "zlay2")
        write_zorder_partitioned(ray.data.from_pandas(df), path,
                                 "x", "y", num_parts=8)
        got = read_zorder_box(path, -5.0, 5.0001, 10.0,
                              20.0001).to_pandas()
        assert sorted(got["id"]) == sorted(df["id"])


class TestBigmin:
    def test_bruteforce_small_bits(self):
        import bisect
        import random

        from web2llmstxt_ray.ops.layout import (_merge_dims,
                                                next_z_in_box)

        bits = 4
        N = 1 << bits
        rng = random.Random(11)
        for _ in range(60):
            a0, a1 = sorted(rng.randrange(N) for _ in range(2))
            b0, b1 = sorted(rng.randrange(N) for _ in range(2))
            inbox = sorted(_merge_dims(a, b)
                           for a in range(a0, a1 + 1)
                           for b in range(b0, b1 + 1))
            for _ in range(20):
                z = rng.randrange(1 << (2 * bits))
                i = bisect.bisect_left(inbox, z)
                want = inbox[i] if i < len(inbox) else None
                assert next_z_in_box(z, (a0, a1), (b0, b1),
                                     bits) == want

    def test_integer_boundary_partition_not_pruned(self):
        # regression: a z-code EQUAL to a partition boundary belongs to
        # the right-hand partition (searchsorted side='right'); the old
        # floor(bound)+1 lower edge excluded it from the BIGMIN test and
        # wrongly pruned the partition when it was the only in-box code
        from web2llmstxt_ray.ops.layout import (_merge_dims,
                                                zorder_parts_for_box_exact)

        z0 = int(_merge_dims(3, 5))
        manifest = {"bits": 4, "a_range": [0.0, 15.0],
                    "b_range": [0.0, 15.0], "bounds": [float(z0)],
                    "num_parts": 2}
        # point box (a=3, b=5) quantizes to itself: z0 is the ONLY
        # in-box code, and it sits exactly on the boundary → part 1
        assert zorder_parts_for_box_exact(
            manifest, 3.0, 3.0, 5.0, 5.0) == [1]

    def test_duplicate_heavy_integer_grid_box_exact(self, tmp_path):
        # low-cardinality integer coords: t-digest boundaries interpolate
        # between integer centroid means and can land exactly on codes
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.layout import (read_zorder_box,
                                                write_zorder_partitioned)

        rng = np.random.default_rng(17)
        n = 12_000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 8, n).astype(np.float64),
            "y": rng.integers(0, 8, n).astype(np.float64),
        })
        path = str(tmp_path / "zdup")
        write_zorder_partitioned(
            ray.data.from_pandas(df).repartition(6), path, "x", "y",
            num_parts=16, bits=3)
        for box in [(2.0, 5.0, 1.0, 4.0), (0.0, 1.5, 6.0, 7.5),
                    (3.0, 3.5, 3.0, 3.5), (5.0, 8.0, 0.0, 8.0)]:
            got = read_zorder_box(path, *box).to_pandas()
            want = df[(df["x"] >= box[0]) & (df["x"] < box[1])
                      & (df["y"] >= box[2]) & (df["y"] < box[3])]
            assert sorted(got["id"]) == sorted(want["id"]), box

    def test_exact_pruning_subset_and_read_exact(self, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data

        from web2llmstxt_ray.ops.layout import (
            read_zorder_box, write_zorder_partitioned,
            zorder_parts_for_box, zorder_parts_for_box_exact)

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "id": np.arange(20_000, dtype=np.int64),
            "x": rng.uniform(0, 100, 20_000),
            "y": rng.uniform(0, 100, 20_000),
        })
        path = str(tmp_path / "zb")
        manifest = write_zorder_partitioned(
            ray.data.from_pandas(df).repartition(6), path, "x", "y",
            num_parts=32)
        box = (80.0, 95.0, 5.0, 20.0)   # off-diagonal → z gaps
        bracket = zorder_parts_for_box(manifest, *box)
        exact = zorder_parts_for_box_exact(manifest, *box)
        assert set(exact) <= set(bracket)
        got = read_zorder_box(path, *box).to_pandas()
        want = df[(df["x"] >= box[0]) & (df["x"] < box[1])
                  & (df["y"] >= box[2]) & (df["y"] < box[3])]
        assert sorted(got["id"]) == sorted(want["id"])
