"""Market-basket pair co-occurrence (ops/basket.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from web2llmstxt_ray.ops.basket import _explode_pairs, pair_cooccurrence


class TestExplodePairs:
    def test_brute_force_equivalence(self):
        rng = np.random.RandomState(7)
        grp = np.sort(rng.randint(0, 40, 300))
        # per-group-unique items, pre-sorted within group
        df = (pd.DataFrame({"g": grp, "i": rng.randint(0, 1000, 300)})
              .drop_duplicates().sort_values(["g", "i"])
              .reset_index(drop=True))
        a, b = _explode_pairs(df["g"].to_numpy(), df["i"].to_numpy())
        got = sorted(zip(a.tolist(), b.tolist()))
        want = []
        for _, sub in df.groupby("g"):
            items = sub["i"].tolist()
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    want.append((items[x], items[y]))
        assert got == sorted(want)
        # sorted input → item_a < item_b on every pair
        assert (a < b).all()

    def test_empty_and_singletons(self):
        a, b = _explode_pairs(np.array([], dtype=np.int64),
                              np.array([], dtype=np.int64))
        assert len(a) == 0 and len(b) == 0
        # all-singleton groups yield no pairs
        a, b = _explode_pairs(np.array([1, 2, 3]), np.array([9, 8, 7]))
        assert len(a) == 0


class TestPairCooccurrence:
    def test_matches_self_join_and_partition_invariance(self):
        rng = np.random.RandomState(11)
        df = pd.DataFrame({
            "order": rng.randint(0, 150, 1200),
            "item": rng.randint(0, 25, 1200),
        })
        outs = []
        for parts in (1, 7):
            out = pair_cooccurrence(
                ray.data.from_pandas(df).repartition(parts),
                "order", "item", k=15)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # brute-force self-join oracle
        d = df.drop_duplicates()
        j = d.merge(d, on="order")
        j = j.loc[j["item_x"] < j["item_y"]]
        cnt = (j.groupby(["item_x", "item_y"], as_index=False)
               .size().rename(columns={"size": "cnt",
                                       "item_x": "item_a",
                                       "item_y": "item_b"}))
        want = cnt.sort_values(["cnt", "item_a", "item_b"],
                               ascending=[False, True, True],
                               kind="stable").head(15) \
            .reset_index(drop=True)
        got = outs[0].astype({"cnt": "int64"})
        assert got["item_a"].tolist() == want["item_a"].tolist()
        assert got["item_b"].tolist() == want["item_b"].tolist()
        assert got["cnt"].tolist() == want["cnt"].tolist()

    def test_duplicate_rows_count_once_per_group(self):
        # the same (group, item) row twice must not inflate counts
        df = pd.DataFrame({"order": [1, 1, 1, 2, 2],
                           "item": [10, 10, 20, 10, 20]})
        out = pair_cooccurrence(ray.data.from_pandas(df),
                                "order", "item", k=5)
        assert out.iloc[0].tolist() == [10, 20, 2]
        assert len(out) == 1
