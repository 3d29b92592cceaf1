"""Planted-data oracles for the skew-salted join, the keyless
gridded interval join, and triangle counting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.graph import distinct_edges, triangle_count
from web2llmstxt_ray.ops.joins import interval_join
from web2llmstxt_ray.ops.relational import salted_join


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(
        drop=True).astype("int64")


class TestSaltedJoin:
    def _skewed(self):
        rng = np.random.default_rng(7)
        # one hot key = half the left side
        keys = np.concatenate([np.full(500, 3),
                               rng.integers(0, 40, 500)])
        left = pd.DataFrame({"k": keys,
                             "lval": np.arange(len(keys))})
        right = pd.DataFrame({"k": np.arange(40),
                              "rval": np.arange(40) * 10})
        return left, right

    def test_matches_pandas_inner_join_autodetect(self):
        left, right = self._skewed()
        out = salted_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="k",
                          num_buckets=8, salt=4).to_pandas()
        want = left.merge(right, on="k", how="inner")
        pd.testing.assert_frame_equal(_canon(out), _canon(want))

    def test_matches_with_explicit_hot_keys(self):
        left, right = self._skewed()
        out = salted_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="k",
                          num_buckets=8, salt=4,
                          hot_keys=[3, 11]).to_pandas()
        want = left.merge(right, on="k", how="inner")
        pd.testing.assert_frame_equal(_canon(out), _canon(want))

    def test_duplicate_right_rows_fan_out(self):
        left = pd.DataFrame({"k": [1, 1, 2], "lval": [10, 11, 12]})
        right = pd.DataFrame({"k": [1, 1], "rval": [7, 8]})
        out = salted_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="k",
                          hot_keys=[1], salt=3).to_pandas()
        want = left.merge(right, on="k")
        pd.testing.assert_frame_equal(_canon(out), _canon(want))

    def test_no_hot_keys_detected_on_uniform(self):
        rng = np.random.default_rng(1)
        left = pd.DataFrame({"k": rng.permutation(200),
                             "lval": np.arange(200)})
        right = pd.DataFrame({"k": np.arange(0, 200, 2),
                              "rval": np.arange(100)})
        out = salted_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="k",
                          num_buckets=4).to_pandas()
        want = left.merge(right, on="k")
        pd.testing.assert_frame_equal(_canon(out), _canon(want))


class TestIntervalJoin:
    def _brute(self, pts, ivs):
        m = pts.merge(ivs, how="cross")
        m = m[(m["lo"] <= m["x"]) & (m["x"] < m["hi"])]
        return m[["pid", "x", "iid"]]

    def test_overlapping_intervals(self):
        rng = np.random.default_rng(5)
        pts = pd.DataFrame({"pid": np.arange(300),
                            "x": rng.integers(-50, 450, 300)})
        lo = rng.integers(-60, 400, 40)
        ivs = pd.DataFrame({"iid": np.arange(40), "lo": lo,
                            "hi": lo + rng.integers(1, 120, 40)})
        out = interval_join(
            ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
            x_col="x", lo_col="lo", hi_col="hi",
            point_cols=("pid",), interval_cols=("iid",),
            num_buckets=8).to_pandas()
        pd.testing.assert_frame_equal(_canon(out),
                                      _canon(self._brute(pts, ivs)))

    def test_exclusive_upper_bound_and_no_match(self):
        pts = pd.DataFrame({"pid": [0, 1, 2], "x": [10, 20, 999]})
        ivs = pd.DataFrame({"iid": [0], "lo": [10], "hi": [20]})
        out = interval_join(
            ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
            x_col="x", lo_col="lo", hi_col="hi",
            point_cols=("pid",), interval_cols=("iid",)).to_pandas()
        assert out["pid"].tolist() == [0]   # 20 excluded, 999 unmatched


def _tri_oracle(edges: pd.DataFrame) -> int:
    nodes = sorted(set(edges["u"]) | set(edges["v"]))
    idx = {n: i for i, n in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in edges[["u", "v"]].itertuples(index=False):
        if u != v:
            a[idx[u], idx[v]] = a[idx[v], idx[u]] = 1
    return int(np.trace(a @ a @ a) // 6)


class TestTriangleCount:
    def test_k4(self):
        e = pd.DataFrame({"u": [0, 0, 0, 1, 1, 2],
                          "v": [1, 2, 3, 2, 3, 3]})
        assert triangle_count(ray.data.from_pandas(e)) == 4

    def test_path_has_none(self):
        e = pd.DataFrame({"u": [0, 1, 2, 3], "v": [1, 2, 3, 4]})
        assert triangle_count(ray.data.from_pandas(e)) == 0

    def test_duplicates_and_direction_ignored(self):
        e = pd.DataFrame({"u": [0, 1, 2, 2, 0],
                          "v": [1, 2, 0, 0, 1]})   # one triangle, dup'd
        assert triangle_count(ray.data.from_pandas(e)) == 1

    def test_random_graph_matches_matrix_oracle(self):
        rng = np.random.default_rng(11)
        e = pd.DataFrame({"u": rng.integers(0, 60, 500),
                          "v": rng.integers(0, 60, 500)})
        e = e[e.u != e.v]
        got = triangle_count(ray.data.from_pandas(e), num_buckets=8)
        assert got == _tri_oracle(e)

    def test_distinct_edges(self):
        e = pd.DataFrame({"u": [5, 1, 1, 3], "v": [5, 2, 2, 1]})
        out = distinct_edges(ray.data.from_pandas(e)).to_pandas()
        got = set(map(tuple, out[["u", "v"]].to_numpy()))
        assert got == {(1, 2), (1, 3)}
