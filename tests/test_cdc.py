"""CDC merge: latest-wins upserts, deletes, inserts of unseen keys,
multi-version changelogs, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.cdc import cdc_merge


def _merge(base_df, chg_df, parts=(4, 3), **kw):
    base = ray.data.from_pandas(base_df).repartition(parts[0])
    chg = ray.data.from_pandas(chg_df).repartition(parts[1])
    out = cdc_merge(base, chg, "k", ["v"], **kw).to_pandas()
    if out.empty:
        return out
    return out.sort_values("k").reset_index(drop=True)


class TestCdcMerge:
    def test_upsert_delete_insert_keep(self):
        base = pd.DataFrame({"k": np.int64([1, 2, 3, 4]),
                             "v": ["a", "b", "c", "d"]})
        chg = pd.DataFrame({
            "k": np.int64([2, 3, 9]),
            "version": np.int64([10, 11, 12]),
            "op": ["u", "d", "u"],          # update 2, delete 3, insert 9
            "v": ["B", "x", "I"],
        })
        out = _merge(base, chg)
        assert dict(zip(out["k"], out["v"])) == \
            {1: "a", 2: "B", 4: "d", 9: "I"}

    def test_latest_version_wins(self):
        base = pd.DataFrame({"k": np.int64([1]), "v": ["a"]})
        chg = pd.DataFrame({
            "k": np.int64([1, 1, 1]),
            "version": np.int64([3, 7, 5]),
            "op": ["u", "u", "d"],           # v7 ('u') outranks v5 ('d')
            "v": ["v3", "v7", "v5"],
        })
        out = _merge(base, chg)
        assert out["v"].tolist() == ["v7"]

    def test_delete_as_latest_removes(self):
        base = pd.DataFrame({"k": np.int64([1]), "v": ["a"]})
        chg = pd.DataFrame({"k": np.int64([1, 1]),
                            "version": np.int64([1, 2]),
                            "op": ["u", "d"], "v": ["v1", "v2"]})
        assert len(_merge(base, chg)) == 0

    def test_delete_unknown_key_noop(self):
        base = pd.DataFrame({"k": np.int64([1]), "v": ["a"]})
        chg = pd.DataFrame({"k": np.int64([5]),
                            "version": np.int64([1]),
                            "op": ["d"], "v": ["x"]})
        out = _merge(base, chg)
        assert dict(zip(out["k"], out["v"])) == {1: "a"}

    def test_string_keys(self):
        base = pd.DataFrame({"k": ["alpha", "beta"], "v": ["1", "2"]})
        chg = pd.DataFrame({"k": ["beta", "gamma"],
                            "version": np.int64([1, 1]),
                            "op": ["d", "u"], "v": ["-", "3"]})
        out = _merge(base, chg)
        assert dict(zip(out["k"], out["v"])) == \
            {"alpha": "1", "gamma": "3"}

    def test_matches_pandas_oracle_randomized(self):
        rng = np.random.default_rng(31)
        base = pd.DataFrame({
            "k": np.arange(300, dtype=np.int64),
            "v": [f"b{i}" for i in range(300)],
        })
        n = 900
        chg = pd.DataFrame({
            "k": rng.integers(0, 450, n).astype(np.int64),  # some inserts
            "version": rng.permutation(n).astype(np.int64),
            "op": rng.choice(["u", "u", "d"], n),
            "v": [f"c{i}" for i in range(n)],
        })
        out = _merge(base, chg, parts=(7, 5))
        # oracle
        latest = (chg.sort_values("version").groupby("k").last())
        want = {}
        for k, v in zip(base["k"], base["v"]):
            want[k] = v
        for k, row in latest.iterrows():
            if row["op"] == "d":
                want.pop(k, None)
            else:
                want[k] = row["v"]
        assert dict(zip(out["k"], out["v"])) == want

    def test_partition_invariant(self):
        rng = np.random.default_rng(9)
        base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                             "v": [str(i) for i in range(100)]})
        chg = pd.DataFrame({
            "k": rng.integers(0, 120, 200).astype(np.int64),
            "version": np.arange(200, dtype=np.int64),
            "op": rng.choice(["u", "d"], 200, p=[.8, .2]),
            "v": [f"n{i}" for i in range(200)],
        })
        a = _merge(base, chg, parts=(1, 1))
        b = _merge(base, chg, parts=(9, 6))
        assert a.equals(b)


class TestCdcVersionValidation:
    def test_negative_changelog_version_rejected(self):
        # the base sentinel is _ver=-1: a changelog version <= -1 would
        # silently lose latest-wins to the base row, so it must raise
        import pytest

        base = pd.DataFrame({"k": np.int64([1]), "v": ["a"]})
        chg = pd.DataFrame({"k": np.int64([1]),
                            "version": np.int64([-1]),
                            "op": ["d"], "v": ["x"]})
        with pytest.raises((ValueError, Exception),
                           match="must be >= 0"):
            _merge(base, chg)
