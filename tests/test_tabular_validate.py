"""Round-trip tests for the multi-format tabular seam and planted
oracles for the one-pass validation operator."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.validate import validate
from web2llmstxt_ray.sources.tabular import read_table, write_table


def _df() -> pd.DataFrame:
    return pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "v": [f"s{i}" for i in range(50)],
                         "x": np.arange(50, dtype=np.float64) * 1.5})


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("k").reset_index(drop=True)[["k", "v", "x"]]


class TestTabularRoundTrip:
    def _roundtrip(self, fmt: str):
        df = _df()
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t")
            write_table(ray.data.from_pandas(df).repartition(3), p, fmt)
            back = read_table(p, fmt=fmt).to_pandas()
        pd.testing.assert_frame_equal(_canon(back), _canon(df))

    def test_parquet(self):
        self._roundtrip("parquet")

    def test_csv(self):
        self._roundtrip("csv")

    def test_jsonl(self):
        self._roundtrip("jsonl")

    def test_ipc(self):
        self._roundtrip("ipc")

    def test_auto_sniff_and_column_prune(self):
        df = _df()
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.parquet")
            df.to_parquet(p)
            got = read_table(p, columns=["k", "x"]).to_pandas()
            assert sorted(got.columns) == ["k", "x"]
            csvp = os.path.join(d, "t.csv")
            df.to_csv(csvp, index=False)
            got2 = read_table(csvp, columns=["k", "v"]).to_pandas()
            assert sorted(got2.columns) == ["k", "v"]
            assert len(got2) == len(df)


class TestValidate:
    def _dirty(self) -> pd.DataFrame:
        return pd.DataFrame({
            "id": [1, 2, 3, 3, 4, 5, 5, 5],          # dups: 1+2 extra
            "amt": [10.0, -5.0, 20.0, 999.0, None, 30.0, 40.0, 50.0],
            "status": ["a", "b", "zz", "a", "b", "a", "zz", "b"],
        })

    def test_all_rules(self):
        df = self._dirty()
        rules = [
            {"rule": "not_null", "column": "amt"},
            {"rule": "range", "column": "amt", "min": 0.0, "max": 100.0},
            {"rule": "accepted_values", "column": "status",
             "values": ["a", "b"]},
            {"rule": "unique", "column": "id"},
        ]
        out = validate(ray.data.from_pandas(df).repartition(4), rules,
                       num_buckets=4)
        rep = {(r["rule"], r["column"]): r for _, r in out.iterrows()}
        assert rep[("not_null", "amt")]["n_violations"] == 1
        # nulls are NOT range violations (SQL comparison semantics)
        assert rep[("range", "amt")]["n_violations"] == 2   # -5, 999
        assert rep[("accepted_values", "status")]["n_violations"] == 2
        assert rep[("unique", "id")]["n_violations"] == 3   # 1 + 2 extra
        assert not rep[("unique", "id")]["ok"]
        assert all(r["n_rows"] == len(df) for r in rep.values())

    def test_clean_table_all_ok(self):
        df = pd.DataFrame({"id": [1, 2, 3], "amt": [1.0, 2.0, 3.0]})
        out = validate(ray.data.from_pandas(df), [
            {"rule": "unique", "column": "id"},
            {"rule": "range", "column": "amt", "min": 0.0},
        ])
        assert out["ok"].all()
        assert (out["n_violations"] == 0).all()
