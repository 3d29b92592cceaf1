"""One-pass table profiling (the ANALYZE/statistics-collection op).

Every per-column statistic here is ADDITIVE (count, null count, min,
max, sum, HLL registers), so the whole profile is one ``map_batches``
pass emitting a few partial rows per block and a driver fold of
O(blocks × columns) partials — no shuffle, no second scan, regardless
of table width or size. This is the op a 100 TB pipeline runs first:
its output sizes the broadcast-vs-shuffle decisions (distinct counts),
validates schema health (null ratios), and feeds range metadata
(min/max) to partition pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .sketch import HyperLogLog


def table_profile(ds: ray.data.Dataset, columns: list[str],
                  approx_distinct: bool = True,
                  hll_p: int = 12) -> pd.DataFrame:
    """Profile ``columns`` in one pass.

    Output (one row per column): ``column, n_rows, n_nulls, min_v,
    max_v, sum_v[, approx_distinct]``. min/max/sum are emitted for
    numeric and temporal columns (as float64 / ISO strings), null for
    others; ``approx_distinct`` is an HLL estimate over the stringified
    values (set ``approx_distinct=False`` for an exactly-reproducible,
    SQL-comparable profile).
    """

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rows: dict = {"column": [], "n": [], "nulls": [], "min_v": [],
                      "max_v": [], "sum_v": [], "hll": []}
        for col in columns:
            arr = batch.column(col)
            rows["column"].append(col)
            rows["n"].append(len(arr))
            rows["nulls"].append(arr.null_count)
            t = arr.type
            if (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_temporal(t)):
                mm = pc.min_max(arr)
                if pa.types.is_temporal(t):
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    rows["min_v"].append(
                        None if mn is None else mn.isoformat())
                    rows["max_v"].append(
                        None if mx is None else mx.isoformat())
                    rows["sum_v"].append(None)
                else:
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    rows["min_v"].append(
                        None if mn is None else float(mn))
                    rows["max_v"].append(
                        None if mx is None else float(mx))
                    s = pc.sum(arr)
                    rows["sum_v"].append(
                        None if s.as_py() is None else float(s.as_py()))
            else:
                rows["min_v"].append(None)
                rows["max_v"].append(None)
                rows["sum_v"].append(None)
            if approx_distinct:
                hll = HyperLogLog(hll_p)
                vals = arr.drop_null()
                hll.add([str(v) for v in vals.to_pylist()])
                rows["hll"].append(hll.dumps())
            else:
                rows["hll"].append(b"")
        # min_v may mix float / ISO-string per column → keep as string
        # partials, retype at the driver
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "min_v": pa.array([None if v is None else str(v)
                               for v in rows["min_v"]], pa.string()),
            "max_v": pa.array([None if v is None else str(v)
                               for v in rows["max_v"]], pa.string()),
            "sum_v": pa.array(rows["sum_v"], pa.float64()),
            "hll": pa.array(rows["hll"], pa.large_binary()),
        })

    agg: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        col = r["column"]
        a = agg.setdefault(col, {"n": 0, "nulls": 0, "min_v": None,
                                 "max_v": None, "sum_v": None,
                                 "hll": HyperLogLog(hll_p)
                                 if approx_distinct else None})
        a["n"] += r["n"]
        a["nulls"] += r["nulls"]
        for key, red in (("min_v", min), ("max_v", max)):
            v = r[key]
            if v is not None:
                # numeric partials stringify as repr(float) — compare
                # numerically when both parse, else lexicographically
                try:
                    v_cmp, old_cmp = float(v), (
                        None if a[key] is None else float(a[key]))
                    a[key] = v if old_cmp is None else str(
                        red(v_cmp, old_cmp))
                except ValueError:
                    a[key] = v if a[key] is None else red(v, a[key])
        if r["sum_v"] is not None:
            a["sum_v"] = (a["sum_v"] or 0.0) + r["sum_v"]
        if approx_distinct and len(r["hll"]):
            a["hll"].merge(HyperLogLog.loads(r["hll"]))
    out = []
    for col in columns:
        a = agg.get(col, {"n": 0, "nulls": 0, "min_v": None,
                          "max_v": None, "sum_v": None, "hll": None})
        rec = {"column": col, "n_rows": a["n"], "n_nulls": a["nulls"],
               "min_v": a["min_v"], "max_v": a["max_v"],
               "sum_v": a["sum_v"]}
        if approx_distinct:
            rec["approx_distinct"] = (
                round(a["hll"].estimate()) if a["hll"] else 0)
        out.append(rec)
    return pd.DataFrame(out)
