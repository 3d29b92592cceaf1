"""Range-partitioned storage layout — the sorted-data primitive.

``write_range_partitioned`` samples quantile boundaries (t-digest over
one pass), assigns each row a range partition with a vectorized
searchsorted, and writes one parquet directory per partition plus a
boundaries manifest. ``read_range_partitioned`` then serves range
queries by reading ONLY the overlapping partitions (directory-level
pruning — the same contract as a lakehouse sorted table / Iceberg
sort order) and applying the residual predicate inside the read.

At 100 TB this is what turns "scan everything and filter" into an
O(selectivity) read; partitions are also the resume/skip unit (a
failed writer re-runs one directory, never one giant file).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .sketch import TDigest


def range_boundaries(ds: ray.data.Dataset, col: str,
                     num_parts: int, delta: int = 400) -> list[float]:
    """num_parts−1 interior split points from a one-pass t-digest."""
    merged = TDigest(delta)
    for row in ds.select_columns([col]).map_batches(
            lambda b: {"d": np.array(
                [TDigest(delta).add(b[col].astype(np.float64)).dumps()],
                dtype=object)},
            batch_format="numpy", batch_size=None).take_all():
        merged.merge(TDigest.loads(row["d"]))
    qs = [i / num_parts for i in range(1, num_parts)]
    bounds = sorted({merged.quantile(q) for q in qs})
    return [float(b) for b in bounds]


def assign_range_parts(ds: ray.data.Dataset, col: str,
                       bounds: list[float]) -> ray.data.Dataset:
    """Append ``_range_part`` = searchsorted(bounds, v, 'right')."""
    barr = np.asarray(bounds, dtype=np.float64)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        b = b.copy()
        b["_range_part"] = np.searchsorted(
            barr, v, side="right").astype(np.int32)
        return b

    return ds.map_batches(assign, batch_format="pandas",
                          batch_size=None)


def write_range_partitioned(ds: ray.data.Dataset, path: str, col: str,
                            num_parts: int, delta: int = 400) -> dict:
    """Write ``ds`` under ``path`` as part_0000/…/part_NNNN parquet
    directories ordered by ``col`` ranges; returns the manifest
    (also persisted as ``_layout.json``, written last)."""
    bounds = range_boundaries(ds, col, num_parts, delta)
    parted = assign_range_parts(ds, col, bounds)
    os.makedirs(path, exist_ok=True)
    parted.write_parquet(path, partition_cols=["_range_part"])
    manifest = {"col": col, "bounds": bounds,
                "num_parts": len(bounds) + 1}
    tmp = os.path.join(path, "._layout.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_layout.json"))
    return manifest


def parts_for_range(bounds: list[float], lo: float | None,
                    hi: float | None) -> list[int]:
    """Partition ids overlapping [lo, hi) — the pruning decision."""
    n = len(bounds) + 1
    first = 0 if lo is None else int(
        np.searchsorted(np.asarray(bounds), lo, side="right"))
    last = n - 1 if hi is None else int(
        np.searchsorted(np.asarray(bounds), hi, side="left"))
    return list(range(first, min(last, n - 1) + 1))


def read_range_partitioned(path: str, lo: float | None = None,
                           hi: float | None = None) -> ray.data.Dataset:
    """Range read with directory pruning + residual filter.

    Only partitions overlapping [lo, hi) are handed to
    ``read_parquet``; the residual predicate re-applies exactly inside
    ``map_batches`` (boundary partitions contain out-of-range rows)."""
    with open(os.path.join(path, "_layout.json")) as f:
        manifest = json.load(f)
    col = manifest["col"]
    keep = parts_for_range(manifest["bounds"], lo, hi)
    dirs = [os.path.join(path, f"_range_part={p}") for p in keep]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(files)

    def residual(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        m = np.ones(len(b), dtype=bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v < hi
        return b[m]

    if lo is None and hi is None:
        return ds
    return ds.map_batches(residual, batch_format="pandas",
                          batch_size=None)
