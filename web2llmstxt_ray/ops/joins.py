"""Temporal joins over the ordered ``events`` log: as-of and range.

Ray Data has neither an as-of join nor a range (interval) join; both
need one key's events co-located and time-sorted. The engine reuses the
sessionize partitioning shape (``ops/windows.py``): shuffle once on
``hash(key) % num_buckets`` — NOT on the raw high-cardinality key, which
would make one 1-row map_groups block per user — then do every key in a
bucket with one vectorized pandas/numpy pass. Both sides of the join
carry the same bucket id, so a bucket group contains every row needed
to answer its keys exactly; no pairwise cross-bucket traffic exists.

At cluster scale this is a single all-to-all of the (narrow, projected)
event columns; ``num_buckets`` should be ~4× total cores so the
per-bucket pandas sort stays in cache and stragglers even out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .windows import _add_key_bucket


def _bucketed_two_sided(left: ray.data.Dataset, right: ray.data.Dataset,
                        key_col: str, keep: list[str], num_buckets: int,
                        per_bucket) -> ray.data.Dataset:
    """Tag each side, bucket by key hash, and run ``per_bucket`` once
    per bucket over the union. Sides are distinguished by a ``_side``
    column so ONE shuffle serves both inputs; both sides are projected
    to the same ``keep`` columns first (union needs one schema, and
    narrow rows are what make the all-to-all cheap)."""
    import pyarrow as pa

    def tag(side: int):
        def add(batch: pa.Table) -> pa.Table:
            return batch.select(keep).append_column(
                "_side", pa.array(np.full(len(batch), side, dtype=np.int8)))
        return add

    lt = _add_key_bucket(left.map_batches(tag(0), batch_format="pyarrow"),
                         key_col, num_buckets)
    rt = _add_key_bucket(right.map_batches(tag(1), batch_format="pyarrow"),
                         key_col, num_buckets)
    return lt.union(rt).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key_col: str = "user_id", ts_col: str = "ts",
              out_cols: tuple[str, ...] = ("event_id",),
              direction: str = "backward",
              num_buckets: int = 64) -> ray.data.Dataset:
    """For every left row, attach the timestamp of the matched right
    row of the same key: the latest with ``right.ts <= left.ts``
    (``direction="backward"``), the earliest with ``right.ts >=
    left.ts`` (``"forward"``), or the temporally closest
    (``"nearest"``, earlier wins ties — pandas semantics). Output:
    left's ``out_cols`` + ``key_col`` + ``ts_col`` + ``prior_ts``
    (NaT when no match exists).

    Inside a bucket, ``pandas.merge_asof(by=key, on=ts)`` does the
    whole bucket in one vectorized pass. ``prior_ts`` (not the matched
    row id) is the output so results are deterministic under timestamp
    ties.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    keep = list(dict.fromkeys([*out_cols, key_col, ts_col]))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["_side"] == 0][keep].sort_values(ts_col, kind="stable")
        r = group[group["_side"] == 1][[key_col, ts_col]].sort_values(
            ts_col, kind="stable")
        r = r.assign(prior_ts=r[ts_col])[[key_col, "prior_ts", ts_col]]
        if r.empty:
            # dtype-pinned NaT so every bucket block shares one schema
            return l.assign(prior_ts=pd.Series(
                pd.NaT, index=l.index, dtype=l[ts_col].dtype))
        out = pd.merge_asof(l, r, on=ts_col, by=key_col,
                            direction=direction, allow_exact_matches=True)
        return out[keep + ["prior_ts"]]

    return _bucketed_two_sided(left, right, key_col, keep, num_buckets,
                               per_bucket)


def range_join_count(left: ray.data.Dataset, right: ray.data.Dataset,
                     window_s: float, key_col: str = "user_id",
                     ts_col: str = "ts",
                     out_cols: tuple[str, ...] = ("event_id",),
                     num_buckets: int = 64) -> ray.data.Dataset:
    """For every left row, count right rows of the same key with
    ``left.ts - window_s < right.ts <= left.ts`` (a trailing interval
    join, the 'views in the hour before each purchase' shape).

    Per bucket: sort each key's right timestamps once, then two
    vectorized ``searchsorted`` probes per key give every left row's
    count — O((L+R) log R) per key, no pairwise expansion, which is
    what makes the interval join safe when a key has many rows.
    Output: left's ``out_cols`` + ``key_col`` + ``ts_col`` + ``n_in_window``.
    """
    keep = list(dict.fromkeys([*out_cols, key_col, ts_col]))
    delta = pd.Timedelta(seconds=window_s)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["_side"] == 0][keep]
        r = group[group["_side"] == 1][[key_col, ts_col]]
        outs = []
        r_by_key = {k: np.sort(g[ts_col].to_numpy())
                    for k, g in r.groupby(key_col, sort=False)}
        for k, g in l.groupby(key_col, sort=False):
            ts = g[ts_col].to_numpy()
            rts = r_by_key.get(k)
            if rts is None or len(rts) == 0:
                outs.append(g.assign(n_in_window=np.int64(0)))
                continue
            hi = np.searchsorted(rts, ts, side="right")
            lo = np.searchsorted(rts, ts - delta.to_numpy(), side="right")
            outs.append(g.assign(n_in_window=(hi - lo).astype(np.int64)))
        if not outs:
            return l.assign(n_in_window=np.int64(0))
        return pd.concat(outs, ignore_index=True)[keep + ["n_in_window"]]

    return _bucketed_two_sided(left, right, key_col, keep, num_buckets,
                               per_bucket)
