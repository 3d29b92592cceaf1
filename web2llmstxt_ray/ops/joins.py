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
              tolerance_s: float | None = None,
              num_buckets: int = 64) -> ray.data.Dataset:
    """For every left row, attach the timestamp of the matched right
    row of the same key: the latest with ``right.ts <= left.ts``
    (``direction="backward"``), the earliest with ``right.ts >=
    left.ts`` (``"forward"``), or the temporally closest
    (``"nearest"``, earlier wins ties — pandas semantics). Output:
    left's ``out_cols`` + ``key_col`` + ``ts_col`` + ``prior_ts``
    (NaT when no match exists).

    ``tolerance_s`` bounds the match distance (a backward match older
    than the tolerance becomes NaT — the staleness cutoff an as-of
    attach against slowly-updating reference data needs); None keeps
    the unbounded classic semantics.

    Inside a bucket, ``pandas.merge_asof(by=key, on=ts)`` does the
    whole bucket in one vectorized pass. ``prior_ts`` (not the matched
    row id) is the output so results are deterministic under timestamp
    ties.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    keep = list(dict.fromkeys([*out_cols, key_col, ts_col]))
    tol = (pd.Timedelta(seconds=tolerance_s)
           if tolerance_s is not None else None)

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
                            direction=direction, tolerance=tol,
                            allow_exact_matches=True)
        return out[keep + ["prior_ts"]]

    return _bucketed_two_sided(left, right, key_col, keep, num_buckets,
                               per_bucket)


def interval_join(points: ray.data.Dataset, intervals: ray.data.Dataset,
                  x_col: str, lo_col: str, hi_col: str,
                  point_cols: tuple[str, ...] = ("event_id",),
                  interval_cols: tuple[str, ...] = ("band_id",),
                  num_buckets: int = 64) -> ray.data.Dataset:
    """General (keyless) interval join: every (point, interval) pair
    with ``lo <= x < hi`` — intervals may OVERLAP arbitrarily, so a
    point can match many intervals. Values are int64 (callers convert
    floats to fixed-point cents first; exact predicates, no float-edge
    ambiguity).

    Scale shape — the classic grid partitioning: the domain is cut
    into cells of width W = max interval length (one cheap aggregate
    over the interval side). An interval then covers at most
    ``len/W + 1 ≤ 2`` consecutive cells, so each interval row is
    replicated to ≤2 cells while each point lands in exactly its own
    cell — matches can only occur inside a shared cell, and since the
    point is in ONE cell no match is ever produced twice. Cells are
    hashed into ``num_buckets`` shuffle buckets; the within-bucket
    merge is a vectorized pandas equi-join on the cell id followed by
    the exact range predicate. Total traffic: one all-to-all of the
    narrow projections, ≤2× the interval side. (Heavily skewed point
    domains concentrate cells; raise num_buckets or sub-salt the hot
    cell — same knob as :func:`~web2llmstxt_ray.ops.relational
    .salted_join`.)
    """
    pkeep = list(dict.fromkeys([*point_cols, x_col]))
    ikeep = list(dict.fromkeys([*interval_cols, lo_col, hi_col]))

    bounds = intervals.map_batches(
        lambda b: pd.DataFrame(
            {"w": [int((b[hi_col] - b[lo_col]).max())]}),
        batch_format="pandas", batch_size=None).to_pandas()
    cell_w = max(int(bounds["w"].max()), 1)

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        b = b[pkeep].copy()
        b["_cell"] = (b[x_col].astype("int64") // cell_w).astype("int64")
        b["_side"] = np.int8(0)
        return b

    def tag_intervals(b: pd.DataFrame) -> pd.DataFrame:
        b = b[ikeep].copy()
        c0 = (b[lo_col].astype("int64") // cell_w).to_numpy()
        # hi is exclusive: last covered cell is (hi-1) // W
        c1 = ((b[hi_col].astype("int64") - 1) // cell_w).to_numpy()
        reps = (c1 - c0 + 1).astype("int64")
        rep = b.loc[b.index.repeat(reps)].reset_index(drop=True)
        # cell = c0 + offset-within-interval, vectorized run expansion
        offs = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        rep["_cell"] = np.repeat(c0, reps) + offs
        rep["_side"] = np.int8(1)
        return rep

    all_cols = list(dict.fromkeys([*pkeep, *ikeep]))

    def align(b: pd.DataFrame) -> pd.DataFrame:
        return b.reindex(columns=[*all_cols, "_cell", "_side"])

    lt = points.map_batches(tag_points, batch_format="pandas",
                            batch_size=None).map_batches(
        align, batch_format="pandas", batch_size=None)
    rt = intervals.map_batches(tag_intervals, batch_format="pandas",
                               batch_size=None).map_batches(
        align, batch_format="pandas", batch_size=None)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            h = (b["_cell"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
        b["_jbucket"] = ((h >> np.uint64(33))
                         % np.uint64(num_buckets)).astype("int32")
        return b

    unioned = lt.union(rt).map_batches(add_bucket, batch_format="pandas",
                                       batch_size=None)

    out_cols = [*point_cols, x_col, *interval_cols]

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        pts = group[group["_side"] == 0][[*pkeep, "_cell"]]
        ivs = group[group["_side"] == 1][[*ikeep, "_cell"]]
        if pts.empty or ivs.empty:
            return group[out_cols].iloc[0:0]
        m = pts.merge(ivs, on="_cell", how="inner")
        m = m[(m[lo_col] <= m[x_col]) & (m[x_col] < m[hi_col])]
        return m[out_cols]

    return unioned.groupby("_jbucket").map_groups(per_bucket,
                                                  batch_format="pandas")


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
