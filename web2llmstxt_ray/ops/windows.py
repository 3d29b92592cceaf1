"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windowing; the engine's pattern (per the
public Ray guidance) is: partition by key, sort within the group, and
window with pandas inside ``groupby().map_groups``. Tumbling windows
reduce to a grouped aggregate on a floored-timestamp key — so they use
the scale-friendly partial-aggregation path instead of map_groups.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .relational import partial_groupby


def tumbling_window(ds: ray.data.Dataset, freq: str = "h",
                    key_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value") -> pd.DataFrame:
    """Per (key, window-start) count + sum over fixed windows.

    Window assignment is embarrassingly parallel (a floor inside
    ``map_batches``); the aggregate uses per-block partials so only
    ``O(blocks × windows)`` rows leave the workers (driver combine —
    see ``partial_groupby``).
    """

    def batch_agg(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(window_start=batch[ts_col].dt.floor(freq))
        g = batch.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum"))
        return g

    return partial_groupby(ds, [key_col, "window_start"], batch_agg,
                           ["n_events", "sum_value"])


def hopping_window(ds: ray.data.Dataset, size_s: int = 3600,
                   hop_s: int = 900, key_col: str = "event_type",
                   ts_col: str = "ts",
                   value_col: str = "value") -> pd.DataFrame:
    """Per (key, window-start) count + sum over OVERLAPPING windows of
    ``size_s`` seconds advancing every ``hop_s`` (``size_s`` must be a
    multiple of ``hop_s``). An event at time t belongs to exactly
    ``size_s/hop_s`` windows; the expansion is a vectorized numpy
    repeat inside ``map_batches`` (each event contributes its
    replicas *before* aggregation), and the aggregate then rides the
    same partial-combine path as :func:`tumbling_window` — only
    ``O(blocks × windows)`` partial rows shuffle, never the replicated
    events themselves.
    """
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def batch_agg(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        # normalize to ns first: Arrow-backed frames surface M8[us]
        epoch = (batch[ts_col].astype("datetime64[ns]").astype("int64")
                 // 1_000_000_000)
        base = (epoch // hop_s) * hop_s
        starts = (np.repeat(base.to_numpy(), k)
                  - np.tile(np.arange(k) * hop_s, len(batch)))
        rep = batch.loc[batch.index.repeat(k)].assign(
            window_start=pd.to_datetime(starts, unit="s"))
        return rep.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum"))

    return partial_groupby(ds, [key_col, "window_start"], batch_agg,
                           ["n_events", "sum_value"])


def _add_key_bucket(ds: ray.data.Dataset, key_col: str,
                    num_buckets: int) -> ray.data.Dataset:
    """Append ``_sbucket = hash(key) % num_buckets`` (vectorized)."""
    import numpy as np
    import pyarrow as pa

    from ..ops.dedup import _id_blocks

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _id_blocks(batch.column(key_col).to_pylist(), num_buckets)
        return batch.append_column("_sbucket", pa.array(b, pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, gap_minutes: float = 30.0,
               key_col: str = "user_id", ts_col: str = "ts",
               num_buckets: int = 64) -> ray.data.Dataset:
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``.

    Sessionization needs all of one key's events co-located — but
    ``groupby(user_id)`` makes one map_groups call (and a 1-row output
    block) per USER, the high-cardinality-key pathology. Instead the
    shuffle key is ``hash(user) % num_buckets``: one well-sized group
    per bucket, and a vectorized pandas groupby inside the bucket does
    every user in that bucket at once. Same output, ~num_buckets tasks.
    Output: (key, n_sessions, n_events).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col])
        brk = g.groupby(key_col)[ts_col].diff() > gap
        out = g.assign(_brk=brk.astype("int64")).groupby(
            key_col, as_index=False).agg(
            n_sessions=("_brk", "sum"), n_events=("_brk", "size"))
        out["n_sessions"] = out["n_sessions"] + 1
        return out[[key_col, "n_sessions", "n_events"]]

    return _add_key_bucket(ds, key_col, num_buckets).groupby(
        "_sbucket").map_groups(per_bucket, batch_format="pandas")


def running_totals(ds: ray.data.Dataset, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Per-event cumulative window aggregates — the SQL
    ``... OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` family, which Ray Data has no native operator for.

    Shape: one bucketed shuffle of the skinny projection
    (hash(key) % num_buckets, same anti-pathology as
    :func:`sessionize`), a within-bucket sort, then vectorized pandas
    ``groupby(...).cumsum/cumcount/cummax`` computes every key in the
    bucket at once. The running sum is carried in integer cents
    (``round(value·100)``) so sequential accumulation is BIT-EXACT
    against the SQL window oracle — float cumsum association order
    would otherwise diverge between engines.

    Output: (event_id, user_id, run_n, run_sum_cents, run_max).
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        g = g.assign(_cents=cents)
        by = g.groupby(key_col, sort=False)
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "run_n": (by.cumcount() + 1).to_numpy(),
            "run_sum_cents": by["_cents"].cumsum().to_numpy(),
            "run_max": by[value_col].cummax().to_numpy(),
        })
        return out

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def ntile(ds: ray.data.Dataset, n: int = 4, key_col: str = "user_id",
          ts_col: str = "ts", id_col: str = "event_id",
          num_buckets: int = 64) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY ts, id)``: rows
    of each partition split into ``n`` near-equal ordered buckets, the
    first ``count % n`` buckets one row larger (the ANSI/DuckDB
    convention). Same bucketed-shuffle + within-bucket vectorized shape
    as :func:`running_totals` — the tile index is computed for every
    key in a bucket at once from the 0-based rank and the partition
    size via the exact piecewise formula (no float approximation).
    Output: (event_id, user_id, tile)."""
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        by = g.groupby(key_col, sort=False)
        r = by.cumcount().to_numpy()                     # 0-based rank
        c = by[id_col].transform("size").to_numpy()      # partition size
        q, rem = c // n, c % n
        big = rem * (q + 1)             # rows covered by the larger tiles
        in_big = r < big
        # q can be 0 when the partition has fewer rows than n tiles —
        # every row is then in a "big" tile of size 1 (guarded np.divide).
        small = np.zeros_like(r)
        np.divide(r - big, q, out=small, where=q > 0, casting="unsafe")
        tile = np.where(in_big, r // (q + 1), rem + small) + 1
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "tile": tile.astype("int64"),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col]), key_col,
        num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def rolling_sum(ds: ray.data.Dataset, window: int = 4,
                key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value",
                num_buckets: int = 64) -> ray.data.Dataset:
    """Sliding window frame: SQL ``sum(cents) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.
    Bucketed shuffle + per-bucket vectorized pandas ``groupby.rolling``
    over integer cents, so the bounded-frame sum is BIT-EXACT vs the
    SQL window oracle (float association order never enters).
    Output: (event_id, user_id, win_sum_cents, win_n)."""
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        g = g.assign(_cents=cents)
        roll = g.groupby(key_col, sort=False)["_cents"].rolling(
            window, min_periods=1)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "win_sum_cents": roll.sum().to_numpy().astype("int64"),
            "win_n": roll.count().to_numpy().astype("int64"),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def session_stats(ds: ray.data.Dataset, gap_minutes: float = 30.0,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Exploded per-session rows: (key, session_idx, n_events,
    duration_s, sum_value) — the windowed-aggregate building block.
    Same bucket-then-vectorized-groupby shape as :func:`sessionize`."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col])
        brk = (g.groupby(key_col)[ts_col].diff() > gap).astype("int64")
        g = g.assign(_sess=brk.groupby(g[key_col]).cumsum())
        out = g.groupby([key_col, "_sess"], as_index=False).agg(
            first_ts=(ts_col, "min"), last_ts=(ts_col, "max"),
            n_events=(ts_col, "size"), sum_value=(value_col, "sum"))
        out = out.rename(columns={"_sess": "session_idx"})
        out["duration_s"] = (out["last_ts"] - out["first_ts"]).dt.total_seconds()
        return out[[key_col, "session_idx", "n_events", "duration_s",
                    "sum_value"]]

    return _add_key_bucket(ds, key_col, num_buckets).groupby(
        "_sbucket").map_groups(per_bucket, batch_format="pandas")


def lag_delta(ds: ray.data.Dataset, key_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              value_col: str = "value",
              num_buckets: int = 64) -> ray.data.Dataset:
    """Per-event delta vs the key's PREVIOUS event — SQL's
    ``value − lag(value) OVER (PARTITION BY key ORDER BY ts, id)``,
    first event coalesced to 0. Same bucketed-shuffle +
    vectorized-groupby-shift shape as :func:`running_totals`; deltas
    carried in integer cents so the oracle comparison is exact.
    Output: (event_id, user_id, delta_cents)."""
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = pd.Series(
            np.rint(g[value_col].to_numpy() * 100).astype("int64"),
            index=g.index)
        prev = cents.groupby(g[key_col], sort=False).shift(1)
        delta = (cents - prev).fillna(0).astype("int64")
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "delta_cents": delta.to_numpy(),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))

def ewma(ds: ray.data.Dataset, alpha: float = 0.3,
         key_col: str = "user_id", ts_col: str = "ts",
         id_col: str = "event_id", value_col: str = "value",
         num_buckets: int = 64) -> ray.data.Dataset:
    """Per-key exponentially-weighted moving average in event-time
    order (``adjust=False`` recursion: z_t = (1−α)·z_{t−1} + α·x_t,
    seeded at the key's first value).

    The recursion is inherently sequential PER KEY but independent
    ACROSS keys, so the scale shape is the same one bucketed shuffle
    as :func:`running_totals`: hash(key) → bucket, stable sort within
    the bucket, then pandas' C-implemented ``groupby().ewm()`` runs
    every key's recursion vectorized — no per-key 1-row-block
    pathology, no Python loop. Not SQL-expressible (the recursion has
    no closed window form); conformance is the sequential pandas
    oracle in tests.
    Output: (event_id, key, ewma) — ewma rounded to 6 d.p.
    """
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        z = (g.groupby(key_col, sort=False)[value_col]
             .ewm(alpha=alpha, adjust=False).mean()
             .droplevel(0).loc[g.index])
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "ewma": z.round(6).to_numpy(),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def window_ranks(ds: ray.data.Dataset, key_col: str = "user_id",
                 order_col: str = "value", id_col: str = "event_id",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """The four SQL ranking window functions in one pass —
    ``row_number() / rank() / dense_rank() / cume_dist()
    OVER (PARTITION BY key ORDER BY v)`` — over ONE bucketed shuffle of
    the skinny (id, key, v) projection.

    row_number breaks ties by ``id_col`` (a total order, so the output
    is deterministic and oracle-matchable: ``ORDER BY v, id``); rank /
    dense_rank / cume_dist are functions of ``v`` alone (SQL peer
    semantics). cume_dist = peers-cumulative / group-n, computed as an
    exact integer ratio cast once to float64 — bit-comparable to the
    SQL double.

    Output: (event_id, user_id, row_no, rnk, dense_rnk, cume_d).
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, order_col, id_col],
                              kind="stable")
        by = g.groupby(key_col, sort=False)
        row_no = (by.cumcount() + 1).to_numpy()
        n_per = by[order_col].transform("size").to_numpy()
        # peer groups: new (key, v) combination starts a rank run
        keys = g[key_col].to_numpy()
        vals = g[order_col].to_numpy()
        new_key = np.ones(len(g), dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        new_peer = new_key.copy()
        new_peer[1:] |= vals[1:] != vals[:-1]
        # rank: row_no at the start of each peer run, broadcast forward
        run_id = np.cumsum(new_peer) - 1
        rnk = row_no[new_peer][run_id]
        # dense_rank: per-key running count of peer runs — each row's
        # run index minus the run index at its key's first row, +1
        first_run_of_key = (np.cumsum(new_peer) - 1)[new_key][
            (np.cumsum(new_key) - 1)]
        dense = (np.cumsum(new_peer) - 1) - first_run_of_key + 1
        # cume_dist: the peer run's LAST row_no (runs are contiguous
        # and never span keys) broadcast over the run, / group n
        seg_starts = np.flatnonzero(new_peer)
        seg_ends = np.append(seg_starts[1:], len(g))
        peers_cum = np.repeat(row_no[seg_ends - 1], seg_ends - seg_starts)
        cume = peers_cum.astype(np.float64) / n_per.astype(np.float64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: keys,
            "row_no": row_no.astype("int64"),
            "rnk": rnk.astype("int64"),
            "dense_rnk": dense.astype("int64"),
            "cume_d": cume,
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, order_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def resample_ffill(ds: ray.data.Dataset, start_us: int, end_us: int,
                   every_us: int, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Time-series gap fill: resample each key's irregular observations
    onto the regular grid [start, end) step ``every_us`` with
    forward-fill (value at grid point t = last observation ≤ t; null
    before a key's first observation) — the SQL ``ASOF LEFT JOIN``
    against a generated calendar, which Ray Data has no operator for.

    Scale shape: ONE bucketed shuffle of the skinny (key, ts, value)
    projection co-locates each key's history; per bucket the grid is
    materialized once (it is identical for every key) and a single
    ``pandas.merge_asof(by=key)`` fills all of the bucket's keys in one
    vectorized C pass. Output rows = keys × grid points — the output
    IS the cartesian frame, so nothing smaller was possible; every
    other structure stays O(observations).

    Ties at a grid point (observation exactly at t) take that
    observation (``<=`` semantics, matching ASOF). Duplicate (key, ts)
    observations resolve to the LAST under a stable (ts) sort with the
    original value order preserved per the deterministic input sort
    below (ts, then value) — callers wanting different tie policy
    should pre-aggregate."""
    import numpy as np

    grid = np.arange(start_us, end_us, every_us, dtype=np.int64)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        obs = group.copy()
        obs["_us"] = obs[ts_col].astype(
            "datetime64[us]").astype("int64")
        # merge_asof needs BOTH frames globally sorted on the `on`
        # column; (ts, value) order makes the last equal-ts match the
        # max value (the documented duplicate-ts tie policy)
        obs = obs.sort_values(["_us", value_col], kind="stable")
        keys = np.sort(pd.unique(group[key_col].to_numpy()))
        gframe = pd.DataFrame({
            key_col: np.tile(keys, len(grid)),
            "_us": np.repeat(grid, len(keys)),
        })
        filled = pd.merge_asof(
            gframe, obs[[key_col, "_us", value_col]],
            on="_us", by=key_col, direction="backward",
            allow_exact_matches=True)
        return pd.DataFrame({
            key_col: filled[key_col],
            "grid_ts": pd.to_datetime(filled["_us"], unit="us"),
            value_col: filled[value_col],
        })

    return _add_key_bucket(
        ds.select_columns([key_col, ts_col, value_col]),
        key_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def rolling_median(ds: ray.data.Dataset, window: int = 5,
                   key_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Order-statistic sliding frame: SQL ``median(cents) OVER
    (PARTITION BY key ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW)``. Same bucketed one-shuffle shape as
    :func:`rolling_sum`; the median of ≤window integer cents is an
    order statistic (odd count) or the mean of two ints (even count —
    exactly representable at .0/.5), so the result is bit-exact vs the
    SQL oracle. Output: (event_id, user_id, win_med_cents, win_n)."""
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        g = g.assign(_cents=cents)
        roll = g.groupby(key_col, sort=False)["_cents"].rolling(
            window, min_periods=1)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "win_med_cents": roll.median().to_numpy().astype("float64"),
            "win_n": roll.count().to_numpy().astype("int64"),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def above_partition_median(ds: ray.data.Dataset, key_col: str,
                           value_col: str, id_col: str,
                           num_buckets: int = 64) -> ray.data.Dataset:
    """The decorrelated-subquery shape: rows whose value is STRICTLY
    above their partition's median (SQL ``WHERE v > median(v) OVER
    (PARTITION BY key)``) — one bucketed shuffle, per-key vectorized
    median transform inside the bucket. Comparison runs in integer
    cents against the .0/.5-exact median, so the row set is exact.
    Output: (id, key, value) of qualifying rows."""
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(group[value_col].to_numpy() * 100).astype(
            "int64")
        g = group.assign(_cents=cents)
        med = g.groupby(key_col, sort=False)["_cents"].transform(
            "median")
        keep = g["_cents"] > med
        out = g.loc[keep, [id_col, key_col, value_col]]
        return out.reset_index(drop=True)

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def range_window_sum(ds: ray.data.Dataset, range_seconds: int = 3600,
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id", value_col: str = "value",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Event-time RANGE frame: SQL ``sum(cents) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN INTERVAL range_seconds SECOND PRECEDING
    AND CURRENT ROW)`` — every row of the key whose ts lies in
    ``[t - range, t]``, INCLUDING all equal-ts peers (RANGE, not ROWS,
    so the result is tie-order independent and exact in integer cents).

    Scale shape: one bucketed shuffle; inside a bucket ALL keys are
    windowed at once with two global ``searchsorted`` calls on a
    composite (dense-key-rank, relative-ts) int64 axis — consecutive
    keys are spaced further apart than the frame width, so a frame can
    never straddle keys and no per-key Python loop runs.
    Output: (id, key, win_sum_cents, win_n).
    """
    import numpy as np

    range_us = int(range_seconds) * 1_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        us = (g[ts_col].astype("datetime64[ns]").astype("int64")
              // 1000).to_numpy()
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        codes = pd.factorize(g[key_col].to_numpy(), sort=False)[0]
        rel = us - us.min()
        stride = int(rel.max()) + range_us + 2
        axis = codes.astype("int64") * stride + rel
        cum = np.cumsum(cents)
        lo = np.searchsorted(axis, axis - range_us, side="left")
        hi = np.searchsorted(axis, axis, side="right") - 1
        win = cum[hi] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "win_sum_cents": win.astype("int64"),
            "win_n": (hi - lo + 1).astype("int64"),
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def running_peak_drawdown(ds: ray.data.Dataset,
                          key_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id",
                          value_col: str = "value",
                          num_buckets: int = 64) -> ray.data.Dataset:
    """Running partition maximum and drawdown: SQL ``max(cents) OVER
    (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` and
    ``peak - cents``. One bucketed shuffle; inside the bucket a single
    stable sort + C-vectorized ``groupby(...).cummax()`` covers every
    key at once. Exact integer cents throughout.
    Output: (id, key, peak_cents, drawdown_cents).
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        peak = (pd.Series(cents).groupby(
            g[key_col].to_numpy(), sort=False).cummax().to_numpy())
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "peak_cents": peak,
            "drawdown_cents": peak - cents,
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def frame_first_nth(ds: ray.data.Dataset, window: int = 5,
                    key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", value_col: str = "value",
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Navigation functions over a trailing ROWS frame: SQL
    ``first_value(cents) OVER w`` and ``nth_value(cents, 2) OVER w``
    with ``w = (PARTITION BY key ORDER BY ts, id ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``.

    One bucketed shuffle co-locates each key; inside the bucket ONE
    stable sort covers every key, then both values come from pure
    index arithmetic (no per-key loop): with ``i`` the row's position
    in its partition and ``pos`` its position in the sorted bucket,
    the frame starts at ``fs = pos - min(i, window-1)``; first_value
    is ``cents[fs]`` and nth_value(2) is ``cents[fs+1]`` when the
    frame holds ≥2 rows (NULL otherwise — SQL semantics). Exact
    integer cents. Output: (id, key, first_cents, nth2_cents).
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        i = g.groupby(key_col, sort=False).cumcount().to_numpy()
        pos = np.arange(len(g))
        fs = pos - np.minimum(i, window - 1)
        first = cents[fs]
        has2 = (pos - fs) >= 1
        nth2 = np.where(has2, cents[np.minimum(fs + 1, len(g) - 1)],
                        0).astype("float64")
        nth2[~has2] = np.nan
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "first_cents": first,
            "nth2_cents": nth2,
        })

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def scd2_intervals(ds: ray.data.Dataset, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   attr_col: str = "event_type",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 history build: collapse each
    key's event stream (ordered by ``ts, id``) into change-compressed
    validity intervals — one row per maximal run of a constant
    ``attr_col`` value, carrying ``valid_from`` (run's first ts),
    ``valid_to`` (next run's first ts; NaT while current) and the run
    length. The classic warehouse dimension-history operator, same
    shape as the reference's description-cache versioning concern
    (SURVEY §2.6) generalized to attribute history.

    Scale shape: ONE bucketed shuffle co-locates each key, then the
    whole bucket is change-point detection on a single stable sort —
    vectorized shift/cumsum island construction, a grouped first/size
    aggregate, and a grouped shift(-1) for valid_to. No per-key loop;
    nothing driver-sized. Output: (key, attr, valid_from, valid_to,
    n_events).
    """
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        key = g[key_col].to_numpy()
        attr = g[attr_col].to_numpy()
        brk = np.empty(len(g), dtype=bool)
        if len(g):
            brk[0] = True
            brk[1:] = (key[1:] != key[:-1]) | (attr[1:] != attr[:-1])
        island = np.cumsum(brk) - 1
        runs = (pd.DataFrame({
            key_col: key, attr_col: attr,
            "valid_from": g[ts_col].to_numpy(), "_isl": island})
            .groupby("_isl", sort=False)
            .agg(**{key_col: (key_col, "first"),
                    attr_col: (attr_col, "first"),
                    "valid_from": ("valid_from", "first"),
                    "n_events": (attr_col, "size")})
            .reset_index(drop=True))
        runs["valid_to"] = (runs.groupby(key_col, sort=False)
                            ["valid_from"].shift(-1))
        runs["n_events"] = runs["n_events"].astype("int64")
        return runs[[key_col, attr_col, "valid_from", "valid_to",
                     "n_events"]]

    return (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, attr_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"))


def first_touch_attribution(ds: ray.data.Dataset,
                            key_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            value_col: str = "value",
                            purchase_type: str = "purchase",
                            lookback_days: int = 7,
                            num_buckets: int = 64) -> pd.DataFrame:
    """Marketing first-touch attribution: each purchase's revenue is
    credited to the event type of the user's EARLIEST event inside
    the trailing ``lookback_days`` window (``ts >= purchase_ts −
    lookback`` and strictly before the purchase in ``(ts, id)``
    order); purchases with no prior event in the window are credited
    to ``'direct'``. Exact integer cents.

    Scale shape: one bucketed shuffle per key; inside the bucket the
    window start for EVERY purchase comes from a single global
    ``np.searchsorted`` over a composite ``user_code·K + ts_us`` axis
    (K > the bucket's time span + lookback, so user slices never
    interleave — same monotone-composite idiom as the RANGE-window
    op). Per-bucket output is a ≤|event-types|-row partial that folds
    on the driver. Output: (channel, revenue_i, n_purchases).
    """
    look_us = np.int64(lookback_days) * 86_400_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({"channel": [], "revenue_i": [],
                                 "n_purchases": []})
        code = pd.factorize(g[key_col].to_numpy())[0].astype("int64")
        ts_us = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        tmin = ts_us.min()
        span = np.int64(ts_us.max() - tmin)
        K = span + look_us + np.int64(2)
        comp = code * K + (ts_us - tmin)
        types = g[type_col].to_numpy()
        is_p = types == purchase_type
        pos = np.flatnonzero(is_p)
        cutoff = np.maximum(ts_us[pos] - tmin - look_us, 0)
        ws = np.searchsorted(comp, code[pos] * K + cutoff,
                             side="left")
        hit = ws < pos
        channel = np.where(hit, types[np.minimum(ws, len(g) - 1)],
                           "direct")
        cents = np.rint(
            g[value_col].to_numpy()[pos] * 100).astype("int64")
        return (pd.DataFrame({"channel": channel, "revenue_i": cents})
                .groupby("channel", as_index=False)
                .agg(revenue_i=("revenue_i", "sum"),
                     n_purchases=("revenue_i", "size")))

    parts = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, type_col,
                           value_col]), key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())                       # O(buckets × types) rows
    out = (parts.groupby("channel", as_index=False)
           .agg(revenue_i=("revenue_i", "sum"),
                n_purchases=("n_purchases", "sum")))
    out["revenue_i"] = out["revenue_i"].astype("int64")
    out["n_purchases"] = out["n_purchases"].astype("int64")
    return (out.sort_values("channel").reset_index(drop=True))


def running_distinct_counts(ds: ray.data.Dataset,
                            key_col: str = "user_id",
                            ts_col: str = "ts",
                            num_buckets: int = 64) -> pd.DataFrame:
    """Running distinct cardinality in event time: per day, how many
    keys appeared for the FIRST time (new users) and the cumulative
    distinct count so far — the exact version of the new-vs-returning
    dashboard query, which SQL cannot express as a windowed
    ``COUNT(DISTINCT)`` but CAN replay via first-seen timestamps.

    Scale shape: first-seen is a per-key MIN, so blocks pre-reduce to
    one (key, min_ts) row each (idempotent min — the exact_dedup
    economics), ONE key-hash bucket shuffle finishes the min, and each
    bucket emits per-DAY partial counts: O(buckets × days) rows fold
    on the driver, where a trivial cumsum finishes. Nothing key- or
    event-cardinality-sized leaves the cluster.
    Output: (day, new_users, cum_users)."""
    DAY_US = 86_400_000_000

    def block_min(b: pd.DataFrame) -> pd.DataFrame:
        us = (b[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        return (pd.DataFrame({key_col: b[key_col].to_numpy(),
                              "_us": us})
                .groupby(key_col, as_index=False)["_us"].min())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby(key_col, as_index=False)["_us"].min()
        day = (first["_us"] // DAY_US) * DAY_US
        return (pd.DataFrame({"day_us": day})
                .groupby("day_us", as_index=False)
                .agg(new_users=("day_us", "size")))

    parts = (_add_key_bucket(
        ds.select_columns([key_col, ts_col])
        .map_batches(block_min, batch_format="pandas"),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out = (parts.groupby("day_us", as_index=False)["new_users"].sum()
           .sort_values("day_us").reset_index(drop=True))
    out["day"] = out["day_us"].astype("datetime64[us]")
    out["new_users"] = out["new_users"].astype("int64")
    out["cum_users"] = out["new_users"].cumsum().astype("int64")
    return out[["day", "new_users", "cum_users"]]


def linear_touch_attribution(ds: ray.data.Dataset,
                             key_col: str = "user_id",
                             ts_col: str = "ts",
                             id_col: str = "event_id",
                             type_col: str = "event_type",
                             value_col: str = "value",
                             purchase_type: str = "purchase",
                             lookback_days: int = 7,
                             num_buckets: int = 64) -> pd.DataFrame:
    """Linear multi-touch attribution with EXACT integer credit: each
    purchase's cents split equally across every strictly-earlier event
    in the trailing window — each touch gets ``cents // n`` and the
    earliest ``cents % n`` touches get the remainder cent, so credits
    sum back to the purchase exactly (no float drift, SQL-replayable
    with row_number). Windowless purchases credit 'direct' in full.

    Same one-shuffle + composite-axis searchsorted shape as
    first-touch; the per-purchase window MEMBERS are materialized
    vectorized (repeat/cumsum index arithmetic, the basket
    pair-explosion idiom) — sizes total O(Σ window lengths), the same
    work the SQL join does, but blocked per bucket.
    Output: (channel, revenue_i, n_touches)."""
    look_us = np.int64(lookback_days) * 86_400_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        empty = pd.DataFrame({
            "channel": pd.Series([], dtype="object"),
            "revenue_i": pd.Series([], dtype="int64"),
            "n_touches": pd.Series([], dtype="int64")})
        if not len(g):
            return empty
        code = pd.factorize(g[key_col].to_numpy())[0].astype("int64")
        ts_us = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        tmin = ts_us.min()
        K = np.int64(ts_us.max() - tmin) + look_us + np.int64(2)
        comp = code * K + (ts_us - tmin)
        types = g[type_col].to_numpy()
        pos = np.flatnonzero(types == purchase_type)
        if not len(pos):
            return empty
        cutoff = np.maximum(ts_us[pos] - tmin - look_us, 0)
        ws = np.searchsorted(comp, code[pos] * K + cutoff,
                             side="left")
        n = pos - ws                         # touches per purchase
        cents = np.rint(
            g[value_col].to_numpy()[pos] * 100).astype("int64")
        direct = n == 0
        rows = [pd.DataFrame({"channel": ["direct"] * int(direct.sum()),
                              "credit": cents[direct]})]
        t = ~direct
        if t.any():
            nt, wst, ct = n[t], ws[t], cents[t]
            total = int(nt.sum())
            # member index = window start + rank within window
            csum = np.cumsum(nt) - nt
            rank = np.arange(total) - np.repeat(csum, nt)
            member = np.repeat(wst, nt) + rank
            base = np.repeat(ct // nt, nt)
            extra = (rank < np.repeat(ct % nt, nt)).astype("int64")
            rows.append(pd.DataFrame({"channel": types[member],
                                      "credit": base + extra}))
        allc = pd.concat(rows, ignore_index=True)
        return (allc.groupby("channel", as_index=False)
                .agg(revenue_i=("credit", "sum"),
                     n_touches=("credit", "size")))

    parts = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, type_col,
                           value_col]), key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out = (parts.groupby("channel", as_index=False)
           .agg(revenue_i=("revenue_i", "sum"),
                n_touches=("n_touches", "sum")))
    out["revenue_i"] = out["revenue_i"].astype("int64")
    out["n_touches"] = out["n_touches"].astype("int64")
    return out.sort_values("channel").reset_index(drop=True)


def band_self_join_counts(ds: ray.data.Dataset, key_col: str,
                          ts_col: str, band_seconds: int,
                          num_buckets: int = 64) -> pd.DataFrame:
    """Temporal band self-join, counted: per key, the number of
    ordered row pairs (a, b) with ``ts_b > ts_a`` and ``ts_b ≤ ts_a +
    band`` — e.g. repeat orders within a week. The SQL twin is the
    quadratic inequality self-join; here each pair count is the
    difference of two ``searchsorted`` positions on the same
    composite ``key_code·K + ts`` axis (one sorted pass per bucket,
    no pair materialization at all — O(rows) work for O(rows²)
    possible pairs). Strictness on equal timestamps comes from
    ``side='right'`` at the lower bound. Output: (key, n_pairs) for
    keys with ≥1 pair."""
    band_us = np.int64(band_seconds) * 1_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="stable")
        if not len(g):
            return pd.DataFrame({key_col: [], "n_pairs": []})
        code = pd.factorize(g[key_col].to_numpy())[0].astype("int64")
        ts_us = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        tmin = ts_us.min()
        K = np.int64(ts_us.max() - tmin) + band_us + np.int64(2)
        comp = code * K + (ts_us - tmin)
        lo = np.searchsorted(comp, comp, side="right")
        hi = np.searchsorted(comp, comp + band_us, side="right")
        return (pd.DataFrame({key_col: g[key_col].to_numpy(),
                              "n_pairs": hi - lo})
                .groupby(key_col, as_index=False)["n_pairs"].sum())

    parts = (_add_key_bucket(ds.select_columns([key_col, ts_col]),
                             key_col, num_buckets)
             .groupby("_sbucket").map_groups(per_bucket,
                                             batch_format="pandas")
             .to_pandas())
    out = parts.groupby(key_col, as_index=False)["n_pairs"].sum()
    out = out.loc[out["n_pairs"] > 0].copy()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def peak_concurrency(ds: ray.data.Dataset, gap_minutes: float = 30.0,
                     key_col: str = "user_id", ts_col: str = "ts",
                     num_buckets: int = 64,
                     time_bucket_s: int = 3600) -> pd.DataFrame:
    """Maximum number of simultaneously-active sessions (closed
    intervals, a session touching another's endpoint counts as
    concurrent): sessionize each key (30-min gap rule), sweep the
    global timeline of ±1 endpoint deltas, report the running-sum
    peak and the session count. The capacity-planning classic.

    Scale shape: intervals build in the same per-key bucket shuffle
    as sessionize (one (start, end) row per session — session-sized,
    not event-sized); the sweep can't bucket by key (it's a global
    property), so endpoints partition by TIME bucket instead: each
    bucket sorts its own points (starts before ends on ties — the
    closed-interval rule) and emits (bucket, Σd, local max prefix);
    the driver folds O(time-buckets) rows with cumulative offsets —
    exact because time buckets partition the sorted axis. Output:
    one row (peak_concurrency, n_sessions)."""
    gap = pd.Timedelta(minutes=gap_minutes)
    tb_us = np.int64(time_bucket_s) * 1_000_000

    def intervals(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="stable")
        brk = (g.groupby(key_col, sort=False)[ts_col].diff() > gap) \
            .to_numpy()
        newk = np.empty(len(g), dtype=bool)
        if len(g):
            kv = g[key_col].to_numpy()
            newk[0] = True
            newk[1:] = kv[1:] != kv[:-1]
        sid = np.cumsum(brk | newk) - 1
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        iv = (pd.DataFrame({"_sid": sid, "us": us})
              .groupby("_sid", as_index=False)
              .agg(st=("us", "min"), en=("us", "max")))
        pts = pd.DataFrame({
            "t": np.concatenate((iv["st"].to_numpy(),
                                 iv["en"].to_numpy())),
            "d": np.concatenate((np.ones(len(iv), dtype="int64"),
                                 -np.ones(len(iv), dtype="int64")))})
        pts["_tb"] = pts["t"] // tb_us
        return pts

    pts = (_add_key_bucket(ds.select_columns([key_col, ts_col]),
                           key_col, num_buckets)
           .groupby("_sbucket").map_groups(intervals,
                                           batch_format="pandas"))

    def sweep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["t", "d"], ascending=[True, False],
                          kind="stable")
        run = s["d"].cumsum()
        return pd.DataFrame({"_tb": [g["_tb"].iloc[0]],
                             "sum_d": [int(s["d"].sum())],
                             "max_prefix": [int(run.max())],
                             "n_starts": [int((s["d"] > 0).sum())]})

    parts = (pts.groupby("_tb").map_groups(sweep_bucket,
                                           batch_format="pandas")
             .to_pandas().sort_values("_tb").reset_index(drop=True))
    offsets = parts["sum_d"].cumsum().shift(1).fillna(0).astype("int64")
    peak = int((offsets + parts["max_prefix"]).max())
    return pd.DataFrame({
        "peak_concurrency": pd.Series([peak], dtype="int64"),
        "n_sessions": pd.Series([int(parts["n_starts"].sum())],
                                dtype="int64")})


def time_weighted_average(ds: ray.data.Dataset,
                          key_col: str = "user_id",
                          ts_col: str = "ts",
                          id_col: str = "event_id",
                          value_col: str = "value",
                          num_buckets: int = 64) -> pd.DataFrame:
    """Time-weighted average value per key (TWAP): each observation
    weighted by how long it was current — Σ cents·Δt / ΣΔt over the
    intervals between consecutive events ((ts, id) order; the last
    observation has no duration and drops, SQL's ``LEAD IS NOT
    NULL``). Numerator/denominator stay exact int64 (µs × cents —
    overflows only past ~10^18·µs-cents per key; split-sum like the
    co-moment ops if ever needed); ONE float division at the end is
    bit-comparable to SQL. One bucketed shuffle, vectorized grouped
    shift — no per-key loop. Output: (key, num_i, den_us, twap)."""
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        nxt = (pd.Series(us, index=g.index)
               .groupby(g[key_col], sort=False).shift(-1))
        dur = (nxt - us)
        keep = dur.notna()
        d = dur[keep].astype("int64")
        return (pd.DataFrame({key_col: g.loc[keep, key_col].to_numpy(),
                              "num_i": cents[keep.to_numpy()] * d,
                              "den_us": d})
                .groupby(key_col, as_index=False)[["num_i", "den_us"]]
                .sum())

    parts = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out = parts.groupby(key_col,
                        as_index=False)[["num_i", "den_us"]].sum()
    out["num_i"] = out["num_i"].astype("int64")
    out["den_us"] = out["den_us"].astype("int64")
    out["twap"] = (out["num_i"].to_numpy().astype("float64")
                   / out["den_us"].to_numpy().astype("float64"))
    return out.sort_values(key_col).reset_index(drop=True)


def rolling_active_users(ds: ray.data.Dataset, window_days: int = 7,
                         key_col: str = "user_id", ts_col: str = "ts",
                         num_buckets: int = 64) -> pd.DataFrame:
    """Rolling W-day distinct active users per day (the DAU/WAU
    metric): for each calendar day that has at least one event, the
    number of distinct keys with ≥1 event in the trailing
    ``window_days`` window ending that day.

    A windowed COUNT(DISTINCT) can't ride the additive partial-agg
    path (distinct isn't additive), and a day×events band join is
    quadratic in the window. Shape instead: ONE hash(key) bucket
    shuffle of the skinny (key, day) projection; within a bucket —
    where ALL of a key's days co-locate — dedupe (key, day),
    vectorized-explode each active day to its ``window_days`` target
    days (np.repeat/tile, no Python loop), dedupe (key, target_day)
    again (a key active on 3 days inside one window must count once),
    and emit per-day partial counts plus the bucket's real event-day
    set. The driver folds O(buckets × days) partial rows: WAU(day) =
    Σ partials, reported only for days observed in the data (windows
    ending on event-less days are a different query).

    At 100 TB the shuffle payload is the DEDUPED (key, day) pairs —
    keys × active-days, not events — and per-day counts are additive
    across disjoint key buckets by construction.

    Output: (day: date, wau: int64) sorted by day.
    """
    one_day = np.timedelta64(1, "D")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        days = group[ts_col].to_numpy().astype("datetime64[D]")
        kd = pd.DataFrame({key_col: group[key_col].to_numpy(),
                           "_d": days}).drop_duplicates()
        # explode each active day to the window_days windows it feeds
        reps = len(kd)
        keys = np.repeat(kd[key_col].to_numpy(), window_days)
        tgt = (np.repeat(kd["_d"].to_numpy(), window_days)
               + np.tile(np.arange(window_days), reps) * one_day)
        expl = pd.DataFrame({key_col: keys, "_t": tgt}).drop_duplicates()
        cnt = expl.groupby("_t", as_index=False).agg(
            wau_part=(key_col, "size"))
        real = pd.DataFrame({"_t": np.unique(kd["_d"].to_numpy()),
                             "real_part": np.int64(1)})
        return cnt.merge(real, on="_t", how="outer").fillna(0)

    parts = (_add_key_bucket(ds.select_columns([key_col, ts_col]),
                             key_col, num_buckets)
             .groupby("_sbucket").map_groups(per_bucket,
                                             batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("_t", as_index=False).agg(
        wau=("wau_part", "sum"), real=("real_part", "sum"))
    agg = agg.loc[agg["real"] > 0, ["_t", "wau"]]
    out = agg.rename(columns={"_t": "day"})
    out["day"] = out["day"].astype("datetime64[us]")
    out["wau"] = out["wau"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def cusum_stats(ds: ray.data.Dataset, k_cents: int = 6000,
                h_cents: int = 25000, key_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                value_col: str = "value",
                num_buckets: int = 64) -> pd.DataFrame:
    """Per-key one-sided CUSUM change detection over the event
    stream: s_i = max(0, s_{i-1} + (x_i − k)); a key alarms when the
    statistic ever reaches ``h_cents``.

    The recurrence looks inherently sequential, but it has the exact
    closed form s_i = c_i − min(0, min_{j≤i} c_j) with c the inclusive
    prefix sum of (x − k) — so the whole detector is a grouped cumsum
    + grouped cummin, both vectorized pandas kernels over ONE
    hash(key) bucket shuffle (the same anti-pathology shape as
    :func:`sessionize`; no per-key loop, no iteration). Values are
    carried in integer cents so the prefix sums — and therefore the
    alarm decision — are bit-exact against a SQL window oracle
    replaying the identical closed form.

    Output: (key, n_events, max_cusum_cents, alarm) sorted by key.
    """
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        y = (np.rint(g[value_col].to_numpy() * 100).astype("int64")
             - np.int64(k_cents))
        ys = pd.Series(y, index=g.index)
        c = ys.groupby(g[key_col], sort=False).cumsum()
        runmin = c.groupby(g[key_col], sort=False).cummin()
        s = c - runmin.clip(upper=0)
        return (pd.DataFrame({key_col: g[key_col].to_numpy(),
                              "_s": s.to_numpy()})
                .groupby(key_col, as_index=False)
                .agg(n_events=("_s", "size"), max_cusum_cents=("_s", "max")))

    out = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out["n_events"] = out["n_events"].astype("int64")
    out["max_cusum_cents"] = out["max_cusum_cents"].astype("int64")
    out["alarm"] = out["max_cusum_cents"] >= np.int64(h_cents)
    return out.sort_values(key_col).reset_index(drop=True)


def interarrival_stats(ds: ray.data.Dataset, key_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Per-key inter-arrival gap statistics — n_gaps, total gap
    seconds, mean gap, and the coefficient of variation (cv ≈ 1 for a
    Poisson arrival process, > 1 = bursty): the burstiness screen a
    crawl scheduler runs over event streams before assigning
    politeness budgets.

    Gaps are EXACT integer whole seconds (µs difference floor-divided
    by 10⁶, the same truncation the SQL replay uses), so the per-key
    moment sums (n, Σg, Σg²) are exact int64 — gaps bounded by the
    stream's time range keep Σg² well inside int64 — and every derived
    float is a pure function of exact integers. One hash(key) bucket
    shuffle of the skinny projection; grouped diff + moment sums
    vectorized per bucket; keys with a single event have no gap and
    are excluded (matching the SQL WHERE gap IS NOT NULL).

    Output: (key, n_gaps, sum_gap_s, mean_gap_s, cv_gap) sorted by
    key; cv_gap is NaN when the mean gap is 0.
    """
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        prev = (pd.Series(us, index=g.index)
                .groupby(g[key_col], sort=False).shift(1))
        ok = prev.notna()
        gap = ((us[ok.to_numpy()] - prev[ok].to_numpy(np.int64))
               // 1_000_000)
        f = pd.DataFrame({key_col: g.loc[ok, key_col].to_numpy(),
                          "g": gap, "gg": gap * gap})
        agg = f.groupby(key_col, as_index=False).agg(
            n_gaps=("g", "size"), sum_gap_s=("g", "sum"),
            _sum_gg=("gg", "sum"))
        return agg

    out = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col]), key_col,
        num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    n = out["n_gaps"].to_numpy("int64")
    s = out["sum_gap_s"].to_numpy("int64")
    ss = out["_sum_gg"].to_numpy("int64")
    mean = s.astype("float64") / n
    disc = (n * ss - s * s).astype("float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        cv = np.sqrt(disc) / n / mean
    cv = np.where(s == 0, np.nan, cv)
    res = pd.DataFrame({key_col: out[key_col],
                        "n_gaps": n, "sum_gap_s": s,
                        "mean_gap_s": mean, "cv_gap": cv})
    return res.sort_values(key_col).reset_index(drop=True)


def daily_open_counts(intervals: ray.data.Dataset, start_col: str,
                      end_col: str) -> pd.DataFrame:
    """Open-interval concurrency as a daily series: for every calendar
    day between the earliest start and the latest end, how many
    intervals are open (start_day ≤ day ≤ end_day) — the
    backlog-over-time / open-orders dashboard series.

    A days×intervals stabbing join is quadratic; instead each interval
    contributes two ±1 deltas (+1 at its start day, −1 the day after
    its end), per-day delta counts pre-reduce block-locally to
    O(distinct days) additive partials, and the driver folds the tiny
    delta table with one cumulative sum over the contiguous day grid —
    intervals never co-locate, nothing shuffles but the partials.

    Output: (day, n_open) for every day in the span, int64, inclusive.
    """
    one = np.timedelta64(1, "D")

    def deltas(b: pd.DataFrame) -> pd.DataFrame:
        s = b[start_col].to_numpy().astype("datetime64[D]")
        e = b[end_col].to_numpy().astype("datetime64[D]")
        # an INVERTED interval (end day before start day) covers no
        # day under the overlap predicate; its ±1 deltas would instead
        # SUBTRACT one over [end+1, start−1] — drop it, matching the
        # SQL join semantics
        ok = s <= e
        s, e = s[ok], e[ok] + one
        f = pd.DataFrame({
            "_d": np.concatenate([s, e]),
            "delta": np.concatenate([np.ones(len(s), np.int64),
                                     -np.ones(len(e), np.int64)])})
        return f.groupby("_d", as_index=False)["delta"].sum()

    parts = (intervals.select_columns([start_col, end_col])
             .map_batches(deltas, batch_format="pandas",
                          batch_size=None).to_pandas())
    agg = (parts.groupby("_d", as_index=False)["delta"].sum()
           .sort_values("_d"))
    days_d = agg["_d"].to_numpy().astype("datetime64[D]")
    lo, hi = days_d[0], days_d[-1] - one        # last delta day is end+1
    grid = np.arange(lo, hi + one, one)
    delta_full = np.zeros(len(grid), np.int64)
    idx = (days_d - lo).astype("timedelta64[D]").astype("int64")
    keep = idx < len(grid)                       # the trailing end+1 deltas
    np.add.at(delta_full, idx[keep], agg["delta"].to_numpy(np.int64)[keep])
    out = pd.DataFrame({"day": grid.astype("datetime64[us]"),
                        "n_open": np.cumsum(delta_full)})
    out["n_open"] = out["n_open"].astype("int64")
    return out.reset_index(drop=True)


def trailing_peak_counts(ds: ray.data.Dataset, key_col: str = "user_id",
                         ts_col: str = "ts", window_s: int = 60,
                         num_buckets: int = 64) -> pd.DataFrame:
    """Per-key PEAK trailing-window rate: the maximum, over a key's
    events, of the number of that key's events in the half-open
    window (t − window, t] — the rate-limit / politeness-violation
    audit (a host whose peak 60-second fetch count exceeds its budget
    was crawled too hard, whatever its average rate says).

    Same O(rows) shape as :func:`band_self_join_counts`: one
    hash(key) bucket shuffle, then per bucket BOTH window endpoints
    of every event come from two vectorized searchsorted probes on
    the composite ``code·K + ts`` axis (K > span + window keeps a
    key's probe range disjoint from its neighbours in both
    directions), and a grouped max finishes each key — no pair
    materialization for the quadratic join. Output: (key, peak)
    sorted by key.
    """
    w_us = np.int64(window_s) * 1_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="stable")
        if not len(g):
            return pd.DataFrame({key_col: [], "peak": []})
        code = pd.factorize(g[key_col].to_numpy())[0].astype("int64")
        ts_us = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        tmin = ts_us.min()
        K = np.int64(ts_us.max() - tmin) + w_us + np.int64(2)
        comp = code * K + (ts_us - tmin)
        hi = np.searchsorted(comp, comp, side="right")
        lo = np.searchsorted(comp, comp - w_us, side="right")
        return (pd.DataFrame({key_col: g[key_col].to_numpy(),
                              "peak": hi - lo})
                .groupby(key_col, as_index=False)["peak"].max())

    parts = (_add_key_bucket(ds.select_columns([key_col, ts_col]),
                             key_col, num_buckets)
             .groupby("_sbucket").map_groups(per_bucket,
                                             batch_format="pandas")
             .to_pandas())
    out = parts.groupby(key_col, as_index=False)["peak"].max()
    out["peak"] = out["peak"].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def locf_daily(ds: ray.data.Dataset, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               value_col: str = "value",
               num_buckets: int = 64) -> pd.DataFrame:
    """Gap-filled daily series per key: for every calendar day in a
    key's [first event day, last event day] span, the value of the
    key's latest event at or before end-of-day — last observation
    carried forward (LOCF), the resample-and-ffill primitive a
    time-series feature store needs. Ties on the timestamp resolve to
    the highest event id (the SQL ORDER BY ts DESC, id DESC LIMIT 1).

    One hash(key) bucket shuffle; inside a bucket the per-key day
    grids are built with one vectorized repeat/arange explode and ALL
    keys gap-fill together through a single ``pd.merge_asof(by=key)``
    over the day-end axis — no per-key loop. Values carried as exact
    integer cents. Output: (key, day, value_cents).
    """
    day_us = np.int64(86_400_000_000)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({key_col: [], "day": [],
                                 "value_cents": []})
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        ev = pd.DataFrame({
            key_col: g[key_col].to_numpy(), "_us": us,
            "value_cents": np.rint(g[value_col].to_numpy() * 100)
            .astype("int64")})
        span = (pd.DataFrame({key_col: g[key_col].to_numpy(),
                              "_d": us // day_us})
                .groupby(key_col, as_index=False)
                .agg(d0=("_d", "min"), d1=("_d", "max")))
        lens = (span["d1"] - span["d0"] + 1).to_numpy("int64")
        keys = np.repeat(span[key_col].to_numpy(), lens)
        starts = np.zeros(len(span), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        offs = np.arange(int(lens.sum()), dtype=np.int64) \
            - np.repeat(starts, lens)
        days = np.repeat(span["d0"].to_numpy("int64"), lens) + offs
        grid = pd.DataFrame({key_col: keys, "_day": days,
                             "_probe": (days + 1) * day_us - 1})
        grid = grid.sort_values("_probe", kind="stable")
        # events already (key, ts, id)-sorted: for equal timestamps
        # merge_asof matches the LAST right row — the highest id
        evs = ev.sort_values("_us", kind="stable").rename(
            columns={"_us": "_probe"})
        m = pd.merge_asof(grid, evs, on="_probe", by=key_col,
                          direction="backward")
        return pd.DataFrame({
            key_col: m[key_col].to_numpy(),
            "day": (m["_day"].to_numpy("int64") * day_us)
            .astype("datetime64[us]"),
            "value_cents": m["value_cents"].to_numpy("int64")})

    out = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    return (out.sort_values([key_col, "day"])
            .reset_index(drop=True))


def politeness_schedule(ds: ray.data.Dataset, key_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        delay_s: int = 5,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Earliest-feasible dispatch schedule under a per-key minimum
    spacing (the crawl-scheduler politeness simulation: requests to
    one host, processed in arrival order, may not dispatch closer
    than ``delay_s`` apart; a request dispatches at
    ``max(arrival, prev_dispatch + delay)``).

    The sequential max-plus recurrence has an exact closed form:
    with 0-based per-key rank ``rn`` (ordered ts, id) and µs delay
    ``d``, ``dispatch = rn·d + running_max(arrival − rn·d)`` — so one
    hash(key) bucket shuffle and a vectorized grouped cummax replace
    the per-key loop, exactly as :func:`cusum_stats` does for its
    recurrence. All arithmetic is exact int64 µs. Output: one row per
    request with its queueing delay ``wait_us`` (0 = dispatched on
    arrival).
    """
    d_us = np.int64(delay_s) * 1_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 key_col: pd.Series([], dtype="int64"),
                                 "wait_us": pd.Series([], dtype="int64")})
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        rn = g.groupby(key_col, sort=False).cumcount().to_numpy("int64")
        base = pd.Series(us - rn * d_us)
        runmax = base.groupby(g[key_col].to_numpy(),
                              sort=False).cummax().to_numpy("int64")
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "wait_us": runmax + rn * d_us - us})

    out = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col]), key_col,
        num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out["wait_us"] = out["wait_us"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def daily_ohlc(ds: ray.data.Dataset, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               value_col: str = "value",
               num_buckets: int = 64) -> pd.DataFrame:
    """Per (key, day) open/high/low/close candle over the event
    stream — open/close are the values of the (ts, id)-first and
    -last events of the day, high/low the extremes, all in exact
    integer cents, plus the event count.

    Every field is an ASSOCIATIVE combine (argmin/argmax by the
    (ts, id) order key, min, max, sum), so the op is a true two-phase
    partial aggregate: per-block partials shrink each block to its
    O(keys·days) candle rows carrying their endpoint order keys, and
    ONE key-hash bucket shuffle re-reduces the partials with the
    identical (idempotent) kernel — raw events never shuffle. Output:
    (key, day, open_cents, high_cents, low_cents, close_cents, n).
    """

    def reduce_candles(df: pd.DataFrame) -> pd.DataFrame:
        """Idempotent candle combine: rows are either raw events
        (endpoint keys = their own (ts, id)) or prior partials."""
        first = (df.sort_values([key_col, "day", "_fts", "_fid"],
                                kind="stable")
                 .groupby([key_col, "day"], as_index=False, sort=False)
                 .agg(_fts=("_fts", "first"), _fid=("_fid", "first"),
                      open_cents=("open_cents", "first")))
        rest = (df.sort_values([key_col, "day", "_lts", "_lid"],
                               kind="stable")
                .groupby([key_col, "day"], as_index=False, sort=False)
                .agg(_lts=("_lts", "last"), _lid=("_lid", "last"),
                     close_cents=("close_cents", "last"),
                     high_cents=("high_cents", "max"),
                     low_cents=("low_cents", "min"),
                     n=("n", "sum")))
        return first.merge(rest, on=[key_col, "day"])

    day_us = np.int64(86_400_000_000)

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in (key_col, "day", "_fts",
                                           "_fid", "open_cents", "_lts",
                                           "_lid", "close_cents",
                                           "high_cents", "low_cents",
                                           "n")})
        us = (batch[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        cents = np.rint(batch[value_col].to_numpy() * 100).astype("int64")
        ids = batch[id_col].to_numpy("int64")
        ev = pd.DataFrame({
            key_col: batch[key_col].to_numpy(),
            "day": (us // day_us) * day_us,
            "_fts": us, "_fid": ids, "open_cents": cents,
            "_lts": us, "_lid": ids, "close_cents": cents,
            "high_cents": cents, "low_cents": cents,
            "n": np.ones(len(batch), dtype="int64")})
        return reduce_candles(ev)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = reduce_candles(group.drop(columns="_sbucket"))
        return out

    parts = (ds.select_columns([id_col, key_col, ts_col, value_col])
             .map_batches(block_partial, batch_format="pandas"))
    out = (_add_key_bucket(parts, key_col, num_buckets)
           .groupby("_sbucket")
           .map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    out["day"] = out["day"].astype("int64").astype("datetime64[us]")
    for c in ("open_cents", "high_cents", "low_cents", "close_cents",
              "n"):
        out[c] = out[c].astype("int64")
    out = out[[key_col, "day", "open_cents", "high_cents", "low_cents",
               "close_cents", "n"]]
    return (out.sort_values([key_col, "day"])
            .reset_index(drop=True))


def decayed_value_sum(ds: ray.data.Dataset, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      half_life_s: float = 3600.0) -> pd.DataFrame:
    """Per-key exponentially time-decayed value sum at the corpus
    reference instant (the global max timestamp): ``Σ v·0.5^(Δt/h)``
    — the recency-weighted engagement / freshness score a recrawl
    scheduler ranks by.

    Despite looking "windowed", the sum is ADDITIVE once the
    reference instant is fixed, so the whole op is two streaming
    passes with no shuffle at all: an O(1) global max, then map-only
    per-block partials combined by :func:`partial_groupby` — the
    per-term ``pow`` is a pure function replayed by the SQL oracle
    (float-sum ulps sit far below the 6-decimal hash gate). Output:
    (key, decayed_value).
    """
    tref = ds.max(ts_col)
    tref_us = np.int64(pd.Timestamp(tref).value // 1000)
    h_us = float(half_life_s) * 1e6

    def batch_agg(batch: pd.DataFrame) -> pd.DataFrame:
        us = (batch[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        w = np.power(0.5, (tref_us - us) / h_us)
        return (pd.DataFrame({key_col: batch[key_col].to_numpy(),
                              "decayed_value":
                              batch[value_col].to_numpy() * w})
                .groupby(key_col, as_index=False)["decayed_value"]
                .sum())

    out = partial_groupby(ds.select_columns(
        [key_col, ts_col, value_col]), [key_col], batch_agg,
        ["decayed_value"])
    return out.sort_values(key_col).reset_index(drop=True)


def out_of_order_stats(ds: ray.data.Dataset, key_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Per-key late-arrival audit — the streaming-watermark QA a
    100-TB event pipeline runs before choosing its allowed-lateness
    bound: in ARRIVAL order (ascending ``id_col``), an event is *late*
    when its event-time ``ts`` is strictly below the running max of
    every earlier event's ts for the same key, and its *lateness* is
    that running max minus its ts.

    The running watermark is a grouped cummax over the arrival axis
    (the :func:`politeness_schedule` idiom): ONE hash(key) bucket
    shuffle of the skinny (id, key, ts) triple, a vectorized
    sort + groupby-cummax + shift per bucket, then per-key additive
    partials. All arithmetic is exact int64 µs. Output per key:
    ``n_events``, ``n_late``, ``max_late_us`` (0 when nothing is
    late) — sorted by key.
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "n_late": pd.Series([], dtype="int64"),
                                 "max_late_us": pd.Series([], dtype="int64")})
        us = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        keys = g[key_col].to_numpy()
        # watermark BEFORE each event = shift(1) of the running cummax
        gb = pd.Series(us).groupby(keys, sort=False)
        wm_prev = gb.cummax().groupby(keys, sort=False).shift(1)
        late = (wm_prev - us).fillna(0).clip(lower=0).astype("int64")
        out = pd.DataFrame({key_col: keys, "_late": late.to_numpy()})
        agg = out.groupby(key_col, as_index=False).agg(
            n_events=("_late", "size"),
            n_late=("_late", lambda s: int((s.to_numpy() > 0).sum())),
            max_late_us=("_late", "max"))
        return agg

    out = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col]), key_col,
        num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    for c in ("n_events", "n_late", "max_late_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def daily_acf(ds: ray.data.Dataset, ts_col: str = "ts",
              max_lag: int = 7) -> pd.DataFrame:
    """Sample autocorrelation of the DAILY event-count series at lags
    1..``max_lag`` — the seasonality probe a crawl scheduler runs
    before picking a recrawl cadence (a strong lag-7 peak means
    weekly-periodic traffic).

    The series is the contiguous day grid from the corpus's first to
    last day, missing days counted 0. ``r_k`` uses the standard
    biased estimator Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)², expanded so
    both sides of every division are EXACT integers::

        A_k = n²·Σ_{t>k} x_t·x_{t−k} − n·S·(Σ_{t>k} x_t + Σ_{t>k} x_{t−k})
              + (n−k)·S²            (S = Σx, n = #days)
        D   = n²·Σ x² − n·S²

    folded in Python ints (no int64 wrap at any count), so the single
    float division A_k/D is bit-identical to a HUGEINT SQL replay.

    Distributed: per-block (day, count) partials — O(blocks · active
    days) skinny rows — then an O(days) driver fold. Output:
    (lag, acf) for lags 1..max_lag.
    """

    def partial(b: pa.Table) -> pa.Table:
        us = b.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = us // np.int64(86_400_000_000)
        vals, counts = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(vals, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    parts = ds.select_columns([ts_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    agg = parts.groupby("day", as_index=False)["n"].sum() \
        .sort_values("day")
    days = agg["day"].to_numpy(np.int64)
    lo, hi = int(days[0]), int(days[-1])
    n = hi - lo + 1
    x = np.zeros(n, dtype=np.int64)
    x[days - lo] = agg["n"].to_numpy(np.int64)

    xs = [int(v) for v in x]
    S = sum(xs)
    Q = sum(v * v for v in xs)
    D = n * n * Q - n * S * S
    rows = []
    for k in range(1, max_lag + 1):
        if k >= n or D == 0:
            rows.append((k, float("nan")))
            continue
        P = sum(xs[t] * xs[t - k] for t in range(k, n))
        T1 = sum(xs[t] for t in range(k, n))
        T2 = sum(xs[t - k] for t in range(k, n))
        A = n * n * P - n * S * (T1 + T2) + (n - k) * S * S
        rows.append((k, float(A) / float(D)))
    return pd.DataFrame({"lag": pd.Series([r[0] for r in rows],
                                          dtype="int64"),
                         "acf": pd.Series([r[1] for r in rows],
                                          dtype="float64")})


def gap_expfit_ks(ds: ray.data.Dataset, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  num_buckets: int = 64) -> pd.DataFrame:
    """Exponential-arrival goodness-of-fit: MLE-fit
    ``λ = n / Σ gaps`` to the pooled per-key inter-event gaps, then
    the one-sample Kolmogorov–Smirnov distance against
    ``F(x) = 1 − e^(−λx)`` — a large D means arrivals are bursty or
    scheduled, not Poisson, which changes every politeness/recrawl
    model downstream.

    Gaps are exact int64 µs from a grouped diff in ONE key-hash
    bucket shuffle ((ts, id) order); what leaves each bucket is the
    gap VALUE COUNT. The driver folds O(distinct gaps) rows: λ's
    numerator/denominator are exact ints, and the KS sup runs over
    the distinct-value CDF steps (duplicate-safe: both the step top
    ``cum/n`` and bottom ``cum_prev/n`` are compared at every
    distinct gap). Output one row: (n_gaps, lambda_per_day, ks_d).
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({"gap": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        keys = g[key_col].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = keys[1:] == keys[:-1]
        gaps = (us - np.concatenate([[0], us[:-1]]))[same]
        vals, counts = np.unique(gaps, return_counts=True)
        return pd.DataFrame({"gap": pd.Series(vals, dtype="int64"),
                             "n": pd.Series(counts, dtype="int64")})

    parts = _add_key_bucket(
        ds.select_columns([key_col, ts_col, id_col]),
        key_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty or "gap" not in parts.columns:
        parts = pd.DataFrame({"gap": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
    hist = parts.groupby("gap", as_index=False)["n"].sum() \
        .sort_values("gap")
    n = int(hist["n"].sum())
    if n == 0:
        return pd.DataFrame({"n_gaps": pd.Series([0], dtype="int64"),
                             "lambda_per_day": [float("nan")],
                             "ks_d": [float("nan")]})
    total_us = int(sum(int(g) * int(c)
                       for g, c in zip(hist["gap"], hist["n"])))
    gap_days = hist["gap"].to_numpy(np.float64) / 86_400_000_000.0
    lam = float(n) / (float(total_us) / 86_400_000_000.0)
    f_fit = 1.0 - np.exp(-lam * gap_days)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    top = cum.astype(np.float64) / n
    bot = np.concatenate([[0], cum[:-1]]).astype(np.float64) / n
    d = float(np.maximum(np.abs(top - f_fit),
                         np.abs(bot - f_fit)).max())
    return pd.DataFrame({"n_gaps": pd.Series([n], dtype="int64"),
                         "lambda_per_day": [lam],
                         "ks_d": [d]})


def ushape_touch_attribution(ds: ray.data.Dataset,
                             key_col: str = "user_id",
                             ts_col: str = "ts",
                             id_col: str = "event_id",
                             type_col: str = "event_type",
                             value_col: str = "value",
                             purchase_type: str = "purchase",
                             lookback_days: int = 7,
                             num_buckets: int = 64) -> pd.DataFrame:
    """U-shaped (position-based) multi-touch attribution with EXACT
    integer credit: 40% of each purchase's cents to the FIRST touch,
    40% to the LAST, and the remainder split equally across the
    middles (remainder cents to the earliest middles) — so credits
    always reconcile to the purchase exactly. n = 1 takes all, n = 2
    splits cents−cents//2 / cents//2, windowless purchases credit
    'direct'. All integer floor arithmetic, replayed verbatim by the
    SQL twin's CASE ladder.

    Same one-shuffle composite-axis searchsorted + vectorized window
    materialization shape as :func:`linear_touch_attribution`.
    Output: (channel, revenue_i, n_touches).
    """
    look_us = np.int64(lookback_days) * 86_400_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="stable")
        empty = pd.DataFrame({
            "channel": pd.Series([], dtype="object"),
            "revenue_i": pd.Series([], dtype="int64"),
            "n_touches": pd.Series([], dtype="int64")})
        if not len(g):
            return empty
        code = pd.factorize(g[key_col].to_numpy())[0].astype("int64")
        ts_us = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        tmin = ts_us.min()
        K = np.int64(ts_us.max() - tmin) + look_us + np.int64(2)
        comp = code * K + (ts_us - tmin)
        types = g[type_col].to_numpy()
        pos = np.flatnonzero(types == purchase_type)
        if not len(pos):
            return empty
        cutoff = np.maximum(ts_us[pos] - tmin - look_us, 0)
        ws = np.searchsorted(comp, code[pos] * K + cutoff,
                             side="left")
        n = pos - ws
        cents = np.rint(
            g[value_col].to_numpy()[pos] * 100).astype("int64")
        direct = n == 0
        rows = [pd.DataFrame({"channel": ["direct"] * int(direct.sum()),
                              "credit": cents[direct]})]
        t = ~direct
        if t.any():
            nt, wst, ct = n[t], ws[t], cents[t]
            total = int(nt.sum())
            csum = np.cumsum(nt) - nt
            rank = np.arange(total) - np.repeat(csum, nt)
            member = np.repeat(wst, nt) + rank
            rn = np.repeat(nt, nt)
            rc = np.repeat(ct, nt)
            first = rank == 0
            last = rank == rn - 1
            end40 = (rc * 2) // 5
            mid_tot = rc - 2 * end40
            # guard n-2 = 0 (no middles exist then; the where masks
            # keep the division defined)
            nmid = np.maximum(rn - 2, 1)
            mid_base = mid_tot // nmid
            mid_extra = ((rank - 1) < mid_tot % nmid).astype("int64")
            credit = np.where(
                rn == 1, rc,
                np.where(rn == 2,
                         np.where(first, rc - rc // 2, rc // 2),
                         np.where(first | last, end40,
                                  mid_base + mid_extra)))
            rows.append(pd.DataFrame({"channel": types[member],
                                      "credit": credit}))
        allc = pd.concat(rows, ignore_index=True)
        return (allc.groupby("channel", as_index=False)
                .agg(revenue_i=("credit", "sum"),
                     n_touches=("credit", "size")))

    parts = (_add_key_bucket(
        ds.select_columns([id_col, key_col, ts_col, type_col,
                           value_col]), key_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "channel": pd.Series([], dtype="object"),
            "revenue_i": pd.Series([], dtype="int64"),
            "n_touches": pd.Series([], dtype="int64")})
    out = (parts.groupby("channel", as_index=False)
           .agg(revenue_i=("revenue_i", "sum"),
                n_touches=("n_touches", "sum")))
    out["revenue_i"] = out["revenue_i"].astype("int64")
    out["n_touches"] = out["n_touches"].astype("int64")
    return out.sort_values("channel").reset_index(drop=True)


def daily_value_bands(ds: ray.data.Dataset, ts_col: str = "ts",
                      value_col: str = "value",
                      num_buckets: int = 64) -> pd.DataFrame:
    """Daily p10/p50/p90 bands of a value stream in EXACT integer
    cents (the smallest-value-reaching-ceil(q·n) discrete rule) —
    the monitoring chart that separates a level shift from a tail
    blowup, with no sampling and no float quantile interpolation.

    Block-local (day, cents, count) histogram partials are additive
    and finish in ONE day-hash shuffle; each day's quantiles are
    exact in-bucket. Output: (day, n, p10, p50, p90), sorted by day.
    """
    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "_d": pd.to_datetime(b[ts_col]).dt.normalize(),
            "_v": np.rint(b[value_col].to_numpy(np.float64)
                          * 100.0).astype(np.int64)})
        agg = g.groupby(["_d", "_v"], as_index=False).size() \
            .rename(columns={"size": "c"})
        h = pd.util.hash_pandas_object(agg["_d"], index=False)
        agg["_db"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        hist = group.groupby(["_d", "_v"], as_index=False)["c"].sum()
        rows = []
        for day, gh in hist.groupby("_d"):
            gh = gh.sort_values("_v")
            vals = gh["_v"].to_numpy(np.int64)
            cum = np.cumsum(gh["c"].to_numpy(np.int64))
            n = int(cum[-1])

            def pick(num: int, den: int) -> int:
                need = (num * n + den - 1) // den
                return int(vals[int(np.searchsorted(cum, need,
                                                    side="left"))])

            rows.append((day, n, pick(1, 10), pick(1, 2),
                         pick(9, 10)))
        return pd.DataFrame(rows, columns=["day", "n", "p10", "p50",
                                           "p90"])

    out = (ds.select_columns([ts_col, value_col])
           .map_batches(local, batch_format="pandas",
                        batch_size=None)
           .groupby("_db").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "n": pd.Series([], dtype="int64"),
            "p10": pd.Series([], dtype="int64"),
            "p50": pd.Series([], dtype="int64"),
            "p90": pd.Series([], dtype="int64")})
    for c in ("n", "p10", "p50", "p90"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def _daily_cents_series(ds: ray.data.Dataset, ts_col: str,
                        value_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Shared reduction for the trend diagnostics below: the corpus
    collapses to its DAILY value-sum series in exact integer cents —
    per-block (day, cents) partials are additive, so only
    O(blocks · active days) skinny rows reach the driver fold, and the
    series itself is O(days) no matter how many rows feed it (time,
    not data, bounds it). Returns (days, cents) sorted by day."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        day = us // np.int64(86_400_000_000)
        cents = np.rint(b[value_col].to_numpy(np.float64)
                        * 100.0).astype(np.int64)
        return pd.DataFrame({"day": day, "cents": cents}) \
            .groupby("day", as_index=False)["cents"].sum()

    parts = ds.select_columns([ts_col, value_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    if parts.empty:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    agg = parts.groupby("day", as_index=False)["cents"].sum() \
        .sort_values("day")
    return (agg["day"].to_numpy(np.int64),
            agg["cents"].to_numpy(np.int64))


def trend_robust(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                 value_col: str = "o_totalprice") -> pd.DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope of the daily
    value-sum series — the outlier-proof trend read (one corrupt day
    can drag an OLS slope anywhere; the pairwise-median slope and the
    sign-only S statistic shrug it off), the growth gauge a corpus
    operator checks before attributing a throughput change to a code
    change.

    The distributed part is :func:`_daily_cents_series`'s additive
    partial fold; the O(days²) pair stage runs on the driver over the
    O(days) series (2 400 days → 2.9 M pairs — bounded by calendar
    time, never by corpus size). ``S = Σ_{i<j} sign(y_j − y_i)`` is an
    exact integer; ``tau = S / (n(n−1)/2)`` is one float division of
    exact ints (tau-a); the Sen slope is the ceil(m/2)-ranked value of
    the pairwise slopes ``(y_j − y_i)/(x_j − x_i)``, each one int64
    subtraction pair and one IEEE division — the identical expression
    the SQL twin's row_number ranking replays, so the selected double
    is bit-equal. Output one row:
    (n_days, s_stat, tau, sen_slope_cents_per_day)."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    if n < 2:
        return pd.DataFrame({
            "n_days": pd.Series([n], dtype="int64"),
            "s_stat": pd.Series([0], dtype="int64"),
            "tau": pd.Series([float("nan")], dtype="float64"),
            "sen_slope_cents_per_day": pd.Series([float("nan")],
                                                 dtype="float64")})
    m = n * (n - 1) // 2
    slopes = np.empty(m, dtype=np.float64)
    s_stat = 0
    pos = 0
    for i in range(n - 1):                   # O(days) driver loop
        dy = cents[i + 1:] - cents[i]
        dx = days[i + 1:] - days[i]
        s_stat += int((dy > 0).sum()) - int((dy < 0).sum())
        k = len(dy)
        slopes[pos:pos + k] = dy.astype(np.float64) \
            / dx.astype(np.float64)
        pos += k
    rank = (m + 1) // 2                      # ceil(m/2), 1-indexed
    sen = float(np.partition(slopes, rank - 1)[rank - 1])
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "s_stat": pd.Series([s_stat], dtype="int64"),
        "tau": pd.Series([float(s_stat) / float(m)], dtype="float64"),
        "sen_slope_cents_per_day": pd.Series([sen], dtype="float64")})


def change_point(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                 value_col: str = "o_totalprice") -> pd.DataFrame:
    """Exact single change-point of the daily value-sum series: the
    split k (1 ≤ k < n, in day order) minimizing
    ``SSE_left + SSE_right`` — the level-shift locator behind "did the
    source change its publishing rate / did the crawler break on day
    X", solved exactly instead of eyeballing a chart.

    Rides :func:`_daily_cents_series` (additive partials, O(days)
    driver series). Prefix sums S_k and squared sums Q_k fold in
    exact Python ints (no int64 wrap at any cardinality); each
    split's cost is the single float expression
    ``(Q_k − S_k²/k) + (Q_r − S_r²/(n−k))`` built from those exact
    ints — the same parenthesization the SQL twin evaluates, so the
    argmin compares bit-identical doubles (ties → smallest k).
    Output one row: (split_day, n_left, n_right, mean_left_cents,
    mean_right_cents, sse_split, sse_total)."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    if n < 2:
        return pd.DataFrame({
            "split_day": pd.Series([], dtype="int64"),
            "n_left": pd.Series([], dtype="int64"),
            "n_right": pd.Series([], dtype="int64"),
            "mean_left_cents": pd.Series([], dtype="float64"),
            "mean_right_cents": pd.Series([], dtype="float64"),
            "sse_split": pd.Series([], dtype="float64"),
            "sse_total": pd.Series([], dtype="float64")})
    ys = [int(v) for v in cents]
    S = [0] * (n + 1)
    Q = [0] * (n + 1)
    for i, v in enumerate(ys):               # exact int prefix folds
        S[i + 1] = S[i] + v
        Q[i + 1] = Q[i] + v * v
    Sn, Qn = S[n], Q[n]
    best_cost, best_k = None, None
    for k in range(1, n):
        sk, qk = S[k], Q[k]
        sr, qr = Sn - sk, Qn - qk
        nr = n - k
        cost = (float(qk) - float(sk) * float(sk) / float(k)) \
            + (float(qr) - float(sr) * float(sr) / float(nr))
        if best_cost is None or cost < best_cost:
            best_cost, best_k = cost, k
    k = best_k
    return pd.DataFrame({
        "split_day": pd.Series([int(days[k])], dtype="int64"),
        "n_left": pd.Series([k], dtype="int64"),
        "n_right": pd.Series([n - k], dtype="int64"),
        "mean_left_cents": pd.Series(
            [float(S[k]) / float(k)], dtype="float64"),
        "mean_right_cents": pd.Series(
            [float(Sn - S[k]) / float(n - k)], dtype="float64"),
        "sse_split": pd.Series([best_cost], dtype="float64"),
        "sse_total": pd.Series(
            [float(Qn) - float(Sn) * float(Sn) / float(n)],
            dtype="float64")})


def dow_anomaly(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                value_col: str = "o_totalprice",
                z: int = 2) -> pd.DataFrame:
    """Weekday-deseasonalized daily-value anomalies: days whose value
    sum deviates from their OWN day-of-week's mean by more than
    ``z`` population standard deviations — the seasonality-aware
    spike/outage detector (a quiet Sunday is normal; a Sunday with
    Tuesday volume is not), the read a flat threshold like
    :func:`ops.stats.daily_volume_anomalies` can't give when traffic
    has a weekly rhythm.

    Rides :func:`_daily_cents_series` (additive (day, cents)
    partials, O(days) driver series). Per weekday (epoch-day mod 7;
    day 0 = Thursday — arbitrary but identical in the SQL twin) the
    fold keeps exact Python-int (n, S, Q); the anomaly test is the
    CROSS-MULTIPLIED exact-integer rule
    ``(n·x − S)² > z²·(n·Q − S²)`` — |x − mean| > z·std with both
    sides scaled by n², so NO float comparison ever picks the set
    (partitioning- and reassociation-proof). The reported z-score
    ``(n·x − S)/sqrt(n·Q − S²)`` is one float division of exact ints,
    replayed verbatim by the SQL twin. Weekdays with fewer than 2
    observed days or zero variance yield no anomalies. Output:
    (day, dow, cents, z_score), sorted by day."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="int64"),
        "dow": pd.Series([], dtype="int64"),
        "cents": pd.Series([], dtype="int64"),
        "z_score": pd.Series([], dtype="float64")})
    if len(days) == 0:
        return empty
    stats: dict[int, list[int]] = {}
    for d, c in zip(days, cents):
        st = stats.setdefault(int(d) % 7, [0, 0, 0])
        st[0] += 1
        st[1] += int(c)
        st[2] += int(c) * int(c)
    rows = []
    for d, c in zip(days, cents):
        n, S, Q = stats[int(d) % 7]
        if n < 2:
            continue
        var_n2 = n * Q - S * S            # n² · population variance
        if var_n2 <= 0:
            continue
        dev = n * int(c) - S              # n · (x − mean)
        if dev * dev > z * z * var_n2:    # exact-integer anomaly rule
            rows.append((int(d), int(d) % 7, int(c),
                         float(dev) / math.sqrt(float(var_n2))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["day", "dow", "cents",
                                      "z_score"])
    for c in ("day", "dow", "cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def huber_trend(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                value_col: str = "o_totalprice",
                iters: int = 3) -> pd.DataFrame:
    """Huber-IRLS robust linear trend of the daily value-sum series —
    the middle ground between the OLS line (one corrupt day drags it
    anywhere) and the Theil–Sen median slope (:func:`trend_robust`):
    outliers keep a vote, just a bounded one. Fully deterministic
    replay recipe (every step mirrored by the SQL twin):

    1. exact-integer OLS (HUGEINT moment sums; the slope is ONE
       float division of the two big ints, cast-to-double-then-divide
       on both sides);
    2. residual scale via median/MAD order statistics ((n+1)//2-th
       smallest, ties by day — row_number-replayable), scale =
       1.4826·MAD, clip point delta = 1.345·scale;
    3. ``iters`` unrolled IRLS steps: w = 1 if |r| ≤ δ else δ/|r|,
       weighted-moment refit. Float sums reassociate vs the SQL
       engine (~1e-12 relative — tolerance-registered); the weight
       BRANCH is the only discontinuity, and the margin
       min(|r| − δ) is pytest-asserted to dwarf the drift.

    Distributed part: the corpus collapses to the O(days) daily cents
    series via additive partials (:func:`_daily_cents_series`); the
    IRLS loop is O(days · iters) driver arithmetic. Output one row:
    (n_days, ols_slope, ols_intercept, scale, delta, huber_slope,
    huber_intercept, n_downweighted).
    """
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    if n < 3:
        return pd.DataFrame({
            "n_days": pd.Series([n], dtype="int64"),
            "ols_slope": [float("nan")], "ols_intercept": [float("nan")],
            "scale": [float("nan")], "delta": [float("nan")],
            "huber_slope": [float("nan")],
            "huber_intercept": [float("nan")],
            "n_downweighted": pd.Series([0], dtype="int64")})
    x = (days - days[0]).astype(np.int64)
    y = cents
    xi = [int(v) for v in x]
    yi = [int(v) for v in y]
    Sx, Sy = sum(xi), sum(yi)
    Sxx = sum(v * v for v in xi)
    Sxy = sum(a * b for a, b in zip(xi, yi))
    num, den = n * Sxy - Sx * Sy, n * Sxx - Sx * Sx
    b0 = float(num) / float(den)
    a0 = (float(Sy) - b0 * float(Sx)) / float(n)

    xf = x.astype(np.float64)
    yf = y.astype(np.float64)
    r = yf - (a0 + b0 * xf)

    def _order_stat(vals: np.ndarray) -> float:
        k = (n + 1) // 2 - 1                    # 0-based
        order = np.lexsort((days, vals))
        return float(vals[order[k]])

    med = _order_stat(r)
    mad = _order_stat(np.abs(r - med))
    scale = 1.4826 * mad
    delta = 1.345 * scale

    a_h, b_h = a0, b0
    n_down = 0
    if delta > 0:
        for _ in range(int(iters)):
            r = yf - (a_h + b_h * xf)
            absr = np.abs(r)
            w = np.where(absr <= delta, 1.0, delta / absr)
            Sw = float(np.sum(w))
            Swx = float(np.sum(w * xf))
            Swy = float(np.sum(w * yf))
            Swxx = float(np.sum(w * xf * xf))
            Swxy = float(np.sum(w * xf * yf))
            db = Sw * Swxx - Swx * Swx
            b_h = (Sw * Swxy - Swx * Swy) / db
            a_h = (Swy - b_h * Swx) / Sw
        r = yf - (a_h + b_h * xf)
        n_down = int((np.abs(r) > delta).sum())
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "ols_slope": [b0], "ols_intercept": [a0],
        "scale": [scale], "delta": [delta],
        "huber_slope": [b_h], "huber_intercept": [a_h],
        "n_downweighted": pd.Series([n_down], dtype="int64")})


def hampel_anomalies(ds: ray.data.Dataset,
                     ts_col: str = "o_orderdate",
                     value_col: str = "o_totalprice",
                     half_window: int = 3,
                     k_sigma: float = 3.0) -> pd.DataFrame:
    """Hampel filter over the daily value-sum series: a day is
    anomalous when it sits more than ``k_sigma`` robust sigmas
    (1.4826·MAD) from the CENTERED rolling median of its ±
    ``half_window``-day neighborhood (edge windows truncate) — the
    local-context outlier read that a global MAD threshold misses
    when the series has level shifts.

    Order statistics use the explicit lower-nearest-rank rule
    ``sorted[floor((n−1)/2)]`` — DuckDB ``quantile_disc(0.5)``
    semantics, so the SQL twin's correlated window subqueries replay
    the medians verbatim; the flag boundary margin
    ``||x − med| − k·1.4826·mad|`` is pytest-asserted. Distributed
    part: the additive daily-cents fold (:func:`_daily_cents_series`);
    the filter is O(days · window) driver arithmetic. Output per day:
    (day, cents, med, mad, threshold, is_anomaly)."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    day_idx = {int(d): i for i, d in enumerate(days)}
    med = np.empty(n, dtype=np.float64)
    mad = np.empty(n, dtype=np.float64)
    for i in range(n):
        lo_day, hi_day = int(days[i]) - half_window, \
            int(days[i]) + half_window
        sel = [day_idx[d] for d in range(lo_day, hi_day + 1)
               if d in day_idx]
        w = np.sort(cents[sel])
        m = float(w[(len(w) - 1) // 2])
        med[i] = m
        aw = np.sort(np.abs(cents[sel].astype(np.float64) - m))
        mad[i] = float(aw[(len(aw) - 1) // 2])
    thresh = k_sigma * (1.4826 * mad)
    dev = np.abs(cents.astype(np.float64) - med)
    return pd.DataFrame({
        "day": pd.Series(days, dtype="int64"),
        "cents": pd.Series(cents, dtype="int64"),
        "med": med, "mad": mad, "threshold": thresh,
        "is_anomaly": dev > thresh})


def max_revenue_run(ds: ray.data.Dataset,
                    ts_col: str = "o_orderdate",
                    value_col: str = "o_totalprice") -> pd.DataFrame:
    """Maximum-sum contiguous run of CENTERED daily revenue — "which
    stretch of days most outperformed the average?" (Kadane's
    problem). Deviations are kept integral by scaling:
    ``d_i = n·cents_i − Σcents`` (sums to zero exactly), so the whole
    computation is exact integer arithmetic and ANY partitioning or
    SQL replay is bit-identical. The replay form is the prefix-min
    identity (no sequential scan state): with ``P_i`` the prefix sum
    of d, ``best = max_i (P_i − min_{j<i} P_j)``; ties resolve to the
    smallest end day, then the smallest start (= the smallest argmin
    prefix). Output one row: (n_days, start_day, end_day, run_days,
    run_sum_scaled) — run_sum_scaled is in n·cents units.

    Distributed part: the additive daily-cents fold
    (:func:`_daily_cents_series`); the scan is O(days) driver ints."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    if n == 0:
        return pd.DataFrame({
            "n_days": pd.Series([0], dtype="int64"),
            "start_day": pd.Series([0], dtype="int64"),
            "end_day": pd.Series([0], dtype="int64"),
            "run_days": pd.Series([0], dtype="int64"),
            "run_sum_scaled": pd.Series([0], dtype="int64")})
    total = int(cents.sum())
    d = [int(c) * n - total for c in cents]
    best = None                  # (−score, end_idx, start_idx)
    pmin, pmin_idx = 0, 0        # min prefix among j < i, smallest j
    p = 0
    for i in range(1, n + 1):
        p += d[i - 1]
        score = p - pmin
        cand = (-score, i, pmin_idx)
        if best is None or cand < best:
            best = cand
        if p < pmin:                # strict: keep the EARLIEST argmin
            pmin, pmin_idx = p, i
    score, end_i, start_j = -best[0], best[1], best[2]
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "start_day": pd.Series([int(days[start_j])], dtype="int64"),
        "end_day": pd.Series([int(days[end_i - 1])], dtype="int64"),
        "run_days": pd.Series([end_i - start_j], dtype="int64"),
        "run_sum_scaled": pd.Series([score], dtype="int64")})


def voptimal_histogram(ds: ray.data.Dataset, n_buckets: int = 6,
                       ts_col: str = "o_orderdate",
                       id_col: str = "o_orderkey") -> pd.DataFrame:
    """V-optimal histogram of the daily ORDER-COUNT series: partition
    the day axis into ``n_buckets`` CONTIGUOUS buckets minimizing
    total within-bucket SSE — the DP optimum a query optimizer wants
    where equi-width/equi-depth are only heuristics.

    Deterministic replay recipe: counts keep every moment inside
    int64 (Σv² over the calendar ≪ 2⁶³, unlike revenue cents — the
    reason this operator is defined over counts), so segment cost
    ``cost(a..b) = double(q) − double(s·s)/double(len)`` is built
    from EXACT integer prefix differences and evaluates the identical
    float expression in the SQL twin; the DP ``dp_k[i] = min_j
    dp_{k−1}[j] + cost(j+1..i)`` unrolls as k join-min CTEs, ties to
    the smallest split j (numpy argmin-first == SQL (v, j) min).
    O(days²·k) vectorized work on O(days) state — bounded by
    calendar, not corpus. Output per bucket: (bucket, start_day,
    end_day, n_days, sum_count, sse)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        day = us // np.int64(86_400_000_000)
        return pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size().rename(columns={"size": "v"})

    parts = ds.select_columns([ts_col, id_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("day", as_index=False)["v"].sum() \
        .sort_values("day")
    days = agg["day"].to_numpy(np.int64)
    vals = agg["v"].to_numpy(np.int64)
    n = len(days)
    k = min(n_buckets, n)
    if n == 0:
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ("bucket", "start_day", "end_day",
                                      "n_days", "sum_count")})
        out["sse"] = pd.Series([], dtype="float64")
        return out
    S = np.concatenate([[0], np.cumsum(vals)]).astype(np.int64)
    Q = np.concatenate([[0], np.cumsum(vals * vals)]).astype(np.int64)

    def cost_vec(js: np.ndarray, i: int) -> np.ndarray:
        s = (S[i] - S[js]).astype(np.int64)
        q = (Q[i] - Q[js]).astype(np.float64)
        ln = (i - js).astype(np.float64)
        return q - (s * s).astype(np.float64) / ln

    INF = float("inf")
    dp = np.full((k + 1, n + 1), INF, dtype=np.float64)
    arg = np.zeros((k + 1, n + 1), dtype=np.int64)
    dp[0][0] = 0.0
    for kk in range(1, k + 1):
        for i in range(kk, n + 1):
            js = np.arange(kk - 1, i, dtype=np.int64)
            v = dp[kk - 1][js] + cost_vec(js, i)
            b = int(np.argmin(v))           # first min → smallest j
            dp[kk][i] = v[b]
            arg[kk][i] = js[b]
    bounds = []
    i = n
    for kk in range(k, 0, -1):
        j = int(arg[kk][i])
        bounds.append((j + 1, i))
        i = j
    bounds.reverse()
    rows = []
    for b_idx, (a, b) in enumerate(bounds):
        s = int(S[b] - S[a - 1])
        q = int(Q[b] - Q[a - 1])
        sse = float(q) - float(s * s) / float(b - a + 1)
        rows.append((b_idx, int(days[a - 1]), int(days[b - 1]),
                     b - a + 1, s, sse))
    return pd.DataFrame(rows, columns=[
        "bucket", "start_day", "end_day", "n_days", "sum_count",
        "sse"]).astype({"bucket": "int64", "start_day": "int64",
                        "end_day": "int64", "n_days": "int64",
                        "sum_count": "int64"})


def lis_revenue(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                value_col: str = "o_totalprice") -> pd.DataFrame:
    """Longest strictly-increasing subsequence of the daily revenue
    series — the maximal monotone-growth story the data supports (an
    OLS slope says "up on average"; LIS says how long a strictly
    rising chain exists). Exact integers end-to-end: ``lis[i] = 1 +
    max{lis[j] : j < i, cents_j < cents_i}`` — the O(days²) DP the
    SQL twin replays as one self-join (bounded by calendar, never
    corpus). Output per day: (day, cents, lis_len), plus the overall
    maximum is ``lis_len.max()``."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    lis = np.ones(n, dtype=np.int64)
    c = cents
    for i in range(1, n):
        m = c[:i] < c[i]
        if m.any():
            lis[i] = 1 + lis[:i][m].max()
    return pd.DataFrame({"day": pd.Series(days, dtype="int64"),
                         "cents": pd.Series(cents, dtype="int64"),
                         "lis_len": pd.Series(lis, dtype="int64")})


def mase_weekly(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
                value_col: str = "o_totalprice",
                season: int = 7) -> pd.DataFrame:
    """MASE-style seasonal accuracy read of the daily revenue series:
    mean absolute error of the SEASONAL-naive forecast (value 7 days
    ago) vs the plain naive (yesterday), plus their ratio — below 1
    means weekly seasonality is real signal a forecaster must model.
    Lags are by CALENDAR day (missing days make a lag undefined and
    that pair is skipped — documented so the SQL twin's day-keyed
    self-join replays it). Absolute errors are exact integer cents;
    the two means and the ratio are the only floats. Output one row:
    (n_naive, n_seasonal, mae_naive, mae_seasonal, mase)."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    dmap = dict(zip(days.tolist(), (int(c) for c in cents)))
    ae1, ae7 = [], []
    for d, c in dmap.items():
        if d - 1 in dmap:
            ae1.append(abs(c - dmap[d - 1]))
        if d - season in dmap:
            ae7.append(abs(c - dmap[d - season]))
    mae1 = sum(ae1) / len(ae1) if ae1 else float("nan")
    mae7 = sum(ae7) / len(ae7) if ae7 else float("nan")
    return pd.DataFrame({
        "n_naive": pd.Series([len(ae1)], dtype="int64"),
        "n_seasonal": pd.Series([len(ae7)], dtype="int64"),
        "mae_naive": [mae1], "mae_seasonal": [mae7],
        "mase": [mae7 / mae1 if ae1 and ae7 else float("nan")]})


def rolling_slope(ds: ray.data.Dataset, window_days: int = 28,
                  ts_col: str = "o_orderdate",
                  value_col: str = "o_totalprice") -> pd.DataFrame:
    """Trailing-window OLS slope of daily revenue (cents/day over the
    last ``window_days`` CALENDAR days) — the local-trend dial a
    single global slope flattens. Exact integer window moments (x =
    absolute epoch day, y = daily cents; the slope is one cast-and-
    divide of two big ints, bit-equal to the SQL twin's day-range
    self-join), NaN where the window holds fewer than 2 days. O(days
    × window) driver arithmetic over the additive daily fold. Output
    per day: (day, cents, n_win, slope)."""
    days, cents = _daily_cents_series(ds, ts_col, value_col)
    dmap = dict(zip(days.tolist(), (int(c) for c in cents)))
    rows = []
    for d in days.tolist():
        xs = [(dd, dmap[dd]) for dd in range(d - window_days + 1,
                                             d + 1) if dd in dmap]
        n = len(xs)
        if n < 2:
            rows.append((d, dmap[d], n, float("nan")))
            continue
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx = sum(x * x for x, _ in xs)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        rows.append((d, dmap[d], n,
                     float(num) / float(den) if den else float("nan")))
    return pd.DataFrame(rows, columns=["day", "cents", "n_win",
                                       "slope"]).astype(
        {"day": "int64", "cents": "int64", "n_win": "int64"})


def runs_test(ds: ray.data.Dataset, ts_col: str = "o_orderdate",
              value_col: str = "o_totalprice") -> pd.DataFrame:
    """Wald-Wolfowitz runs test of the daily revenue series around
    its median — is the above/below-median sequence RANDOM, or does
    it trend/cycle (too few runs) or oscillate (too many)? The
    distribution-free serial-dependence screen before any trend
    claim.

    Deterministic recipe (SQL-replayable): the median is the
    quantile_disc(0.5) order statistic (ties by day); days EQUAL to
    the median drop (the standard tie handling, documented); the run
    count is 1 + sign changes in day order (exact int via a lag
    census); μ = 2n₁n₂/(n₁+n₂) + 1 and σ² =
    2n₁n₂(2n₁n₂−n₁−n₂)/((n₁+n₂)²(n₁+n₂−1)) are the closed forms,
    and z = (R − μ)/σ is the only compounded float. O(days) driver
    ints over the additive daily fold. Output one row: (n_above,
    n_below, n_runs, mu, z)."""
    import math

    days, cents = _daily_cents_series(ds, ts_col, value_col)
    n = len(days)
    order = np.lexsort((days, cents))
    med = int(cents[order[(n - 1) // 2]])
    signs = [1 if int(c) > med else 0 for c in cents if int(c) != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    if n1 == 0 or n2 == 0:
        return pd.DataFrame({
            "n_above": pd.Series([n1], dtype="int64"),
            "n_below": pd.Series([n2], dtype="int64"),
            "n_runs": pd.Series([1 if signs else 0], dtype="int64"),
            "mu": [float("nan")], "z": [float("nan")]})
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / float(nn) + 1.0
    var = (2.0 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
           / (float(nn) * float(nn) * float(nn - 1)))
    z = (float(runs) - mu) / math.sqrt(var)
    return pd.DataFrame({
        "n_above": pd.Series([n1], dtype="int64"),
        "n_below": pd.Series([n2], dtype="int64"),
        "n_runs": pd.Series([runs], dtype="int64"),
        "mu": [mu], "z": [z]})
