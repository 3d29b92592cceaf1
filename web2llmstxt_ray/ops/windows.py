"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windowing; the engine's pattern (per the
public Ray guidance) is: partition by key, sort within the group, and
window with pandas inside ``groupby().map_groups``. Tumbling windows
reduce to a grouped aggregate on a floored-timestamp key — so they use
the scale-friendly partial-aggregation path instead of map_groups.
"""

from __future__ import annotations

import pandas as pd
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


def sessionize(ds: ray.data.Dataset, gap_minutes: float = 30.0,
               key_col: str = "user_id", ts_col: str = "ts") -> ray.data.Dataset:
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``.

    Requires all of one key's events in one group → ``groupby(key)``
    shuffle, then an ordered scan per group (the stated partitioning
    assumption: session state never spans keys).
    Output: (key, n_sessions, n_events).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_col].sort_values()
        breaks = (ts.diff() > gap).sum()
        return pd.DataFrame({
            key_col: [group[key_col].iloc[0]],
            "n_sessions": [int(breaks) + 1],
            "n_events": [len(group)],
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def session_stats(ds: ray.data.Dataset, gap_minutes: float = 30.0,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value") -> ray.data.Dataset:
    """Exploded per-session rows: (key, session_idx, n_events,
    duration_s, sum_value) — the windowed-aggregate building block."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        new_session = (g[ts_col].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            first_ts=(ts_col, "min"), last_ts=(ts_col, "max"),
            n_events=(ts_col, "size"), sum_value=(value_col, "sum"))
        out = out.reset_index(drop=True)
        out["session_idx"] = range(len(out))
        out["duration_s"] = (out["last_ts"] - out["first_ts"]).dt.total_seconds()
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_idx", "n_events", "duration_s", "sum_value"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
