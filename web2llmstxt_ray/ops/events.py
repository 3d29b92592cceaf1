"""Event-log analytics: stream dedup, cohort retention, funnels.

Product-analytics shapes the reference's event semantics imply but Ray
Data has no built-in for.  All three share ONE scale shape: the only
shuffle is the hash(user)→bucket exchange (bounded fan-in, no per-user
1-row blocks — the pathology ``ops/windows.py`` documents), everything
inside a bucket is vectorized pandas, and whatever leaves a bucket is
per-user-bounded (dedup verdicts) or aggregate-sized (cohort cells,
funnel counters), never the raw event stream again.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .relational import partial_groupby
from .windows import _add_key_bucket


def dedup_window(ds: ray.data.Dataset, gap_seconds: float = 30.0,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts",
                 id_col: str = "event_id",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Stream dedup: drop an event when the SAME (user, type) emitted
    its immediate predecessor ≤ ``gap_seconds`` earlier (duplicate
    client retries / double-clicks).  Lag semantics — each event is
    judged against the one directly before it in (ts, id) order, so a
    long burst keeps only rows spaced > gap from their predecessor;
    equal-timestamp duplicates always drop (diff 0 ≤ gap).

    Scale: one bucketed shuffle; within a bucket one stable sort +
    groupby-diff (both C-vectorized).  Output is the kept ``id_col``
    rows only.
    """
    gap_us = int(round(gap_seconds * 1_000_000))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, type_col, ts_col, id_col],
                              kind="stable")
        us = g[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        d = us.groupby(
            [g[user_col], g[type_col]], sort=False).diff()
        keep = d.isna() | (d > gap_us)
        return pd.DataFrame({id_col: g.loc[keep.to_numpy(), id_col]
                             .to_numpy()})

    return _add_key_bucket(
        ds.select_columns([id_col, user_col, type_col, ts_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def cohort_retention(ds: ray.data.Dataset, user_col: str = "user_id",
                     ts_col: str = "ts",
                     num_buckets: int = 64) -> pd.DataFrame:
    """Classic cohort-retention grid: cohort = a user's FIRST active
    calendar day; one output cell per (cohort_day, day_offset) counting
    the distinct users from that cohort active ``day_offset`` days
    later.

    Scale shape: the bucketed shuffle co-locates each user's rows, the
    bucket pass collapses them to distinct (user, active-day) rows
    tagged with the user's min day — per-user-bounded, typically ≪
    events — and the grid itself rides the additive partial-aggregate
    path (each row is one distinct user by construction, so a plain
    count IS count-distinct).  ``cohort_day`` is emitted as an ISO
    string so the driver's canonicalizer and DuckDB agree byte-for-byte.
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        day = group[ts_col].astype("datetime64[ns]").dt.normalize()
        g = pd.DataFrame({user_col: group[user_col], "_day": day})
        g = g.drop_duplicates([user_col, "_day"])
        first = g.groupby(user_col, sort=False)["_day"].transform("min")
        return pd.DataFrame({
            "cohort_day": first.dt.strftime("%Y-%m-%d"),
            "day_offset": ((g["_day"] - first).dt.days
                           .astype("int64")),
        })

    cells = _add_key_bucket(
        ds.select_columns([user_col, ts_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")

    def count_cells(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["cohort_day", "day_offset"],
                             as_index=False).agg(n_users=("day_offset",
                                                          "size"))

    return partial_groupby(cells, ["cohort_day", "day_offset"],
                           count_cells, ["n_users"])


def funnel(ds: ray.data.Dataset, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts", within_seconds: float | None = None,
           num_buckets: int = 64) -> pd.DataFrame:
    """Ordered-funnel conversion: how many users completed each prefix
    of ``steps`` strictly in time order (first step-1 event, then the
    first step-2 event strictly after it, …).  Strict ``>`` on the
    timestamp, so a same-instant next-step event does not convert.

    ``within_seconds`` adds the classic per-step conversion timeout:
    each next-step event must also land within that many seconds of
    completing the previous step (same filtered-min chain, one extra
    vectorized bound — no change to the shuffle shape).

    Scale shape: users are independent, so the bucketed shuffle makes
    each conversion chain local; within a bucket each step is one
    filtered groupby-min + hash merge (vectorized, no per-user Python).
    Only ``len(steps)`` partial counters per bucket reach the driver.
    Returns (step_no, step, n_users) with step_no 1-based.
    """
    if not steps:
        raise ValueError("steps must be non-empty")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        counts = []
        # reached: user -> timestamp of completing the previous step
        reached = None
        for i, step in enumerate(steps):
            ev = group[group[type_col] == step]
            if reached is not None:
                ev = ev.merge(reached, on=user_col, how="inner")
                keep = ev[ts_col] > ev["_prev"]
                if within_seconds is not None:
                    keep &= ev[ts_col] <= ev["_prev"] + pd.Timedelta(
                        seconds=within_seconds)
                ev = ev[keep].drop(columns=["_prev"])
            t = (ev.groupby(user_col, as_index=False)[ts_col].min()
                 .rename(columns={ts_col: "_prev"}))
            counts.append(len(t))
            reached = t
        return pd.DataFrame({"step_no": range(1, len(steps) + 1),
                             "step": steps, "n_users": counts})

    out = partial_groupby(
        _add_key_bucket(ds.select_columns([user_col, type_col, ts_col]),
                        user_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas"),
        ["step_no", "step"], lambda b: b, ["n_users"])
    return out.sort_values("step_no").reset_index(drop=True)


def user_journeys(ds: ray.data.Dataset, sep: str = ">",
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", id_col: str = "event_id",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Per-user ordered event-type journey string (the grouped ordered
    ``string_agg``): one bucketed shuffle, then a stable vectorized
    sort + groupby-join per bucket. Deterministic total order
    (ts, id) inside each user. Output: (user_id, journey, n_events)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col], kind="stable")
        out = g.groupby(user_col, as_index=False).agg(
            journey=(type_col, sep.join), n_events=(type_col, "size"))
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _add_key_bucket(
        ds.select_columns([user_col, type_col, ts_col, id_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def activity_streaks(ds: ray.data.Dataset, user_col: str = "user_id",
                     ts_col: str = "ts",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active calendar
    days per user (the SQL row_number-difference idiom — group by
    ``day - row_number() OVER (PARTITION BY user ORDER BY day)`` over
    the distinct (user, day) set). Days are exact integer epoch-days
    (``epoch_us // 86400e6``, int64 floor division on both sides), so
    the result is hash-exact.

    Scale shape: one bucketed shuffle of the (user, day)-deduped
    skinny pairs; inside a bucket one sort + cumcount + groupby does
    every user at once. Output: (user, streak_start_day,
    streak_end_day, n_days) — one row per island.
    """
    import numpy as np
    import pyarrow as pa

    day_us = 86_400_000_000

    def to_days(batch: pa.Table) -> pa.Table:
        us = np.asarray(
            batch.column(ts_col).cast(pa.timestamp("us"))
            .cast(pa.int64()), dtype=np.int64)
        return pa.table({
            user_col: batch.column(user_col),
            "_day": pa.array(us // day_us, pa.int64()),
        })

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = (group[[user_col, "_day"]]
             .drop_duplicates()
             .sort_values([user_col, "_day"], kind="stable"))
        rn = g.groupby(user_col, sort=False).cumcount()
        g = g.assign(_anchor=g["_day"].to_numpy() - rn.to_numpy())
        out = g.groupby([user_col, "_anchor"], as_index=False).agg(
            streak_start_day=("_day", "min"),
            streak_end_day=("_day", "max"),
            n_days=("_day", "size"))
        out["n_days"] = out["n_days"].astype("int64")
        return out[[user_col, "streak_start_day", "streak_end_day",
                    "n_days"]]

    skinny = ds.select_columns([user_col, ts_col]).map_batches(
        to_days, batch_format="pyarrow")
    return _add_key_bucket(skinny, user_col, num_buckets).groupby(
        "_sbucket").map_groups(per_bucket, batch_format="pandas")


def transition_counts(ds: ray.data.Dataset, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id",
                      num_buckets: int = 64) -> pd.DataFrame:
    """First-order Markov transition counts: for each user's event
    stream ordered by (ts, id), count global (previous type → type)
    pairs — the SQL ``lag(type) OVER (PARTITION BY user ORDER BY ts,
    id)`` shape; each user's first event has no predecessor and is
    excluded.

    Scale shape: one bucketed shuffle co-locates each user's events;
    inside a bucket one sort + vectorized groupby-shift computes lags
    for every user at once and collapses to per-bucket partial counts,
    so only ``O(buckets × |types|²)`` skinny rows reach the driver
    combine. Output: (prev_type, event_type, n).
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col], kind="stable")
        prev = g.groupby(user_col, sort=False)[type_col].shift(1)
        m = prev.notna().to_numpy()
        part = pd.DataFrame({
            "prev_type": prev.to_numpy()[m],
            type_col: g[type_col].to_numpy()[m],
        }).groupby(["prev_type", type_col], as_index=False).size()
        return part.rename(columns={"size": "n"})

    parts = (_add_key_bucket(
        ds.select_columns([id_col, user_col, type_col, ts_col]),
        user_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    if parts.empty or "prev_type" not in parts.columns:
        # no user had a second event: every per-bucket partial was
        # empty, so the concat carries no schema
        return pd.DataFrame({
            "prev_type": pd.Series([], dtype="object"),
            type_col: pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64")})
    out = parts.groupby(["prev_type", type_col], as_index=False)["n"] \
        .sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", type_col]).reset_index(
        drop=True)


def time_since_event(ds: ray.data.Dataset, cond_type: str,
                     user_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     type_col: str = "event_type",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Per-event recency feature: microseconds since the user's most
    recent ``cond_type`` event STRICTLY EARLIER in (ts, id) frame
    order — the conditional-frame navigation window (``MAX(CASE WHEN
    type=X THEN ts END) OVER (... ROWS … 1 PRECEDING)``), NULL/NaN
    when no prior match. One hash(user) bucket shuffle co-locates each
    user's events; inside a bucket the lookup is a positional
    ``maximum.accumulate`` over matching indices with per-user reset —
    the same monotone-index trick as the span caption miner, no
    per-user loop. Output: (event_id, delta_us:float64, NaN = none)."""
    import numpy as np

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="stable").reset_index(drop=True)
        n = len(g)
        # pin to µs regardless of the input's datetime resolution
        ts = g[ts_col].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        users = g[user_col].to_numpy()
        new_user = np.ones(n, bool)
        if n > 1:
            new_user[1:] = users[1:] != users[:-1]
        ustart = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0))
        is_cond = (g[type_col] == cond_type).to_numpy()
        idx = np.arange(n)
        last_cond = np.maximum.accumulate(np.where(is_cond, idx, -1))
        # strictly earlier: shift by one frame position
        prev_cond = np.concatenate(([-1], last_cond[:-1]))
        ok = (prev_cond >= ustart) & (prev_cond >= 0)
        delta = np.where(ok,
                         (ts - ts[np.clip(prev_cond, 0, n - 1)])
                         .astype("float64"),
                         np.nan)
        return pd.DataFrame({id_col: g[id_col],
                             "delta_us": delta})

    return _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def type_overlap_matrix(ds: ray.data.Dataset,
                        user_col: str = "user_id",
                        type_col: str = "event_type",
                        num_buckets: int = 64) -> pd.DataFrame:
    """Audience overlap: |users(a) ∩ users(b)| for every type pair
    (a ≤ b; the diagonal is per-type distinct users) — EXACT, without
    the quadratic self-join: distinct (user, type) pairs collapse per
    block, shuffle ONCE by hash(user), each bucket folds its users
    into per-user type BITMASKS and emits mask→count partials
    (≤ 2^|types| skinny rows per bucket); the driver combines masks
    and reads every pairwise intersection out of the mask histogram.
    Traffic is O(distinct pairs); driver work is O(buckets · 2^k + k²)
    for k types (k ≤ 30)."""
    import numpy as np

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b[[user_col, type_col]].drop_duplicates()

    # materialized: consumed twice (type-universe fold + mask pass) —
    # an unmaterialized parent re-executes per consumer
    pairs = _add_key_bucket(
        ds.select_columns([user_col, type_col]).map_batches(
            local_distinct, batch_format="pandas", batch_size=None),
        user_col, num_buckets).materialize()

    # type universe: tiny distinct fold
    types = sorted(pairs.select_columns([type_col]).map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas",
        batch_size=None).to_pandas()[type_col].unique())
    if len(types) > 30:
        raise ValueError("type cardinality too high for bitmasks")
    tidx = {t: i for i, t in enumerate(types)}
    import ray as _ray
    tref = _ray.put(tidx)

    def mask_counts(g: pd.DataFrame) -> pd.DataFrame:
        ti = _ray.get(tref)
        d = g[[user_col, type_col]].drop_duplicates()
        bits = d[type_col].map(ti).to_numpy()
        masks = pd.Series(
            np.left_shift(np.int64(1), bits),
            index=d[user_col].to_numpy()).groupby(level=0).sum()
        vc = masks.value_counts()
        return pd.DataFrame({"mask": vc.index.to_numpy(),
                             "n": vc.to_numpy()})

    parts = (pairs.groupby("_sbucket")
             .map_groups(mask_counts, batch_format="pandas")
             .to_pandas().groupby("mask", as_index=False)["n"].sum())
    masks = parts["mask"].to_numpy().astype(np.int64)
    counts = parts["n"].to_numpy().astype(np.int64)
    rows = []
    for i, a in enumerate(types):
        for j in range(i, len(types)):
            b = types[j]
            need = (1 << i) | (1 << j)
            n = int(counts[(masks & need) == need].sum())
            rows.append({"type_a": a, "type_b": b, "n_users": n})
    out = pd.DataFrame(rows)
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def time_to_event(ds: ray.data.Dataset, cond_type: str,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id",
                  type_col: str = "event_type",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Forward mirror of :func:`time_since_event`: microseconds UNTIL
    the user's next ``cond_type`` event strictly LATER in (ts, id)
    frame order — the time-to-conversion label survival analysis
    trains on; NaN when the user never converts afterwards (the
    censored case). Same shape: one bucket shuffle + a reversed
    ``minimum.accumulate`` with per-user reset."""
    import numpy as np

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="stable").reset_index(drop=True)
        n = len(g)
        ts = g[ts_col].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        users = g[user_col].to_numpy()
        new_user = np.ones(n, bool)
        if n > 1:
            new_user[1:] = users[1:] != users[:-1]
        ustart = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0))
        uend = np.empty(n, np.int64)      # exclusive end of user's run
        if n:
            ends = np.append(np.flatnonzero(new_user)[1:], n)
            uend = np.repeat(ends, np.diff(np.append(
                np.flatnonzero(new_user), n)))
        is_cond = (g[type_col] == cond_type).to_numpy()
        idx = np.arange(n)
        next_cond_inc = np.minimum.accumulate(
            np.where(is_cond, idx, n)[::-1])[::-1]
        nxt = np.append(next_cond_inc[1:], n)   # strictly later
        ok = nxt < uend
        delta = np.where(ok,
                         (ts[np.clip(nxt, 0, n - 1)] - ts)
                         .astype("float64"),
                         np.nan)
        return pd.DataFrame({id_col: g[id_col], "delta_us": delta})

    return _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def session_entry_exit(ds: ray.data.Dataset, user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       type_col: str = "event_type",
                       gap_minutes: int = 30,
                       num_buckets: int = 64) -> pd.DataFrame:
    """Entry→exit event-type matrix over gap-sessionized activity —
    the landing-page/exit-page distribution a crawl-traffic analysis
    reads. A session breaks when the gap since the user's previous
    event (ordered by ``(ts, id)`` — the id breaks timestamp ties
    deterministically) is STRICTLY greater than ``gap_minutes``;
    each session contributes one (first event type, last event type)
    cell.

    Shape: one hash(user) bucket shuffle (a user's sessions are whole
    within a bucket), vectorized sort + diff + grouped cumsum per
    bucket, then the O(types²) cell counts ride the additive
    partial-aggregate path. Output: (entry_type, exit_type,
    n_sessions) sorted by the pair.
    """
    import numpy as np

    gap_us = int(gap_minutes) * 60_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col], kind="stable")
        if not len(g):
            return pd.DataFrame({
                "entry_type": pd.Series([], dtype="object"),
                "exit_type": pd.Series([], dtype="object")})
        us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        users = g[user_col].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = us[1:] - us[:-1]
        brk = new_user | (gap > gap_us)
        sid = np.cumsum(brk)          # global session id within bucket
        types = g[type_col].to_numpy()
        first_idx = np.flatnonzero(brk)
        last_idx = np.append(first_idx[1:] - 1, len(g) - 1)
        return pd.DataFrame({"entry_type": types[first_idx],
                             "exit_type": types[last_idx]})

    cells = _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")

    def count_cells(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["entry_type", "exit_type"],
                             as_index=False).agg(
            n_sessions=("exit_type", "size"))

    out = partial_groupby(cells, ["entry_type", "exit_type"],
                          count_cells, ["n_sessions"])
    return out.sort_values(["entry_type", "exit_type"]) \
        .reset_index(drop=True)


def association_rules(ds: ray.data.Dataset, user_col: str = "user_id",
                      ts_col: str = "ts", item_col: str = "event_type",
                      num_buckets: int = 64) -> pd.DataFrame:
    """Pairwise association rules over (user, calendar-day) baskets —
    classic market-basket mining of which activities co-occur in one
    user-day (support / confidence / lift per ordered item pair).

    All three ratios derive from four EXACT integer counts (baskets
    with both items, with the antecedent, with the consequent, total
    baskets), each a distinct-pair count that collapses block-locally
    and finishes in one hash(user) bucket shuffle (a user's baskets
    are whole within a bucket). The driver folds O(buckets · items²)
    partial rows and performs one float division per output cell —
    cross-multiplied so lift = (n_both·N) / (n_ante·n_cons) divides
    two exact integer products, replayable bit-for-bit in SQL.
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        day = group[ts_col].astype("datetime64[ns]").dt.normalize()
        g = pd.DataFrame({"_u": group[user_col], "_d": day,
                          "_i": group[item_col]}).drop_duplicates()
        n_baskets = len(g[["_u", "_d"]].drop_duplicates())
        items = g.groupby("_i", as_index=False).size() \
            .rename(columns={"_i": "a", "size": "n"})
        items["c"] = ""
        items["kind"] = np.int8(1)
        m = g.merge(g, on=["_u", "_d"])
        m = m[m["_i_x"] != m["_i_y"]]
        pairs = m.groupby(["_i_x", "_i_y"], as_index=False).size() \
            .rename(columns={"_i_x": "a", "_i_y": "c", "size": "n"})
        pairs["kind"] = np.int8(0)
        tot = pd.DataFrame({"a": [""], "c": [""], "n": [n_baskets],
                            "kind": [np.int8(2)]})
        out = pd.concat([pairs, items, tot], ignore_index=True)
        return out[["kind", "a", "c", "n"]]

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, item_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()

    folded = parts.groupby(["kind", "a", "c"], as_index=False)["n"].sum()
    n_total = int(folded.loc[folded["kind"] == 2, "n"].sum())
    item_n = dict(zip(folded.loc[folded["kind"] == 1, "a"],
                      folded.loc[folded["kind"] == 1, "n"].astype(int)))
    pr = folded[folded["kind"] == 0]
    rows = []
    for a, c, n in zip(pr["a"], pr["c"], pr["n"].astype(int)):
        na, nc = item_n[a], item_n[c]
        rows.append((a, c, n, na, nc, n_total,
                     float(n) / float(n_total),
                     float(n) / float(na),
                     float(n * n_total) / float(na * nc)))
    out = pd.DataFrame(rows, columns=[
        "antecedent", "consequent", "n_both", "n_ante", "n_cons",
        "n_baskets", "support", "confidence", "lift"])
    for c in ("n_both", "n_ante", "n_cons", "n_baskets"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)


def km_survival(ds: ray.data.Dataset, user_col: str = "user_id",
                ts_col: str = "ts", type_col: str = "event_type",
                event_value: str = "purchase",
                num_buckets: int = 64) -> pd.DataFrame:
    """Kaplan–Meier survival curve of the time from a user's FIRST
    ``event_value`` to their SECOND (repeat behavior), right-censored
    at the corpus end for users who never repeat — the
    retention/recrawl-interval estimator that naive averages get wrong
    under censoring.

    Durations are exact whole days (int64 µs floor-division). Per-user
    (t1, strictly-later t2) reduce in ONE user-hash bucket shuffle;
    what leaves each bucket is the (duration_days, observed) VALUE
    COUNT — O(distinct days) rows — and the KM product
    ``S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)`` folds on the driver as a
    cumulative product in event-time order, the same term order as
    the SQL twin's windowed ``product()`` (a log-space fold would
    break when the last at-risk group all convert: ln 0). Output:
    (t_days, n_at_risk, n_events, survival) at each observed-event
    time, sorted.
    """
    import numpy as np

    # O(1) global censoring horizon
    max_us = int(pd.Timestamp(ds.max(ts_col)).value // 1000)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group[type_col] == event_value]
        if not len(g):
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "e": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        d = pd.DataFrame({"u": g[user_col].to_numpy(), "us": us}) \
            .drop_duplicates().sort_values(["u", "us"], kind="stable")
        # rank within user: row 0 = first purchase, row 1 = first
        # STRICTLY-later one (duplicate (u, ts) rows were dropped)
        d["_rk"] = d.groupby("u", sort=False).cumcount()
        firsts = d[d["_rk"] == 0].set_index("u")["us"]
        seconds = d[d["_rk"] == 1].set_index("u")["us"]
        t1 = firsts.to_numpy(np.int64)
        t2 = seconds.reindex(firsts.index).to_numpy(np.float64)
        has2 = ~np.isnan(t2)
        day = np.where(has2, (t2 - t1),
                       (max_us - t1).astype(np.float64)) \
            .astype(np.int64) // 86_400_000_000
        out = pd.DataFrame({"t": day, "e": has2.astype(np.int64)})
        vc = out.groupby(["t", "e"], as_index=False).size()
        return pd.DataFrame({"t": vc["t"].astype("int64"),
                             "e": vc["e"].astype("int64"),
                             "n": vc["size"].astype("int64")})

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "t_days": pd.Series([], dtype="int64"),
            "n_at_risk": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "survival": pd.Series([], dtype="float64")})
    hist = parts.groupby(["t", "e"], as_index=False)["n"].sum()
    total = int(hist["n"].sum())
    ev = hist[hist["e"] == 1].sort_values("t")
    t_ev = ev["t"].to_numpy(np.int64)
    d_i = ev["n"].to_numpy(np.int64)
    # n_at_risk(t) = total − #(any duration < t), from the full histogram
    all_sorted = hist.sort_values("t")
    ts_all = all_sorted["t"].to_numpy(np.int64)
    cn = all_sorted["n"].to_numpy(np.int64).cumsum()
    below = np.searchsorted(ts_all, t_ev, side="left")
    n_i = total - np.where(below > 0, cn[below - 1], 0)
    surv = np.cumprod(1.0 - d_i.astype(np.float64)
                      / n_i.astype(np.float64))
    return pd.DataFrame({
        "t_days": pd.Series(t_ev, dtype="int64"),
        "n_at_risk": pd.Series(n_i, dtype="int64"),
        "n_events": pd.Series(d_i, dtype="int64"),
        "survival": surv,
    }).reset_index(drop=True)


def top_event_trigrams(ds: ray.data.Dataset, k: int = 25,
                       user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Top-k most frequent 3-event behavior sequences (trigrams of
    consecutive event types per user in ``(ts, id)`` order, joined
    with '>') — the path-mining view one step deeper than the
    transition matrix. Deterministic (count desc, trigram) tie-break.

    One user-hash bucket shuffle; per bucket a vectorized
    double-shift builds the trigrams (windows never span users), and
    the O(types³) count partials ride the additive driver fold.
    Output: (trigram, n), top-k.
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col],
                              kind="stable")
        if len(g) < 3:
            return pd.DataFrame({"trigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        t = g[type_col].to_numpy()
        u = g[user_col].to_numpy()
        a, b, c = t[:-2], t[1:-1], t[2:]
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tri = pd.Series([f"{x}>{y}>{z}" for x, y, z in
                         zip(a[same], b[same], c[same])])
        vc = tri.value_counts()
        return pd.DataFrame({"trigram": vc.index.to_numpy(),
                             "n": vc.to_numpy("int64")})

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"trigram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    agg = parts.groupby("trigram", as_index=False)["n"].sum()
    agg["n"] = agg["n"].astype("int64")
    agg = agg.sort_values(["n", "trigram"], ascending=[False, True],
                          kind="stable")
    return agg.head(k).reset_index(drop=True)


def session_bounce_by_entry(ds: ray.data.Dataset,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            gap_minutes: int = 30,
                            num_buckets: int = 64) -> pd.DataFrame:
    """Bounce rate by landing event type: over gap-sessionized
    activity (same strict-gap ``(ts, id)``-ordered rule as
    :func:`session_entry_exit`), the share of sessions that contain
    EXACTLY one event, grouped by the session's entry type — the
    which-landing-pages-lose-visitors view of crawl-traffic QA.

    One hash(user) bucket shuffle (a user's sessions are whole within
    a bucket), vectorized break detection per bucket, then O(types)
    additive (n_sessions, n_bounce) count partials; ``bounce_rate``
    is one exact int/int float division. Output: (entry_type,
    n_sessions, n_bounce, bounce_rate), sorted by entry_type.
    """
    import numpy as np

    gap_us = int(gap_minutes) * 60_000_000

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col],
                              kind="stable")
        if not len(g):
            return pd.DataFrame({
                "entry_type": pd.Series([], dtype="object"),
                "n_sessions": pd.Series([], dtype="int64"),
                "n_bounce": pd.Series([], dtype="int64")})
        us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        users = g[user_col].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = us[1:] - us[:-1]
        brk = new_user | (gap > gap_us)
        types = g[type_col].to_numpy()
        first_idx = np.flatnonzero(brk)
        last_idx = np.append(first_idx[1:] - 1, len(g) - 1)
        cells = pd.DataFrame({
            "entry_type": types[first_idx],
            "_b": (first_idx == last_idx).astype("int64")})
        return cells.groupby("entry_type", as_index=False).agg(
            n_sessions=("_b", "size"), n_bounce=("_b", "sum"))

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "entry_type": pd.Series([], dtype="object"),
            "n_sessions": pd.Series([], dtype="int64"),
            "n_bounce": pd.Series([], dtype="int64"),
            "bounce_rate": pd.Series([], dtype="float64")})
    agg = parts.groupby("entry_type", as_index=False)[
        ["n_sessions", "n_bounce"]].sum()
    agg["n_sessions"] = agg["n_sessions"].astype("int64")
    agg["n_bounce"] = agg["n_bounce"].astype("int64")
    agg["bounce_rate"] = agg["n_bounce"].to_numpy(np.float64) \
        / agg["n_sessions"].to_numpy(np.float64)
    return agg.sort_values("entry_type").reset_index(drop=True)


def next_event_accuracy(ds: ray.data.Dataset,
                        user_col: str = "user_id",
                        ts_col: str = "ts",
                        id_col: str = "event_id",
                        type_col: str = "event_type",
                        num_buckets: int = 64) -> pd.DataFrame:
    """How predictable is user behavior: train the maximum-likelihood
    bigram next-event model ON the corpus transition counts and score
    it on the SAME transitions — per current type, the modal next
    type (ties → smallest) and the accuracy a predict-the-next-event
    model would achieve. A high ceiling means sessions are
    mechanical/bot-like; a low one means organic browsing.

    The accuracy needs NO second pass: it reads directly off the
    count matrix (n_correct = the modal cell). One hash(user) bucket
    shuffle (transitions never span users), vectorized shift per
    bucket, additive O(types²) count partials, O(types²) driver fold.
    Output: (cur_type, predicted_next, n_transitions, n_correct,
    accuracy), sorted by cur_type.
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col],
                              kind="stable")
        if len(g) < 2:
            return pd.DataFrame({
                "cur": pd.Series([], dtype="object"),
                "nxt": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        t = g[type_col].to_numpy()
        u = g[user_col].to_numpy()
        same = u[:-1] == u[1:]
        cells = pd.DataFrame({"cur": t[:-1][same], "nxt": t[1:][same]})
        agg = cells.groupby(["cur", "nxt"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return agg

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "cur_type": pd.Series([], dtype="object"),
            "predicted_next": pd.Series([], dtype="object"),
            "n_transitions": pd.Series([], dtype="int64"),
            "n_correct": pd.Series([], dtype="int64"),
            "accuracy": pd.Series([], dtype="float64")})
    c = parts.groupby(["cur", "nxt"], as_index=False)["n"].sum()
    c = c.sort_values(["cur", "n", "nxt"],
                      ascending=[True, False, True], kind="stable")
    best = c.groupby("cur", as_index=False).first()
    tot = c.groupby("cur", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_transitions"})
    out = best.merge(tot, on="cur").rename(columns={
        "cur": "cur_type", "nxt": "predicted_next", "n": "n_correct"})
    out["n_transitions"] = out["n_transitions"].astype("int64")
    out["n_correct"] = out["n_correct"].astype("int64")
    out["accuracy"] = out["n_correct"].to_numpy(np.float64) \
        / out["n_transitions"].to_numpy(np.float64)
    out = out[["cur_type", "predicted_next", "n_transitions",
               "n_correct", "accuracy"]]
    return out.sort_values("cur_type").reset_index(drop=True)


def hourly_peak_profile(ds: ray.data.Dataset, ts_col: str = "ts",
                        type_col: str = "event_type") -> pd.DataFrame:
    """Diurnal load profile per event type: the peak hour-of-day
    (ties → smallest hour), its count, and its share of the type's
    traffic — the when-to-schedule-recrawls / when-does-the-bot-run
    seasonality read.

    MAP-ONLY: per-block (type, hour) count partials are additive and
    O(types · 24); the driver folds them and picks each type's peak
    with the deterministic (n desc, hour asc) rule. ``peak_share``
    is one exact int/int float division. Output: (event_type,
    peak_hour, n_peak, n_total, peak_share), sorted by event_type.
    """
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "t": b[type_col],
            "hr": pd.to_datetime(b[ts_col]).dt.hour.astype("int64")})
        return g.groupby(["t", "hr"], as_index=False).size() \
            .rename(columns={"size": "n"})

    parts = ds.select_columns([ts_col, type_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "peak_hour": pd.Series([], dtype="int64"),
            "n_peak": pd.Series([], dtype="int64"),
            "n_total": pd.Series([], dtype="int64"),
            "peak_share": pd.Series([], dtype="float64")})
    h = parts.groupby(["t", "hr"], as_index=False)["n"].sum()
    h = h.sort_values(["t", "n", "hr"],
                      ascending=[True, False, True], kind="stable")
    best = h.groupby("t", as_index=False).first()
    tot = h.groupby("t", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_total"})
    out = best.merge(tot, on="t").rename(columns={
        "t": "event_type", "hr": "peak_hour", "n": "n_peak"})
    out["peak_hour"] = out["peak_hour"].astype("int64")
    out["n_peak"] = out["n_peak"].astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    out["peak_share"] = out["n_peak"].to_numpy(np.float64) \
        / out["n_total"].to_numpy(np.float64)
    return out[["event_type", "peak_hour", "n_peak", "n_total",
                "peak_share"]].sort_values("event_type") \
        .reset_index(drop=True)


def cohort_value_curve(ds: ray.data.Dataset, key_col: str,
                       ts_col: str, value_col: str,
                       num_buckets: int = 64) -> pd.DataFrame:
    """Cohort LTV curve: keys are cohorted by the calendar month of
    their FIRST activity, and each (cohort, months-since-cohort)
    cell reports active keys, exact revenue cents and the running
    cumulative — the does-quality-of-acquisition-decay view that a
    crawl uses on sources (cohort = month first seen) as naturally
    as a shop uses it on customers.

    One key-hash bucket shuffle (a key's rows co-locate, so its
    cohort month is exact in-bucket); per-(cohort, offset) partials
    — distinct keys, Σcents — are additive across buckets because
    each key lives in one bucket; the driver folds O(cohorts ·
    offsets) rows and runs one cumulative sum per cohort. Month
    arithmetic is pure integer (year·12 + month). Output: (cohort,
    month_offset, n_keys, revenue_cents, cum_revenue_cents), sorted.
    """
    import numpy as np

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(b[ts_col])
        mi = (dt.dt.year * 12 + (dt.dt.month - 1)).astype("int64")
        out = pd.DataFrame({
            "_k": b[key_col].astype("int64"),
            "_m": mi,
            "_c": np.rint(b[value_col].to_numpy(np.float64)
                          * 100.0).astype(np.int64)})
        h = pd.util.hash_pandas_object(out["_k"], index=False)
        out["_kb"] = (h % num_buckets).astype("int32")
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["_cm"] = g.groupby("_k")["_m"].transform("min")
        g["_off"] = g["_m"] - g["_cm"]
        agg = g.groupby(["_cm", "_off"], as_index=False).agg(
            n_keys=("_k", "nunique"), revenue_cents=("_c", "sum"))
        return agg

    parts = (ds.select_columns([key_col, ts_col, value_col])
             .map_batches(tag, batch_format="pandas",
                          batch_size=None)
             .groupby("_kb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "cohort": pd.Series([], dtype="object"),
            "month_offset": pd.Series([], dtype="int64"),
            "n_keys": pd.Series([], dtype="int64"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "cum_revenue_cents": pd.Series([], dtype="int64")})
    agg = parts.groupby(["_cm", "_off"], as_index=False)[
        ["n_keys", "revenue_cents"]].sum()
    agg = agg.sort_values(["_cm", "_off"], kind="stable")
    agg["cum_revenue_cents"] = agg.groupby("_cm")[
        "revenue_cents"].cumsum()
    y = agg["_cm"].to_numpy(np.int64) // 12
    m = agg["_cm"].to_numpy(np.int64) % 12 + 1
    out = pd.DataFrame({
        "cohort": [f"{yy:04d}-{mm:02d}" for yy, mm in zip(y, m)],
        "month_offset": agg["_off"].astype("int64"),
        "n_keys": agg["n_keys"].astype("int64"),
        "revenue_cents": agg["revenue_cents"].astype("int64"),
        "cum_revenue_cents": agg["cum_revenue_cents"]
            .astype("int64")})
    return out.reset_index(drop=True)


def transition_gap_stats(ds: ray.data.Dataset,
                         user_col: str = "user_id",
                         ts_col: str = "ts",
                         id_col: str = "event_id",
                         type_col: str = "event_type",
                         num_buckets: int = 64) -> pd.DataFrame:
    """Dwell time per behavior transition: for each (current, next)
    event-type pair, the count and the EXACT integer-microsecond
    median of the gaps between them — 'view→purchase takes 40 s but
    view→error takes 300 ms' is the difference between a journey map
    and a bug report.

    Two skinny shuffles: transitions assemble in the user-hash
    shuffle (vectorized shift, windows never span users) and collapse
    to (pair, gap, count) histogram partials; the pair-hash shuffle
    co-locates each pair's full gap histogram for the exact
    integer-ceil median. Output: (cur_type, next_type, n,
    median_gap_us), sorted by the pair.
    """
    import numpy as np

    def per_user_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col],
                              kind="stable")
        if len(g) < 2:
            return pd.DataFrame({
                "cur": pd.Series([], dtype="object"),
                "nxt": pd.Series([], dtype="object"),
                "gap": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64")})
        us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        t = g[type_col].to_numpy()
        u = g[user_col].to_numpy()
        same = u[:-1] == u[1:]
        cells = pd.DataFrame({"cur": t[:-1][same],
                              "nxt": t[1:][same],
                              "gap": (us[1:] - us[:-1])[same]})
        agg = cells.groupby(["cur", "nxt", "gap"],
                            as_index=False).size() \
            .rename(columns={"size": "c"})
        h = pd.util.hash_pandas_object(
            agg["cur"] + ">" + agg["nxt"], index=False)
        agg["_pb"] = (h % num_buckets).astype("int32")
        return agg

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col, num_buckets).groupby("_sbucket").map_groups(
        per_user_bucket, batch_format="pandas")

    def per_pair_bucket(group: pd.DataFrame) -> pd.DataFrame:
        hist = group.groupby(["cur", "nxt", "gap"],
                             as_index=False)["c"].sum()
        rows = []
        for (cur, nxt), gh in hist.groupby(["cur", "nxt"]):
            gh = gh.sort_values("gap")
            vals = gh["gap"].to_numpy(np.int64)
            cum = np.cumsum(gh["c"].to_numpy(np.int64))
            n = int(cum[-1])
            need = (n + 1) // 2
            med = int(vals[int(np.searchsorted(cum, need,
                                               side="left"))])
            rows.append((cur, nxt, n, med))
        return pd.DataFrame(rows, columns=["cur_type", "next_type",
                                           "n", "median_gap_us"])

    out = parts.groupby("_pb").map_groups(
        per_pair_bucket, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({
            "cur_type": pd.Series([], dtype="object"),
            "next_type": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "median_gap_us": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    out["median_gap_us"] = out["median_gap_us"].astype("int64")
    return out.sort_values(["cur_type", "next_type"]) \
        .reset_index(drop=True)


def dau_overlap(ds: ray.data.Dataset, user_col: str = "user_id",
                ts_col: str = "ts",
                num_buckets: int = 64) -> pd.DataFrame:
    """Day-over-day active-user set similarity: for each consecutive
    day pair, |A∩B|, both sizes and the exact Jaccard — the audience
    churn-velocity gauge (a stable product reads ~0.5+; near-zero
    means drive-by traffic).

    A user's active-day set is whole inside its user-hash bucket, so
    per-user consecutive-day memberships are local: the bucket emits
    additive (day, n_active) and (day, n_also_next_day) partials —
    O(buckets · days) driver rows, never a day×user matrix. Jaccard
    is one float division of exact ints. Output: (day, next_day,
    n_a, n_b, n_common, jaccard), sorted by day.
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "u": group[user_col].to_numpy(),
            "d": pd.to_datetime(group[ts_col]).dt.normalize()})
        ud = g.drop_duplicates()
        act = ud.groupby("d", as_index=False).size() \
            .rename(columns={"size": "n_active"})
        # users active on both d and d+1
        nxt = ud.copy()
        nxt["d"] = nxt["d"] - pd.Timedelta(days=1)
        both = ud.merge(nxt, on=["u", "d"]).groupby(
            "d", as_index=False).size() \
            .rename(columns={"size": "n_both"})
        out = act.merge(both, on="d", how="left")
        out["n_both"] = out["n_both"].fillna(0).astype("int64")
        return out

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col]), user_col,
        num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "next_day": pd.Series([], dtype="datetime64[ns]"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "n_common": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")})
    agg = parts.groupby("d", as_index=False)[
        ["n_active", "n_both"]].sum().sort_values("d")
    nxt = agg[["d", "n_active"]].copy()
    nxt["d"] = nxt["d"] - pd.Timedelta(days=1)
    m = agg.merge(nxt, on="d", suffixes=("_a", "_b"))
    m = m[m["n_active_b"].notna()]
    na = m["n_active_a"].to_numpy(np.int64)
    nb = m["n_active_b"].to_numpy(np.int64)
    nc = m["n_both"].to_numpy(np.int64)
    out = pd.DataFrame({
        "day": m["d"].to_numpy(),
        "next_day": m["d"].to_numpy() + np.timedelta64(1, "D"),
        "n_a": na, "n_b": nb, "n_common": nc,
        "jaccard": nc.astype(np.float64)
        / (na + nb - nc).astype(np.float64)})
    return out.sort_values("day").reset_index(drop=True)


def new_vs_returning(ds: ray.data.Dataset,
                     user_col: str = "user_id",
                     ts_col: str = "ts",
                     num_buckets: int = 64) -> pd.DataFrame:
    """Daily new-vs-returning active users: each day's actives split
    by whether it is the user's FIRST active day — the growth-vs-
    retention decomposition every traffic chart starts with.

    A user's first day is exact inside its user-hash bucket; the
    bucket emits additive (day, is_first) count partials over the
    user's DISTINCT active days — O(buckets · days) driver rows.
    Output: (day, n_new, n_returning, n_active), sorted by day.
    """
    import numpy as np

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "u": group[user_col].to_numpy(),
            "d": pd.to_datetime(group[ts_col]).dt.normalize()})
        ud = g.drop_duplicates()
        first = ud.groupby("u")["d"].transform("min")
        ud = ud.assign(_new=(ud["d"] == first).astype("int64"))
        return ud.groupby("d", as_index=False).agg(
            n_new=("_new", "sum"), n_active=("_new", "size"))

    parts = _add_key_bucket(
        ds.select_columns([user_col, ts_col]), user_col,
        num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "n_new": pd.Series([], dtype="int64"),
            "n_returning": pd.Series([], dtype="int64"),
            "n_active": pd.Series([], dtype="int64")})
    agg = parts.groupby("d", as_index=False)[
        ["n_new", "n_active"]].sum().sort_values("d")
    out = pd.DataFrame({
        "day": agg["d"].to_numpy(),
        "n_new": agg["n_new"].astype("int64"),
        "n_returning": (agg["n_active"]
                        - agg["n_new"]).astype("int64"),
        "n_active": agg["n_active"].astype("int64")})
    return out.reset_index(drop=True)


def frequent_triples(ds: ray.data.Dataset, user_col: str = "user_id",
                     ts_col: str = "ts", item_col: str = "event_type",
                     sup_num: int = 1, sup_den: int = 20,
                     num_buckets: int = 64) -> pd.DataFrame:
    """Frequent 3-itemsets over (user, calendar-day) activity baskets
    with support ≥ ``sup_num/sup_den`` — the A-priori step past
    :func:`association_rules`' pairs, the pattern that finds
    *routine bundles* (the user who views AND clicks AND errors in
    one day) rather than pairwise co-occurrence.

    Distributed A-priori shape: pass 1 counts per-item basket support
    in one user-hash bucket shuffle (a user's baskets are whole within
    a bucket, so distinct-(user,day,item) rows collapse exactly);
    the anti-monotone screen — a frequent triple's every item is
    itself frequent — broadcasts the small frequent-item set, and
    pass 2 explodes triples ONLY over surviving items (the skew
    defense: a million-item long tail never enters the cubic merge).
    Triple counts are per-bucket exact and additive; the driver folds
    O(buckets · items³) partials. The support test is the exact
    integer cross-multiplication ``n·sup_den ≥ N·sup_num`` (no float
    threshold), and ``support`` itself is the one float division,
    replayed verbatim by the SQL twin. Output:
    (t1 < t2 < t3, n_both, n_baskets, support), sorted."""
    import numpy as np

    cols = [user_col, ts_col, item_col]
    bucketed = _add_key_bucket(ds.select_columns(cols), user_col,
                               num_buckets)

    def pass1(group: pd.DataFrame) -> pd.DataFrame:
        day = group[ts_col].astype("datetime64[ns]").dt.normalize()
        g = pd.DataFrame({"_u": group[user_col], "_d": day,
                          "_i": group[item_col]}).drop_duplicates()
        items = g.groupby("_i", as_index=False).size() \
            .rename(columns={"_i": "i", "size": "n"})
        items["kind"] = np.int8(0)
        tot = pd.DataFrame({
            "i": [""], "n": [len(g[["_u", "_d"]].drop_duplicates())],
            "kind": [np.int8(1)]})
        return pd.concat([items, tot], ignore_index=True)[
            ["kind", "i", "n"]]

    p1 = bucketed.groupby("_sbucket").map_groups(
        pass1, batch_format="pandas").to_pandas()
    f1 = p1.groupby(["kind", "i"], as_index=False)["n"].sum()
    n_total = int(f1.loc[f1["kind"] == 1, "n"].sum())
    empty = pd.DataFrame({
        "t1": pd.Series([], dtype="object"),
        "t2": pd.Series([], dtype="object"),
        "t3": pd.Series([], dtype="object"),
        "n_both": pd.Series([], dtype="int64"),
        "n_baskets": pd.Series([], dtype="int64"),
        "support": pd.Series([], dtype="float64")})
    if n_total == 0:
        return empty
    it = f1[f1["kind"] == 0]
    frequent = frozenset(
        i for i, n in zip(it["i"], it["n"].astype(int))
        if n * sup_den >= n_total * sup_num)
    if len(frequent) < 3:
        return empty

    def pass2(group: pd.DataFrame) -> pd.DataFrame:
        day = group[ts_col].astype("datetime64[ns]").dt.normalize()
        g = pd.DataFrame({"_u": group[user_col], "_d": day,
                          "_i": group[item_col]}).drop_duplicates()
        g = g[g["_i"].isin(frequent)]        # A-priori prune
        if g.empty:
            return pd.DataFrame({"t1": pd.Series([], dtype="object"),
                                 "t2": pd.Series([], dtype="object"),
                                 "t3": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["_u", "_d"])
        m = m[m["_i_x"] < m["_i_y"]]
        m3 = m.merge(g, on=["_u", "_d"])
        m3 = m3[m3["_i_y"] < m3["_i"]]
        out = m3.groupby(["_i_x", "_i_y", "_i"], as_index=False) \
            .size().rename(columns={"_i_x": "t1", "_i_y": "t2",
                                    "_i": "t3", "size": "n"})
        return out

    p2 = bucketed.groupby("_sbucket").map_groups(
        pass2, batch_format="pandas").to_pandas()
    if p2.empty or "t1" not in p2.columns:
        return empty
    tri = p2.groupby(["t1", "t2", "t3"], as_index=False)["n"].sum()
    tri = tri[tri["n"].astype(int) * sup_den >= n_total * sup_num]
    if tri.empty:
        return empty
    out = pd.DataFrame({
        "t1": tri["t1"].to_numpy(),
        "t2": tri["t2"].to_numpy(),
        "t3": tri["t3"].to_numpy(),
        "n_both": tri["n"].astype("int64").to_numpy(),
        "n_baskets": np.int64(n_total),
        "support": np.array([float(int(n)) / float(n_total)
                             for n in tri["n"]], dtype=np.float64)})
    return out.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


def next_event_entropy(ds: ray.data.Dataset,
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts",
                       id_col: str = "event_id",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Conditional next-event entropy per current event type — the
    behavioral-predictability read of the first-order Markov model:
    ``H(next | cur=t) = −Σ_s p(s|t)·ln p(s|t)`` in nats per current
    type t, with the modal next type and its share. H ≈ 0 means the
    journey is deterministic after t (a funnel edge); H near
    ``ln(n_types)`` means t predicts nothing.

    Rides :func:`transition_counts` (one user-hash bucket shuffle,
    O(buckets × |types|²) partials to the driver); the per-type fold
    is O(|types|²). Entropy terms mirror the SQL twin's
    ``−Σ (c/tot)·ln(c/tot)`` per-group aggregate; the modal next type
    breaks count ties by lexicographic next-type order (the
    ``(n DESC, type ASC)`` rule used across the board). Output:
    (cur_type, n_transitions, n_next_types, entropy, top_next,
    top_share)."""
    tc = transition_counts(ds, user_col=user_col, type_col=type_col,
                           ts_col=ts_col, id_col=id_col,
                           num_buckets=num_buckets)
    if tc.empty:
        return pd.DataFrame({
            "cur_type": pd.Series([], dtype="object"),
            "n_transitions": pd.Series([], dtype="int64"),
            "n_next_types": pd.Series([], dtype="int64"),
            "entropy": pd.Series([], dtype="float64"),
            "top_next": pd.Series([], dtype="object"),
            "top_share": pd.Series([], dtype="float64")})
    import math

    rows = []
    for cur, g in tc.groupby("prev_type", sort=True):
        cnts = [int(v) for v in g["n"]]
        tot = sum(cnts)
        ent = -sum((c / tot) * math.log(c / tot) for c in cnts)
        top = g.assign(_neg=-g["n"]).sort_values(
            ["_neg", type_col], kind="stable").iloc[0]
        rows.append((cur, tot, len(cnts), ent,
                     top[type_col], float(int(top["n"])) / float(tot)))
    return pd.DataFrame(rows, columns=[
        "cur_type", "n_transitions", "n_next_types", "entropy",
        "top_next", "top_share"]).astype({
            "n_transitions": "int64", "n_next_types": "int64"})



def markov_stationary(ds: ray.data.Dataset, iters: int = 4,
                      scale: int = 10 ** 12,
                      user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id",
                      num_buckets: int = 64) -> pd.DataFrame:
    """Stationary-distribution estimate of the first-order event-type
    Markov chain — ``iters`` synchronous power-iteration steps over
    the row-stochastic transition matrix, in EXACT INTEGER FIXED
    POINT (the ``hits_bipartite`` discipline, ``ops/graph.py``): mass
    starts at ``scale`` per state and every step moves
    ``x[j]·c[j→k] // rowsum[j]`` units along each observed edge —
    per-edge floor division, then an exact integer sum, so the result
    is bit-identical under ANY partitioning or SQL replay (no float
    order-dependence to excuse). States with no outgoing transitions
    keep their mass (the self-loop convention, documented so the SQL
    twin replays it).

    Scale shape: :func:`transition_counts` collapses the corpus to
    ``O(buckets × |types|²)`` skinny partials in one bucketed
    shuffle; the iteration itself runs on the driver over the
    O(|types|²) count matrix — for an event-type alphabet that is a
    constant, not a scale risk. Output per state:
    ``(event_type, mass_fp, prob)`` with ``prob = mass_fp /
    total_mass`` (one float division of exact ints on both sides),
    ordered by event_type."""
    tc = transition_counts(ds, user_col=user_col, type_col=type_col,
                           ts_col=ts_col, id_col=id_col,
                           num_buckets=num_buckets)
    states = sorted(set(tc["prev_type"]) | set(tc[type_col])
                    | set(ds.select_columns([type_col])
                          .groupby(type_col)
                          .map_groups(lambda g: g.head(1),
                                      batch_format="pandas")
                          .to_pandas()[type_col]))
    counts = {(p, t): int(n) for p, t, n in
              zip(tc["prev_type"], tc[type_col], tc["n"])}
    rowsum = {s: sum(counts.get((s, t), 0) for t in states)
              for s in states}
    x = {s: scale for s in states}
    for _ in range(iters):
        nxt = {s: 0 for s in states}
        for s in states:
            r = rowsum[s]
            if r == 0:                 # absorbing: mass stays put
                nxt[s] += x[s]
                continue
            for t in states:
                c = counts.get((s, t), 0)
                if c:
                    nxt[t] += x[s] * c // r
        x = nxt
    total = sum(x.values())
    return pd.DataFrame({
        "event_type": states,
        "mass_fp": pd.Series([x[s] for s in states], dtype="int64"),
        "prob": [x[s] / total for s in states],
    })


def subsequence_counts(ds: ray.data.Dataset,
                       pattern: tuple = ("view", "click", "purchase"),
                       user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id",
                       num_buckets: int = 64) -> pd.DataFrame:
    """ALL-subsequence pattern counting per user — how many distinct
    (not necessarily contiguous) view→click→purchase chains does each
    user's stream contain? The funnel operators count whether/when a
    journey happened; this counts combinatorial chain MASS (the
    engagement-intensity read; also the classic DP that SQL replays
    with nothing but running sums).

    Exact recurrence in (ts, id) order: c₁ += [view]; on a click,
    c₂ += c₁; on a purchase, c₃ += c₂ — all integers, so the result
    is hash-identical under any partitioning. One bucketed shuffle
    co-locates each user's events (the ``transition_counts`` shape);
    inside a bucket the recurrence vectorizes as three cumulative
    sums. Output per user: (user_id, n_first, n_pairs, n_chains) —
    cumulative counts of pattern prefixes of length 1, 2, 3."""
    p1, p2, p3 = pattern

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, ts_col, id_col], kind="stable")
        users = g[user_col].to_numpy()
        et = g[type_col].to_numpy()
        is1 = (et == p1).astype(np.int64)
        is2 = (et == p2).astype(np.int64)
        is3 = (et == p3).astype(np.int64)
        # per-user cumulative c1; value AT each row = views so far
        df = pd.DataFrame({"u": users, "is1": is1, "is2": is2,
                           "is3": is3})
        c1 = df.groupby("u", sort=False)["is1"].cumsum()
        inc2 = is2 * c1.to_numpy()              # click joins c1 chains
        df["inc2"] = inc2
        c2 = df.groupby("u", sort=False)["inc2"].cumsum()
        inc3 = is3 * c2.to_numpy()              # purchase joins c2
        df["inc3"] = inc3
        out = df.groupby("u", sort=False).agg(
            n_first=("is1", "sum"), n_pairs=("inc2", "sum"),
            n_chains=("inc3", "sum")).reset_index()
        return out.rename(columns={"u": user_col})

    parts = (_add_key_bucket(
        ds.select_columns([id_col, user_col, type_col, ts_col]),
        user_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    out = parts.astype({user_col: "int64", "n_first": "int64",
                        "n_pairs": "int64", "n_chains": "int64"})
    return out.sort_values(user_col).reset_index(drop=True)


def interval_scheduling(ds: ray.data.Dataset,
                        user_col: str = "user_id",
                        type_col: str = "event_type",
                        ts_col: str = "ts",
                        num_buckets: int = 64) -> pd.DataFrame:
    """Weighted interval scheduling per user over its per-type
    activity spans: each (user, type) contributes the interval
    [first ts, last ts] weighted by its event count; the DP picks the
    non-overlapping subset maximizing covered events — "which
    activities, taken as uninterrupted phases, explain the most of
    this user's stream?" (the classic DP; spans of different types
    overlap freely, which is what makes it non-trivial).

    All-integer determinism: timestamps are µs ints; intervals sort
    by (end, start, type); compatibility is STRICT (end_j < start_i);
    ``dp[i] = max(dp[i−1], w_i + dp[p(i)])`` with ties resolved by
    the ≥ rule (prefer including — documented so the SQL twin's
    unrolled CTEs replay the same optimum value; only the VALUE is
    emitted, not a chosen set, so tie-broken alternates cannot
    diverge). One bucketed shuffle co-locates users; the DP is
    O(types²) per user. Output per user: (user_id, n_intervals,
    total_events, best_events)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        spans = g.groupby([user_col, type_col]).agg(
            start=(ts_col, "min"), end=(ts_col, "max"),
            w=(ts_col, "size")).reset_index()
        spans["start"] = spans["start"].astype("datetime64[us]") \
            .astype(np.int64)
        spans["end"] = spans["end"].astype("datetime64[us]") \
            .astype(np.int64)
        out_u, out_n, out_t, out_b = [], [], [], []
        for uid, sub in spans.groupby(user_col):
            iv = sorted(zip(sub["end"], sub["start"], sub[type_col],
                            sub["w"]))
            n = len(iv)
            dp = [0] * (n + 1)
            for i in range(1, n + 1):
                e_i, s_i, _, w_i = iv[i - 1]
                p = 0
                for j in range(i - 1, 0, -1):
                    if iv[j - 1][0] < s_i:      # strict compatibility
                        p = j
                        break
                take = int(w_i) + dp[p]
                dp[i] = take if take >= dp[i - 1] else dp[i - 1]
            out_u.append(uid)
            out_n.append(n)
            out_t.append(int(sub["w"].sum()))
            out_b.append(dp[n])
        return pd.DataFrame({user_col: out_u, "n_intervals": out_n,
                             "total_events": out_t,
                             "best_events": out_b})

    parts = (_add_key_bucket(
        ds.select_columns([user_col, type_col, ts_col]),
        user_col, num_buckets)
        .groupby("_sbucket").map_groups(per_bucket,
                                        batch_format="pandas")
        .to_pandas())
    return parts.astype({user_col: "int64", "n_intervals": "int64",
                         "total_events": "int64",
                         "best_events": "int64"}) \
        .sort_values(user_col).reset_index(drop=True)
