"""Recrawl scheduling — which known URLs to refetch next.

A production crawler re-visits pages by estimated staleness (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
TODS 2003): pages that historically changed often and haven't been
fetched recently outrank stable, recently-seen ones. This operator
computes a deterministic staleness priority per key from its observed
event history and returns the top-N due.

Priority is the exact integer ratio

    priority = age_us · (n_obs − 1) / max(span_us, 1)

i.e. (time since last observation) × (observed change rate): ``n−1``
changes over ``span_us`` of history. The numerator/denominator stay
exact int64 microseconds; ONE float64 division at the end keeps the
SQL oracle bit-comparable. Ties (priority, then key ascending) are a
total order, so top-N is reproducible.

Scale shape: a partial-agg groupby (count/min/max — three additive
partials per key per block, raw events never shuffle) feeds a
vectorized formula + top-N; at 10^10 URLs the per-key aggregate is the
frontier-shard-sized table, not the event log. The driver fold below
assumes bounded key cardinality (hosts / site sections); at full URL
granularity route the same partials through a hash(key)-bucketed
shuffle (``relational.partial_groupby(distributed_combine=True)``
shape) and take per-bucket top-N before the driver merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def recrawl_priorities(ds: ray.data.Dataset, now_us: int,
                       key_col: str = "user_id", ts_col: str = "ts",
                       top_n: int = 50) -> pd.DataFrame:
    """Top-N keys by staleness priority. Output: (key, n_obs, age_us,
    span_us, priority) sorted by (priority desc, key)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({key_col: b[key_col], "_us": us})
        return g.groupby(key_col, as_index=False).agg(
            n_obs=("_us", "size"), _mn=("_us", "min"), _mx=("_us", "max"))

    # per-block partials (count/min/max are additive-or-idempotent), then
    # a driver combine of the O(blocks × keys) partial rows — the same
    # contract as relational.partial_groupby, with a min/max fold that
    # plain column sums can't express
    parts = ds.select_columns([key_col, ts_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby(key_col, as_index=False).agg(
        n_obs=("n_obs", "sum"), _mn=("_mn", "min"), _mx=("_mx", "max"))
    age = np.int64(now_us) - agg["_mx"].to_numpy(np.int64)
    span = np.maximum(agg["_mx"].to_numpy(np.int64)
                      - agg["_mn"].to_numpy(np.int64), 1)
    n = agg["n_obs"].to_numpy(np.int64)
    # exact-integer numerator via Python ints: age_us ~1e15 × n_obs
    # beyond ~1e4 wraps silently in int64 (numpy doesn't raise); the SQL
    # oracle's BIGINT product is exact, so match it with arbitrary-
    # precision ints, then one float division (O(keys) driver rows)
    pri = np.fromiter(
        (float(int(a) * int(k)) / float(s)
         for a, k, s in zip(age.tolist(), (n - 1).tolist(), span.tolist())),
        dtype=np.float64, count=len(age))
    out = pd.DataFrame({key_col: agg[key_col], "n_obs": n,
                        "age_us": age, "span_us": span,
                        "priority": pri})
    out = out.sort_values(["priority", key_col],
                          ascending=[False, True], kind="stable")
    return out.head(top_n).reset_index(drop=True)


def budget_allocation(ds: "ray.data.Dataset", key_col: str,
                      weight_col: str, budget: int) -> pd.DataFrame:
    """Exact largest-remainder apportionment of an integer crawl
    budget across hosts: each key gets ``floor(budget·w/W)`` fetches
    and the ``budget − Σfloor`` leftover slots go to the largest
    remainders (ties → key ascending), so allocations are integers,
    sum EXACTLY to ``budget``, and are reproducible — the fairness
    rule a fixed-size fetch fleet needs when hosts' page volumes skew
    (Hamilton's method; SQL-replayable with integer division +
    row_number). Weights must be non-negative integers.

    Scale shape: per-key weight sums reduce through the bucketed
    partial-agg combine (raw rows never reach the driver); the
    apportionment itself runs on the O(keys) weight table — host
    cardinality, not page cardinality. Remainders are computed as
    ``budget·w − floor·W`` in Python ints when ``budget·W`` would
    overflow int64, so the rule stays exact at any magnitude.
    Output: (key, weight_i, alloc) sorted by key."""
    from .relational import partial_groupby

    per = partial_groupby(
        ds.select_columns([key_col, weight_col]), [key_col],
        lambda b: b.groupby(key_col, as_index=False)[weight_col].sum(),
        [weight_col], distributed_combine=True).to_pandas()
    per = per.sort_values(key_col).reset_index(drop=True)
    w = per[weight_col].to_numpy()
    W = int(w.sum())
    if W <= 0:
        raise ValueError("budget_allocation: total weight must be > 0")
    if budget * W < 2**62:                   # int64-safe fast path
        wi = w.astype("int64")
        fl = (budget * wi) // W
        rem = budget * wi - fl * W
    else:                                    # exact at any magnitude
        fl = np.array([(budget * int(x)) // W for x in w],
                      dtype="int64")
        rem = np.array([budget * int(x) - int(f) * W
                        for x, f in zip(w, fl)], dtype=object)
    leftover = budget - int(fl.sum())
    # largest remainder first, key ascending on ties; per is already
    # key-sorted so a stable argsort on -rem preserves the tie rule
    order = np.argsort(np.negative(rem), kind="stable")
    bump = np.zeros(len(per), dtype="int64")
    bump[order[:leftover]] = 1
    out = pd.DataFrame({
        key_col: per[key_col].to_numpy(),
        "weight_i": w.astype("int64"),
        "alloc": fl + bump})
    assert int(out["alloc"].sum()) == budget
    return out
