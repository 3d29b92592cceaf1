"""Market-basket co-occurrence: exact top-k item PAIRS by the number
of groups (orders, sessions, documents) containing both items.

The classic self-join shape (``d a JOIN d b ON a.grp = b.grp AND
a.item < b.item``) re-expressed for Ray Data without a quadratic
join: groups are bucketed by hash once, pairs are exploded
VECTORIZED inside each bucket (per-group pair count is m·(m-1)/2 —
bounded by the max basket size, e.g. ≤66 for 12-line orders), then
pair counts follow the exact heavy-hitter economics: per-bucket
partial counts → pair-hash-bucketed exact sums → per-bucket top-k →
an O(buckets × k) driver merge. Nothing group- or pair-cardinality
sized ever reaches the driver.

Reference anchor: the engine-side analytics tier (SURVEY §2.11);
the reference has no basket analysis — this is part of the
LLM-data/analytics widening mandated by the round brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _explode_pairs(grp: np.ndarray, item: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """All within-group ordered pairs (item_a < item_b positionally)
    from arrays SORTED by (grp, item) with per-group-unique items.
    Pure index arithmetic — no Python loop over groups."""
    n = len(grp)
    if n == 0:
        return item[:0], item[:0]
    # position of each row inside its group
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = grp[1:] != grp[:-1]
    gid = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    k = np.arange(n) - starts[gid]          # index within group
    lcounts = sizes[gid] - 1 - k            # pairs led by this row
    left = np.repeat(np.arange(n), lcounts)
    # right = left + 1 + (0..lcounts-1) per left element
    csum = np.cumsum(lcounts) - lcounts
    right = left + 1 + (np.arange(lcounts.sum()) -
                        np.repeat(csum, lcounts))
    return item[left], item[right]


def pair_cooccurrence(ds: ray.data.Dataset, group_col: str,
                      item_col: str, k: int = 20,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Exact global top-``k`` co-occurring item pairs with the
    deterministic SQL tie-break (count desc, item_a asc, item_b asc).
    Output columns: (item_a, item_b, cnt) — ``item_a < item_b``.
    """
    from .windows import _add_key_bucket

    def explode(group: pd.DataFrame) -> pd.DataFrame:
        d = (group[[group_col, item_col]]
             .drop_duplicates()
             .sort_values([group_col, item_col], kind="stable"))
        a, b = _explode_pairs(d[group_col].to_numpy(),
                              d[item_col].to_numpy())
        out = (pd.DataFrame({"item_a": a, "item_b": b})
               .groupby(["item_a", "item_b"], as_index=False)
               .size().rename(columns={"size": "cnt"}))
        # re-bucket partial counts by pair hash for the exact-sum pass
        h = pd.util.hash_pandas_object(
            out["item_a"].astype("string") + "|"
            + out["item_b"].astype("string"), index=False)
        out["_pb"] = (h % num_buckets).astype("int32")
        return out

    def topk_bucket(group: pd.DataFrame) -> pd.DataFrame:
        exact = group.groupby(["item_a", "item_b"],
                              as_index=False)["cnt"].sum()
        exact = exact.sort_values(["cnt", "item_a", "item_b"],
                                  ascending=[False, True, True],
                                  kind="stable").head(k)
        exact["cnt"] = exact["cnt"].astype("int64")
        return exact

    parts = (_add_key_bucket(ds.select_columns([group_col, item_col]),
                             group_col, num_buckets)
             .groupby("_sbucket").map_groups(explode,
                                             batch_format="pandas")
             .groupby("_pb").map_groups(topk_bucket,
                                        batch_format="pandas"))
    cand = parts.to_pandas()          # O(num_buckets × k) rows
    out = cand.sort_values(["cnt", "item_a", "item_b"],
                           ascending=[False, True, True],
                           kind="stable").head(k)
    return out.reset_index(drop=True)
