"""Relational building blocks over Ray Data — aggregation and joins
tuned for scale.

These are the engine's general-purpose query primitives (exercised by
the driver's DuckDB-oracle correctness gate over the TPC-H-style
testdata). The scale rules they encode:

- **Pre-aggregate before shuffling** (`partial_groupby`): a bare
  ``groupby().aggregate()`` shuffles every input row; computing
  per-batch partials first shrinks the exchange to
  ``O(batches × groups)`` rows.
- **Broadcast the small side of a join** (`broadcast_join`): dimension
  tables ship once via ``ray.put`` and probe happens in ``map_batches``
  — no shuffle at all.
- **Bucketed hash join for two large sides** (`hash_join`): tag + union
  + ``groupby(bucket)`` + per-bucket pandas merge — the portable
  explicit partitioned join (also valid on Ray's native
  ``Dataset.join``, but the explicit form makes the partition count and
  skew handling visible and testable).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# per-worker-process cache for broadcast join sides (keyed by object ref)
_BROADCAST_CACHE: dict = {}


def partial_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    batch_agg: Callable[[pd.DataFrame], pd.DataFrame],
    sum_cols: list[str],
    distributed_combine: bool = False,
) -> pd.DataFrame | ray.data.Dataset:
    """Two-phase grouped aggregation.

    ``batch_agg`` computes the per-block partial (a pandas groupby
    producing ``keys + sum_cols`` where every value column is additive —
    sums and counts; derive means/ratios downstream). Partials shrink
    the data to ``O(blocks × groups)`` rows, so the default final phase
    is a *driver-side* pandas combine — measured ~25× faster than
    pushing a few hundred partial rows through a distributed shuffle
    (Ray's Aggregate operator costs seconds of fixed machinery).

    Set ``distributed_combine=True`` for HIGH-cardinality keys (e.g.
    per-URL, per-document groups) where the partials themselves are big:
    that path stays distributed via a key-hash BUCKET shuffle (a keyed
    ``groupby().aggregate(Sum)`` pays ~18 s of sort machinery over
    O(keys) distinct values for the same result) and returns a
    MATERIALIZED Dataset — downstream joins probe ``.schema()``, which
    would otherwise re-execute the whole combine.
    """
    partials = ds.map_batches(batch_agg, batch_format="pandas",
                              batch_size=None)
    if distributed_combine:
        def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(b[keys], index=False)
            return b.assign(_pb=(h % 64).astype("int32"))

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(keys, as_index=False)[sum_cols].sum()

        return (partials.map_batches(add_bucket, batch_format="pandas",
                                     batch_size=None)
                .groupby("_pb").map_groups(combine,
                                           batch_format="pandas")
                .materialize())
    pdf = partials.to_pandas()
    if pdf.empty:
        return pdf
    return pdf.groupby(keys, as_index=False)[sum_cols].sum()


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table | pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    small_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Join a large Dataset against a small in-memory table by shipping
    the small side once (``ray.put``) and merging per batch."""
    small_df = small.to_pandas() if isinstance(small, pa.Table) else small
    if small_cols:
        keys = [on] if isinstance(on, str) else list(on)
        small_df = small_df[list(dict.fromkeys(keys + small_cols))]
    small_ref = ray.put(small_df)
    key = small_ref.hex()

    # task-based probe with per-worker-process memoized broadcast side:
    # runs in prestarted warm workers (no actor-pool spawn tax per query)
    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        side = _BROADCAST_CACHE.get(key)
        if side is None:
            side = ray.get(small_ref)
            _BROADCAST_CACHE[key] = side
        return batch.merge(side, on=on, how=how)

    return big.map_batches(probe, batch_format="pandas", batch_size=None)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
) -> ray.data.Dataset:
    """Explicit partitioned hash join of two large Datasets.

    ``how`` ∈ {``inner``, ``left``, ``outer``, ``semi``, ``anti``}.
    Both sides get
    ``_bucket = key % num_buckets`` (keys are int join keys here; string
    keys would hash first) and a ``_side`` tag, their schemas are
    aligned so the union is well-typed, the union shuffles ONCE on the
    bucket, and each bucket merges pandas-side. Hot buckets can be split
    by raising ``num_buckets`` — the skew knob the all-at-once
    ``Dataset.join`` hides. (Measured at sf0.1 lineitem⋈orders /
    32 CPUs: this explicit form 4.1 s vs Ray's native ``Dataset.join``
    5.1 s.)

    ``semi``/``anti`` output only left columns, and the right side is
    projected to its key column BEFORE the shuffle (membership is the
    semantics, so the right payload never moves — distinct from the
    broadcast semi-join in ``__ray_entry__.q_fulfilled_customers``,
    which needs the key set to fit in one object; this form shuffles
    and works at any right-side cardinality). ``left`` emits unmatched
    left rows with null right columns (pandas NaN); ``outer`` emits
    unmatched rows from BOTH sides (a full outer join — correct
    because a key's rows from both sides always co-locate in one
    bucket, so every unmatched row surfaces exactly once).
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if how in ("semi", "anti"):
        right = right.select_columns([on])
    left_cols = [c for c in left.schema().names if c != on]
    right_cols = [c for c in right.schema().names if c != on]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"non-key column overlap: {overlap}")
    all_cols = [on, *left_cols, *right_cols]
    out_cols = [on, *left_cols] if how in ("semi", "anti") else all_cols

    def tag(side: str):
        def _t(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.reindex(columns=all_cols)
            batch["_bucket"] = (batch[on].astype("int64") % num_buckets).astype("int32")
            batch["_side"] = side
            return batch
        return _t

    unioned = left.map_batches(tag("L"), batch_format="pandas",
                               batch_size=None).union(
        right.map_batches(tag("R"), batch_format="pandas", batch_size=None))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group.loc[group["_side"] == "L", [on, *left_cols]]
        rhs = group.loc[group["_side"] == "R", [on, *right_cols]]
        if lhs.empty:
            if how == "outer":
                return rhs.reindex(columns=all_cols)
            # typed empty (dtypes from the group) — keeps block schemas
            # consistent across buckets
            return group[out_cols].iloc[0:0]
        if rhs.empty:
            if how == "anti":
                return lhs
            if how in ("left", "outer"):
                return lhs.reindex(columns=all_cols)
            return group[out_cols].iloc[0:0]
        if how == "semi":
            return lhs[lhs[on].isin(rhs[on].unique())]
        if how == "anti":
            return lhs[~lhs[on].isin(rhs[on].unique())]
        return lhs.merge(rhs, on=on, how=how)

    return unioned.groupby("_bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int = 32,
    salt: int = 8,
    hot_keys: list[int] | None = None,
    hot_top_n: int = 16,
) -> ray.data.Dataset:
    """Skew-aware inner hash join: hot keys are SALTED so no single
    bucket holds a whole hot key's left side.

    The pathology :func:`hash_join` can't fix by raising
    ``num_buckets``: if one key is 30% of the left side, that key's
    bucket is 30% of the data no matter how many buckets exist — one
    straggler task runs the whole join. Here the left side's heavy
    hitters (detected by a cheap per-batch value-count partial pass —
    O(batches × distinct-per-batch) skinny rows to the driver — or
    passed explicitly) are split across ``salt`` sub-buckets by a
    per-row cycle, and the RIGHT side's rows for those keys are
    replicated into all ``salt`` sub-buckets (the usual broadcast-lite
    trade: right side of a hot key is replicated ×salt, left side never
    concentrates). Cold keys take the normal ``key % num_buckets``
    path. Output is set-equal to a plain inner join — salting only
    changes placement.
    """
    if hot_keys is None:
        def count_partial(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[on].value_counts()
            return pd.DataFrame({on: vc.index, "n": vc.to_numpy()})

        counts = left.select_columns([on]).map_batches(
            count_partial, batch_format="pandas", batch_size=None
        ).to_pandas()
        if counts.empty:
            hot_keys = []
        else:
            tot = counts.groupby(on)["n"].sum().sort_values(
                ascending=False)
            # hot = would dominate its bucket: > 2x the fair share
            thresh = max(2 * tot.sum() // num_buckets, 1)
            hot_keys = [int(k) for k in
                        tot[tot > thresh].head(hot_top_n).index]
    hot_idx = {k: i for i, k in enumerate(hot_keys)}

    left_cols = [c for c in left.schema().names if c != on]
    right_cols = [c for c in right.schema().names if c != on]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"non-key column overlap: {overlap}")
    all_cols = [on, *left_cols, *right_cols]

    def bucket_of(keys: pd.Series) -> "pd.Series":
        return (keys.astype("int64") % num_buckets).astype("int32")

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reindex(columns=all_cols)
        bk = bucket_of(b[on])
        if hot_idx:
            hot_pos = b[on].map(hot_idx)
            is_hot = hot_pos.notna()
            if is_hot.any():
                import numpy as np
                cycle = np.arange(len(b)) % salt
                bk = bk.where(~is_hot,
                              (num_buckets + hot_pos.fillna(0) * salt
                               + cycle).astype("int32"))
        b["_bucket"] = bk.astype("int32")
        b["_side"] = "L"
        return b

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reindex(columns=all_cols)
        frames = []
        if hot_idx:
            hot_pos = b[on].map(hot_idx)
            is_hot = hot_pos.notna()
            hot = b[is_hot]
            if len(hot):
                import numpy as np
                rep = hot.loc[hot.index.repeat(salt)].reset_index(
                    drop=True)
                s = np.tile(np.arange(salt), len(hot))
                rep["_bucket"] = (
                    num_buckets
                    + hot_pos[is_hot].to_numpy().repeat(salt) * salt
                    + s).astype("int32")
                frames.append(rep)
            b = b[~is_hot]
        b = b.copy()
        b["_bucket"] = bucket_of(b[on])
        frames.append(b)
        out = pd.concat(frames, ignore_index=True)
        out["_side"] = "R"
        return out

    unioned = left.map_batches(tag_left, batch_format="pandas",
                               batch_size=None).union(
        right.map_batches(tag_right, batch_format="pandas",
                          batch_size=None))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group.loc[group["_side"] == "L", [on, *left_cols]]
        rhs = group.loc[group["_side"] == "R", [on, *right_cols]]
        if lhs.empty or rhs.empty:
            return group[all_cols].iloc[0:0]
        return lhs.merge(rhs, on=on, how="inner")

    return unioned.groupby("_bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def argmax_by_key(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    tie_col: str,
    descending: bool = True,
    distributed_combine: bool = False,
    num_buckets: int = 32,
) -> pd.DataFrame | ray.data.Dataset:
    """One winner row per key: the row with the max (``descending``) or
    min ``order_col``, ties broken by min ``tie_col`` (deterministic for
    unique tie values). The classic "latest event per user" /
    "best-scoring page per domain" operator.

    Scale shape: argmax is idempotent under composition, so each batch
    reduces to its local winners first — only ``O(batches × keys)``
    rows ever leave the map stage. Default finale is a driver-side
    pandas pick (bounded-key case, same economics as
    :func:`partial_groupby`); ``distributed_combine=True`` re-buckets
    the partial winners by ``hash(key) % num_buckets`` and picks inside
    each bucket — nothing key-cardinality-sized reaches the driver.
    """
    from .windows import _add_key_bucket

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values([order_col, tie_col],
                          ascending=[not descending, True], kind="stable")
        return b.drop_duplicates(subset=[key], keep="first")

    partials = ds.map_batches(pick, batch_format="pandas", batch_size=None)
    if distributed_combine:
        bucketed = _add_key_bucket(partials, key, num_buckets)

        def pick_bucket(group: pd.DataFrame) -> pd.DataFrame:
            return pick(group).drop(columns=["_sbucket"])

        return bucketed.groupby("_sbucket").map_groups(
            pick_bucket, batch_format="pandas")
    pdf = partials.to_pandas()
    return pick(pdf) if not pdf.empty else pdf


def rollup_agg(ds: ray.data.Dataset, keys: list[str], batch_agg,
               sum_cols: list[str],
               all_label: str = "ALL") -> pd.DataFrame:
    """GROUP BY ROLLUP over additive measures from ONE distributed
    pass: the finest-granularity partials (``partial_groupby``
    economics — one skinny row per block per group) are re-summed
    driver-side at every coarser level, so k rollup levels cost one
    scan instead of k. Keys must be strings (the subtotal marker is
    ``all_label``, mirroring the oracle's ``coalesce(col, 'ALL')``
    over SQL ROLLUP's NULLs)."""
    fine = partial_groupby(ds, keys, batch_agg, sum_cols)
    frames = []
    for lvl in range(len(keys), -1, -1):
        g = keys[:lvl]
        if g:
            f = fine.groupby(g, as_index=False)[sum_cols].sum()
        else:
            f = fine[sum_cols].sum().to_frame().T
        for k in keys[lvl:]:
            f[k] = all_label
        frames.append(f[[*keys, *sum_cols]])
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(keys, kind="stable").reset_index(drop=True)


def cube_agg(ds: ray.data.Dataset, keys: list[str], batch_agg,
             sum_cols: list[str],
             all_label: str = "ALL") -> pd.DataFrame:
    """GROUP BY CUBE over additive measures from ONE distributed pass:
    like :func:`rollup_agg` but re-summing the finest partials at every
    one of the 2^k grouping subsets, so the full cube costs a single
    scan. Keys must be strings (subtotal marker ``all_label`` mirrors
    the oracle's ``coalesce(col, 'ALL')`` over SQL CUBE's NULLs)."""
    from itertools import combinations

    fine = partial_groupby(ds, keys, batch_agg, sum_cols)
    frames = []
    for lvl in range(len(keys), -1, -1):
        for g in combinations(keys, lvl):
            g = list(g)
            if g:
                f = fine.groupby(g, as_index=False)[sum_cols].sum()
            else:
                f = fine[sum_cols].sum().to_frame().T
            for k in keys:
                if k not in g:
                    f[k] = all_label
            frames.append(f[[*keys, *sum_cols]])
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(keys, kind="stable").reset_index(drop=True)


def grouping_sets_agg(ds: ray.data.Dataset, keys: list[str],
                      batch_agg, sum_cols: list[str],
                      sets: list[tuple[str, ...]],
                      all_label: str = "ALL") -> pd.DataFrame:
    """GROUP BY GROUPING SETS over additive measures from ONE
    distributed pass: like :func:`rollup_agg`/:func:`cube_agg` but for
    ARBITRARY (non-hierarchical) grouping sets — the finest partials
    over the union of all referenced keys are re-summed driver-side
    per set. Keys must be strings (the absent-key marker is
    ``all_label``, mirroring ``coalesce(col, 'ALL')`` over the SQL
    NULLs)."""
    fine = partial_groupby(ds, keys, batch_agg, sum_cols)
    frames = []
    for g in sets:
        g = list(g)
        if g:
            f = fine.groupby(g, as_index=False)[sum_cols].sum()
        else:
            f = fine[sum_cols].sum().to_frame().T
        for k in keys:
            if k not in g:
                f[k] = all_label
        frames.append(f[[*keys, *sum_cols]])
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(keys, kind="stable").reset_index(drop=True)


def pivot_agg(ds: ray.data.Dataset, index: str, columns: str,
              batch_agg, sum_cols: list[str],
              column_values: list[str] | None = None,
              fill: int = 0) -> pd.DataFrame:
    """Long → wide pivot over additive measures: the distributed work
    is exactly one :func:`partial_groupby` on (index, columns) — the
    pivot itself is a driver-side reshape of the (bounded)
    ``|index| × |columns|`` cell grid. ``column_values`` fixes the
    output column set (and order) so absent combinations still emit
    ``fill`` — required for schema-stable comparisons. Output columns:
    ``index, then {col}_{measure}`` for each column value × measure."""
    fine = partial_groupby(ds, [index, columns], batch_agg, sum_cols)
    if column_values is None:
        column_values = sorted(fine[columns].unique())
    wide = fine.pivot(index=index, columns=columns, values=sum_cols)
    out = pd.DataFrame({index: wide.index})
    for m in sum_cols:
        for cv in column_values:
            col = f"{cv}_{m}"
            if (m, cv) in wide.columns:
                out[col] = wide[(m, cv)].fillna(fill).to_numpy()
            else:
                out[col] = fill
            out[col] = out[col].astype("int64")
    return out.sort_values(index).reset_index(drop=True)


def set_op(left: ray.data.Dataset, right: ray.data.Dataset,
           on: str, op: str,
           num_buckets: int = 32) -> ray.data.Dataset:
    """ANSI set operation over DISTINCT key values: ``op`` ∈
    {``intersect``, ``except``} (SQL ``INTERSECT`` / ``EXCEPT``
    semantics — distinct rows of the left side present / absent on the
    right).

    Scale shape: each side is projected to the key column and deduped
    LOCALLY per block before anything moves, so the single bucket
    shuffle carries at most ``blocks × |distinct|`` skinny rows; the
    per-bucket resolve is two vectorized ``isin`` masks. Works for int
    or string keys (strings hash via the FNV block router).
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"unsupported op={op!r}")
    from .dedup import _id_blocks

    def prep(side: str):
        def _p(batch: pd.DataFrame) -> pd.DataFrame:
            u = batch[on].drop_duplicates()
            b = pd.DataFrame({on: u, "_side": side})
            if pd.api.types.is_integer_dtype(u):
                b["_bucket"] = (u.astype("int64") % num_buckets).astype("int32")
            else:
                b["_bucket"] = _id_blocks(u.tolist(), num_buckets)
            return b
        return _p

    unioned = left.select_columns([on]).map_batches(
        prep("L"), batch_format="pandas", batch_size=None).union(
        right.select_columns([on]).map_batches(
            prep("R"), batch_format="pandas", batch_size=None))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group.loc[group["_side"] == "L", on].drop_duplicates()
        rhs = group.loc[group["_side"] == "R", on]
        keep = lhs.isin(rhs) if op == "intersect" else ~lhs.isin(rhs)
        return pd.DataFrame({on: lhs[keep].to_numpy()})

    return unioned.groupby("_bucket").map_groups(resolve,
                                                 batch_format="pandas")


def bloom_build(ds: ray.data.Dataset, key_col: str,
                num_bits: int = 1 << 20, num_hashes: int = 4):
    """Distributed Bloom-filter build over an int key column: each
    block emits a packed partial bitmap (``num_bits/8`` bytes — fixed,
    tiny); the driver ORs them. Double hashing (h1 + i·h2) from two
    mixes of the 64-bit key, all numpy-vectorized. Returns the packed
    ``uint8`` bitmap; no false negatives by construction."""
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch[key_col].astype("int64").to_numpy().astype(np.uint64)
        h1 = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
        h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    out = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    acc = np.zeros(num_bits // 8, dtype=np.uint8)
    for blob in out["bits"]:
        acc |= np.frombuffer(blob, dtype=np.uint8)
    return acc


def bloom_semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    on: str, num_bits: int = 1 << 20,
                    num_hashes: int = 4,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT semi join for big⋈big shapes where the probe side is huge
    and mostly non-matching: a broadcast Bloom filter built from the
    right keys prunes probe rows BEFORE the shuffle (no false
    negatives, so nothing true is lost), then the surviving rows go
    through the exact bucketed :func:`hash_join` semi to kill the
    bloom's false positives. At 100 TB the win is shuffle volume: the
    exchange carries only ``match_rate + ε`` of the probe side instead
    of all of it, for a fixed ``num_bits/8``-byte broadcast."""
    import numpy as np

    bits = bloom_build(right, on, num_bits, num_hashes)
    bref = ray.put(bits)

    class _Probe:
        def __init__(self):
            self.bits = ray.get(bref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            k = batch[on].astype("int64").to_numpy().astype(np.uint64)
            h1 = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
            h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
            keep = np.ones(len(batch), dtype=bool)
            for i in range(num_hashes):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
                byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                keep &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
            return batch[keep]

    from .stagecache import cached_stage

    survivors = left.map_batches(cached_stage(_Probe),
                                 batch_format="pandas", batch_size=None)
    return hash_join(survivors, right.select_columns([on]), on,
                     num_buckets=num_buckets, how="semi")


def unpivot(ds: ray.data.Dataset, id_cols: list[str],
            value_cols: list[str], var_name: str = "measure",
            value_name: str = "value") -> ray.data.Dataset:
    """Wide → long (SQL UNPIVOT / pandas melt): each input row emits
    one output row per value column. Map-only and vectorized — the
    k-way expansion is a single pandas ``melt`` per block (k·N rows,
    but each block expands independently, so the op streams at any
    table size); column order and dtypes are fixed so block schemas
    agree."""
    def melt(b: pd.DataFrame) -> pd.DataFrame:
        out = b.melt(id_vars=id_cols, value_vars=value_cols,
                     var_name=var_name, value_name=value_name)
        return out[[*id_cols, var_name, value_name]]

    return ds.map_batches(melt, batch_format="pandas")


def merge_intervals(ds: ray.data.Dataset, key_col: str,
                    start_col: str, end_col: str,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Coalesce overlapping/touching intervals per key (half-open
    overlap rule: a new island starts where ``start > running max
    end`` of everything before it) — the islands idiom, distributed:
    ONE shuffle on ``hash(key) % num_buckets`` co-locates each key's
    intervals, then a per-bucket vectorized pass (stable sort by
    (key, start, end), running cummax of end within key, island ids
    from the strict-gap flag) — no per-key loop. Output one row per
    island: (key, start, end, n_merged). Values are int64
    (timestamps/cents — the repo-wide integer discipline); the SQL
    oracle replays the same window idiom."""
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[key_col].astype("int64"),
                                       index=False)
        return b.assign(_kb=(h % num_buckets).astype("int32"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, end_col],
                          kind="stable").reset_index(drop=True)
        k = g[key_col].to_numpy()
        s = g[start_col].to_numpy().astype(np.int64)
        e = g[end_col].to_numpy().astype(np.int64)
        new_key = np.ones(len(g), bool)
        new_key[1:] = k[1:] != k[:-1]
        # running max end WITHIN key: pandas grouped cummax (cython,
        # no per-key Python loop, no magnitude constraints)
        kid = np.cumsum(new_key) - 1
        cummax = pd.Series(e).groupby(kid).cummax().to_numpy()
        prev_cummax = np.concatenate(([0], cummax[:-1]))
        island_start = new_key.copy()
        island_start[1:] |= s[1:] > prev_cummax[1:]
        iid = np.cumsum(island_start) - 1
        out = pd.DataFrame({key_col: k, "_iid": iid, "s": s,
                            "e": cummax})
        agg = out.groupby("_iid", as_index=False).agg(
            **{key_col: (key_col, "first"),
               start_col: ("s", "first"),
               end_col: ("e", "max"),
               "n_merged": ("s", "size")})
        agg["n_merged"] = agg["n_merged"].astype("int64")
        return agg[[key_col, start_col, end_col, "n_merged"]]

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("_kb").map_groups(per_bucket,
                                       batch_format="pandas"))


def _skyline_block(df: pd.DataFrame, id_col: str, min_col: str,
                   max_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of one block (minimize ``min_col``, maximize
    ``max_col``): a row is dominated iff some row has a strictly
    smaller min_col with max_col ≥ mine, OR an equal min_col with a
    strictly larger max_col. One sort + grouped prefix-cummax — no
    pairwise loop. Duplicate (min,max) points all survive (SQL
    NOT-EXISTS strict-dominance semantics)."""
    if not len(df):
        return df[[id_col, min_col, max_col]]
    g = df.sort_values([min_col, max_col, id_col],
                       ascending=[True, False, True], kind="stable")
    mn = g[min_col].to_numpy(dtype="int64")
    mx = g[max_col].to_numpy(dtype="int64")
    first = np.empty(len(g), dtype=bool)
    first[0] = True
    first[1:] = mn[1:] != mn[:-1]
    gid = np.cumsum(first) - 1
    gmax_per_group = mx[first]              # desc within group → first is max
    prev_cummax = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(gmax_per_group)[:-1]))[gid]
    keep = ~((prev_cummax >= mx) | (gmax_per_group[gid] > mx))
    return g.loc[keep, [id_col, min_col, max_col]]


def skyline_2d(ds: ray.data.Dataset, id_col: str, min_col: str,
               max_col: str) -> pd.DataFrame:
    """Distributed Pareto-frontier (skyline) query: the rows not
    strictly dominated on (``min_col`` ↓, ``max_col`` ↑). SQL twin is
    the classic ``NOT EXISTS`` anti-self-join; here it is the
    textbook two-phase distributive plan: a vectorized LOCAL skyline
    per block (map-only — a locally dominated point is dominated by a
    global survivor via transitivity, so the filter is safe), then
    the same kernel once over the union of block skylines. The final
    pass sees only block survivors (≤ one monotone chain per block),
    not the input; at 100 TB the union is further shrunk by making
    block ranges min_col-sorted so chains rarely overlap. Output:
    (id, min, max) sorted by id."""
    local = ds.map_batches(
        lambda b: _skyline_block(b, id_col, min_col, max_col),
        batch_format="pandas")
    out = _skyline_block(local.to_pandas(), id_col, min_col, max_col)
    out = out.copy()
    out[min_col] = out[min_col].astype("int64")
    out[max_col] = out[max_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def relational_division(ds: ray.data.Dataset, group_col: str,
                        attr_col: str,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Relational division: the groups that cover EVERY distinct
    value of ``attr_col`` present in the table (the "customers who
    bought all products" / "hosts that served every content type"
    shape SQL expresses as GROUP BY … HAVING count(DISTINCT) =
    (SELECT count(DISTINCT) …)).

    Two skinny passes, raw rows never shuffle: (1) per-block DISTINCT
    (group, attr) partials → one group-hash bucket combine →
    per-group distinct-attr counts; (2) the global distinct-attr
    count rides the same partial pass keyed by attr hash — both
    reduce to O(distinct) rows. The divisor reaches the driver as a
    single scalar. Output: (group, n_attrs) for the covering groups.
    """
    from .windows import _add_key_bucket

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[group_col, attr_col]].drop_duplicates()

    pairs = (ds.select_columns([group_col, attr_col])
             .map_batches(distinct_pairs, batch_format="pandas"))
    pairs = _add_key_bucket(pairs, group_col, num_buckets) \
        .materialize()

    def per_bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[group_col, attr_col])
        out = g.groupby(group_col, as_index=False)[attr_col].nunique()
        return out.rename(columns={attr_col: "n_attrs"})

    counts = (pairs.groupby("_sbucket")
              .map_groups(per_bucket_counts, batch_format="pandas"))

    def distinct_attrs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[attr_col]].drop_duplicates()

    total = (_add_key_bucket(
        pairs.map_batches(distinct_attrs, batch_format="pandas"),
        attr_col, num_buckets)
        .groupby("_sbucket")
        .map_groups(lambda g: pd.DataFrame(
            {"n": [g[attr_col].nunique()]}),
            batch_format="pandas")
        .sum("n"))

    def keep_covering(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_attrs"] == total]

    out = counts.map_batches(keep_covering,
                             batch_format="pandas").to_pandas()
    out["n_attrs"] = out["n_attrs"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def join_size_audit(left: ray.data.Dataset, right: ray.data.Dataset,
                    on_left: str, on_right: str,
                    num_buckets: int = 64) -> pd.DataFrame:
    """Exact join-cardinality audit WITHOUT running the join: the
    output size of ``left ⋈ right`` is Σ_k c_L(k)·c_R(k), computable
    from the two per-key count histograms alone — the planner-grade
    pre-flight that tells you whether a key is about to fan out 10⁹
    rows before you shuffle any payload.

    Per-side per-key count partials collapse block-locally, meet in
    ONE key-hash bucket shuffle, and the per-bucket pair products
    fold in exact PYTHON ints carried as decimal strings (a single
    hot key can exceed int64 on its own). Output one row:
    (n_keys_left, n_keys_right, n_matched_keys, left_rows,
    right_rows, exact_pairs).
    """
    import numpy as np
    import pandas as pd

    def side(tag: str, col: str):
        def _p(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[col].astype("int64").value_counts()
            out = pd.DataFrame({"_k": vc.index.to_numpy("int64"),
                                "_c": vc.to_numpy("int64")})
            out["_s"] = tag
            out["_kb"] = (out["_k"].to_numpy(np.int64)
                          % num_buckets).astype(np.int32)
            return out
        return _p

    tagged = left.select_columns([on_left]).map_batches(
        side("l", on_left), batch_format="pandas",
        batch_size=None).union(
        right.select_columns([on_right]).map_batches(
            side("r", on_right), batch_format="pandas",
            batch_size=None))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cl = group[group["_s"] == "l"].groupby("_k")["_c"].sum()
        cr = group[group["_s"] == "r"].groupby("_k")["_c"].sum()
        m = cl.index.intersection(cr.index)
        pairs = sum(int(cl[k]) * int(cr[k]) for k in m)
        return pd.DataFrame({
            "nl": [len(cl)], "nr": [len(cr)], "nm": [len(m)],
            "rl": [int(cl.sum())], "rr": [int(cr.sum())],
            "pairs": [str(pairs)]})

    parts = tagged.groupby("_kb").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    pairs = sum(int(v) for v in parts["pairs"].tolist())
    return pd.DataFrame({
        "n_keys_left": pd.Series([int(parts["nl"].sum())],
                                 dtype="int64"),
        "n_keys_right": pd.Series([int(parts["nr"].sum())],
                                  dtype="int64"),
        "n_matched_keys": pd.Series([int(parts["nm"].sum())],
                                    dtype="int64"),
        "left_rows": pd.Series([int(parts["rl"].sum())],
                               dtype="int64"),
        "right_rows": pd.Series([int(parts["rr"].sum())],
                                dtype="int64"),
        "exact_pairs": pd.Series([pairs], dtype="int64")})


def sorted_run_audit(ds: ray.data.Dataset, key_col: str) -> pd.DataFrame:
    """Ray-native sortedness audit: is this Dataset globally sorted
    by ``key_col``? Per-block (first, last, sorted-within, rows)
    probes fold on the driver, which then checks the block-boundary
    chain in block order — O(blocks) driver rows, no data movement.
    The invariant checker you run after a range partition / before a
    merge join; like :func:`~web2llmstxt_ray.ops.dedup.
    block_skew_audit` it measures the EXECUTION layout, so it has no
    SQL analogue by design. Output one row: (n_blocks, n_rows,
    blocks_sorted_within, boundaries_sorted, globally_sorted).
    """
    import numpy as np
    import pandas as pd

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"first": [], "last": [],
                                 "ok": [], "n": []})
        v = b[key_col].to_numpy()
        return pd.DataFrame({
            "first": [v[0]], "last": [v[-1]],
            "ok": [bool((v[:-1] <= v[1:]).all())],
            "n": [len(v)]})

    parts = ds.map_batches(probe, batch_format="pandas",
                           batch_size=None).to_pandas()
    parts = parts[parts["n"] > 0]
    if parts.empty:
        return pd.DataFrame({
            "n_blocks": pd.Series([0], dtype="int64"),
            "n_rows": pd.Series([0], dtype="int64"),
            "blocks_sorted_within": pd.Series([0], dtype="int64"),
            "boundaries_sorted": pd.Series([True]),
            "globally_sorted": pd.Series([True])})
    within = int(parts["ok"].sum())
    lasts = parts["last"].to_numpy()
    firsts = parts["first"].to_numpy()
    bound = bool((lasts[:-1] <= firsts[1:]).all()) \
        if len(parts) > 1 else True
    return pd.DataFrame({
        "n_blocks": pd.Series([len(parts)], dtype="int64"),
        "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
        "blocks_sorted_within": pd.Series([within], dtype="int64"),
        "boundaries_sorted": pd.Series([bound]),
        "globally_sorted": pd.Series(
            [bound and within == len(parts)])})


def cheapest_substitute(ds: ray.data.Dataset, key_col: str,
                        group_cols: list[str], brand_col: str,
                        price_col: str,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Cheapest cross-brand substitute per item: for every row, the
    lowest-priced row sharing its ``group_cols`` but carrying a
    DIFFERENT ``brand_col`` (ties → lower key) — the
    procurement/vendor-risk view, and the classic within-group
    cross-match that a naive self-join explodes quadratically.

    No pair materialization: inside each group only TWO candidate
    rows matter — the global cheapest r1 and the cheapest whose brand
    differs from r1's (r2) — because every row's answer is r1 unless
    the row shares r1's brand, in which case it is r2. One
    group-hash shuffle (groups whole in their bucket), O(group) work
    per group. Rows with no cross-brand option are omitted. Output:
    (key, sub_key, sub_price_cents, price_delta_cents), sorted.
    """
    import numpy as np
    import pandas as pd

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, brand_col, price_col, *group_cols]].copy()
        out["_pc"] = np.rint(out[price_col].to_numpy(np.float64)
                             * 100.0).astype(np.int64)
        gk = out[group_cols[0]].astype(str)
        for c in group_cols[1:]:
            gk = gk + "\x00" + out[c].astype(str)
        out["_gb"] = (pd.util.hash_pandas_object(gk, index=False)
                      % num_buckets).astype("int32")
        return out.drop(columns=[price_col])

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in group.groupby(group_cols):
            if g[brand_col].nunique() < 2:
                continue
            g = g.sort_values(["_pc", key_col], kind="stable")
            r1 = g.iloc[0]
            g2 = g[g[brand_col] != r1[brand_col]]
            r2 = g2.iloc[0]
            same_r1 = g[brand_col].to_numpy() == r1[brand_col]
            sub_key = np.where(same_r1, int(r2[key_col]),
                               int(r1[key_col]))
            sub_pc = np.where(same_r1, int(r2["_pc"]),
                              int(r1["_pc"]))
            rows.append(pd.DataFrame({
                key_col: g[key_col].to_numpy(),
                "sub_key": sub_key,
                "sub_price_cents": sub_pc,
                "price_delta_cents": g["_pc"].to_numpy() - sub_pc}))
        if not rows:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "sub_key": pd.Series([], dtype="int64"),
                "sub_price_cents": pd.Series([], dtype="int64"),
                "price_delta_cents": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    out = (ds.map_batches(tag, batch_format="pandas",
                          batch_size=None)
           .groupby("_gb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({
            key_col: pd.Series([], dtype="int64"),
            "sub_key": pd.Series([], dtype="int64"),
            "sub_price_cents": pd.Series([], dtype="int64"),
            "price_delta_cents": pd.Series([], dtype="int64")})
    for c in (key_col, "sub_key", "sub_price_cents",
              "price_delta_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def dominance_counts(ds: ray.data.Dataset, id_col: str, x_col: str,
                     y_col: str, y_domain: int = 256,
                     n_chunks: int = 32) -> pd.DataFrame:
    """2-D weak-dominance census — for every row, how many OTHER rows
    are at-least-as-good in BOTH dimensions (``q.x ≤ p.x AND
    q.y ≤ p.y``, lower = better)? The dominance DEPTH ranking behind
    the skyline (depth 0 = Pareto frontier), the multi-criteria
    quality read a single score can't give.

    The naive form is the O(n²) correlated self-join the SQL twin
    runs. Here it is one rank-partitioned pass: rows partition into
    ``n_chunks`` contiguous x-ranges (skinny per-x-value histogram →
    driver prefix offsets, the ``curriculum_schedule`` pattern — equal
    x values never split, so cross-chunk contributions are exactly
    the ``x ≤`` predicate), every chunk's small-domain y-histogram
    folds on the driver (O(chunks × y_domain) ints) and broadcasts
    cumulatively; each chunk then resolves its rows as
    ``(Σ earlier-chunk histograms)[≤ y] + local brute count − 1``
    (the −1 removes self; exact integers throughout, so ANY
    partitioning gives the hash-identical answer). Requires an
    integer ``y_col`` with a bounded domain (< ``y_domain``) — the
    p_size/priority/bucket-id shape; unbounded y routes through a
    rank-compression pass first."""
    import ray as _ray

    slim = ds.select_columns([id_col, x_col, y_col]).materialize()

    def hist_batch(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(x_col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    xh = partial_groupby(slim.select_columns([x_col]),
                         [x_col], hist_batch, ["n"]).sort_values(x_col)
    total = int(xh["n"].sum())
    # contiguous value-range chunks of ~equal row count: each DISTINCT
    # x value belongs to exactly one chunk
    cum = xh["n"].cumsum().to_numpy()
    chunk_of_value = dict(zip(
        xh[x_col], np.minimum((cum - 1) * n_chunks // max(total, 1),
                              n_chunks - 1).astype(np.int64)))
    cref = _ray.put(chunk_of_value)

    # per-chunk y histograms (one skinny pass)
    def yhist(b: pd.DataFrame) -> pd.DataFrame:
        cm = _ray.get(cref)
        ch = np.array([cm[x] for x in b[x_col]], dtype=np.int64)
        y = b[y_col].to_numpy().astype(np.int64)
        g = pd.DataFrame({"_chunk": ch, "_y": y})
        out = g.groupby(["_chunk", "_y"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    # fold y-histograms on the driver (O(chunks × y_domain))
    parts = slim.map_batches(yhist, batch_format="pandas").to_pandas()
    parts = parts.groupby(["_chunk", "_y"], as_index=False)["n"].sum()
    hist = np.zeros((n_chunks, y_domain), dtype=np.int64)
    for c, y, n in zip(parts["_chunk"], parts["_y"], parts["n"]):
        hist[int(c), int(y)] += int(n)
    # prior[c] = cumulative-y counts of all chunks BEFORE c
    prior = np.zeros((n_chunks, y_domain), dtype=np.int64)
    run = np.zeros(y_domain, dtype=np.int64)
    for c in range(n_chunks):
        prior[c] = np.cumsum(run)
        run += hist[c]
    pref = _ray.put(prior)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        pr = _ray.get(pref)
        c = int(g["_chunk2"].iloc[0])
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy().astype(np.int64)
        # within-chunk brute force (chunk ~ n/n_chunks rows)
        local = ((x[:, None] >= x[None, :])
                 & (y[:, None] >= y[None, :])).sum(axis=1)
        cnt = pr[c][y] + local - 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "n_weak_dominators": cnt})

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        cm = _ray.get(cref)
        out = b.copy()
        out["_chunk2"] = np.array([cm[x] for x in b[x_col]],
                                  dtype=np.int64)
        return out

    out = (slim.map_batches(tag, batch_format="pandas")
           .groupby("_chunk2").map_groups(resolve,
                                          batch_format="pandas")
           .to_pandas())
    out["n_weak_dominators"] = out["n_weak_dominators"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def borda_fusion(ds: ray.data.Dataset, top_n: int = 20) -> pd.DataFrame:
    """Borda-count rank fusion of three part rankings — revenue
    (exact integer cents×(100−disc) units), total quantity, and line
    count: each metric ranks parts (metric DESC, partkey ASC), the
    Borda score is the rank sum, low wins. The consensus-ranking
    primitive for merging incomparable signals without score
    normalization (Kemeny is NP-hard; Borda is its one-pass
    workhorse). Exact integers throughout. One skinny partial-agg
    fold (O(parts) driver state — the rank step needs the full key
    domain; for billions of keys the ranks come from the histogram-
    offset pattern instead). Output top-``top_n`` by (borda, part):
    (l_partkey, revenue_i, qty_i, n_lines, r_rev, r_qty, r_cnt,
    borda)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                        * 100.0).astype(np.int64)
        disc = np.rint(b["l_discount"].to_numpy(np.float64)
                       * 100.0).astype(np.int64)
        qty = np.rint(b["l_quantity"].to_numpy(np.float64)) \
            .astype(np.int64)
        g = pd.DataFrame({"l_partkey": b["l_partkey"].to_numpy(),
                          "rev": cents * (100 - disc), "qty": qty,
                          "n": 1})
        return g.groupby("l_partkey", as_index=False)[
            ["rev", "qty", "n"]].sum()

    parts = ds.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount", "l_quantity"]
    ).map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("l_partkey", as_index=False)[
        ["rev", "qty", "n"]].sum()

    def rank_of(col: str) -> pd.Series:
        order = agg.sort_values([col, "l_partkey"],
                                ascending=[False, True], kind="stable")
        r = pd.Series(range(1, len(order) + 1), index=order.index)
        return r.sort_index()

    agg["r_rev"] = rank_of("rev")
    agg["r_qty"] = rank_of("qty")
    agg["r_cnt"] = rank_of("n")
    agg["borda"] = agg["r_rev"] + agg["r_qty"] + agg["r_cnt"]
    out = agg.sort_values(["borda", "l_partkey"]).head(top_n)
    out = out.rename(columns={"rev": "revenue_i", "qty": "qty_i",
                              "n": "n_lines"})
    return out[["l_partkey", "revenue_i", "qty_i", "n_lines",
                "r_rev", "r_qty", "r_cnt", "borda"]].astype("int64") \
        .reset_index(drop=True)


def pareto_layers(ds: ray.data.Dataset, id_col: str, x_col: str,
                  y_col: str, y_domain: int = 256) -> pd.DataFrame:
    """Skyline LAYERS (iterative Pareto peeling): layer 1 = the
    skyline, layer 2 = the skyline of what remains, … — the full
    multi-criteria ranking the single frontier truncates. By Mirsky's
    theorem the peel layer of a point equals the longest STRICT
    dominance chain ending at it, so the operator computes
    ``layer[p] = 1 + max{layer[q] : q.x < p.x AND q.y < p.y}`` — an
    exact-integer DP, hash-identical under any partitioning.

    Scale shape: the corpus collapses to the skinny (x, y, id)
    triples; processing ascends x-groups while a y-indexed prefix-max
    array (bounded ``y_domain``) carries the DP state — O(n·y_domain)
    driver work on O(n) skinny rows, with the same histogram-offset
    escape as ``dominance_counts`` when the triple set itself is too
    big for one driver. The SQL twin replays the equivalent
    LIS-on-y formulation (points sorted by (x asc, y desc), strict
    increase) with the step-carry recursion. Output: (id, x, y,
    layer) ordered by id."""
    slim = ds.select_columns([id_col, x_col, y_col]).to_pandas()
    slim = slim.sort_values([x_col, y_col, id_col],
                            kind="stable").reset_index(drop=True)
    x = slim[x_col].to_numpy()
    y = slim[y_col].to_numpy().astype(np.int64)
    n = len(slim)
    layer = np.zeros(n, dtype=np.int64)
    best = np.zeros(y_domain + 1, dtype=np.int64)   # max layer per y
    i = 0
    while i < n:
        j = i
        while j < n and x[j] == x[i]:
            j += 1
        # snapshot prefix-max BEFORE this x-group (equal x is never
        # a strict dominator)
        pref = np.maximum.accumulate(best)
        for t in range(i, j):
            layer[t] = 1 + (pref[y[t] - 1] if y[t] > 0 else 0)
        for t in range(i, j):
            if layer[t] > best[y[t]]:
                best[y[t]] = layer[t]
        i = j
    out = slim.assign(layer=layer)
    return out.astype({id_col: "int64", "layer": "int64"}) \
        .sort_values(id_col).reset_index(drop=True)
