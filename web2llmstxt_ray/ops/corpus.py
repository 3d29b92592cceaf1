"""Corpus-preparation operators a large-scale training-data pipeline
needs beyond cleaning/dedup: vocabulary building, deterministic
sampling, and sequence packing.

Scale shapes:

- **top_tokens** — global token top-k: per-batch Counter partials
  (only (token, partial_count) rows leave the worker — never the
  text), hash-bucket groupby so one vectorized merge per bucket, then
  per-bucket top-k (each token lives in exactly ONE bucket, so the
  union of per-bucket top-k's contains the global top-k); the driver
  merges B×k rows.
- **sample_mod** — deterministic mod-sampling on a key column: pure
  vectorized filter, no shuffle, reproducible across runs/workers.
- **pack_sequences** — greedy first-fit-decreasing packing of
  documents into ≤max_tokens training sequences, one independent
  packing per block (the stated partitioning assumption: packs never
  span blocks — at training time packs are shuffled anyway, so
  cross-block packing buys nothing and would cost a barrier).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.urls import hash64_batch


def top_tokens(ds: ray.data.Dataset, k: int = 50, text_col: str = "text",
               num_buckets: int = 64) -> pd.DataFrame:
    """Global top-k most frequent whitespace tokens (lowercased) with
    deterministic (count desc, token asc) tie-break.

    Returns (token, n) — the vocabulary-building primitive.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if t:
                c.update(t.lower().split())
        if not c:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_tbucket": pa.array([], pa.int32())})
        toks = list(c.keys())
        buckets = (hash64_batch(toks) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[t] for t in toks], pa.int64()),
            "_tbucket": pa.array(buckets),
        })

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        merged = group.groupby("token", as_index=False)["n"].sum()
        merged = merged.sort_values(["n", "token"],
                                    ascending=[False, True]).head(k)
        return merged[["token", "n"]]

    per_bucket = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("_tbucket").map_groups(bucket_topk, batch_format="pandas")
    out = per_bucket.to_pandas()
    out = out.sort_values(["n", "token"], ascending=[False, True]).head(k)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def top_tokens_by_group(ds: ray.data.Dataset, group_col: str,
                        k: int = 10, text_col: str = "text",
                        num_buckets: int = 64) -> pd.DataFrame:
    """Per-group token top-k (count desc, token asc): the per-language
    vocabulary primitive. Same shape as :func:`top_tokens` — per-batch
    (group, token) Counter partials, hash-bucket shuffle on the TOKEN
    (each token's total per group completes inside one bucket, so
    per-bucket per-group top-k's union contains every group's global
    top-k), driver merge of ``O(buckets × groups × k)`` rows. Group
    cardinality is assumed small (languages/sources)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            if t:
                for w in t.lower().split():
                    c[(g, w)] += 1
        if not c:
            return pa.table({group_col: pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_tbucket": pa.array([], pa.int32())})
        keys = list(c.keys())
        toks = [w for _, w in keys]
        buckets = (hash64_batch(toks) % np.uint64(num_buckets)).astype(
            np.int32)
        return pa.table({
            group_col: pa.array([g for g, _ in keys], pa.string()),
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[key] for key in keys], pa.int64()),
            "_tbucket": pa.array(buckets),
        })

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        merged = group.groupby([group_col, "token"], as_index=False)[
            "n"].sum()
        merged = merged.sort_values(["n", "token"],
                                    ascending=[False, True])
        return merged.groupby(group_col, sort=False).head(k)

    cand = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("_tbucket").map_groups(bucket_topk, batch_format="pandas") \
        .to_pandas()
    cand = cand.sort_values(["n", "token"], ascending=[False, True])
    out = cand.groupby(group_col, sort=False).head(k)
    out["n"] = out["n"].astype("int64")
    return (out.sort_values([group_col, "n", "token"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


def sample_mod(ds: ray.data.Dataset, key_col: str, modulus: int = 100,
               keep_below: int = 10) -> ray.data.Dataset:
    """Deterministic sample: keep rows where ``key % modulus <
    keep_below`` (an exact ``keep_below/modulus`` rate for dense integer
    keys). Reproducible across runs and engines — the property that
    matters for train/eval splits; no shuffle, no RNG state."""

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        mask = (keys % modulus) < keep_below   # vectorized; pc has no mod
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, strata_col: str,
                      n_per_stratum: int, key_col: str = "doc_id",
                      keep_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Deterministic N-per-stratum sample: within each stratum keep the
    ``n_per_stratum`` rows with the smallest ``(knuth_hash(key), key)``
    order key. The multiplicative hash makes the pick pseudo-random yet
    reproducible across engines and runs (same property as
    :func:`sample_mod`, but with an exact per-stratum count — the
    balanced-eval-set primitive).

    Scale shape: each block keeps at most ``strata × N`` candidate rows
    (a vectorized partial top-N inside ``map_batches``), so only
    ``O(blocks × strata × N)`` rows ever leave the workers; the final
    per-stratum merge handles candidates only. No full-dataset shuffle,
    no RNG state.
    """
    cols = list(dict.fromkeys([key_col, strata_col, *keep_cols]))

    def partial_topn(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df["_ok"] = (df[key_col].to_numpy(dtype=np.uint64, na_value=0)
                     * np.uint64(2654435761)) % np.uint64(1 << 32)
        df = df.sort_values(["_ok", key_col], kind="stable")
        df = df.groupby(strata_col, sort=False).head(n_per_stratum)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(partial_topn, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["_ok", key_col], kind="stable")
    out = cand.groupby(strata_col, sort=False).head(n_per_stratum)
    return (out.drop(columns=["_ok"])
            .sort_values([strata_col, key_col])
            .reset_index(drop=True))


def quota_sample(ds: ray.data.Dataset, strata_col: str,
                 rates: dict, key_col: str = "doc_id",
                 keep_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Deterministic per-stratum FRACTIONAL sampling — the domain-
    mixture-reweighting primitive: stratum ``g`` keeps its
    ``ceil(rates[g] · n_g)`` rows with the smallest
    ``(knuth_hash(key), key)`` order key (strata absent from ``rates``
    are dropped). Same reproducible-order machinery as
    :func:`stratified_sample`, but the cut is a per-stratum rate, so a
    pipeline can up/down-weight sources to a target mixture without an
    RNG.

    Scale shape: needs per-stratum totals first — ONE cheap counting
    aggregate over the strata column (partial per block, tiny combine;
    strata cardinality is assumed small: sources/languages, not ids) —
    then the same partial top-N pruning per block bounded by the
    stratum's quota.
    """
    cols = list(dict.fromkeys([key_col, strata_col, *keep_cols]))

    def count_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(strata_col, as_index=False).agg(
            n=(strata_col, "size"))

    totals = ds.map_batches(count_batch, batch_format="pandas") \
        .to_pandas().groupby(strata_col)["n"].sum().to_dict()
    quotas = {g: int(np.ceil(rates[g] * totals.get(g, 0)))
              for g in rates}
    max_quota = max(quotas.values(), default=0)

    def partial_topn(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df[df[strata_col].isin(quotas)]
        df["_ok"] = (df[key_col].to_numpy(dtype=np.uint64, na_value=0)
                     * np.uint64(2654435761)) % np.uint64(1 << 32)
        df = df.sort_values(["_ok", key_col], kind="stable")
        df = df.groupby(strata_col, sort=False).head(max_quota)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(partial_topn, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["_ok", key_col], kind="stable")
    out = pd.concat([g.head(quotas[name]) for name, g in
                     cand.groupby(strata_col, sort=False)],
                    ignore_index=True) if len(cand) else cand
    return (out.drop(columns=["_ok"])
            .sort_values([strata_col, key_col])
            .reset_index(drop=True))


def int_quantiles(ds: ray.data.Dataset, col: str,
                  qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                  group_col: str | None = None) -> pd.DataFrame:
    """Exact nearest-rank quantiles of a bounded-integer column via a
    distributed value-count histogram — the scale-safe alternative to
    a global sort: per-block ``value_counts`` partials (≤ distinct
    values rows each) shuffle instead of the data, the driver merges
    ``O(blocks × distinct)`` counter rows and walks the CDF.

    Nearest-rank = the ``ceil(q·n)``-th smallest element of the
    multiset — DuckDB's ``quantile_disc`` semantics (verified
    empirically across sizes), so the op is SQL-oracle-able.
    Output: (group?, q, value).
    """
    gcols = [group_col] if group_col else []

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # count column name must not collide with a user value column
        # (a column literally named "n" broke the ungrouped path)
        g = batch.groupby([*gcols, col], as_index=False).agg(
            _cnt=(col, "size"))
        return g

    merged_ds = ds.map_batches(partial_counts, batch_format="pandas")
    merged = merged_ds.to_pandas().groupby([*gcols, col], as_index=False)[
        "_cnt"].sum()

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(col)
        vals = df[col].to_numpy()
        cum = df["_cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        ranks = np.maximum(np.ceil(np.asarray(qs) * n), 1.0)
        picks = vals[np.searchsorted(cum, ranks, "left")]
        return pd.DataFrame({"q": list(qs), "value": picks})

    if not gcols:
        return walk(merged).reset_index(drop=True)
    out = (merged.groupby(group_col, group_keys=True)
           .apply(walk, include_groups=False).reset_index(level=0)
           .reset_index(drop=True))
    return out.sort_values([group_col, "q"]).reset_index(drop=True)


def int_quantiles_cont(ds: ray.data.Dataset, col: str,
                       qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                       group_col: str | None = None,
                       ndigits: int = 6) -> pd.DataFrame:
    """Interpolated (continuous) quantiles of a bounded-integer column
    from the same distributed value-count histogram as
    :func:`int_quantiles` — no global sort; only O(blocks × distinct)
    counter rows ever move.

    Semantics = ANSI ``percentile_cont`` / DuckDB ``quantile_cont``:
    linear interpolation at zero-indexed position ``q·(n−1)`` of the
    sorted multiset, ``v_lo + frac·(v_hi − v_lo)`` in doubles. Since
    the interpolands are exact integers off the merged histogram, the
    float result is bit-identical to a SQL engine evaluating the same
    expression. Output: (group?, q, value:double).
    """
    gcols = [group_col] if group_col else []

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([*gcols, col], as_index=False).agg(
            _cnt=(col, "size"))

    merged = (ds.map_batches(partial_counts, batch_format="pandas")
              .to_pandas().groupby([*gcols, col], as_index=False)[
                  "_cnt"].sum())

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(col)
        vals = df[col].to_numpy().astype(np.int64)
        cum = df["_cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        pos = np.asarray(qs, dtype=np.float64) * (n - 1)
        lo_i = np.floor(pos).astype(np.int64)
        hi_i = np.ceil(pos).astype(np.int64)
        # value at zero-indexed rank r = first histogram bin whose
        # cumulative count exceeds r
        v_lo = vals[np.searchsorted(cum, lo_i + 1, "left")]
        v_hi = vals[np.searchsorted(cum, hi_i + 1, "left")]
        frac = pos - lo_i
        out = v_lo + frac * (v_hi - v_lo)
        return pd.DataFrame({"q": list(qs), "value": out.round(ndigits)})

    if not gcols:
        return walk(merged).reset_index(drop=True)
    out = (merged.groupby(group_col, group_keys=True)
           .apply(walk, include_groups=False).reset_index(level=0)
           .reset_index(drop=True))
    return out.sort_values([group_col, "q"]).reset_index(drop=True)


def pack_sequences(ds: ray.data.Dataset, max_tokens: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   bucket_mod: int | None = None) -> ray.data.Dataset:
    """Greedy first-fit-decreasing packing of documents into training
    sequences of ≤ ``max_tokens`` tokens.

    Output rows: (pack_id, doc_ids list, n_docs, total_tokens). Docs
    longer than ``max_tokens`` get a singleton pack (truncation is the
    tokenizer's job, not the packer's). Packing is per input block —
    deterministic given the block contents.

    ``bucket_mod`` switches to GLOBALLY deterministic packing: docs
    are grouped by ``id % bucket_mod`` (one key-hash shuffle) and FFD
    runs per bucket, so the pack layout is a pure function of the
    data — reproducible across runs, partitionings and cluster shapes
    (the auditable/oracle-able variant; the per-block default trades
    that determinism for zero shuffle). The modulus is deliberately
    SQL-replayable — the DuckDB twin in ``__ray_entry__`` replays the
    exact FFD fold per bucket via a recursive CTE.
    """

    def pack_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        toks = batch.column(tokens_col).to_pylist()
        order = sorted(range(len(ids)), key=lambda i: (-toks[i], ids[i]))
        packs: list[list] = []                # [doc_ids, total]
        for i in order:
            t = toks[i]
            placed = False
            for p in packs:                   # first fit
                if p[1] + t <= max_tokens:
                    p[0].append(ids[i])
                    p[1] += t
                    placed = True
                    break
            if not placed:
                packs.append([[ids[i]], t])
        if not packs:
            return pa.table({
                "pack_id": pa.array([], pa.uint64()),
                "doc_ids": pa.array([], pa.list_(pa.int64())),
                "n_docs": pa.array([], pa.int32()),
                "total_tokens": pa.array([], pa.int64()),
            })
        pack_ids = hash64_batch([",".join(map(str, p[0])) for p in packs])
        return pa.table({
            "pack_id": pa.array(pack_ids),
            "doc_ids": pa.array([sorted(p[0]) for p in packs],
                                pa.list_(pa.int64())),
            "n_docs": pa.array([len(p[0]) for p in packs], pa.int32()),
            "total_tokens": pa.array([p[1] for p in packs], pa.int64()),
        })

    if bucket_mod is not None:
        def add_pb(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            pb = (ids % bucket_mod).astype(np.int32)
            return b.append_column("_pb", pa.array(pb))

        return (ds.map_batches(add_pb, batch_format="pyarrow")
                .groupby("_pb")
                .map_groups(pack_batch, batch_format="pyarrow"))
    return ds.map_batches(pack_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic epoch shuffle
# ---------------------------------------------------------------------------

# odd ⇒ multiplication is a bijection mod 2^64 (Fibonacci/splitmix-style
# multiplicative permutation); < 2^62 so (key·A) also fits an int128
# oracle (DuckDB HUGEINT) without overflow
_SHUFFLE_MULT = 0x2545F4914F6CDD1D


def epoch_shuffle(ds: ray.data.Dataset, key_col: str = "doc_id",
                  seed: int = 0,
                  out_col: str = "shuffle_key") -> ray.data.Dataset:
    """Deterministic global shuffle for training epochs: every row gets
    ``shuffle_key = ((key + seed) mod 2^64) · A mod 2^64`` (A odd ⇒ a
    bijective multiplicative permutation — equidistributed for
    sequential ids, collision-free for distinct keys), then a global
    ``ds.sort(shuffle_key)`` realizes the permutation as a
    range-partitioned distributed sort.

    Why not ``random_shuffle()``: epoch reproducibility. The same
    (corpus, seed) yields the SAME order on any cluster shape, any
    partitioning, any run — resumable training and A/B-comparable data
    order — and per-epoch reshuffling is just ``seed=epoch``. The key
    derivation is one vectorized multiply per batch; the sort is the
    one unavoidable all-to-all.
    """
    mult = np.uint64(_SHUFFLE_MULT)
    s = np.uint64(seed % (1 << 64))

    def add_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key_col)).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = (ids + s) * mult               # uint64 wraps = mod 2^64
        return batch.append_column(out_col, pa.array(k))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(out_col)


def quantile_threshold_filter(ds: ray.data.Dataset, col: str, q: float,
                              keep: str = "ge") -> ray.data.Dataset:
    """Filter rows against a GLOBAL exact quantile of ``col`` — "keep
    the top quartile by length/score" without a global sort: one
    histogram pass computes the nearest-rank threshold
    (:func:`int_quantiles`), then a vectorized map filter applies it.
    ``keep``: "ge" keeps rows ≥ threshold, "le" keeps ≤.
    """
    import pyarrow.compute as pc

    ds = ds.materialize()              # consumed twice: quantile + filter
    thr = int(int_quantiles(ds, col, (q,))["value"].iloc[0])
    op = pc.greater_equal if keep == "ge" else pc.less_equal

    def apply(batch: pa.Table) -> pa.Table:
        return batch.filter(op(batch.column(col), thr))

    return ds.map_batches(apply, batch_format="pyarrow")


def global_percent_rank(ds: ray.data.Dataset, col: str,
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-row global percentile rank — SQL's
    ``percent_rank() OVER (ORDER BY col)`` — without a global sort.

    Pass 1 builds the value-count histogram distributively (per-block
    ``value_counts`` partials, same bounded-distinct-cardinality
    contract as :func:`int_quantiles`); the sorted values + cumulative
    strictly-less counts broadcast once. Pass 2 is a map-only
    vectorized ``searchsorted`` probe: pr = n_less / (n − 1) — the
    window-function identity ``(rank − 1)/(n − 1)``, bit-exact against
    the SQL oracle (both engines divide the same two integers).
    For unbounded-cardinality floats, quantize first (the caller owns
    the bucketing; rank over buckets is then exact for the buckets).
    """
    import ray as _ray

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(col, as_index=False).agg(_cnt=(col, "size"))

    merged = (ds.map_batches(partial_counts, batch_format="pandas")
              .to_pandas().groupby(col, as_index=False)["_cnt"].sum()
              .sort_values(col))
    vals = merged[col].to_numpy()
    counts = merged["_cnt"].to_numpy()
    n = int(counts.sum())
    less = np.concatenate(([0], counts.cumsum()[:-1]))
    state = _ray.put((vals, less, n))

    class _Rank:
        def __init__(self):
            self.vals, self.less, self.n = _ray.get(state)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.vals, v, "left")
            pr = self.less[idx] / max(1, self.n - 1)
            return pa.table({
                id_col: batch.column(id_col),
                col: batch.column(col),
                "pr": pa.array(pr, pa.float64()),
            })

    return ds.map_batches(_Rank, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=0.5)


def grouped_mode(ds: ray.data.Dataset, group_col: str,
                 col: str) -> pd.DataFrame:
    """Most frequent value per group, ties broken by smallest value —
    deterministic (unlike SQL's unspecified ``mode()`` tie-break, the
    oracle spells the same ordering with a window). Partial (group,
    value) counts shrink each block to its distinct pairs; the driver
    folds ``O(blocks × distinct)`` rows. Output: (group, mode_value,
    mode_count)."""

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([group_col, col], as_index=False).agg(
            _cnt=(col, "size"))

    merged = (ds.map_batches(partial_counts, batch_format="pandas")
              .to_pandas().groupby([group_col, col], as_index=False)[
                  "_cnt"].sum())
    merged = merged.sort_values([group_col, "_cnt", col],
                                ascending=[True, False, True])
    out = merged.drop_duplicates(subset=[group_col], keep="first")
    out = out.rename(columns={col: "mode_value", "_cnt": "mode_count"})
    out["mode_count"] = out["mode_count"].astype("int64")
    return out.reset_index(drop=True)


def weighted_sample_aes(ds: ray.data.Dataset, k: int = 100,
                        weight_col: str = "n_chars",
                        id_col: str = "doc_id") -> "pd.DataFrame":
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): keep the k rows with the largest
    ``u^(1/w)`` ⇔ largest ``ln(u)/w``, where u is a fixed multiplicative
    hash of the id (Knuth 2654435761 mod 2^32, +0.5 to stay inside
    (0,1)) — reproducible across engines, so a SQL oracle can replay
    the exact selection. Rows with weight ≤ 0 are excluded.

    Distributed shape (the textbook A-ES reduction): each block emits
    ONLY its local top-k by key (map-only, no shuffle); the driver
    merges O(blocks × k) skinny rows and takes the global top-k.
    Requires ``id × 2654435761`` to fit int64 (ids < ~3.5e9).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        w = np.asarray(batch.column(weight_col), dtype=np.float64)
        mask = w > 0
        ids, w = ids[mask], w[mask]
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             weight_col: pa.array([], pa.int64()),
                             "_key": pa.array([], pa.float64())})
        u = ((ids * 2654435761) % (1 << 32) + 0.5) / float(1 << 32)
        key = np.log(u) / w
        take = min(k, len(ids))
        top = np.argpartition(-key, take - 1)[:take]
        return pa.table({
            id_col: pa.array(ids[top]),
            weight_col: pa.array(
                np.asarray(batch.column(weight_col))[mask][top]),
            "_key": pa.array(key[top], pa.float64()),
        })

    parts = ds.select_columns([id_col, weight_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    parts = parts.sort_values(["_key", id_col],
                              ascending=[False, True], kind="stable")
    out = parts.head(k)[[id_col, weight_col]]
    return out.sort_values(id_col).reset_index(drop=True)


def grouped_split(ds: ray.data.Dataset, group_col: str,
                  train_pct: int = 80, salt: str = "") -> ray.data.Dataset:
    """Leakage-guarded train/test split: EVERY row of a group (e.g. all
    documents from one source/site) lands on the same side, so
    near-duplicates within a group can never straddle the split — the
    contamination rule corpus curation needs. Deterministic and
    map-only: the side is ``md5(salt+group)`` (first 8 hex digits as an
    integer, mod 100 < train_pct → 'train'), computed once per DISTINCT
    group value inside each block (groups ≪ rows; a per-block dict maps
    them back vectorized). No shuffle, no state, reproducible across
    runs and partitionings; the SQL oracle replays the identical rule
    with DuckDB's md5(). Output: input columns + ``split``."""
    import hashlib

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        uniq = b[group_col].astype(str).unique()
        side = {
            u: ("train"
                if int(hashlib.md5((salt + u).encode()).hexdigest()[:8],
                       16) % 100 < train_pct else "test")
            for u in uniq}
        return b.assign(split=b[group_col].astype(str).map(side))

    return ds.map_batches(tag, batch_format="pandas")


def chunk_text(ds: ray.data.Dataset, size: int = 512,
               overlap: int = 128, text_col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Overlapping fixed-window text chunking — the RAG/context-window
    segmentation step: chunk k covers chars ``[k·(size−overlap),
    k·(size−overlap)+size)``; the last chunk may be short; zero-length
    docs emit nothing (UNNEST semantics). Map-only and vectorized: one
    ``utf8_slice_codeunits`` kernel per chunk ordinal (bounded by the
    longest doc), numpy for the index arithmetic — the same economics
    as the span builder. Deterministic and SQL-replayable
    (``1 + ceil((len − size)/step)`` chunks via ``unnest(range(…))``).
    Output: (id, chunk_idx, start, chunk)."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column(id_col)
        text = pc.cast(batch.column(text_col), pa.string())
        nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = np.where(
            nchars == 0, 0,
            1 + np.maximum(0, -(-(nchars - size) // step)))
        total = int(counts.sum())
        parent = np.repeat(np.arange(len(batch), dtype=np.int64),
                           counts)
        starts = np.zeros(len(batch), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts,
                                                           counts)
        chunks = np.full(total, "", dtype=object)
        max_k = int(counts.max()) if len(counts) else 0
        for k in range(max_k):
            sel = np.flatnonzero(idx == k)
            if len(sel) == 0:
                continue
            sliced = pc.utf8_slice_codeunits(text, k * step,
                                             k * step + size)
            chunks[sel] = sliced.take(
                pa.array(parent[sel])).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: ids.take(pa.array(parent)),
            "chunk_idx": pa.array(idx),
            "start": pa.array(idx * step),
            "chunk": pa.array(chunks, pa.string()),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def bigram_pmi(ds: ray.data.Dataset, min_count: int = 5,
               k: int = 50, text_col: str = "text",
               num_buckets: int = 64) -> pd.DataFrame:
    """Collocation mining: top-``k`` adjacent-word bigrams by pointwise
    mutual information, ``pmi = ln((c_ab/n_big) / ((c_a/n_tok)·
    (c_b/n_tok)))``, bigrams with ``c_ab < min_count`` dropped.

    One pass emits per-block bigram AND unigram count partials
    (vectorized shift — no per-row Python); bigram partials combine in
    hash buckets (bigram vocabulary is corpus-sized), unigram counts
    fold driver-side (bounded vocabulary contract, as
    :func:`top_tokens`). Every count is an exact integer and each PMI
    is ONE double expression from five exact ints — the SQL oracle
    replays it verbatim; ties break (pmi desc, w1, w2)."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        t = t[t != ""].str.split(r"\s+")
        ex = t.explode()
        w2 = ex.groupby(level=0).shift(-1)
        keep = w2.notna()
        big = pd.DataFrame({"w1": ex[keep].to_numpy(),
                            "w2": w2[keep].to_numpy()})
        big = big.groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        h = pd.util.hash_pandas_object(big[["w1", "w2"]], index=False)
        big["_bb"] = (h % num_buckets).astype("int32")
        big["kind"] = "b"
        vc = ex.value_counts()
        u = pd.DataFrame({"w1": vc.index.to_numpy(), "w2": "",
                          "cnt": vc.to_numpy()})
        u["_bb"] = np.int32(-1)
        u["kind"] = "u"
        return pd.concat([big, u], ignore_index=True)

    parts = ds.map_batches(partials, batch_format="pandas",
                           batch_size=None).materialize()

    uni = (parts.map_batches(
        lambda b: b[b["kind"] == "u"][["w1", "cnt"]],
        batch_format="pandas", batch_size=None)
        .to_pandas().groupby("w1", as_index=False)["cnt"].sum())
    n_tok = int(uni["cnt"].sum())
    uni_map = dict(zip(uni["w1"], uni["cnt"].astype(int)))

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["kind"] == "b"]
        out = g.groupby(["w1", "w2"], as_index=False)["cnt"].sum()
        return out[out["cnt"] >= min_count]

    big = (parts.groupby("_bb")
           .map_groups(bucket_sum, batch_format="pandas").to_pandas())
    n_big = int(parts.map_batches(
        lambda b: pd.DataFrame(
            {"n": [int(b.loc[b["kind"] == "b", "cnt"].sum())]}),
        batch_format="pandas", batch_size=None)
        .to_pandas()["n"].sum())
    if big.empty:
        return pd.DataFrame({"w1": [], "w2": [], "cnt": [], "pmi": []})
    ca = big["w1"].map(uni_map).astype("int64")
    cb = big["w2"].map(uni_map).astype("int64")
    cab = big["cnt"].astype("int64")
    pmi = np.log((cab.to_numpy().astype(np.float64) * n_tok * n_tok)
                 / (float(n_big) * ca.to_numpy() * cb.to_numpy()))
    out = pd.DataFrame({"w1": big["w1"], "w2": big["w2"],
                        "cnt": cab, "pmi": pmi})
    out = out.sort_values(["pmi", "w1", "w2"],
                          ascending=[False, True, True]).head(k)
    return out.reset_index(drop=True)


def leakage_safe_split(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", train_pct: int = 80,
                       num_buckets: int = 64) -> ray.data.Dataset:
    """Duplicate-cluster-aware train/test split: all EXACT copies of a
    text land on the same side (the md5 rule of :func:`grouped_split`
    applied to the cluster ROOT = min doc id per distinct text, not to
    a pre-existing group column) — the split decontamination step when
    there is no source/site key to group by.

    One content-hash bucket shuffle of (hash, id) pairs co-locates
    each text's copies; the root, the md5 side, and every member's
    tag are computed in-bucket (nothing corpus-sized touches the
    driver, no second pass — the text itself never shuffles).
    Output: (doc_id, split).
    """
    import hashlib as _hl

    from .dedup import add_content_hash

    pairs = add_content_hash(ds, text_col).select_columns(
        ["content_hash", id_col])

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["content_hash"], index=False)
        return b.assign(_sb=(h % num_buckets).astype("int32"))

    def tag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        root = g.groupby("content_hash")[id_col].transform("min")
        uniq = root.unique()
        side = {
            r: ("train"
                if int(_hl.md5(str(r).encode()).hexdigest()[:8],
                       16) % 100 < train_pct else "test")
            for r in uniq}
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "split": root.map(side).to_numpy()})

    return (pairs.map_batches(bucket, batch_format="pandas",
                              batch_size=None)
            .groupby("_sb").map_groups(tag_bucket,
                                       batch_format="pandas"))


def zipf_fit(ds: ray.data.Dataset, k: int = 500,
             text_col: str = "text") -> pd.DataFrame:
    """Zipf's-law fit of the corpus token-frequency distribution: OLS
    slope/intercept of ln(count) on ln(rank) over the top-k tokens —
    the natural-language sanity check of a crawled corpus (English
    web text sits near slope −1; boilerplate/spam corpora flatten or
    steepen it).

    Rides :func:`top_tokens` (per-block Counter partials, one
    token-hash bucket shuffle, deterministic (count desc, token)
    tie-break), so only O(buckets·k) rows ever reach the driver; the
    fit itself is O(k) driver arithmetic with ``math.fsum`` — the
    closed-form OLS expression is replayed term-for-term by the SQL
    oracle (transcendental ln sums carry the documented few-ULP
    gate). Output: one row (n_terms, zipf_slope, zipf_intercept).
    """
    import math

    top = top_tokens(ds, k=k, text_col=text_col)
    n = len(top)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(np.float64))
    sx, sy = math.fsum(x), math.fsum(y)
    sxy, sxx = math.fsum(x * y), math.fsum(x * x)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({"n_terms": pd.array([n], dtype="int64"),
                         "zipf_slope": [slope],
                         "zipf_intercept": [intercept]})


def source_drift_matrix(ds: ray.data.Dataset, group_col: str = "source",
                        text_col: str = "text",
                        k: int = 100) -> pd.DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    token distributions over the GLOBAL top-k vocabulary (Laplace
    α=1 smoothing on the vocabulary-restricted counts) — the corpus
    mixture-drift matrix that tells a crawl operator which feeds
    diverge.

    Scale shape: the vocabulary comes from :func:`top_tokens` (one
    bucketed exact histogram), broadcasts once as a set, and the
    per-(source, token) counts are map-only O(blocks·S·k) partials —
    the driver only ever folds the S×k count matrix and the S(S−1)/2
    pair formula (both bounded by construction, never corpus-sized).
    Exact integer counts; each JSD is the closed-form float expression
    the SQL oracle replays term-for-term (6-decimal round). Output:
    (source_a, source_b, jsd) for source_a < source_b.
    """
    import math

    import ray as _ray

    top = top_tokens(ds, k=k, text_col=text_col)
    vocab = top["token"].tolist()
    K = len(vocab)
    vref = _ray.put(set(vocab))

    def partial(batch: pa.Table) -> pa.Table:
        vs = _ray.get(vref)
        counts: dict = {}
        for s, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            if not t:
                continue
            c = counts.setdefault(s, Counter())
            for w in t.lower().split():
                if w in vs:
                    c[w] += 1
        srcs, toks, ns = [], [], []
        for s, c in counts.items():
            for w, n in c.items():
                srcs.append(s)
                toks.append(w)
                ns.append(n)
        return pa.table({group_col: pa.array(srcs, pa.string()),
                         "token": pa.array(toks, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    # sources present in the table (even with zero vocab hits)
    def distinct_src(batch: pa.Table) -> pa.Table:
        u = pa.table({group_col: batch.column(group_col)}) \
            .group_by(group_col).aggregate([])
        return u

    srcs = (ds.map_batches(distinct_src, batch_format="pyarrow")
            .to_pandas()[group_col].drop_duplicates().sort_values()
            .tolist())
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = (parts.groupby([group_col, "token"])["n"].sum()
         .unstack(fill_value=0)
         .reindex(index=srcs, columns=vocab, fill_value=0))
    C = c.to_numpy("int64")
    ns = C.sum(axis=1)
    P = (C + 1.0) / (ns + K)[:, None]
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            p, q = P[i], P[j]
            m = (p + q) / 2
            terms = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
            rows.append((srcs[i], srcs[j],
                         round(math.fsum(terms), 6)))
    return pd.DataFrame(rows,
                        columns=["source_a", "source_b", "jsd"])


def oov_rate(ds: "ray.data.Dataset", vocab_k: int = 500,
             text_col: str = "text", id_col: str = "doc_id",
             num_buckets: int = 64) -> pd.DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-k
    token vocabulary — the tokenizer-coverage QA that flags docs a
    fixed vocab would shred into rare pieces (code, other languages,
    mangled encodings).

    Two passes over the token stream: the bucketed exact top-k
    histogram (:func:`top_tokens`, deterministic (count desc, token)
    tie-break) fixes the vocabulary, which broadcasts as ONE frozen
    set into a map-only scoring pass (O(vocab) shipped once per task,
    never per row). ``oov_rate`` = exact n_oov / n_tokens; token-less
    docs are excluded to mirror the SQL twin's WHERE. Output:
    (doc_id, n_tokens, n_oov, oov_rate) sorted by doc_id.
    """
    vocab = frozenset(top_tokens(ds.select_columns([text_col]),
                                 k=vocab_k,
                                 text_col=text_col,
                                 num_buckets=num_buckets)["token"])

    def score(batch: pa.Table) -> pa.Table:
        ids, n_tok, n_oov = [], [], []
        texts = batch.column(text_col).to_pylist()
        for i, t in zip(batch.column(id_col).to_pylist(), texts):
            toks = t.lower().split() if t else []
            if not toks:
                continue
            ids.append(i)
            n_tok.append(len(toks))
            n_oov.append(sum(1 for w in toks if w not in vocab))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
        })

    out = ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow").to_pandas()
    out["oov_rate"] = out["n_oov"].to_numpy(np.float64) \
        / out["n_tokens"].to_numpy(np.float64)
    return out.sort_values("doc_id").reset_index(drop=True)


def token_entropy(ds: "ray.data.Dataset", text_col: str = "text",
                  num_buckets: int = 64) -> pd.DataFrame:
    """Shannon entropy (nats) and perplexity of the corpus unigram
    token distribution — the one-number vocabulary-diversity gauge
    (low entropy = template spam, near-ln(V) = uniform noise).

    ``H = ln N − (Σ c·ln c)/N`` needs only additive statistics over
    the EXACT per-token counts, which exist per token-hash bucket
    after one skinny shuffle: each bucket emits (Σc, vocab, Σ c·ln c)
    — O(buckets) driver rows, the c·ln c fold token-sorted fsum for
    determinism. Output one row: (n_tokens, vocab_size, entropy_nats,
    perplexity).
    """
    import math

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if t:
                c.update(t.lower().split())
        if not c:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_tbucket": pa.array([], pa.int32())})
        toks = list(c.keys())
        buckets = (hash64_batch(toks)
                   % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[t] for t in toks], pa.int64()),
            "_tbucket": pa.array(buckets),
        })

    def bucket_stats(group: pd.DataFrame) -> pd.DataFrame:
        merged = group.groupby("token", as_index=False)["n"].sum()
        merged = merged.sort_values("token")
        n = merged["n"].to_numpy(np.float64)
        h = float(math.fsum((n * np.log(n)).tolist()))
        return pd.DataFrame({"N": [int(merged["n"].sum())],
                             "V": [len(merged)], "H": [h],
                             "_k": [str(group["_tbucket"].iloc[0])]})

    parts = (ds.select_columns([text_col])
             .map_batches(partial_counts, batch_format="pyarrow")
             .groupby("_tbucket").map_groups(bucket_stats,
                                             batch_format="pandas")
             .to_pandas())
    parts = parts.sort_values("_k")
    n_total = int(parts["N"].sum())
    vocab = int(parts["V"].sum())
    h_sum = float(math.fsum(parts["H"].tolist()))
    ent = math.log(n_total) - h_sum / n_total
    return pd.DataFrame({
        "n_tokens": pd.Series([n_total], dtype="int64"),
        "vocab_size": pd.Series([vocab], dtype="int64"),
        "entropy_nats": [ent],
        "perplexity": [math.exp(ent)],
    })


def heaps_curve(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id",
                num_buckets: int = 64) -> pd.DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: cumulative token count
    and cumulative DISTINCT-token count after each document in
    ``id_col`` order — the scaling diagnostic that says whether a
    corpus keeps paying new vocabulary per TB or has gone stale
    (V ≈ K·Nᵝ, β≈0.5 organic, β→0 templated).

    Two distributed passes share one tokenize: per-doc token counts
    (map-only additive) and each token's FIRST-occurrence doc (min
    over doc ids, one token-hash bucket shuffle — all copies of a
    token co-locate). Both collapse to O(docs) skinny rows whose
    driver cumsum is exact int64. Output: (doc_id, n_tokens_cum,
    vocab_cum) for every token-bearing doc, sorted by doc_id.
    """
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        keep = t != ""
        toks = t[keep].str.lower().str.split(r"\s+", regex=True)
        out = pd.DataFrame({id_col: b.loc[keep, id_col],
                            "token": toks}).explode("token")
        return out[[id_col, "token"]]

    tokens = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=None).materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(id_col, as_index=False).agg(
            nt=("token", "size"))

    from .relational import partial_groupby

    per_doc = partial_groupby(tokens, [id_col], count_partial, ["nt"])

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        agg = b.groupby("token", as_index=False)[id_col].min()
        h = pd.util.hash_pandas_object(agg["token"], index=False)
        agg["_tb"] = (h % num_buckets).astype("int32")
        return agg

    def first_final(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("token", as_index=False)[id_col].min()
        vc = f.groupby(id_col, as_index=False).size()
        return pd.DataFrame({id_col: vc[id_col],
                             "nv": vc["size"].astype("int64")})

    newv = (tokens.map_batches(first_partial, batch_format="pandas",
                               batch_size=None)
            .groupby("_tb").map_groups(first_final,
                                       batch_format="pandas")
            .to_pandas())
    newv = newv.groupby(id_col, as_index=False)["nv"].sum()

    out = per_doc.sort_values(id_col).reset_index(drop=True)
    out = out.merge(newv, on=id_col, how="left").fillna({"nv": 0})
    out["n_tokens_cum"] = out["nt"].astype("int64").cumsum()
    out["vocab_cum"] = out["nv"].astype("int64").cumsum()
    out[id_col] = out[id_col].astype("int64")
    return out[[id_col, "n_tokens_cum", "vocab_cum"]]


def stratified_quota_split(ds: "ray.data.Dataset",
                           group_col: str = "source",
                           id_col: str = "doc_id",
                           val_tenths: int = 1,
                           test_tenths: int = 1,
                           num_buckets: int = 64) -> "pd.DataFrame":
    """Three-way train/val/test split with EXACT per-stratum quotas:
    within each group, docs rank by ``(md5(id), id)`` — a stateless
    pseudo-random order any worker can replay — and the first
    ``n − n·val/10 − n·test/10`` go to train, the next ``n//10·val``
    to val, the rest to test. Quotas are exact integer floors per
    stratum (no global randomness, no drift between runs), so every
    group is represented in every split at the promised proportion.

    One group-hash shuffle (a group's docs rank whole in its
    bucket); only (group, id) pairs move. Output: (id, split),
    sorted by id.
    """
    import hashlib

    import pandas as pd

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "_g": b[group_col],
            "_id": b[id_col].astype("int64")})
        out["_h"] = [hashlib.md5(str(i).encode()).hexdigest()
                     for i in out["_id"]]
        hb = pd.util.hash_pandas_object(out["_g"].astype(str),
                                        index=False)
        out["_gb"] = (hb % num_buckets).astype("int32")
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, gh in group.groupby("_g"):
            gh = gh.sort_values(["_h", "_id"], kind="stable")
            n = len(gh)
            n_val = (n // 10) * val_tenths
            n_test = (n // 10) * test_tenths
            n_train = n - n_val - n_test
            split = ["train"] * n_train + ["val"] * n_val \
                + ["test"] * n_test
            rows.append(pd.DataFrame({"_id": gh["_id"].to_numpy(),
                                      "split": split}))
        if not rows:
            return pd.DataFrame({"_id": pd.Series([], dtype="int64"),
                                 "split": pd.Series([],
                                                    dtype="object")})
        return pd.concat(rows, ignore_index=True)

    out = (ds.select_columns([group_col, id_col])
           .map_batches(tag, batch_format="pandas", batch_size=None)
           .groupby("_gb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "split": pd.Series([], dtype="object")})
    out = out.rename(columns={"_id": id_col})
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def token_budget_sample(ds: ray.data.Dataset, budget: int,
                        key_col: str = "n_chars",
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """Global token-budget curation: keep documents in quality order
    (``key_col`` DESC, id ASC) while the INCLUSIVE running token total
    stays ≤ ``budget`` — the "fill the training budget with the best
    docs first" cutoff.

    A global prefix sum over a total order normally means a global
    sort; this avoids it with a two-phase threshold find: (1) one
    partial-agg pass folds per-``key_col``-value token sums (driver
    holds O(distinct key values), skinny); the driver walks the sorted
    histogram to the BOUNDARY key value where the budget crosses;
    (2) only the boundary group's (id, tokens) rows are pulled (one
    filtered pass, O(boundary group)) to resolve the id tie-break
    exactly. A final broadcast map emits the kept rows — the corpus
    itself never sorts and never shuffles.

    Exact-int semantics (token counts are ints) → hash-exact vs the
    SQL window twin ``sum() OVER (ORDER BY key DESC, id) ≤ budget``.
    Output: kept (id, key, tokens) rows."""
    from .relational import partial_groupby

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(key_col, as_index=False)[[tokens_col]].sum()

    hist = partial_groupby(
        ds.select_columns([key_col, tokens_col]), [key_col],
        batch_agg, [tokens_col])
    hist = hist.sort_values(key_col, ascending=False)
    cut_key = None
    run = 0
    for k, t in zip(hist[key_col], hist[tokens_col]):
        if run + int(t) > budget:
            cut_key = k
            break
        run += int(t)
    if cut_key is None:          # whole corpus fits
        return ds.select_columns([id_col, key_col, tokens_col])

    remaining = budget - run
    boundary = ds.map_batches(
        lambda b, v=cut_key: b.filter(
            pa.compute.equal(b[key_col], v)),
        batch_format="pyarrow").select_columns(
        [id_col, tokens_col]).to_pandas().sort_values(id_col)
    cum = boundary[tokens_col].astype("int64").cumsum()
    fit = boundary[cum <= remaining]
    cut_id = int(fit[id_col].max()) if len(fit) else None

    def keep(b: pa.Table) -> pa.Table:
        import numpy as np

        k = np.asarray(b.column(key_col), dtype=np.int64)
        i = np.asarray(b.column(id_col), dtype=np.int64)
        m = k > cut_key
        if cut_id is not None:
            m |= (k == cut_key) & (i <= cut_id)
        return pa.table({
            id_col: b.column(id_col).filter(pa.array(m)),
            key_col: b.column(key_col).filter(pa.array(m)),
            tokens_col: b.column(tokens_col).filter(pa.array(m)),
        })

    return ds.select_columns([id_col, key_col, tokens_col]) \
        .map_batches(keep, batch_format="pyarrow")


def greedy_source_cover(ds: ray.data.Dataset, k: int = 5,
                        group_col: str = "source",
                        text_col: str = "text",
                        gram_k: int = 3) -> pd.DataFrame:
    """Greedy max-coverage source selection: pick ``k`` sources that
    greedily maximize DISTINCT word-``gram_k``-gram coverage — the
    classic (1−1/e) set-cover heuristic, here as the data-mixture
    question "which sources buy the most distinctive content?".
    ``gram_k=1`` degrades to plain vocabulary coverage (degenerate
    when sources share one vocabulary — the 3-gram default measures
    phrasal/content diversity instead).

    Scale shape: one pass reduces the corpus to DISTINCT
    (source, token) pairs (skinny, hash-deduped per block then
    globally); each greedy step is one map-only marginal-coverage
    count over the pairs with the covered-token set broadcast
    (``ray.put`` once per step), a tiny partial-groupby argmax, and
    one filtered pass to pull the winner's new tokens. k steps total;
    nothing corpus-sized on the driver except the covered-vocabulary
    set itself (at 100 TB swap the exact set for a counting bloom —
    the op's only corpus-growing state, and it grows with VOCABULARY,
    not rows). Ties: (new_tokens desc, source asc). Sources with zero
    marginal gain are never picked; fewer than k eligible sources
    ends early.

    Output: (rank, source, new_tokens, total_covered) — the greedy
    trace, replayed exactly by the recursive-CTE SQL twin."""

    def to_pairs(batch: pa.Table) -> pa.Table:
        seen = set()
        for src, txt in zip(batch.column(group_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            ws = (txt or "").lower().split()
            for i in range(len(ws) - gram_k + 1):
                seen.add((src, " ".join(ws[i:i + gram_k])))
        return pa.table({
            group_col: pa.array([s for s, _ in seen], pa.string()),
            "tok": pa.array([t for _, t in seen], pa.string()),
        })

    pairs = (ds.select_columns([group_col, text_col])
             .map_batches(to_pairs, batch_format="pyarrow")
             .groupby([group_col, "tok"]).count()
             .select_columns([group_col, "tok"])
             .materialize())

    covered: set = set()
    chosen: list[str] = []
    rows = []
    for rank in range(1, k + 1):
        cref = ray.put((covered, set(chosen)))

        def marginal(batch: pa.Table, _cref=cref) -> pa.Table:
            cov, taken = ray.get(_cref)
            cnt: dict = {}
            for s, t in zip(batch.column(group_col).to_pylist(),
                            batch.column("tok").to_pylist()):
                if s not in taken and t not in cov:
                    cnt[s] = cnt.get(s, 0) + 1
            return pa.table({
                group_col: pa.array(list(cnt.keys()), pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64())})

        parts = pairs.map_batches(
            marginal, batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        gains = parts.groupby(group_col, as_index=False)["n"].sum()
        gains = gains[gains["n"] > 0]
        if gains.empty:
            break
        gains = gains.sort_values(["n", group_col],
                                  ascending=[False, True])
        winner = str(gains.iloc[0][group_col])
        new_n = int(gains.iloc[0]["n"])

        wref = ray.put((winner, covered))

        def winner_toks(batch: pa.Table, _wref=wref) -> pa.Table:
            w, cov = ray.get(_wref)
            toks = [t for s, t in zip(
                batch.column(group_col).to_pylist(),
                batch.column("tok").to_pylist())
                if s == w and t not in cov]
            return pa.table({"tok": pa.array(toks, pa.string())})

        new_toks = [r["tok"] for r in pairs.map_batches(
            winner_toks, batch_format="pyarrow").take_all()]
        covered.update(new_toks)
        chosen.append(winner)
        rows.append((rank, winner, new_n, len(covered)))

    return pd.DataFrame(rows, columns=[
        "rank", group_col, "new_tokens", "total_covered"]).astype(
        {"rank": "int64", "new_tokens": "int64",
         "total_covered": "int64"})


def curriculum_schedule(ds: ray.data.Dataset,
                        key_col: str = "n_chars",
                        id_col: str = "doc_id",
                        n_bins: int = 10) -> ray.data.Dataset:
    """Deterministic curriculum training order: rank docs easy→hard by
    ``(key_col, id)``, cut the ranking into ``n_bins`` difficulty bins
    (``bin = rank·n_bins // n`` — the explicit remainder rule, not
    NTILE's), and schedule round-robin ACROSS bins (sched order =
    (position-within-bin, bin)) so every training window sees the
    full difficulty spectrum — the standard anti-curriculum-collapse
    interleave.

    Global ranking WITHOUT a global sort: one skinny partial-agg pass
    folds the per-``key_col``-value count histogram (driver holds
    O(distinct values)); exclusive prefix sums give each value's rank
    offset, broadcast once; one key-hash bucket shuffle of the skinny
    (key, id) pairs assigns within-value order by id and adds the
    offset. All arithmetic exact ints → hash-exact vs the window
    twin. Output: (id, key, bin, pos_in_bin, sched_rank)."""
    from .relational import partial_groupby
    from .windows import _add_key_bucket

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(key_col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    hist = partial_groupby(
        ds.select_columns([key_col]), [key_col], batch_agg, ["n"])
    hist = hist.sort_values(key_col)
    total = int(hist["n"].sum())
    offs = dict(zip(hist[key_col],
                    hist["n"].cumsum().shift(fill_value=0).astype(int)))
    oref = ray.put((offs, total, n_bins))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        offsets, n, bins = ray.get(oref)
        g = group.sort_values([key_col, id_col],
                              kind="stable").reset_index(drop=True)
        within = g.groupby(key_col, sort=False).cumcount().to_numpy()
        rank = np.array([offsets[k] for k in g[key_col]],
                        dtype=np.int64) + within
        b = rank * bins // n
        # position within bin = rank − bin start; bin b starts at
        # ceil(b·n/bins) (the first rank r with r·bins//n == b)
        start = -(-b * n // bins)     # ceil division on ints
        pos = rank - start
        sched = pos * bins + b
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            key_col: g[key_col].astype("int64"),
            "bin": pd.Series(b, dtype="int64"),
            "pos_in_bin": pd.Series(pos, dtype="int64"),
            "sched_rank": pd.Series(sched, dtype="int64"),
        })

    return (_add_key_bucket(ds.select_columns([key_col, id_col]),
                            key_col, 64)
            .groupby("_sbucket")
            .map_groups(per_bucket, batch_format="pandas"))


def padding_waste(ds: ray.data.Dataset,
                  tokens_col: str = "n_tokens",
                  id_col: str = "doc_id",
                  bucket_width: int = 64,
                  batch_rows: int = 16) -> pd.DataFrame:
    """Length-bucketed batching padding audit: docs are grouped into
    length buckets of ``bucket_width`` tokens, batches of
    ``batch_rows`` form within each bucket in (tokens desc, id)
    order, and every batch pads to its own max — the audit reports,
    per bucket, how many pad tokens that scheme burns (the
    length-bucketing-vs-padding trade every trainer tunes).

    One key-hash bucket shuffle of skinny (id, tokens) rows; per
    length bucket the batch structure is a vectorized reshape (sort,
    index // batch_rows, per-batch max). Exact ints → hash-exact vs
    the window twin. Output: (bucket, n_docs, n_batches, sum_tokens,
    pad_tokens)."""
    from .windows import _add_key_bucket

    def to_bucket(b: pa.Table) -> pa.Table:
        toks = np.asarray(b.column(tokens_col), dtype=np.int64)
        return pa.table({
            id_col: b.column(id_col),
            tokens_col: pa.array(toks, pa.int64()),
            "_lb": pa.array(toks // bucket_width, pa.int64()),
        })

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lb, d in group.groupby("_lb", sort=False):
            d = d.sort_values([tokens_col, id_col],
                              ascending=[False, True])
            t = d[tokens_col].to_numpy(dtype=np.int64)
            idx = np.arange(len(t)) // batch_rows
            nb = int(idx[-1]) + 1 if len(t) else 0
            pad = 0
            for s in range(nb):
                seg = t[idx == s]
                pad += int(seg.max()) * len(seg) - int(seg.sum())
            rows.append((int(lb), len(t), nb, int(t.sum()), pad))
        return pd.DataFrame(rows, columns=[
            "bucket", "n_docs", "n_batches", "sum_tokens",
            "pad_tokens"]).astype("int64")

    out = (_add_key_bucket(
        ds.select_columns([id_col, tokens_col]).map_batches(
            to_bucket, batch_format="pyarrow"), "_lb", 32)
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas())
    return out.sort_values("bucket").reset_index(drop=True)


def shuffle_run_lengths(ds: ray.data.Dataset,
                        group_col: str = "source",
                        key_col: str = "doc_id",
                        seed: int = 0,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Shuffle-quality audit: histogram of CONSECUTIVE same-``group``
    run lengths in deterministic epoch-shuffle order — the "did the
    shuffle actually interleave sources?" check every training-data
    pipeline should run (source clumps = correlated gradients).

    Global adjacency without a global sort: the shuffle key is a
    bijective multiplicative permutation (see :func:`epoch_shuffle`),
    so its TOP BITS range-partition the shuffled order into
    contiguous segments. One bucket-hash shuffle of skinny
    (key, group) rows; each segment sorts locally and emits its
    INTERIOR run histogram plus one boundary row (first/last group +
    run lengths, single-run flag); the driver stitches adjacent
    segments exactly like a chunked phrase scan stitches junctions —
    O(buckets) driver work, runs crossing any number of segment
    boundaries merge correctly. Exact ints → hash-exact vs the
    gaps-and-islands window twin. Output: (run_length, n_runs)."""
    from collections import Counter

    mult = np.uint64(_SHUFFLE_MULT)
    s_ = np.uint64(seed % (1 << 64))
    bits = max(1, int(num_buckets - 1).bit_length())
    shift = np.uint64(64 - bits)

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key_col), dtype=np.uint64)
        key = (ids + s_) * mult
        return pa.table({
            "_sk": pa.array(key, pa.uint64()),
            group_col: batch.column(group_col),
            "_rb": pa.array((key >> shift).astype(np.int64)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_sk", kind="stable")
        grp = g[group_col].tolist()
        runs = []
        cur, n = grp[0], 1
        for x in grp[1:]:
            if x == cur:
                n += 1
            else:
                runs.append((cur, n))
                cur, n = x, 1
        runs.append((cur, n))
        b = int(g["_rb"].iloc[0])
        rows = [("edge", b, runs[0][0], runs[0][1],
                 runs[-1][0], runs[-1][1], int(len(runs) == 1), 0, 0)]
        inner = Counter(n for _, n in runs[1:-1])
        for ln, c in sorted(inner.items()):
            rows.append(("hist", b, "", 0, "", 0, 0, ln, c))
        return pd.DataFrame(rows, columns=[
            "kind", "bucket", "g1", "n1", "g2", "n2", "single",
            "len", "cnt"])

    parts = (ds.select_columns([key_col, group_col])
             .map_batches(per_batch, batch_format="pyarrow")
             .groupby("_rb")
             .map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    hist: Counter = Counter()
    for _, r in parts[parts["kind"] == "hist"].iterrows():
        hist[int(r["len"])] += int(r["cnt"])
    edges = parts[parts["kind"] == "edge"].sort_values("bucket")
    pend_g, pend_n = None, 0
    for _, e in edges.iterrows():
        first_g, first_n = e["g1"], int(e["n1"])
        last_g, last_n = e["g2"], int(e["n2"])
        if pend_g is not None and pend_g == first_g:
            first_n += pend_n          # boundary run continues
        elif pend_g is not None:
            hist[pend_n] += 1          # pending run ends at boundary
        if e["single"]:
            pend_g, pend_n = first_g, first_n
        else:
            hist[first_n] += 1
            pend_g, pend_n = last_g, last_n
    if pend_g is not None:
        hist[pend_n] += 1
    out = pd.DataFrame(sorted(hist.items()),
                       columns=["run_length", "n_runs"])
    return out.astype({"run_length": "int64", "n_runs": "int64"})
