"""Change-data-capture merge (the lakehouse MERGE/upsert): apply a
changelog of (key, version, op, payload) rows to a base snapshot and
emit the new snapshot.

Semantics (SCD-type-1, latest-wins):
  - for each key, the highest-version changelog row decides:
    ``op='u'`` (upsert) → its payload is the key's new row;
    ``op='d'`` (delete) → the key disappears;
  - keys with no changelog row keep their base row;
  - changelog rows for keys absent from the base INSERT (when their
    final op is 'u').

Scale shape: base and changelog are tagged and unioned, then ONE
hash(key)-bucketed shuffle co-locates each key's base row and all its
changelog rows; the per-bucket resolution is a vectorized pandas
sort + drop_duplicates (no per-key groups, no driver state). This is
the same exchange count as a single hash join — at 100 TB the base
never moves twice and the (usually much smaller) changelog rides the
same shuffle.

Version ties break deterministically toward the changelog row with
the lexicographically-largest op then payload — callers should use
unique versions (commit LSNs); the tie rule only pins the test oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.urls import hash64_batch


def _tag_bucket(ds: ray.data.Dataset, key_col: str, num_buckets: int,
                is_base: bool, payload_cols: list[str],
                version_col: str, op_col: str) -> ray.data.Dataset:
    def tag(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        keys = df[key_col]
        if pd.api.types.is_integer_dtype(keys):
            bk = (keys.to_numpy(np.uint64) % np.uint64(num_buckets)
                  ).astype(np.int32)
        else:
            bk = (hash64_batch([str(v) for v in keys])
                  % np.uint64(num_buckets)).astype(np.int32)
        out = pd.DataFrame({key_col: keys})
        for c in payload_cols:
            out[c] = df[c]
        if is_base:
            out["_ver"] = np.int64(-1)
        else:
            ver = df[version_col].astype("int64")
            # base rows carry the sentinel _ver=-1; a changelog version
            # <= -1 would silently lose latest-wins to the base row, so
            # the commit-LSN >= 0 assumption must hold — validate it
            if len(ver) and int(ver.min()) < 0:
                raise ValueError(
                    f"cdc_merge: changelog {version_col} must be >= 0 "
                    f"(commit LSNs); got min {int(ver.min())}")
            out["_ver"] = ver
        out["_op"] = "u" if is_base else df[op_col].astype(str)
        out["_cb"] = bk
        return out

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None)


def cdc_merge(base: ray.data.Dataset, changes: ray.data.Dataset,
              key_col: str, payload_cols: list[str],
              version_col: str = "version", op_col: str = "op",
              num_buckets: int = 64) -> ray.data.Dataset:
    """Apply ``changes`` to ``base`` → the new snapshot Dataset with
    columns (key, *payload_cols). See module docstring for semantics."""
    tagged_base = _tag_bucket(base, key_col, num_buckets, True,
                              payload_cols, version_col, op_col)
    tagged_chg = _tag_bucket(changes, key_col, num_buckets, False,
                             payload_cols, version_col, op_col)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        # latest version wins; base rows carry _ver=-1 so any
        # changelog row outranks the base
        g = group.sort_values([key_col, "_ver", "_op"]
                              + payload_cols, kind="stable")
        last = g.drop_duplicates(key_col, keep="last")
        keep = last[last["_op"] != "d"]
        return keep[[key_col] + payload_cols].reset_index(drop=True)

    return (tagged_base.union(tagged_chg)
            .groupby("_cb").map_groups(resolve, batch_format="pandas"))


def ivm_groupby_update(base_agg: ray.data.Dataset,
                       changelog: ray.data.Dataset, key_col: str,
                       n_col: str = "n", sum_col: str = "s",
                       value_col: str = "value", op_col: str = "op",
                       num_buckets: int = 64) -> ray.data.Dataset:
    """Incremental view maintenance of a keyed (count, sum) aggregate:
    fold a changelog of ``op ∈ {'i','d'}`` rows into an existing
    materialized aggregate WITHOUT rescanning the base table — the
    maintenance step that keeps a 100-TB corpus's per-key statistics
    current from each day's delta instead of re-aggregating the world
    (count and sum are self-maintainable: inserts add, deletes
    subtract; avg/ratio views derive downstream).

    Scale shape: the changelog — O(delta), not O(base) — collapses to
    signed per-key (Δn, Δsum) partials block-locally (map-only); the
    partials union with the O(keys) base aggregate (schemas aligned
    block-by-block, both sides cast to int64) and ONE key-hash bucket
    shuffle finishes the merge. Keys whose count reaches 0 leave the
    view (matching a GROUP BY recompute); keys born in the delta
    enter it. The result is bit-equal to the full recompute the SQL
    twin runs — that equality IS the IVM correctness claim.

    Returns a Dataset of (key_col, n_col, sum_col), distributed."""

    def delta_partial(b: pd.DataFrame) -> pd.DataFrame:
        sign = np.where(b[op_col].to_numpy() == "d", -1, 1) \
            .astype(np.int64)
        v = b[value_col].to_numpy(np.int64)
        g = pd.DataFrame({key_col: b[key_col],
                          n_col: sign, sum_col: sign * v})
        return g.groupby(key_col, as_index=False)[
            [n_col, sum_col]].sum()

    def align(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: b[key_col]})
        out[n_col] = b[n_col].astype("int64")
        out[sum_col] = b[sum_col].astype("int64")
        return out

    delta = changelog.select_columns(
        [key_col, value_col, op_col]).map_batches(
        delta_partial, batch_format="pandas", batch_size=None) \
        .map_batches(align, batch_format="pandas", batch_size=None)
    base = base_agg.select_columns(
        [key_col, n_col, sum_col]).map_batches(
        align, batch_format="pandas", batch_size=None)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[key_col]
        if pd.api.types.is_integer_dtype(keys):
            bk = (keys.to_numpy(np.uint64) % np.uint64(num_buckets)
                  ).astype(np.int32)
        else:
            bk = (hash64_batch([str(v) for v in keys])
                  % np.uint64(num_buckets)).astype(np.int32)
        return b.assign(_ib=bk)

    def combine(g: pd.DataFrame) -> pa.Table:
        key_t = (pa.int64()
                 if pd.api.types.is_integer_dtype(g[key_col])
                 else pa.string())
        schema = pa.schema([(key_col, key_t), (n_col, pa.int64()),
                            (sum_col, pa.int64())])
        out = g.groupby(key_col, as_index=False)[
            [n_col, sum_col]].sum()
        out = out[out[n_col] > 0]            # empty keys leave the view
        if out.empty:
            # typed empty table: an all-empty pandas block would drop
            # the output schema entirely (all-deleted-view case)
            return schema.empty_table()
        return pa.Table.from_arrays(
            [pa.array(out[key_col].tolist(), key_t),
             pa.array(out[n_col].to_numpy(np.int64)),
             pa.array(out[sum_col].to_numpy(np.int64))],
            schema=schema)

    return (base.union(delta)
            .map_batches(add_bucket, batch_format="pandas",
                         batch_size=None)
            .groupby("_ib").map_groups(combine, batch_format="pandas"))
