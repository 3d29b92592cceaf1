"""One-pass distributed data-quality validation (expectations-lite).

Training-data pipelines gate every ingest behind constraint checks —
nulls, ranges, accepted values, key uniqueness, row-count bounds. At
100 TB the only affordable shape is: ONE map pass computing additive
per-block counters for every rule simultaneously (violations, nulls,
rows), a driver combine of O(blocks × rules) skinny rows, plus ONE
value-bucketed skinny shuffle for the uniqueness rules (duplicate
detection can't be block-local; all copies of a key meet in their
hash bucket, exactly like the engine's exact-dedup operator).

Rule forms (dicts):
    {"rule": "not_null",        "column": c}
    {"rule": "range",           "column": c, "min": lo, "max": hi}
    {"rule": "accepted_values", "column": c, "values": [...]}
    {"rule": "unique",          "column": c}

Output: one row per rule — (rule, column, n_rows, n_violations, ok).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def validate(ds: ray.data.Dataset, rules: list[dict],
             num_buckets: int = 32) -> pd.DataFrame:
    """Evaluate all rules in one pass (+ one skinny shuffle if any
    ``unique`` rule is present). Returns the per-rule report."""
    scan_rules = [r for r in rules if r["rule"] != "unique"]
    uniq_rules = [r for r in rules if r["rule"] == "unique"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        n = len(b)
        for i, r in enumerate(scan_rules):
            col = b[r["column"]]
            if r["rule"] == "not_null":
                viol = int(col.isna().sum())
            elif r["rule"] == "range":
                # SQL semantics: NULL compares to neither bound, so a
                # null row is NOT a range violation (use not_null too)
                bad = pd.Series(False, index=b.index)
                if "min" in r:
                    bad |= col < r["min"]
                if "max" in r:
                    bad |= col > r["max"]
                viol = int(bad.sum())
            elif r["rule"] == "accepted_values":
                viol = int((~col.isin(r["values"])).sum())
            else:  # pragma: no cover - guarded by rule split
                raise ValueError(r["rule"])
            rows.append({"_rid": i, "n_rows": n, "n_violations": viol})
        return pd.DataFrame(rows)

    report = []
    if scan_rules:
        parts = ds.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
        agg = parts.groupby("_rid")[["n_rows", "n_violations"]].sum()
        for i, r in enumerate(scan_rules):
            n_rows = int(agg.loc[i, "n_rows"])
            viol = int(agg.loc[i, "n_violations"])
            report.append({"rule": r["rule"], "column": r["column"],
                           "n_rows": n_rows, "n_violations": viol,
                           "ok": viol == 0})

    for r in uniq_rules:
        col = r["column"]

        def local_counts(b: pd.DataFrame, _c=col) -> pd.DataFrame:
            vc = b[_c].value_counts(dropna=False)
            out = pd.DataFrame({_c: vc.index, "_cnt": vc.to_numpy()})
            h = pd.util.hash_pandas_object(out[_c], index=False)
            out["_vb"] = (h % num_buckets).astype("int32")
            return out

        def per_bucket(group: pd.DataFrame, _c=col) -> pd.DataFrame:
            tot = group.groupby(_c, dropna=False)["_cnt"].sum()
            dups = tot[tot > 1]
            # violations = extra copies beyond the first of each key
            return pd.DataFrame({
                "n_rows": [int(tot.sum())],
                "n_violations": [int((dups - 1).sum())]})

        parts = (ds.map_batches(local_counts, batch_format="pandas",
                                batch_size=None)
                 .groupby("_vb").map_groups(per_bucket,
                                            batch_format="pandas")
                 .to_pandas())
        n_rows = int(parts["n_rows"].sum()) if len(parts) else 0
        viol = int(parts["n_violations"].sum()) if len(parts) else 0
        report.append({"rule": "unique", "column": col,
                       "n_rows": n_rows, "n_violations": viol,
                       "ok": viol == 0})

    out = pd.DataFrame(report)
    if not out.empty:
        out["n_rows"] = out["n_rows"].astype("int64")
        out["n_violations"] = out["n_violations"].astype("int64")
        out = out.sort_values(["rule", "column"]).reset_index(drop=True)
    return out


def fd_audit(ds: "ray.data.Dataset", lhs_col: str,
             rhs_col: str, num_buckets: int = 64) -> pd.DataFrame:
    """Functional-dependency audit: does ``lhs_col → rhs_col`` hold
    (every key maps to exactly one value)? The schema-inference /
    ingest-contract probe — "is each source monolingual", "does each
    SKU have one brand" — answered with an exact violation census
    instead of a sampled guess.

    Scale shape: each block reduces to its distinct (lhs, rhs) pairs;
    ONE lhs-hash bucket shuffle co-locates every pair of a key, so the
    per-key distinct-rhs count is exact in-bucket; each bucket then
    collapses to ONE summary partial (keys, violating keys, max
    variants, its top offender by the (variants desc, key asc) rule) —
    the driver folds O(buckets) rows, never O(keys). ``violation_rate``
    is the single float division of exact ints, replayed verbatim by
    the SQL twin. Output one row: (n_keys, n_violating,
    violation_rate, max_rhs_variants, top_key, top_key_variants)."""
    from .windows import _add_key_bucket

    def block_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return b[[lhs_col, rhs_col]].drop_duplicates()

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[lhs_col, rhs_col]].drop_duplicates()
        per_key = d.groupby(lhs_col, as_index=False).size() \
            .rename(columns={"size": "c"})
        per_key = per_key.sort_values(
            ["c", lhs_col], ascending=[False, True])
        top = per_key.iloc[0]
        return pd.DataFrame({
            "n_keys": pd.Series([len(per_key)], dtype="int64"),
            "n_violating": pd.Series(
                [int((per_key["c"] > 1).sum())], dtype="int64"),
            "max_c": pd.Series([int(top["c"])], dtype="int64"),
            "top_key": pd.Series([str(top[lhs_col])],
                                 dtype="object"),
            "top_c": pd.Series([int(top["c"])], dtype="int64")})

    parts = (_add_key_bucket(
        ds.select_columns([lhs_col, rhs_col]).map_batches(
            block_pairs, batch_format="pandas", batch_size=None),
        lhs_col, num_buckets)
        .groupby("_sbucket")
        .map_groups(bucket_summary, batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "n_keys": pd.Series([0], dtype="int64"),
            "n_violating": pd.Series([0], dtype="int64"),
            "violation_rate": pd.Series([float("nan")],
                                        dtype="float64"),
            "max_rhs_variants": pd.Series([0], dtype="int64"),
            "top_key": pd.Series([None], dtype="object"),
            "top_key_variants": pd.Series([0], dtype="int64")})
    n_keys = int(parts["n_keys"].sum())
    n_viol = int(parts["n_violating"].sum())
    # global top offender: (variants desc, key asc) over bucket tops
    tops = parts.sort_values(["top_c", "top_key"],
                             ascending=[False, True])
    return pd.DataFrame({
        "n_keys": pd.Series([n_keys], dtype="int64"),
        "n_violating": pd.Series([n_viol], dtype="int64"),
        "violation_rate": pd.Series(
            [float(n_viol) / float(n_keys)], dtype="float64"),
        "max_rhs_variants": pd.Series(
            [int(parts["max_c"].max())], dtype="int64"),
        "top_key": pd.Series([tops.iloc[0]["top_key"]],
                             dtype="object"),
        "top_key_variants": pd.Series(
            [int(tops.iloc[0]["top_c"])], dtype="int64")})
