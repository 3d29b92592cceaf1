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


def modal_predictor_kappa(ds: "ray.data.Dataset", key_col: str,
                          label_col: str,
                          num_buckets: int = 64) -> pd.DataFrame:
    """Cohen's kappa of the modal-label-per-key predictor — "if I
    routed every doc by its source's majority language, how much
    better than chance would I be?" The agreement-beyond-chance gauge
    for key→label routing rules (source→lang, host→topic), the honest
    version of :func:`fd_audit`'s binary verdict: a 99%-pure corpus
    scores κ ≈ 1 even though the FD technically fails.

    Predictor: each key's modal label with the (count DESC, label
    ASC) tie rule; applied back to every row of that key. κ is
    computed from the EXACT confusion matrix: ``po = agree/n``,
    ``pe = Σ_l pred_n(l)·true_n(l) / n²``, ``κ = (po−pe)/(1−pe)`` —
    every count an exact integer, the three floats mirrored
    operation-for-operation by the SQL twin (pe's numerator can
    outgrow int64 at ~3B rows; folded as Python ints).

    Scale shape: per-block additive (key, label, c) partials finish
    in ONE key-hash bucket shuffle; each bucket resolves its keys'
    modal labels locally and collapses to (pred, true, c) confusion
    partials + a keys-seen count, so the driver folds
    O(buckets × |labels|²) rows — never O(keys). Output one row:
    (n_rows, n_keys, agree, po, pe, kappa)."""
    from .windows import _add_key_bucket

    def block_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby([key_col, label_col], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby([key_col, label_col], as_index=False)["c"] \
            .sum()
        pred = tot.assign(_neg=-tot["c"]).sort_values(
            [key_col, "_neg", label_col], kind="stable") \
            .drop_duplicates(subset=[key_col]) \
            .set_index(key_col)[label_col]
        conf = pd.DataFrame({
            "pred": pred.reindex(tot[key_col]).to_numpy(),
            "true": tot[label_col].to_numpy(),
            "c": tot["c"].to_numpy()}) \
            .groupby(["pred", "true"], as_index=False)["c"].sum()
        conf["n_keys"] = 0
        head = pd.DataFrame({"pred": [""], "true": [""], "c": [0],
                             "n_keys": [len(pred)]})
        return pd.concat([head, conf], ignore_index=True)

    parts = (_add_key_bucket(
        ds.select_columns([key_col, label_col]).map_batches(
            block_counts, batch_format="pandas", batch_size=None),
        key_col, num_buckets)
        .groupby("_sbucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas())
    empty = pd.DataFrame({
        "n_rows": pd.Series([0], dtype="int64"),
        "n_keys": pd.Series([0], dtype="int64"),
        "agree": pd.Series([0], dtype="int64"),
        "po": pd.Series([float("nan")], dtype="float64"),
        "pe": pd.Series([float("nan")], dtype="float64"),
        "kappa": pd.Series([float("nan")], dtype="float64")})
    if parts.empty:
        return empty
    n_keys = int(parts["n_keys"].sum())
    conf = parts[parts["c"] > 0].groupby(
        ["pred", "true"], as_index=False)["c"].sum()
    if conf.empty:
        return empty
    n = int(conf["c"].sum())
    agree = int(conf.loc[conf["pred"] == conf["true"], "c"].sum())
    pred_m = {k: int(v) for k, v in
              conf.groupby("pred")["c"].sum().items()}
    true_m = {k: int(v) for k, v in
              conf.groupby("true")["c"].sum().items()}
    pe_num = sum(pred_m.get(l, 0) * true_m.get(l, 0)
                 for l in set(pred_m) | set(true_m))
    po = float(agree) / float(n)
    pe = float(pe_num) / (float(n) * float(n))
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 1.0
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype="int64"),
        "n_keys": pd.Series([n_keys], dtype="int64"),
        "agree": pd.Series([agree], dtype="int64"),
        "po": pd.Series([po], dtype="float64"),
        "pe": pd.Series([pe], dtype="float64"),
        "kappa": pd.Series([kappa], dtype="float64")})


def conformal_threshold(ds: ray.data.Dataset,
                        group_col: str = "event_type",
                        value_col: str = "value",
                        alpha: float = 0.1,
                        num_buckets: int = 32) -> "pd.DataFrame":
    """Split-conformal calibration threshold per group: the
    ``ceil((n+1)(1−α))``-th smallest absolute residual
    ``|value − mean(value)|`` within each group — the distribution-free
    quantile a conformal predictor uses so that a fresh residual
    exceeds it with probability ≤ α.

    Two passes, both skinny: (1) per-group (sum, count) partials fold
    to broadcast means (no shuffle of the values); (2) one key-hash
    bucket shuffle co-locates each group's residuals and an
    ``np.partition`` selects the order statistic per group (O(n), not
    a sort). The rank rule is exact-integer (``min(n, ceil((n+1)·
    (1−α)))``), and ties in ``|r|`` are value ties — the selected
    VALUE is invariant to their order — so the result hash-matches
    the SQL twin's ``row_number``-over-``abs(value−avg)`` replay.

    Output: (group, n, rank, threshold)."""
    import math

    from .relational import partial_groupby
    from .windows import _add_key_bucket

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(group_col, as_index=False).agg(
            s=(value_col, "sum"), n=(value_col, "size"))

    stats = partial_groupby(
        ds.select_columns([group_col, value_col]), [group_col],
        batch_agg, ["s", "n"])
    means = {g: float(s) / float(n)
             for g, s, n in zip(stats[group_col], stats["s"], stats["n"])}
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, d in group.groupby(group_col, sort=False):
            v = d[value_col].to_numpy(dtype=np.float64)
            r = np.abs(v - means[g])
            n = len(r)
            k = min(n, math.ceil((n + 1) * (1.0 - alpha)))
            thr = float(np.partition(r, k - 1)[k - 1])
            rows.append((g, n, k, thr))
        return pd.DataFrame(rows, columns=[
            group_col, "n", "rank", "threshold"]).astype(
            {"n": "int64", "rank": "int64"})

    return (_add_key_bucket(ds.select_columns([group_col, value_col]),
                            group_col, num_buckets)
            .groupby("_sbucket")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas().sort_values(group_col).reset_index(drop=True))


def merkle_levels(ds: ray.data.Dataset, key_col: str = "o_orderkey",
                  value_col: str = "o_totalprice",
                  emit_max_nodes: int = 16) -> pd.DataFrame:
    """Merkle tree over the key-ordered table — the integrity
    fingerprint that lets two replicas of a 100-TB dataset find WHERE
    they diverge in O(log n) hash comparisons instead of a full diff:
    equal roots ⇒ identical tables; on mismatch, descend the level
    hashes to the divergent subtree.

    Construction (every rule explicit so the SQL twin replays it):
    leaves are ``md5(key || ':' || cents)`` in ascending key order;
    each level pairs adjacent nodes as ``md5(left || right)``, an odd
    tail node promoting UNCHANGED; levels with ≤ ``emit_max_nodes``
    nodes are emitted (the top of the tree), root included. md5 is
    bit-identical in DuckDB, so the whole artifact is hash-oracled.

    Scale shape: the global leaf order comes from ORDER-PRESERVING
    range buckets (O(buckets) skinny count fold → prefix offsets;
    within-bucket sort local to one group — no global sort barrier,
    duplicate keys rejected); the tree folds FOUR levels per
    distributed round (groupby ``idx // 16`` — boundaries are
    2⁴-aligned, so group-local subtrees equal the global pairing and
    the ragged tail stays in the last group), shrinking 16× per
    round; the driver finishes the ≤ emit_max_nodes top. Output:
    (level, idx, node_hash)."""
    import hashlib

    import ray

    slim = ds.select_columns([key_col, value_col]).materialize()
    n_leaves = slim.count()
    kmin = int(slim.min(key_col))
    kmax = int(slim.max(key_col))
    span = kmax - kmin + 1
    nb = 256

    def add_rb(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy().astype(np.int64)
        return b.assign(_rb=((k - kmin) * nb // span).astype(np.int64))

    bucketed = slim.map_batches(add_rb,
                                batch_format="pandas").materialize()
    counts = bucketed.groupby("_rb").count().to_pandas()
    counts = counts.sort_values("_rb")
    offs = {}
    run = 0
    for rb, c in zip(counts["_rb"].astype(int),
                     counts["count()"].astype(int)):
        offs[rb] = run
        run += c
    oref = ray.put(offs)

    def leaf_group(g: pd.DataFrame) -> pd.DataFrame:
        om = ray.get(oref)
        g = g.sort_values(key_col)
        keys = g[key_col].to_numpy().astype(np.int64)
        if len(keys) > 1 and (np.diff(keys) == 0).any():
            raise ValueError("merkle_levels requires unique keys")
        cents = np.rint(g[value_col].to_numpy(np.float64)
                        * 100.0).astype(np.int64)
        idx = om[int(g["_rb"].iloc[0])] + np.arange(len(g),
                                                    dtype=np.int64)
        h = [hashlib.md5(f"{k}:{c}".encode()).hexdigest()
             for k, c in zip(keys, cents)]
        return pd.DataFrame({"idx": idx, "h": h})

    def fold16(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("idx")
        nodes = list(zip(g["idx"], g["h"]))
        for _ in range(4):
            nxt = []
            for i in range(0, len(nodes) - 1, 2):
                nxt.append((nodes[i][0] // 2, hashlib.md5(
                    (nodes[i][1] + nodes[i + 1][1]).encode())
                    .hexdigest()))
            if len(nodes) % 2:
                nxt.append((nodes[-1][0] // 2, nodes[-1][1]))
            nodes = nxt
        return pd.DataFrame({"idx": [i for i, _ in nodes],
                             "h": [h for _, h in nodes]})

    level_nodes = bucketed.groupby("_rb").map_groups(
        leaf_group, batch_format="pandas")
    level = 0
    count = n_leaves
    while count > emit_max_nodes:
        tagged = level_nodes.map_batches(
            lambda b: b.assign(_g16=b["idx"] // 16),
            batch_format="pandas")
        level_nodes = tagged.groupby("_g16").map_groups(
            fold16, batch_format="pandas")
        level += 4
        count = max(1, (n_leaves + (1 << level) - 1) >> level)
    top = level_nodes.to_pandas().sort_values("idx")
    nodes = list(zip(top["idx"].astype(int), top["h"]))
    rows = [(level, int(i), h) for i, h in nodes]
    while len(nodes) > 1:
        nxt = []
        for i in range(0, len(nodes) - 1, 2):
            nxt.append((nodes[i][0] // 2, hashlib.md5(
                (nodes[i][1] + nodes[i + 1][1]).encode()).hexdigest()))
        if len(nodes) % 2:
            nxt.append((nodes[-1][0] // 2, nodes[-1][1]))
        nodes = nxt
        level += 1
        rows += [(level, int(i), h) for i, h in nodes]
    out = pd.DataFrame(rows, columns=["level", "idx", "node_hash"])
    return out.astype({"level": "int64", "idx": "int64"}) \
        .sort_values(["level", "idx"]).reset_index(drop=True)
