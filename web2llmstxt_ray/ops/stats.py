"""Distributed second-order statistics from exact integer co-moments.

Correlation / covariance / regression over a 100-TB table need ONE
map-only pass: per block, accumulate the six additive co-moments
(n, Σx, Σy, Σx², Σy², Σxy) per group — O(blocks × groups) skinny
partial rows replace the data — then combine partials and derive the
statistic. No shuffle of the raw rows, no global sort, no second pass.

Exactness contract (the repo-wide fixed-point discipline): callers
pass INTEGER columns (scale floats to cents/mils first). Per-block
sums stay in int64 — callers bound |x|,|y| so a block's Σx² fits —
and the driver-side combine promotes to Python ints (arbitrary
precision), so the final moments are EXACT regardless of block count
or partition order. The derived float statistic is then a pure
function of exact integers, bit-identical to a SQL engine computing
the same formula from the same sums (both convert the same integers
to the same doubles).

Reference anchor: the reference engine has no statistics tier; this
generalizes its per-crawl aggregate counters
(llmsgen/generator/llms_generator.py analytics) to grouped
second-order moments.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data


def grouped_comoments(ds: ray.data.Dataset, group_cols: list[str],
                      x_col: str, y_col: str) -> pd.DataFrame:
    """Exact per-group co-moments of two integer columns.

    Returns one row per group: n, sx, sy, sxx, syy, sxy as Python-int
    (object dtype) exact values.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].astype("int64")
        y = b[y_col].astype("int64")
        g = pd.DataFrame({**{c: b[c] for c in group_cols},
                          "_x": x, "_y": y,
                          "_xx": x * x, "_yy": y * y, "_xy": x * y})
        out = g.groupby(group_cols, as_index=False).agg(
            n=("_x", "size"), sx=("_x", "sum"), sy=("_y", "sum"),
            sxx=("_xx", "sum"), syy=("_yy", "sum"), sxy=("_xy", "sum"))
        return out

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    if parts.empty:
        return parts
    # promote to Python ints BEFORE the cross-block combine: per-block
    # int64 sums are safe by the caller's bound, their total may not be
    mom = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    for c in mom:
        parts[c] = parts[c].map(int)
    return parts.groupby(group_cols, as_index=False)[mom].sum()


def grouped_corr_slope(ds: ray.data.Dataset, group_cols: list[str],
                       x_col: str, y_col: str,
                       ndigits: int = 6) -> pd.DataFrame:
    """Pearson correlation and OLS slope (y on x) per group, derived
    from exact integer co-moments; one map-only pass + driver combine.

    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²))
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)

    All products are computed on Python ints (exact), converted to
    float once — matching a SQL engine evaluating the same expression
    over HUGEINT sums.
    """
    m = grouped_comoments(ds, group_cols, x_col, y_col)
    if m.empty:
        return m

    def derive(r) -> pd.Series:
        n, sx, sy, sxx, syy, sxy = (int(r["n"]), int(r["sx"]),
                                    int(r["sy"]), int(r["sxx"]),
                                    int(r["syy"]), int(r["sxy"]))
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = float(num) / math.sqrt(float(vx) * float(vy)) \
            if vx > 0 and vy > 0 else float("nan")
        slope = float(num) / float(vx) if vx > 0 else float("nan")
        return pd.Series({"corr_xy": round(corr, ndigits),
                          "slope_xy": round(slope, ndigits)})

    out = pd.concat([m[group_cols + ["n"]].copy(),
                     m.apply(derive, axis=1)], axis=1)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(group_cols).reset_index(drop=True)

def grouped_distinct_count(ds: ray.data.Dataset, group_col: str,
                           value_col: str,
                           num_buckets: int = 64) -> pd.DataFrame:
    """EXACT count-distinct per group without shuffling raw rows.

    Per block, the (group, value) pairs collapse to their distinct set
    (the big win: a block with 10^6 events over 10^4 users emits 10^4
    rows). The surviving skinny pairs shuffle ONCE, bucketed by
    hash(value) — all copies of a value agree on the bucket, so a
    per-bucket drop_duplicates is globally exact and each bucket emits
    O(groups) partial counts. Driver merges buckets × groups rows.
    Scale: traffic is O(distinct pairs), never O(rows); a hot group
    spreads over all buckets because bucketing is on VALUE, not group.
    """
    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[group_col, value_col]].drop_duplicates()
        h = pd.util.hash_pandas_object(out[value_col], index=False)
        out = out.copy()
        out["_vb"] = (h % num_buckets).astype("int32")
        return out

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        d = group[[group_col, value_col]].drop_duplicates()
        return d.groupby(group_col, as_index=False).agg(
            n_distinct=(value_col, "size"))

    parts = (ds.map_batches(local_distinct, batch_format="pandas",
                            batch_size=None)
             .groupby("_vb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return parts
    out = parts.groupby(group_col, as_index=False)["n_distinct"].sum()
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_zscore(ds: ray.data.Dataset, group_cols: list[str],
                   x_col: str, out_col: str = "z",
                   ndigits: int = 6) -> ray.data.Dataset:
    """Per-group sample-std z-score as a broadcast + map-only pass:
    exact integer (n, Σx, Σx²) per group (one co-moment pass), then
    every row standardizes against its group via a broadcast lookup —
    the raw rows never shuffle.

    Bit-exactness: z = (n·x − Σx) / (n · sqrt((n·Σx² − Σx²)/(n·(n−1))))
    is evaluated from exact integers in this exact float expression
    order; the SQL oracle mirrors the same expression over HUGEINT
    sums, so both sides round identical doubles.
    """
    m = grouped_comoments(ds, group_cols, x_col, x_col)
    lut = {}
    for _, r in m.iterrows():
        key = tuple(r[c] for c in group_cols) if len(group_cols) > 1 \
            else r[group_cols[0]]
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        denom = n * math.sqrt(float(n * sxx - sx * sx)
                              / float(n * (n - 1))) if n > 1 else 0.0
        lut[key] = (n, sx, denom)
    lut_ref = ray.put(lut)

    def std_batch(b: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lut_ref)
        keys = (b[group_cols[0]] if len(group_cols) == 1
                else pd.Series(list(zip(*(b[c] for c in group_cols))),
                               index=b.index))
        n = keys.map({k: v[0] for k, v in table.items()}).to_numpy(
            dtype=np.float64)
        sx = keys.map({k: v[1] for k, v in table.items()}).to_numpy(
            dtype=np.float64)
        dn = keys.map({k: v[2] for k, v in table.items()}).to_numpy(
            dtype=np.float64)
        x = b[x_col].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (n * x - sx) / dn
        b = b.copy()
        b[out_col] = np.round(z, ndigits)
        return b

    return ds.map_batches(std_batch, batch_format="pandas",
                          batch_size=None)


def grouped_skew_kurt(ds: ray.data.Dataset, group_col: str,
                      x_col: str, ndigits: int = 6) -> pd.DataFrame:
    """Population skewness g1 and excess kurtosis g2 per group from
    exact integer raw moments (Σx..Σx⁴), one map-only pass.

    Let A = Σ(n·x−Σx)³ and C = Σ(n·x−Σx)⁴ and B = n(n·Σx²−Σx²),
    expanded algebraically from the raw power sums so everything stays
    an exact integer:
        A = n³S₃ − 3n²S₁S₂ + 2nS₁³
        C = n⁴S₄ − 4n³S₁S₃ + 6n²S₁²S₂ − 3nS₁⁴
    then  g1 = A·√n / B^1.5   and   g2 = n·C/B² − 3.
    The SQL oracle computes the identical expansion over HUGEINT sums
    (caller bounds |x| so S₄·n⁴ fits int128 on the SQL side; the
    Python side is arbitrary-precision).
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].astype("int64")
        g = pd.DataFrame({group_col: b[group_col], "_x": x,
                          "_x2": x * x, "_x3": x ** 3, "_x4": x ** 4})
        return g.groupby(group_col, as_index=False).agg(
            n=("_x", "size"), s1=("_x", "sum"), s2=("_x2", "sum"),
            s3=("_x3", "sum"), s4=("_x4", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    for c in ["n", "s1", "s2", "s3", "s4"]:
        parts[c] = parts[c].map(int)
    m = parts.groupby(group_col, as_index=False)[
        ["n", "s1", "s2", "s3", "s4"]].sum()

    rows = []
    for _, r in m.iterrows():
        n, s1, s2, s3, s4 = (int(r["n"]), int(r["s1"]), int(r["s2"]),
                             int(r["s3"]), int(r["s4"]))
        B = n * (n * s2 - s1 * s1)
        A = n**3 * s3 - 3 * n**2 * s1 * s2 + 2 * n * s1**3
        C = (n**4 * s4 - 4 * n**3 * s1 * s3
             + 6 * n**2 * s1 * s1 * s2 - 3 * n * s1**4)
        g1 = float(A) * math.sqrt(n) / float(B) ** 1.5 if B > 0 \
            else float("nan")
        g2 = n * float(C) / (float(B) * float(B)) - 3.0 if B > 0 \
            else float("nan")
        rows.append({group_col: r[group_col], "n": n,
                     "skew_pop": round(g1, ndigits),
                     "kurt_excess": round(g2, ndigits)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def mutual_information(ds: ray.data.Dataset, col_a: str, col_b: str,
                       ndigits: int = 6) -> pd.DataFrame:
    """Mutual information I(A;B) in nats between two categorical
    columns from the distributed contingency table: one partial-count
    pass (O(blocks × |A|·|B|) skinny rows), driver combine, then
    I = Σᵢⱼ (cᵢⱼ/N)·ln(N·cᵢⱼ/(rᵢ·cⱼ)) over exact integer counts.
    Cell count is bounded (categorical), so the final sum is tiny."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([col_a, col_b], as_index=False).agg(
            _cnt=(col_a, "size"))

    cells = (ds.map_batches(partial, batch_format="pandas",
                            batch_size=None)
             .to_pandas().groupby([col_a, col_b], as_index=False)[
                 "_cnt"].sum())
    total = int(cells["_cnt"].sum())
    ra = cells.groupby(col_a)["_cnt"].sum()
    cb = cells.groupby(col_b)["_cnt"].sum()
    mi = 0.0
    for _, r in cells.sort_values([col_a, col_b]).iterrows():
        cij = int(r["_cnt"])
        ri, cj = int(ra[r[col_a]]), int(cb[r[col_b]])
        mi += (cij / total) * math.log(total * cij / (ri * cj))
    return pd.DataFrame({"n": [total], "mi_nats": [round(mi, ndigits)]})


def grouped_minmax(ds: ray.data.Dataset, group_col: str,
                   x_col: str) -> pd.DataFrame:
    """Exact per-group (min, max) via per-block partials — one row per
    (block, group) reaches the driver, the raw rows never shuffle."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(group_col, as_index=False)[x_col].agg(
            ["min", "max"])
        return g.rename(columns={"min": "_mn", "max": "_mx"})

    p = ds.select_columns([group_col, x_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    return p.groupby(group_col, as_index=False).agg(
        _mn=("_mn", "min"), _mx=("_mx", "max"))


def grouped_minmax_norm(ds: ray.data.Dataset, group_col: str,
                        x_col: str, out_col: str = "x_norm",
                        ndigits: int | None = None) -> ray.data.Dataset:
    """Per-group min-max normalization (x−min)/(max−min) as a
    broadcast + map-only pass over exact integer bounds (zero-range
    groups emit null, matching SQL ``NULLIF``). Same scale shape as
    :func:`grouped_zscore`: the only reduction is the tiny
    (block × group) partial table.

    ``ndigits=None`` (default) keeps the raw IEEE quotient — over
    exact integer bounds this is BIT-IDENTICAL to the SQL
    ``(x−mn)/CAST(mx−mn AS DOUBLE)`` (one float64 divide each side);
    rounding engine-side while the oracle doesn't is an ulp-level
    mismatch factory."""
    mm = grouped_minmax(ds, group_col, x_col)
    lut = {r[group_col]: (int(r["_mn"]), int(r["_mx"]))
           for _, r in mm.iterrows()}
    lut_ref = ray.put(lut)

    def norm_batch(b: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lut_ref)
        mn = b[group_col].map({k: v[0] for k, v in table.items()}
                              ).to_numpy(dtype=np.float64)
        mx = b[group_col].map({k: v[1] for k, v in table.items()}
                              ).to_numpy(dtype=np.float64)
        x = b[x_col].to_numpy().astype(np.float64)
        rng = mx - mn
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(rng > 0, (x - mn) / rng, np.nan)
        b = b.copy()
        b[out_col] = v if ndigits is None else np.round(v, ndigits)
        return b

    return ds.map_batches(norm_batch, batch_format="pandas",
                          batch_size=None)


def grouped_robust_scale(ds: ray.data.Dataset, group_col: str,
                         x_col: str, out_col: str = "x_robust",
                         ndigits: int | None = None) -> ray.data.Dataset:
    """Per-group robust scaling (x − median)/IQR over exact nearest-rank
    integer quantiles (``quantile_disc`` semantics, so the SQL oracle is
    bit-comparable): the distributed work is the value-count histogram
    of :func:`..corpus.int_quantiles` — grouped quantiles WITHOUT a
    sort — then a broadcast map-only scale. Zero-IQR groups emit null
    (SQL ``NULLIF``)."""
    from .corpus import int_quantiles

    q = int_quantiles(ds, x_col, qs=(0.25, 0.5, 0.75),
                      group_col=group_col)
    lut: dict = {}
    for g, sub in q.groupby(group_col):
        by_q = {float(r["q"]): int(r["value"]) for _, r in sub.iterrows()}
        lut[g] = (by_q[0.5], by_q[0.75] - by_q[0.25])
    lut_ref = ray.put(lut)

    def scale_batch(b: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lut_ref)
        med = b[group_col].map({k: v[0] for k, v in table.items()}
                               ).to_numpy(dtype=np.float64)
        iqr = b[group_col].map({k: v[1] for k, v in table.items()}
                               ).to_numpy(dtype=np.float64)
        x = b[x_col].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(iqr > 0, (x - med) / iqr, np.nan)
        b = b.copy()
        b[out_col] = v if ndigits is None else np.round(v, ndigits)
        return b

    return ds.map_batches(scale_batch, batch_format="pandas",
                          batch_size=None)


def grouped_mad(ds: ray.data.Dataset, group_col: str, value_col: str,
                num_buckets: int = 64) -> ray.data.Dataset:
    """Per-group median and median-absolute-deviation, bit-exact.

    Works in integer cents: the group median is an order statistic or
    a .5-exact mean of two ints; absolute deviations are then exact
    multiples of 0.5 and THEIR median lands on .25 multiples — all
    exactly representable doubles, so the result hash-matches a SQL
    ``median(abs(cents - median(cents) OVER ...))`` oracle.

    One bucketed shuffle (hash(group) → bucket, the high-cardinality-
    safe shape from ``ops/windows.py``); inside a bucket two vectorized
    groupby passes (median transform, then deviation median) cover all
    groups at once. Output: (group, med_cents, mad_cents).
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(group[value_col].to_numpy() * 100) \
            .astype("int64")
        g = group.assign(_cents=cents)
        med = g.groupby(group_col, sort=False)["_cents"] \
            .transform("median")
        g = g.assign(_dev=(g["_cents"] - med).abs(), _med=med)
        out = g.groupby(group_col, as_index=False).agg(
            med_cents=("_med", "first"), mad_cents=("_dev", "median"))
        return out

    from .windows import _add_key_bucket
    return _add_key_bucket(
        ds.select_columns([group_col, value_col]),
        group_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def grouped_entropy(ds: ray.data.Dataset, group_col: str,
                    cat_col: str) -> pd.DataFrame:
    """Shannon entropy (natural log) of a categorical column per group,
    computed from EXACT per-(group, category) counts.

    Scale shape: per-block partial counts collapse each block to its
    distinct (group, category) histogram rows, so only
    ``O(blocks × groups × |categories|)`` skinny rows reach the driver
    combine (the ``partial_groupby`` bound — appropriate while
    groups × categories stays driver-sized; the count table is exact
    integers, the final ``-Σ p·ln p`` is a deterministic float over
    ≤|categories| terms). Output: (group, entropy, n_types).
    """
    from .relational import partial_groupby

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([group_col, cat_col], as_index=False).agg(
            c=(cat_col, "size"))

    cnt = partial_groupby(ds.select_columns([group_col, cat_col]),
                          [group_col, cat_col], batch_agg, ["c"])
    cnt = cnt.sort_values([group_col, cat_col], kind="stable")
    tot = cnt.groupby(group_col, sort=False)["c"].transform("sum")
    p = cnt["c"].to_numpy() / tot.to_numpy()
    cnt = cnt.assign(_term=-p * np.log(p))
    out = cnt.groupby(group_col, as_index=False).agg(
        entropy=("_term", "sum"), n_types=("c", "size"))
    out["n_types"] = out["n_types"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_weighted_median(ds: ray.data.Dataset, group_col: str,
                            value_col: str, weight_col: str,
                            num_buckets: int = 64) -> ray.data.Dataset:
    """Lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total weight
    (``2·cumw ≥ totw``, exact integer comparison — the SQL
    window-cumsum idiom). Weights collapse per (group, value) BEFORE
    the cumulative pass, so the result is independent of row order.

    Values are integer cents, weights exact integers; one bucketed
    shuffle, per-bucket vectorized: groupby-sum → sort → cumsum →
    first index where 2·cumw ≥ totw. Output: (group,
    wmedian_cents, total_weight).
    """

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(group[value_col].to_numpy() * 100) \
            .astype("int64")
        w = np.rint(group[weight_col].to_numpy()).astype("int64")
        g = (pd.DataFrame({group_col: group[group_col].to_numpy(),
                           "_v": cents, "_w": w})
             .groupby([group_col, "_v"], as_index=False)["_w"].sum()
             .sort_values([group_col, "_v"], kind="stable"))
        cw = g.groupby(group_col, sort=False)["_w"].cumsum()
        tw = g.groupby(group_col, sort=False)["_w"].transform("sum")
        hit = g.loc[(2 * cw >= tw).to_numpy()]
        out = hit.groupby(group_col, as_index=False).agg(
            wmedian_cents=("_v", "first"))
        tot = g.groupby(group_col, as_index=False)["_w"].sum() \
            .rename(columns={"_w": "total_weight"})
        return out.merge(tot, on=group_col)

    from .windows import _add_key_bucket
    return _add_key_bucket(
        ds.select_columns([group_col, value_col, weight_col]),
        group_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def equi_width_histogram(ds: ray.data.Dataset, value_col: str,
                         nbins: int = 20) -> pd.DataFrame:
    """Exact equi-width histogram over integer cents in two passes:
    (1) exact global min/max from per-block partials (O(blocks) driver
    fold), (2) map-only integer bin assignment
    ``min(nbins-1, (cents-lo)·nbins // (hi-lo+1))`` + additive partial
    counts — no shuffle, both passes stream. The pure-integer bin rule
    is replayable in SQL, so the histogram is hash-exact.
    Output: (bin, bin_lo_cents, n).
    """
    import pyarrow as pa

    def minmax(b: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(b.column(value_col), dtype=np.float64)
                    * 100).astype("int64")
        if not len(c):
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(c.min())], pa.int64()),
                         "hi": pa.array([int(c.max())], pa.int64())})

    skinny = ds.select_columns([value_col])
    mm = skinny.map_batches(minmax, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    span = hi - lo + 1

    def binify(b: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(b.column(value_col), dtype=np.float64)
                    * 100).astype("int64")
        bins = np.minimum(nbins - 1, (c - lo) * nbins // span)
        u, n = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(n.astype("int64"), pa.int64())})

    parts = skinny.map_batches(binify, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    out = parts.groupby("bin", as_index=False)["n"].sum()
    out["bin_lo_cents"] = lo + out["bin"] * span // nbins
    out["n"] = out["n"].astype("int64")
    return out[["bin", "bin_lo_cents", "n"]].sort_values("bin") \
        .reset_index(drop=True)


def grouped_heavy_hitters(ds: ray.data.Dataset, group_col: str,
                          value_col: str, k: int = 3,
                          num_buckets: int = 64) -> ray.data.Dataset:
    """EXACT per-group top-k most frequent values, deterministic
    tie-break (count desc, value asc) — the SQL ``QUALIFY
    row_number() OVER (PARTITION BY group ORDER BY cnt DESC, val)
    ≤ k`` shape.

    Two skinny shuffles, raw rows move once: (1) per-block partial
    (group, value) counts shuffle bucketed by hash(value) — all copies
    of a value land together, so per-bucket sums are globally exact;
    (2) the exact count rows (O(distinct pairs)) re-shuffle bucketed
    by hash(group) and a vectorized per-bucket rank filter keeps each
    group's top k. Output: (group, value, cnt, rnk).
    """

    def local_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby([group_col, value_col], as_index=False) \
            .size().rename(columns={"size": "cnt"})
        h = pd.util.hash_pandas_object(out[value_col], index=False)
        out["_vb"] = (h % num_buckets).astype("int32")
        return out

    def exact_counts(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby([group_col, value_col],
                             as_index=False)["cnt"].sum()

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([group_col, "cnt", value_col],
                              ascending=[True, False, True],
                              kind="stable")
        rnk = g.groupby(group_col, sort=False).cumcount() + 1
        g = g.assign(rnk=rnk.astype("int64"))
        out = g.loc[g["rnk"] <= k].copy()
        out["cnt"] = out["cnt"].astype("int64")
        return out[[group_col, value_col, "cnt", "rnk"]]

    from .windows import _add_key_bucket
    counts = (ds.select_columns([group_col, value_col])
              .map_batches(local_counts, batch_format="pandas",
                           batch_size=None)
              .groupby("_vb").map_groups(exact_counts,
                                         batch_format="pandas"))
    return _add_key_bucket(counts, group_col, num_buckets).groupby(
        "_sbucket").map_groups(topk, batch_format="pandas")


def grouped_regression(ds: ray.data.Dataset, group_cols: list[str],
                       x_col: str, y_col: str,
                       ndigits: int = 6) -> pd.DataFrame:
    """OLS slope, intercept and R² of integer y on integer x per
    group, from EXACT co-moments in one map-only pass (same economics
    as :func:`grouped_comoments`), with one extra guarantee: Σy² is
    computed with a hi/lo SPLIT SUM (``Σ(y²%2³²) + 2³²·Σ(y²//2³²)``),
    so a wide-magnitude y (e.g. price cents, |y| ≤ ~10⁷) cannot
    overflow the per-block int64 partial even at multi-million-row
    blocks — the caller bound of grouped_comoments applies only to x.

    Derived floats are pure functions of exact Python-int moments —
    ``slope = num/vx``, ``intercept = (Σy − slope·Σx)/n``,
    ``r2 = num²/(vx·vy)`` — each a single deterministic double
    expression replicated verbatim in the SQL oracle.
    """
    SPLIT = 1 << 32

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].astype("int64")
        y = b[y_col].astype("int64")
        yy = (y * y).to_numpy()
        g = pd.DataFrame({**{c: b[c] for c in group_cols},
                          "_x": x, "_y": y, "_xx": x * x,
                          "_xy": x * y,
                          "_yyl": yy % SPLIT, "_yyh": yy // SPLIT})
        return g.groupby(group_cols, as_index=False).agg(
            n=("_x", "size"), sx=("_x", "sum"), sy=("_y", "sum"),
            sxx=("_xx", "sum"), sxy=("_xy", "sum"),
            syyl=("_yyl", "sum"), syyh=("_yyh", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    if parts.empty:
        return parts
    mom = ["n", "sx", "sy", "sxx", "sxy", "syyl", "syyh"]
    for c in mom:
        parts[c] = parts[c].map(int)
    m = parts.groupby(group_cols, as_index=False)[mom].sum()

    def derive(r) -> pd.Series:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        syy = int(r["syyl"]) + SPLIT * int(r["syyh"])
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        slope = float(num) / float(vx) if vx > 0 else float("nan")
        icept = ((float(sy) - slope * float(sx)) / float(n)
                 if vx > 0 else float("nan"))
        r2 = (float(num * num) / float(vx * vy)
              if vx > 0 and vy > 0 else float("nan"))
        return pd.Series({"slope": round(slope, ndigits),
                          "intercept": round(icept, ndigits),
                          "r2": round(r2, ndigits)})

    out = pd.concat([m[group_cols + ["n"]].copy(),
                     m.apply(derive, axis=1)], axis=1)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(group_cols).reset_index(drop=True)


def two_sample_ks(ds: ray.data.Dataset, value_col: str,
                  label_col: str, label_a: str,
                  label_b: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the integer-cents
    value distributions of two labels, EXACT: the CDF difference is
    tested by cross-multiplication ``|cum_a·n_b − cum_b·n_a|`` so no
    float CDF ever exists; the single output float is one division of
    exact integers.

    One streaming pass emits per-block (cents, count_a, count_b)
    partials; the driver folds them over the distinct-value domain
    (bounded by the value's dynamic range — for unbounded domains,
    route the partials through a value-bucketed exact-count shuffle
    first, then the same O(distinct) scan). Output one row:
    (ks_num, n_a, n_b, ks_d)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b[label_col].isin((label_a, label_b))
        k = b.loc[m]
        cents = np.rint(k[value_col].to_numpy() * 100).astype("int64")
        isa = (k[label_col] == label_a).to_numpy().astype("int64")
        g = pd.DataFrame({"cents": cents, "ca": isa, "cb": 1 - isa})
        return g.groupby("cents", as_index=False)[["ca", "cb"]].sum()

    parts = ds.select_columns([value_col, label_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    c = parts.groupby("cents", as_index=False)[["ca", "cb"]].sum() \
        .sort_values("cents")
    na, nb = int(c["ca"].sum()), int(c["cb"].sum())
    cca = c["ca"].cumsum().to_numpy()
    ccb = c["cb"].cumsum().to_numpy()
    ks_num = int(np.abs(cca * nb - ccb * na).max()) if len(c) else 0
    return pd.DataFrame({
        "ks_num": [ks_num], "n_a": [na], "n_b": [nb],
        "ks_d": [float(ks_num) / (float(na) * float(nb))
                 if na and nb else float("nan")],
    })


def grouped_trimmed_mean(ds: ray.data.Dataset, group_col: str,
                         value_col: str, trim_pct: int = 10,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Per-group trimmed mean of integer cents: drop the lowest and
    highest ``k = n·trim_pct // 100`` rows BY VALUE ORDER, then the
    exact integer sum/count of the survivors (mean = one float
    division). Tie rows share a value, so which tied rows are dropped
    cannot change the sum — the result is exact despite the arbitrary
    rank assignment among ties. Groups where 2k ≥ n vanish (no rows
    survive), matching the SQL GROUP BY over the filtered rows.
    One bucketed shuffle; per-bucket a single sort + cumcount covers
    every key. Output: (group, trim_sum_i, trim_n, trim_mean)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(group[value_col].to_numpy() * 100) \
            .astype("int64")
        g = (group.assign(_c=cents)
             .sort_values([group_col, "_c"], kind="stable"))
        i = g.groupby(group_col, sort=False).cumcount().to_numpy()
        n = g.groupby(group_col, sort=False)[group_col] \
            .transform("size").to_numpy()
        k = n * trim_pct // 100
        keep = (i >= k) & (i < n - k)
        kept = g.loc[keep]
        out = kept.groupby(group_col, as_index=False).agg(
            trim_sum_i=("_c", "sum"), trim_n=("_c", "size"))
        out["trim_sum_i"] = out["trim_sum_i"].astype("int64")
        out["trim_n"] = out["trim_n"].astype("int64")
        out["trim_mean"] = (out["trim_sum_i"].to_numpy()
                            .astype("float64")
                            / out["trim_n"].to_numpy()
                            .astype("float64"))
        return out

    from .windows import _add_key_bucket
    return _add_key_bucket(
        ds.select_columns([group_col, value_col]),
        group_col, num_buckets).groupby("_sbucket").map_groups(
        per_bucket, batch_format="pandas")


def correlation_matrix(ds: ray.data.Dataset,
                       cols: list[str],
                       ndigits: int | None = None) -> pd.DataFrame:
    """Pairwise Pearson correlation over d integer columns in ONE
    map-only pass: each block accumulates the full co-moment block
    (n, Σxᵢ, Σxᵢxⱼ) — O(blocks × d²) skinny partials replace the
    table; no shuffle, no per-pair rescan. Every elementwise product
    fits int64 (callers bound |x| ≤ ~3·10⁹ pairwise), and per-block
    product SUMS use the hi/lo split (``Σ(p % 2³²) + 2³²·Σ(p // 2³²)``)
    so multi-million-row blocks cannot overflow; the driver folds
    Python ints (exact). ``corr = (n·Sᵢⱼ − sᵢsⱼ) /
    sqrt((n·Sᵢᵢ − sᵢ²)(n·Sⱼⱼ − sⱼ²))`` is then one deterministic double
    expression from exact integers — the SQL oracle replays it with
    HUGEINT sums. Output: (col_x, col_y, corr) for i < j."""
    SPLIT = 1 << 32
    d = len(cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([b[c].to_numpy().astype(np.int64) for c in cols],
                     axis=1)
        out = {"n": [len(b)]}
        for i in range(d):
            out[f"s{i}"] = [int(X[:, i].sum())]
        for i in range(d):
            for j in range(i, d):
                p = X[:, i] * X[:, j]
                out[f"l{i}_{j}"] = [int((p % SPLIT).sum())]
                out[f"h{i}_{j}"] = [int((p // SPLIT).sum())]
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"col_x": [], "col_y": [], "corr": []})
    n = int(parts["n"].map(int).sum())
    s = [int(parts[f"s{i}"].map(int).sum()) for i in range(d)]
    S = {}
    for i in range(d):
        for j in range(i, d):
            S[(i, j)] = (int(parts[f"l{i}_{j}"].map(int).sum())
                         + SPLIT * int(parts[f"h{i}_{j}"].map(int).sum()))
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * S[(i, j)] - s[i] * s[j]
            vx = n * S[(i, i)] - s[i] * s[i]
            vy = n * S[(j, j)] - s[j] * s[j]
            c = (float(num) / math.sqrt(float(vx) * float(vy))
                 if vx > 0 and vy > 0 else float("nan"))
            rows.append({"col_x": cols[i], "col_y": cols[j],
                         "corr": (round(c, ndigits)
                                  if ndigits is not None else c)})
    return (pd.DataFrame(rows)
            .sort_values(["col_x", "col_y"]).reset_index(drop=True))


def spearman_corr(ds: ray.data.Dataset, x_col: str,
                  y_col: str) -> pd.DataFrame:
    """EXACT Spearman rank correlation of two integer columns with
    average-rank tie handling, as three map-only passes — no global
    sort:

    1. one fused pass builds BOTH distinct-value count histograms
       (bounded-distinct-cardinality contract, as
       :func:`corpus.global_percent_rank`);
    2. twice-the-average-rank is the INTEGER ``r2 = 2·cum_less +
       cnt + 1`` per distinct value — the (value → r2) maps broadcast
       once and a map-only searchsorted probe attaches integer rank
       columns;
    3. :func:`correlation_matrix` folds exact hi/lo-split co-moments
       of the rank columns.

    Spearman = Pearson over average ranks, and scaling both ranks by 2
    cancels, so the result is ONE double expression from exact
    integers — the SQL oracle replays it from
    ``2·rank() − 2 + count(*) OVER (PARTITION BY v) + 1`` with HUGEINT
    sums. Output: (n, spearman)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cx = b.groupby(x_col, as_index=False).agg(cnt=(x_col, "size"))
        cx.columns = ["val", "cnt"]
        cx["col"] = 0
        cy = b.groupby(y_col, as_index=False).agg(cnt=(y_col, "size"))
        cy.columns = ["val", "cnt"]
        cy["col"] = 1
        return pd.concat([cx, cy], ignore_index=True)

    hist = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=None)
            .to_pandas().groupby(["col", "val"],
                                 as_index=False)["cnt"].sum())
    maps = {}
    for side in (0, 1):
        h = hist[hist["col"] == side].sort_values("val")
        vals = h["val"].to_numpy()
        cnts = h["cnt"].to_numpy().astype(np.int64)
        less = np.concatenate(([0], cnts.cumsum()[:-1]))
        maps[side] = (vals, 2 * less + cnts + 1)
    state = ray.put(maps)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(state)
        out = {}
        for side, col in ((0, x_col), (1, y_col)):
            vals, r2 = m[side]
            idx = np.searchsorted(vals, batch[col].to_numpy(), "left")
            out["r2x" if side == 0 else "r2y"] = r2[idx]
        return pd.DataFrame(out)

    ranked = ds.map_batches(attach, batch_format="pandas")
    corr = correlation_matrix(ranked, ["r2x", "r2y"])
    n = int(hist.loc[hist["col"] == 0, "cnt"].sum())
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "spearman": [float(corr["corr"].iloc[0])]})


def chi2_independence(ds: ray.data.Dataset, col_a: str, col_b: str,
                      ndigits: int | None = None) -> pd.DataFrame:
    """Pearson chi-square test of independence over two categorical
    columns + Cramér's V, from one map-only contingency-count pass
    (O(blocks × |a|·|b|) skinny partials, exact integer counts).
    ``chi2 = Σ_ij (n·o_ij − r_i·c_j)² / (n·r_i·c_j)`` — every
    numerator/denominator an exact Python int; cells fold in sorted
    (a, b) order. SQL replays the per-cell expression with HUGEINT
    products (its SUM order is engine-chosen, so the oracle gate
    allows a few-ULP relative tolerance on this query). Output:
    (n, dof, chi2, cramers_v)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([col_a, col_b], as_index=False).agg(
            cnt=(col_a, "size"))
        return g

    obs = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=None)
           .to_pandas().groupby([col_a, col_b],
                                as_index=False)["cnt"].sum())
    obs = obs.sort_values([col_a, col_b]).reset_index(drop=True)
    n = int(obs["cnt"].sum())
    row = obs.groupby(col_a)["cnt"].sum().to_dict()
    colt = obs.groupby(col_b)["cnt"].sum().to_dict()
    # all cells of the full cross product (absent observed cells still
    # contribute their expected mass: o=0 term = r·c/n)
    chi2 = 0.0
    ocell = {(r[col_a], r[col_b]): int(r["cnt"])
             for _, r in obs.iterrows()}
    for a in sorted(row):
        for bv in sorted(colt):
            o = ocell.get((a, bv), 0)
            r, c = int(row[a]), int(colt[bv])
            num = n * o - r * c
            chi2 += float(num * num) / float(n * r * c)
    dof = (len(row) - 1) * (len(colt) - 1)
    k = min(len(row), len(colt)) - 1
    v = math.sqrt(chi2 / (n * k)) if n > 0 and k > 0 else float("nan")
    if ndigits is not None:
        chi2, v = round(chi2, ndigits), round(v, ndigits)
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "dof": pd.Series([dof], dtype="int64"),
                         "chi2": [chi2], "cramers_v": [v]})


def kendall_tau_b(ds: ray.data.Dataset, x_col: str,
                  y_col: str) -> pd.DataFrame:
    """EXACT Kendall's tau-b of two bounded-cardinality integer
    columns from the JOINT count histogram: one map-only pass emits
    per-block (x, y, cnt) partials (O(blocks × |x|·|y|) skinny rows);
    concordant/discordant/tie pair counts are then exact Python-int
    sums over the cell grid — never over rows — so a 10^12-row table
    costs the same driver arithmetic as a 10^3-row one.

    tau_b = (C − D) / sqrt((n0 − nx)(n0 − ny)) with n0 = n(n−1)/2,
    nx/ny the tied-pair counts of each marginal — every operand an
    exact integer, ONE double expression at the end; the SQL oracle
    replays it from a HUGEINT cell self-join. Output: (n, tau_b)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([x_col, y_col], as_index=False).agg(
            cnt=(x_col, "size"))

    obs = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=None)
           .to_pandas().groupby([x_col, y_col],
                                as_index=False)["cnt"].sum())
    xs = np.sort(obs[x_col].unique())
    ys = np.sort(obs[y_col].unique())
    grid = np.zeros((len(xs), len(ys)), dtype=object)
    xi = np.searchsorted(xs, obs[x_col].to_numpy())
    yi = np.searchsorted(ys, obs[y_col].to_numpy())
    for i, j, c in zip(xi, yi, obs["cnt"].to_numpy()):
        grid[i, j] += int(c)
    # suffix sums: S[i][j] = Σ_{k>i, l>j} grid[k][l]; D-side mirror
    g = grid.astype(object)
    C = D = 0
    nx_ = len(xs)
    ny_ = len(ys)
    # cumulative-from-bottom-right tables as exact Python ints
    suf = np.zeros((nx_ + 1, ny_ + 1), dtype=object)
    for i in range(nx_ - 1, -1, -1):
        for j in range(ny_ - 1, -1, -1):
            suf[i][j] = (g[i][j] + suf[i + 1][j] + suf[i][j + 1]
                         - suf[i + 1][j + 1])
    sufd = np.zeros((nx_ + 1, ny_ + 2), dtype=object)  # k>i, l<j
    for i in range(nx_ - 1, -1, -1):
        for j in range(ny_):
            sufd[i][j + 1] = (sufd[i + 1][j + 1] + sufd[i][j]
                              - sufd[i + 1][j] + g[i][j])
    for i in range(nx_):
        for j in range(ny_):
            o = g[i][j]
            if not o:
                continue
            C += o * suf[i + 1][j + 1]
            D += o * sufd[i + 1][j]
    n = int(sum(int(v) for v in grid.ravel()))
    rx = [int(sum(int(v) for v in grid[i, :])) for i in range(nx_)]
    ry = [int(sum(int(v) for v in grid[:, j])) for j in range(ny_)]
    n0 = n * (n - 1) // 2
    nx_t = sum(r * (r - 1) // 2 for r in rx)
    ny_t = sum(c * (c - 1) // 2 for c in ry)
    denom = math.sqrt(float(n0 - nx_t) * float(n0 - ny_t))
    tau = float(C - D) / denom if denom > 0 else float("nan")
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "tau_b": [tau]})


def psi_drift(ds: ray.data.Dataset, value_col: str, flag_col: str,
              nbins: int = 10) -> pd.DataFrame:
    """Population Stability Index between the ``flag_col==0`` (expected)
    and ``flag_col==1`` (actual) populations of an integer column:
    bins are the equi-width integer rule over the GLOBAL [min, max]
    (the same SQL-replayable rule as :func:`equi_width_histogram`),
    psi = Σ (a_i − e_i)·ln(a_i/e_i) over bin proportions. Two
    streaming passes (exact min/max fold, then additive per-bin count
    partials); empty bins are Laplace-smoothed by half a count on both
    sides so the log stays finite — replicated verbatim in the SQL
    oracle. Output: (nbins, psi)."""
    lohi = ds.map_batches(
        lambda b: pd.DataFrame({"lo": [b[value_col].min()],
                                "hi": [b[value_col].max()]}),
        batch_format="pandas", batch_size=None).to_pandas()
    lo, hi = int(lohi["lo"].min()), int(lohi["hi"].max())
    span = max(hi - lo, 1)

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy().astype(np.int64)
        binned = np.minimum(nbins - 1, (v - lo) * nbins // span)
        g = pd.DataFrame({"bin": binned, "flag": b[flag_col]})
        return g.groupby(["bin", "flag"], as_index=False).agg(
            cnt=("bin", "size"))

    parts = (ds.map_batches(counts, batch_format="pandas",
                            batch_size=None)
             .to_pandas().groupby(["bin", "flag"],
                                  as_index=False)["cnt"].sum())
    ne = int(parts.loc[parts["flag"] == 0, "cnt"].sum())
    na = int(parts.loc[parts["flag"] == 1, "cnt"].sum())
    psi = 0.0
    for i in range(nbins):
        ce = int(parts.loc[(parts["bin"] == i)
                           & (parts["flag"] == 0), "cnt"].sum())
        ca = int(parts.loc[(parts["bin"] == i)
                           & (parts["flag"] == 1), "cnt"].sum())
        e = (ce + 0.5) / (ne + 0.5 * nbins)
        a = (ca + 0.5) / (na + 0.5 * nbins)
        psi += (a - e) * math.log(a / e)
    return pd.DataFrame({"nbins": pd.Series([nbins], dtype="int64"),
                         "psi": [psi]})


def js_divergence(ds: ray.data.Dataset, cat_col: str,
                  flag_col: str) -> pd.DataFrame:
    """Jensen-Shannon divergence (nats) between the categorical
    distributions of the two ``flag_col`` populations, from ONE
    map-only exact count pass. jsd = H(m) − (H(p) + H(q))/2 over the
    union support with m = (p + q)/2; every probability is a ratio of
    exact integers, terms fold in sorted category order. Bounded by
    ln 2; 0 iff identical distributions. Output: (n_cats, jsd)."""

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([cat_col, flag_col], as_index=False).agg(
            cnt=(cat_col, "size"))

    parts = (ds.map_batches(counts, batch_format="pandas",
                            batch_size=None)
             .to_pandas().groupby([cat_col, flag_col],
                                  as_index=False)["cnt"].sum())
    cats = sorted(parts[cat_col].unique())
    np_ = int(parts.loc[parts[flag_col] == 0, "cnt"].sum())
    nq = int(parts.loc[parts[flag_col] == 1, "cnt"].sum())
    by = {(r[cat_col], r[flag_col]): int(r["cnt"])
          for _, r in parts.iterrows()}
    jsd = 0.0
    for c in cats:
        p = by.get((c, 0), 0) / np_ if np_ else 0.0
        q = by.get((c, 1), 0) / nq if nq else 0.0
        m = 0.5 * (p + q)
        # per-category term grouped BEFORE the fold — the same cell
        # expression the SQL oracle sums
        t = (0.5 * p * math.log(p / m) if p > 0 else 0.0) \
            + (0.5 * q * math.log(q / m) if q > 0 else 0.0)
        jsd += t
    return pd.DataFrame({"n_cats": pd.Series([len(cats)],
                                             dtype="int64"),
                         "jsd": [jsd]})


def _disc_quantile(values: np.ndarray, counts: np.ndarray,
                   q: float) -> int:
    """Exact discrete quantile from a sorted (value, count) histogram:
    the smallest value whose cumulative count reaches ceil(q·n) — the
    percentile_disc rule, identical to DuckDB's quantile_disc at the
    quantiles used here (floor((n−1)·q) index ≡ ceil(q·n)−1 for
    q = i/2; callers using other q replay the ceil rule in SQL)."""
    cum = np.cumsum(counts)
    need = int(math.ceil(q * int(cum[-1])))
    return int(values[int(np.searchsorted(cum, need, side="left"))])


def grouped_median_mad_outliers(ds: ray.data.Dataset, group_col: str,
                                value_col: str, id_col: str,
                                thresh: float = 2.0) -> pd.DataFrame:
    """Per-group robust outlier detection: flag rows where
    |x − median_g| > thresh · MAD_g (median absolute deviation), with
    the median and the MAD both EXACT discrete quantiles.

    Shape: one map-only pass builds the per-(group, value) count
    histogram through the partial-agg combine — O(groups ×
    distinct-values) skinny rows replace the data, the same contract
    as the grouped percentile_disc query. The driver derives each
    group's median from the histogram, then the MAD as the WEIGHTED
    median of |v − med| over the SAME histogram (no second data
    pass — the deviation distribution is a pure reindexing of the
    value histogram). A second map-only pass broadcasts the O(groups)
    (med, mad) table and filters. Nothing corpus-sized ever leaves
    the workers; both passes stream.

    Output: the outlier rows (id, group, value, med, mad) sorted by id.
    """
    from .relational import partial_groupby

    hist = partial_groupby(
        ds.select_columns([group_col, value_col]).map_batches(
            lambda b: b.groupby([group_col, value_col], as_index=False)
            .agg(n=(value_col, "size")),
            batch_format="pandas", batch_size=None),
        [group_col, value_col],
        lambda b: b.groupby([group_col, value_col],
                            as_index=False)["n"].sum(), ["n"])

    rows = []
    for g, sub in hist.groupby(group_col):
        sub = sub.sort_values(value_col)
        v = sub[value_col].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        med = _disc_quantile(v, n, 0.5)
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        mad = _disc_quantile(dev[order], n[order], 0.5)
        rows.append((g, med, mad))
    mm = {g: (med, mad) for g, med, mad in rows}

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        med = b[group_col].map({g: m for g, (m, _) in mm.items()})
        mad = b[group_col].map({g: d for g, (_, d) in mm.items()})
        x = b[value_col].to_numpy(np.int64)
        keep = (np.abs(x - med.to_numpy(np.int64))
                > thresh * mad.to_numpy(np.int64).astype("float64"))
        out = b.loc[keep, [id_col, group_col, value_col]].copy()
        out["med"] = med[keep].astype("int64")
        out["mad"] = mad[keep].astype("int64")
        return out

    out = (ds.select_columns([id_col, group_col, value_col])
           .map_batches(flag, batch_format="pandas", batch_size=None)
           .to_pandas())
    return out.sort_values(id_col).reset_index(drop=True)


def equi_depth_bucket_counts(ds: ray.data.Dataset, value_col: str,
                             num_buckets: int = 10) -> pd.DataFrame:
    """Equi-depth bucketizer (the feature-engineering 'fit quantile
    boundaries, then transform' pattern): fit ``num_buckets − 1``
    exact discrete quantile boundaries of an integer column, then
    assign every row bucket = #{boundaries strictly below its value}
    (ties land in the lower bucket) and count rows per bucket.

    Fit rides the per-value count histogram through the partial-agg
    combine (O(distinct values) driver rows, no global sort);
    transform is a second map-only pass with the O(num_buckets)
    boundary array broadcast into a vectorized ``np.searchsorted`` —
    per-block bucket counts are additive partials, so the final fold
    is O(blocks × buckets). Buckets are equi-depth only up to value
    ties at the boundaries, exactly like percentile_disc boundaries.

    Output: (bucket, n_rows) sorted by bucket.
    """
    from .relational import partial_groupby

    hist = partial_groupby(
        ds.select_columns([value_col]).map_batches(
            lambda b: b.groupby(value_col, as_index=False)
            .agg(n=(value_col, "size")),
            batch_format="pandas", batch_size=None),
        [value_col],
        lambda b: b.groupby(value_col, as_index=False)["n"].sum(),
        ["n"]).sort_values(value_col)
    v = hist[value_col].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1])
    # EXACT integer ceil(i·n/q) — a float i/q·n can land an ulp above
    # an integer and shift the boundary rank vs the SQL replay
    bounds = np.array(sorted({
        int(v[int(np.searchsorted(
            cum, (i * total + num_buckets - 1) // num_buckets,
            side="left"))])
        for i in range(1, num_buckets)}), dtype=np.int64)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        x = b[value_col].to_numpy(np.int64)
        bk = np.searchsorted(bounds, x, side="left")
        u, c = np.unique(bk, return_counts=True)
        return pd.DataFrame({"bucket": u.astype("int64"),
                             "n_rows": c.astype("int64")})

    parts = (ds.select_columns([value_col])
             .map_batches(bucketize, batch_format="pandas",
                          batch_size=None).to_pandas())
    out = parts.groupby("bucket", as_index=False)["n_rows"].sum()
    out["bucket"] = out["bucket"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def benford_digit_counts(ds: ray.data.Dataset,
                         value_col: str) -> pd.DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    fabricated-data / pipeline-corruption screen auditors run over
    monetary columns. Input is an integer (cents) column; the leading
    digit is scale-invariant under the ×100 cents conversion, so
    testing cents ≡ testing dollars.

    Map-only per-digit count partials (nine counts per block replace
    the data); the driver folds O(blocks × 9) rows and derives each
    digit's Benford expectation N·log₁₀(1 + 1/d) and its χ² term
    (n − e)²/e — floats are pure functions of the exact integer
    counts, bit-comparable to a SQL engine evaluating the same
    expressions.

    Output: (digit, n, expected, chi2_part) for digits present.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = (b[value_col].astype("int64").abs().astype(str).str[0]
             .astype("int64"))
        u, c = np.unique(d.to_numpy(), return_counts=True)
        return pd.DataFrame({"digit": u.astype("int64"),
                             "n": c.astype("int64")})

    parts = (ds.select_columns([value_col])
             .map_batches(partial, batch_format="pandas",
                          batch_size=None).to_pandas())
    out = parts.groupby("digit", as_index=False)["n"].sum()
    total = float(int(out["n"].sum()))
    d = out["digit"].to_numpy("float64")
    e = total * np.log10(1.0 + 1.0 / d)
    nn = out["n"].to_numpy("float64")
    out["n"] = out["n"].astype("int64")
    out["expected"] = e
    out["chi2_part"] = (nn - e) ** 2 / e
    return out.sort_values("digit").reset_index(drop=True)


def grouped_gini(ds: ray.data.Dataset, group_col: str,
                 value_col: str,
                 num_buckets: int = 64) -> pd.DataFrame:
    """Exact Gini concentration index per group over integer cents —
    the inequality / revenue-concentration audit
    (``G = (2·Σ i·v_i − (n+1)·Σv) / (n·Σv)`` with ascending ranks
    ``i``; ties contribute a fixed rank-block sum, so the statistic is
    deterministic without a tie rule).

    Per-block (group, value) count partials collapse duplicates before
    ONE group-hash bucket shuffle; inside a bucket the rank sums come
    from the collapsed histogram (a value with count c after m
    predecessors contributes ``v·(c·m + c(c+1)/2)``) folded in
    object-dtype Python ints — exact at any cardinality, no int64
    wrap. The final float is one division of two exact integers, so a
    HUGEINT SQL replay hash-matches. Output: (group, n, total_cents,
    gini).
    """

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({group_col: pd.Series([], dtype="str"),
                                 "_v": pd.Series([], dtype="int64"),
                                 "_c": pd.Series([], dtype="int64")})
        cents = np.rint(batch[value_col].to_numpy() * 100) \
            .astype("int64")
        return (pd.DataFrame({group_col: batch[group_col].to_numpy(),
                              "_v": cents})
                .groupby([group_col, "_v"]).size()
                .rename("_c").reset_index())

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby([group_col, "_v"], as_index=False)["_c"]
             .sum().sort_values([group_col, "_v"], kind="stable"))
        c = g["_c"].to_numpy("int64")
        cum = g.groupby(group_col, sort=False)["_c"].cumsum() \
            .to_numpy("int64")
        m = cum - c
        # object dtype: exact Python-int products at any magnitude
        v = g["_v"].to_numpy("int64").astype(object)
        co = c.astype(object)
        g["_ric"] = v * (co * m.astype(object)
                         + co * (co + 1) // 2)
        g["_vc"] = v * co
        agg = g.groupby(group_col, as_index=False).agg(
            n=("_c", "sum"), _sric=("_ric", "sum"), _svc=("_vc", "sum"))
        n = agg["n"].astype(object)
        num = 2 * agg["_sric"] - (n + 1) * agg["_svc"]
        den = n * agg["_svc"]
        gini = np.array([float(a) / float(b) if b else float("nan")
                         for a, b in zip(num, den)], dtype=np.float64)
        return pd.DataFrame({
            group_col: agg[group_col],
            "n": agg["n"].astype("int64"),
            "total_cents": agg["_svc"].astype("int64"),
            "gini": gini})

    from .windows import _add_key_bucket
    parts = (ds.select_columns([group_col, value_col])
             .map_batches(block_partial, batch_format="pandas"))
    out = (_add_key_bucket(parts, group_col, num_buckets)
           .groupby("_sbucket")
           .map_groups(lambda g: per_bucket(g.drop(columns="_sbucket")),
                       batch_format="pandas")
           .to_pandas())
    return out.sort_values(group_col).reset_index(drop=True)


def daily_volume_anomalies(ds: ray.data.Dataset, ts_col: str = "ts",
                           z: int = 3) -> pd.DataFrame:
    """Robust anomaly screen over the DAILY event volume: days whose
    count deviates from the median daily count by more than
    ``z`` × MAD (both exact discrete quantiles — the
    ``quantile_disc`` rule) — the traffic-spike / outage detector.

    One map-only additive partial pass (O(blocks × days) rows), then
    the O(days) fold — median, MAD and every comparison are exact
    integers, so the flag set is hash-exact against the SQL replay.
    Days are bounded by calendar time, never by corpus size. Output:
    flagged days only: (day, n, med, mad).
    """
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        us = (batch.column(ts_col).to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype("int64"))
        day = (us // 86_400_000_000) * 86_400_000_000
        u, n = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(n.astype("int64"), pa.int64())})

    parts = (ds.select_columns([ts_col])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    daily = parts.groupby("day", as_index=False)["n"].sum() \
        .sort_values("day")
    cnts = daily["n"].to_numpy("int64")
    vals, vcnt = np.unique(cnts, return_counts=True)
    med = _disc_quantile(vals, vcnt, 0.5)
    dev = np.abs(cnts - med)
    dvals, dcnt = np.unique(dev, return_counts=True)
    mad = _disc_quantile(dvals, dcnt, 0.5)
    keep = dev > z * mad
    out = pd.DataFrame({
        "day": daily["day"].to_numpy("int64")[keep]
        .astype("datetime64[us]"),
        "n": cnts[keep],
        "med": np.int64(med), "mad": np.int64(mad)})
    return out.reset_index(drop=True)


def grouped_geomean(ds: ray.data.Dataset, group_col: str,
                    value_col: str) -> pd.DataFrame:
    """Geometric mean per group — ``exp(mean(ln(cents)))/100`` over
    positive integer cents, the scale-robust average for heavy-tailed
    prices. Map-only additive (Σ ln, n) partials, O(blocks × groups)
    rows to the driver fold; the transcendental sum carries the
    documented few-ULP gate (result in dollars keeps the absolute
    error orders below the 6-decimal hash). Output:
    (group, n, geomean).
    """

    def batch_agg(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(batch[value_col].to_numpy() * 100) \
            .astype("int64")
        ln = np.log(cents.astype(np.float64))
        return (pd.DataFrame({group_col: batch[group_col].to_numpy(),
                              "_sln": ln,
                              "n": np.ones(len(batch), "int64")})
                .groupby(group_col, as_index=False)
                .agg(_sln=("_sln", "sum"), n=("n", "sum")))

    from .relational import partial_groupby
    out = partial_groupby(ds.select_columns([group_col, value_col]),
                          [group_col], batch_agg, ["_sln", "n"])
    out["geomean"] = np.exp(out["_sln"] / out["n"]) / 100.0
    out["n"] = out["n"].astype("int64")
    return (out[[group_col, "n", "geomean"]]
            .sort_values(group_col).reset_index(drop=True))


def grouped_power_means(ds: ray.data.Dataset, group_col: str,
                        value_col: str) -> pd.DataFrame:
    """Per-group geometric, harmonic and quadratic (RMS) means of a
    POSITIVE value column — the mean family skew-robust pricing/QA
    summaries use (geometric for ratios, harmonic for rates, RMS for
    magnitudes). All three need only ADDITIVE per-block partials
    (n, Σ ln x, Σ 1/x, Σ x²), block-sorted for a deterministic float
    fold; the driver combines O(blocks × groups) rows and applies one
    exp/div/sqrt per group. Output: (group, n, geo_mean, har_mean,
    rms), sorted by group.
    """
    import math

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values([group_col, value_col], kind="stable")
        x = g[value_col].to_numpy(np.float64)
        out = pd.DataFrame({group_col: g[group_col].to_numpy(),
                            "_ln": np.log(x), "_inv": 1.0 / x,
                            "_sq": x * x})
        agg = out.groupby(group_col, as_index=False).agg(
            n=("_ln", "size"), s_ln=("_ln", "sum"),
            s_inv=("_inv", "sum"), s_sq=("_sq", "sum"))
        return agg

    parts = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby(group_col, as_index=False).agg(
        n=("n", "sum"), s_ln=("s_ln", "sum"),
        s_inv=("s_inv", "sum"), s_sq=("s_sq", "sum"))
    n = agg["n"].to_numpy(np.int64)
    out = pd.DataFrame({
        group_col: agg[group_col],
        "n": pd.Series(n, dtype="int64"),
        "geo_mean": np.exp(agg["s_ln"].to_numpy(np.float64) / n),
        "har_mean": n / agg["s_inv"].to_numpy(np.float64),
        "rms": np.sqrt(agg["s_sq"].to_numpy(np.float64) / n),
    })
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_emd_pairs(ds: ray.data.Dataset, group_col: str,
                      value_col: str,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between every
    pair of groups' INTEGER value distributions — the distribution-
    drift measure that, unlike PSI/JSD, is bin-free and respects the
    value metric (shifting a length histogram by 5 chars moves EMD by
    5, not by 'one bin').

    ``W₁(a,b) = ∫|F_a − F_b| dv = Σᵢ |cumᵃᵢ·N_b − cumᵇᵢ·N_a|·Δvᵢ
    / (N_a·N_b)`` over the union value grid — the numerator folds in
    exact Python ints (no wrap at any cardinality), one float
    division per pair. Distributed: per-(group, value) exact counts
    collapse block-locally and finish in ONE value-hash bucket
    shuffle (all copies of a value co-locate); the driver folds
    O(groups · distinct values) skinny rows. Output:
    (group_a, group_b, emd), a < b, sorted.
    """
    def local_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([group_col, value_col], as_index=False).size()
        vc = vc.rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(vc[value_col], index=False)
        vc["_vb"] = (h % num_buckets).astype("int32")
        return vc

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby([group_col, value_col],
                             as_index=False)["n"].sum()

    hist = (ds.select_columns([group_col, value_col])
            .map_batches(local_counts, batch_format="pandas",
                         batch_size=None)
            .groupby("_vb").map_groups(per_bucket,
                                       batch_format="pandas")
            .to_pandas())
    if hist.empty:
        return pd.DataFrame({
            "group_a": pd.Series([], dtype="object"),
            "group_b": pd.Series([], dtype="object"),
            "emd": pd.Series([], dtype="float64")})
    groups = sorted(hist[group_col].unique())
    per_g = {g: hist[hist[group_col] == g]
             .sort_values(value_col) for g in groups}
    totals = {g: int(per_g[g]["n"].sum()) for g in groups}
    rows = []
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            va = per_g[a][value_col].to_numpy(np.int64)
            ca = per_g[a]["n"].to_numpy(np.int64)
            vb = per_g[b][value_col].to_numpy(np.int64)
            cb = per_g[b]["n"].to_numpy(np.int64)
            grid = np.union1d(va, vb)
            cuma = np.zeros(len(grid), np.int64)
            cumb = np.zeros(len(grid), np.int64)
            cuma[np.searchsorted(grid, va)] = ca
            cumb[np.searchsorted(grid, vb)] = cb
            cuma = cuma.cumsum()
            cumb = cumb.cumsum()
            na, nb = totals[a], totals[b]
            num = sum(abs(int(x) * nb - int(y) * na) * int(dv)
                      for x, y, dv in zip(cuma[:-1], cumb[:-1],
                                          np.diff(grid)))
            rows.append((a, b, float(num) / float(na * nb)))
    return pd.DataFrame(rows, columns=["group_a", "group_b", "emd"])


def binary_auc(ds: ray.data.Dataset, score_col: str,
               positive_mask_col: str,
               num_buckets: int = 64) -> pd.DataFrame:
    """Exact tie-corrected ROC-AUC of a score against a binary label
    (the Mann–Whitney U statistic) — the one-number ranking-quality
    gauge for any learned quality/spam score. ``positive_mask_col``
    is an int 0/1 column prepared upstream.

    From the per-score-value (n_pos, n_neg) histogram:
    ``2U = Σ_v n_posᵥ · (2·neg_below(v) + n_negᵥ)`` — ties contribute
    the standard ½ via the doubling, so the fold is EXACT Python ints
    and ``auc = 2U / (2·n₁·n₀)`` is one float division. Distributed:
    block-local (value, pos, neg) partials, ONE value-hash bucket
    shuffle, O(distinct scores) driver rows. Output one row:
    (n_pos, n_neg, auc).
    """
    def local_counts(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"v": b[score_col],
                          "y": b[positive_mask_col].astype("int64")})
        agg = g.groupby("v", as_index=False).agg(
            np_=("y", "sum"), nt=("y", "size"))
        agg["nn"] = agg["nt"] - agg["np_"]
        h = pd.util.hash_pandas_object(agg["v"], index=False)
        agg["_vb"] = (h % num_buckets).astype("int32")
        return agg[["v", "np_", "nn", "_vb"]]

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("v", as_index=False)[["np_", "nn"]].sum()

    hist = (ds.select_columns([score_col, positive_mask_col])
            .map_batches(local_counts, batch_format="pandas",
                         batch_size=None)
            .groupby("_vb").map_groups(per_bucket,
                                       batch_format="pandas")
            .to_pandas())
    hist = hist.sort_values("v")
    npos = hist["np_"].to_numpy(np.int64)
    nneg = hist["nn"].to_numpy(np.int64)
    below = np.concatenate([[0], nneg.cumsum()[:-1]])
    u2 = sum(int(p) * (2 * int(b) + int(n))
             for p, b, n in zip(npos, below, nneg))
    n1 = int(npos.sum())
    n0 = int(nneg.sum())
    auc = float(u2) / float(2 * n1 * n0) if n1 and n0 else float("nan")
    return pd.DataFrame({"n_pos": pd.Series([n1], dtype="int64"),
                         "n_neg": pd.Series([n0], dtype="int64"),
                         "auc": [auc]})


def demand_classification(ds: ray.data.Dataset, key_col: str,
                          ts_col: str, qty_col: str,
                          num_buckets: int = 64) -> pd.DataFrame:
    """Syntetos–Boylan demand classification per key (smooth /
    intermittent / erratic / lumpy) from ADI — observation periods per
    demand day — and CV² of per-demand-day sizes: the
    recrawl-frequency analogue of supply-chain demand shaping (a
    'lumpy' host deserves neither a fixed cadence nor a rate model).

    Demand days collapse block-locally to (key, day, Σqty) partials
    and finish in ONE key-hash bucket shuffle; the global period
    count is a distinct-day union of O(blocks · days) partial rows.
    Both class boundaries are EXACT integer comparisons
    (``100·P ≥ 132·D`` and ``100·(D·Σz² − S²) ≥ 49·S²`` in Python
    ints), so classification can never flip on a float rounding;
    ``adi``/``cv2`` are one float division each. Output: (key,
    n_demand_days, adi, cv2, demand_class), sorted by key.
    """
    def local_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b[ts_col].astype("datetime64[ns]").dt.normalize()
        g = pd.DataFrame({key_col: b[key_col], "_d": day,
                          "_z": b[qty_col].astype("int64")})
        agg = g.groupby([key_col, "_d"], as_index=False)["_z"].sum()
        h = pd.util.hash_pandas_object(agg[key_col], index=False)
        agg["_kb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        dd = group.groupby([key_col, "_d"], as_index=False)["_z"].sum()
        m = dd.groupby(key_col, as_index=False).agg(
            dd_n=("_z", "size"), s=("_z", "sum"))
        s2 = dd.assign(_zz=dd["_z"].astype(object) ** 2) \
            .groupby(key_col, as_index=False)["_zz"].sum()
        return m.merge(s2, on=key_col)

    partials = (ds.select_columns([key_col, ts_col, qty_col])
                .map_batches(local_partial, batch_format="pandas",
                             batch_size=None).materialize())

    moments = partials.groupby("_kb").map_groups(
        per_bucket, batch_format="pandas").to_pandas()

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_d": b["_d"].drop_duplicates()})

    days = partials.map_batches(day_partial, batch_format="pandas",
                                batch_size=None).to_pandas()
    n_periods = int(days["_d"].nunique())

    rows = []
    for _, r in moments.iterrows():
        d_n = int(r["dd_n"])
        s = int(r["s"])
        s2 = int(r["_zz"])
        var_num = d_n * s2 - s * s
        lumpy_size = 100 * var_num >= 49 * s * s
        lumpy_time = 100 * n_periods >= 132 * d_n
        cls = ("lumpy" if lumpy_time and lumpy_size else
               "intermittent" if lumpy_time else
               "erratic" if lumpy_size else "smooth")
        rows.append((r[key_col], d_n,
                     float(n_periods) / float(d_n),
                     float(var_num) / float(s * s), cls))
    out = pd.DataFrame(rows, columns=[key_col, "n_demand_days",
                                      "adi", "cv2", "demand_class"])
    out[key_col] = out[key_col].astype("int64")
    out["n_demand_days"] = out["n_demand_days"].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def calibration_bins(ds: ray.data.Dataset, score_col: str,
                     positive_mask_col: str,
                     n_bins: int = 10) -> pd.DataFrame:
    """Reliability-diagram table: scores land in ``n_bins`` equal-width
    bins over the observed [min, max] cent range and each bin reports
    its size, mean score and positive rate — the is-this-score-
    calibrated companion to :func:`binary_auc` (AUC says the ranking
    is good; calibration says the VALUES mean what they claim).

    Scores snap to exact integer cents (``round(v·100)``) and the bin
    rule is pure integer math — ``(c − lo) · n_bins // (hi − lo + 1)``
    — so bin membership can never flip on a float rounding and the
    SQL twin replays it verbatim. Two passes, no shuffle: an O(blocks)
    min/max fold, then MAP-ONLY additive (n, n_pos, Σcents) partials
    per bin; ``mean_score``/``pos_rate`` are one float division each
    of exact ints. Empty bins are dropped (SQL GROUP BY semantics).
    Output: (bin, n, n_pos, mean_score, pos_rate), sorted by bin.
    """
    def cents(b: pd.DataFrame) -> np.ndarray:
        return np.rint(b[score_col].to_numpy(np.float64)
                       * 100.0).astype(np.int64)

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        c = cents(b)
        return pd.DataFrame({"lo": [int(c.min())],
                             "hi": [int(c.max())]})

    scores = ds.select_columns([score_col, positive_mask_col]) \
        .materialize()
    mm = scores.map_batches(minmax, batch_format="pandas",
                            batch_size=None).to_pandas()
    if mm.empty:
        return pd.DataFrame({
            "bin": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "n_pos": pd.Series([], dtype="int64"),
            "mean_score": pd.Series([], dtype="float64"),
            "pos_rate": pd.Series([], dtype="float64")})
    lo = int(mm["lo"].min())
    span = int(mm["hi"].max()) - lo + 1

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = cents(b)
        g = pd.DataFrame({
            "bin": (c - lo) * n_bins // span,
            "y": b[positive_mask_col].to_numpy(np.int64),
            "c": c})
        return g.groupby("bin", as_index=False).agg(
            n=("y", "size"), n_pos=("y", "sum"), s=("c", "sum"))

    parts = scores.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    agg = parts.groupby("bin", as_index=False)[
        ["n", "n_pos", "s"]].sum()
    out = pd.DataFrame({
        "bin": agg["bin"].astype("int64"),
        "n": agg["n"].astype("int64"),
        "n_pos": agg["n_pos"].astype("int64")})
    out["mean_score"] = agg["s"].to_numpy(np.float64) \
        / (100.0 * agg["n"].to_numpy(np.float64))
    out["pos_rate"] = out["n_pos"].to_numpy(np.float64) \
        / out["n"].to_numpy(np.float64)
    return out.sort_values("bin").reset_index(drop=True)


def rfm_segments(ds: ray.data.Dataset, key_col: str, ts_col: str,
                 value_col: str, n_tiles: int = 5,
                 num_buckets: int = 64) -> pd.DataFrame:
    """RFM segmentation: per key the Recency (days from the key's
    last activity to the corpus max date), Frequency (row count) and
    Monetary (Σ exact cents) plus a 1..n_tiles quantile score per
    dimension — the classic prioritization grid, reused here to rank
    hosts/users for recrawl and sampling budgets.

    Per-key (max-day, count, Σcents) partials are associative and
    finish in ONE key-hash bucket shuffle; each dimension's score
    boundaries come from the exact integer-ceil discrete-quantile
    rule (``smallest v with cum ≥ ceil(q·n)``, q = i/n_tiles) over
    the key-level value histogram, DUPLICATE boundaries collapse, and
    ``score = 1 + #{distinct bounds < v}`` — ties land LOW, exactly
    the SQL twin's window replay, so no float ever decides a score.
    Output: (key, r_days, n_rows, value_cents, r_score, f_score,
    m_score, rfm), sorted by key.
    """
    nsd = 86_400_000_000_000  # ns per day

    def local_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (pd.to_datetime(b[ts_col]).astype("datetime64[ns]")
               .astype("int64") // nsd)
        cents = np.rint(b[value_col].to_numpy(np.float64)
                        * 100.0).astype(np.int64)
        g = pd.DataFrame({key_col: b[key_col].astype("int64"),
                          "_d": day, "_c": cents})
        agg = g.groupby(key_col, as_index=False).agg(
            _dmax=("_d", "max"), _n=("_d", "size"), _s=("_c", "sum"))
        h = pd.util.hash_pandas_object(agg[key_col], index=False)
        agg["_kb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby(key_col, as_index=False).agg(
            _dmax=("_dmax", "max"), _n=("_n", "sum"), _s=("_s", "sum"))

    keys = (ds.select_columns([key_col, ts_col, value_col])
            .map_batches(local_partial, batch_format="pandas",
                         batch_size=None)
            .groupby("_kb").map_groups(per_bucket,
                                       batch_format="pandas")
            .to_pandas())
    if keys.empty:
        return pd.DataFrame({
            key_col: pd.Series([], dtype="int64"),
            "r_days": pd.Series([], dtype="int64"),
            "n_rows": pd.Series([], dtype="int64"),
            "value_cents": pd.Series([], dtype="int64"),
            "r_score": pd.Series([], dtype="int64"),
            "f_score": pd.Series([], dtype="int64"),
            "m_score": pd.Series([], dtype="int64"),
            "rfm": pd.Series([], dtype="object")})
    gmax = int(keys["_dmax"].max())
    out = pd.DataFrame({
        key_col: keys[key_col].astype("int64"),
        "r_days": (gmax - keys["_dmax"]).astype("int64"),
        "n_rows": keys["_n"].astype("int64"),
        "value_cents": keys["_s"].astype("int64")})

    def scores(v: pd.Series) -> np.ndarray:
        vals, counts = np.unique(v.to_numpy(np.int64),
                                 return_counts=True)
        bounds = sorted({_disc_quantile(vals, counts, q / n_tiles)
                         for q in range(1, n_tiles)})
        s = np.ones(len(v), dtype=np.int64)
        for b in bounds:
            s += (v.to_numpy(np.int64) > b).astype(np.int64)
        return s

    out["r_score"] = scores(out["r_days"])
    out["f_score"] = scores(out["n_rows"])
    out["m_score"] = scores(out["value_cents"])
    out["rfm"] = (out["r_score"].astype(str)
                  + out["f_score"].astype(str)
                  + out["m_score"].astype(str))
    return out.sort_values(key_col).reset_index(drop=True)


def grouped_top_share(ds: ray.data.Dataset, group_col: str,
                      value_col: str, top_denominator: int = 100,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Whale concentration per group: the share of a group's total
    value carried by its top ``1/top_denominator`` fraction of rows
    (k = ceil(n/denominator), descending by value) — the
    is-this-metric-driven-by-a-few-outliers gauge.

    The top-k SUM never needs ids: from the per-(group, value-cents)
    histogram, ``top = Σ_{v>cutoff} v·c + (k − n_above)·cutoff``
    where the cutoff is the largest value whose descending
    cumulative count reaches k — tie-proof and partitioning-proof.
    Block-local histogram partials are additive and finish in ONE
    group-hash shuffle; value sums fold in exact PYTHON ints (no
    int64 wrap at any scale) and ``top_share`` is one float division
    replayed by the HUGEINT SQL twin. Output: (group, n_rows, k,
    top_value_cents, total_value_cents, top_share), sorted.
    """
    def local(b: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(b[value_col].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({group_col: b[group_col], "_v": c})
        agg = g.groupby([group_col, "_v"], as_index=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(agg[group_col].astype(str),
                                       index=False)
        agg["_gb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        hist = group.groupby([group_col, "_v"], as_index=False)[
            "n"].sum()
        for gval, gh in hist.groupby(group_col):
            gh = gh.sort_values("_v", ascending=False)
            vs = gh["_v"].tolist()
            cs = gh["n"].tolist()
            n = sum(cs)
            k = (n + top_denominator - 1) // top_denominator
            tot = 0
            top = 0
            above = 0
            cum = 0
            cutoff = None
            for v, c in zip(vs, cs):
                tot += int(v) * int(c)
                cum += int(c)
                if cutoff is None and cum >= k:
                    cutoff = int(v)
                    above = cum - int(c)
                elif cutoff is None:
                    top += int(v) * int(c)
            top += (k - above) * cutoff
            rows.append((gval, n, k, top, tot))
        return pd.DataFrame(rows, columns=[
            group_col, "n_rows", "k", "top_value_cents",
            "total_value_cents"])

    out = (ds.select_columns([group_col, value_col])
           .map_batches(local, batch_format="pandas",
                        batch_size=None)
           .groupby("_gb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_rows": pd.Series([], dtype="int64"),
            "k": pd.Series([], dtype="int64"),
            "top_value_cents": pd.Series([], dtype="int64"),
            "total_value_cents": pd.Series([], dtype="int64"),
            "top_share": pd.Series([], dtype="float64")})
    for c in ("n_rows", "k", "top_value_cents", "total_value_cents"):
        out[c] = out[c].astype("int64")
    out["top_share"] = out["top_value_cents"].to_numpy(np.float64) \
        / out["total_value_cents"].to_numpy(np.float64)
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_hhi(ds: ray.data.Dataset, group_col: str,
                member_col: str, cents_col: str,
                num_buckets: int = 64) -> pd.DataFrame:
    """Herfindahl–Hirschman concentration of value across members
    within each group (HHI = Σ shareᵢ² = Σ revᵢ² / (Σ revᵢ)²) — the
    single-supplier-risk / single-host-dominance gauge; 1/n_members
    means perfectly even, 1.0 means a monopoly.

    Per-(group, member) cent sums collapse block-locally and finish
    in ONE pair-hash bucket shuffle; the squares fold in exact PYTHON
    ints (revᵢ² overflows int64 long before the data gets
    interesting) and ``hhi = float(Σrev²) / float((Σrev)²)`` is one
    division of two exact integers, replayed by the HUGEINT SQL
    twin. Output: (group, n_members, total_cents, hhi), sorted.
    """
    def local(b: pd.DataFrame) -> pd.DataFrame:
        agg = b.groupby([group_col, member_col], as_index=False)[
            cents_col].sum().rename(columns={cents_col: "_r"})
        h = pd.util.hash_pandas_object(
            agg[group_col].astype(str) + "\x00"
            + agg[member_col].astype(str), index=False)
        agg["_pb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        pc = group.groupby([group_col, member_col], as_index=False)[
            "_r"].sum()
        rows = []
        for gval, gh in pc.groupby(group_col):
            revs = [int(r) for r in gh["_r"].tolist()]
            rows.append((gval, len(revs), sum(revs),
                         str(sum(r * r for r in revs))))
        return pd.DataFrame(rows, columns=[
            group_col, "n_members", "total_cents", "_sq"])

    parts = (ds.select_columns([group_col, member_col, cents_col])
             .map_batches(local, batch_format="pandas",
                          batch_size=None)
             .groupby("_pb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_members": pd.Series([], dtype="int64"),
            "total_cents": pd.Series([], dtype="int64"),
            "hhi": pd.Series([], dtype="float64")})
    rows = []
    for gval, gh in parts.groupby(group_col):
        n_m = int(gh["n_members"].sum())
        tot = int(gh["total_cents"].astype(object).sum())
        sq = sum(int(v) for v in gh["_sq"].tolist())
        rows.append((gval, n_m, tot, float(sq) / float(tot * tot)))
    out = pd.DataFrame(rows, columns=[group_col, "n_members",
                                      "total_cents", "hhi"])
    out["n_members"] = out["n_members"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def conditional_decile_profile(ds: ray.data.Dataset, x_col: str,
                               y_col: str, x_scale: int = 10_000,
                               y_scale: int = 100,
                               n_tiles: int = 10,
                               num_buckets: int = 64) -> pd.DataFrame:
    """Binned conditional means — the model-free elasticity read:
    rows land in exact-integer-ceil deciles of ``x`` (ties low,
    duplicate boundaries collapse, the :func:`rfm_segments` rule) and
    each decile reports its size and the exact mean of both
    variables, so 'what happens to y as x climbs' is answerable
    without fitting anything.

    Two passes: the x histogram (block-local value counts, one
    x-hash fold to the driver's O(distinct x) boundary fit), then
    MAP-ONLY additive (n, Σx, Σy) partials per decile. Means are one
    float division each of exact scaled ints. Output: (decile, n,
    mean_x, mean_y), sorted by decile.
    """
    def xints(b: pd.DataFrame) -> np.ndarray:
        return np.rint(b[x_col].to_numpy(np.float64)
                       * float(x_scale)).astype(np.int64)

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(xints(b), return_counts=True)
        return pd.DataFrame({"v": v, "c": c.astype("int64")})

    src = ds.select_columns([x_col, y_col]).materialize()
    h = src.map_batches(hist, batch_format="pandas",
                        batch_size=None).to_pandas()
    if h.empty:
        return pd.DataFrame({
            "decile": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "mean_x": pd.Series([], dtype="float64"),
            "mean_y": pd.Series([], dtype="float64")})
    hh = h.groupby("v", as_index=False)["c"].sum().sort_values("v")
    vals = hh["v"].to_numpy(np.int64)
    cnts = hh["c"].to_numpy(np.int64)
    bounds = sorted({_disc_quantile(vals, cnts, q / n_tiles)
                     for q in range(1, n_tiles)})
    barr = np.asarray(bounds, dtype=np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        xi = xints(b)
        yi = np.rint(b[y_col].to_numpy(np.float64)
                     * float(y_scale)).astype(np.int64)
        # decile − 1 = #{bounds strictly below x}: searchsorted
        # side='left' returns the first index with bound >= x, so a
        # value equal to a boundary lands LOW (the ceil-rule tie)
        dec = (np.searchsorted(barr, xi, side="left")
               if len(barr) else np.zeros(len(xi), dtype=np.int64))
        g = pd.DataFrame({"d": dec, "x": xi, "y": yi})
        return g.groupby("d", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))

    parts = src.map_batches(partial, batch_format="pandas",
                            batch_size=None).to_pandas()
    agg = parts.groupby("d", as_index=False)[["n", "sx", "sy"]].sum()
    out = pd.DataFrame({"decile": agg["d"].astype("int64") + 1,
                        "n": agg["n"].astype("int64")})
    out["mean_x"] = agg["sx"].to_numpy(np.float64) \
        / (float(x_scale) * agg["n"].to_numpy(np.float64))
    out["mean_y"] = agg["sy"].to_numpy(np.float64) \
        / (float(y_scale) * agg["n"].to_numpy(np.float64))
    return out.sort_values("decile").reset_index(drop=True)


def jain_fairness(ds: ray.data.Dataset, group_col: str,
                  num_buckets: int = 64) -> pd.DataFrame:
    """Jain's fairness index over per-group row counts,
    ``J = (Σx)² / (n · Σx²)`` — the one-number crawl-fairness audit
    (J = 1 when every host got the same share of the fetch budget,
    J → 1/n when one host ate it). The gauge a politeness scheduler
    checks before blaming throughput on the long tail.

    Scale shape: per-block (group, n) count partials (map-only,
    additive) finish in ONE group-hash bucket shuffle, so each
    group's exact total exists in exactly one bucket; each bucket
    then collapses to ONE (k, Σx, Σx², min, max) partial with Σx²
    carried as a decimal STRING (x² outgrows int64 at ~3 B rows per
    group; the exact Python-int fold survives any magnitude — the
    :func:`grouped_hhi` idiom). The driver folds O(buckets) rows;
    ``jain`` is the single float division float(S·S)/float(n·Q) of
    exact ints, matching the SQL twin's HUGEINT-cast-DOUBLE form
    bit-for-bit. Output one row:
    (n_groups, total_rows, min_n, max_n, jain)."""
    from .windows import _add_key_bucket

    def block_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(group_col, as_index=False).size() \
            .rename(columns={"size": "x"})
        out["x"] = out["x"].astype("int64")
        return out

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(group_col, as_index=False)["x"].sum()
        xs = [int(v) for v in tot["x"]]
        return pd.DataFrame({
            "k": pd.Series([len(xs)], dtype="int64"),
            "s": pd.Series([sum(xs)], dtype="int64"),
            "q_str": pd.Series([str(sum(v * v for v in xs))],
                               dtype="object"),
            "mn": pd.Series([min(xs)], dtype="int64"),
            "mx": pd.Series([max(xs)], dtype="int64")})

    parts = (_add_key_bucket(
        ds.select_columns([group_col]).map_batches(
            block_counts, batch_format="pandas", batch_size=None),
        group_col, num_buckets)
        .groupby("_sbucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "n_groups": pd.Series([0], dtype="int64"),
            "total_rows": pd.Series([0], dtype="int64"),
            "min_n": pd.Series([0], dtype="int64"),
            "max_n": pd.Series([0], dtype="int64"),
            "jain": pd.Series([float("nan")], dtype="float64")})
    n = int(parts["k"].sum())
    S = int(parts["s"].sum())
    Q = sum(int(v) for v in parts["q_str"])   # exact past int64
    return pd.DataFrame({
        "n_groups": pd.Series([n], dtype="int64"),
        "total_rows": pd.Series([S], dtype="int64"),
        "min_n": pd.Series([int(parts["mn"].min())], dtype="int64"),
        "max_n": pd.Series([int(parts["mx"].max())], dtype="int64"),
        "jain": pd.Series([float(S * S) / float(n * Q)],
                          dtype="float64")})


def mann_whitney_u(ds: ray.data.Dataset, value_col: str,
                   label_col: str, label_a: str,
                   label_b: str) -> pd.DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) between the
    integer-cents value distributions of two labels, EXACT: ranks,
    tie correction and the U statistic are pure integer arithmetic
    over the distinct-value count histogram, so no float rank sum
    ever exists — the normal-approximation ``z`` is the last step,
    one expression over exact integers that the SQL twin mirrors
    operation-for-operation.

    With midrank tie handling, twice the rank of every row sharing a
    distinct value v is the INTEGER ``2·cum_less(v) + t(v) + 1`` (the
    :func:`spearman_corr` idiom), so twice the rank sum of side a is
    ``R2 = Σ_v ca(v)·(2L+t+1)`` and ``2·U_a = R2 − n_a(n_a+1)``.
    The tie term ``T = Σ (t³−t)`` feeds the tie-corrected variance

        4·var = n_a·n_b·(n(n−1)(n+1) − T) / (3·n(n−1))
        z     = (2·U_a − n_a·n_b) / √(4·var)

    — both sides of the division exact ints (T ≤ n³ and 2U ≤ n²
    outgrow int64 beyond ~2M-row tie groups / ~3B rows; carried as
    Python ints through the fold and emitted as decimal STRINGS, the
    :func:`grouped_hhi` idiom, matching the twin's HUGEINT→VARCHAR
    cast). The common-language effect size ``cles = U_a/(n_a·n_b)``
    is one exact division.

    Scale shape: identical to :func:`two_sample_ks` — one streaming
    pass emits per-block (cents, count_a, count_b) partials; the
    driver folds O(distinct values) rows (bounded-dynamic-range
    contract; route through a value-bucketed shuffle first for
    unbounded domains). Output one row:
    (n_a, n_b, u_a2, tie_t, z, cles) where ``u_a2 = 2·U_a``."""
    import math

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b[label_col].isin((label_a, label_b))
        k = b.loc[m]
        cents = np.rint(k[value_col].to_numpy() * 100).astype("int64")
        isa = (k[label_col] == label_a).to_numpy().astype("int64")
        g = pd.DataFrame({"cents": cents, "ca": isa, "cb": 1 - isa})
        return g.groupby("cents", as_index=False)[["ca", "cb"]].sum()

    parts = ds.select_columns([value_col, label_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    empty_z = float("nan")
    if parts.empty:
        return pd.DataFrame({
            "n_a": pd.Series([0], dtype="int64"),
            "n_b": pd.Series([0], dtype="int64"),
            "u_a2": pd.Series(["0"], dtype="object"),
            "tie_t": pd.Series(["0"], dtype="object"),
            "z": pd.Series([empty_z], dtype="float64"),
            "cles": pd.Series([empty_z], dtype="float64")})
    c = parts.groupby("cents", as_index=False)[["ca", "cb"]].sum() \
        .sort_values("cents")
    ca = [int(v) for v in c["ca"]]
    cb = [int(v) for v in c["cb"]]
    na, nb = sum(ca), sum(cb)
    n = na + nb
    r2 = 0          # Σ ca·(2·cum_less + t + 1), exact
    tie_t = 0       # Σ t³ − t, exact (Python int past int64)
    less = 0
    for a_i, b_i in zip(ca, cb):
        t = a_i + b_i
        r2 += a_i * (2 * less + t + 1)
        tie_t += t * t * t - t
        less += t
    u_a2 = r2 - na * (na + 1)
    if na == 0 or nb == 0 or n < 2:
        z = cles = empty_z
    else:
        var4_num = na * nb * (n * (n - 1) * (n + 1) - tie_t)
        var4_den = 3 * n * (n - 1)
        var4 = float(var4_num) / float(var4_den)
        z = (float(u_a2 - na * nb) / math.sqrt(var4)
             if var4 > 0 else empty_z)
        cles = float(u_a2) / float(2 * na * nb)
    return pd.DataFrame({
        "n_a": pd.Series([na], dtype="int64"),
        "n_b": pd.Series([nb], dtype="int64"),
        "u_a2": pd.Series([str(u_a2)], dtype="object"),
        "tie_t": pd.Series([str(tie_t)], dtype="object"),
        "z": pd.Series([z], dtype="float64"),
        "cles": pd.Series([cles], dtype="float64")})


# ---------------------------------------------------------------------------
# Poisson bootstrap — deterministic, hash-derived replicates
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to 2^32, floor'd to EXACT ints and
# hardcoded identically in the SQL twin: multiplicity k = number of
# thresholds ≤ h for h uniform on [0, 2^32). No float ever crosses the
# comparison, so engine and oracle agree bit-for-bit.
POISSON1_T32 = (1580030168, 3160060337, 3950075421, 4213413783,
                4279248373, 4292415291, 4294609777, 4294923276)
_BOOT_A = 2654435761          # Knuth multiplicative hash constants
_BOOT_C = 40503


def poisson_bootstrap(ds: ray.data.Dataset, key_col: str,
                      value_col: str, n_replicates: int = 64
                      ) -> pd.DataFrame:
    """Deterministic Poisson bootstrap of a mean — THE bootstrap that
    works at 100 TB: instead of resampling n rows with replacement
    (which needs a global index), every row independently joins
    replicate b with multiplicity ~ Poisson(1), drawn from the exact
    integer hash ``(key·2654435761 + b·40503) mod 2^32`` against
    hardcoded CDF thresholds — one streaming pass computes ALL
    replicates' partial sums at once, no shuffle, no RNG state.

    Values are carried as exact integer cents (``round(value·100)``),
    so per-replicate totals are order-free exact ints; the mean is one
    float division at the end (bit-equal to the SQL twin). Output:
    ``(replicate, n_eff, total_cents, mean)`` for b = 0..B−1; the
    percentile CI is an order statistic of this table.
    """
    import pyarrow as pa

    B = int(n_replicates)
    tarr = np.asarray(POISSON1_T32, dtype=np.uint64)
    bvec = np.arange(B, dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        h = (keys[:, None] * np.uint64(_BOOT_A)
             + bvec[None, :] * np.uint64(_BOOT_C)) \
            & np.uint64(0xFFFFFFFF)
        mult = np.searchsorted(tarr, h.ravel(),
                               side="right").reshape(h.shape)
        return pa.table({
            "replicate": pa.array(np.arange(B, dtype=np.int64)),
            "n_eff": pa.array(mult.sum(axis=0).astype(np.int64)),
            "total_cents": pa.array(
                (mult * cents[:, None]).sum(axis=0).astype(np.int64)),
        })

    parts = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("replicate", as_index=False)[
        ["n_eff", "total_cents"]].sum()
    agg["mean"] = [tc / (100.0 * n) if n else 0.0
                   for tc, n in zip(agg["total_cents"], agg["n_eff"])]
    return agg.astype({"replicate": "int64", "n_eff": "int64",
                       "total_cents": "int64"}) \
        .sort_values("replicate").reset_index(drop=True)


def grouped_ks_fdr(ds: ray.data.Dataset, value_col: str,
                   group_col: str, alpha: float = 0.25) -> pd.DataFrame:
    """One-vs-rest two-sample KS test per group + Benjamini–Hochberg
    FDR control across the family — the drift screen that asks
    "WHICH segments' value distributions differ, at a controlled
    false-discovery rate?" instead of m uncorrected tests.

    The KS statistic stays EXACT integers (the ``two_sample_ks``
    cross-multiplication: sup|cum_g·n_rest − cum_rest·n_g|, no float
    CDF); ONE streaming pass emits per-(group, cents) count partials
    and every group's test folds from the same O(groups × distinct
    values) table. The p-value is the documented one-term asymptotic
    ``min(1, 2·exp(−2·(n·m/(n+m))·D²))`` — same closed-form on both
    sides. BH: rank p ascending (ties by group), reject ranks ≤ k*
    where k* = max{k : p₍ₖ₎ ≤ k·α/m}; the p-vs-threshold margins are
    pytest-asserted to dwarf libm drift. Output per group:
    (group, n_g, n_rest, ks_num, d_stat, p_value, bh_rank,
    bh_threshold, rejected)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b[value_col].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"g": b[group_col].to_numpy(), "cents": cents})
        out = g.groupby(["g", "cents"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = ds.select_columns([value_col, group_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    tab = parts.groupby(["g", "cents"], as_index=False)["n"].sum()
    groups = sorted(tab["g"].unique())
    m = len(groups)
    domain = np.sort(tab["cents"].unique())
    pos = {c: i for i, c in enumerate(domain)}
    counts = np.zeros((m, len(domain)), dtype=np.int64)
    gidx = {g: i for i, g in enumerate(groups)}
    for g, c, n in zip(tab["g"], tab["cents"], tab["n"]):
        counts[gidx[g], pos[c]] += int(n)
    total = counts.sum(axis=0)
    rows = []
    for g in groups:
        cg = counts[gidx[g]]
        cr = total - cg
        ng, nr = int(cg.sum()), int(cr.sum())
        cum_g = np.cumsum(cg)
        cum_r = np.cumsum(cr)
        ks_num = int(np.abs(cum_g * nr - cum_r * ng).max())
        d = float(ks_num) / (float(ng) * float(nr))
        ne = (float(ng) * float(nr)) / (float(ng) + float(nr))
        p = min(1.0, 2.0 * math.exp(-2.0 * ne * d * d))
        rows.append([g, ng, nr, ks_num, d, p])
    out = pd.DataFrame(rows, columns=[
        "group", "n_g", "n_rest", "ks_num", "d_stat", "p_value"])
    out = out.sort_values(["p_value", "group"],
                          kind="stable").reset_index(drop=True)
    out["bh_rank"] = np.arange(1, m + 1, dtype=np.int64)
    out["bh_threshold"] = [k * alpha / m for k in out["bh_rank"]]
    passing = out.index[out["p_value"] <= out["bh_threshold"]]
    k_star = int(out["bh_rank"][passing.max()]) if len(passing) else 0
    out["rejected"] = out["bh_rank"] <= k_star
    return out.astype({"n_g": "int64", "n_rest": "int64",
                       "ks_num": "int64", "bh_rank": "int64"}) \
        .sort_values("group").reset_index(drop=True)


def isotonic_calibration(ds: ray.data.Dataset, value_col: str,
                         label_col: str, positive: str,
                         bin_width: float = 10.0,
                         n_bins: int = 10) -> pd.DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a binary
    rate over value bins — the PAVA fit that turns a noisy
    rate-by-bucket curve into the best monotone step function (the
    calibration layer over a raw model score). Bins:
    ``min(floor(value / bin_width), n_bins − 1)``.

    Deterministic replay recipe: the corpus collapses to per-bin
    ``(n, n_pos)`` integer partials in one streaming pass; PAVA runs
    on the driver over O(bins) pools. The SQL twin does NOT simulate
    the pool-merge loop — it evaluates the equivalent minimax
    characterization ``iso[i] = max_{j≤i} min_{k≥i}
    mean(pos, j..k)`` over the same prefix sums, every candidate mean
    being ONE double division of exact ints, which is bit-equal to
    the pooled mean PAVA computes for the winning pool. The identity
    holds for real numbers; the only way doubles can diverge is two
    distinct rational means rounding together — the inter-mean margin
    is pytest-asserted. Output per bin: (bin, n, n_pos, rate,
    iso_rate)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64)
        binv = np.minimum(np.floor(v / bin_width),
                          n_bins - 1).astype(np.int64)
        pos = (b[label_col] == positive).to_numpy().astype(np.int64)
        g = pd.DataFrame({"bin": binv, "n": 1, "n_pos": pos})
        return g.groupby("bin", as_index=False)[["n", "n_pos"]].sum()

    parts = ds.select_columns([value_col, label_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("bin", as_index=False)[["n", "n_pos"]].sum() \
        .sort_values("bin").reset_index(drop=True)
    # PAVA over pools of (sum_pos, sum_n): merge while decreasing
    pools: list[list] = []     # [bin_start, n, pos]
    for _, r in agg.iterrows():
        pools.append([int(r["bin"]), int(r["n"]), int(r["n_pos"])])
        while len(pools) > 1 and \
                (pools[-2][2] / pools[-2][1]
                 >= pools[-1][2] / pools[-1][1]):
            b2 = pools.pop()
            pools[-1][1] += b2[1]
            pools[-1][2] += b2[2]
    iso = {}
    for i, (start, n, p) in enumerate(pools):
        end = pools[i + 1][0] if i + 1 < len(pools) else None
        val = p / n
        for b in agg["bin"]:
            if b >= start and (end is None or b < end):
                iso[int(b)] = val
    out = agg.copy()
    out["rate"] = [p / n for p, n in zip(out["n_pos"], out["n"])]
    out["iso_rate"] = [iso[int(b)] for b in out["bin"]]
    return out.astype({"bin": "int64", "n": "int64",
                       "n_pos": "int64"})


def simpson_flags(ds: ray.data.Dataset) -> pd.DataFrame:
    """Simpson's-paradox detector for the qty↔discount relationship:
    does any brand's within-group regression slope point the OPPOSITE
    way from the pooled slope? The aggregation-bias audit every
    segment-level conclusion needs.

    The FLAG is exact-integer: sign(slope) = sign(n·Σxy − Σx·Σy)
    because the denominator n·Σxx − Σx² is a nonnegative variance —
    no float ever decides a flip. Slopes themselves are emitted as
    one cast-and-divide double. One skinny partial-agg pass carries
    (n, Σx, Σy, Σxy, Σxx) per brand in exact ints (x = quantity
    units, y = discount cents). Output per brand: (p_brand, n,
    slope_num, slope, pooled row via brand='_ALL_', flipped)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(b["l_quantity"].to_numpy(np.float64)) \
            .astype(np.int64)
        y = np.rint(b["l_discount"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        g = pd.DataFrame({"p_brand": b["p_brand"].to_numpy(),
                          "n": 1, "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x})
        return g.groupby("p_brand", as_index=False)[
            ["n", "sx", "sy", "sxy", "sxx"]].sum()

    parts = ds.select_columns(
        ["p_brand", "l_quantity", "l_discount"]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("p_brand", as_index=False)[
        ["n", "sx", "sy", "sxy", "sxx"]].sum()

    def nums(row):
        n, sx, sy, sxy, sxx = (int(row["n"]), int(row["sx"]),
                               int(row["sy"]), int(row["sxy"]),
                               int(row["sxx"]))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        return num, den

    tot = agg[["n", "sx", "sy", "sxy", "sxx"]].sum()
    pn = int(tot["n"]) * int(tot["sxy"]) - int(tot["sx"]) * int(tot["sy"])
    pd_ = int(tot["n"]) * int(tot["sxx"]) - int(tot["sx"]) ** 2
    pooled_slope = float(pn) / float(pd_) if pd_ else float("nan")
    rows = []
    for _, r in agg.iterrows():
        num, den = nums(r)
        slope = float(num) / float(den) if den else float("nan")
        flipped = (num > 0 > pn) or (num < 0 < pn)
        rows.append((r["p_brand"], int(r["n"]), num, slope,
                     pooled_slope, flipped))
    out = pd.DataFrame(rows, columns=[
        "p_brand", "n", "slope_num", "slope", "pooled_slope",
        "flipped"]).astype({"n": "int64", "slope_num": "int64"})
    return out.sort_values("p_brand").reset_index(drop=True)


def hill_tail_index(ds: ray.data.Dataset, value_col: str = "n_chars",
                    id_col: str = "doc_id", k: int = 50) -> pd.DataFrame:
    """Hill estimator of the power-law tail index over a size column
    — the principled tail read next to the regression-on-log-log
    ``zipf_slope``: 1/α̂ = (1/k)·Σ_{i≤k} ln(x_(i) / x_(k+1)) over the
    k largest values (ties broken by id — the deterministic order
    statistic). Heavy tails (α ≤ 2: infinite variance) are what break
    mean-based capacity planning; this quantifies them.

    One distributed partial top-(k+1) per block (the ``brute_force_
    topk`` shape for scalars), O(blocks·k) driver merge; the log-sum
    is tolerance-registered vs the SQL twin's QUALIFY ranking.
    Output one row: (k, x_tail, mean_log_ratio, tail_alpha)."""
    import math

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values([value_col, id_col],
                          ascending=[False, True],
                          kind="stable").head(k + 1)
        return s[[value_col, id_col]]

    parts = ds.select_columns([value_col, id_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    top = sorted(zip(parts[value_col].astype(int),
                     parts[id_col].astype(int)),
                 key=lambda t: (-t[0], t[1]))[:k + 1]
    if len(top) < k + 1:
        raise ValueError("corpus smaller than k+1")
    x_tail = top[k][0]
    s = 0.0
    for v, _ in top[:k]:
        s += math.log(v / x_tail)
    mean_log = s / k
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "x_tail": pd.Series([x_tail], dtype="int64"),
        "mean_log_ratio": [mean_log],
        "tail_alpha": [1.0 / mean_log if mean_log > 0
                       else float("inf")]})


def welch_t_by_group(ds: ray.data.Dataset, value_col: str,
                     group_col: str) -> pd.DataFrame:
    """One-vs-rest Welch t-test per group on an integer-valued column
    — the parametric mean-shift companion to the exact-integer KS
    screen (``grouped_ks_fdr``): unequal variances, Welch-
    Satterthwaite degrees of freedom. Moments are EXACT integers from
    one streaming pass (n, Σx, Σx² per group); the t statistic and df
    are the only floats, built as the identical expression on both
    sides (tolerance-registered — sqrt/compounded division ulps).
    Output per group: (group, n_g, n_rest, mean_g, mean_rest,
    t_stat, df)."""
    import math

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[value_col].to_numpy().astype(np.int64)
        g = pd.DataFrame({"g": b[group_col].to_numpy(), "n": 1,
                          "sx": x, "sxx": x * x})
        return g.groupby("g", as_index=False)[["n", "sx", "sxx"]].sum()

    parts = ds.select_columns([value_col, group_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("g", as_index=False)[["n", "sx", "sxx"]].sum()
    tn = int(agg["n"].sum())
    tsx = int(agg["sx"].sum())
    tsxx = int(agg["sxx"].sum())
    rows = []
    for _, r in agg.iterrows():
        n1, sx1, sxx1 = int(r["n"]), int(r["sx"]), int(r["sxx"])
        n2, sx2, sxx2 = tn - n1, tsx - sx1, tsxx - sxx1
        m1 = float(sx1) / float(n1)
        m2 = float(sx2) / float(n2)
        v1 = (float(sxx1) - float(sx1) * float(sx1) / float(n1)) \
            / float(n1 - 1)
        v2 = (float(sxx2) - float(sx2) * float(sx2) / float(n2)) \
            / float(n2 - 1)
        se1 = v1 / float(n1)
        se2 = v2 / float(n2)
        t = (m1 - m2) / math.sqrt(se1 + se2)
        # explicit multiply, not **2: libm pow(x,2) can differ from
        # x·x in the last ulp, and the SQL twin multiplies
        df = (se1 + se2) * (se1 + se2) \
            / (se1 * se1 / float(n1 - 1) + se2 * se2 / float(n2 - 1))
        rows.append((r["g"], n1, n2, m1, m2, t, df))
    out = pd.DataFrame(rows, columns=[
        "group", "n_g", "n_rest", "mean_g", "mean_rest", "t_stat",
        "df"]).astype({"n_g": "int64", "n_rest": "int64"})
    return out.sort_values("group").reset_index(drop=True)
