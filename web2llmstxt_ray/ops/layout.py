"""Range-partitioned storage layout — the sorted-data primitive.

``write_range_partitioned`` samples quantile boundaries (t-digest over
one pass), assigns each row a range partition with a vectorized
searchsorted, and writes one parquet directory per partition plus a
boundaries manifest. ``read_range_partitioned`` then serves range
queries by reading ONLY the overlapping partitions (directory-level
pruning — the same contract as a lakehouse sorted table / Iceberg
sort order) and applying the residual predicate inside the read.

At 100 TB this is what turns "scan everything and filter" into an
O(selectivity) read; partitions are also the resume/skip unit (a
failed writer re-runs one directory, never one giant file).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .sketch import TDigest


def range_boundaries(ds: ray.data.Dataset, col: str,
                     num_parts: int, delta: int = 400) -> list[float]:
    """num_parts−1 interior split points from a one-pass t-digest."""
    merged = TDigest(delta)
    for row in ds.select_columns([col]).map_batches(
            lambda b: {"d": np.array(
                [TDigest(delta).add(b[col].astype(np.float64)).dumps()],
                dtype=object)},
            batch_format="numpy", batch_size=None).take_all():
        merged.merge(TDigest.loads(row["d"]))
    qs = [i / num_parts for i in range(1, num_parts)]
    bounds = sorted({merged.quantile(q) for q in qs})
    return [float(b) for b in bounds]


def assign_range_parts(ds: ray.data.Dataset, col: str,
                       bounds: list[float]) -> ray.data.Dataset:
    """Append ``_range_part`` = searchsorted(bounds, v, 'right')."""
    barr = np.asarray(bounds, dtype=np.float64)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        b = b.copy()
        b["_range_part"] = np.searchsorted(
            barr, v, side="right").astype(np.int32)
        return b

    return ds.map_batches(assign, batch_format="pandas",
                          batch_size=None)


def write_range_partitioned(ds: ray.data.Dataset, path: str, col: str,
                            num_parts: int, delta: int = 400) -> dict:
    """Write ``ds`` under ``path`` as part_0000/…/part_NNNN parquet
    directories ordered by ``col`` ranges; returns the manifest
    (also persisted as ``_layout.json``, written last)."""
    bounds = range_boundaries(ds, col, num_parts, delta)
    parted = assign_range_parts(ds, col, bounds)
    os.makedirs(path, exist_ok=True)
    parted.write_parquet(path, partition_cols=["_range_part"])
    manifest = {"col": col, "bounds": bounds,
                "num_parts": len(bounds) + 1}
    tmp = os.path.join(path, "._layout.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_layout.json"))
    return manifest


def parts_for_range(bounds: list[float], lo: float | None,
                    hi: float | None) -> list[int]:
    """Partition ids overlapping [lo, hi) — the pruning decision."""
    n = len(bounds) + 1
    first = 0 if lo is None else int(
        np.searchsorted(np.asarray(bounds), lo, side="right"))
    last = n - 1 if hi is None else int(
        np.searchsorted(np.asarray(bounds), hi, side="left"))
    return list(range(first, min(last, n - 1) + 1))


def read_range_partitioned(path: str, lo: float | None = None,
                           hi: float | None = None) -> ray.data.Dataset:
    """Range read with directory pruning + residual filter.

    Only partitions overlapping [lo, hi) are handed to
    ``read_parquet``; the residual predicate re-applies exactly inside
    ``map_batches`` (boundary partitions contain out-of-range rows)."""
    with open(os.path.join(path, "_layout.json")) as f:
        manifest = json.load(f)
    col = manifest["col"]
    keep = parts_for_range(manifest["bounds"], lo, hi)
    dirs = [os.path.join(path, f"_range_part={p}") for p in keep]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(files)

    def residual(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        m = np.ones(len(b), dtype=bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v < hi
        return b[m]

    if lo is None and hi is None:
        return ds
    return ds.map_batches(residual, batch_format="pandas",
                          batch_size=None)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout — multi-column pruning
# ---------------------------------------------------------------------------


def _spread_bits_32(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the bits of uint32 values → uint64
    (the classic Morton spread with magic masks, fully vectorized)."""
    v = x.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def zorder_values(a: np.ndarray, b: np.ndarray,
                  a_range: tuple[float, float],
                  b_range: tuple[float, float],
                  bits: int = 16) -> np.ndarray:
    """Morton/Z-value of two numeric columns: each value quantized to
    ``bits`` levels over its declared range, bits interleaved → one
    sortable uint64 key under which rows close in BOTH dimensions are
    close on disk (the Databricks OPTIMIZE ZORDER idea). Vectorized."""
    lo_a, hi_a = a_range
    lo_b, hi_b = b_range
    scale = (1 << bits) - 1
    qa = np.clip(((np.asarray(a, np.float64) - lo_a)
                  / max(hi_a - lo_a, 1e-300)) * scale, 0, scale)
    qb = np.clip(((np.asarray(b, np.float64) - lo_b)
                  / max(hi_b - lo_b, 1e-300)) * scale, 0, scale)
    return (_spread_bits_32(qa.astype(np.uint32))
            | (_spread_bits_32(qb.astype(np.uint32)) << np.uint64(1)))


def write_zorder_partitioned(ds: ray.data.Dataset, path: str,
                             col_a: str, col_b: str,
                             num_parts: int = 16,
                             bits: int = 16) -> dict:
    """Write ``ds`` z-ordered on (col_a, col_b): the Morton key is
    appended map-only (ranges from one `table_profile`-style min/max
    pass), then the key range-partitions the data exactly like
    :func:`write_range_partitioned`. A 2-D box predicate then touches
    only the partitions whose z-ranges intersect the box's z-values —
    far fewer than a 1-D layout on either column alone."""
    from .profile import table_profile

    prof = table_profile(ds, [col_a, col_b], approx_distinct=False
                         ).set_index("column")
    a_range = (float(prof.loc[col_a, "min_v"]),
               float(prof.loc[col_a, "max_v"]))
    b_range = (float(prof.loc[col_b, "min_v"]),
               float(prof.loc[col_b, "max_v"]))

    def add_z(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_zorder"] = zorder_values(
            b[col_a].to_numpy(), b[col_b].to_numpy(),
            a_range, b_range, bits).astype(np.uint64)
        return b

    with_z = ds.map_batches(add_z, batch_format="pandas",
                            batch_size=None)
    manifest = write_range_partitioned(with_z, path, "_zorder",
                                       num_parts)
    manifest.update({"zorder": [col_a, col_b],
                     "a_range": list(a_range), "b_range": list(b_range),
                     "bits": bits})
    tmp = os.path.join(path, "._layout.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_layout.json"))
    return manifest


def zorder_parts_for_box(manifest: dict, a_lo: float, a_hi: float,
                         b_lo: float, b_hi: float) -> list[int]:
    """Partitions possibly containing rows of the 2-D box.

    SOUND by Morton monotonicity: the z-code is monotone in each
    coordinate with the other held fixed, so for any point p in the
    box, z(a_lo, b_lo) ≤ z(p) ≤ z(a_hi, b_hi) — the two corners
    bracket every in-box z-value, and the contiguous partition range
    covering [z(lo corner), z(hi corner)] is a superset of every
    partition with in-box rows. (The BIGMIN/LITMAX refinement would
    skip z-gaps inside that range; the residual filter makes the
    superset read exact either way.)
    """
    a_r, b_r = manifest["a_range"], manifest["b_range"]
    bits = manifest["bits"]
    z = zorder_values(np.array([a_lo, a_hi]), np.array([b_lo, b_hi]),
                      tuple(a_r), tuple(b_r), bits)
    bounds = manifest["bounds"]
    pmin = int(np.searchsorted(np.asarray(bounds),
                               float(z[0]), side="right"))
    pmax = int(np.searchsorted(np.asarray(bounds),
                               float(z[1]), side="right"))
    return list(range(pmin, pmax + 1))


def read_zorder_box(path: str, a_lo: float, a_hi: float,
                    b_lo: float, b_hi: float) -> ray.data.Dataset:
    """2-D box read over a z-ordered layout: exact BIGMIN partition
    pruning (:func:`zorder_parts_for_box_exact`), exact residual
    predicate inside."""
    with open(os.path.join(path, "_layout.json")) as f:
        manifest = json.load(f)
    col_a, col_b = manifest["zorder"]
    keep = zorder_parts_for_box_exact(manifest, a_lo, a_hi, b_lo, b_hi)
    dirs = [os.path.join(path, f"_range_part={p}") for p in keep]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_items([])

    def residual(b: pd.DataFrame) -> pd.DataFrame:
        va = b[col_a].to_numpy(np.float64)
        vb = b[col_b].to_numpy(np.float64)
        m = (va >= a_lo) & (va < a_hi) & (vb >= b_lo) & (vb < b_hi)
        return b[m].drop(columns=["_zorder"])

    return ray.data.read_parquet(files).map_batches(
        residual, batch_format="pandas", batch_size=None)


def _compact_bits_64(v: np.ndarray | int) -> np.ndarray | int:
    """Inverse of :func:`_spread_bits_32`: gather every other bit."""
    v = np.uint64(v) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def z_decode(z: int) -> tuple[int, int]:
    """Interleaved z-code → (a, b) quantized coordinates."""
    return (int(_compact_bits_64(z)), int(_compact_bits_64(z >> 1)))


def _load_bits(val: int, bit: int, pattern_one: bool) -> int:
    """Tropf-Herzog LOAD: in the single-dimension view at ``bit``
    (counting from 0 = LSB of that dimension), set that bit to
    ``pattern_one`` and all lower bits of the dimension to the
    complement (10…0 or 01…1)."""
    mask = (1 << bit) - 1
    if pattern_one:
        return (val & ~mask & ~(1 << bit)) | (1 << bit)
    return (val & ~mask & ~(1 << bit)) | mask


def zorder_bigmin(z: int, box_a: tuple[int, int], box_b: tuple[int, int],
                  bits: int = 16) -> int | None:
    """BIGMIN (Tropf & Herzog 1981): the smallest z-code > ``z`` whose
    decoded point lies in the (inclusive, quantized) box — or the box
    minimum when ``z`` precedes it; None when no in-box code > z
    exists. Used to decide EXACTLY whether a partition's z-interval
    contains any in-box point (the corner-bracket range test admits
    false positives across z discontinuities; this removes them).

    Implemented per dimension on the compacted coordinates (equivalent
    to the interleaved-bit formulation, easier to verify)."""
    a_min, a_max = box_a
    b_min, b_max = box_b
    bigmin = None
    for pos in range(2 * bits - 1, -1, -1):
        dim = pos & 1            # 0 → a (even interleave bits), 1 → b
        dbit = pos >> 1
        if dim == 0:
            lo, hi = a_min, a_max
        else:
            lo, hi = b_min, b_max
        zb = (z >> pos) & 1
        lb = (lo >> dbit) & 1
        hb = (hi >> dbit) & 1
        if zb == 0 and lb == 0 and hb == 1:
            # candidate: jump this dim up to 10…0; cap the max branch
            cand_lo = _load_bits(lo, dbit, True)
            cand = _merge_dims(cand_lo if dim == 0 else a_min,
                               cand_lo if dim == 1 else b_min)
            bigmin = cand if bigmin is None else min(bigmin, cand)
            hi = _load_bits(hi, dbit, False)
        elif zb == 0 and lb == 1 and hb == 1:
            return _merge_dims(a_min, b_min)
        elif zb == 1 and lb == 0 and hb == 0:
            return bigmin
        elif zb == 1 and lb == 0 and hb == 1:
            lo = _load_bits(lo, dbit, True)
        # (0,0,0) and (1,1,1): continue with current bounds
        elif (zb, lb, hb) in ((0, 1, 0), (1, 1, 0)):
            raise AssertionError("min > max: invalid box")
        if dim == 0:
            a_min, a_max = lo, hi
        else:
            b_min, b_max = lo, hi
    # z itself is inside the (narrowed) box → smallest in-box code > z
    # does not exist below; z in box means caller handles equality
    return bigmin


def _merge_dims(a: int, b: int) -> int:
    return int(_spread_bits_32(np.uint32(a))
               | (_spread_bits_32(np.uint32(b)) << np.uint64(1)))


def z_in_box(z: int, box_a: tuple[int, int],
             box_b: tuple[int, int]) -> bool:
    a, b = z_decode(z)
    return box_a[0] <= a <= box_a[1] and box_b[0] <= b <= box_b[1]


def next_z_in_box(z: int, box_a: tuple[int, int],
                  box_b: tuple[int, int], bits: int = 16) -> int | None:
    """Smallest in-box z-code ≥ ``z`` (z itself when already in-box)."""
    if z_in_box(z, box_a, box_b):
        return z
    return zorder_bigmin(z, box_a, box_b, bits)


def zorder_parts_for_box_exact(manifest: dict, a_lo: float, a_hi: float,
                               b_lo: float, b_hi: float) -> list[int]:
    """Exact pruning: of the corner-bracketed candidate partitions,
    keep only those whose z-interval actually contains an in-box code
    (BIGMIN test per partition — O(candidates · bits) driver work)."""
    bits = manifest["bits"]
    scale = (1 << bits) - 1
    a_r, b_r = manifest["a_range"], manifest["b_range"]

    def quant(v: float, rng) -> int:
        lo, hi = rng
        return int(np.clip((v - lo) / max(hi - lo, 1e-300) * scale,
                           0, scale))

    box_a = (quant(a_lo, a_r), quant(a_hi, a_r))
    box_b = (quant(b_lo, b_r), quant(b_hi, b_r))
    bounds = manifest["bounds"]
    n = manifest["num_parts"]
    out = []
    for p in zorder_parts_for_box(manifest, a_lo, a_hi, b_lo, b_hi):
        if p >= n:
            continue
        # searchsorted(side='right') puts a code EQUAL to the boundary
        # into partition p, so the partition's lowest code is
        # ceil(boundary) — NOT floor+1, which would exclude an
        # integer-valued boundary code and wrongly prune the partition.
        zlo = 0 if p == 0 else int(np.ceil(bounds[p - 1]))
        zhi = ((1 << (2 * bits)) - 1 if p >= len(bounds)
               else int(np.floor(bounds[p])))
        nxt = next_z_in_box(zlo, box_a, box_b, bits)
        if nxt is not None and nxt <= zhi:
            out.append(p)
    return out


def hrw_assignment(ds: "ray.data.Dataset", key_col: str,
                   num_shards: int = 8) -> pd.DataFrame:
    """Rendezvous (highest-random-weight) shard assignment audit: each
    key goes to ``argmax_s md5(key + '|' + s)`` — the stateless
    consistent-placement rule a frontier uses to pin hosts to shards
    (adding a shard moves only ~1/n of keys, and every worker computes
    the same owner with NO routing table).

    Map-only: each block hashes its distinct keys against all shard
    ids (O(shards) md5s per key, the same cost every router pays) and
    emits per-shard count partials; cross-block duplicate keys are
    resolved by a distinct-pass first. Output: (shard, n_keys) for
    every shard 0..n-1 (zeros included — a starved shard is the
    finding), sorted by shard. The md5 rule is replayed verbatim by
    the SQL twin.
    """
    import hashlib

    shard_ids = [str(s) for s in range(num_shards)]

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col]].drop_duplicates()
        h = pd.util.hash_pandas_object(out[key_col], index=False)
        out = out.copy()
        out["_kb"] = (h % 64).astype("int32")
        return out

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        keys = group[key_col].drop_duplicates().astype(str).tolist()
        if not keys:
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        counts = [0] * num_shards
        for k in keys:
            best, best_h = 0, ""
            for s, sid in enumerate(shard_ids):
                h = hashlib.md5((k + "|" + sid).encode()).hexdigest()
                if h > best_h:
                    best, best_h = s, h
            counts[best] += 1
        return pd.DataFrame({"shard": pd.Series(range(num_shards),
                                                dtype="int64"),
                             "n": pd.Series(counts, dtype="int64")})

    parts = (ds.select_columns([key_col])
             .map_batches(local_distinct, batch_format="pandas",
                          batch_size=None)
             .groupby("_kb").map_groups(assign, batch_format="pandas")
             .to_pandas())
    base = pd.DataFrame({"shard": pd.Series(range(num_shards),
                                            dtype="int64")})
    agg = parts.groupby("shard", as_index=False)["n"].sum() \
        if not parts.empty else base.assign(n=0)
    out = base.merge(agg, on="shard", how="left").fillna({"n": 0})
    out["n_keys"] = out["n"].astype("int64")
    return out[["shard", "n_keys"]]



# ---------------------------------------------------------------------------
# jump consistent hash — minimal-movement shard placement
# ---------------------------------------------------------------------------

_JUMP_LCG = 2862933555777941757
_M64 = (1 << 64) - 1


def jump_hash_vec(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Lamport & Veach jump consistent hash, vectorized: maps each
    uint64 key to a bucket in [0, num_buckets) with the minimal-
    movement property (growing n→n+1 moves ~1/(n+1) of keys, all INTO
    the new bucket, none between old buckets). The float step
    ``(b+1)·(2³¹ / ((key>>33)+1))`` is IEEE-exact on both sides, so
    the SQL twin's recursive CTE replays placements bit-for-bit."""
    key = keys.astype(np.uint64).copy()
    b = np.full(len(key), -1, dtype=np.int64)
    j = np.zeros(len(key), dtype=np.int64)
    active = j < num_buckets
    two31 = np.float64(1 << 31)
    while active.any():
        b[active] = j[active]
        key[active] = (key[active] * np.uint64(_JUMP_LCG)
                       + np.uint64(1))            # wraps mod 2^64
        frac = two31 / ((key[active] >> np.uint64(33)).astype(
            np.float64) + 1.0)
        j[active] = np.floor(
            (b[active] + 1).astype(np.float64) * frac).astype(np.int64)
        active = j < num_buckets
    return b


def jump_hash_shards(ds: ray.data.Dataset, key_col: str,
                     n_old: int, n_new: int) -> pd.DataFrame:
    """Jump-consistent-hash placement audit for a shard-count change
    ``n_old → n_new``: per-shard key counts under both configurations
    plus ``moved_in`` (keys that LAND on the shard under ``n_new`` but
    lived elsewhere under ``n_old``). For n_new = n_old + g the jump
    property guarantees moved_in = 0 for every old shard — keys only
    ever move INTO new buckets — and Σ moved_in ≈ g/n_new of the keys:
    the resharding-cost read that decides whether a 100-TB corpus
    re-layout is a metadata flip or a full rewrite (contrast with
    ``hrw_assignment``, which trades O(buckets) per-key cost for
    weighted placement). One streaming pass, per-block histogram
    partials, O(shards) driver fold."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        old = jump_hash_vec(keys, n_old)
        new = jump_hash_vec(keys, n_new)
        rows = {"shard": [], "n_old": [], "n_new": [], "moved_in": []}
        for s in range(max(n_old, n_new)):
            rows["shard"].append(s)
            rows["n_old"].append(int((old == s).sum()))
            rows["n_new"].append(int((new == s).sum()))
            rows["moved_in"].append(int(((new == s) & (old != s)).sum()))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("shard", as_index=False)[
        ["n_old", "n_new", "moved_in"]].sum()
    return out.astype("int64").sort_values("shard") \
        .reset_index(drop=True)


def hilbert_d_vec(x: np.ndarray, y: np.ndarray,
                  order: int = 16) -> np.ndarray:
    """2-D Hilbert-curve index of (x, y) on a 2^order × 2^order grid
    (the locality-preserving alternative to the Z-order/Morton layout
    above — no long diagonal jumps, so range scans touch fewer
    blocks). Standard iterative rotate-and-accumulate, vectorized;
    every step is integer bit arithmetic, so the SQL twin's unrolled
    recursion replays it exactly."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d


def hilbert_order(ds: ray.data.Dataset, id_col: str, x_col: str,
                  y_col: str, order: int = 16) -> pd.DataFrame:
    """Hilbert index per row over integer-quantized (x, y): output
    (id, hx, hy, hilbert_d) ordered by id, with ``hx = round(x) mod
    2^order`` and ``hy = y mod 2^order`` (documented so the SQL twin
    replays the quantization verbatim). Pure map — no shuffle; sorting
    or range-partitioning by ``hilbert_d`` is the storage-layout step
    downstream (see ``write_zorder_partitioned`` for the Morton
    machinery this complements)."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        # floor(x + 0.5), not rint: SQL round() is half-AWAY (half-up
        # for positives) while numpy rint is half-to-even — .50 prices
        # exist in this data, so the conventions must match
        hx = np.floor(b[x_col].to_numpy(np.float64) + 0.5) \
            .astype(np.int64) % (1 << order)
        hy = b[y_col].to_numpy().astype(np.int64) % (1 << order)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "hx": hx, "hy": hy,
            "hilbert_d": hilbert_d_vec(hx, hy, order)})

    out = ds.select_columns([id_col, x_col, y_col]).map_batches(
        per_batch, batch_format="pandas").to_pandas()
    return out.astype({id_col: "int64", "hx": "int64", "hy": "int64",
                       "hilbert_d": "int64"}) \
        .sort_values(id_col).reset_index(drop=True)
