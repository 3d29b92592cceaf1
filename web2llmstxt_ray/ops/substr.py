"""Cross-document exact shared-substring detection.

Lee et al. ("Deduplicating Training Data Makes Language Models
Better", ACL 2022) showed that repeated ≥50-token SUBSTRINGS — not
whole-document dups — dominate web-corpus redundancy; their suffix
array is a single-machine structure, so this module gets the same
answers with a shuffle-friendly decomposition:

1. **Fingerprint** (map-only): every k-byte window of every document
   gets a rolling Rabin-Karp hash — computed for ALL positions at once
   with the invertible-base trick (the base is odd ⇒ invertible mod
   2^64, so window hashes come from prefix sums + one vectorized
   multiply, no sequential scan). Winnowing (Schleimer et al., SIGMOD
   2003) then keeps the minimum hash of every ``w``-window of k-grams:
   any shared substring of length ≥ ``w + k − 1`` is GUARANTEED to
   select at least one identical fingerprint at the same relative
   offset in both documents.
2. **Candidates** (one bucketed shuffle of skinny rows): fingerprints
   group by hash bucket; equal hashes across documents emit
   (a, b, off_a, off_b) anchors, deduped per (a, b, diagonal). Hot
   fingerprints (boilerplate k-grams shared by thousands of docs) are
   CAPPED per group — the classic quadratic-pair bomb — and capped
   groups are counted so the caller sees dropped coverage.
3. **Verify/extend** (two bucketed hash joins + map): anchor rows join
   the involved documents' texts, each anchor extends byte-wise left
   and right to the maximal exact run, and a final per-pair reduction
   keeps the longest verified run ≥ ``min_len``.

Output rows: (a, b, length, off_a, off_b) — exact, verified runs.
Completeness: every pair whose longest common substring is
≥ ``w + k − 1`` is found with its exact maximal length (the longest
run contains a shared winnow anchor; extension recovers the whole
run). Shorter overlaps may be missed — that is the winnowing
contract, pytest-gated against a brute-force LCS oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

__all__ = ["winnow_fingerprints", "shared_substring_pairs",
           "excise_shared_substrings"]

_B = np.uint64(1099511628211)          # odd ⇒ invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _window_hashes(data: bytes, k: int) -> np.ndarray:
    """Rabin-Karp hashes of every k-byte window, vectorized.

    H[i] = Σ_t c[i+t]·B^(k−1−t)  (mod 2^64). Using S[i] = Σ_{j<i}
    c[j]·B⁻ʲ, H[i] = (S[i+k] − S[i])·B^(i+k−1) — prefix sums and
    elementwise multiplies only."""
    n = len(data)
    if n < k:
        return np.empty(0, np.uint64)
    c = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        binv_pow = np.concatenate((
            [np.uint64(1)],
            np.cumprod(np.full(n - 1, _BINV, np.uint64))))
        s = np.concatenate(([np.uint64(0)], np.cumsum(c * binv_pow)))
        b_pow = np.concatenate((
            [np.uint64(1)],
            np.cumprod(np.full(n - 1, _B, np.uint64))))
        return (s[k:] - s[:-k]) * b_pow[k - 1:]


def _winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Positions of the (leftmost) minimum of every w-window — the
    winnowing fingerprint selection; deduped, sorted."""
    if len(hashes) == 0:
        return np.empty(0, np.int64)
    if len(hashes) <= w:
        return np.asarray([int(np.argmin(hashes))], np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    pos = win.argmin(axis=1) + np.arange(len(win))
    return np.unique(pos)


def winnow_fingerprints(ds: ray.data.Dataset, k: int = 24, w: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, fp, pos) winnowed fingerprint rows per document."""
    def emit(batch: pa.Table) -> pa.Table:
        ids_out, fps, poss = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            data = (t or "").encode("utf-8", "surrogatepass")
            h = _window_hashes(data, k)
            sel = _winnow(h, w)
            ids_out.extend([did] * len(sel))
            fps.extend(h[sel].tolist())
            poss.extend(sel.tolist())
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "fp": pa.array(np.asarray(fps, np.uint64)),
            "pos": pa.array(np.asarray(poss, np.int64)),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def shared_substring_pairs(
        ds: ray.data.Dataset, min_len: int | None = None, k: int = 24,
        w: int = 8, text_col: str = "text", id_col: str = "doc_id",
        num_buckets: int = 32, max_per_fp: int = 64,
        max_anchors_per_diag: int = 8,
        as_dataset: bool = False) -> "pa.Table | ray.data.Dataset":
    """Verified cross-document shared substrings ≥ ``min_len`` bytes
    (default ``w + k − 1``, the winnowing guarantee threshold).
    Returns (a, b, length, off_a, off_b) with the LONGEST verified run
    per (a, b) pair. See module docstring for the three-stage shape."""
    from .relational import hash_join

    if min_len is None:
        min_len = w + k - 1
    ds = ds.select_columns([id_col, text_col]).materialize()
    fps = winnow_fingerprints(ds, k, w, text_col, id_col)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("fp").to_numpy(zero_copy_only=False)
             % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_fb", pa.array(b))

    def pair_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "off_a": [], "off_b": []}
        for _, g in group.groupby("fp", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values([id_col, "pos"]).head(max_per_fp)
            ids = g[id_col].to_numpy()
            pos = g["pos"].to_numpy()
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    if ids[i] == ids[j]:
                        continue
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["off_a"].append(pos[i])
                    out["off_b"].append(pos[j])
        df = pd.DataFrame(out)
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("a", "b", "off_a", "off_b")})
        # orient (a < b), dedupe per diagonal, cap anchors per diagonal
        flip = df["a"] > df["b"]
        df.loc[flip, ["a", "b", "off_a", "off_b"]] = (
            df.loc[flip, ["b", "a", "off_b", "off_a"]].to_numpy())
        df["_diag"] = df["off_a"] - df["off_b"]
        df = (df.drop_duplicates()
                .sort_values(["a", "b", "_diag", "off_a"])
                .groupby(["a", "b", "_diag"], sort=False)
                .head(max_anchors_per_diag))
        return df[["a", "b", "off_a", "off_b"]]

    cand = (fps.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_fb").map_groups(pair_bucket,
                                       batch_format="pandas"))

    # attach both texts via bucketed joins (only skinny anchor rows +
    # involved documents shuffle)
    def rn(col_from: str, col_to: str):
        def _r(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index(col_from)
            return batch.rename_columns([
                col_to if j == i else n
                for j, n in enumerate(batch.schema.names)])
        return _r

    docs_a = ds.map_batches(rn(id_col, "a"), batch_format="pyarrow") \
               .map_batches(rn(text_col, "_ta"), batch_format="pyarrow")
    docs_b = ds.map_batches(rn(id_col, "b"), batch_format="pyarrow") \
               .map_batches(rn(text_col, "_tb"), batch_format="pyarrow")
    # materialized between the two hops: hash_join probes .schema()
    # of its inputs, which re-executes a lazy all-to-all plan
    joined = hash_join(cand, docs_a, on="a",
                       num_buckets=num_buckets).materialize()
    joined = hash_join(joined, docs_b, on="b", num_buckets=num_buckets)

    def extend(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"a": [], "b": [], "length": [], "off_a": [],
                "off_b": []}
        for a, b, oa, ob, ta, tb in zip(
                batch["a"], batch["b"], batch["off_a"], batch["off_b"],
                batch["_ta"], batch["_tb"]):
            da = (ta or "").encode("utf-8", "surrogatepass")
            db = (tb or "").encode("utf-8", "surrogatepass")
            oa, ob = int(oa), int(ob)
            if da[oa:oa + k] != db[ob:ob + k]:
                continue                      # 64-bit hash collision
            lo = 0
            while oa - lo > 0 and ob - lo > 0 \
                    and da[oa - lo - 1] == db[ob - lo - 1]:
                lo += 1
            hi = k
            while oa + hi < len(da) and ob + hi < len(db) \
                    and da[oa + hi] == db[ob + hi]:
                hi += 1
            rows["a"].append(a)
            rows["b"].append(b)
            rows["length"].append(lo + hi)
            rows["off_a"].append(oa - lo)
            rows["off_b"].append(ob - lo)
        return pd.DataFrame(rows, columns=["a", "b", "length",
                                           "off_a", "off_b"])

    runs = joined.map_batches(extend, batch_format="pandas")

    _out_cols = ["a", "b", "length", "off_a", "off_b"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in _out_cols})

    def add_pb(batch: pd.DataFrame) -> pd.DataFrame:
        if "a" not in batch.columns:        # schema-less empty block
            batch = _empty()
        batch["_pb"] = ((batch["a"] * 31 + batch["b"])
                        % num_buckets).astype("int32")
        return batch

    def best_per_pair(group: pd.DataFrame) -> pd.DataFrame:
        if "a" not in group.columns or group.empty:
            return _empty()
        g = group.sort_values(["a", "b", "length", "off_a", "off_b"],
                              ascending=[True, True, False, True, True])
        g = g.drop_duplicates(subset=["a", "b"], keep="first")
        g = g[g["length"] >= min_len]
        return g[["a", "b", "length", "off_a", "off_b"]]

    out = (runs.map_batches(add_pb, batch_format="pandas")
           .groupby("_pb").map_groups(best_per_pair,
                                      batch_format="pandas"))
    if as_dataset:
        # already best-per-pair and duplicate-free (one _pb group owns
        # each pair) — stays distributed, unsorted
        return out
    df = out.to_pandas()
    if "a" not in df.columns:
        df = _empty()
    df = (df.astype({c: "int64" for c in _out_cols})
            .sort_values(["a", "b"]).reset_index(drop=True))
    return pa.Table.from_pandas(df)


def excise_shared_substrings(
        ds: ray.data.Dataset, pairs: pa.Table | None = None,
        min_len: int | None = None, k: int = 24, w: int = 8,
        text_col: str = "text", id_col: str = "doc_id",
        **pair_kwargs) -> ray.data.Dataset:
    """Substring-level dedup REMOVAL (Lee et al. 2022 semantics): each
    verified cross-document repeated run survives only in its
    canonical occurrence (the lower doc_id); the higher doc_id's copy
    is cut out byte-wise.

    The verified pair table is tiny relative to the corpus (bounded by
    the candidate caps), so the per-doc excision intervals travel as a
    single broadcast (``ray.put`` once, read per task) and the corpus
    itself streams through one map-only pass — no second shuffle.
    Overlapping intervals within a doc are merged before cutting.

    Output: (doc_id, text, n_removed_bytes). Byte intervals come from
    the verified runs, which begin and end on identical byte sequences
    in both documents; decoding after the cut uses surrogatepass so a
    pathological mid-codepoint boundary cannot raise.
    """
    if pairs is None:
        pairs = shared_substring_pairs(
            ds, min_len=min_len, k=k, w=w, text_col=text_col,
            id_col=id_col, **pair_kwargs)

    intervals: dict = {}
    for b, ln, ob in zip(pairs.column("b").to_pylist(),
                         pairs.column("length").to_pylist(),
                         pairs.column("off_b").to_pylist()):
        intervals.setdefault(b, []).append((int(ob), int(ob + ln)))
    iv_ref = ray.put(intervals)

    class _Excise:
        def __init__(self):
            self.iv = ray.get(iv_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            out_text, removed = [], []
            for did, t in zip(ids, texts):
                spans = self.iv.get(did)
                if not spans:
                    out_text.append(t)
                    removed.append(0)
                    continue
                data = (t or "").encode("utf-8", "surrogatepass")
                spans = sorted(spans)
                merged = [list(spans[0])]
                for s, e in spans[1:]:
                    if s <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([s, e])
                kept, prev = [], 0
                cut = 0
                for s, e in merged:
                    kept.append(data[prev:s])
                    cut += min(e, len(data)) - s
                    prev = e
                kept.append(data[prev:])
                out_text.append(b"".join(kept).decode(
                    "utf-8", "surrogatepass"))
                removed.append(cut)
            names = list(batch.schema.names)
            cols = {n: batch.column(n) for n in names}
            cols[text_col] = pa.array(out_text, pa.string())
            cols["n_removed_bytes"] = pa.array(removed, pa.int64())
            return pa.table(cols)

    return ds.map_batches(_Excise, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=0.5)


_GEAR_MULT = 11400714819323198485        # 2^64 / φ (Fibonacci hashing)
_GEAR_WINDOW = 64
_M64 = (1 << 64) - 1


def gear_hash_boundaries(text: str, mask_bits: int = 6) -> np.ndarray:
    """Content-defined chunk boundaries via a gear rolling hash: at
    char position i (1-based), ``h_i = Σ_{k=0..min(i,64)−1}
    2^k · G(cp_{i−k}) mod 2^64`` with ``G(cp) = (cp+1)·(2^64/φ) mod
    2^64``; i is a boundary iff ``h_i mod 2^mask_bits == 0``. Because
    the shift multiplier is 2, only the last 64 chars ever influence
    ``h`` (higher terms wrap to zero) — the windowed-SUM form, which
    is why the SQL twin is a position×offset JOIN, not a recursion.
    Vectorized: 64 shifted adds over the codepoint array."""
    if not text:
        return np.zeros(0, dtype=np.int64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    g = (cp + np.uint64(1)) * np.uint64(_GEAR_MULT)    # wraps mod 2^64
    n = len(g)
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(_GEAR_WINDOW, n)):
        h[k:] += g[:n - k] << np.uint64(k)             # wraps mod 2^64
    mask = np.uint64((1 << mask_bits) - 1)
    return (np.nonzero((h & mask) == 0)[0] + 1).astype(np.int64)


def gear_cdc_chunks(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text",
                    mask_bits: int = 6) -> pd.DataFrame:
    """Content-defined chunking (the FastCDC/gear family) — THE
    shift-robust dedup segmentation: fixed-width shingles break when
    one char is inserted, but gear boundaries are functions of local
    CONTENT, so identical passages chunk identically at any offset
    and cross-document duplicate passages collapse to equal chunks.
    Emits one row per chunk: (doc_id, chunk_idx, start, len) with
    1-based ``start``; a boundary at position i ENDS the chunk at i,
    and the tail after the last boundary is the final chunk.

    Scale shape: a pure map — every document chunks independently
    inside ``map_batches`` (the 64-shifted-add kernel), no shuffle,
    no state; downstream dedup is one groupby on the chunk hash.
    Exact integer arithmetic throughout (the uint64 wrap IS the mod),
    hash-identical at any partitioning."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, starts, lens = [], [], [], []
        for did, text in zip(b[id_col].astype("int64"), b[text_col]):
            bounds = gear_hash_boundaries(text, mask_bits)
            edges = list(bounds)
            if len(text) and (not edges or edges[-1] != len(text)):
                edges.append(len(text))
            prev = 0
            for ci, e in enumerate(edges):
                ids.append(int(did))
                idxs.append(ci)
                starts.append(prev + 1)
                lens.append(int(e) - prev)
                prev = int(e)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "start": pd.Series(starts, dtype="int64"),
            "len": pd.Series(lens, dtype="int64")})

    out = ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pandas").to_pandas()
    return out.sort_values([id_col, "chunk_idx"]) \
        .reset_index(drop=True)


def cdc_dedup_ratio(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text",
                    mask_bits: int = 6) -> pd.DataFrame:
    """Cross-corpus chunk-level dedup census over the gear CDC
    segmentation — the number content-defined chunking exists to
    produce: how much of the corpus is REPEATED PASSAGES (chunks whose
    md5 appears elsewhere), the dedupable fraction a chunk-store
    would reclaim. Exact integers; md5 replays in DuckDB.

    Scale shape: chunking is the map-only gear kernel; each chunk
    ships only its (md5, len) — text never re-shuffles; one skinny
    hash groupby yields distinct counts and distinct bytes. Output
    one row: (n_chunks, n_distinct, dup_chunk_frac, chars_total,
    chars_distinct, dup_char_frac)."""
    import hashlib

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        hs, ls = [], []
        for text in b[text_col]:
            bounds = gear_hash_boundaries(text, mask_bits).tolist()
            if len(text) and (not bounds or bounds[-1] != len(text)):
                bounds.append(len(text))
            prev = 0
            for e in bounds:
                seg = text[prev:e]
                hs.append(hashlib.md5(seg.encode()).hexdigest())
                ls.append(len(seg))
                prev = e
        return pd.DataFrame({"h": hs, "ln": ls})

    chunks = ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pandas")
    agg = chunks.groupby("h").map_groups(
        lambda g: pd.DataFrame({"n": [len(g)],
                                "ln": [int(g["ln"].iloc[0])]}),
        batch_format="pandas").to_pandas()
    n_chunks = int(agg["n"].sum())
    n_distinct = len(agg)
    chars_total = int((agg["n"] * agg["ln"]).sum())
    chars_distinct = int(agg["ln"].sum())
    return pd.DataFrame({
        "n_chunks": pd.Series([n_chunks], dtype="int64"),
        "n_distinct": pd.Series([n_distinct], dtype="int64"),
        "dup_chunk_frac": [(n_chunks - n_distinct) / n_chunks
                           if n_chunks else 0.0],
        "chars_total": pd.Series([chars_total], dtype="int64"),
        "chars_distinct": pd.Series([chars_distinct], dtype="int64"),
        "dup_char_frac": [(chars_total - chars_distinct) / chars_total
                          if chars_total else 0.0]})
