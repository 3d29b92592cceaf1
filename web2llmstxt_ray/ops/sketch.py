"""Mergeable sketches — approximate aggregation at scale.

The reference has no sketches (SURVEY §2.7); at 100 TB they are how
"count distinct" and friends avoid an all-to-all shuffle: each
``map_batches`` emits ONE serialized sketch per batch (registers, not
rows) and a tiny final stage merges them — sketches are designed to be
order-insensitive and mergeable, so the partial/combine pattern applies
exactly.

HyperLogLog here is the classic dense variant: ``2^p`` 6-bit registers
(stored as uint8), register index = low ``p`` bits of the stable 64-bit
key hash, rank = leading-zero count of the remaining bits. Standard
bias-corrected estimator with linear counting for the small range.
"""

from __future__ import annotations

import numpy as np
import ray.data

from ..functions.urls import hash64_batch


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _fmix64(h: np.ndarray) -> np.ndarray:
        """Murmur3 finalizer: FNV-1a's low bits correlate on
        sequential-suffix keys, which biases register selection; the
        avalanche mix restores uniformity."""
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
        return h

    def add_hashes(self, hashes: np.ndarray) -> None:
        hashes = self._fmix64(hashes)
        idx = (hashes & np.uint64(self.m - 1)).astype(np.int64)
        rest = hashes >> np.uint64(self.p)
        # rank = position of first set bit in the remaining 64-p bits
        width = 64 - self.p
        ranks = np.full(len(hashes), width + 1, dtype=np.uint8)
        found = np.zeros(len(hashes), dtype=bool)
        for bit in range(width):
            hit = ~found & (((rest >> np.uint64(bit)) & np.uint64(1)) == 1)
            ranks[hit] = bit + 1
            found |= hit
        np.maximum.at(self.registers, idx, ranks)

    def add(self, values: list[str]) -> None:
        if values:
            self.add_hashes(hash64_batch([str(v) for v in values]))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)   # linear counting
        return float(raw)

    def dumps(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "HyperLogLog":
        obj = cls(blob[0])
        obj.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return obj


class CountMinSketch:
    """Count-Min: a ``depth × width`` counter grid; a key increments one
    counter per row (row hash = ``fmix64`` of key hash + row salt), and
    its estimate is the MIN over rows — always an OVERestimate, with
    error ≤ (e/width)·N at confidence 1-(1/e)^depth. Linear in both
    arguments under merge (+), so the per-batch-partial / driver-merge
    pattern applies like HLL.

    Paired with a per-batch exact candidate top-k it yields heavy
    hitters without shuffling the keys themselves (see
    :func:`heavy_hitters`)."""

    def __init__(self, depth: int = 4, width: int = 2048):
        self.depth, self.width = depth, width
        self.table = np.zeros((depth, width), dtype=np.int64)
        # deterministic odd salts, one per row
        self.salts = (np.arange(1, depth + 1, dtype=np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1))

    def _cols(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indices."""
        out = np.empty((self.depth, len(hashes)), dtype=np.int64)
        for d in range(self.depth):
            out[d] = (HyperLogLog._fmix64(hashes * self.salts[d])
                      % np.uint64(self.width)).astype(np.int64)
        return out

    def add_hashes(self, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> None:
        if len(hashes) == 0:
            return
        if counts is None:
            counts = np.ones(len(hashes), dtype=np.int64)
        cols = self._cols(hashes)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], counts)

    def add(self, values: list, counts=None) -> None:
        if values:
            self.add_hashes(hash64_batch([str(v) for v in values]),
                            None if counts is None
                            else np.asarray(counts, dtype=np.int64))

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(hashes)
        est = self.table[0][cols[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][cols[d]])
        return est

    def estimate(self, values: list) -> np.ndarray:
        return self.estimate_hashes(hash64_batch([str(v) for v in values]))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.table += other.table
        return self

    def dumps(self) -> bytes:
        return (np.array([self.depth, self.width], dtype=np.int64).tobytes()
                + self.table.tobytes())

    @classmethod
    def loads(cls, blob: bytes) -> "CountMinSketch":
        depth, width = np.frombuffer(blob[:16], dtype=np.int64)
        obj = cls(int(depth), int(width))
        obj.table = np.frombuffer(blob[16:], dtype=np.int64).reshape(
            int(depth), int(width)).copy()
        return obj


def heavy_hitters(ds: ray.data.Dataset, col: str, k: int = 10,
                  depth: int = 4, width: int = 4096,
                  candidates_per_batch: int = 64) -> list[tuple[str, int]]:
    """Approximate global top-k frequent values without shuffling keys:
    each batch emits ONE CM sketch + its local exact top candidates
    (any global heavy hitter is a local heavy hitter in at least one
    batch at this candidate width); the driver merges the sketches and
    ranks the candidate union by CM estimate. Returns [(value, est)]
    sorted by (est desc, value asc).

    Per-batch output is O(width·depth + candidates) regardless of rows
    — the shuffle-free alternative to groupby().count().sort() when an
    approximate ranking suffices.
    """
    from collections import Counter

    import pyarrow as pa

    def sketch_batch(batch: pa.Table) -> pa.Table:
        vals = [str(v) for v in batch.column(col).to_pylist()]
        cms = CountMinSketch(depth, width)
        cms.add(vals)
        cand = [v for v, _ in Counter(vals).most_common(candidates_per_batch)]
        return pa.table({
            "sketch": pa.array([cms.dumps()], pa.binary()),
            "candidates": pa.array([cand], pa.list_(pa.string())),
        })

    merged = CountMinSketch(depth, width)
    cand: set[str] = set()
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow",
                              batch_size=None).take_all():
        merged.merge(CountMinSketch.loads(row["sketch"]))
        cand.update(row["candidates"])
    ranked = sorted(zip(sorted(cand), merged.estimate(sorted(cand))),
                    key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(v, int(n)) for v, n in ranked]


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one HLL per batch, driver merge.

    The shuffle-free alternative to ``ds.unique()`` — per-batch output
    is ``2^p`` bytes regardless of row count.
    """

    def sketch_batch(batch) -> dict:
        hll = HyperLogLog(p)
        hll.add([str(v) for v in batch[col]])
        return {"sketch": np.array([hll.dumps()], dtype=object)}

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="numpy",
                              batch_size=None).take_all():
        merged.merge(HyperLogLog.loads(row["sketch"]))
    return merged.estimate()


def approx_distinct_by_key(ds: ray.data.Dataset, key_col: str, col: str,
                           p: int = 10) -> dict:
    """Per-key approximate distinct counts (one small HLL per key per
    batch, merged driver-side) — e.g. distinct users per event type."""

    def sketch_batch(batch) -> dict:
        import pandas as pd

        df = pd.DataFrame({key_col: batch[key_col], col: batch[col]})
        keys, blobs = [], []
        for k, sub in df.groupby(key_col, sort=False):
            hll = HyperLogLog(p)
            hll.add([str(v) for v in sub[col]])
            keys.append(k)
            blobs.append(hll.dumps())
        return {key_col: np.array(keys, dtype=object),
                "sketch": np.array(blobs, dtype=object)}

    merged: dict = {}
    for row in ds.map_batches(sketch_batch, batch_format="numpy",
                              batch_size=None).take_all():
        k = row[key_col]
        hll = HyperLogLog.loads(row["sketch"])
        if k in merged:
            merged[k].merge(hll)
        else:
            merged[k] = hll
    return {k: v.estimate() for k, v in merged.items()}


# ---------------------------------------------------------------------------
# t-digest (Dunning & Ertl) — mergeable quantiles over CONTINUOUS domains
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function.

    The continuous-domain complement to ``corpus.int_quantiles`` (which
    is exact but assumes a bounded integer value domain): centroids
    adapt to the data, tails stay fine-grained (cluster capacity
    ∝ q(1−q)), memory is O(delta) regardless of input size, and two
    digests merge exactly like two histograms — one serialized digest
    per block replaces any value shuffle.

    Compression is VECTORIZED: after sorting incoming centroids by
    mean, each gets the cluster id ``floor(k(q_mid))`` where
    ``k(q) = delta·(asin(2q−1)/π + ½)`` and ``q_mid`` is its cumulative
    weight midpoint; a weighted groupby over ids produces the merged
    centroids — no per-centroid Python loop.
    """

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = np.inf
        self._max = -np.inf

    # -- construction --

    def add(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if not len(values):
            return self
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate(
            [self.weights, np.ones(len(values))])
        self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2.0) / total
        k = self.delta * (np.arcsin(2.0 * q_mid - 1.0) / np.pi + 0.5)
        ids = np.floor(k).astype(np.int64)
        # weighted groupby(ids) without pandas: segment boundaries
        cut = np.flatnonzero(np.diff(ids)) + 1
        seg = np.concatenate([[0], cut, [len(m)]])
        wsum = np.add.reduceat(w, seg[:-1])
        msum = np.add.reduceat(m * w, seg[:-1])
        self.means = msum / wsum
        self.weights = wsum

    # -- queries --

    def quantile(self, q: float) -> float:
        """Interpolated quantile: piecewise-linear between centroid
        midpoints, clamped to observed min/max at the tails."""
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            lo_w = max(cum[0], 1e-12)
            f = max(0.0, target) / lo_w
            return float(self._min + f * (self.means[0] - self._min))
        if target >= cum[-1]:
            span = max(total - cum[-1], 1e-12)
            f = min(1.0, (target - cum[-1]) / span)
            return float(self.means[-1] + f * (self._max - self.means[-1]))
        i = int(np.searchsorted(cum, target) - 1)
        f = (target - cum[i]) / max(cum[i + 1] - cum[i], 1e-12)
        return float(self.means[i] + f * (self.means[i + 1] - self.means[i]))

    def count(self) -> float:
        return float(self.weights.sum())

    # -- serialization --

    def dumps(self) -> bytes:
        import pickle

        return pickle.dumps((self.delta, self.means, self.weights,
                             self._min, self._max), protocol=5)

    @classmethod
    def loads(cls, blob: bytes) -> "TDigest":
        import pickle

        delta, means, weights, mn, mx = pickle.loads(blob)
        obj = cls(delta)
        obj.means, obj.weights = means, weights
        obj._min, obj._max = mn, mx
        return obj


def tdigest_quantiles(ds: ray.data.Dataset, col: str,
                      qs: list[float], delta: int = 200,
                      group_col: str | None = None) -> "pd.DataFrame":
    """Distributed approximate quantiles: ONE serialized digest row per
    (block[, group]) — values never shuffle; the driver merges
    O(blocks·delta) centroids, not rows. With ``group_col`` the digest
    is per group per block (mirrors ``approx_distinct_by_key``)."""
    import pandas as pd

    def sketch_batch(batch) -> dict:
        df = pd.DataFrame({col: batch[col]} if group_col is None else
                          {group_col: batch[group_col], col: batch[col]})
        keys, blobs = [], []
        if group_col is None:
            keys.append("")
            blobs.append(TDigest(delta).add(
                df[col].to_numpy(np.float64)).dumps())
        else:
            for k, sub in df.groupby(group_col, sort=False):
                keys.append(k)
                blobs.append(TDigest(delta).add(
                    sub[col].to_numpy(np.float64)).dumps())
        return {"_key": np.array(keys, dtype=object),
                "sketch": np.array(blobs, dtype=object)}

    merged: dict = {}
    for row in ds.map_batches(sketch_batch, batch_format="numpy",
                              batch_size=None).take_all():
        d = TDigest.loads(row["sketch"])
        k = row["_key"]
        if k in merged:
            merged[k].merge(d)
        else:
            merged[k] = d
    rows = []
    for k in sorted(merged):
        for q in qs:
            rec = {"q": q, "value": merged[k].quantile(q),
                   "n": merged[k].count()}
            if group_col is not None:
                rec[group_col] = k
            rows.append(rec)
    return pd.DataFrame(rows)


def frequent_items(ds: ray.data.Dataset, key_col: str,
                   k: int = 200) -> "pd.DataFrame":
    """EXACT φ-frequent items without shuffling the keys: every key
    whose global count strictly exceeds N/k, found in two streaming
    passes. Pass 1 nominates per-block locally-frequent keys — the
    pigeonhole guarantee (if count(x) > N/k then count_b(x) > n_b/k
    in SOME block) means the union has NO false negatives, and each
    block nominates < k keys so the candidate set is O(k · blocks).
    Pass 2 broadcasts the candidates and exact-counts ONLY them
    (map-only additive partials), then filters ``n·k > N`` — so the
    output is exactly the frequent set with exact counts, while raw
    keys never leave their block (the Misra-Gries deployment shape,
    with the exact rescue replacing the lossy summary merge).

    Output: (key_col, n, share), sorted by key. ``share`` is one
    exact int/int float division.
    """
    import pandas as pd

    def pass_a(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key_col].value_counts()
        nb = len(b)
        keys = vc.index[(vc.to_numpy("int64") * k) > nb]
        out = pd.DataFrame({"_key": list(keys) + [None],
                            "_nb": [0] * len(keys) + [nb]})
        return out

    parts_a = ds.select_columns([key_col]).map_batches(
        pass_a, batch_format="pandas", batch_size=None).to_pandas()
    total = int(parts_a["_nb"].sum())
    cand = set(parts_a.loc[parts_a["_key"].notna(), "_key"])
    if not cand or total == 0:
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "share": pd.Series([], dtype="float64")})

    def pass_b(b: pd.DataFrame) -> pd.DataFrame:
        s = b[key_col]
        vc = s[s.isin(cand)].value_counts()
        return pd.DataFrame({"_key": vc.index,
                             "n": vc.to_numpy("int64")})

    parts_b = ds.select_columns([key_col]).map_batches(
        pass_b, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts_b.groupby("_key", as_index=False)["n"].sum()
    agg = agg[(agg["n"].to_numpy("int64") * k) > total]
    out = pd.DataFrame({key_col: agg["_key"],
                        "n": agg["n"].astype("int64")})
    out["share"] = out["n"].to_numpy(np.float64) / float(total)
    return out.sort_values(key_col).reset_index(drop=True)


def bottomk_jaccard(ds: ray.data.Dataset, group_col: str = "source",
                    text_col: str = "text", k: int = 32):
    """Bottom-k (KMV) set-similarity sketch with its OWN ground truth:
    per group, the k lexicographically smallest md5 digests of the
    distinct-token set form the sketch; for every group pair the
    estimator Ĵ = |BottomK(A∪B) ∩ A ∩ B| / k sits next to the EXACT
    Jaccard — the estimator-error census in one output. Unlike the
    FNV MinHash tier (hash-noise, rows-only by design), md5 is
    bit-identical in DuckDB, so this sketch is fully SQL-oracled.

    Scale shape: one distinct-(group, token) shuffle; md5 is a map;
    per-group bottom-k folds from per-block partial bottom-k's
    (O(blocks·k) skinny rows to the driver); exact Jaccard folds from
    per-token incidence partials — the pairwise stage touches only
    O(groups²·k) sketch entries, never the corpora. Output per pair
    (a < b): (group_a, group_b, n_a, n_b, est_num, jaccard_est,
    inter, uni, jaccard_exact, abs_err)."""
    import hashlib
    import re

    import pandas as pd
    import pyarrow as pa

    tok_re = re.compile(r"[a-z0-9]+")

    def pairs_batch(b: pd.DataFrame) -> pd.DataFrame:
        gs, ts = [], []
        for g, t in zip(b[group_col], b[text_col]):
            for w in set(tok_re.findall(t.lower())):
                gs.append(g)
                ts.append(w)
        out = pd.DataFrame({group_col: gs, "_tok": ts})
        return out.drop_duplicates()

    gt = (ds.select_columns([group_col, text_col])
          .map_batches(pairs_batch, batch_format="pandas")
          .groupby([group_col, "_tok"])
          .map_groups(lambda g: g.head(1), batch_format="pandas"))

    def hash_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode()).hexdigest() for t in b["_tok"]]
        out = pd.DataFrame({group_col: b[group_col].to_numpy(),
                            "_h": h})
        # per-block partial bottom-k per group
        out = out.sort_values([group_col, "_h"], kind="stable")
        return out.groupby(group_col, sort=False).head(k)

    parts = gt.map_batches(hash_partial,
                           batch_format="pandas").to_pandas()
    sketches: dict = {}
    counts: dict = {}
    for g, sub in parts.groupby(group_col):
        sketches[g] = sorted(sub["_h"])[:k]
    # exact per-group token counts + pairwise intersections from the
    # same distinct-incidence dataset (skinny partial fold)
    gt_pd = gt.to_pandas()
    for g, sub in gt_pd.groupby(group_col):
        counts[g] = len(sub)
    tok_groups = gt_pd.groupby("_tok")[group_col].apply(sorted)
    inter: dict = {}
    for gs in tok_groups:
        for i in range(len(gs)):
            for j in range(i + 1, len(gs)):
                inter[(gs[i], gs[j])] = inter.get((gs[i], gs[j]), 0) + 1
    rows = []
    for a, b in ((a, b) for a in sorted(sketches)
                 for b in sorted(sketches) if a < b):
        sa, sb = set(sketches[a]), set(sketches[b])
        union_sketch = sorted(sa | sb)[:k]
        est_num = sum(1 for h in union_sketch if h in sa and h in sb)
        kk = min(k, len(union_sketch))
        it = inter.get((a, b), 0)
        uni = counts[a] + counts[b] - it
        rows.append((a, b, counts[a], counts[b], est_num,
                     est_num / kk if kk else 0.0, it, uni,
                     it / uni if uni else 0.0))
    out = pd.DataFrame(rows, columns=[
        "group_a", "group_b", "n_a", "n_b", "est_num", "jaccard_est",
        "inter", "uni", "jaccard_exact"])
    out["abs_err"] = (out["jaccard_est"]
                      - out["jaccard_exact"]).abs()
    return out.astype({"n_a": "int64", "n_b": "int64",
                       "est_num": "int64", "inter": "int64",
                       "uni": "int64"}) \
        .sort_values(["group_a", "group_b"]).reset_index(drop=True)
