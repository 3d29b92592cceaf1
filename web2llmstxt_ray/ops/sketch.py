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
