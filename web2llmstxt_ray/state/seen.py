"""Sharded URL-seen filter — the distributed replacement for the
reference's in-memory ``crawled_urls`` / ``all_discovered_links`` sets
(pyc ``discover_all_links_first`` locals; ``crawler/web_crawler.py:84-86``).

Design (north-star): the seen set is partitioned across ``S`` shard
actors by ``hash64(canonical_url) % S`` — a single owner per URL means a
URL can never be fetched twice anywhere in the cluster. Each shard runs
one of three membership structures:

- ``exact``  — a Python set of 64-bit URL hashes. "Exact" means
  HASH-exact: a 64-bit collision would mark a genuinely new URL as
  seen (odds ~n²/2⁶⁵ — ~0.3% cumulative at the 10^10-URL design
  point, negligible below 10^8). Store canonical URLs themselves if
  even that is unacceptable. Used for conformance tests and any scale
  where ~40 B/url is acceptable.
- ``cuckoo`` — a partial-key cuckoo filter (4-slot buckets, 16-bit
  fingerprints ≈ 18 bits/key at 95% load): the 10^10-URL design point
  (~20 GB cluster-wide). Deletions unused; lookups O(2 buckets).
- ``bloom``  — a plain k-hash bloom bit array: the degraded/spill mode
  for cold partitions (smaller, no eviction cascades, higher FP rate).
- ``cuckoo-auto`` — cuckoo with automatic growth: a geometric chain of
  generations (partial-key filters can't rehash from fingerprints), so
  a shard that outgrows its sizing degrades to k-probe lookups instead
  of ballooning its overflow set. Use when per-shard cardinality is
  unpredictable; plain ``cuckoo`` + pressure telemetry when it is.
- ``cuckoo-spill`` — the north-star composition ("cuckoo filter …
  bloom fallback for spill partitions"): generation 0 is a cuckoo;
  overflow past the pressure signal lands in geometric k-hash bloom
  spill partitions (9.6 bits/key, no eviction cascades) instead of 2×
  cuckoo generations. Cheapest memory growth for unexpected overflow;
  ~1% FP per spill partition.

All modes share the hash-collision caveat above; the approximate
modes additionally trade false positives (a *new* URL reported as
seen ⇒ skipped) for memory — never false negatives — so conformance suites run
shards in exact mode and the approximate modes are property-tested for
FP rate separately (BASELINE.md / SURVEY §7.4.3).

The driver-side :class:`SeenFilter` routes batches to owner shards and
reassembles masks in input order; all membership calls are batched
(one RPC per shard per wave, not per URL).
"""

from __future__ import annotations

import pickle

import numpy as np
import ray

from ..functions.urls import hash64, hash64_batch

_FP_MASK = np.uint64(0xFFFF)


def _hash_batch(urls) -> np.ndarray:
    """Stable 64-bit hashes for a batch of URLs (pass-through when the
    caller already hashed — the driver front end hashes once and ships
    raw uint64 arrays to the shards)."""
    if isinstance(urls, np.ndarray) and urls.dtype == np.uint64:
        return urls
    return hash64_batch(list(urls))


class _ExactSet:
    def __init__(self, capacity: int):
        self.items: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        out = np.empty(len(hashes), dtype=bool)
        items = self.items
        for i, h in enumerate(hashes.tolist()):
            if h in items:
                out[i] = False
            else:
                items.add(h)
                out[i] = True
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        items = self.items
        return np.fromiter((h in items for h in hashes.tolist()), dtype=bool,
                           count=len(hashes))

    def __len__(self) -> int:
        return len(self.items)

    def dump(self) -> bytes:
        return pickle.dumps(self.items, protocol=5)

    @classmethod
    def load(cls, blob: bytes) -> "_ExactSet":
        obj = cls(0)
        obj.items = pickle.loads(blob)
        return obj


class _Bloom:
    """k-hash bloom over a numpy bit array; hashes derived from the one
    64-bit key by the Kirsch-Mitzenmacher double-hashing trick."""

    K = 7

    def __init__(self, capacity: int):
        nbits = max(64, int(capacity * 9.6))  # ~1% FP at design load
        self.nbits = np.uint64(nbits)
        self.bits = np.zeros((nbits + 7) // 8, dtype=np.uint8)
        self.n = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes
        h2 = (hashes >> np.uint64(32)) | np.uint64(1)
        ks = np.arange(self.K, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % self.nbits  # (K, n)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        present = ((self.bits[byte_idx] & bit) != 0).all(axis=0)
        new = ~present
        # intra-batch duplicates: only the first occurrence counts as new
        _, first_idx = np.unique(hashes, return_index=True)
        first = np.zeros(len(hashes), dtype=bool)
        first[first_idx] = True
        new &= first
        if new.any():
            nb = byte_idx[:, new].ravel()
            nbit = bit[:, new].ravel()
            np.bitwise_or.at(self.bits, nb, nbit)
            self.n += int(new.sum())
        return new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return ((self.bits[byte_idx] & bit) != 0).all(axis=0)

    def __len__(self) -> int:
        return self.n

    def dump(self) -> bytes:
        return pickle.dumps((int(self.nbits), self.n, self.bits), protocol=5)

    @classmethod
    def load(cls, blob: bytes) -> "_Bloom":
        nbits, n, bits = pickle.loads(blob)
        obj = cls.__new__(cls)
        obj.nbits = np.uint64(nbits)
        obj.bits = bits
        obj.n = n
        return obj


class _Cuckoo:
    """Partial-key cuckoo filter: buckets of 4 × 16-bit fingerprints.

    fp(x) = top 16 bits of hash64 (0 remapped to 1 so 0 can mean
    "empty"); i1 = h mod nb; i2 = i1 XOR (fp * 0x5bd1e995) mod nb —
    the standard partial-key alternate-bucket scheme, so either bucket
    is recoverable from (the other bucket, fp). Insertions kick up to
    500 times then land in a tiny overflow set (exactness preserved;
    overflow growth signals the shard needs resizing/spilling).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = max(8, int(capacity / self.SLOTS / 0.95))
        nb = 1 << int(np.ceil(np.log2(nb)))  # power of two for cheap mod
        self.nb = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        # (bucket, fp) pairs left homeless by failed kick chains; in a
        # partial-key filter (bucket, fp) determines the other bucket,
        # so membership stays checkable with no false negatives
        self.overflow: set[tuple[int, int]] = set()
        self.n = 0
        self._rng = np.random.RandomState(0xC0FFEE)  # deterministic kicks

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.nb - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray | int, fp: np.ndarray | int):
        return (i ^ (np.int64(fp) * np.int64(0x5BD1E995))) & (self.nb - 1)

    def _bucket_has(self, i: int, fp: int) -> bool:
        return bool((self.table[i] == fp).any())

    def _try_insert(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def _insert(self, h: int) -> None:
        fp = (h >> 48) & 0xFFFF or 1
        i1 = h & (self.nb - 1)
        i2 = int(self._alt(i1, fp))
        if self._try_insert(i1, fp) or self._try_insert(i2, fp):
            return
        self._kick(i1 if (h & 1) else i2, fp)

    def _kick(self, i: int, fp: int) -> None:
        """Eviction chain starting at full bucket ``i`` carrying ``fp``."""
        cur = fp
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.randint(self.SLOTS))
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = int(self._alt(i, cur))
            if self._try_insert(i, cur):
                return
        self.overflow.add((i, cur))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        out = hit1 | hit2
        if self.overflow:
            ov = self.overflow
            for j in np.flatnonzero(~out):
                if (int(i1[j]), int(fp[j])) in ov or (int(i2[j]), int(fp[j])) in ov:
                    out[j] = True
        return out

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        new = ~self.contains(hashes)
        if not new.any():
            return new
        idxs = np.flatnonzero(new)
        h_new = hashes[idxs]
        # intra-batch dedupe: only first occurrence of a hash is new
        _, first = np.unique(h_new, return_index=True)
        dup_mask = np.ones(len(idxs), dtype=bool)
        dup_mask[first] = False
        if dup_mask.any():
            new[idxs[dup_mask]] = False
            idxs = idxs[~dup_mask]
            h_new = hashes[idxs]
        if not len(idxs):
            return new

        fps = self._fp(h_new)
        i1s = self._i1(h_new)
        # vectorized bulk placement: keys whose primary bucket is unique
        # within the batch AND has an empty slot are written with two
        # fancy-indexed assignments; the remainder (bucket collisions in
        # the batch, full buckets) goes through the per-key path
        _, first_bucket = np.unique(i1s, return_index=True)
        uniq = np.zeros(len(i1s), dtype=bool)
        uniq[first_bucket] = True
        rows = self.table[i1s]                        # (m, 4) copy
        empty_slot = (rows == 0).argmax(axis=1)
        has_empty = rows[np.arange(len(rows)), empty_slot] == 0
        fast = uniq & has_empty
        self.table[i1s[fast], empty_slot[fast]] = fps[fast]
        self.n += int(fast.sum())

        slow = ~fast
        if slow.any():
            table = self.table
            mask = self.nb - 1
            for h, fp, i1 in zip(h_new[slow].tolist(), fps[slow].tolist(),
                                 i1s[slow].tolist()):
                row = table[i1]
                if row[0] == 0:
                    row[0] = fp
                elif row[1] == 0:
                    row[1] = fp
                elif row[2] == 0:
                    row[2] = fp
                elif row[3] == 0:
                    row[3] = fp
                else:
                    i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
                    row = table[i2]
                    if row[0] == 0:
                        row[0] = fp
                    elif row[1] == 0:
                        row[1] = fp
                    elif row[2] == 0:
                        row[2] = fp
                    elif row[3] == 0:
                        row[3] = fp
                    else:
                        self._kick(i1 if (h & 1) else i2, fp)
                self.n += 1
        return new

    def __len__(self) -> int:
        return self.n

    def dump(self) -> bytes:
        return pickle.dumps((self.nb, self.table, self.overflow, self.n), protocol=5)

    @classmethod
    def load(cls, blob: bytes) -> "_Cuckoo":
        nb, table, overflow, n = pickle.loads(blob)
        obj = cls.__new__(cls)
        obj.nb = nb
        obj.table = table
        obj.overflow = overflow
        obj.n = n
        obj._rng = np.random.RandomState(0xC0FFEE)
        return obj


class _CuckooChain:
    """Auto-degrading cuckoo filter: a geometric chain of `_Cuckoo`
    generations (the standard dynamic-cuckoo construction — a
    partial-key filter cannot rehash from fingerprints, so growth
    appends a 2× generation instead of resizing in place).

    Inserts land in the newest generation; lookups OR across all of
    them (vectorized per generation). A generation is frozen when its
    slot-load passes ``GROW_LOAD`` or its overflow set passes
    ``OVERFLOW_LIMIT`` — the manual "resize at the next checkpoint"
    escape hatch the plain ``cuckoo`` mode documents becomes automatic
    here, at the cost of k× probe work for k generations (k stays
    small: geometric growth ⇒ k ≤ log2(final/initial)). No false
    negatives ever; the false-positive rate is the sum over
    generations, bounded by 2× the final generation's rate.
    """

    GROW_LOAD = 0.90          # of slots (nb × 4), the cuckoo ceiling
    OVERFLOW_LIMIT = 64       # failed-kick strandings before freezing

    def __init__(self, capacity: int):
        self.gens = [_Cuckoo(capacity)]

    def _newest_pressured(self) -> bool:
        g = self.gens[-1]
        return (g.n / (g.nb * g.SLOTS) > self.GROW_LOAD
                or len(g.overflow) > self.OVERFLOW_LIMIT)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        out = self.gens[0].contains(hashes)
        for g in self.gens[1:]:
            miss = ~out
            if not miss.any():
                break
            out[miss] = g.contains(hashes[miss])
        return out

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        new = np.ones(len(hashes), dtype=bool)
        for g in self.gens[:-1]:
            idx = np.flatnonzero(new)
            if not len(idx):
                break
            new[idx[g.contains(hashes[idx])]] = False
        idx = np.flatnonzero(new)
        if not len(idx):
            return new
        # intra-batch dedupe up front (a dup's first copy may land in a
        # generation created mid-call, which later chunks don't probe)
        _, first = np.unique(hashes[idx], return_index=True)
        dup = np.ones(len(idx), dtype=bool)
        dup[first] = False
        new[idx[dup]] = False
        idx = idx[~dup]
        # insert in headroom-bounded chunks so one oversized batch
        # cannot balloon a small generation's overflow set before the
        # pressure check runs
        pos = 0
        while pos < len(idx):
            if self._newest_pressured():
                self._spawn()
            g = self.gens[-1]
            chunk = idx[pos:pos + self._headroom()]
            sub = g.check_and_add(hashes[chunk])
            new[chunk[~sub]] = False       # newest-generation FP ⇒ seen
            pos += len(chunk)
        return new

    def _spawn(self) -> None:
        # nb*SLOTS through the constructor rounds up to the
        # next power of two ⇒ the new generation has 2× buckets
        self.gens.append(_Cuckoo(self.gens[-1].nb * _Cuckoo.SLOTS))

    def _headroom(self) -> int:
        g = self.gens[-1]
        return max(256, int(g.nb * g.SLOTS * self.GROW_LOAD) - g.n)

    def __len__(self) -> int:
        return sum(g.n for g in self.gens)

    def dump(self) -> bytes:
        return pickle.dumps([g.dump() for g in self.gens], protocol=5)

    @classmethod
    def load(cls, blob: bytes) -> "_CuckooChain":
        obj = cls.__new__(cls)
        obj.gens = [_Cuckoo.load(b) for b in pickle.loads(blob)]
        return obj


def _bloom_design_cap(b: _Bloom) -> int:
    """The key count a bloom of this bit width was sized for (inverse
    of the ~9.6 bits/key ≈ 1% FP sizing in ``_Bloom.__init__``)."""
    return max(64, int(int(b.nbits) / 9.6))


class _CuckooSpill(_CuckooChain):
    """North-star spill mode ("partitioned cuckoo-filter URL-seen set,
    bloom fallback for spill partitions"): generation 0 is a cuckoo
    filter sized for the shard's expected cardinality; when it trips
    the pressure signal, growth appends k-hash BLOOM spill partitions
    (geometric capacities) instead of bigger cuckoos.

    Why bloom for the spill tier: a 2× cuckoo generation costs 16
    bits/key of *reserved* slot memory up front, while a bloom spill
    partition costs 9.6 bits/key and never suffers eviction cascades —
    the right trade for overflow the shard was not sized for. The cost
    is ~1% FP per spill partition (vs 2^-13 cuckoo) and no path back to
    deletions — acceptable for seen filters, which never delete.

    Same guarantees as the chain: inserts land in the newest
    generation, lookups OR across all generations, no false negatives
    ever; FP rate is the sum across generations.
    """

    def _spawn(self) -> None:
        last = self.gens[-1]
        if isinstance(last, _Cuckoo):
            cap = int(last.nb * last.SLOTS)
        else:
            cap = _bloom_design_cap(last)
        self.gens.append(_Bloom(cap * 2))

    def _newest_pressured(self) -> bool:
        g = self.gens[-1]
        if isinstance(g, _Cuckoo):
            return (g.n / (g.nb * g.SLOTS) > self.GROW_LOAD
                    or len(g.overflow) > self.OVERFLOW_LIMIT)
        return g.n >= _bloom_design_cap(g)

    def _headroom(self) -> int:
        g = self.gens[-1]
        if isinstance(g, _Cuckoo):
            return max(256, int(g.nb * g.SLOTS * self.GROW_LOAD) - g.n)
        return max(256, _bloom_design_cap(g) - g.n)

    def dump(self) -> bytes:
        return pickle.dumps(
            [("c" if isinstance(g, _Cuckoo) else "b", g.dump())
             for g in self.gens], protocol=5)

    @classmethod
    def load(cls, blob: bytes) -> "_CuckooSpill":
        obj = cls.__new__(cls)
        obj.gens = [(_Cuckoo if kind == "c" else _Bloom).load(b)
                    for kind, b in pickle.loads(blob)]
        return obj


_BACKENDS = {"exact": _ExactSet, "bloom": _Bloom, "cuckoo": _Cuckoo,
             "cuckoo-auto": _CuckooChain, "cuckoo-spill": _CuckooSpill}


@ray.remote
class SeenFilterShard:
    """One membership shard; all APIs take/return whole batches."""

    def __init__(self, mode: str = "exact", capacity: int = 1 << 20):
        self.mode = mode
        self.capacity = capacity
        self.impl = _BACKENDS[mode](capacity)

    def pressure(self) -> dict:
        """Operator telemetry: load factor and (cuckoo) overflow size.
        A cuckoo shard past ~90% load or with a growing overflow set
        needs resizing at the next checkpoint boundary (fingerprints
        alone cannot be rehashed into a bigger table — resize = replay
        the exact key stream from snapshots/lineage, which the per-wave
        checkpoint layout provides)."""
        out = {"mode": self.mode, "n": len(self.impl),
               "capacity": self.capacity,
               "load": round(len(self.impl) / max(1, self.capacity), 4)}
        if isinstance(self.impl, _Cuckoo):
            out["slots"] = self.impl.nb * _Cuckoo.SLOTS
            out["slot_load"] = round(len(self.impl) / out["slots"], 4)
            out["overflow"] = len(self.impl.overflow)
        elif isinstance(self.impl, _CuckooChain):
            cucks = [g for g in self.impl.gens if isinstance(g, _Cuckoo)]
            out["slots"] = sum(g.nb * _Cuckoo.SLOTS for g in cucks)
            out["slot_load"] = round(
                sum(g.n for g in cucks) / max(1, out["slots"]), 4)
            out["overflow"] = sum(len(g.overflow) for g in cucks)
            out["generations"] = len(self.impl.gens)
            if isinstance(self.impl, _CuckooSpill):
                blooms = [g for g in self.impl.gens
                          if isinstance(g, _Bloom)]
                out["spill_partitions"] = len(blooms)
                out["spilled_n"] = sum(g.n for g in blooms)
        return out

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """True per URL ⇔ the URL was new (and is now marked seen)."""
        return self.impl.check_and_add(_hash_batch(urls))

    def contains(self, urls: list[str]) -> np.ndarray:
        return self.impl.contains(_hash_batch(urls))

    def count(self) -> int:
        return len(self.impl)

    def snapshot(self) -> bytes:
        return pickle.dumps((self.mode, self.impl.dump()), protocol=5)

    def restore(self, blob: bytes) -> None:
        mode, payload = pickle.loads(blob)
        self.mode = mode
        self.impl = _BACKENDS[mode].load(payload)


class SeenFilter:
    """Driver-side front end over ``num_shards`` shard actors.

    Routing key: ``hash64(url) % num_shards`` (SURVEY §7.3 — the same
    hash the shard uses internally is fine: shard choice uses the value
    mod S, the structures use other bit ranges).
    """

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 capacity_per_shard: int = 1 << 20):
        self.num_shards = num_shards
        self.mode = mode
        self.shards = [
            SeenFilterShard.remote(mode=mode, capacity=capacity_per_shard)
            for _ in range(num_shards)
        ]

    def _scatter_gather(self, urls: list[str], method: str) -> np.ndarray:
        """Hash once (vectorized), route by ``hash % S`` with numpy, and
        ship raw hash arrays to the shards — URLs are never re-hashed or
        re-serialized shard-side."""
        hashes = hash64_batch(urls)
        owners = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        futures, idx_lists = [], []
        for s in range(self.num_shards):
            idxs = np.flatnonzero(owners == s)
            if len(idxs):
                futures.append(getattr(self.shards[s], method).remote(
                    hashes[idxs]))
                idx_lists.append(idxs)
        out = np.zeros(len(urls), dtype=bool)
        for idxs, mask in zip(idx_lists, ray.get(futures)):
            out[idxs] = mask
        return out

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """Batch test-and-set across shards; True = newly seen."""
        return self._scatter_gather(urls, "check_and_add")

    def contains(self, urls: list[str]) -> np.ndarray:
        return self._scatter_gather(urls, "contains")

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def pressure(self) -> list[dict]:
        """Per-shard load/overflow telemetry (degradation signal)."""
        return ray.get([s.pressure.remote() for s in self.shards])

    def snapshot(self) -> list[bytes]:
        """Per-shard snapshots (written to the wave checkpoint)."""
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.num_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        """Kill the shard actors (frees their memory immediately)."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []
