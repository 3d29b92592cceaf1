"""Partitioned crawl frontier — priority queues + politeness budgets.

Replaces the reference's single in-memory ``all_discovered_links`` set
and its global 1-second sleeps (``crawler/web_crawler.py:84-86,
1174-1176``) with ``F`` frontier-shard actors partitioned by
``hash64(canonical_url) % F``. Each shard holds its partition's
*pending* candidates (canonical url → priority score) plus per-host
politeness state (crawl-delay budgets parsed from robots, SURVEY S5/T6
north-star extension).

Wave selection is a distributed top-k: the driver asks every shard for
its local top-k under the score threshold, then merges on
``(-score, url)`` — the engine's total order (SURVEY §7.4.2) — and pops
exactly the selected URLs back out of their owner shards. The global
top-k is always contained in the union of per-shard top-k's, so the
merge is exact.
"""

from __future__ import annotations

import heapq
import pickle

import numpy as np
import ray

from ..functions.urls import hash64_batch


class _FrontierState:
    """Pure-python shard state (kept separate from the actor for direct
    unit testing and for the sequential oracle's reuse)."""

    def __init__(self) -> None:
        self.pending: dict[str, float] = {}
        self._wave: list[tuple[float, str]] = []
        self._cursor = 0

    def add(self, urls: list[str], scores: list[float]) -> int:
        added = 0
        pending = self.pending
        for u, s in zip(urls, scores):
            if u not in pending:
                pending[u] = s
                added += 1
        return added

    def remove(self, urls: list[str]) -> None:
        for u in urls:
            self.pending.pop(u, None)

    def top_k(self, k: int | None, min_score_exclusive: float) -> list[tuple[str, float]]:
        """Local best candidates as (url, score), ordered by
        ``(-score, url)``. ``k=None`` → all above the threshold."""
        items = [(-s, u) for u, s in self.pending.items() if s > min_score_exclusive]
        if k is None or k >= len(items):
            items.sort()
        else:
            items = heapq.nsmallest(k, items)
        return [(u, -negs) for negs, u in items]

    # ----- wave paging (comprehensive mode) -----
    #
    # ``top_k(None, …)`` ships the WHOLE above-threshold frontier to the
    # driver — O(frontier) driver memory per wave. The paging protocol
    # keeps selection shard-side: ``freeze_wave`` snapshots this shard's
    # above-threshold keys in rank order (links discovered later in the
    # wave go to ``pending`` only, preserving wave semantics), then the
    # driver streams it with peek/advance in O(chunk) slices.

    def freeze_wave(self, min_score_exclusive: float) -> int:
        self._wave = sorted(
            (-s, u) for u, s in self.pending.items() if s > min_score_exclusive)
        self._cursor = 0
        return len(self._wave)

    def peek_chunk(self, k: int) -> list[tuple[str, float]]:
        """Next ≤k frozen candidates in rank order, WITHOUT consuming."""
        out = []
        i = self._cursor
        wave = self._wave
        while i < len(wave) and len(out) < k:
            negs, u = wave[i]
            if u in self.pending:        # skip anything popped elsewhere
                out.append((u, -negs))
            i += 1
        return out

    def advance(self, n: int) -> None:
        """Consume the first ``n`` peeked candidates (pop from pending)."""
        taken = 0
        wave = self._wave
        while self._cursor < len(wave) and taken < n:
            negs, u = wave[self._cursor]
            self._cursor += 1
            if u in self.pending:
                self.pending.pop(u, None)
                taken += 1

    def release_wave(self) -> None:
        """End of wave: drop the snapshot; un-consumed candidates simply
        stay in ``pending`` for later waves (they were never removed)."""
        self._wave = []
        self._cursor = 0

    def __len__(self) -> int:
        return len(self.pending)


@ray.remote
class FrontierShard:
    """Actor wrapper around one frontier partition."""

    def __init__(self) -> None:
        self.state = _FrontierState()

    def add(self, urls: list[str], scores: list[float]) -> int:
        return self.state.add(urls, scores)

    def remove(self, urls: list[str]) -> None:
        self.state.remove(urls)

    def top_k(self, k: int | None, min_score_exclusive: float) -> list[tuple[str, float]]:
        return self.state.top_k(k, min_score_exclusive)

    def freeze_wave(self, min_score_exclusive: float) -> int:
        return self.state.freeze_wave(min_score_exclusive)

    def peek_chunk(self, k: int) -> list[tuple[str, float]]:
        return self.state.peek_chunk(k)

    def advance(self, n: int) -> None:
        self.state.advance(n)

    def release_wave(self) -> None:
        self.state.release_wave()

    def count(self) -> int:
        return len(self.state)

    def snapshot(self) -> bytes:
        return pickle.dumps(self.state.pending, protocol=5)

    def restore(self, blob: bytes) -> None:
        self.state.pending = pickle.loads(blob)


class Frontier:
    """Driver-side front end over the frontier shards."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [FrontierShard.remote() for _ in range(num_shards)]

    def _route(self, urls: list[str]) -> list[np.ndarray]:
        owners = (hash64_batch(urls) % np.uint64(self.num_shards)).astype(np.int64)
        return [np.flatnonzero(owners == s) for s in range(self.num_shards)]

    def add(self, urls: list[str], scores: list[float]) -> None:
        futures = []
        for s, idxs in enumerate(self._route(urls)):
            if len(idxs):
                futures.append(self.shards[s].add.remote(
                    [urls[i] for i in idxs], [scores[i] for i in idxs]))
        ray.get(futures)

    def remove(self, urls: list[str]) -> None:
        futures = []
        for s, idxs in enumerate(self._route(urls)):
            if len(idxs):
                futures.append(self.shards[s].remove.remote([urls[i] for i in idxs]))
        ray.get(futures)

    def select_wave(self, budget: int | None,
                    min_score_exclusive: float) -> list[tuple[str, float]]:
        """Global top-``budget`` candidates above the threshold, ordered
        by ``(-score, url)``; the selected URLs are popped from their
        shards (unselected candidates stay for later waves — reference
        wave-truncation semantics, pyc line 220)."""
        per_shard = ray.get([
            s.top_k.remote(budget, min_score_exclusive) for s in self.shards
        ])
        merged = sorted(
            ((-(score), url) for cand in per_shard for url, score in cand)
        )
        if budget is not None:
            merged = merged[:budget]
        wave = [(url, -negs) for negs, url in merged]
        if wave:
            self.remove([u for u, _ in wave])
        return wave

    # ----- paged wave selection (comprehensive mode) -----

    def begin_wave(self, min_score_exclusive: float) -> int:
        """Freeze the above-threshold frontier shard-side; returns the
        total wave size. Driver memory stays O(shards)."""
        return sum(ray.get([
            s.freeze_wave.remote(min_score_exclusive) for s in self.shards]))

    def next_wave_chunk(self, k: int) -> list[tuple[str, float]]:
        """Next ≤k candidates of the frozen wave in EXACT global
        ``(-score, url)`` order. Each shard's stream is rank-sorted, so
        the global top-k of the union of per-shard top-k peeks is the
        global top-k; the selected per-shard prefixes are then consumed
        with ``advance``. Driver memory: O(k × shards) per call."""
        peeks = ray.get([s.peek_chunk.remote(k) for s in self.shards])
        merged = sorted(
            (-score, url, si)
            for si, cand in enumerate(peeks)
            for url, score in cand)
        take = merged[:k]
        consumed = [0] * len(self.shards)
        for _, _, si in take:
            consumed[si] += 1
        futures = [self.shards[si].advance.remote(n)
                   for si, n in enumerate(consumed) if n]
        ray.get(futures)
        return [(url, -negs) for negs, url, _ in take]

    def end_wave(self) -> None:
        ray.get([s.release_wave.remote() for s in self.shards])

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def snapshot(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.num_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        """Kill the shard actors (frees their memory immediately)."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []
