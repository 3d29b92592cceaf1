"""Distributed BFS-with-priority crawler — the engine's north-star core.

Reproduces the reference's sequential crawl loop (pyc
``discover_all_links_first`` lines 169-249, SURVEY §2.3) as a
wave-synchronized Ray pipeline that yields the SAME visit order, URL-seen
set, page records and span documents as ``pipelines.oracle.crawl_oracle``
— while fetching each wave in parallel.

Per wave:

1. **Select** — distributed top-k from the frontier shards under the
   score threshold, ordered by the total order ``(-score, url)``
   (``state.frontier.Frontier.select_wave``). Budget =
   ``safety_limit - pages_so_far`` (non-comprehensive) or unbounded.
2. **Fetch** — the wave becomes a Ray ``Dataset`` with one block per
   host bucket (explicit hash partitioning on
   ``host_bucket = hash64(host) % B`` kills per-domain skew and gives
   politeness locality); ``map_batches`` over a fetch actor pool, whole
   block per batch so one actor owns each host bucket's pacing
   (crawl-delay budget between same-host fetches). Speculative: the
   whole wave is fetched in parallel. The result is materialized ONCE
   (wave-sized working set) and consumed three times below without
   re-execution — so a URL is never fetched twice.
3. **Decide** — the driver pulls only ``(wave_rank, url, success,
   word_count, score)`` — a few bytes per URL — and replays acceptance
   in rank order: the mid-wave safety cutoff (pyc line 227) depends on
   *accepted* counts, so acceptance is decided sequentially even though
   fetching wasn't (SURVEY §7.4.1). URLs at or before the cutoff are
   marked in the seen filter (even failures — pyc lines 232-233); URLs
   past the cutoff are returned to the frontier untouched.
4. **Commit** — accepted rows get ``visit_index`` / ``discovery_phase``
   attached inside ``map_batches`` (broadcast decision dict) and are
   written as per-wave Parquet partitions (page records + span
   documents) — the resumable layout; content never lands on the
   driver.
5. **Expand** — links are extracted from accepted pages inside
   ``map_batches`` (never on the driver), admitted (same-domain +
   robots-disallow + score threshold), checked against the seen shards
   and pushed straight into the frontier shards from the worker tasks.
6. **Checkpoint** — frontier + seen snapshots and wave metrics are
   committed with an atomic manifest pointer written last; resume
   replays from the last committed wave with zero refetches
   (SURVEY §7.4.6).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from .. import schema as S
from ..functions.links import extract_links
from ..functions.urls import canonicalize_url, hash64, host_of, score_urls
from ..stages.fetch import MockFetcher
from ..stages.spans import extract_spans
from ..state.frontier import Frontier
from ..state.seen import SeenFilter
from .oracle import MAIN_PAGE_SCORE, MIN_WORDS, admit_links

_FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()), ("success", pa.bool_()), ("title", pa.string()),
        ("content", pa.large_string()), ("html", pa.large_string()),
        ("word_count", pa.int64()), ("score", pa.float64()),
        ("depth", pa.int32()), ("wave_rank", pa.int64()),
    ]
)


@dataclass
class CrawlConfig:
    base_url: str
    max_pages: int = 25
    comprehensive: bool = False
    safety_limit: int | None = None
    respect_robots: bool = True
    num_seen_shards: int = 4
    num_frontier_shards: int = 4
    num_host_buckets: int = 8
    fetch_concurrency: int = 4
    seen_mode: str = "exact"          # exact | bloom | cuckoo
    session_id: str = "ray_crawl"
    run_dir: str | None = None         # checkpoint root; None = no checkpoints
    host_delays_ms: dict = field(default_factory=dict)
    timestamp_us: int = 0              # run timestamp (fixed → deterministic)

    @property
    def depth_limit(self) -> int:
        return 5 if self.comprehensive else 3   # pyc line 208

    @property
    def effective_safety(self) -> int:
        return self.safety_limit or self.max_pages * (10 if self.comprehensive else 5)

    @property
    def score_threshold(self) -> float:
        return 0.0 if self.comprehensive else 1.0   # pyc line 218


class _WaveFetcher(MockFetcher):
    """Fetch actor for wave batches: mock fetch + per-host politeness
    pacing + optional fetch logging (tests), carrying ``wave_rank``
    through alongside the fetch results."""

    def __init__(self, site_ref, host_delays_ms=None, fetch_log=None):
        super().__init__(site_ref)
        self.host_delays_ms = host_delays_ms or {}
        self.fetch_log = fetch_log

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        scores = batch.column("score").to_pylist()
        depths = batch.column("depth").to_pylist()
        ranks = batch.column("wave_rank").to_pylist()
        last_fetch_by_host: dict[str, float] = {}
        rows = []
        for u, s, d, r in zip(urls, scores, depths, ranks):
            host = host_of(u)
            delay = self.host_delays_ms.get(host, 0) / 1000.0
            if delay > 0:
                prev = last_fetch_by_host.get(host)
                if prev is not None:
                    wait = prev + delay - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                last_fetch_by_host[host] = time.monotonic()
            row = self.fetch_one(u, s, d)
            row["wave_rank"] = r
            rows.append(row)
        if self.fetch_log is not None:
            self.fetch_log.log.remote(urls)
        return pa.Table.from_pylist(rows, schema=_FETCH_SCHEMA)


@ray.remote(num_cpus=0)
class FetchLog:
    """Test-support actor recording every fetched URL (used by the
    kill-and-resume test to prove zero refetches)."""

    def __init__(self) -> None:
        self.urls: list[str] = []

    def log(self, urls: list[str]) -> None:
        self.urls.extend(urls)

    def get(self) -> list[str]:
        return self.urls


class _PageCommitter:
    """``map_batches`` stage attaching visit_index/phase to ACCEPTED rows
    and dropping the rest; emits ``PAGE_RECORDS`` batches."""

    def __init__(self, accepted_ref, session_id: str, phase: str, ts_us: int):
        self.accepted: dict[str, int] = (
            ray.get(accepted_ref) if isinstance(accepted_ref, ray.ObjectRef)
            else accepted_ref
        )
        self.session_id = session_id
        self.phase = phase
        self.ts_us = ts_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mask = pa.array([u in self.accepted for u in urls])
        acc = batch.filter(mask)
        kept = acc.column("url").to_pylist()
        n = len(kept)
        return pa.Table.from_arrays(
            [
                acc.column("url"), acc.column("title"), acc.column("content"),
                acc.column("word_count"), acc.column("score"), acc.column("depth"),
                pa.array([self.session_id] * n, pa.string()),
                pa.array([self.ts_us] * n, pa.timestamp("us")),
                pa.array([self.phase] * n, pa.string()),
                pa.array([self.accepted[u] for u in kept], pa.int64()),
            ],
            schema=S.PAGE_RECORDS,
        )


class _SpanCommitter(_PageCommitter):
    """Accepted rows → ``SPAN_DOCUMENTS`` batches (doc_id, spans)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mask = pa.array([u in self.accepted for u in urls])
        acc = batch.filter(mask)
        return pa.Table.from_pydict(
            {
                "doc_id": acc.column("url").to_pylist(),
                "spans": [extract_spans(c or "")
                          for c in acc.column("content").to_pylist()],
            },
            schema=S.SPAN_DOCUMENTS,
        )


class LinkAdmitter:
    """``map_batches`` stage running wave expansion fully on workers: for
    each ACCEPTED page row, extract links, apply admission rules, score,
    drop already-seen URLs, and push the survivors to their owner
    frontier shards directly — the driver never touches link traffic
    (SURVEY §7.3: link dedup / seen routing shuffle)."""

    def __init__(self, base_url: str, disallow_by_host: dict | None,
                 accepted_ref, seen_shards, frontier_shards,
                 score_threshold: float):
        self.base_url = base_url
        self.disallow = disallow_by_host
        self.accepted: dict[str, int] = (
            ray.get(accepted_ref) if isinstance(accepted_ref, ray.ObjectRef)
            else accepted_ref
        )
        self.seen_shards = seen_shards
        self.frontier_shards = frontier_shards
        self.threshold = score_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        contents = batch.column("content").to_pylist()

        candidates: dict[str, float] = {}
        for u, h, c in zip(urls, htmls, contents):
            if u not in self.accepted:
                continue
            links = admit_links(
                extract_links(u, h, c, self.base_url), self.base_url, self.disallow
            )
            if not links:
                continue
            for link, score in zip(links, score_urls(links, self.base_url)):
                if score > self.threshold and link not in candidates:
                    candidates[link] = score

        n_added = 0
        if candidates:
            cand_urls = list(candidates)
            ns = len(self.seen_shards)
            per_seen: list[list[str]] = [[] for _ in range(ns)]
            for u in cand_urls:
                per_seen[hash64(u) % ns].append(u)
            futures, chunks = [], []
            for s, chunk in enumerate(per_seen):
                if chunk:
                    futures.append(self.seen_shards[s].contains.remote(chunk))
                    chunks.append(chunk)
            fresh: list[str] = []
            for chunk, mask in zip(chunks, ray.get(futures)):
                fresh.extend(u for u, m in zip(chunk, mask) if not m)
            nf = len(self.frontier_shards)
            per_frontier: list[list[str]] = [[] for _ in range(nf)]
            for u in fresh:
                per_frontier[hash64(u) % nf].append(u)
            adds = []
            for s, chunk in enumerate(per_frontier):
                if chunk:
                    adds.append(self.frontier_shards[s].add.remote(
                        chunk, [candidates[u] for u in chunk]))
            n_added = sum(ray.get(adds))
        return pa.Table.from_pydict({"n_added": [n_added]})


@dataclass
class CrawlResult:
    visit_order: list[str]
    run_dir: str | None
    total_pages: int
    total_fetches: int
    waves: int
    metrics: list[dict]


class DistributedCrawler:
    """Driver object orchestrating the wave loop over Ray state actors."""

    def __init__(self, config: CrawlConfig, site_index: dict[str, dict],
                 disallow_by_host: dict | None = None, fetch_log=None):
        self.cfg = config
        self.site_ref = ray.put(site_index)
        self.disallow = disallow_by_host if config.respect_robots else None
        self.seen = SeenFilter(config.num_seen_shards, mode=config.seen_mode)
        self.frontier = Frontier(config.num_frontier_shards)
        self.fetch_log = fetch_log
        self.pages_so_far = 0
        self.visit_order: list[str] = []
        self.metrics: list[dict] = []
        self.total_fetches = 0
        self._completed_depth = -1  # -1 = nothing done; 0 = main page done

    # ----- checkpoint plumbing -----

    def _wave_dir(self, depth: int) -> str:
        assert self.cfg.run_dir
        return os.path.join(self.cfg.run_dir, f"wave_{depth}")

    def _commit(self, depth: int, wave_metrics: dict) -> None:
        if not self.cfg.run_dir:
            return
        d = self._wave_dir(depth)
        state_dir = os.path.join(d, "state")
        os.makedirs(state_dir, exist_ok=True)
        for i, blob in enumerate(self.seen.snapshot()):
            with open(os.path.join(state_dir, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
        for i, blob in enumerate(self.frontier.snapshot()):
            with open(os.path.join(state_dir, f"frontier_{i}.bin"), "wb") as f:
                f.write(blob)
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump(wave_metrics, f)
        # manifest pointer written LAST and atomically: a partially
        # written wave is never visible (SURVEY §7.4.6)
        manifest = {
            "completed_depth": depth,
            "pages_so_far": self.pages_so_far,
            "visit_order": self.visit_order,
            "total_fetches": self.total_fetches,
            "config": {"base_url": self.cfg.base_url,
                       "max_pages": self.cfg.max_pages,
                       "comprehensive": self.cfg.comprehensive},
        }
        tmp = os.path.join(self.cfg.run_dir, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.cfg.run_dir, "manifest.json"))

    def resume(self) -> bool:
        """Load the latest committed wave state; True when a checkpoint
        existed. After this, ``run()`` continues from the next wave."""
        if not self.cfg.run_dir:
            return False
        mpath = os.path.join(self.cfg.run_dir, "manifest.json")
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            manifest = json.load(f)
        depth = manifest["completed_depth"]
        state_dir = os.path.join(self._wave_dir(depth), "state")
        seen_blobs = []
        for i in range(self.cfg.num_seen_shards):
            with open(os.path.join(state_dir, f"seen_{i}.bin"), "rb") as f:
                seen_blobs.append(f.read())
        frontier_blobs = []
        for i in range(self.cfg.num_frontier_shards):
            with open(os.path.join(state_dir, f"frontier_{i}.bin"), "rb") as f:
                frontier_blobs.append(f.read())
        self.seen.restore(seen_blobs)
        self.frontier.restore(frontier_blobs)
        self.pages_so_far = manifest["pages_so_far"]
        self.visit_order = list(manifest["visit_order"])
        self.total_fetches = manifest["total_fetches"]
        self._completed_depth = depth
        return True

    # ----- pipeline steps -----

    def _fetch_wave(self, wave: list[tuple[str, float]], depth: int):
        """Fetch a wave distributedly (one block per host bucket) and
        materialize the result once."""
        cfg = self.cfg
        by_bucket: dict[int, list[tuple[int, str, float]]] = {}
        for rank, (url, score) in enumerate(wave):
            b = hash64(host_of(url)) % cfg.num_host_buckets
            by_bucket.setdefault(b, []).append((rank, url, score))
        blocks = []
        for b, items in sorted(by_bucket.items()):
            blocks.append(pa.Table.from_pydict({
                "url": [u for _, u, _ in items],
                "score": pa.array([s for _, _, s in items], pa.float64()),
                "depth": pa.array([depth] * len(items), pa.int32()),
                "wave_rank": pa.array([r for r, _, _ in items], pa.int64()),
            }))
        ds = ray.data.from_arrow(blocks)
        fetched = ds.map_batches(
            _WaveFetcher,
            fn_constructor_kwargs={
                "site_ref": self.site_ref,
                "host_delays_ms": cfg.host_delays_ms,
                "fetch_log": self.fetch_log,
            },
            batch_size=None,  # whole block per batch → one actor per host bucket
            batch_format="pyarrow",
            concurrency=min(cfg.fetch_concurrency, len(blocks)),
            num_cpus=1,
        ).materialize()
        self.total_fetches += len(wave)
        return fetched

    def _decide(self, fetched, depth: int) -> dict[str, int]:
        """Replay acceptance in wave-rank order (driver-side, O(wave) in
        cheap ops over a 5-column frame). Returns url→visit_index."""
        cfg = self.cfg
        small = pa.concat_tables(
            [ray.get(ref) for ref in
             fetched.select_columns(
                 ["wave_rank", "url", "success", "word_count", "score"]
             ).to_arrow_refs()]
        )
        small = small.take(pc.sort_indices(small.column("wave_rank")))
        accepted: dict[str, int] = {}
        to_seen: list[str] = []
        returned: list[tuple[str, float]] = []
        for u, ok, wc, sc in zip(
            small.column("url").to_pylist(), small.column("success").to_pylist(),
            small.column("word_count").to_pylist(), small.column("score").to_pylist(),
        ):
            if self.pages_so_far >= cfg.effective_safety:    # pyc line 227
                returned.append((u, sc))                      # past cutoff: untouched
                continue
            to_seen.append(u)                                 # pyc lines 232-233
            if ok and (depth == 0 or wc >= MIN_WORDS):        # pyc line 237
                accepted[u] = self.pages_so_far
                self.pages_so_far += 1
                self.visit_order.append(u)
        if to_seen:
            self.seen.check_and_add(to_seen)
        if returned:
            self.frontier.add([u for u, _ in returned], [s for _, s in returned])
        return accepted

    def _commit_pages(self, fetched, accepted: dict[str, int],
                      depth: int, phase: str) -> None:
        """Write accepted page records + span documents for this wave as
        Parquet partitions — distributed writes; content never lands on
        the driver."""
        if not self.cfg.run_dir or not accepted:
            return
        d = self._wave_dir(depth)
        accepted_ref = ray.put(accepted)
        common = {"session_id": self.cfg.session_id, "phase": phase,
                  "ts_us": self.cfg.timestamp_us}
        fetched.map_batches(
            _PageCommitter, fn_constructor_kwargs={"accepted_ref": accepted_ref, **common},
            batch_format="pyarrow", concurrency=2,
        ).write_parquet(os.path.join(d, "pages.parquet"))
        fetched.map_batches(
            _SpanCommitter, fn_constructor_kwargs={"accepted_ref": accepted_ref, **common},
            batch_format="pyarrow", concurrency=2,
        ).write_parquet(os.path.join(d, "spans.parquet"))

    def _expand(self, fetched, accepted: dict[str, int]) -> int:
        """Distributed link admission (step 5)."""
        if not accepted:
            return 0
        cfg = self.cfg
        accepted_ref = ray.put(accepted)
        out = fetched.select_columns(["url", "html", "content"]).map_batches(
            LinkAdmitter,
            fn_constructor_kwargs={
                "base_url": cfg.base_url,
                "disallow_by_host": self.disallow,
                "accepted_ref": accepted_ref,
                "seen_shards": self.seen.shards,
                "frontier_shards": self.frontier.shards,
                "score_threshold": cfg.score_threshold,
            },
            batch_format="pyarrow",
            concurrency=cfg.fetch_concurrency,
            num_cpus=1,
        )
        return sum(r["n_added"] for r in out.take_all())

    # ----- the loop -----

    def _run_wave(self, wave: list[tuple[str, float]], depth: int,
                  phase: str) -> None:
        fetched = self._fetch_wave(wave, depth)
        accepted = self._decide(fetched, depth)
        self._commit_pages(fetched, accepted, depth, phase)
        if depth < self.cfg.depth_limit:                     # pyc lines 239-240
            self._expand(fetched, accepted)
        self.metrics.append({"depth": depth, "wave_size": len(wave),
                             "accepted": len(accepted)})
        self._commit(depth, self.metrics[-1])
        self._completed_depth = depth

    def run(self) -> CrawlResult:
        cfg = self.cfg
        t0 = time.perf_counter()

        if self._completed_depth < 0:
            # wave 0: the main page (depth 0, score 10.0, no word filter)
            main_url = canonicalize_url(cfg.base_url)
            self._run_wave([(main_url, MAIN_PAGE_SCORE)], 0, "main_page")

        for depth in range(max(1, self._completed_depth + 1), cfg.depth_limit + 1):
            if self.pages_so_far >= cfg.effective_safety:    # pyc line 212
                break
            budget = (None if cfg.comprehensive
                      else cfg.effective_safety - self.pages_so_far)
            wave = self.frontier.select_wave(budget, cfg.score_threshold)
            if not wave:                                     # pyc line 221
                break
            self._run_wave(wave, depth, f"depth_{depth}")

        elapsed = time.perf_counter() - t0
        self.metrics.append({"elapsed_s": elapsed})
        return CrawlResult(
            visit_order=self.visit_order,
            run_dir=self.cfg.run_dir,
            total_pages=self.pages_so_far,
            total_fetches=self.total_fetches,
            waves=self._completed_depth + 1,
            metrics=self.metrics,
        )


def read_crawl_output(run_dir: str, what: str = "pages") -> pa.Table:
    """Concatenate the per-wave Parquet partitions of a crawl run,
    ordered by visit_index for pages (O4: crawl-order preservation)."""
    parts = []
    for name in sorted(os.listdir(run_dir)):
        p = os.path.join(run_dir, name, f"{what}.parquet")
        if name.startswith("wave_") and os.path.isdir(os.path.join(run_dir, name)):
            if os.path.isdir(p):
                for f in sorted(os.listdir(p)):
                    if f.endswith(".parquet"):
                        parts.append(pq.read_table(os.path.join(p, f)))
            elif os.path.exists(p):
                parts.append(pq.read_table(p))
    schema = S.PAGE_RECORDS if what == "pages" else S.SPAN_DOCUMENTS
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return schema.empty_table()
    t = pa.concat_tables([t.cast(schema) for t in parts])
    if what == "pages":
        t = t.take(pc.sort_indices(t.column("visit_index")))
    return t
