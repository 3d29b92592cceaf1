"""Distributed BFS-with-priority crawler — the engine's north-star core.

Reproduces the reference's sequential crawl loop (pyc
``discover_all_links_first`` lines 169-249, SURVEY §2.3) as a
wave-synchronized distributed pipeline that yields the SAME visit order,
URL-seen set, page records and span documents as
``pipelines.oracle.crawl_oracle`` — while fetching each wave in parallel.

Architecture note — why persistent actors and not per-wave Datasets:
the wave loop is an *iterative, stateful* computation (frontier shards,
seen shards, per-host politeness clocks, fetch sessions) with a barrier
per wave. Ray Data expresses single-pass streaming pipelines superbly
but cannot keep an actor pool alive across executions, so a
Dataset-per-wave design pays pool spin-up for every wave (measured ~6 s
per wave at test scale vs <0.2 s with persistent actors). Hence the
wave machinery runs on a fixed pool of ``CrawlWorker`` actors — exactly
the "raw actors where the Dataset API genuinely can't express the
semantics" carve-out — while the engine's bulk paths (seed-list /
sitemap crawls, span extraction over corpora, llms.txt assembly,
training-data ops) are ordinary Ray Data ``map_batches`` pipelines
(see ``pipelines.urllist``, ``pipelines.llms``, ``ops``).

Per wave:

1. **Select** — distributed top-k from the frontier shards under the
   score threshold, ordered by the total order ``(-score, url)``
   (``state.frontier.Frontier.select_wave``). Budget =
   ``safety_limit - pages_so_far`` (non-comprehensive) or unbounded.
2. **Fetch** — wave URLs are partitioned by ``host_bucket =
   hash64(host) % B`` and each bucket goes to its OWNER worker
   (``bucket % num_workers`` — stable across waves, so per-host
   politeness clocks live in exactly one place). Workers fetch their
   buckets in parallel — speculatively, the whole wave — keep the full
   page payloads in actor memory, and return only a small
   ``(wave_rank, url, success, word_count, score)`` frame.
3. **Decide** — the driver replays acceptance in rank order over the
   small frames: the mid-wave safety cutoff (pyc line 227) depends on
   *accepted* counts, so acceptance is sequential even though fetching
   wasn't (SURVEY §7.4.1). URLs at or before the cutoff are marked in
   the seen filter (even failures — pyc lines 232-233); URLs past the
   cutoff are returned to the frontier untouched.
4. **Commit + Expand** — each worker, for its own bucket's accepted
   rows: attaches ``visit_index``/``discovery_phase`` (broadcast
   decision dict), writes per-wave/per-bucket Parquet partitions of
   page records and span documents (the resumable layout — page
   payloads never touch the driver), extracts + admits links
   (same-domain, robots-disallow, score threshold), drops already-seen
   URLs against the seen shards and pushes survivors straight into the
   frontier shards. Link traffic never funnels through the driver.
5. **Checkpoint** — frontier + seen snapshots and wave metrics are
   committed with an atomic manifest pointer written last; resume
   replays from the last committed wave with zero refetches
   (SURVEY §7.4.6).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .. import schema as S
from ..functions.links import extract_links
from ..functions.urls import canonicalize_url, hash64, host_of, score_urls
from ..stages.fetch import MockFetcher
from ..stages.spans import extract_spans
from ..state.frontier import Frontier
from ..state.seen import SeenFilter
from .oracle import MAIN_PAGE_SCORE, MIN_WORDS, admit_links


@dataclass
class CrawlConfig:
    base_url: str
    max_pages: int = 25
    comprehensive: bool = False
    safety_limit: int | None = None
    respect_robots: bool = True
    num_seen_shards: int = 4
    num_frontier_shards: int = 4
    num_host_buckets: int = 16
    num_workers: int = 4
    seen_mode: str = "exact"  # exact|bloom|cuckoo|cuckoo-auto|cuckoo-spill
    session_id: str = "ray_crawl"
    run_dir: str | None = None         # checkpoint root; None = no checkpoints
    host_delays_ms: dict = field(default_factory=dict)
    timestamp_us: int = 0              # run timestamp (fixed → deterministic)
    score_fn: object = None            # (urls, base_url)->ndarray; None = reference scorer
    fetcher_factory: object = None     # (site_ref)->fetcher; None = MockFetcher

    @property
    def depth_limit(self) -> int:
        return 5 if self.comprehensive else 3   # pyc line 208

    @property
    def effective_safety(self) -> int:
        return self.safety_limit or self.max_pages * (10 if self.comprehensive else 5)

    @property
    def score_threshold(self) -> float:
        return 0.0 if self.comprehensive else 1.0   # pyc line 218


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


@ray.remote
class CrawlWorker:
    """One member of the persistent fetch/extract/commit pool.

    Holds, for its lifetime: the fetch session (here the broadcast mock
    site index — in production a browser/HTTP client, reference T5
    ``crawler/web_crawler.py:101,293``), per-host politeness clocks
    (hosts are pinned to workers via ``host_bucket % num_workers``, so
    a host's crawl-delay budget is enforced by exactly one clock), and
    the current wave's fetched payloads (consumed by the commit step
    without a round trip through the driver or the object store).
    """

    def __init__(self, site_ref, base_url: str, disallow: dict | None,
                 host_delays_ms: dict, score_threshold: float,
                 session_id: str, ts_us: int,
                 seen_shards, frontier_shards, fetch_log=None,
                 score_fn=None, fetcher_factory=None):
        self.score_fn = score_fn or score_urls
        # fetcher seam: MockFetcher by default; a factory swaps in the
        # real NetworkFetcher (conformance-tested equal over the
        # loopback fixture server, tests/test_network_models.py)
        self.fetcher = (fetcher_factory(site_ref) if fetcher_factory
                        else MockFetcher(site_ref))
        self.base_url = base_url
        self.disallow = disallow
        self.host_delays_ms = host_delays_ms or {}
        self.threshold = score_threshold
        self.session_id = session_id
        self.ts_us = ts_us
        self.seen_shards = seen_shards
        self.frontier_shards = frontier_shards
        self.fetch_log = fetch_log
        self.last_fetch_by_host: dict[str, float] = {}
        self._wave: list[dict] = []          # this wave's fetched payloads

    def warm(self) -> bool:
        """Force constructor side effects (site-index position map) so a
        benchmark can exclude one-time warmup from timed waves."""
        return self.fetcher is not None

    def fetch(self, urls: list[str], scores: list[float], ranks: list[int],
              depth: int) -> pa.Table:
        """Fetch a wave slice (politeness-paced per host); keep payloads
        locally, return only the small decision frame."""
        rows = []
        for u, s, r in zip(urls, scores, ranks):
            host = host_of(u)
            delay = self.host_delays_ms.get(host, 0) / 1000.0
            if delay > 0:
                prev = self.last_fetch_by_host.get(host)
                if prev is not None:
                    wait = prev + delay - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                self.last_fetch_by_host[host] = time.monotonic()
            row = self.fetcher.fetch_one(u, s, depth)
            row["wave_rank"] = r
            rows.append(row)
        if self.fetch_log is not None:
            self.fetch_log.log.remote(urls)
        # REPLACE (not extend): exactly one fetch per worker per wave, so
        # assignment also discards any stale buffer from an aborted wave
        self._wave = rows
        return pa.table({
            "wave_rank": pa.array([r["wave_rank"] for r in rows], pa.int64()),
            "url": [r["url"] for r in rows],
            "success": [r["success"] for r in rows],
            "word_count": pa.array([r["word_count"] for r in rows], pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
        })

    def commit_and_expand(self, accepted: dict[str, int], depth: int,
                          phase: str, wave_dir: str | None,
                          expand: bool) -> dict:
        """Write this worker's accepted rows (pages + spans Parquet) and
        push admitted fresh links into the frontier shards."""
        rows = self._wave
        self._wave = []
        acc_rows = [r for r in rows if r["url"] in accepted]

        if wave_dir and acc_rows:
            os.makedirs(wave_dir, exist_ok=True)
            n = len(acc_rows)
            pages = pa.Table.from_arrays(
                [
                    pa.array([r["url"] for r in acc_rows], pa.string()),
                    pa.array([r["title"] for r in acc_rows], pa.string()),
                    pa.array([r["content"] for r in acc_rows], pa.large_string()),
                    pa.array([r["word_count"] for r in acc_rows], pa.int64()),
                    pa.array([r["score"] for r in acc_rows], pa.float64()),
                    pa.array([r["depth"] for r in acc_rows], pa.int32()),
                    pa.array([self.session_id] * n, pa.string()),
                    pa.array([self.ts_us] * n, pa.timestamp("us")),
                    pa.array([phase] * n, pa.string()),
                    pa.array([accepted[r["url"]] for r in acc_rows], pa.int64()),
                ],
                schema=S.PAGE_RECORDS,
            )
            spans = pa.Table.from_pydict(
                {
                    "doc_id": [r["url"] for r in acc_rows],
                    "spans": [extract_spans(r["content"] or "") for r in acc_rows],
                },
                schema=S.SPAN_DOCUMENTS,
            )
            # one file per worker per commit → naturally partitioned
            # output; a per-worker sequence keeps chunked-wave commits
            # from ever colliding
            self._commit_seq = getattr(self, "_commit_seq", 0) + 1
            tag = f"{hash64(acc_rows[0]['url']) % (1 << 30):08x}-{self._commit_seq:04d}"
            pq.write_table(pages, os.path.join(wave_dir, f"pages-{tag}.parquet"))
            pq.write_table(spans, os.path.join(wave_dir, f"spans-{tag}.parquet"))

        n_added = 0
        if expand and acc_rows:
            candidates: dict[str, float] = {}
            for r in acc_rows:
                links = admit_links(
                    extract_links(r["url"], r["html"], r["content"], self.base_url),
                    self.base_url, self.disallow,
                )
                if not links:
                    continue
                for link, sc in zip(links, self.score_fn(links, self.base_url)):
                    if sc > self.threshold and link not in candidates:
                        candidates[link] = sc
            if candidates:
                n_added = self._push_candidates(candidates)
        return {"accepted": len(acc_rows), "links_added": n_added}

    def _push_candidates(self, candidates: dict[str, float]) -> int:
        """Seen-check then route fresh links to frontier owner shards."""
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
        return sum(ray.get(adds))


@dataclass
class CrawlResult:
    visit_order: list[str]
    run_dir: str | None
    total_pages: int
    total_fetches: int
    waves: int
    metrics: list[dict]


class DistributedCrawler:
    """Driver object orchestrating the wave loop over the worker pool."""

    def __init__(self, config: CrawlConfig, site_index,
                 disallow_by_host: dict | None = None, fetch_log=None):
        self.cfg = config
        # site_index: url→page dict, Arrow site table, or an ObjectRef
        # to either (pass a ref to share one broadcast across crawlers)
        self._site_ref = (site_index if isinstance(site_index, ray.ObjectRef)
                          else ray.put(site_index))
        self._fetch_log = fetch_log
        self.disallow = disallow_by_host if config.respect_robots else None
        self.seen = SeenFilter(config.num_seen_shards, mode=config.seen_mode)
        self.frontier = Frontier(config.num_frontier_shards)
        self._build_workers()
        self.pages_so_far = 0
        self.visit_order: list[str] = []
        self.metrics: list[dict] = []
        self.total_fetches = 0
        self._completed_depth = -1  # -1 = nothing done; 0 = main page done

    def _build_workers(self) -> None:
        # recovery path calls this to REBUILD the pool: reap any
        # surviving old actors first or they leak for the session
        for w in getattr(self, "workers", []):
            try:
                ray.kill(w)
            except Exception:
                pass
        cfg = self.cfg
        self.workers = [
            CrawlWorker.remote(
                self._site_ref, cfg.base_url, self.disallow,
                cfg.host_delays_ms, cfg.score_threshold,
                cfg.session_id, cfg.timestamp_us,
                self.seen.shards, self.frontier.shards, self._fetch_log,
                cfg.score_fn, cfg.fetcher_factory,
            )
            for _ in range(cfg.num_workers)
        ]

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
        lineage: dict = {
            "depth": depth,
            "parent_depth": depth - 1 if depth > 0 else None,
            "partitions": {"seen": [], "frontier": []},
            "outputs": [],
        }
        for i, blob in enumerate(self.seen.snapshot()):
            with open(os.path.join(state_dir, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
            lineage["partitions"]["seen"].append(
                {"file": f"state/seen_{i}.bin", "bytes": len(blob),
                 "sha256": hashlib.sha256(blob).hexdigest()})
        for i, blob in enumerate(self.frontier.snapshot()):
            with open(os.path.join(state_dir, f"frontier_{i}.bin"), "wb") as f:
                f.write(blob)
            lineage["partitions"]["frontier"].append(
                {"file": f"state/frontier_{i}.bin", "bytes": len(blob),
                 "sha256": hashlib.sha256(blob).hexdigest()})
        # per-partition output accounting: parquet row counts come from
        # the file footers (no data read) — the audit trail that lets a
        # resumed/verifying job prove a wave's outputs are complete
        # without re-fetching anything
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                md = pq.ParquetFile(os.path.join(d, name)).metadata
                lineage["outputs"].append(
                    {"file": name, "rows": md.num_rows,
                     "bytes": os.path.getsize(os.path.join(d, name))})
        with open(os.path.join(d, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump(wave_metrics, f)
        # manifest pointer written LAST and atomically: a partially
        # written wave is never visible (SURVEY §7.4.6)
        # counters ONLY — visit order lives in the per-wave page records
        # (url, visit_index); a manifest that embeds the full visit list
        # would be a multi-GB driver-held JSON at 10^8 pages
        manifest = {
            "completed_depth": depth,
            "pages_so_far": self.pages_so_far,
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
        # lineage integrity gate: a state blob whose hash diverges from
        # the committed lineage record means torn/corrupted storage —
        # resuming from it would silently re-fetch or duplicate URLs
        lpath = os.path.join(self._wave_dir(depth), "lineage.json")
        if os.path.exists(lpath):
            with open(lpath) as f:
                lineage = json.load(f)
            for kind, blobs in (("seen", seen_blobs),
                                ("frontier", frontier_blobs)):
                recs = lineage["partitions"][kind]
                # zip() would silently truncate on a count mismatch
                # (shard-count config change, missing lineage entry),
                # letting extra partitions bypass hash verification
                if len(recs) != len(blobs):
                    raise RuntimeError(
                        f"checkpoint corruption: lineage records {kind} "
                        f"count {len(recs)} != on-disk blob count "
                        f"{len(blobs)}")
                for rec, blob in zip(recs, blobs):
                    got = hashlib.sha256(blob).hexdigest()
                    if got != rec["sha256"]:
                        raise RuntimeError(
                            f"checkpoint corruption: {rec['file']} hash "
                            f"{got[:12]} != committed {rec['sha256'][:12]}")
        # scrub any torn wave dirs beyond the manifest pointer so a
        # partially-written wave can't contribute duplicate artifacts
        import shutil
        for name in os.listdir(self.cfg.run_dir):
            if name.startswith("wave_") and int(name.split("_")[1]) > depth:
                shutil.rmtree(os.path.join(self.cfg.run_dir, name))
        self.seen.restore(seen_blobs)
        self.frontier.restore(frontier_blobs)
        self.pages_so_far = manifest["pages_so_far"]
        self.visit_order = self._load_visit_order()
        self.total_fetches = manifest["total_fetches"]
        self._completed_depth = depth
        return True

    def _load_visit_order(self) -> list[str]:
        """Rebuild the visit order from the committed page records
        (sorted on their ``visit_index`` column) — the parquet is the
        source of truth; the manifest only stores counters."""
        t = read_crawl_output(self.cfg.run_dir, "pages")
        return t.column("url").to_pylist()

    # ----- wave steps -----

    def _owner(self, url: str) -> int:
        """host → bucket → worker; stable across waves so one politeness
        clock per host."""
        b = hash64(host_of(url)) % self.cfg.num_host_buckets
        return b % self.cfg.num_workers

    def _process_slice(self, wave_slice: list[tuple[str, float]], depth: int,
                       phase: str) -> tuple[int, int]:
        """Fetch + ordered-acceptance + commit + expand for one
        rank-contiguous slice of a wave. Returns (accepted, links_added).
        Acceptance across slices stays sequential because slices are
        processed in rank order by the caller."""
        cfg = self.cfg
        # 2. fetch — partition by owner worker
        per_worker: dict[int, list[tuple[int, str, float]]] = {}
        for rank, (url, score) in enumerate(wave_slice):
            per_worker.setdefault(self._owner(url), []).append((rank, url, score))
        futures = [
            self.workers[w].fetch.remote(
                [u for _, u, _ in items], [s for _, _, s in items],
                [r for r, _, _ in items], depth)
            for w, items in per_worker.items()
        ]
        small = pa.concat_tables(ray.get(futures))
        small = small.take(pc.sort_indices(small.column("wave_rank")))
        self.total_fetches += len(wave_slice)

        # 3. decide — sequential replay in rank order
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

        # 4. commit + expand on the owning workers
        wave_dir = self._wave_dir(depth) if cfg.run_dir else None
        expand = depth < cfg.depth_limit                     # pyc lines 239-240
        accepted_ref = ray.put(accepted)  # broadcast once, not per worker
        stats = ray.get([
            self.workers[w].commit_and_expand.remote(
                accepted_ref, depth, phase, wave_dir, expand)
            for w in per_worker
        ])
        return len(accepted), sum(s["links_added"] for s in stats)

    def _run_wave(self, wave: list[tuple[str, float]], depth: int,
                  phase: str) -> None:
        """One full wave. In comprehensive mode a wave holds EVERY
        candidate above the threshold while acceptance stops at the
        safety cutoff — fetching the whole wave speculatively wastes the
        tail. Budget-aware chunking fetches rank-ordered slices of
        ~1.25× the remaining budget until the cutoff resolves; the
        un-fetched remainder returns to the frontier untouched (exactly
        the reference's mid-wave break semantics, minus the wasted
        fetches). Identical final state to whole-wave processing —
        covered by the comprehensive conformance suite."""
        cfg = self.cfg
        remaining = cfg.effective_safety - self.pages_so_far
        n_accepted = 0
        n_links = 0
        if cfg.comprehensive and len(wave) > remaining * 1.5:
            pos = 0
            while pos < len(wave) and self.pages_so_far < cfg.effective_safety:
                need = cfg.effective_safety - self.pages_so_far
                size = max(16, int(need * 1.25))
                a, l = self._process_slice(wave[pos:pos + size], depth, phase)
                n_accepted += a
                n_links += l
                pos += size
            rest = wave[pos:]
            if rest:  # never fetched: back to the frontier, not seen
                self.frontier.add([u for u, _ in rest], [s for _, s in rest])
        else:
            n_accepted, n_links = self._process_slice(wave, depth, phase)
        self.metrics.append({
            "depth": depth, "wave_size": len(wave), "accepted": n_accepted,
            "links_added": n_links,
        })
        # 5. checkpoint
        self._commit(depth, self.metrics[-1])
        self._completed_depth = depth

    def _run_wave_paged(self, total: int, depth: int, phase: str) -> None:
        """Comprehensive-mode wave via the frontier's shard-side paging
        protocol: the wave is FROZEN on the shards (``begin_wave``, done
        by the caller) and streamed here in exact global rank order in
        budget-aware slices — the driver never holds more than one
        slice, where ``select_wave(None, …)`` held the whole
        above-threshold frontier. Un-consumed candidates simply stay in
        their shards' pending sets (never shipped, never re-added).
        Identical visit order / seen set to whole-wave processing —
        covered by the comprehensive conformance suite."""
        cfg = self.cfg
        n_accepted = 0
        n_links = 0
        processed = 0
        while processed < total and self.pages_so_far < cfg.effective_safety:
            need = cfg.effective_safety - self.pages_so_far
            size = max(16, int(need * 1.25))
            chunk = self.frontier.next_wave_chunk(size)
            if not chunk:
                break
            a, l = self._process_slice(chunk, depth, phase)
            n_accepted += a
            n_links += l
            processed += len(chunk)
        self.frontier.end_wave()
        self.metrics.append({
            "depth": depth, "wave_size": total, "accepted": n_accepted,
            "links_added": n_links,
        })
        self._commit(depth, self.metrics[-1])
        self._completed_depth = depth

    def shutdown(self) -> None:
        """Kill the worker pool and state shards (end of crawl)."""
        for w in self.workers:
            ray.kill(w)
        self.workers = []
        self.seen.shutdown()
        self.frontier.shutdown()

    # ----- the loop -----

    def run(self, stop_after_depth: int | None = None) -> CrawlResult:
        """Run the wave loop (continuing from a restored checkpoint when
        ``resume()`` was called). ``stop_after_depth`` simulates a crash
        after that wave's commit — used by the kill-and-resume test."""
        cfg = self.cfg
        t0 = time.perf_counter()

        if self._completed_depth < 0:
            # wave 0: the main page (depth 0, score 10.0, no word filter)
            main_url = canonicalize_url(cfg.base_url)
            self._run_wave([(main_url, MAIN_PAGE_SCORE)], 0, "main_page")

        for depth in range(max(1, self._completed_depth + 1), cfg.depth_limit + 1):
            if stop_after_depth is not None and depth > stop_after_depth:
                break
            if self.pages_so_far >= cfg.effective_safety:    # pyc line 212
                break
            if cfg.comprehensive:
                total = self.frontier.begin_wave(cfg.score_threshold)
                if not total:                                # pyc line 221
                    break
                self._run_wave_paged(total, depth, f"depth_{depth}")
            else:
                budget = cfg.effective_safety - self.pages_so_far
                wave = self.frontier.select_wave(budget, cfg.score_threshold)
                if not wave:                                 # pyc line 221
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


def run_with_recovery(crawler: "DistributedCrawler",
                      max_attempts: int = 3) -> CrawlResult:
    """Fault-tolerant wave loop: on worker/actor failure mid-wave the
    partial wave's side effects are discarded by restoring the LAST
    COMMITTED checkpoint (atomic manifest — a half-finished wave is
    never visible), the worker pool is rebuilt, and the crawl continues.
    Requires ``cfg.run_dir``; visit order/seen set stay oracle-exact
    because recovery replays from a wave boundary.
    """
    assert crawler.cfg.run_dir, "recovery needs a checkpointed run_dir"
    last_exc: Exception | None = None
    for _ in range(max_attempts):
        try:
            return crawler.run()
        except ray.exceptions.RayActorError as exc:  # actor lost
            last_exc = exc
            crawler._build_workers()
            # roll driver + shard state back to the last committed wave
            # (fresh shard actors when restore finds no checkpoint yet)
            if not crawler.resume():
                crawler.seen = SeenFilter(crawler.cfg.num_seen_shards,
                                          mode=crawler.cfg.seen_mode)
                crawler.frontier = Frontier(crawler.cfg.num_frontier_shards)
                crawler.pages_so_far = 0
                crawler.visit_order = []
                crawler.total_fetches = 0
                crawler._completed_depth = -1
                crawler._build_workers()
    raise last_exc  # out of attempts


def read_crawl_output(run_dir: str, what: str = "pages") -> pa.Table:
    """Concatenate the per-wave Parquet partitions of a crawl run,
    ordered by visit_index for pages (O4: crawl-order preservation)."""
    parts = []
    wave_names = [n for n in os.listdir(run_dir) if n.startswith("wave_")]
    # numeric order: lexicographic would put wave_10 before wave_2
    for name in sorted(wave_names, key=lambda n: int(n.split("_")[1])):
        wd = os.path.join(run_dir, name)
        if not os.path.isdir(wd):
            continue
        for f in sorted(os.listdir(wd)):
            if f.startswith(f"{what}-") and f.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(wd, f)))
    schema = S.PAGE_RECORDS if what == "pages" else S.SPAN_DOCUMENTS
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return schema.empty_table()
    t = pa.concat_tables([t.cast(schema) for t in parts])
    if what == "pages":
        t = t.take(pc.sort_indices(t.column("visit_index")))
    return t
