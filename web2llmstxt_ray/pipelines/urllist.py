"""Seed-list / sitemap crawl — the engine's bulk Ray Data pipeline.

Reimplements the reference's sitemap path (``crawl_from_sitemap`` →
``_crawl_url_list``, ``crawler/web_crawler.py:761-813,1081-1184``) as a
streaming ``ray.data`` pipeline. The reference fetches the URL list
sequentially through one browser with global 1 s sleeps and
``gc.collect()`` every 5 batches; here the list is a ``Dataset`` and
every stage is a zero-copy Arrow ``map_batches``:

    read seeds → canonicalize + dedup (per-batch + global unique)
    → prioritize: sort by (path depth, url length) asc (O2,
      ``crawler/web_crawler.py:802-806``) → limit(max_pages)
    → fetch/extract actor pool (stateful, one session per actor)
    → accept: word_count >= 50 (M7, ``:1141``)
    → span documents / page records → write partitioned Parquet

This is the throughput path (BASELINE pages/s target): unlike the
BFS wave loop there is no visit-order coupling, so the streaming
executor pipelines fetch, extraction and writes freely with
backpressure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .. import schema as S
from ..functions.urls import canonicalize_url, hash64_batch, host_of
from ..stages.fetch import MockFetcher
from ..stages.spans import extract_spans


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized-ish canonicalization + host/bucket derivation.

    URL parsing is inherently per-string; the loop runs over one Arrow
    column with precompiled parsers (~1 µs/url) and emits Arrow arrays —
    no pandas round trip.
    """
    urls = batch.column(url_col).to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    hosts = [host_of(u) for u in canon]
    out = batch.set_column(batch.schema.get_field_index(url_col), url_col,
                           pa.array(canon, pa.string()))
    out = out.append_column("host", pa.array(hosts, pa.string()))
    # path depth + length: the reference's sitemap priority key (O2)
    slashes = np.fromiter((u.count("/") for u in canon), dtype=np.int32,
                          count=len(canon))
    lengths = np.fromiter((len(u) for u in canon), dtype=np.int32,
                          count=len(canon))
    out = out.append_column("path_depth", pa.array(slashes))
    out = out.append_column("url_len", pa.array(lengths))
    return out


def global_dedup(ds: ray.data.Dataset, key: str = "url",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Exact global dedup on ``key`` via hash buckets.

    Grouping by the raw key makes one ``map_groups`` call (and one
    1-row output block!) per distinct value — catastrophic for
    downstream stages. Grouping by ``hash(key) % num_buckets`` instead
    shuffles once into ``num_buckets`` well-sized groups and
    deduplicates each with a single vectorized ``drop_duplicates``.
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = hash64_batch(batch.column(key).to_pylist()) % np.uint64(num_buckets)
        return batch.append_column("_kbucket",
                                   pa.array(buckets.astype(np.int32)))

    def dedup_bucket(group):
        return group.drop_duplicates(subset=[key], keep="first") \
                    .drop(columns=["_kbucket"])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
             .groupby("_kbucket").map_groups(dedup_bucket, batch_format="pandas")


def seen_filter_dedup(ds: ray.data.Dataset, key: str = "url",
                      num_shards: int = 8,
                      teardown: list | None = None) -> ray.data.Dataset:
    """Exact global dedup WITHOUT a shuffle barrier: batches stream
    through ``map_batches`` tasks that test-and-set the key against the
    engine's sharded seen-filter actors (the crawl frontier's own D1
    primitive) and keep only first-winners.

    vs ``global_dedup``: the groupby path sorts — a full pipeline
    barrier — while this path pipelines freely. Measured on the bench
    listing pipeline (round 4): this path wins 10-14% at 2-8 CPUs
    (the barrier's ~1-2 s fixed cost dominates there), but LOSES
    ~15-20% at 32 CPUs — every task's synchronous per-batch
    scatter-gather over the shard actors serializes the pipeline at
    high parallelism (worse with MORE shards: wider fan-out per
    batch). Pick by parallelism when throughput matters; this form is
    the right one regardless when the seen set must OUTLIVE the job
    (incremental/continuous crawls dedupe against all history, which
    no per-job shuffle can express).
    Trade-offs: when duplicate keys carry different payloads, WHICH
    duplicate survives depends on arrival order (exactly one always
    does); use ``global_dedup`` for a deterministic first-in-input
    winner.
    """
    from ..state.seen import SeenFilter

    seen = SeenFilter(num_shards=num_shards, mode="exact")
    shards = seen.shards
    if teardown is not None:
        teardown.append(seen)   # caller owns shard lifetime (leak-free reuse)

    def filter_new(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_pylist()
        hashes = hash64_batch(keys)
        owners = (hashes % np.uint64(num_shards)).astype(np.int64)
        mask = np.zeros(len(keys), dtype=bool)
        futures, idx_lists = [], []
        for s in range(num_shards):
            idxs = np.flatnonzero(owners == s)
            if len(idxs):
                futures.append(shards[s].check_and_add.remote(hashes[idxs]))
                idx_lists.append(idxs)
        import ray as _ray

        for idxs, m in zip(idx_lists, _ray.get(futures)):
            mask[idxs] = m
        return batch.filter(pa.array(mask))

    return ds.map_batches(filter_new, batch_format="pyarrow")


def dedup_batch(batch: pa.Table, key: str = "url") -> pa.Table:
    """Within-batch first-wins dedup on ``key`` (cheap pre-pass before
    the global groupby dedup — the partial-aggregation pattern)."""
    keys = batch.column(key).to_pylist()
    seen: set[str] = set()
    mask = np.empty(len(keys), dtype=bool)
    for i, k in enumerate(keys):
        if k in seen:
            mask[i] = False
        else:
            seen.add(k)
            mask[i] = True
    return batch.filter(pa.array(mask))


class UrlListFetcher(MockFetcher):
    """Actor-pool fetch stage for list crawls: batch of URL rows in,
    page-record rows out (only metadata the pipeline needs — content,
    title, word_count). Session state lives in ``__init__`` (T5).

    Per-host politeness: when ``host_delays_ms`` is set, consecutive
    fetches of the same host inside this actor are spaced by the host's
    crawl-delay (each actor keeps its own host clocks — pair with
    host-bucket partitioning upstream so a host maps to one actor,
    making the budget global; the reference instead slept 1 s globally
    between whole batches, ``crawler/web_crawler.py:1174-1176``)."""

    def __init__(self, site_ref, min_words: int = 50,
                 host_delays_ms: dict | None = None):
        super().__init__(site_ref)
        self.min_words = min_words
        self.host_delays_ms = host_delays_ms or {}
        self._last_fetch: dict[str, float] = {}

    def _pace(self, url: str) -> None:
        import time

        host = host_of(url)
        delay = self.host_delays_ms.get(host, 0) / 1000.0
        if delay > 0:
            prev = self._last_fetch.get(host)
            if prev is not None:
                wait = prev + delay - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            self._last_fetch[host] = time.monotonic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        rows = []
        for u in urls:
            self._pace(u)
            rows.append(self.fetch_one(u, 0.0, 0))
        keep = [r for r in rows
                if r["success"] and r["word_count"] >= self.min_words]
        return pa.table({
            "url": pa.array([r["url"] for r in keep], pa.string()),
            "title": pa.array([r["title"] for r in keep], pa.string()),
            "content": pa.array([r["content"] for r in keep], pa.large_string()),
            "word_count": pa.array([r["word_count"] for r in keep], pa.int64()),
        })


def crawl_url_list(
    seeds: ray.data.Dataset,
    site_index_ref,
    max_pages: int | None = None,
    fetch_concurrency: int | tuple = (1, 8),
    fetch_batch_size: int = 64,
    min_words: int = 50,
    parallelism: int = 64,
    host_delays_ms: dict | None = None,
    strict_politeness: bool = False,
    politeness_buckets: int = 32,
) -> ray.data.Dataset:
    """URL-list crawl pipeline → dataset of accepted page rows
    (url, title, content, word_count).

    ``seeds`` needs a ``url`` column; ``site_index_ref`` is a
    ``ray.put`` handle to the mock site (or a real fetcher's config).
    Dedup is exact: per-batch first-wins then a global groupby on the
    canonical URL (hash-partitioned shuffle — D3,
    ``crawler/web_crawler.py:789-799``).

    The fetch pool autoscales (min 1) — a fixed pool sized above the
    node's free CPUs would wait forever for actors it can never place.

    ``parallelism`` splits the seed list into that many blocks up front.
    Block count propagates through every downstream stage (a
    single-block input — e.g. ``from_arrow`` of one driver table —
    serializes the whole pipeline onto one worker regardless of pool
    size), so never skip this for in-memory seed tables.

    POLITENESS CONTRACT (``host_delays_ms``): by default pacing is
    PER-ACTOR, not global. Sorting makes same-host URLs
    batch-contiguous, but the autoscaling pool may hand consecutive
    batches of one host to different actors whose clocks are
    independent, so the crawl-delay can be violated across batch
    boundaries by up to the actor count. This is the
    streaming-throughput trade-off. ``strict_politeness=True`` buys
    the global guarantee: URLs shuffle once on
    ``hash(host) % politeness_buckets`` and each bucket is fetched by
    ONE task (per-worker memoized fetcher), so exactly one clock owns
    every host — the list-crawl analogue of the wave crawler's
    host-bucket→owner-worker pinning
    (``pipelines.crawl.DistributedCrawler._owner``). Parallelism is
    then bounded by ``politeness_buckets``, which is the point:
    politeness serializes per host.
    """
    ds = seeds.repartition(parallelism)
    ds = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    ds = ds.map_batches(dedup_batch, batch_format="pyarrow")
    ds = global_dedup(ds, "url")
    if max_pages is not None:
        # sitemap prioritization (O2): shallower, shorter URLs first;
        # the url itself breaks (depth, len) ties so the limit() cut is
        # a total order → repeatable page sets (Ray's sort is not
        # stable, and the reference's tie order was incidental)
        ds = ds.sort(["path_depth", "url_len", "url"]).limit(max_pages)
    if host_delays_ms and strict_politeness:
        from ..ops.stagecache import cached_stage

        def add_hbucket(batch: pa.Table) -> pa.Table:
            hosts = [host_of(u) for u in batch.column("url").to_pylist()]
            b = (hash64_batch(hosts) % np.uint64(politeness_buckets)) \
                .astype(np.int32)
            return batch.append_column("_hbucket", pa.array(b))

        fetch_fn = cached_stage(
            UrlListFetcher, site_ref=site_index_ref, min_words=min_words,
            host_delays_ms=host_delays_ms)

        def fetch_bucket(group: pa.Table) -> pa.Table:
            return fetch_fn(group.drop_columns(["_hbucket"]))

        return ds.map_batches(add_hbucket, batch_format="pyarrow") \
            .groupby("_hbucket").map_groups(fetch_bucket,
                                            batch_format="pyarrow")
    if host_delays_ms:
        # politeness locality: co-locate each host's URLs (sort by host
        # → contiguous batches) so one actor's clock paces the host
        ds = ds.sort("host")
    ds = ds.map_batches(
        UrlListFetcher,
        fn_constructor_kwargs={"site_ref": site_index_ref,
                               "min_words": min_words,
                               "host_delays_ms": host_delays_ms},
        batch_format="pyarrow",
        batch_size=fetch_batch_size,
        concurrency=fetch_concurrency,
        num_cpus=1,
    )
    return ds


def pages_to_span_docs(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Page rows → interleaved span documents (the input_hint shape)."""

    def to_spans(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("url").to_pylist(),
                "spans": [extract_spans(c or "")
                          for c in batch.column("content").to_pylist()],
            },
            schema=S.SPAN_DOCUMENTS,
        )

    return pages.map_batches(to_spans, batch_format="pyarrow")
