"""Fetch + extract stage — a stateful ``map_batches`` actor pool.

The reference fetches sequentially through one Playwright browser
(``crawler/web_crawler.py:1123-1129``; Crawl4AI ``arun`` per URL at
``:293-303``). Here fetching is an actor pool: expensive session state
(browser / HTTP client / the broadcast mock-site index) is created once
per actor in ``__init__`` and every batch of URLs is processed in
``__call__`` — ``ds.map_batches(Fetcher, concurrency=N, batch_size=B)``.

The in-sandbox fetcher is a deterministic mock over a broadcast synthetic
site (``ray.put`` once on the driver; each actor ``ray.get``s it once —
zero-copy for the Arrow-backed strings, never re-shipped per batch). The
network fetcher is a clearly-marked stub: no network and no browser
exist in this container, but the Ray-side plumbing (schema, batching,
actor signature) is identical, so swapping it in is a one-line change.

Content selection follows M6 (``fit_markdown or raw_markdown else
cleaned_html`` → here ``markdown else html``,
``crawler/web_crawler.py:108-111``); titles follow M8
(``crawler/web_crawler.py:397-424``).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.text import extract_title

# fetch-result schema: page-record fields + success flag; the wave loop
# downstream assigns visit_index / discovery_phase / timestamps.
FETCH_RESULT = pa.schema(
    [
        ("url", pa.string()),
        ("success", pa.bool_()),
        ("title", pa.string()),
        ("content", pa.large_string()),
        ("html", pa.large_string()),
        ("word_count", pa.int64()),
        ("score", pa.float64()),
        ("depth", pa.int32()),
    ]
)


class MockFetcher:
    """Deterministic fetch over the broadcast synthetic site.

    ``site_ref`` is either the ``url → page`` dict itself or a
    ``ray.ObjectRef`` to it (the dict is placed once with ``ray.put``;
    nested refs in ``fn_constructor_kwargs`` are not auto-resolved, so
    ``__init__`` resolves explicitly).

    Failure semantics mirror the reference: a URL that is missing, has a
    non-200 status, or carries the timeout sentinel (-1) yields
    ``success=False`` with empty content — the wave loop still marks it
    seen (pyc ``discover_all_links_first`` lines 232-233: URLs are added
    to the seen set even when the fetch fails).
    """

    def __init__(self, site_ref):
        site = ray.get(site_ref) if isinstance(site_ref, ray.ObjectRef) else site_ref
        if isinstance(site, pa.Table):
            # zero-copy broadcast path: the Arrow site table maps from the
            # object store without deserializing page payloads; only a
            # url→row position dict is built per actor
            self._table = site
            self._pos = {u: i for i, u in
                         enumerate(site.column("url").to_pylist())}
            self.index = None
        else:
            self._table = None
            self.index: dict[str, dict] | None = site

    def _lookup(self, url: str) -> dict | None:
        if self.index is not None:
            return self.index.get(url)
        i = self._pos.get(url)
        if i is None:
            return None
        t = self._table
        return {
            "status": t.column("status")[i].as_py(),
            "html": t.column("html")[i].as_py(),
            "markdown": t.column("markdown")[i].as_py(),
            "title_meta": t.column("title_meta")[i].as_py(),
        }

    def fetch_one(self, url: str, score: float, depth: int) -> dict:
        page = self._lookup(url)
        if page is None or page["status"] != 200:
            return {
                "url": url, "success": False, "title": "", "content": "",
                "html": "", "word_count": 0, "score": score, "depth": depth,
            }
        content = page["markdown"] or page["html"] or ""
        return {
            "url": url,
            "success": True,
            "title": extract_title(page["title_meta"], page["markdown"], url),
            "content": content,
            "html": page["html"] or "",
            "word_count": len(content.split()),
            "score": score,
            "depth": depth,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        scores = batch.column("score").to_pylist() if "score" in batch.column_names else [0.0] * len(urls)
        depths = batch.column("depth").to_pylist() if "depth" in batch.column_names else [0] * len(urls)
        rows = [self.fetch_one(u, s, d) for u, s, d in zip(urls, scores, depths)]
        return pa.Table.from_pylist(rows, schema=FETCH_RESULT)


class NetworkFetcher:
    """STUB — real HTTP/browser fetching (no network in this sandbox).

    In production this actor would hold one browser / HTTP session
    created in ``__init__`` (mirroring the reference's single
    ``AsyncWebCrawler`` context, ``crawler/web_crawler.py:101,293``) and
    fetch each batch's URLs concurrently with per-URL timeouts (30 s deep
    crawl / 15 s list mode, ``crawler/web_crawler.py:287,1106``),
    returning the same ``FETCH_RESULT`` schema as :class:`MockFetcher`.
    """

    def __init__(self, page_timeout_s: float = 30.0):
        self.page_timeout_s = page_timeout_s
        raise NotImplementedError(
            "NetworkFetcher requires a network/browser runtime; use "
            "MockFetcher with a synthetic site in this environment."
        )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError
