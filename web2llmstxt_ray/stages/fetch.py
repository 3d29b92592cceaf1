"""Fetch + extract stage — a stateful ``map_batches`` actor pool.

The reference fetches sequentially through one Playwright browser
(``crawler/web_crawler.py:1123-1129``; Crawl4AI ``arun`` per URL at
``:293-303``). Here fetching is an actor pool: expensive session state
(browser / HTTP client / the broadcast mock-site index) is created once
per actor in ``__init__`` and every batch of URLs is processed in
``__call__`` — ``ds.map_batches(Fetcher, concurrency=N, batch_size=B)``.

Two interchangeable fetchers share the ``fetch_one``/``__call__``
interface and the FETCH_RESULT schema: :class:`MockFetcher`, a
deterministic in-process lookup over a broadcast synthetic site
(``ray.put`` once on the driver; each actor ``ray.get``s it once —
zero-copy for the Arrow-backed strings, never re-shipped per batch),
and :class:`NetworkFetcher`, a real pooled-HTTP client with the
reference's timeout/retry policy — exercised in-sandbox against the
loopback fixture server (``web2llmstxt_ray.testing``; no outbound
network exists here) and conformance-tested equal to the mock.

Content selection follows M6 (``fit_markdown or raw_markdown else
cleaned_html`` → here ``markdown else html``,
``crawler/web_crawler.py:108-111``); titles follow M8
(``crawler/web_crawler.py:397-424``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

from ..functions.text import extract_title
from .markdown import fit_markdown, raw_markdown

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>",
                        re.IGNORECASE | re.DOTALL)
_LINK_RE = re.compile(r"<a\b[^>]*href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>",
                      re.IGNORECASE | re.DOTALL)
_HEADING_RE = re.compile(r"<h([1-6])\b[^>]*>(.*?)</h\1>",
                         re.IGNORECASE | re.DOTALL)
_BLOCK_RE = re.compile(r"</?(p|div|br|li|ul|ol|tr|table|section|article"
                       r"|header|footer|nav)\b[^>]*>", re.IGNORECASE)
_TAG_STRIP_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>",
                       re.IGNORECASE | re.DOTALL)

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

    def fetch_content(self, url: str) -> tuple[str, str] | None:
        """(content, title) for extract-only consumers, touching the
        heavy ``html`` column ONLY when markdown is empty (M6 selection
        and M8 title semantics identical to :meth:`fetch_one`; html is
        the widest column of the broadcast site table, and skipping it
        roughly halves per-page memory traffic in the fused suite —
        the full-load bottleneck)."""
        if self.index is not None:
            page = self.index.get(url)
            if page is None or page["status"] != 200:
                return None
            md = page["markdown"]
            return (md or page["html"] or "",
                    extract_title(page["title_meta"], md, url))
        i = self._pos.get(url)
        if i is None:
            return None
        t = self._table
        if t.column("status")[i].as_py() != 200:
            return None
        md = t.column("markdown")[i].as_py()
        content = md or t.column("html")[i].as_py() or ""
        return content, extract_title(t.column("title_meta")[i].as_py(),
                                      md, url)

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


def html_to_markdown(html: str) -> str:
    """Minimal deterministic HTML → markdown-ish text for the raw-HTML
    parse path: scripts/styles dropped, links become ``[text](href)``,
    headings become ``#`` lines, remaining tags stripped, whitespace
    collapsed per line. NOT a full renderer — the production renderer
    is a service seam (the reference delegates rendering to Crawl4AI,
    ``crawler/web_crawler.py:293-303``, and consumes its markdown)."""
    import html as _html

    text = _SCRIPT_RE.sub(" ", html)
    text = _LINK_RE.sub(lambda m: f"[{m.group(2).strip()}]({m.group(1)})", text)

    def _heading(m):
        level = int(m.group(1))
        return "\n" + "#" * level + " " + m.group(2).strip() + "\n"

    text = _HEADING_RE.sub(_heading, text)
    text = _BLOCK_RE.sub("\n", text)
    text = _TAG_STRIP_RE.sub(" ", text)
    text = _html.unescape(text)
    lines = [" ".join(l.split()) for l in text.splitlines()]
    return "\n".join(l for l in lines if l)


class NetworkFetcher:
    """Real HTTP fetch/extract actor — exercised in-sandbox against a
    loopback fixture server (``web2llmstxt_ray.testing``); in production
    it points at the real web (or a rendering gateway).

    One pooled HTTP session per actor (``__init__``, T5 — mirroring the
    reference's single crawler context, ``crawler/web_crawler.py:101,
    293``) with the reference's retry policy: up to 3 retries on
    429/5xx with exponential backoff (``crawler/web_crawler.py:832-838``)
    and per-URL timeouts — 30 s deep-crawl / 15 s list mode
    (``crawler/web_crawler.py:287,1106``). Batches fetch concurrently
    on a per-actor thread pool; order is preserved.

    Two response shapes:

    - ``application/json`` — a rendered-page payload ``{status, html,
      markdown, title_meta}`` (the rendering-service contract; the
      reference likewise consumes Crawl4AI's rendered markdown rather
      than rendering itself). Content selection then follows M6
      exactly as :class:`MockFetcher`.
    - ``text/html`` — raw HTML: content via :func:`html_to_markdown`,
      title from ``<title>``.

    ``url_rewriter`` maps a crawl URL to the transport URL (identity in
    production; the loopback gateway in tests).
    """

    def __init__(self, page_timeout_s: float | None = None,
                 list_mode: bool = False, max_retries: int = 3,
                 backoff_factor: float = 1.0, pool_size: int = 8,
                 url_rewriter=None):
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3.util.retry import Retry

        self.timeout_s = (page_timeout_s if page_timeout_s is not None
                          else (15.0 if list_mode else 30.0))
        self.rewrite = url_rewriter or (lambda u: u)
        session = requests.Session()
        retry = Retry(total=max_retries, backoff_factor=backoff_factor,
                      status_forcelist=[429, 500, 502, 503, 504],
                      allowed_methods=["GET"])
        adapter = HTTPAdapter(max_retries=retry, pool_connections=pool_size,
                              pool_maxsize=pool_size)
        session.mount("http://", adapter)
        session.mount("https://", adapter)
        self.session = session
        from concurrent.futures import ThreadPoolExecutor

        self.pool = ThreadPoolExecutor(max_workers=pool_size)
        self.stats = {"requests": 0, "failures": 0, "timeouts": 0,
                      "retried_or_errored": 0}

    def _fail(self, url: str, score: float, depth: int) -> dict:
        return {"url": url, "success": False, "title": "", "content": "",
                "html": "", "word_count": 0, "score": score, "depth": depth}

    def fetch_one(self, url: str, score: float, depth: int) -> dict:
        import requests

        self.stats["requests"] += 1
        try:
            resp = self.session.get(self.rewrite(url), timeout=self.timeout_s)
        except requests.exceptions.Timeout:
            self.stats["timeouts"] += 1
            self.stats["failures"] += 1
            return self._fail(url, score, depth)
        except requests.exceptions.RequestException:
            self.stats["retried_or_errored"] += 1
            self.stats["failures"] += 1
            return self._fail(url, score, depth)
        if resp.status_code != 200:
            self.stats["failures"] += 1
            return self._fail(url, score, depth)

        ctype = resp.headers.get("Content-Type", "")
        if ctype.startswith("application/json"):
            page = resp.json()
            if page.get("status", 200) != 200:
                self.stats["failures"] += 1
                return self._fail(url, score, depth)
            markdown = page.get("markdown") or ""
            html = page.get("html") or ""
            content = markdown or html   # M6 content selection
            title = extract_title(page.get("title_meta"), markdown, url)
        else:
            html = resp.text
            # M6 chain for raw HTML, reference fidelity: readability-
            # pruned fit markdown, falling back to the full render
            # when the filter leaves nothing (web_crawler.py:108-110)
            content = fit_markdown(html) or raw_markdown(html)
            m = _TITLE_RE.search(html)
            title = extract_title(m.group(1).strip() if m else None,
                                  content, url)
        return {
            "url": url, "success": True, "title": title, "content": content,
            "html": html, "word_count": len(content.split()),
            "score": score, "depth": depth,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        scores = (batch.column("score").to_pylist()
                  if "score" in batch.column_names else [0.0] * len(urls))
        depths = (batch.column("depth").to_pylist()
                  if "depth" in batch.column_names else [0] * len(urls))
        rows = list(self.pool.map(self.fetch_one, urls, scores, depths))
        return pa.Table.from_pylist(rows, schema=FETCH_RESULT)


class PlaywrightFetcher:
    """Browser-rendered fetch actor — the JS-rendering path the
    reference gets from Crawl4AI's ``AsyncWebCrawler``
    (``crawler/web_crawler.py:93-103,283-303``), re-expressed as a
    stateful map_batches actor over the public Playwright API.

    One headless browser per actor (launched in ``__init__`` — the
    browser is the expensive state; pages are cheap), sequential
    navigation within the actor (a Playwright page is not
    thread-safe; parallelism comes from the actor pool, exactly like
    the reference's one-crawler-per-worker shape). Output schema,
    M6 content selection (rendered HTML → ``html_to_markdown``) and
    M8 title fallbacks match :class:`NetworkFetcher`, so the two are
    drop-in interchangeable through ``CrawlConfig.fetcher_factory``::

        cfg = CrawlConfig(..., fetcher_factory=playwright_fetcher_factory())

    Playwright is an optional dependency: constructing the actor
    without it raises ``NotImplementedError`` (the same honest gate as
    the media codec slots — this sandbox has no browser). The
    ``session`` parameter is the browserless seam: any object with the
    BrowserContext surface this class consumes (``new_page()`` →
    page with ``goto/content/title/close``) substitutes for the real
    context, so the ENTIRE parse/retry/title path below runs under
    test via :class:`~web2llmstxt_ray.testing.RenderedDomSession`
    (a deterministic client-side-hydration simulator) — everything
    except the browser binary itself is exercised in-sandbox.
    """

    def __init__(self, page_timeout_s: float | None = None,
                 list_mode: bool = False, max_retries: int = 3,
                 url_rewriter=None, session=None):
        if session is None:
            try:
                from playwright.sync_api import sync_playwright
            except ImportError as e:
                raise NotImplementedError(
                    "playwright is not installed in this environment; "
                    "use NetworkFetcher (requests) or install "
                    "playwright + a browser for the rendered-fetch "
                    "path.") from e
            self._pw = sync_playwright().start()
            self._browser = self._pw.chromium.launch(headless=True)
            self._context = self._browser.new_context()
        else:
            self._pw = self._browser = None
            self._context = session
        self.timeout_ms = 1000.0 * (
            page_timeout_s if page_timeout_s is not None
            else (15.0 if list_mode else 30.0))
        self.max_retries = max_retries
        self.rewrite = url_rewriter or (lambda u: u)
        self.stats = {"requests": 0, "failures": 0, "timeouts": 0,
                      "retried_or_errored": 0}

    def __del__(self):  # actor teardown: close the browser cleanly
        try:
            if self._browser is not None:
                self._browser.close()
                self._pw.stop()
        except Exception:
            pass

    def _fail(self, url: str, score: float, depth: int) -> dict:
        return {"url": url, "success": False, "title": "", "content": "",
                "html": "", "word_count": 0, "score": score,
                "depth": depth}

    def fetch_one(self, url: str, score: float, depth: int) -> dict:
        self.stats["requests"] += 1
        last_exc_timeout = False
        for _ in range(max(1, self.max_retries)):
            page = self._context.new_page()
            try:
                resp = page.goto(self.rewrite(url),
                                 timeout=self.timeout_ms,
                                 wait_until="load")
                status = resp.status if resp is not None else 0
                if status in (429, 500, 502, 503, 504):
                    continue                      # retryable, next loop
                if status != 200:
                    self.stats["failures"] += 1
                    return self._fail(url, score, depth)
                html = page.content()             # RENDERED dom
                title_meta = page.title() or None
                content = fit_markdown(html) or raw_markdown(html)
                title = extract_title(title_meta, content, url)
                return {"url": url, "success": True, "title": title,
                        "content": content, "html": html,
                        "word_count": len(content.split()),
                        "score": score, "depth": depth}
            except Exception as e:
                last_exc_timeout = "Timeout" in type(e).__name__
                continue
            finally:
                page.close()
        if last_exc_timeout:
            self.stats["timeouts"] += 1
        else:
            self.stats["retried_or_errored"] += 1
        self.stats["failures"] += 1
        return self._fail(url, score, depth)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        scores = (batch.column("score").to_pylist()
                  if "score" in batch.column_names else [0.0] * len(urls))
        depths = (batch.column("depth").to_pylist()
                  if "depth" in batch.column_names else [0] * len(urls))
        rows = [self.fetch_one(u, s, d)
                for u, s, d in zip(urls, scores, depths)]
        return pa.Table.from_pylist(rows, schema=FETCH_RESULT)


def playwright_fetcher_factory(**kwargs):
    """``CrawlConfig.fetcher_factory`` builder for the browser path —
    mirrors ``testing.NetworkFetcherFactory``'s shape (the factory gets
    the site ref, which a real browser ignores)."""
    def factory(site_ref):
        return PlaywrightFetcher(**kwargs)
    return factory
