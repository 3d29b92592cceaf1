"""Loopback HTTP fixture server — lets the REAL network code paths
(:class:`~web2llmstxt_ray.stages.fetch.NetworkFetcher`,
:class:`~web2llmstxt_ray.models.OllamaClient`) run end-to-end in a
sandbox with no outbound network: timeouts, retries, connection
pooling, status handling and JSON protocol all execute against
127.0.0.1.

Endpoints:

- ``GET /page?u=<urlencoded crawl url>`` — rendered-page payload for a
  synthetic-site URL: JSON ``{status, html, markdown, title_meta}``
  (the same contract the in-process MockFetcher reads). This mirrors
  the production shape where rendering is delegated — the reference
  itself does not render HTML; it calls the Crawl4AI service layer
  (``crawler/web_crawler.py:293-303``) and consumes its markdown.
- ``GET /html/<path>`` — raw ``text/html`` documents for the
  html-fallback parse path.
- ``POST /api/generate`` — Ollama-protocol mock: reads
  ``{model, prompt, stream, options}``; answers ``{"response": ...}``
  (deterministic text derived from the prompt; a warm-up prompt gets
  ``Ready``). Mirrors the API surface of
  ``llmsgen/models/client.py:71-89`` consumes.

Fault injection (for retry/timeout tests), keyed by crawl url or path:

- ``server.fail_first[key] = (n, status)`` — first ``n`` requests get
  ``status``, later ones succeed (retry-budget tests).
- ``server.delay_s[key] = seconds`` — response sleeps first
  (client-timeout tests).

All state is in-process; tests mutate the attributes directly.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FixtureHTTPServer:
    """Threaded loopback server over a ``url → page`` dict (the synth
    site index) plus optional raw HTML documents."""

    def __init__(self, site_index: dict[str, dict] | None = None,
                 html_docs: dict[str, str] | None = None):
        self.site_index = site_index or {}
        self.html_docs = html_docs or {}        # path → html
        self.fail_first: dict[str, tuple[int, int]] = {}
        self.delay_s: dict[str, float] = {}
        self.request_counts: dict[str, int] = {}
        # served at GET /api/tags (Ollama model-listing protocol)
        self.ollama_models: list[dict] = [
            {"name": "llama3.2:latest", "size": 2_019_393_189},
            {"name": "qwen2.5-coder-7b:latest", "size": 4_683_087_332},
        ]
        self._lock = threading.Lock()
        fixture = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def _maybe_fault(self, key: str) -> int | None:
                with fixture._lock:
                    fixture.request_counts[key] = (
                        fixture.request_counts.get(key, 0) + 1)
                    n_seen = fixture.request_counts[key]
                    fault = fixture.fail_first.get(key)
                delay = fixture.delay_s.get(key)
                if delay:
                    time.sleep(delay)
                if fault and n_seen <= fault[0]:
                    return fault[1]
                return None

            def _send(self, status: int, body: bytes,
                      ctype: str = "application/json") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/page":
                    q = urllib.parse.parse_qs(parsed.query)
                    url = q.get("u", [""])[0]
                    status = self._maybe_fault(url)
                    if status is not None:
                        self._send(status, b'{"error": "injected"}')
                        return
                    page = fixture.site_index.get(url)
                    if page is None:
                        self._send(404, b'{"error": "unknown url"}')
                        return
                    body = json.dumps({
                        "status": page["status"],
                        "html": page["html"],
                        "markdown": page["markdown"],
                        "title_meta": page["title_meta"],
                    }).encode()
                    self._send(200, body)
                elif parsed.path == "/api/tags":
                    status = self._maybe_fault(parsed.path)
                    if status is not None:
                        self._send(status, b'{"error": "injected"}')
                        return
                    self._send(200, json.dumps(
                        {"models": fixture.ollama_models}).encode())
                elif parsed.path.startswith("/html/"):
                    key = parsed.path[len("/html/"):]
                    status = self._maybe_fault(parsed.path)
                    if status is not None:
                        self._send(status, b"injected", "text/html")
                        return
                    doc = fixture.html_docs.get(key)
                    if doc is None:
                        self._send(404, b"not found", "text/html")
                        return
                    self._send(200, doc.encode(), "text/html")
                else:
                    self._send(404, b'{"error": "bad path"}')

            def do_POST(self):
                parsed = urllib.parse.urlparse(self.path)
                if (parsed.path.startswith("/v1beta/models/")
                        and parsed.path.endswith(":generateContent")):
                    self._gemini(parsed)
                    return
                if parsed.path != "/api/generate":
                    self._send(404, b'{"error": "bad path"}')
                    return
                status = self._maybe_fault(parsed.path)
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if status is not None:
                    self._send(status, b'{"error": "injected"}')
                    return
                prompt = payload.get("prompt", "")
                if "respond with just 'Ready'" in prompt:
                    text = "Ready"
                else:
                    # deterministic, prompt-derived text so tests can
                    # assert round-tripping; shaped like a description
                    seed = prompt.strip().splitlines()[-1][:60] if prompt else ""
                    text = f"Generated summary: {seed}".strip()
                self._send(200, json.dumps({
                    "model": payload.get("model", ""),
                    "response": text,
                    "done": True,
                }).encode())

            def _gemini(self, parsed):
                """Gemini ``generateContent`` REST protocol mock:
                requires ``?key=``, echoes a deterministic candidate;
                ``empty-response`` prompts yield zero candidates (the
                reference's empty-text branch)."""
                status = self._maybe_fault(parsed.path)
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if status is not None:
                    self._send(status, b'{"error": {"message": "injected"}}')
                    return
                qs = urllib.parse.parse_qs(parsed.query)
                if not qs.get("key", [""])[0]:
                    self._send(403, json.dumps({
                        "error": {"code": 403,
                                  "message": "API key not valid"}}).encode())
                    return
                parts = (payload.get("contents") or [{}])[0].get("parts", [])
                prompt = " ".join(p.get("text", "") for p in parts)
                if "empty-response" in prompt:
                    self._send(200, json.dumps({"candidates": []}).encode())
                    return
                seed = prompt.strip().splitlines()[-1][:60] if prompt else ""
                self._send(200, json.dumps({
                    "candidates": [{
                        "content": {"parts": [
                            {"text": f"Gemini summary: {seed}".strip()}],
                            "role": "model"},
                        "finishReason": "STOP",
                    }],
                }).encode())

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "FixtureHTTPServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def page_gateway(self):
        """URL rewriter for :class:`NetworkFetcher`: crawl url →
        loopback /page endpoint."""
        base = self.base_url

        def rewrite(url: str) -> str:
            return f"{base}/page?u={urllib.parse.quote(url, safe='')}"

        return rewrite


class GatewayRewriter:
    """Picklable URL rewriter: crawl url → fixture /page endpoint (ships
    to CrawlWorker actors, so it must not close over the server)."""

    def __init__(self, base_url: str):
        self.base_url = base_url

    def __call__(self, url: str) -> str:
        return f"{self.base_url}/page?u={urllib.parse.quote(url, safe='')}"


class NetworkFetcherFactory:
    """``CrawlConfig.fetcher_factory`` that builds a real
    :class:`~web2llmstxt_ray.stages.fetch.NetworkFetcher` pointed at a
    fixture server (``site_ref`` ignored — the pages come over HTTP)."""

    def __init__(self, gateway_base_url: str, **fetcher_kwargs):
        self.rewriter = GatewayRewriter(gateway_base_url)
        self.fetcher_kwargs = fetcher_kwargs

    def __call__(self, site_ref):
        from .stages.fetch import NetworkFetcher

        return NetworkFetcher(url_rewriter=self.rewriter,
                              **self.fetcher_kwargs)


# ---------------------------------------------------------------------------
# Rendered-DOM fixture (browserless PlaywrightFetcher seam)
# ---------------------------------------------------------------------------

_HYDRATE_RE = None  # compiled lazily so `import testing` stays cheap


def render_dom(html: str) -> str:
    """Deterministic client-side-hydration simulator — the "JS ran"
    transform a real browser applies to a single-page-app shell.

    Contract (the SPA shape the reference's Crawl4AI/Playwright path
    exists to handle, ``/root/reference/crawler/web_crawler.py:93-103``):
    the raw HTML carries an EMPTY mount node plus its data as an inert
    JSON script tag::

        <div id="app"></div>
        <script type="application/json" data-hydrate="app">
            {"html": "<h1>Hi</h1><p>...</p>", "title": "Hydrated"}
        </script>

    Rendering moves each payload's ``html`` into the element whose id
    matches ``data-hydrate``, optionally rewrites ``<title>`` from the
    payload's ``title`` (SPAs set ``document.title``), and removes the
    script tag — exactly what ``page.content()`` would return after
    ``wait_until="load"``. Pure function, no I/O, so fixtures and
    assertions can both call it.
    """
    global _HYDRATE_RE
    import re as _re
    if _HYDRATE_RE is None:
        _HYDRATE_RE = _re.compile(
            r"<script\s+type=[\"']application/json[\"']\s+"
            r"data-hydrate=[\"']([^\"']+)[\"']\s*>(.*?)</script>",
            _re.IGNORECASE | _re.DOTALL)
    out = html
    for m in list(_HYDRATE_RE.finditer(html)):
        target, payload_text = m.group(1), m.group(2)
        try:
            payload = json.loads(payload_text)
        except json.JSONDecodeError:
            continue                      # malformed payload: JS no-op
        mount = _re.compile(
            r"(<[a-zA-Z][^>]*\bid=[\"']" + _re.escape(target)
            + r"[\"'][^>]*>)(\s*)(</)")
        out = mount.sub(
            lambda mm: mm.group(1) + payload.get("html", "") + mm.group(3),
            out, count=1)
        if payload.get("title"):
            out = _re.sub(r"(<title[^>]*>).*?(</title>)",
                          lambda mm: mm.group(1) + payload["title"]
                          + mm.group(2),
                          out, count=1, flags=_re.IGNORECASE | _re.DOTALL)
        out = out.replace(m.group(0), "", 1)
    return out


class _RenderedPage:
    """Playwright ``Page`` stand-in: one ``goto`` then content/title."""

    def __init__(self, session: "RenderedDomSession"):
        self._session = session
        self._html = ""
        self._closed = False

    def goto(self, url: str, timeout: float = 30000.0,
             wait_until: str = "load"):
        status, raw = self._session._serve(url)
        if status is None:                # registered timeout url
            raise TimeoutError(f"Timeout {timeout}ms exceeded at {url}")
        self._html = render_dom(raw)
        return _RenderedResponse(status)

    def content(self) -> str:
        return self._html

    def title(self) -> str:
        import re as _re
        m = _re.search(r"<title[^>]*>(.*?)</title>", self._html,
                       _re.IGNORECASE | _re.DOTALL)
        return m.group(1).strip() if m else ""

    def close(self) -> None:
        self._closed = True
        self._session.pages_closed += 1


class _RenderedResponse:
    def __init__(self, status: int):
        self.status = status


class RenderedDomSession:
    """Browserless ``BrowserContext`` stand-in for
    :class:`~web2llmstxt_ray.stages.fetch.PlaywrightFetcher` — the
    documented fixture for the sandbox where playwright cannot be
    installed (no network route to pypi; install probe recorded in
    ROADMAP.md). Serves per-URL raw HTML through :func:`render_dom`
    (simulated JS hydration), so the fetcher's ENTIRE post-``goto``
    logic — status/retry policy, rendered ``content()`` → fit/raw
    markdown, M8 title fallbacks, stats accounting — runs for real.

    - ``docs[url]`` = raw html string, OR a list of ``(status, html)``
      served in order (last entry repeats) for retry-budget tests.
    - ``timeout_urls`` — ``goto`` raises ``TimeoutError`` (matches the
      fetcher's ``"Timeout" in type(e).__name__`` classification).

    Plain picklable data → usable inside Ray actors via
    ``playwright_fetcher_factory(session=...)``.
    """

    def __init__(self, docs: dict | None = None,
                 timeout_urls: set | None = None):
        self.docs = docs or {}
        self.timeout_urls = set(timeout_urls or ())
        self.request_counts: dict[str, int] = {}
        self.pages_closed = 0

    def new_page(self) -> _RenderedPage:
        return _RenderedPage(self)

    def close(self) -> None:
        pass

    def _serve(self, url: str):
        n = self.request_counts.get(url, 0)
        self.request_counts[url] = n + 1
        if url in self.timeout_urls:
            return None, ""
        doc = self.docs.get(url)
        if doc is None:
            return 404, "<html><body>not found</body></html>"
        if isinstance(doc, str):
            return 200, doc
        status, html = doc[min(n, len(doc) - 1)]
        return status, html
