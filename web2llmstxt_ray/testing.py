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
