"""Real network-path logic over the loopback fixture server: the
NetworkFetcher's timeout/retry/parse behavior, the OllamaClient's
warm-up/retry/stats flow, and full crawl conformance with the real
HTTP fetcher swapped in for the mock (VERDICT round-1 items 6-7)."""

import numpy as np
import pytest

from web2llmstxt_ray.models import (
    ModelConfig, OllamaClient, generate_description)
from web2llmstxt_ray.stages.fetch import NetworkFetcher, html_to_markdown
from web2llmstxt_ray.synth import generate_site, site_index
from web2llmstxt_ray.testing import FixtureHTTPServer, NetworkFetcherFactory

BASE = "https://site0.test"


@pytest.fixture(scope="module")
def site_and_server():
    site, robots = generate_site(num_pages=120, num_hosts=3, seed=42)
    idx = site_index(site)
    cols = robots.to_pydict()
    disallow = dict(zip(cols["host"], cols["disallow"]))
    server = FixtureHTTPServer(site_index=idx).start()
    yield idx, disallow, server
    server.stop()


@pytest.fixture()
def fetcher(site_and_server):
    _, _, server = site_and_server
    return NetworkFetcher(url_rewriter=server.page_gateway(),
                          backoff_factor=0.05)


class TestNetworkFetcher:
    def test_fetch_matches_mock(self, site_and_server, fetcher):
        from web2llmstxt_ray.stages.fetch import MockFetcher

        idx, _, _ = site_and_server
        mock = MockFetcher(idx)
        ok_urls = [u for u, p in idx.items() if p["status"] == 200][:20]
        bad_urls = [u for u, p in idx.items() if p["status"] != 200][:5]
        for u in ok_urls + bad_urls:
            got = fetcher.fetch_one(u, 1.5, 2)
            want = mock.fetch_one(u, 1.5, 2)
            assert got == want, u

    def test_unknown_url_fails_cleanly(self, fetcher):
        row = fetcher.fetch_one("https://nowhere.test/none", 0.0, 0)
        assert row["success"] is False and row["word_count"] == 0

    def test_retry_budget_recovers_from_503(self, site_and_server):
        idx, _, server = site_and_server
        url = next(u for u, p in idx.items() if p["status"] == 200)
        server.fail_first[url] = (2, 503)
        server.request_counts.pop(url, None)
        f = NetworkFetcher(url_rewriter=server.page_gateway(),
                           max_retries=3, backoff_factor=0.05)
        row = f.fetch_one(url, 0.0, 0)
        assert row["success"] is True          # 2 failures < 3-retry budget
        assert server.request_counts[url] == 3  # 2 × 503 + 1 × 200
        server.fail_first.pop(url, None)

    def test_retry_budget_exhausts(self, site_and_server):
        idx, _, server = site_and_server
        url = next(u for u, p in idx.items() if p["status"] == 200)
        server.fail_first[url] = (99, 503)
        server.request_counts.pop(url, None)
        f = NetworkFetcher(url_rewriter=server.page_gateway(),
                           max_retries=2, backoff_factor=0.05)
        row = f.fetch_one(url, 0.0, 0)
        assert row["success"] is False
        assert server.request_counts[url] == 3  # initial + 2 retries
        assert f.stats["failures"] == 1
        server.fail_first.pop(url, None)

    def test_client_timeout(self, site_and_server):
        idx, _, server = site_and_server
        url = next(u for u, p in idx.items() if p["status"] == 200)
        server.delay_s[url] = 1.2
        f = NetworkFetcher(url_rewriter=server.page_gateway(),
                           page_timeout_s=0.3, max_retries=0)
        row = f.fetch_one(url, 0.0, 0)
        assert row["success"] is False
        assert f.stats["timeouts"] + f.stats["retried_or_errored"] >= 1
        server.delay_s.pop(url, None)

    def test_list_mode_timeout_default(self):
        assert NetworkFetcher(list_mode=True).timeout_s == 15.0
        assert NetworkFetcher().timeout_s == 30.0

    def test_batch_concurrent_order_preserved(self, site_and_server, fetcher):
        import pyarrow as pa

        idx, _, _ = site_and_server
        urls = [u for u, p in idx.items()][:30]
        batch = pa.table({"url": pa.array(urls),
                          "score": pa.array([1.0] * len(urls)),
                          "depth": pa.array([1] * len(urls), pa.int32())})
        out = fetcher(batch)
        assert out.column("url").to_pylist() == urls

    def test_html_fallback_parse(self, site_and_server):
        _, _, server = site_and_server
        server.html_docs["doc1"] = (
            "<html><head><title>My Doc</title><style>x{}</style></head>"
            "<body><h1>Hello</h1><p>Some body text here.</p>"
            "<a href='/next'>next page</a><script>var x=1;</script>"
            "</body></html>")
        f = NetworkFetcher(backoff_factor=0.05)
        row = f.fetch_one(f"{server.base_url}/html/doc1", 0.0, 0)
        assert row["success"] is True
        assert row["title"] == "My Doc"
        assert "# Hello" in row["content"]
        assert "[next page](/next)" in row["content"]
        assert "var x=1" not in row["content"]       # script stripped
        assert "x{}" not in row["content"]           # style stripped


class TestHtmlToMarkdown:
    def test_entities_and_whitespace(self):
        out = html_to_markdown("<p>a &amp; b</p>\n\n<p>  c   d </p>")
        assert out == "a & b\nc d"

    def test_empty(self):
        assert html_to_markdown("") == ""


class TestCrawlConformanceWithNetworkFetcher:
    def test_visit_order_equal_to_oracle(self, site_and_server, tmp_path):
        """The whole distributed crawl, fetching over REAL loopback HTTP,
        reproduces the sequential oracle exactly (VERDICT item 6 done
        criterion)."""
        from web2llmstxt_ray.pipelines.crawl import (
            CrawlConfig, DistributedCrawler)
        from web2llmstxt_ray.pipelines.oracle import crawl_oracle

        idx, disallow, server = site_and_server
        oracle = crawl_oracle(idx, BASE, max_pages=10,
                              disallow_by_host=disallow)
        cfg = CrawlConfig(
            base_url=BASE, max_pages=10, run_dir=str(tmp_path / "run"),
            fetcher_factory=NetworkFetcherFactory(server.base_url,
                                                  backoff_factor=0.05))
        crawler = DistributedCrawler(cfg, idx, disallow_by_host=disallow)
        try:
            result = crawler.run()
            assert result.visit_order == oracle.visit_order
            assert crawler.seen.count() == len(oracle.seen)
        finally:
            crawler.shutdown()


class TestOllamaClient:
    def _cfg(self, **kw):
        return ModelConfig("test-model", "Test", provider="ollama", **kw)

    def test_warm_up_and_generate(self, site_and_server):
        _, _, server = site_and_server
        c = OllamaClient(self._cfg(), base_url=server.base_url,
                         retry_sleep_s=0.05)
        assert c.warmed_up is True
        out = c.generate("Title", "Some page content.", "https://x.test/")
        assert out is not None and out.startswith("Generated summary:")
        assert c.stats["total_requests"] == 2     # warm-up + generate
        assert c.stats["total_tokens_generated"] > 0

    def test_retries_then_success(self, site_and_server):
        _, _, server = site_and_server
        c = OllamaClient(self._cfg(), base_url=server.base_url,
                         warm_up=False, retry_sleep_s=0.05)
        server.request_counts.pop("/api/generate", None)
        server.fail_first["/api/generate"] = (2, 500)
        out = c.generate("T", "content", "https://x.test/")
        assert out is not None                     # 3rd attempt wins
        assert c.stats["errors"] == 2
        server.fail_first.pop("/api/generate", None)

    def test_retries_exhausted_returns_none(self, site_and_server):
        _, _, server = site_and_server
        c = OllamaClient(self._cfg(), base_url=server.base_url,
                         warm_up=False, retry_sleep_s=0.05)
        server.request_counts.pop("/api/generate", None)
        server.fail_first["/api/generate"] = (99, 500)
        out = c.generate("T", "content", "https://x.test/")
        assert out is None
        assert c.stats["errors"] == 3              # 3 attempts, all failed
        server.fail_first.pop("/api/generate", None)

    def test_no_server_degrades_to_fallback_chain(self):
        """generate_description survives a dead endpoint: client → None →
        deterministic fallback (the reference's chain,
        generator/llms_generator.py:511-570)."""
        c = OllamaClient(self._cfg(), base_url="http://127.0.0.1:9",   # reserved port, refused
                         warm_up=False, retry_sleep_s=0.01)
        desc, used_fallback = generate_description(
            c, "A Title", "Enough content to describe. " * 10,
            "https://x.test/p")
        assert used_fallback is True
        assert desc                                 # fallback always yields

    def test_hallucination_gate(self, site_and_server):
        """A generated description failing the M16 gate falls back."""
        _, _, server = site_and_server

        class Gateish(OllamaClient):
            def generate(self, title, content, url):  # returns hallucination bait
                return ("As an AI language model, I cannot access "
                        "the page content.")

        c = Gateish(self._cfg(), base_url=server.base_url, warm_up=False)
        desc, used_fallback = generate_description(
            c, "A Title", "Real content words here. " * 10, "https://x.test/p")
        assert used_fallback is True
        assert "As an AI" not in desc

    def test_adaptive_timeout_bands(self):
        c = OllamaClient.__new__(OllamaClient)  # no HTTP in this check
        c.config = self._cfg(est_ram_gb=4.0)
        assert c._adaptive_timeout_s() == 180.0
        c.config = self._cfg(est_ram_gb=9.0)
        assert c._adaptive_timeout_s() == 270.0
        c.config = self._cfg(est_ram_gb=13.0)
        assert c._adaptive_timeout_s() == 360.0

    def test_performance_report_rating(self, site_and_server):
        _, _, server = site_and_server
        c = OllamaClient(self._cfg(), base_url=server.base_url,
                         warm_up=False)
        c.generate("T", "content words", "https://x.test/")
        rep = c.performance_report()
        assert rep["rating"] in ("excellent", "good", "fair", "slow")
        assert rep["success_rate"] == 1.0


class TestGeminiClient:
    def _cfg(self):
        return ModelConfig("gemini-1.5-flash", "Gemini Flash",
                           provider="gemini")

    def test_generate_roundtrip(self, site_and_server):
        from web2llmstxt_ray.models import GeminiClient

        _, _, server = site_and_server
        c = GeminiClient(self._cfg(), api_key="test-key",
                         base_url=server.base_url, retry_sleep_s=0.05)
        out = c.generate("Title", "Some page content.", "https://x.test/")
        assert out is not None and out.startswith("Gemini summary:")
        assert c.stats["total_requests"] == 1
        rep = c.performance_report()
        assert rep["success_rate"] == 1.0

    def test_missing_api_key_returns_none(self, site_and_server):
        from web2llmstxt_ray.models import GeminiClient

        _, _, server = site_and_server
        c = GeminiClient(self._cfg(), api_key="",
                         base_url=server.base_url, retry_sleep_s=0.05)
        assert c.generate("T", "c", "https://x.test/") is None
        assert c.stats["total_requests"] == 0     # short-circuits locally

    def test_retries_then_success_and_exhaustion(self, site_and_server):
        from web2llmstxt_ray.models import GeminiClient

        _, _, server = site_and_server
        path = "/v1beta/models/gemini-1.5-flash:generateContent"
        c = GeminiClient(self._cfg(), api_key="k",
                         base_url=server.base_url, retry_sleep_s=0.01)
        server.request_counts.pop(path, None)
        server.fail_first[path] = (2, 500)
        assert c.generate("T", "content", "https://x.test/") is not None
        assert c.stats["errors"] == 2
        server.request_counts.pop(path, None)
        server.fail_first[path] = (5, 503)
        assert c.generate("T", "content", "https://x.test/") is None
        server.fail_first.pop(path, None)

    def test_empty_candidates_returns_none(self, site_and_server):
        from web2llmstxt_ray.models import GeminiClient

        _, _, server = site_and_server
        c = GeminiClient(self._cfg(), api_key="k",
                         base_url=server.base_url, retry_sleep_s=0.01)
        assert c.generate("T", "please send empty-response",
                          "https://x.test/") is None

    def test_invalid_key_rejected_by_server(self, site_and_server):
        import requests

        from web2llmstxt_ray.models import GeminiClient

        _, _, server = site_and_server
        r = requests.post(
            server.base_url
            + "/v1beta/models/gemini-1.5-flash:generateContent",
            json={"contents": [{"parts": [{"text": "hi"}]}]}, timeout=5)
        assert r.status_code == 403


class TestOllamaModelListing:
    def test_live_tags_listing(self):
        from web2llmstxt_ray.models import list_ollama_models
        from web2llmstxt_ray.testing import FixtureHTTPServer

        srv = FixtureHTTPServer().start()
        try:
            got = list_ollama_models(srv.base_url)
        finally:
            srv.stop()
        assert set(got) == {"ollama_llama3.2:latest",
                            "ollama_qwen2.5-coder-7b:latest"}
        lm = got["ollama_llama3.2:latest"]
        assert lm.provider == "ollama" and lm.status == "available"
        assert lm.display_name == "Llama3.2"
        q = got["ollama_qwen2.5-coder-7b:latest"]
        assert q.display_name == "Qwen2.5 Coder 7B"
        assert q.est_ram_gb == 4.0          # 7b class
        assert lm.est_ram_gb == 4.0         # default class

    def test_daemon_down_returns_empty(self):
        from web2llmstxt_ray.models import list_ollama_models

        assert list_ollama_models("http://127.0.0.1:9",
                                  timeout_s=0.5) == {}

    def test_error_status_returns_empty(self):
        from web2llmstxt_ray.models import list_ollama_models
        from web2llmstxt_ray.testing import FixtureHTTPServer

        srv = FixtureHTTPServer().start()
        srv.fail_first["/api/tags"] = (99, 500)
        try:
            assert list_ollama_models(srv.base_url) == {}
        finally:
            srv.stop()

    def test_discover_merge_and_ram_gate(self):
        from web2llmstxt_ray.models import discover_models, pick_model
        from web2llmstxt_ray.testing import FixtureHTTPServer

        srv = FixtureHTTPServer().start()
        srv.ollama_models = [{"name": "huge-70b:latest"},
                             {"name": "tiny-1b"}]
        try:
            models = discover_models(srv.base_url, gemini_api_key=None)
        finally:
            srv.stop()
        assert models["ollama_huge-70b:latest"].est_ram_gb == 40.0
        assert models["gemini_gemini-1.5-pro"].status == "offline"
        with_key = discover_models(None, gemini_api_key="k")
        assert with_key["gemini_gemini-1.5-pro"].status == "available"
        # deterministic fallback always present, and the RAM gate picks
        # a fitting model from the discovered set
        assert any(c.provider == "deterministic"
                   for c in models.values())
        chosen = pick_model(tuple(models.values()),
                            prefer_provider="ollama")
        assert chosen.provider in ("ollama", "deterministic")


def _playwright_available() -> bool:
    try:
        import playwright.sync_api  # noqa: F401
        return True
    except ImportError:
        return False


class TestPlaywrightFetcher:
    def test_unavailable_contract(self):
        from web2llmstxt_ray.stages.fetch import PlaywrightFetcher

        if _playwright_available():
            pytest.skip("playwright installed — gate not applicable")
        with pytest.raises(NotImplementedError, match="playwright"):
            PlaywrightFetcher()

    def test_parity_with_network_fetcher_when_installed(self):
        """Rendered-path parity on static loopback HTML: both fetchers
        must produce the same (url, title, content, word_count) rows
        (a page with no JS renders to the same DOM)."""
        if not _playwright_available():
            pytest.skip("playwright not installed in this environment")
        import pyarrow as pa

        from web2llmstxt_ray.stages.fetch import (NetworkFetcher,
                                                  PlaywrightFetcher)

        docs = {
            "a": "<html><head><title>Alpha Doc</title></head><body>"
                 "<h1>Alpha</h1><p>" + "alpha words here " * 30
                 + "</p></body></html>",
            "b": "<html><head><title>Beta Doc</title></head><body>"
                 "<h2>Beta</h2><p>" + "beta words there " * 30
                 + "</p></body></html>",
        }
        srv = FixtureHTTPServer(html_docs=docs).start()
        try:
            rewrite = lambda u: f"{srv.base_url}/html/{u.rsplit('/', 1)[-1]}"
            batch = pa.table({"url": ["https://x.test/a",
                                      "https://x.test/b",
                                      "https://x.test/missing"]})
            net = NetworkFetcher(url_rewriter=rewrite)(batch).to_pylist()
            pw = PlaywrightFetcher(url_rewriter=rewrite)(batch).to_pylist()
        finally:
            srv.stop()
        for n, p in zip(net, pw):
            assert n["url"] == p["url"]
            assert n["success"] == p["success"]
            assert n["title"] == p["title"]
            # a browser may normalize the DOM slightly; the extracted
            # word stream must agree
            assert n["content"].split() == p["content"].split()
