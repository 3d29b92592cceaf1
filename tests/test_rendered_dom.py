"""Rendered-DOM fixture tests — the browserless PlaywrightFetcher seam.

Playwright cannot be installed in this sandbox (no network route to
pypi; probe recorded in ROADMAP.md), so the JS-rendering path of the
reference (``crawler/web_crawler.py:93-103,283-303``) is exercised via
``testing.RenderedDomSession``: a deterministic client-side-hydration
simulator injected through ``PlaywrightFetcher(session=...)``. Every
line of the fetcher below ``page.goto`` — status/retry policy,
rendered ``content()`` → fit/raw markdown, M8 title fallbacks, stats —
runs for real; only the browser binary is substituted.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from web2llmstxt_ray.stages.fetch import (FETCH_RESULT, PlaywrightFetcher,
                                          html_to_markdown,
                                          playwright_fetcher_factory)
from web2llmstxt_ray.testing import RenderedDomSession, render_dom

SPA_SHELL = (
    "<html><head><title>Loading…</title></head><body>"
    '<div id="app"></div>'
    '<script type="application/json" data-hydrate="app">'
    '{"html": "<h1>Quantum Widgets</h1><p>'
    + "rendered client side content words "  # 5 words × 12 = 60 > 50
    * 12
    + '</p>", "title": "Quantum Widgets — Docs"}'
    "</script></body></html>"
)


def _fetch(session, urls, **kw) -> tuple[PlaywrightFetcher, list[dict]]:
    f = PlaywrightFetcher(session=session, **kw)
    out = f(pa.table({"url": urls}))
    assert out.schema.equals(FETCH_RESULT)
    return f, out.to_pylist()


class TestRenderDom:
    def test_hydration_moves_payload_and_title(self):
        dom = render_dom(SPA_SHELL)
        assert "<h1>Quantum Widgets</h1>" in dom
        assert "<title>Quantum Widgets — Docs</title>" in dom
        assert "application/json" not in dom        # script removed

    def test_malformed_payload_is_js_noop(self):
        shell = ('<div id="x"></div><script type="application/json" '
                 'data-hydrate="x">{nope</script>')
        assert render_dom(shell) == shell

    def test_plain_html_passes_through(self):
        html = "<html><body><p>static page</p></body></html>"
        assert render_dom(html) == html


class TestRenderedFetch:
    def test_hydrated_content_invisible_to_raw_parse(self):
        """The reason the browser path exists: the raw shell has NO
        body text (html_to_markdown sees an empty mount div), the
        rendered path extracts the hydrated article + SPA title."""
        raw_md = html_to_markdown(SPA_SHELL)
        assert "rendered client side" not in raw_md

        sess = RenderedDomSession(docs={"https://spa.test/docs": SPA_SHELL})
        f, rows = _fetch(sess, ["https://spa.test/docs"])
        (r,) = rows
        assert r["success"] is True
        assert "rendered client side content words" in r["content"]
        # M9 clean_title strips the "— Docs" site-name suffix
        assert r["title"] == "Quantum Widgets"
        assert r["word_count"] == len(r["content"].split()) > 50
        assert "<h1>" in r["html"]          # rendered DOM, not shell
        assert f.stats == {"requests": 1, "failures": 0, "timeouts": 0,
                           "retried_or_errored": 0}
        assert sess.pages_closed == 1       # page closed in finally

    def test_retryable_status_then_success(self):
        url = "https://spa.test/flaky"
        sess = RenderedDomSession(
            docs={url: [(503, ""), (429, ""), (200, SPA_SHELL)]})
        f, rows = _fetch(sess, [url])
        assert rows[0]["success"] is True
        assert sess.request_counts[url] == 3
        assert f.stats["failures"] == 0

    def test_retry_budget_exhausted(self):
        url = "https://spa.test/down"
        sess = RenderedDomSession(docs={url: [(503, "")]})
        f, rows = _fetch(sess, [url], max_retries=3)
        (r,) = rows
        assert r["success"] is False and r["content"] == ""
        assert sess.request_counts[url] == 3        # all retries spent
        assert f.stats["failures"] == 1
        assert f.stats["retried_or_errored"] == 1

    def test_non_retryable_status_fails_immediately(self):
        url = "https://spa.test/gone"
        sess = RenderedDomSession(docs={url: [(404, "")]})
        f, rows = _fetch(sess, [url])
        assert rows[0]["success"] is False
        assert sess.request_counts[url] == 1        # no retry on 404
        assert f.stats["failures"] == 1

    def test_timeout_classified(self):
        url = "https://spa.test/slow"
        sess = RenderedDomSession(docs={}, timeout_urls={url})
        f, rows = _fetch(sess, [url], max_retries=2)
        assert rows[0]["success"] is False
        assert f.stats["timeouts"] == 1
        assert f.stats["retried_or_errored"] == 0
        assert sess.pages_closed == 2       # finally closes every page

    def test_title_fallback_chain(self):
        """M8 (crawler/web_crawler.py:397-424): page.title() → H1 →
        URL slug — exercised through the REAL rendered path."""
        h1_only = ("<html><body><h1>From Heading</h1><p>"
                   + "body words here " * 20 + "</p></body></html>")
        slug_only = ("<html><body><p>"
                     + "plain words only " * 20 + "</p></body></html>")
        sess = RenderedDomSession(docs={
            "https://spa.test/a": h1_only,
            "https://spa.test/getting-started": slug_only,
        })
        _, rows = _fetch(sess, ["https://spa.test/a",
                                "https://spa.test/getting-started"])
        assert rows[0]["title"] == "From Heading"
        assert rows[1]["title"] == "Getting Started"

    def test_score_depth_passthrough_and_defaults(self):
        sess = RenderedDomSession(docs={"https://spa.test/docs": SPA_SHELL})
        f = PlaywrightFetcher(session=sess)
        out = f(pa.table({"url": ["https://spa.test/docs"],
                          "score": [2.5], "depth": pa.array([3], pa.int32())}))
        r = out.to_pylist()[0]
        assert (r["score"], r["depth"]) == (2.5, 3)
        out2 = f(pa.table({"url": ["https://spa.test/docs"]}))
        r2 = out2.to_pylist()[0]
        assert (r2["score"], r2["depth"]) == (0.0, 0)

    def test_factory_builds_injected_fetcher(self):
        sess = RenderedDomSession(docs={"https://spa.test/docs": SPA_SHELL})
        factory = playwright_fetcher_factory(session=sess)
        f = factory(site_ref=None)
        assert isinstance(f, PlaywrightFetcher)
        assert f(pa.table({"url": ["https://spa.test/docs"]
                           })).to_pylist()[0]["success"] is True

    def test_gate_without_session_still_honest(self):
        try:
            import playwright.sync_api  # noqa: F401
            pytest.skip("playwright installed — gate not applicable")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="playwright"):
            PlaywrightFetcher()


class TestRenderedFetchInRay:
    def test_actor_pool_map_batches(self, ray_session):
        """The session object is plain picklable data → the rendered
        fetcher runs as a real map_batches actor pool."""
        import ray.data as rd

        docs = {f"https://spa.test/p{i}": SPA_SHELL for i in range(8)}
        sess = RenderedDomSession(docs=docs)
        ds = rd.from_items([{"url": u} for u in sorted(docs)])
        out = ds.map_batches(
            PlaywrightFetcher, fn_constructor_kwargs={"session": sess},
            concurrency=2, batch_size=4, batch_format="pyarrow",
        ).to_pandas()
        assert len(out) == 8
        assert out["success"].all()
        assert (out["title"] == "Quantum Widgets").all()
