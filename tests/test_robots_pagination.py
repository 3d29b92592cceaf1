"""robots.txt parsing (S5), pagination discovery (M3), live llms.txt
format (K1), description backfill (J1)."""

import pyarrow as pa

from web2llmstxt_ray.functions.links import discover_pagination_links
from web2llmstxt_ray.pipelines.llms import render_llms_txt, render_llms_txt_live
from web2llmstxt_ray.sources.robots import parse_robots_txt, policies_from_robots_bodies

ROBOTS = """
# comment
User-agent: *
Disallow: /admin
Disallow: /private/
Crawl-delay: 1.5

User-agent: special-bot
Disallow: /only-for-special
Crawl-delay: 0.1

Sitemap: https://a.test/sitemap.xml
Sitemap: https://a.test/sitemap2.xml
"""


class TestRobots:
    def test_wildcard_group(self):
        p = parse_robots_txt(ROBOTS)
        assert p.disallow == ["/admin", "/private/"]
        assert p.crawl_delay_ms == 1500
        assert p.sitemaps == ["https://a.test/sitemap.xml",
                              "https://a.test/sitemap2.xml"]

    def test_specific_agent_wins(self):
        p = parse_robots_txt(ROBOTS, agent="special-bot")
        assert p.disallow == ["/only-for-special"]
        assert p.crawl_delay_ms == 100

    def test_unknown_agent_falls_back_to_wildcard(self):
        p = parse_robots_txt(ROBOTS, agent="other-bot")
        assert p.disallow == ["/admin", "/private/"]

    def test_wildcard_patterns_ignored_conservatively(self):
        p = parse_robots_txt("User-agent: *\nDisallow: /a*b\nDisallow: /ok\n")
        assert p.disallow == ["/ok"]

    def test_empty_and_malformed(self):
        assert parse_robots_txt("").disallow == []
        assert parse_robots_txt("garbage no colons\n:\n").disallow == []

    def test_policies_from_bodies(self):
        dis, delays = policies_from_robots_bodies(
            {"a.test": ROBOTS, "b.test": "User-agent: *\nDisallow:\n"})
        assert dis == {"a.test": ["/admin", "/private/"]}
        assert delays == {"a.test": 1500}


class TestPaginationDiscovery:
    BASE = "https://a.test"

    def test_rel_next(self):
        html = '<link rel="next" href="/blog?page=2"><a href="/x" rel="prev">p</a>'
        out = discover_pagination_links(f"{self.BASE}/blog", html, self.BASE)
        assert f"{self.BASE}/blog?page=2" in out

    def test_numbered_anchors(self):
        html = '<a href="/list?page=3">3</a> <a href="/list/page/4/">4</a>'
        out = discover_pagination_links(f"{self.BASE}/list", html, self.BASE)
        assert f"{self.BASE}/list?page=3" in out
        assert f"{self.BASE}/list/page/4" in out

    def test_load_more_and_form(self):
        html = ('<div data-load-more-url="/feed?offset=20"></div>'
                '<form action="/search"><input></form>')
        out = discover_pagination_links(f"{self.BASE}/feed", html, self.BASE)
        assert f"{self.BASE}/feed?offset=20" in out
        assert f"{self.BASE}/search" in out

    def test_foreign_and_self_excluded(self):
        html = ('<a href="https://evil.test/x?page=2">n</a>'
                '<link rel="next" href="https://a.test/blog">')
        out = discover_pagination_links(f"{self.BASE}/blog", html, self.BASE)
        assert out == []


def _entries():
    from web2llmstxt_ray.pipelines.llms import ENTRY_SCHEMA

    return pa.Table.from_arrays(
        [
            pa.array(["https://a.test/", "https://a.test/docs"]),
            pa.array(["Home", "Docs"]),
            pa.array(["Home description.", ""]),   # empty → backfill
            pa.array([60, 80], pa.int64()),
            pa.array(["s", "s"]), pa.array([0, 1], pa.int64()),
            pa.array(["General Information", "Key Documentation"]),
            pa.array([False, False]),
        ],
        schema=ENTRY_SCHEMA,
    )


class TestRenderers:
    def test_live_format(self):
        text = render_llms_txt_live("https://a.test", _entries())
        assert text.startswith("# A.TEST - LLMs.txt")
        assert "## Home" in text and "URL: https://a.test/" in text
        assert "Description: Home description." in text

    def test_description_backfill_from_content(self):
        pages = pa.table({
            "url": ["https://a.test/", "https://a.test/docs"],
            "title": ["Home", "Docs"],
            "content": ["home words", "these are the docs words " * 10],
        })
        text = render_llms_txt("https://a.test", _entries(), pages)
        assert "- [Docs](https://a.test/docs): these are the docs words" in text
        assert "..." in text
