"""Crawl4AI-fidelity markdown rendering (stages/markdown.py): golden
extractions on boilerplate-heavy synthetic pages (round-3 verdict
item 5), structural fidelity (tables, nested lists, code, quotes),
and the fit→raw selection chain the fetchers use."""

import pytest

from web2llmstxt_ray.stages.markdown import fit_markdown, raw_markdown

BOILERPLATE_PAGE = """
<html><head><title>T</title><style>x{color:red}</style>
<script>var t=1;</script></head><body>
<header class="site-header"><nav><ul>
<li><a href="/a">Home</a></li><li><a href="/b">Products</a></li>
<li><a href="/c">About</a></li></ul></nav></header>
<main><article>
<h1>Main Title</h1>
<p>First paragraph with <strong>bold</strong> and <em>ital</em> and a
<a href="/ref">reference link</a> inside running prose that carries
enough words to count as content for the readability filter to keep
it around without any question at all.</p>
<h2>Features</h2>
<ul><li>alpha</li><li>beta<ul><li>beta-one</li><li>beta-two</li></ul>
</li><li>gamma</li></ul>
<table><thead><tr><th>Name</th><th>Qty</th></tr></thead>
<tbody><tr><td>apple</td><td>3</td></tr>
<tr><td>pear</td><td>5</td></tr></tbody></table>
<p><img src="/img/x.png" alt="diagram"></p>
<pre><code>def f():
    return 1</code></pre>
<blockquote><p>quoted wisdom</p></blockquote>
<ol><li>first</li><li>second</li></ol>
</article></main>
<div class="sidebar"><a href="/s1">side one</a>
<a href="/s2">side two</a></div>
<div id="cookie-banner"><p>We use cookies <a href="/ok">OK</a></p></div>
<footer><p><a href="/priv">Privacy</a> | <a href="/tos">Terms</a></p>
</footer></body></html>
"""


class TestFitPruning:
    def test_boilerplate_dropped_content_kept(self):
        md = fit_markdown(BOILERPLATE_PAGE)
        # golden content fragments survive
        assert "# Main Title" in md
        assert "## Features" in md
        assert "[reference link](/ref)" in md
        assert "**bold**" in md and "*ital*" in md
        # chrome is gone: nav, sidebar, cookie banner, footer
        for chrome in ("Home", "Products", "side one", "cookies",
                       "Privacy", "Terms"):
            assert chrome not in md
        # scripts/styles never leak
        assert "var t=1" not in md and "color:red" not in md

    def test_raw_keeps_everything(self):
        md = raw_markdown(BOILERPLATE_PAGE)
        assert "# Main Title" in md
        assert "[Home](/a)" in md
        assert "[Privacy](/priv)" in md

    def test_link_density_prune_spares_prose_lists(self):
        # a link-heavy low-prose list is chrome; a prose-heavy list
        # with the same shape is content
        chrome = ("<ul>" + "".join(
            f'<li><a href="/{i}">item {i}</a></li>' for i in range(8))
            + "</ul>")
        prose = ("<ul>" + "".join(
            f"<li>a much longer narrative bullet number {i} that talks "
            "about real things at length</li>" for i in range(8))
            + "</ul>")
        md = fit_markdown(f"<body>{chrome}{prose}</body>")
        assert "item 3" not in md
        assert "narrative bullet number 3" in md

    def test_fit_empty_falls_back_via_or_chain(self):
        # a page that is ALL chrome fits to nothing; the fetchers'
        # `fit or raw` chain then keeps the raw render
        page = ('<body><nav><a href="/a">A</a></nav>'
                '<footer><a href="/b">B</a></footer></body>')
        assert fit_markdown(page) == ""
        assert "[A](/a)" in raw_markdown(page)


class TestStructures:
    def test_nested_lists_indent(self):
        md = raw_markdown(
            "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li>"
            "<li>b</li></ul>")
        assert md.splitlines() == ["- a", "  - a1", "  - a2", "- b"]

    def test_ordered_list_numbering(self):
        md = raw_markdown("<ol><li>x</li><li>y</li><li>z</li></ol>")
        assert md.splitlines() == ["1. x", "2. y", "3. z"]

    def test_table_render(self):
        md = raw_markdown(
            "<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>")
        lines = md.splitlines()
        assert lines[0] == "| A | B |"
        assert lines[1].startswith("|") and "---" in lines[1]
        assert lines[2] == "| 1 | 2 |"

    def test_code_fence_preserves_newlines(self):
        md = raw_markdown("<pre><code>a = 1\nb = 2</code></pre>")
        assert md.splitlines() == ["```", "a = 1", "b = 2", "```"]

    def test_blockquote(self):
        md = raw_markdown("<blockquote><p>one</p><p>two</p></blockquote>")
        assert md.splitlines() == ["> one", ">", "> two"]

    def test_image_and_hr(self):
        md = raw_markdown('<p><img src="/i.png" alt="pic"></p><hr>')
        assert "![pic](/i.png)" in md
        assert "---" in md

    def test_entities_and_whitespace(self):
        assert raw_markdown("<p>a &amp; b</p><p>  c   d </p>") \
            == "a & b\n\nc d"

    def test_empty_and_malformed(self):
        assert raw_markdown("") == ""
        assert fit_markdown("") == ""
        # unclosed tags and stray closers must not crash or drop text
        md = raw_markdown("<p>open <b>bold<p>next para</i></p>")
        assert "open" in md and "next para" in md

    def test_headings_all_levels(self):
        html = "".join(f"<h{i}>t{i}</h{i}>" for i in range(1, 7))
        md = raw_markdown(html)
        for i in range(1, 7):
            assert "#" * i + f" t{i}" in md.splitlines()


class TestFetcherIntegration:
    def test_network_fetcher_uses_fit_markdown(self):
        from web2llmstxt_ray.testing import FixtureHTTPServer

        pytest.importorskip("requests")
        from web2llmstxt_ray.stages.fetch import NetworkFetcher

        html = ("<html><head><title>Doc</title></head><body>"
                "<nav><a href='/x'>NavLink</a></nav>"
                "<h1>Real</h1><p>" + "prose words here " * 30 + "</p>"
                "</body></html>")
        srv = FixtureHTTPServer(html_docs={"d": html}).start()
        try:
            f = NetworkFetcher(backoff_factor=0.05)
            row = f.fetch_one(f"{srv.base_url}/html/d", 0.0, 0)
        finally:
            srv.stop()
        assert row["success"] is True
        assert "# Real" in row["content"]
        assert "NavLink" not in row["content"]      # fit pruned nav
