"""Deterministic synthetic web generator — the fixture that replaces the
network (FIXTURES.md §F3).

The reference bakes its fixture into the crawler as the magic URL
``https://example.com/test_mock_crawl`` returning fixed mock pages (pyc
``discover_all_links_first`` lines 171-179); we generalize: a seeded page
graph over multiple hosts with a skewed host-size distribution, pages
carrying both raw HTML (exercising every link-extraction regex family,
``crawler/web_crawler.py:444-522``) and fit-markdown (exercising span
extraction incl. headings / code / images), plus per-host robots with
crawl-delay budgets.

Everything is a pure function of ``seed`` — regeneration is bit-identical
(``random.Random(seed)``, no wall clock, no hash()-order iteration).
"""

from __future__ import annotations

import random

import pyarrow as pa

from . import schema as S

_TOPIC_WORDS = (
    "docs api guide tutorial pricing blog about features reference "
    "overview support faq news article team contact product service "
    "resources download install setup config examples changelog search "
    "tag category login admin"
).split()

_PROSE_WORDS = (
    "the quick brown fox jumps over a lazy dog while engineers build "
    "distributed systems that stream arrow batches through object stores "
    "with backpressure and careful partitioning of skewed keys across "
    "many worker processes ensuring politeness budgets and exactly once "
    "visit ordering for every canonical url in this synthetic corpus "
    "documentation explains how pipelines transform pages into spans"
).split()


def _make_paragraph(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_PROSE_WORDS) for _ in range(n_words))


def _page_markdown(rng: random.Random, url: str, title: str, links: list[str],
                   thin: bool) -> str:
    """Fit-markdown for a page: H1, paragraphs, a heading, sometimes a
    code block, image refs, and markdown links to ``links``."""
    parts = [f"# {title}", ""]
    n_paras = 1 if thin else rng.randint(2, 5)
    para_words = 8 if thin else rng.randint(40, 90)
    for i in range(n_paras):
        parts.append(_make_paragraph(rng, para_words))
        parts.append("")
        if not thin and i == 0:
            parts.append(f"## Section {rng.randint(1, 9)}")
            parts.append("")
    if not thin and rng.random() < 0.4:
        parts.append("```python")
        parts.append(f"print({rng.randint(0, 999)})")
        parts.append("```")
        parts.append("")
    if not thin and rng.random() < 0.5:
        parts.append(f"![diagram {rng.randint(1, 99)}]({url.rstrip('/')}/img{rng.randint(1, 9)}.png)")
        parts.append("")
    # a markdown-visible subset of the links
    for link in links[: max(1, len(links) // 2)]:
        parts.append(f"[related page]({link})")
    return "\n".join(parts).rstrip() + "\n"


def _page_html(rng: random.Random, title: str, links: list[str],
               noise_links: list[str]) -> str:
    """Raw HTML exercising each link-extraction regex family."""
    rows = [f"<html><head><title>{title} | Synthetic Site</title>",
            '<link href="/styles/site.css" rel="stylesheet">', "</head><body>"]
    for i, link in enumerate(links):
        style = i % 4
        if style == 0:
            rows.append(f'<a href="{link}">link {i}</a>')
        elif style == 1:
            rows.append(f'<div data-href="{link}">card {i}</div>')
        elif style == 2:
            rows.append(f"<script>window.location = '{link}';</script>")
        else:
            rows.append(f'<button onclick="location.href=\'{link}\'">go</button>')
    for link in noise_links:
        rows.append(f'<a href="{link}">noise</a>')
    rows.append("</body></html>")
    return "\n".join(rows)


def generate_site(
    num_pages: int = 120,
    num_hosts: int = 3,
    seed: int = 42,
    mega_host_share: float = 0.5,
    thin_page_rate: float = 0.15,
    error_rate: float = 0.08,
) -> tuple[pa.Table, pa.Table]:
    """Build the (site, robots) fixture tables.

    Host 0 is the "mega" host holding ``mega_host_share`` of all pages
    (exercises host-bucket skew handling); each host's root page is
    ``https://site{i}.test/``. Links are mostly intra-host with a few
    cross-host edges; noise links cover assets, tracking params,
    pagination and mailto/js schemes so canonicalization and filters see
    realistic garbage.
    """
    rng = random.Random(seed)
    hosts = [f"site{i}.test" for i in range(num_hosts)]

    # --- allocate pages to hosts (skewed) ---
    counts = [0] * num_hosts
    counts[0] = max(1, int(num_pages * mega_host_share))
    remaining = num_pages - counts[0]
    for i in range(1, num_hosts):
        share = remaining // (num_hosts - 1)
        counts[i] = share
    counts[num_hosts - 1] += num_pages - sum(counts)

    # --- page URLs per host: root + topical paths, depth 1-4 ---
    urls_by_host: dict[str, list[str]] = {}
    for h_i, host in enumerate(hosts):
        urls = [f"https://{host}/"]
        used = {urls[0]}
        while len(urls) < counts[h_i]:
            depth = rng.randint(1, 4)
            segs = [rng.choice(_TOPIC_WORDS) for _ in range(depth)]
            # make deep paths unique with a numeric suffix when colliding
            url = f"https://{host}/" + "/".join(segs)
            if url in used:
                url = f"{url}-{rng.randint(1, 9999)}"
            if url in used:
                continue
            used.add(url)
            urls.append(url)
        urls_by_host[host] = urls

    all_urls = [u for host in hosts for u in urls_by_host[host]]

    # --- adjacency: root links widely; other pages link to a few peers ---
    rows: dict[str, list] = {k: [] for k in (
        "url", "host", "status", "html", "markdown", "title_meta",
        "word_count", "out_links")}

    for host in hosts:
        urls = urls_by_host[host]
        n_host = len(urls)
        for i, url in enumerate(urls):
            is_root = i == 0
            n_out = min(n_host - 1, rng.randint(8, 16) if is_root else rng.randint(2, 6))
            # sample peer INDICES (a per-page peers-list copy is O(n) and
            # makes generation O(n²) on the mega host)
            out = []
            if n_out > 0:
                picked = rng.sample(range(n_host), min(n_host, n_out + 1))
                out = [urls[j] for j in picked if j != i][:n_out]
            # occasional cross-host edge (filtered by same_domain in-engine)
            if rng.random() < 0.2 and len(hosts) > 1:
                other = rng.choice([h for h in hosts if h != host])
                out.append(urls_by_host[other][0])

            slug = url.rstrip("/").rsplit("/", 1)[-1] or host
            title = slug.replace("-", " ").title() + f" Page {i}"
            title_meta = title if rng.random() > 0.2 else None  # exercise H1/slug fallback
            thin = (not is_root) and rng.random() < thin_page_rate

            noise = [
                f"{url.rstrip('/')}/asset{rng.randint(1, 9)}.png",
                f"{url}?utm_source=feed&utm_campaign=x",
                "mailto:team@example.com",
                "javascript:void(0)",
                f"{url}?page={rng.randint(2, 5)}" if rng.random() < 0.3 else "#frag",
            ]
            markdown = _page_markdown(rng, url, title, out, thin)
            html = _page_html(rng, title, out, noise)
            status = 200
            if not is_root and rng.random() < error_rate:
                status = rng.choice([404, 500, -1])  # -1 = timeout sentinel

            # word_count mirrors the engine's metric over extracted text
            wc = len(" ".join(
                ln for ln in markdown.splitlines()
                if not ln.startswith(("```", "!["))
            ).split())

            rows["url"].append(url)
            rows["host"].append(host)
            rows["status"].append(status)
            rows["html"].append(html)
            rows["markdown"].append(markdown)
            rows["title_meta"].append(title_meta)
            rows["word_count"].append(wc)
            rows["out_links"].append(out)

    site = pa.Table.from_pydict(rows, schema=S.SYNTHETIC_SITE)

    robots = pa.Table.from_pydict(
        {
            "host": hosts,
            "disallow": [["/admin", "/login"] for _ in hosts],
            "crawl_delay_ms": [0 if i else 0 for i in range(num_hosts)],
            "sitemap_urls": [[f"https://{h}/sitemap.xml"] for h in hosts],
        },
        schema=S.ROBOTS,
    )
    return site, robots


def site_index(site: pa.Table) -> dict[str, dict]:
    """url → page-row dict lookup for the mock fetcher (broadcast once
    via ``ray.put``, read per actor — never re-shipped per batch)."""
    cols = site.to_pydict()
    return {
        url: {
            "host": cols["host"][i],
            "status": cols["status"][i],
            "html": cols["html"][i],
            "markdown": cols["markdown"][i],
            "title_meta": cols["title_meta"][i],
            "word_count": cols["word_count"][i],
        }
        for i, url in enumerate(cols["url"])
    }
