"""Sitemap discovery + parsing (SURVEY S3/S4).

Reference semantics (``crawler/web_crawler.py:815-899`` discovery,
``:901-1079`` parsing — written from scratch here):

- auto-discovery probes a fixed list of common sitemap paths plus the
  ``Sitemap:`` lines of robots.txt;
- the parser enforces a 50 MB size cap, sniffs gzip by magic bytes
  (``\\x1f\\x8b``), parses with ``ElementTree``, extracts ``<loc>``
  with the sitemaps namespace / no namespace / a tag-suffix fallback,
  validates each URL against the allowed domains, and descends
  recursively through sitemap-index documents.

No network exists in this sandbox, so fetching goes through a
``fetch_fn(url) -> bytes | None`` callable: tests provide a fixture
mapping; production would provide an HTTP client with retries
(reference uses ``Retry(total=3, backoff_factor=1)``).
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from ..functions.urls import same_domain

MAX_SITEMAP_BYTES = 50 * 1024 * 1024  # crawler/web_crawler.py:930

COMMON_SITEMAP_PATHS = (
    "/sitemap.xml", "/sitemap_index.xml", "/sitemap-index.xml",
    "/wp-sitemap.xml", "/sitemap1.xml", "/sitemap/sitemap.xml",
    "/sitemaps/sitemap.xml", "/sitemap/index.xml", "/post-sitemap.xml",
    "/page-sitemap.xml",
)

_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def discover_sitemaps(base_url: str, probe_fn, robots_txt: str | None = None) -> list[str]:
    """Candidate sitemap URLs for a site: common paths that respond
    (``probe_fn(url) -> bool``) plus robots.txt ``Sitemap:`` lines
    (``crawler/web_crawler.py:815-899``)."""
    base = base_url.rstrip("/")
    found = [base + p for p in COMMON_SITEMAP_PATHS if probe_fn(base + p)]
    if robots_txt:
        for line in robots_txt.splitlines():
            line = line.strip()
            if line.lower().startswith("sitemap:"):
                sm = line.split(":", 1)[1].strip()
                if sm and sm not in found:
                    found.append(sm)
    return found


def _decode_body(body: bytes) -> str | None:
    if len(body) > MAX_SITEMAP_BYTES:
        return None
    if body[:2] == b"\x1f\x8b":  # gzip magic (crawler/web_crawler.py:966-978)
        try:
            body = gzip.decompress(body)
        except OSError:
            return None
        if len(body) > MAX_SITEMAP_BYTES:
            return None
    try:
        return body.decode("utf-8", errors="replace")
    except Exception:  # pragma: no cover
        return None


def _extract_locs(root: ET.Element, tag: str) -> list[str]:
    """<loc> contents under ``tag`` entries: namespaced, bare, then a
    suffix-match fallback for exotic namespaces."""
    locs: list[str] = []
    for entry_tag in (f"{_SM_NS}{tag}", tag):
        for entry in root.iter(entry_tag):
            for loc_tag in (f"{_SM_NS}loc", "loc"):
                for loc in entry.iter(loc_tag):
                    if loc.text and loc.text.strip():
                        locs.append(loc.text.strip())
        if locs:
            break
    if not locs:  # fallback: any element whose tag ends with 'loc'
        locs = [el.text.strip() for el in root.iter()
                if el.tag.split("}")[-1] == "loc" and el.text and el.text.strip()]
    return locs


def parse_sitemap(url: str, fetch_fn, base_url: str,
                  max_depth: int = 5, _seen: set[str] | None = None) -> set[str]:
    """Page URLs reachable from one sitemap URL, descending recursively
    through sitemap indexes; same-domain URLs only
    (``crawler/web_crawler.py:901-1079``)."""
    seen = _seen if _seen is not None else set()
    if url in seen or max_depth < 0:
        return set()
    seen.add(url)
    body = fetch_fn(url)
    if body is None:
        return set()
    text = _decode_body(body)
    if text is None:
        return set()
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return set()

    urls: set[str] = set()
    tag = root.tag.split("}")[-1]
    if tag == "sitemapindex":
        for child in _extract_locs(root, "sitemap"):
            urls |= parse_sitemap(child, fetch_fn, base_url,
                                  max_depth - 1, seen)
    else:
        for loc in _extract_locs(root, "url"):
            if same_domain(loc, base_url):
                urls.add(loc)
    return urls


def collect_sitemap_urls(base_url: str, sitemap_urls: list[str],
                         fetch_fn) -> list[str]:
    """De-duplicated page URLs across all of a site's sitemaps,
    deterministic order (D3 + O2 pre-sort happens downstream)."""
    out: set[str] = set()
    seen: set[str] = set()
    for sm in sitemap_urls:
        out |= parse_sitemap(sm, fetch_fn, base_url, _seen=seen)
    return sorted(out)


# --- fixture helpers (tests / synthetic benchmarks) ---

def make_sitemap_xml(urls: list[str], namespaced: bool = True) -> bytes:
    ns = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"' if namespaced else ""
    body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset{ns}>{body}</urlset>'.encode()


def make_sitemap_index(sitemaps: list[str], namespaced: bool = True) -> bytes:
    ns = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"' if namespaced else ""
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in sitemaps)
    return (f'<?xml version="1.0" encoding="UTF-8"?>'
            f"<sitemapindex{ns}>{body}</sitemapindex>").encode()
