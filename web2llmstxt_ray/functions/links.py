"""Link extraction, pagination discovery and synthesis (SURVEY M2-M5).

Reference semantics: ``crawler/web_crawler.py:444-522`` (three extraction
families: HTML attribute regexes, JS navigation regexes, markdown links),
pyc ``_extract_all_links`` lines 102-145 (adds ``data-*`` attribute and
``onclick`` location regexes), pagination discovery at ``:524-632`` and
sequential page synthesis at ``:644-709``. Code written from scratch.

Runs inside ``flat_map``/``map_batches``: one page row in, many link rows
out. All regexes are module-level precompiled (actor/worker import time,
never per batch).
"""

from __future__ import annotations

from urllib.parse import urljoin

import re

from .urls import canonicalize_url, same_domain

# HTML / JS link-bearing patterns (crawler/web_crawler.py:454-476 + pyc
# additions). Each yields a URL in group 1.
_LINK_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']""",
        r"""<link\s[^>]*?href\s*=\s*["']([^"']+)["']""",
        r"""window\.location(?:\.href)?\s*=\s*["']([^"']+)["']""",
        r"""location\.href\s*=\s*["']([^"']+)["']""",
        r"""\bdata-(?:href|link|url|navigate)\s*=\s*["']([^"']+)["']""",
        r"""onclick\s*=\s*["'][^"']*?location(?:\.href)?\s*=\s*'([^']+)'""",
    )
]

_MD_LINK_RE = re.compile(r"\[[^\]]*\]\(([^)\s]+)[^)]*\)")

_SKIP_PREFIXES = ("#", "mailto:", "tel:", "javascript:", "data:")


def extract_links(page_url: str, html: str | None, markdown: str | None,
                  base_url: str) -> list[str]:
    """All same-domain links on a page, canonicalized and de-duplicated
    (first-seen order preserved).

    Mirrors the union of the reference's extraction families
    (``crawler/web_crawler.py:444-522``): HTML href/link/JS-location/
    data-attribute regexes over raw HTML plus markdown ``[text](url)``
    links, relative→absolute resolution against the page URL, skipping
    fragments / mailto / tel / javascript.
    """
    raw: list[str] = []
    if html:
        for pat in _LINK_PATTERNS:
            raw.extend(pat.findall(html))
    if markdown:
        raw.extend(_MD_LINK_RE.findall(markdown))

    seen: set[str] = set()
    out: list[str] = []
    for link in raw:
        link = link.strip()
        if not link or link.startswith(_SKIP_PREFIXES):
            continue
        absolute = urljoin(page_url, link)
        if not absolute.startswith(("http://", "https://")):
            continue
        if not same_domain(absolute, base_url):
            continue
        canon = canonicalize_url(absolute)
        if canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out


# --- pagination discovery (M3, crawler/web_crawler.py:524-632) ---

_REL_NEXT_RE = re.compile(
    r"""<(?:a|link)\s[^>]*?rel\s*=\s*["'](?:next|prev)["'][^>]*?href\s*=\s*["']([^"']+)["']""",
    re.IGNORECASE)
_REL_NEXT_RE2 = re.compile(
    r"""<(?:a|link)\s[^>]*?href\s*=\s*["']([^"']+)["'][^>]*?rel\s*=\s*["'](?:next|prev)["']""",
    re.IGNORECASE)
_LOAD_MORE_RE = re.compile(
    r"""\bdata-(?:load-more(?:-url)?|next-page)\s*=\s*["']([^"']+)["']""",
    re.IGNORECASE)
_FORM_ACTION_RE = re.compile(
    r"""<form\s[^>]*?action\s*=\s*["']([^"']+)["']""", re.IGNORECASE)
_NUMBERED_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*["']([^"']*(?:[?&]page=\d+|/page/\d+|[?&]p=\d+|[?&]offset=\d+)[^"']*)["']""",
    re.IGNORECASE)


def discover_pagination_links(page_url: str, html: str | None,
                              base_url: str) -> list[str]:
    """Pagination targets on a page (crawler/web_crawler.py:524-632):
    rel=next/prev links, numbered-pagination anchors, load-more data
    attributes and form actions — resolved, same-domain filtered and
    canonicalized (first-seen order)."""
    if not html:
        return []
    raw: list[str] = []
    for pat in (_REL_NEXT_RE, _REL_NEXT_RE2, _NUMBERED_ANCHOR_RE,
                _LOAD_MORE_RE, _FORM_ACTION_RE):
        raw.extend(pat.findall(html))
    seen: set[str] = set()
    out: list[str] = []
    for link in raw:
        link = link.strip()
        if not link or link.startswith(_SKIP_PREFIXES):
            continue
        absolute = urljoin(page_url, link)
        if not absolute.startswith(("http://", "https://")):
            continue
        if not same_domain(absolute, base_url):
            continue
        canon = canonicalize_url(absolute)
        if canon != canonicalize_url(page_url) and canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out


# --- pagination synthesis (M4, crawler/web_crawler.py:644-709) ---

_PAGE_NUM_PATTERNS = [
    # (regex with a number group, template rebuilding the URL for page {n})
    (re.compile(r"(.*/page/)(\d+)(/?.*)"), r"\g<1>{n}\g<3>"),
    (re.compile(r"(.*[?&]page=)(\d+)(.*)"), r"\g<1>{n}\g<3>"),
    (re.compile(r"(.*[?&]p=)(\d+)(.*)"), r"\g<1>{n}\g<3>"),
    (re.compile(r"(.*/p)(\d+)(/?.*)"), r"\g<1>{n}\g<3>"),
    (re.compile(r"(.*[?&]offset=)(\d+)(.*)"), r"\g<1>{n}\g<3>"),
]


def synthesize_pagination(url: str, span: int = 2, probe_pages: int = 0) -> list[str]:
    """Neighboring page URLs for a paginated URL.

    When the URL matches a known pagination pattern, generate the ±span
    neighbors (page numbers >= 1); when it doesn't and ``probe_pages`` >
    0, probe ``?page=2..probe_pages+1`` (the reference probes ?page=2..5,
    ``crawler/web_crawler.py:690-706``).
    """
    out: list[str] = []
    for pat, _tmpl in _PAGE_NUM_PATTERNS:
        m = pat.match(url)
        if m:
            current = int(m.group(2))
            for n in range(max(1, current - span), current + span + 1):
                if n == current:
                    continue
                out.append(m.group(1) + str(n) + m.group(3))
            return out
    if probe_pages > 0:
        sep = "&" if "?" in url else "?"
        out.extend(f"{url}{sep}page={n}" for n in range(2, probe_pages + 2))
    return out
