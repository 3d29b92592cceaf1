"""Sequential conformance oracle for the BFS-with-priority crawl.

A direct, single-threaded implementation of the reference's crawl loop
(pyc ``discover_all_links_first``, source lines 169-249 — fully
reconstructed in SURVEY §2.3) with the engine's deterministic total
order ``(-score, canonical_url)`` substituted for the reference's
hash-seed-dependent set-iteration tie-break (SURVEY §7.4.2).

The distributed crawler (``pipelines/crawl.py``) must produce EXACTLY
this oracle's visit order, final URL-seen set, accepted page records and
span documents on any synthetic site. The oracle shares the *leaf*
semantics (scorer, canonicalizer, link extractor, span extractor,
admission rules) with the engine and reimplements the *loop* ­—
sequentially — so the tests exercise the distribution, scheduling and
state management, which is what can actually diverge.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.links import extract_links
from ..functions.text import extract_title
from ..functions.urls import canonicalize_url, same_domain, score_urls
from ..stages.spans import extract_spans

MIN_WORDS = 50  # acceptance filter (crawler/web_crawler.py:1141; pyc line 237)
MAIN_PAGE_SCORE = 10.0  # pyc line ~171


def admit_links(links: list[str], base_url: str,
                disallow_by_host: dict[str, list[str]] | None) -> list[str]:
    """Admission rules applied to freshly-discovered links before they
    enter the frontier: same-domain (M5), robots-disallow prefix filter
    (the engine's politeness extension — the oracle applies the same
    rule so conformance holds). Links arrive already canonicalized from
    ``extract_links``."""
    out = []
    for url in links:
        if not same_domain(url, base_url):
            continue
        if disallow_by_host:
            host = url.split("//", 1)[-1].split("/", 1)[0].lower()
            path = "/" + url.split("//", 1)[-1].split("/", 1)[-1] if "/" in url.split("//", 1)[-1] else "/"
            rules = disallow_by_host.get(host)
            if rules and any(path.startswith(p) for p in rules):
                continue
        out.append(url)
    return out


@dataclass
class OracleResult:
    visit_order: list[str] = field(default_factory=list)   # accepted pages in order
    seen: set[str] = field(default_factory=set)            # every URL fetch-attempted
    pages: list[dict] = field(default_factory=list)        # accepted page records
    span_docs: dict[str, list[dict]] = field(default_factory=dict)
    fetch_attempts: int = 0


def crawl_oracle(
    site_index: dict[str, dict],
    base_url: str,
    max_pages: int = 25,
    comprehensive: bool = False,
    safety_limit: int | None = None,
    disallow_by_host: dict[str, list[str]] | None = None,
    score_fn=None,
) -> OracleResult:
    """Sequential reference crawl (SURVEY §2.3 pseudocode, verbatim).

    ``site_index`` is the ``url → page`` dict from ``synth.site_index``.
    Returns the golden artifacts the distributed engine is compared
    against.
    """
    res = OracleResult()
    score_fn = score_fn or score_urls
    depth_limit = 5 if comprehensive else 3                  # pyc line 208
    safety = safety_limit or max_pages * (10 if comprehensive else 5)  # line 209
    threshold = 0.0 if comprehensive else 1.0                # line 218

    def fetch(url: str) -> dict | None:
        res.fetch_attempts += 1
        page = site_index.get(url)
        if page is None or page["status"] != 200:
            return None
        content = page["markdown"] or page["html"] or ""
        return {
            "url": url,
            "title": extract_title(page["title_meta"], page["markdown"], url),
            "content": content,
            "html": page["html"] or "",
            "word_count": len(content.split()),
        }

    # 1. main page (depth 0, score 10.0)
    main_url = canonicalize_url(base_url)
    res.seen.add(main_url)
    main = fetch(main_url)
    discovered: set[str] = set()
    if main is not None:
        res.visit_order.append(main_url)
        res.pages.append({**main, "score": MAIN_PAGE_SCORE, "depth": 0,
                          "discovery_phase": "main_page",
                          "visit_index": len(res.pages)})
        res.span_docs[main_url] = extract_spans(main["content"])
        discovered.update(admit_links(
            extract_links(main_url, main["html"], main["content"], base_url),
            base_url, disallow_by_host))

    # 2. waves
    for depth in range(1, depth_limit + 1):                  # line 211
        if len(res.pages) >= safety:                         # line 212
            break
        uncrawled = [u for u in discovered if u not in res.seen]  # line 215
        scores = score_fn(uncrawled, base_url)
        scored = sorted(
            ((u, s) for u, s in zip(uncrawled, scores) if s > threshold),
            key=lambda x: (-x[1], x[0]),                     # total order
        )
        wave = scored if comprehensive else scored[: safety - len(res.pages)]  # line 220
        if not wave:                                         # line 221
            break
        new_links: set[str] = set()                          # line 224
        for link, score in wave:                             # line 226
            if len(res.pages) >= safety:                     # line 227
                break
            if link in res.seen:                             # line 228
                continue
            result = fetch(link)
            res.seen.add(link)                               # lines 232-233
            if result is not None and result["word_count"] >= MIN_WORDS:  # line 237
                res.visit_order.append(link)
                res.pages.append({**result, "score": score, "depth": depth,
                                  "discovery_phase": f"depth_{depth}",
                                  "visit_index": len(res.pages)})
                res.span_docs[link] = extract_spans(result["content"])
                if depth < depth_limit:                      # lines 239-240
                    new_links.update(admit_links(
                        extract_links(link, result["html"], result["content"], base_url),
                        base_url, disallow_by_host))
        discovered |= new_links                              # line 245
    return res
