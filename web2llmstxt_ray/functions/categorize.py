"""llms.txt section assignment + site-level summaries (SURVEY A4-A6).

Reference semantics: ``llmsgen/utils/text_utils.py:224-302`` — fixed
seven-section ordering, first-match-wins keyword rules over
url/title/content-sample; site name from the main page's cleaned title;
site summary keyword-sniffed from the first pages' content. Written from
scratch as pure functions usable inside ``map_batches`` (category
assignment is per-row; summaries are small driver-side reductions).
"""

from __future__ import annotations

from .text import clean_title
from .urls import extract_domain_from_url

# Fixed section order (llmsgen/utils/text_utils.py:270-274); empty
# sections are dropped at render time.
CATEGORY_ORDER = (
    "Key Documentation",
    "API & Technical Reference",
    "Products & Services",
    "Guides & Tutorials",
    "Blog & Resources",
    "General Information",
    "Other Pages",
)

# First-match-wins rules, in the reference's elif order
# (llmsgen/utils/text_utils.py:277-295). NOTE the check order differs
# from the section display order above — API is tested first.
_RULES: tuple[tuple[str, tuple[str, ...], bool], ...] = (
    # (category, keywords, also-check-content-sample)
    ("API & Technical Reference", ("/api", "/reference", "api docs", "developer."), True),
    ("Key Documentation", ("/docs", "/documentation", "readme", "manual"), True),
    ("Guides & Tutorials", ("/guide", "/tutorial", "how-to", "learn", "getting-started"), True),
    ("Products & Services", ("/product", "/service", "/feature", "pricing", "plans", "tool"), True),
    ("Blog & Resources", ("/blog", "/news", "/article", "/resource"), True),
    ("General Information", ("about", "contact", "company", "team", "mission"), False),
)

_OTHER_URL_HINTS = ("?page=", "/page/", "/compare", "/vs", "tag/", "category/")


def categorize_entry(url: str, title: str, content_sample: str) -> str:
    """Section for one llms.txt entry (llmsgen/utils/text_utils.py:277-299)."""
    url_l = (url or "").lower()
    title_l = (title or "").lower()
    content_l = (content_sample or "")[:300].lower()
    for category, keywords, use_content in _RULES:
        haystacks = (url_l, title_l, content_l) if use_content else (url_l, title_l)
        if any(k in h for k in keywords for h in haystacks):
            return category
    if any(k in url_l for k in _OTHER_URL_HINTS):
        return "Other Pages"
    return "General Information"


def site_name(base_url: str, main_page_title: str | None) -> str:
    """H1 site name: main page's cleaned title, else title-cased domain
    (llmsgen/utils/text_utils.py:224-235)."""
    if main_page_title:
        t = clean_title(main_page_title)
        if t and len(t) > 3:
            return t
    domain = extract_domain_from_url(base_url)
    return domain.replace("_", " ").title() if domain != "unknown_domain" else "Website"


_SUMMARY_RULES: tuple[tuple[tuple[str, ...], str], ...] = (
    (("api", "documentation", "docs", "developer", "reference"),
     "Software documentation, API references, and developer resources."),
    (("pricing", "plans", "subscription", "buy", "purchase", "checkout"),
     "Information on products, services, and pricing plans."),
    (("blog", "article", "news", "post", "insights"),
     "A collection of articles, blog posts, and news updates."),
    (("tutorial", "guide", "how to", "learn", "course"),
     "Educational content, tutorials, and learning materials."),
    (("product", "service", "solution", "tool", "feature"),
     "Details about products, services, and their features."),
    (("about us", "company", "mission", "team"),
     "Information about the company, its mission, and team."),
)

_DEFAULT_SUMMARY = "A comprehensive website offering information and resources on various topics."


def site_summary(content_samples: list[str]) -> str:
    """Blockquote summary keyword-sniffed from the first pages' first 500
    chars (llmsgen/utils/text_utils.py:238-262). ``content_samples`` are
    the first N pages' content strings (the caller applies the N=5 limit
    via ``ds.limit``)."""
    if not content_samples:
        return "A website with various content and resources."
    joined = " ".join((c or "")[:500].lower() for c in content_samples)
    if not joined.strip():
        return "A website with various content and resources."
    for keywords, summary in _SUMMARY_RULES:
        if any(k in joined for k in keywords):
            return summary
    return _DEFAULT_SUMMARY
