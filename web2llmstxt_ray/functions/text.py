"""Scalar text-function library (SURVEY §2.4 M8-M19, §2.10).

Each function reimplements the semantics of a reference function (cited
``file:line`` into ``/root/reference``) from scratch. The llmsgen-tree
variants are the conformance targets (they are what the reference's own
tests exercise, ``tests/test_text_utils.py:10-48``).

All functions are pure and deterministic; they run inside
``map_batches`` bodies over Arrow string columns (applied per value —
these are short-string ops where Python-level dispatch is fine; the hot
bulk paths live in ``stages``/``ops`` and stay vectorized).
"""

from __future__ import annotations

import hashlib
import re

from .urls import extract_domain_from_url

# --- M19: page-separator removal (llmsgen/utils/text_utils.py:8-28) ---

_PAGE_SEP_RE = re.compile(r"<\|crawl4ai-page-\d+-lllmstxt\|>\n")
_HTML_COMMENT_RE = re.compile(r"<!-- .* -->\n")
_HR_RE = re.compile(r"\n---\n\n")
_MULTI_NL_RE = re.compile(r"\n{3,}")


def remove_page_separators(text: str) -> str:
    """Strip crawl pagination tokens, HTML comments, markdown HRs and
    collapse 3+ newlines (llmsgen/utils/text_utils.py:8-14)."""
    text = _PAGE_SEP_RE.sub("", text)
    text = _HTML_COMMENT_RE.sub("", text)
    text = _HR_RE.sub("\n\n", text)
    text = _MULTI_NL_RE.sub("\n\n", text)
    return text.strip()


def limit_pages_in_full_text(full_text: str, max_pages: int) -> str:
    """Keep at most ``max_pages`` page blocks in a pre-rendered full text
    (llmsgen/utils/text_utils.py:17-28)."""
    parts = full_text.split("<|crawl4ai-page-")
    if len(parts) <= 1:
        return full_text
    return parts[0] + "".join("<|crawl4ai-page-" + p for p in parts[1 : max_pages + 1])


# --- M9: title cleaning (llmsgen/utils/text_utils.py:30-46) ---

_ENTITY_RE = re.compile(r"&[a-zA-Z0-9#]+;")
_TAG_RE = re.compile(r"<[^>]+>")
_TITLE_SUFFIX_RE = re.compile(r"\s*[-|–—]\s*[^-|–—]+$")


def clean_title(title: str) -> str:
    """Normalize a page title: drop HTML entities/tags, strip the
    site-name suffix after the last ``- | – —`` separator, collapse
    whitespace, title-case all-lower/all-upper strings; empty →
    ``Untitled Page`` (llmsgen/utils/text_utils.py:30-46)."""
    if not title:
        return "Untitled Page"
    t = _ENTITY_RE.sub(" ", str(title))
    t = _TAG_RE.sub("", t)
    t = _TITLE_SUFFIX_RE.sub("", t)
    t = " ".join(t.split())
    if t and (t.islower() or t.isupper()):
        t = t.title()
    t = t.strip()
    return t if t else "Untitled Page"


# --- M8: title extraction with fallbacks (crawler/web_crawler.py:397-424,
#     pyc _extract_title_v6 80-100) ---

_H1_RE = re.compile(r"^#\s+(.+)")


def extract_title(meta_title: str | None, markdown: str | None, url: str) -> str:
    """metadata title → markdown H1 → URL slug → ``Untitled Page``."""
    if meta_title:
        t = meta_title.strip()
        if t and t.lower() not in ("untitled", ""):
            return clean_title(t)
    if markdown:
        m = _H1_RE.search(markdown.strip())
        if m and m.group(1).strip():
            return clean_title(m.group(1).strip())
    if url:
        slug = url.rstrip("/").rsplit("/", 1)[-1]
        if slug:
            t = slug.replace("-", " ").replace("_", " ").title()
            if len(t) > 3:
                return clean_title(t)
    return "Untitled Page"


# --- M10/M11: content cleaning + UI scrub
#     (llmsgen/utils/text_utils.py:48-62) ---

_WS_RE = re.compile(r"\s+")
_UI_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"\b(?:click here|read more|learn more|sign up|log in|subscribe|search|filter|sort by|view all)\b",
        r"\b(?:menu|navigation|nav|header|footer|sidebar|skip to|go to|back to|return to)\b",
        r"\b(?:cookie(?:s)?\s+(?:policy|notice|consent)|privacy\s+policy|terms\s+(?:of\s+)?(?:service|use))\b",
        r"\bcopyright\s*(?:©|&copy;)?\s*\d{4}\b",
        r"\ball\s+rights\s+reserved\b",
        r"\bfollow\s+us\s+on\b",
    )
]


def clean_content_text(content: str) -> str:
    """Whitespace-collapse then scrub common UI/navigation phrases
    (llmsgen/utils/text_utils.py:48-62)."""
    if not content:
        return ""
    content = _WS_RE.sub(" ", content)
    for pat in _UI_PATTERNS:
        content = pat.sub("", content)
    return content.strip()


# --- M12: navigation-text classifier, keyword-DENSITY variant
#     (llmsgen/utils/text_utils.py:64-76; tested by the reference at
#     tests/test_text_utils.py:40-48) ---

NAV_INDICATORS = (
    "click here", "read more", "learn more", "sign up", "log in",
    "subscribe", "newsletter", "follow us", "social media", "cookie",
    "privacy policy", "terms of service", "copyright",
    "all rights reserved", "menu", "navigation", "back to top",
    "skip to content", "search", "filter", "sort by",
)


def is_navigation_text(text: str, threshold_ratio: float = 0.3) -> bool:
    """True when nav-indicator hits per word exceed the threshold."""
    lower = text.lower()
    hits = sum(1 for ind in NAV_INDICATORS if ind in lower)
    words = len(text.split())
    if words == 0:
        return False
    return (hits / words) > threshold_ratio


# --- M13: good-sentence filter (llmsgen/utils/text_utils.py:78-92) ---

_MEANINGFUL_WORDS = (
    "is", "are", "was", "were", "has", "have", "can", "will",
    "provides", "offers", "describes",
)


def is_good_sentence(sentence: str, min_len: int = 15, max_len: int = 200,
                     alphanum_ratio: float = 0.7) -> bool:
    """Length in [min,max], not nav-dense, ≥70% alnum/space chars, and a
    verb-ish word when short (llmsgen/utils/text_utils.py:78-92)."""
    s = sentence.strip()
    if not (min_len <= len(s) <= max_len):
        return False
    if is_navigation_text(s, threshold_ratio=0.5):
        return False
    alnum = sum(1 for c in s if c.isalnum() or c.isspace())
    if len(s) > 0 and alnum / len(s) < alphanum_ratio:
        return False
    if len(s.split()) < 5 and not any(w in s.lower() for w in _MEANINGFUL_WORDS):
        return False
    return True


# --- M15: sentence cleanup (llmsgen/utils/text_utils.py:94-103) ---

_TRAIL_PUNCT_RE = re.compile(r"[.!?]{2,}$")


def clean_sentence(sentence: str) -> str:
    """Whitespace-normalize, collapse trailing punctuation runs,
    capitalize, ensure terminal punctuation."""
    if not sentence:
        return ""
    s = " ".join(sentence.strip().split())
    s = _TRAIL_PUNCT_RE.sub(".", s)
    if s and s[0].islower():
        s = s[0].upper() + s[1:]
    if s and not s.endswith((".", "!", "?")):
        s += "."
    return s


# --- M16: hallucination detector (llmsgen/utils/text_utils.py:138-167) ---

HALLUCINATION_INDICATORS = (
    "game character", "tasks a-j", "proof by contradiction",
    "tree of thought", "let's say we have", "consider each of these tasks",
    "shortest path", "deploy tool a", "tool b", "tool c",
    "character can only work", "proof by exhaustion",
    "direct proof and inductive logic",
)

_STOPWORDS_SMALL = frozenset(
    "the and or but in on at to for of with by a an is are was were this that".split()
)


def detect_hallucination(description: str, title: str, content_sample: str) -> bool:
    """Indicator-phrase blacklist + low title/content word-overlap
    (<0.1 / <0.05) → hallucinated (llmsgen/utils/text_utils.py:138-167)."""
    desc_lower = description.lower()
    if any(ind in desc_lower for ind in HALLUCINATION_INDICATORS):
        return True
    desc_words = set(desc_lower.split()) - _STOPWORDS_SMALL
    title_words = set(title.lower().split()) - _STOPWORDS_SMALL
    content_words = set(content_sample[:500].lower().split()) - _STOPWORDS_SMALL
    title_overlap = len(desc_words & title_words) / len(title_words) if title_words else 0
    content_overlap = len(desc_words & content_words) / len(content_words) if content_words else 0
    return title_overlap < 0.1 and content_overlap < 0.05


# --- M14: key-sentence extraction (llmsgen/utils/text_utils.py:169-198) ---

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def extract_key_sentences(title: str, content: str, num_sentences: int = 3,
                          max_chars_per_sentence: int = 150) -> str:
    """Paragraph-first sentence harvesting, then bullet-list items, then
    the content-type fallback (llmsgen/utils/text_utils.py:169-198)."""
    cleaned = clean_content_text(content)
    if not cleaned or len(cleaned.strip()) < 50:
        return clean_title(title) if title else "Website content summary."

    picked: list[str] = []
    paragraphs = [p.strip() for p in cleaned.split("\n\n") if p.strip()]
    for para in paragraphs[:5]:
        if len(picked) >= num_sentences:
            break
        for sent in _SENT_SPLIT_RE.split(para)[:2]:
            if is_good_sentence(sent, max_len=max_chars_per_sentence):
                picked.append(clean_sentence(sent))
                if len(picked) >= num_sentences:
                    break

    if len(picked) < num_sentences:
        item_re = re.compile(
            r"(?:^|\n)[-*•]\s*([^\n]{20," + str(max_chars_per_sentence) + r"})",
            re.MULTILINE,
        )
        for item in item_re.findall(cleaned):
            if len(picked) >= num_sentences:
                break
            if is_good_sentence(item, max_len=max_chars_per_sentence):
                picked.append(clean_sentence(item))

    if picked:
        return " ".join(picked)
    return create_initial_content_description(title, content)


# --- M17: content-type fallback descriptions
#     (llmsgen/utils/text_utils.py:201-221) — the deterministic
#     description oracle used by the reference's golden fixture
#     (output/example.com-llms.txt:9). ---

def create_initial_content_description(title: str, content_sample: str) -> str:
    """Keyword-sniff the first 1000 chars → templated description."""
    lower = content_sample[:1000].lower()
    ct = clean_title(title)
    if "api" in lower and ("documentation" in lower or "docs" in lower):
        return f"API documentation for {ct}."
    if "tutorial" in lower or "guide" in lower:
        return f"Tutorial and guide for {ct}."
    if "pricing" in lower or "plans" in lower:
        return f"Pricing information for {ct}."
    if "features" in lower or "capabilities" in lower:
        return f"Features and capabilities of {ct}."
    if "blog" in lower or "news" in lower or "article" in lower:
        return f"Blog post or article about {ct}."
    if "about" in lower or "company" in lower:
        return f"Information about {ct}."
    return f"Content related to {ct}."


def create_smart_fallback_description(title: str, content_sample: str, url: str) -> str:
    """Fallback description + domain attribution
    (llmsgen/utils/text_utils.py:214-221). This is the deterministic
    path the reference's test variant always takes (pyc
    ``generate_description_with_fallbacks``: "FOR TESTING: Always uses
    fallback description logic")."""
    domain = extract_domain_from_url(url)
    base = create_initial_content_description(title, content_sample)
    if domain != "unknown_domain" and domain not in base.lower():
        return f"{base} From {domain}."
    return base


# --- §2.10 misc scalar fns ---

STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to
    was were will with this these those they them their there then than or but
    not no nor so if while about into through during before after above below
    up down out off over under again further once here when where why how all
    any both each few more most other some such only own same too very can
    just should now""".split()
)


def truncate_text(text: str, max_length: int = 500) -> str:
    """Truncate at a word boundary with ellipsis
    (utils/text_utils.py:144-152)."""
    if len(text) <= max_length:
        return text
    cut = text[:max_length].rsplit(" ", 1)[0]
    return cut + "..."


_WORD_RE = re.compile(r"[a-z0-9']+")


def extract_words(text: str, min_length: int = 3) -> list[str]:
    """Lowercased content words, stopwords removed
    (utils/text_utils.py:155-178)."""
    return [
        w for w in _WORD_RE.findall(text.lower())
        if len(w) >= min_length and w not in STOPWORDS
    ]


def text_similarity(a: str, b: str) -> float:
    """Jaccard similarity over content-word sets
    (utils/text_utils.py:181-194)."""
    wa, wb = set(extract_words(a)), set(extract_words(b))
    if not wa or not wb:
        return 0.0
    return len(wa & wb) / len(wa | wb)


def content_hash(title: str, content: str) -> str:
    """Description-cache key: md5 of ``title|||content[:1000]``
    (models/client.py:68-71)."""
    return hashlib.md5(f"{title}|||{content[:1000]}".encode("utf-8", "surrogatepass")).hexdigest()


def word_count(text: str) -> int:
    """Whitespace word count — the acceptance-filter metric
    (crawler/web_crawler.py:286,1141; pyc line 237)."""
    return len(text.split())
