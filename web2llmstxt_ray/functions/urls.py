"""URL canonicalization, host handling and the crawl priority scorer.

Reference semantics (cited for parity, code written from scratch):
- canonicalization: ``crawler/web_crawler.py:371-395`` and the pyc
  ``_normalize_url`` (lines 47-69) — lowercase netloc, strip trailing
  slash, drop fragment, drop tracking params keeping everything else.
- priority scorer: pyc ``_score_url_importance`` lines 147-167 — the
  conformance-critical priority function reproduced verbatim (SURVEY §2.3).
- domain variants / filter: ``crawler/web_crawler.py:711-758``.
- domain-from-url: ``llmsgen/utils/text_utils.py:106-135``.

The canonical URL is THE key of the URL-seen filter and every dedup
shuffle; ``shard_of``/``host_bucket_of`` define the engine's two
partitioning keys (SURVEY §7.3).
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

import numpy as np

# Tracking params dropped during canonicalization
# (crawler/web_crawler.py:380-385; pyc _normalize_url frozenset).
TRACKING_PARAMS = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "gclid", "fbclid", "gclsrc", "_ga", "_gl", "mc_cid", "mc_eid",
        "ref", "referrer", "source",
    }
)


def canonicalize_url(url: str) -> str:
    """Normalize a URL so duplicates collapse to one key.

    Mirrors ``crawler/web_crawler.py:371-395``: lowercase scheme+netloc,
    strip the trailing slash from the path (keeping bare ``/``), drop the
    fragment, drop tracking query params (any ``utm_*`` plus the fixed
    set) while preserving the remaining params in first-seen order.
    """
    parsed = urlparse(url)
    path = parsed.path.rstrip("/") or "/"
    kept = [
        (k, v)
        for k, v in parse_qsl(parsed.query, keep_blank_values=False)
        if k.lower() not in TRACKING_PARAMS and not k.lower().startswith("utm_")
    ]
    return urlunparse(
        (
            parsed.scheme.lower(),
            parsed.netloc.lower(),
            path,
            parsed.params,
            urlencode(kept),
            "",
        )
    )


def host_of(url: str) -> str:
    """Lowercased netloc of a URL ('' when unparsable)."""
    try:
        return urlparse(url).netloc.lower()
    except ValueError:
        return ""


def domain_variants(url: str) -> set[str]:
    """www / non-www / apex host variants for same-site filtering
    (``crawler/web_crawler.py:711-758``)."""
    host = host_of(url)
    if not host:
        return set()
    variants = {host}
    if host.startswith("www."):
        variants.add(host[4:])
    else:
        variants.add("www." + host)
    return variants


def same_domain(url: str, base_url: str) -> bool:
    """True when ``url``'s host is a variant of ``base_url``'s host
    (``crawler/web_crawler.py:740-758``: exact or dot-suffix match)."""
    host = host_of(url)
    if not host:
        return False
    for v in domain_variants(base_url):
        if host == v or host.endswith("." + v):
            return True
    return False


def extract_domain_from_url(url: str) -> str:
    """Filename-safe domain for display / output naming.

    Mirrors ``llmsgen/utils/text_utils.py:106-135``: scheme-less inputs
    get ``http://`` prepended, ``www.`` stripped, dot-less results map to
    ``unknown_domain``, remaining chars sanitized to ``[\\w\\-_.]``.
    """
    try:
        if not url:
            return "unknown_domain"
        to_parse = url if "://" in url else "http://" + url
        netloc = urlparse(to_parse).netloc.replace("www.", "")
        if not netloc or "." not in netloc:
            return "unknown_domain"
        return re.sub(r"[^\w\-_.]", "_", netloc)
    except ValueError:
        return "unknown_domain"


# ---------------------------------------------------------------------------
# Priority scorer — pyc `_score_url_importance` lines 147-167, reproduced
# verbatim (SURVEY §2.3 reconstruction). This function defines the wave
# sort key, so it must match the reference bit-for-bit.
# ---------------------------------------------------------------------------

ASSET_SUFFIXES = (
    ".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico", ".css", ".js",
    ".pdf", ".zip", ".xml", ".txt",
)

HIGH_VALUE_KEYWORDS = (
    "agents", "tools", "ai", "automation", "solutions", "features",
    "pricing", "about", "docs", "documentation", "guide", "tutorial",
    "api", "reference", "blog", "article", "news", "support", "help",
    "faq", "getting-started", "overview", "mcp", "model", "claude",
)

MEDIUM_VALUE_KEYWORDS = (
    "product", "service", "resources", "download", "install", "setup",
    "config", "examples", "changelog", "contact", "team",
)

LOW_VALUE_KEYWORDS = (
    "login", "signup", "register", "cart", "checkout", "account",
    "profile", "admin", "search", "tag", "category", "author", "icon",
    "favicon", "apple-touch", "manifest", "robots",
)


def score_url(url: str, base_url: str) -> float:
    """Reference URL-importance score (pyc lines 147-167)."""
    url_lower = url.lower()
    if url_lower.endswith(ASSET_SUFFIXES):
        return 0.0
    score = 1.0
    if any(k in url_lower for k in HIGH_VALUE_KEYWORDS):
        score += 3.0
    elif any(k in url_lower for k in MEDIUM_VALUE_KEYWORDS):
        score += 1.5
    if any(k in url_lower for k in LOW_VALUE_KEYWORDS):
        score -= 5.0
    segs = url.replace(base_url, "").strip("/").split("/")
    if len(segs) <= 1 or (len(segs) == 2 and not segs[1]):
        score += 2.0
    elif len(segs) <= 2:
        score += 1.5
    elif len(segs) > 4:
        score -= 1.0
    if any(len(s) > 3 and s.isalpha() for s in segs):
        score += 1.0
    if "?page=" in url or "&page=" in url or "/page/" in url:
        score -= 3.0
    if "?" in url and len(url.split("?", 1)[1]) > 10:
        score -= 2.0
    return max(0.1, score)


# Precompiled alternations for the vectorized scorer. Plain-substring
# semantics (`k in url`), so no word boundaries; re.escape guards the
# dash in "getting-started" etc.
_HIGH_RE = re.compile("|".join(re.escape(k) for k in HIGH_VALUE_KEYWORDS))
_MED_RE = re.compile("|".join(re.escape(k) for k in MEDIUM_VALUE_KEYWORDS))
_LOW_RE = re.compile("|".join(re.escape(k) for k in LOW_VALUE_KEYWORDS))
_ASSET_RE = re.compile("(?:" + "|".join(re.escape(s) for s in ASSET_SUFFIXES) + ")$")
_PAGE_RE = re.compile(r"\?page=|&page=|/page/")


def score_urls(urls: np.ndarray | list[str], base_url: str) -> np.ndarray:
    """Vectorized batch scorer — identical output to ``score_url`` per
    element (property-tested), used inside ``map_batches``.

    The keyword probes are precompiled regex alternations; the segment
    logic stays a tight Python loop over the (short) split results, which
    profiles faster than object-dtype pandas ops for typical URL lengths.
    """
    out = np.empty(len(urls), dtype=np.float64)
    base = base_url
    high, med, low = _HIGH_RE.search, _MED_RE.search, _LOW_RE.search
    asset, pagey = _ASSET_RE.search, _PAGE_RE.search
    for i, url in enumerate(urls):
        u = url.lower()
        if asset(u):
            out[i] = 0.0
            continue
        score = 1.0
        if high(u):
            score += 3.0
        elif med(u):
            score += 1.5
        if low(u):
            score -= 5.0
        segs = url.replace(base, "").strip("/").split("/")
        n = len(segs)
        if n <= 1 or (n == 2 and not segs[1]):
            score += 2.0
        elif n <= 2:
            score += 1.5
        elif n > 4:
            score -= 1.0
        if any(len(s) > 3 and s.isalpha() for s in segs):
            score += 1.0
        if pagey(url):
            score -= 3.0
        q = url.find("?")
        if q >= 0 and len(url) - q - 1 > 10:
            score -= 2.0
        out[i] = score if score > 0.1 else 0.1
    return out


def make_keyword_scorer(keywords: tuple[str, ...], weight: float = 1.0):
    """Alternative priority function mirroring the best-first path's
    ``KeywordRelevanceScorer(enhanced_keywords, weight=1.0)``
    (``crawler/web_crawler.py:234-280``): score = weight × fraction of
    keywords present in the lowercased URL. Returned callable has the
    same (urls, base_url) → ndarray signature as :func:`score_urls`, so
    it plugs into the crawler/oracle as a drop-in scorer (SURVEY §2.12
    extension surface)."""
    kws = tuple(k.lower() for k in keywords)
    n = max(1, len(kws))

    def scorer(urls, base_url: str) -> np.ndarray:
        out = np.empty(len(urls), dtype=np.float64)
        for i, url in enumerate(urls):
            u = url.lower()
            out[i] = weight * sum(k in u for k in kws) / n
        return out

    scorer.__name__ = f"keyword_scorer_{weight}"
    return scorer


# ---------------------------------------------------------------------------
# Partitioning keys (SURVEY §7.3)
# ---------------------------------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3

# 64-bit odd mixing constant (golden-ratio) for order-sensitive hash
# combination (shingles, n-grams, band folds). Canonical home here so
# ops.textstats / ops.scrub / ops.dedup can all import it MODULE-LEVEL
# without cycles — call-time package imports break inside Ray workers
# under the pickle-by-value contract (no repo on the worker path).
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash64(s: str) -> int:
    """Stable 64-bit FNV-1a hash (process- and run-independent, unlike
    ``hash()``); used for seen-filter sharding and host buckets."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8", "surrogatepass"):
        h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64_batch(strings) -> np.ndarray:
    """Vectorized FNV-1a over a batch — bit-identical to ``hash64`` per
    element (property-tested). Accepts a list of str OR an Arrow
    string Array/ChunkedArray (no-copy fast path: hot callers tokenize
    with ``pyarrow.compute`` and hand the flat token array straight in).

    Encoding and flattening go through Arrow (one C-side UTF-8 encode of
    the whole batch, zero-copy flat buffer + offsets) instead of a
    Python per-string encode/frombuffer loop; rows are then length-sorted
    so the position-wise FNV walk updates a shrinking CONTIGUOUS prefix
    (slice, not boolean fancy-index) — ~6× faster than the per-string
    setup this replaces (it dominated the fused extract suite's profile).
    """
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    import pyarrow as _pa

    try:
        if isinstance(strings, _pa.ChunkedArray):
            arr = strings.combine_chunks()
        elif isinstance(strings, _pa.Array):
            arr = strings
        else:
            arr = _pa.array(strings, _pa.string())
        if arr.null_count:
            raise ValueError("nulls")
        if n >= 1024:
            # token streams are Zipfian: dictionary-encode (C-side) and
            # hash only the DISTINCT strings, then gather — measured
            # ~28x on the fused suite's word stream (3.8M words, ~60k
            # distinct), bit-identical output. Near-distinct inputs
            # (URLs) skip the gather and fall through at the cost of
            # one cheap encode probe.
            import pyarrow.compute as _pc

            d = _pc.dictionary_encode(arr)
            uniq = d.dictionary
            if len(uniq) <= (n >> 1):
                hu = hash64_batch(uniq)
                return hu[d.indices.to_numpy(zero_copy_only=False)]
        # honour a sliced array's logical window: read the offsets
        # starting at arr.offset (downstream indexes the data buffer
        # via offsets[0]/offsets[-1], so no buffer rebase is needed).
        # large_string (64-bit offsets — what list_flatten of a
        # split_whitespace column yields) differs only in offset width.
        _odt = (np.int64 if _pa.types.is_large_string(arr.type)
                else np.int32)
        offsets = np.frombuffer(
            arr.buffers()[1], dtype=_odt,
            count=n + 1 + arr.offset)[arr.offset:].astype(np.int64)
        data_buf = arr.buffers()[2]
        flat = (np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None else np.empty(0, np.uint8))
    except Exception:  # lone surrogates, >2GB offsets, nulls
        # exotic inputs: slow exact path
        if not isinstance(strings, list):
            strings = (strings.to_pylist()
                       if hasattr(strings, "to_pylist") else list(strings))
        encoded = [s.encode("utf-8", "surrogatepass") for s in strings]
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(b) for b in encoded], out=offsets[1:])
        flat = (np.frombuffer(b"".join(encoded), dtype=np.uint8)
                if offsets[-1] else np.empty(0, np.uint8))

    lens = np.diff(offsets)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, np.uint64(_FNV_OFFSET), dtype=np.uint64)
    # padded byte matrix built in one scatter: the flat buffer in row
    # order IS the True-cell order of the (col < len) mask
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    mask = np.arange(maxlen) < lens[:, None]
    mat[mask] = flat[offsets[0]:offsets[-1]]
    # longest-first order → live rows at each position are a prefix
    order = np.argsort(-lens, kind="stable")
    mat = mat[order]
    lens_sorted = lens[order]
    # live count per position: n minus how many rows ended at or before it
    ended = np.bincount(np.minimum(lens_sorted, maxlen), minlength=maxlen + 1)
    live_at = n - np.cumsum(ended)[:maxlen]  # live_at[p] = #rows with len > p
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    for pos in range(maxlen):
        k = live_at[pos]
        if k == 0:
            break
        h[:k] = (h[:k] ^ mat[:k, pos]) * prime   # uint64 wraps mod 2^64
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def shard_of(canonical_url: str, num_shards: int) -> int:
    """Owner shard of a canonical URL — single owner per URL means no
    duplicate fetches across the cluster (SURVEY D1-D2/J3)."""
    return hash64(canonical_url) % num_shards


def host_bucket_of(host: str, num_buckets: int) -> int:
    """Host bucket for fetch scheduling / politeness locality."""
    return hash64(host) % num_buckets
