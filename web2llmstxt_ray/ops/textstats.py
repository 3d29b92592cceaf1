"""Text analysis operators: token counts, quality scoring, language ID,
fingerprinting.

Definitions are chosen to be *exactly* mirrorable in ANSI SQL (the
driver's DuckDB oracle) where possible: whitespace-run tokenization,
fixed punctuation set, fixed stopword list, md5 of a canonical
whitespace-collapsed form. The n-gram language detector and the rolling
(Rabin-Karp) fingerprint are not SQL-expressible; they're covered by
unit tests instead.

All stages are ``map_batches`` with precompiled regex state per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as _pc
import ray.data

from ..functions.urls import _SHINGLE_MIX, hash64, hash64_batch

_WS_RE = re.compile(r"\s+")
PUNCT_SET = ".,!?;:"
STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def tokenize_ws(text: str) -> list[str]:
    """Whitespace-run tokenization (SQL: string_split_regex(trim(x),'\\s+'))."""
    t = text.strip()
    return _WS_RE.split(t) if t else []

# BPE-ish subword pre-tokenizer: word pieces / numbers / punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def tokenize_bpeish(text: str) -> list[str]:
    return _BPE_RE.findall(text)


class TokenCounter:
    """(doc_id, n_tokens, n_subtokens) per document."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_tokens": pa.array([len(tokenize_ws(t or "")) for t in texts],
                                 pa.int64()),
            "n_subtokens": pa.array([len(tokenize_bpeish(t or "")) for t in texts],
                                    pa.int64()),
        })


class QualityScorer:
    """Per-doc quality signals (SQL-mirrorable definitions):

    - ``n_chars``: length(text)
    - ``n_words``: whitespace tokens
    - ``punct_ratio``: chars in ``.,!?;:`` / n_chars (0 when empty)
    - ``stop_ratio``: lowercased tokens in the fixed EN stopword list
      / n_words (0 when empty)
    - ``mean_word_len``: (n_chars_of_words / n_words)
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 ndigits: int = 6):
        self.text_col, self.id_col = text_col, id_col
        self.nd = ndigits
        self.stop = frozenset(STOPWORDS_EN)
        self.punct = frozenset(PUNCT_SET)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        rows = {"n_chars": [], "n_words": [], "punct_ratio": [],
                "stop_ratio": [], "mean_word_len": []}
        for t in texts:
            t = t or ""
            toks = tokenize_ws(t)
            nw = len(toks)
            nc = len(t)
            rows["n_chars"].append(nc)
            rows["n_words"].append(nw)
            rows["punct_ratio"].append(
                round(sum(c in self.punct for c in t) / nc, self.nd) if nc else 0.0)
            rows["stop_ratio"].append(
                round(sum(w.lower() in self.stop for w in toks) / nw, self.nd)
                if nw else 0.0)
            rows["mean_word_len"].append(
                round(sum(len(w) for w in toks) / nw, self.nd) if nw else 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_chars2": pa.array(rows["n_chars"], pa.int64()),
            "n_words": pa.array(rows["n_words"], pa.int64()),
            "punct_ratio": pa.array(rows["punct_ratio"], pa.float64()),
            "stop_ratio": pa.array(rows["stop_ratio"], pa.float64()),
            "mean_word_len": pa.array(rows["mean_word_len"], pa.float64()),
        })


# ---------------------------------------------------------------------------
# language ID — character n-gram profile heuristic (not SQL-expressible)
# ---------------------------------------------------------------------------

# tiny per-language profiles: distinctive character trigrams + stopwords
_LANG_PROFILES: dict[str, tuple[frozenset, frozenset]] = {
    "en": (frozenset({"the", "and", "ing", "ion", "of ", " th"}),
           frozenset({"the", "and", "of", "is", "with", "this"})),
    "de": (frozenset({"der", "sch", "ein", "ich", "und", "en "}),
           frozenset({"der", "die", "das", "und", "ist", "mit"})),
    "fr": (frozenset({"les", "ion", "ent", "de ", "que", "eau"}),
           frozenset({"les", "des", "est", "que", "avec", "pour"})),
    "es": (frozenset({"ión", "los", "ado", "que", "de ", "la "}),
           frozenset({"los", "las", "que", "con", "para", "una"})),
}


def detect_language(text: str) -> str:
    """n-gram + stopword profile scoring; CJK by codepoint range;
    deterministic tie-break by language code."""
    if not text:
        return "unknown"
    sample = text[:1000]
    cjk = sum(1 for c in sample if "一" <= c <= "鿿")
    if cjk / max(1, len(sample)) > 0.05:
        return "zh"
    lower = sample.lower()
    tokens = set(lower.split())
    best = ("unknown", 0.0)
    for lang in sorted(_LANG_PROFILES):
        tri, stop = _LANG_PROFILES[lang]
        # len(grams(text) ∩ tri) == number of profile trigrams present:
        # probe the ~6 profile grams directly instead of materializing
        # the ~1000-element trigram set per document (profiled hot)
        score = (2.0 * len(tokens & stop)
                 + 1.0 * sum(1 for g in tri if g in lower))
        if score > best[1]:
            best = (lang, score)
    return best[0] if best[1] > 0 else "unknown"


class LanguageId:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "predicted_lang": pa.array(
                detect_language_batch(batch.column(self.text_col)),
                pa.string()),
        })


# ---------------------------------------------------------------------------
# vectorized batch kernels — the fused-annotate hot path
# ---------------------------------------------------------------------------

_STOP_HASH_CACHE: dict = {}


def _stop_hash_table():
    """(sorted distinct stopword hashes, hash→lang membership matrix,
    sorted language list) for the vectorized detector. Built once per
    process from ``_LANG_PROFILES`` so the two detectors cannot drift."""
    got = _STOP_HASH_CACHE.get("t")
    if got is not None:
        return got
    langs = sorted(_LANG_PROFILES)
    by_hash: dict[int, set[int]] = {}
    for li, lang in enumerate(langs):
        for w in _LANG_PROFILES[lang][1]:
            by_hash.setdefault(hash64(w), set()).add(li)
    hashes = np.array(sorted(by_hash), dtype=np.uint64)
    member = np.zeros((len(hashes), len(langs)), dtype=np.float64)
    for i, h in enumerate(hashes):
        for li in by_hash[int(h)]:
            member[i, li] = 1.0
    _STOP_HASH_CACHE["t"] = (hashes, member, langs)
    return _STOP_HASH_CACHE["t"]


def _as_string_array(texts) -> pa.Array:
    pc = _pc
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    elif not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), pa.string())
    return pc.fill_null(texts, "")


def detect_language_batch(texts) -> list[str]:
    """Vectorized :func:`detect_language` over a column — IDENTICAL
    output per element (property-tested).

    ASCII samples (the overwhelming common case) run fully in
    ``pyarrow.compute`` + numpy: one lower+substring-probe pass for the
    trigram scores and one token-hash membership pass for the distinct
    stopword counts (same first-max tie-break over the sorted language
    list). Rows whose first-1000-codepoint sample is NOT pure ASCII are
    recomputed with the scalar detector — Arrow's ``utf8_lower`` uses
    simple case mapping (e.g. İ→i) where Python's ``str.lower`` uses
    full mapping (İ→i̇), so only the ASCII subset is provably
    bit-identical vectorized.
    """
    pc = _pc
    arr = _as_string_array(texts)
    n = len(arr)
    if n == 0:
        return []
    samp = pc.utf8_slice_codeunits(arr, 0, 1000)
    ascii_mask = pc.string_is_ascii(samp).to_numpy(zero_copy_only=False)
    lower = pc.utf8_lower(samp)
    stop_hashes, member, langs = _stop_hash_table()
    scores = np.zeros((n, len(langs)), dtype=np.float64)
    for li, lang in enumerate(langs):
        for g in sorted(_LANG_PROFILES[lang][0]):
            scores[:, li] += pc.match_substring(lower, g) \
                .to_numpy(zero_copy_only=False)
    toks = pc.utf8_split_whitespace(lower)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    if len(flat):
        hw = hash64_batch(flat)
        pos = np.searchsorted(stop_hashes, hw)
        pos_c = np.minimum(pos, len(stop_hashes) - 1)
        hit = stop_hashes[pos_c] == hw
        doc_of = np.repeat(np.arange(n), lens)
        # DISTINCT stopwords present per doc: presence matrix, then one
        # matmul against the hash→language membership matrix
        pres = np.zeros((n, len(stop_hashes)), dtype=np.float64)
        pres[doc_of[hit], pos_c[hit]] = 1.0
        scores += 2.0 * (pres @ member)
    best = np.argmax(scores, axis=1)           # first max wins = sorted
    vals = scores[np.arange(n), best]          # lang iteration order
    lang_arr = np.array(langs, dtype=object)
    out = np.where(vals > 0, lang_arr[best], "unknown").astype(object)
    if not ascii_mask.all():
        # exotic samples (non-ASCII case mapping, CJK): scalar truth
        py = arr.to_pylist()
        for i in np.flatnonzero(~ascii_mask):
            out[i] = detect_language(py[i] or "")
    return list(out)


def tokenize_lower_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """FNV-64 hashes of each doc's ``text.lower().split()`` tokens in
    one flat array plus per-doc offsets (``len == n_docs + 1``).

    Tokenization runs C-side (``utf8_lower`` + ``utf8_split_whitespace``
    with Arrow's edge empty-tokens dropped — empirically equal to
    Python ``str.split`` for every whitespace class). Case mapping is
    Arrow's simple mapping: for non-ASCII text with exotic casings
    (İ, lone surrogates) token HASHES can differ from a Python
    ``lower()`` pipeline — equal-token semantics still hold within any
    corpus processed by this same kernel, which is the contract the
    dedup/decontamination consumers need.
    """
    pc = _pc
    arr = _as_string_array(texts)
    n = len(arr)
    toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    nonempty = pc.not_equal(flat, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    ends = np.cumsum(lens)
    cum = np.concatenate([[0], np.cumsum(ne_np)])
    counts = cum[ends] - cum[ends - lens]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    if not ne_np.all():
        flat = flat.filter(nonempty)
    hw = hash64_batch(flat) if len(flat) else np.empty(0, np.uint64)
    return hw, offsets


def top_bigram_counts(hw: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc max word-bigram multiplicity from the flat token-hash
    array — the vectorized twin of
    ``max(Counter(zip(toks, toks[1:])).values())`` (equal up to FNV
    collisions, ~1e-19/doc). Docs with <2 tokens report 0.

    One lexsort of (doc, bigram-hash) pairs, run-length encode, then a
    segmented max — no per-doc Python.
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.int64)
    total = len(hw)
    if total < 2 or n_docs == 0:
        return out
    lens = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs), lens)
    bg = hw[:-1] * _SHINGLE_MIX ^ hw[1:]
    valid = doc_of[:-1] == doc_of[1:]
    bg = bg[valid]
    bdoc = doc_of[:-1][valid]
    if len(bg) == 0:
        return out
    order = np.lexsort((bg, bdoc))
    bg_s, bdoc_s = bg[order], bdoc[order]
    new_run = np.empty(len(bg_s), dtype=bool)
    new_run[0] = True
    new_run[1:] = (bg_s[1:] != bg_s[:-1]) | (bdoc_s[1:] != bdoc_s[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, len(bg_s)))
    run_doc = bdoc_s[run_starts]
    doc_starts = np.flatnonzero(
        np.r_[True, run_doc[1:] != run_doc[:-1]])
    out[run_doc[doc_starts]] = np.maximum.reduceat(run_lens, doc_starts)
    return out


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def canonical_fingerprint(text: str) -> str:
    """md5 of the lowercased, whitespace-collapsed text (SQL:
    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))))."""
    canon = _WS_RE.sub(" ", text).lower()
    return hashlib.md5(canon.encode("utf-8", "surrogatepass")).hexdigest()


_RK_BASE = np.uint64(1099511628211)


def rolling_fingerprints(text: str, window: int = 50, stride: int = 25) -> list[int]:
    """Rabin-Karp rolling hashes over character windows — the
    shift-resistant document fingerprint (winnowing-style; not SQL)."""
    data = text.encode("utf-8", "surrogatepass")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    powers = _RK_BASE ** np.arange(window, dtype=np.uint64)  # wraps mod 2^64
    out = []
    for start in range(0, len(arr) - window + 1, stride):
        out.append(int((arr[start:start + window] * powers).sum()))
    return out


class Fingerprinter:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "fingerprint": pa.array(
                [canonical_fingerprint(t or "") for t in texts], pa.string()),
            "rolling_min": pa.array(
                [min(rolling_fingerprints(t or "")) for t in texts],
                pa.uint64()),
        })


# These stages carry only regex/constant state → task-based with
# per-worker memoization (see ops.stagecache), not actor pools.

def token_counts(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage

    return ds.map_batches(cached_stage(TokenCounter, **kw),
                          batch_format="pyarrow", batch_size=None)


def quality_scores(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage

    return ds.map_batches(cached_stage(QualityScorer, **kw),
                          batch_format="pyarrow", batch_size=None)


def language_id(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage

    return ds.map_batches(cached_stage(LanguageId, **kw),
                          batch_format="pyarrow", batch_size=None)


def fingerprints(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage

    return ds.map_batches(cached_stage(Fingerprinter, **kw),
                          batch_format="pyarrow", batch_size=None)


def compression_ratio(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id",
                      level: int = 6) -> ray.data.Dataset:
    """zlib compression ratio per document — the cheap redundancy
    signal modern corpus filters use alongside Gopher rules (highly
    compressible text ⇒ repetitive boilerplate; incompressible ⇒
    often binary junk mis-parsed as text). Map-only; zlib at a fixed
    level is deterministic for a given input, so results are
    reproducible (pytest-gated vs direct zlib — no SQL equivalent).
    Output: (id, n_bytes, n_compressed, ratio)."""
    import zlib

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        nb, nc, ratio = [], [], []
        for t in batch.column(text_col).to_pylist():
            raw = (t or "").encode("utf-8", "surrogatepass")
            comp = zlib.compress(raw, level)
            nb.append(len(raw))
            nc.append(len(comp))
            ratio.append(len(comp) / len(raw) if raw else 1.0)
        return pa.table({
            id_col: ids,
            "n_bytes": pa.array(nb, pa.int64()),
            "n_compressed": pa.array(nc, pa.int64()),
            "ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def extract_pattern_all(ds: "ray.data.Dataset", pattern: str,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> "ray.data.Dataset":
    """1→N regex explode: every non-overlapping match of ``pattern``
    becomes a row (id, match_idx, match) in document order — the
    extract-all / UNNEST shape (mining identifiers, citations, URLs
    out of a text column). Map-only and vectorized: one compiled
    ``Series.str.findall`` per block, a single ``explode``, and a
    grouped cumcount for the ordinal — no per-row Python loop."""
    prog = re.compile(pattern)

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        found = b[text_col].fillna("").str.findall(prog)
        out = pd.DataFrame({id_col: b[id_col],
                            "match": found}).explode("match")
        out = out.dropna(subset=["match"])
        if out.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=b[id_col].dtype),
                "match_idx": pd.Series([], dtype="int64"),
                "match": pd.Series([], dtype=str)})
        out["match_idx"] = out.groupby(id_col).cumcount().astype("int64")
        return out[[id_col, "match_idx", "match"]]

    return ds.map_batches(emit, batch_format="pandas")


def source_signature_terms(ds: ray.data.Dataset,
                           group_col: str = "source",
                           text_col: str = "text",
                           min_count: int = 5,
                           ratio_num: int = 2,
                           ratio_den: int = 1) -> pd.DataFrame:
    """Group-distinctive vocabulary: tokens overrepresented in one
    group vs the whole corpus — flag (token, group) where the observed
    count exceeds ``ratio_num/ratio_den`` × the expected count under
    independence (n_tg·N·den > num·n_t·n_g) with support ≥
    ``min_count``. The
    domain-signature / burst-detection primitive for monitoring what a
    crawl source is actually contributing.

    The independence test is EXACT integer cross-multiplication (never
    a float division), so the flag — and the hash-compared output — is
    bit-stable. One map-only pass builds (group, token) count partials
    (single-space tokenization, the corpus-wide convention); the
    combine yields the contingency table, whose margins (token totals,
    group totals, N) all derive from the SAME table — no second data
    pass. Driver work is O(groups × vocabulary); for open-vocabulary
    corpora pass the partials through the distributed combine instead.

    Output: (token, group, n_tg, n_t, n_g, lift) sorted by
    (group, token); lift = n_tg·N / (n_t·n_g) as float for reporting.
    """
    from .relational import partial_groupby

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame({group_col: b[group_col],
                          "_w": b[text_col].str.split(" ")})
        f = f.explode("_w", ignore_index=True)
        return (f.groupby([group_col, "_w"], as_index=False)
                .agg(n_tg=("_w", "size"))
                .rename(columns={"_w": "token"}))

    tbl = partial_groupby(
        ds.select_columns([group_col, text_col]).map_batches(
            counts, batch_format="pandas", batch_size=None),
        [group_col, "token"],
        lambda b: b.groupby([group_col, "token"],
                            as_index=False)["n_tg"].sum(), ["n_tg"])
    n_t = tbl.groupby("token")["n_tg"].transform("sum").to_numpy("int64")
    n_g = (tbl.groupby(group_col)["n_tg"].transform("sum")
           .to_numpy("int64"))
    n_tg = tbl["n_tg"].to_numpy("int64")
    total = int(n_tg.sum())
    # Python-int cross-multiply: n_tg·N and ratio·n_t·n_g can exceed
    # int64 at corpus scale; the comparison must not wrap
    flag = np.fromiter(
        (int(a) * total * ratio_den > ratio_num * int(b) * int(c)
         and a >= min_count
         for a, b, c in zip(n_tg.tolist(), n_t.tolist(), n_g.tolist())),
        dtype=bool, count=len(n_tg))
    out = pd.DataFrame({
        "token": tbl["token"].to_numpy()[flag],
        group_col: tbl[group_col].to_numpy()[flag],
        "n_tg": n_tg[flag], "n_t": n_t[flag], "n_g": n_g[flag]})
    out["lift"] = (out["n_tg"].to_numpy("float64") * float(total)
                   / (out["n_t"].to_numpy("float64")
                      * out["n_g"].to_numpy("float64")))
    return (out.sort_values([group_col, "token"])
            .reset_index(drop=True))


_WORD_RE = re.compile(r"[A-Za-z]+")
_SENT_RE = re.compile(r"[.!?]+")
_VOWEL_RE = re.compile(r"[aeiouyAEIOUY]+")


def readability_scores(ds: ray.data.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> ray.data.Dataset:
    """Flesch-style reading-ease score per document from three EXACT
    integer counts — words (letter runs), sentence marks (``[.!?]+``
    runs, floored at 1), and syllable proxies (vowel-group runs) —
    so the only float is the final closed-form expression
    ``206.835 − 1.015·(w/s) − 84.6·(y/w)``, replayed term-for-term by
    the SQL oracle's ``regexp_extract_all`` counts (hash-exact: one
    expression over identical integers). Documents with zero words
    are dropped (the SQL ``WHERE`` mirror). Map-only; streams.
    """

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].astype(str)
        w = texts.str.count(_WORD_RE).to_numpy("int64")
        s = np.maximum(texts.str.count(_SENT_RE).to_numpy("int64"), 1)
        y = texts.str.count(_VOWEL_RE).to_numpy("int64")
        keep = w > 0
        flesch = (206.835 - 1.015 * (w[keep] / s[keep])
                  - 84.6 * (y[keep] / w[keep]))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_words": w[keep], "n_sentences": s[keep],
            "n_vowel_groups": y[keep], "flesch": flesch})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def type_token_ratio(ds: "ray.data.Dataset", text_col: str = "text",
                     group_col: str = "source",
                     num_buckets: int = 64) -> pd.DataFrame:
    """Per-group lexical diversity: total whitespace tokens, distinct
    tokens (types), and the type–token ratio — the vocabulary-richness
    screen that separates template/boilerplate sources from organic
    text in a crawl corpus.

    Tokenization matches the SQL twin exactly:
    ``string_split_regex(lower(trim(text)), '\\s+')`` over non-blank
    docs. Totals ride additive per-block partials; the distinct-type
    count collapses (group, token) pairs block-locally and finishes in
    ONE hash(token) bucket shuffle (:func:`ops.stats.
    grouped_distinct_count` — traffic is O(distinct pairs), and a hot
    group spreads across all buckets because bucketing is on the
    token). ``ttr`` is one exact int/int float division.
    """
    from .relational import partial_groupby
    from .stats import grouped_distinct_count

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        keep = t != ""
        t = t[keep].str.lower().str.split(r"\s+", regex=True)
        g = b.loc[keep, group_col]
        out = pd.DataFrame({group_col: g, "token": t}).explode("token")
        return out[[group_col, "token"]]

    tokens = ds.select_columns([group_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=None).materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(group_col, as_index=False).agg(
            n_tokens=("token", "size"))

    totals = partial_groupby(tokens, [group_col], count_partial,
                             ["n_tokens"])
    types = grouped_distinct_count(tokens, group_col, "token",
                                   num_buckets=num_buckets)
    out = totals.merge(types, on=group_col)
    out = out.rename(columns={"n_distinct": "n_types"})
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["ttr"] = out["n_types"].to_numpy(np.float64) \
        / out["n_tokens"].to_numpy(np.float64)
    return out.sort_values(group_col).reset_index(drop=True)


def source_cosine_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        group_col: str = "source",
                        num_buckets: int = 64) -> pd.DataFrame:
    """Pairwise cosine similarity between GROUPS' token-count vectors
    (which sources publish the same kind of text — the lexical
    mirror/syndication detector). The source×token matrix never
    materializes: exact per-(group, token) counts exist per token-hash
    bucket after one skinny shuffle, each bucket pivots its slice and
    emits the partial Gram matrix ``M·Mᵀ`` plus per-group ‖·‖²
    partials — both ADDITIVE across buckets because buckets partition
    the token axis. Driver folds O(buckets · groups²) exact-integer
    cells; cosine = dot / (√n2a · √n2b) is the only float step.
    Output: (source_a, source_b, dot, cosine) for pairs sharing ≥1
    token, a < b lexicographically.
    """
    from ..functions.urls import hash64_batch

    def explode_counts(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        keep = t != ""
        toks = t[keep].str.lower().str.split(r"\s+", regex=True)
        out = pd.DataFrame({group_col: b.loc[keep, group_col],
                            "token": toks}).explode("token")
        vc = out.groupby([group_col, "token"], as_index=False).size()
        vc = vc.rename(columns={"size": "n"})
        tb = (hash64_batch(vc["token"].tolist())
              % np.uint64(num_buckets)).astype(np.int32)
        vc["_tb"] = tb
        return vc

    def bucket_gram(group: pd.DataFrame) -> pd.DataFrame:
        cnt = group.groupby([group_col, "token"],
                            as_index=False)["n"].sum()
        piv = cnt.pivot_table(index=group_col, columns="token",
                              values="n", fill_value=0)
        m = piv.to_numpy(np.int64)
        gram = m @ m.T
        srcs = list(piv.index)
        rows = []
        for i, a in enumerate(srcs):
            rows.append((a, a, int(gram[i, i])))      # ‖a‖² partial
            for j in range(i + 1, len(srcs)):
                if gram[i, j]:
                    rows.append((min(a, srcs[j]), max(a, srcs[j]),
                                 int(gram[i, j])))
        return pd.DataFrame(rows, columns=["a", "b", "dot"])

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(explode_counts, batch_format="pandas",
                          batch_size=None)
             .groupby("_tb").map_groups(bucket_gram,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "source_a": pd.Series([], dtype="object"),
            "source_b": pd.Series([], dtype="object"),
            "dot": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64")})
    folded = parts.groupby(["a", "b"], as_index=False)["dot"].sum()
    norms = dict(zip(
        folded.loc[folded["a"] == folded["b"], "a"],
        folded.loc[folded["a"] == folded["b"], "dot"].astype(int)))
    pr = folded[folded["a"] != folded["b"]]
    import math

    cos = [float(d) / math.sqrt(float(norms[a]) * float(norms[b]))
           for a, b, d in zip(pr["a"], pr["b"], pr["dot"].astype(int))]
    out = pd.DataFrame({"source_a": pr["a"].to_numpy(),
                        "source_b": pr["b"].to_numpy(),
                        "dot": pr["dot"].astype("int64").to_numpy(),
                        "cosine": cos})
    return out.sort_values(["source_a", "source_b"]) \
        .reset_index(drop=True)


def hapax_rate(ds: "ray.data.Dataset", text_col: str = "text",
               group_col: str = "source",
               num_buckets: int = 64) -> "pd.DataFrame":
    """Per-group hapax legomena rate: the share of a group's DISTINCT
    tokens that occur exactly once within the group — the
    vocabulary-tail gauge that separates organic prose (fat hapax
    tail) from template/boilerplate output (thin tail) one step
    sharper than the type–token ratio.

    Tokenization replays the SQL twin
    (``string_split_regex(lower(trim(text)), '\\s+')`` over non-blank
    docs). (group, token) count partials collapse block-locally and
    finish in ONE pair-hash bucket shuffle — pairs partition across
    buckets, so the per-bucket (n_types, n_hapax, n_tokens) group
    partials are additive and the driver folds O(buckets · groups)
    rows. ``hapax_rate`` is one exact int/int division. Output:
    (group, n_types, n_hapax, n_tokens, hapax_rate), sorted.
    """
    import numpy as np
    import pandas as pd

    def local_pairs(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        keep = t != ""
        toks = t[keep].str.lower().str.split(r"\s+", regex=True)
        g = pd.DataFrame({group_col: b.loc[keep, group_col],
                          "token": toks}).explode("token")
        agg = g.groupby([group_col, "token"], as_index=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(
            agg[group_col].astype(str) + "\x00" + agg["token"],
            index=False)
        agg["_pb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        pc = group.groupby([group_col, "token"], as_index=False)[
            "n"].sum()
        pc["_h"] = (pc["n"] == 1).astype("int64")
        return pc.groupby(group_col, as_index=False).agg(
            n_types=("_h", "size"), n_hapax=("_h", "sum"),
            n_tokens=("n", "sum"))

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(local_pairs, batch_format="pandas",
                          batch_size=None)
             .groupby("_pb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_types": pd.Series([], dtype="int64"),
            "n_hapax": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "hapax_rate": pd.Series([], dtype="float64")})
    agg = parts.groupby(group_col, as_index=False)[
        ["n_types", "n_hapax", "n_tokens"]].sum()
    for c in ("n_types", "n_hapax", "n_tokens"):
        agg[c] = agg[c].astype("int64")
    agg["hapax_rate"] = agg["n_hapax"].to_numpy(np.float64) \
        / agg["n_types"].to_numpy(np.float64)
    return agg.sort_values(group_col).reset_index(drop=True)


def short_doc_wilson(ds: "ray.data.Dataset", text_col: str = "text",
                     group_col: str = "source",
                     max_tokens: int = 30,
                     z: float = 1.96) -> "pd.DataFrame":
    """Per-group short-document rate with a Wilson score interval:
    the share of a group's docs under ``max_tokens`` whitespace
    tokens, plus the 95% confidence band — so a source can be
    labeled junk (or cleared) with an honest sample-size-aware bound
    instead of a raw ratio that swings wildly on 10-doc sources.

    MAP-ONLY additive (n, k) partials per group; the Wilson bounds
    are computed from the exact integer pair with an expression tree
    mirrored verbatim by the SQL twin (same operation order, IEEE
    sqrt), so the floats replay bit-for-bit. Output: (group, n_docs,
    n_short, short_rate, wilson_lo, wilson_hi), sorted.
    """
    import math

    import numpy as np
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        ntok = t.str.lower().str.split(r"\s+", regex=True).str.len()
        g = pd.DataFrame({
            group_col: b[group_col],
            "_s": (ntok < max_tokens).astype("int64")})
        return g.groupby(group_col, as_index=False).agg(
            n=("_s", "size"), k=("_s", "sum"))

    parts = ds.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_short": pd.Series([], dtype="int64"),
            "short_rate": pd.Series([], dtype="float64"),
            "wilson_lo": pd.Series([], dtype="float64"),
            "wilson_hi": pd.Series([], dtype="float64")})
    agg = parts.groupby(group_col, as_index=False)[["n", "k"]].sum()
    z2 = z * z
    lo, hi, rate = [], [], []
    for n_i, k_i in zip(agg["n"].tolist(), agg["k"].tolist()):
        n_f = float(n_i)
        p = float(k_i) / n_f
        denom = 1.0 + z2 / n_f
        center = (p + z2 / (2.0 * n_f)) / denom
        half = (z * math.sqrt(p * (1.0 - p) / n_f
                              + z2 / (4.0 * n_f * n_f))) / denom
        rate.append(p)
        lo.append(center - half)
        hi.append(center + half)
    out = pd.DataFrame({
        group_col: agg[group_col],
        "n_docs": agg["n"].astype("int64"),
        "n_short": agg["k"].astype("int64"),
        "short_rate": np.asarray(rate, dtype=np.float64),
        "wilson_lo": np.asarray(lo, dtype=np.float64),
        "wilson_hi": np.asarray(hi, dtype=np.float64)})
    return out.sort_values(group_col).reset_index(drop=True)


def char_entropy(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document character-level Shannon entropy (nats) — the
    gibberish/encoding-junk screen: natural prose sits ~2.5-3.5,
    base64 blobs and key-mash spam read high, template padding reads
    low. ``H = ln N − Σ c·ln c / N`` from the EXACT per-doc char
    histogram; the Σ folds with fsum over chars sorted by codepoint,
    so results are reproducible. MAP-ONLY (embarrassingly parallel).
    Output columns: (id, n_chars_total, n_distinct_chars, entropy).
    """
    import math

    from collections import Counter

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        nt, nd, ent = [], [], []
        for t in batch.column(text_col).to_pylist():
            t = t or ""
            n = len(t)
            cnt = Counter(t)
            nt.append(n)
            nd.append(len(cnt))
            if n == 0:
                ent.append(0.0)
                continue
            s = math.fsum(c * math.log(c)
                          for _, c in sorted(cnt.items()))
            ent.append(math.log(n) - s / n)
        return pa.table({
            id_col: ids,
            "n_chars_total": pa.array(nt, pa.int64()),
            "n_distinct_chars": pa.array(nd, pa.int64()),
            "entropy": pa.array(ent, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def length_tail_ratio(ds: "ray.data.Dataset",
                      size_col: str = "n_chars",
                      group_col: str = "source",
                      num_buckets: int = 64) -> "pd.DataFrame":
    """Per-group tail-heaviness of the size distribution: exact
    integer p50/p90/p99 plus the p90/p50 ratio — one number that
    separates a source of uniform articles from one mixing stubs
    with mega-pages (which needs different batch sizing downstream).

    (group, size) histogram partials are additive and finish in ONE
    group-hash shuffle; quantiles are the exact integer-ceil rule.
    ``tail_ratio`` is one float division of two exact ints. Output:
    (group, n, p50, p90, p99, tail_ratio), sorted.
    """
    import numpy as np
    import pandas as pd

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({group_col: b[group_col],
                          "_v": b[size_col].astype("int64")})
        agg = g.groupby([group_col, "_v"], as_index=False).size() \
            .rename(columns={"size": "c"})
        h = pd.util.hash_pandas_object(agg[group_col].astype(str),
                                       index=False)
        agg["_gb"] = (h % num_buckets).astype("int32")
        return agg

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        hist = group.groupby([group_col, "_v"], as_index=False)[
            "c"].sum()
        rows = []
        for gval, gh in hist.groupby(group_col):
            gh = gh.sort_values("_v")
            vals = gh["_v"].to_numpy(np.int64)
            cum = np.cumsum(gh["c"].to_numpy(np.int64))
            n = int(cum[-1])

            def pick(num: int, den: int) -> int:
                need = (num * n + den - 1) // den
                return int(vals[int(np.searchsorted(cum, need,
                                                    side="left"))])

            p50, p90, p99 = pick(1, 2), pick(9, 10), pick(99, 100)
            rows.append((gval, n, p50, p90, p99,
                         float(p90) / float(p50)))
        return pd.DataFrame(rows, columns=[group_col, "n", "p50",
                                           "p90", "p99",
                                           "tail_ratio"])

    out = (ds.select_columns([group_col, size_col])
           .map_batches(local, batch_format="pandas",
                        batch_size=None)
           .groupby("_gb").map_groups(per_bucket,
                                      batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "p50": pd.Series([], dtype="int64"),
            "p90": pd.Series([], dtype="int64"),
            "p99": pd.Series([], dtype="int64"),
            "tail_ratio": pd.Series([], dtype="float64")})
    for c in ("n", "p50", "p90", "p99"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def group_coverage_curve(ds: "ray.data.Dataset",
                         group_col: str = "source") -> "pd.DataFrame":
    """Coverage concentration curve: groups ranked by size (count
    desc, name asc — deterministic ties) with each rank's cumulative
    share of the corpus — the how-many-sources-cover-90% planning
    read that decides whether per-source processing parallelism is
    even worth building.

    MAP-ONLY additive per-group count partials (O(blocks · groups)
    driver fold); the cumulative is one O(groups) pass. Output:
    (rank, group, n_docs, share, cum_share), rank-ordered.
    """
    import numpy as np
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[group_col].value_counts()
        return pd.DataFrame({group_col: vc.index,
                             "n": vc.to_numpy("int64")})

    parts = ds.select_columns([group_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "rank": pd.Series([], dtype="int64"),
            group_col: pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "share": pd.Series([], dtype="float64"),
            "cum_share": pd.Series([], dtype="float64")})
    agg = parts.groupby(group_col, as_index=False)["n"].sum()
    agg = agg.sort_values(["n", group_col],
                          ascending=[False, True], kind="stable")
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(np.int64)
    out = pd.DataFrame({
        "rank": np.arange(1, len(agg) + 1, dtype=np.int64),
        group_col: agg[group_col].to_numpy(),
        "n_docs": n,
        "share": n.astype(np.float64) / float(total),
        "cum_share": np.cumsum(n).astype(np.float64)
        / float(total)})
    return out.reset_index(drop=True)


def group_label_purity(ds: "ray.data.Dataset",
                       group_col: str = "source",
                       label_col: str = "lang") -> "pd.DataFrame":
    """Per-group label purity: the group's modal label (count desc,
    label asc — deterministic ties) and the share of its rows
    carrying it — the is-this-source-monolingual screen that decides
    whether per-source language routing is safe.

    MAP-ONLY additive (group, label) count partials, O(groups ·
    labels) driver fold, one exact int/int division. Output: (group,
    modal_label, n_rows, n_modal, purity), sorted by group.
    """
    import numpy as np
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([group_col, label_col],
                         as_index=False).size() \
            .rename(columns={"size": "n"})

    parts = ds.select_columns([group_col, label_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "modal_label": pd.Series([], dtype="object"),
            "n_rows": pd.Series([], dtype="int64"),
            "n_modal": pd.Series([], dtype="int64"),
            "purity": pd.Series([], dtype="float64")})
    agg = parts.groupby([group_col, label_col], as_index=False)[
        "n"].sum()
    agg = agg.sort_values([group_col, "n", label_col],
                          ascending=[True, False, True],
                          kind="stable")
    best = agg.groupby(group_col, as_index=False).first()
    tot = agg.groupby(group_col, as_index=False)["n"].sum() \
        .rename(columns={"n": "n_rows"})
    out = best.merge(tot, on=group_col).rename(columns={
        label_col: "modal_label", "n": "n_modal"})
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_modal"] = out["n_modal"].astype("int64")
    out["purity"] = out["n_modal"].to_numpy(np.float64) \
        / out["n_rows"].to_numpy(np.float64)
    out = out[[group_col, "modal_label", "n_rows", "n_modal",
               "purity"]]
    return out.sort_values(group_col).reset_index(drop=True)
