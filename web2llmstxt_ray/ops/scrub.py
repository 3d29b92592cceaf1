"""Corpus scrubbing operators: pattern redaction (PII), benchmark
decontamination, and repetition-based quality statistics.

All three are embarrassingly parallel ``map_batches`` stages — no
shuffle at any size. The only cross-task state is the decontamination
snippet list, broadcast once via ``ray.put`` and probed per batch with
vectorized Arrow substring kernels (never re-shipped per batch, never
a join).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# module-level so cloudpickle captures them by value for workers driven
# from a foreign cwd (see bootstrap.py — call-time relative imports
# inside worker-executed __call__ bodies fail there)
from ..functions.urls import _SHINGLE_MIX
from .sketch import HyperLogLog
from .textstats import tokenize_lower_hashes

# PII patterns chosen to be regex-dialect-portable (Python re, RE2,
# DuckDB) — no backrefs, no lookaround — so the same pattern string
# drives the engine and any SQL oracle.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
}


class Redactor:
    """Replace every match of ``patterns`` with its ``[TAG]`` and count
    replacements. Patterns compile once per actor/worker (``__init__``),
    not per batch; the per-batch loop is one ``re.subn`` per pattern
    per doc (Python-level, but regex scanning is C — the cost is the
    scan itself, which any engine pays).

    Output: id column + ``text`` (redacted) + ``n_redactions``.
    """

    def __init__(self, patterns: dict[str, str] | None = None,
                 text_col: str = "text", id_col: str = "doc_id"):
        pats = patterns if patterns is not None else PII_PATTERNS
        self.compiled = [(re.compile(p), f"[{tag.upper()}]")
                         for tag, p in sorted(pats.items())]
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out, counts = [], []
        for t in texts:
            t = t or ""
            n = 0
            for rx, repl in self.compiled:
                t, k = rx.subn(repl, t)
                n += k
            out.append(t)
            counts.append(n)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "text": pa.array(out, pa.string()),
            "n_redactions": pa.array(counts, pa.int64()),
        })


def redact(ds: ray.data.Dataset, patterns: dict[str, str] | None = None,
           **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage
    return ds.map_batches(cached_stage(Redactor, patterns=patterns, **kw),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decontamination — drop training docs that contain benchmark text
# ---------------------------------------------------------------------------


class ContainsAnyFlagger:
    """Flag rows whose text contains ANY of a broadcast snippet list.

    The snippet list is a ``ray.put`` handle resolved once per
    actor/worker; per batch the probe is one vectorized
    ``pc.match_substring`` pass per snippet OR-ed into a mask — Arrow
    kernels over the whole column, no per-row Python. This is the
    exact-containment tier of decontamination; the 100-TB tier for
    large benchmark sets is the same shape with the snippet list
    replaced by an n-gram-hash bloom filter (same broadcast-once
    pattern, constant-size probe state).
    """

    def __init__(self, snippets_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.snippets = (ray.get(snippets_ref)
                         if isinstance(snippets_ref, ray.ObjectRef)
                         else list(snippets_ref))
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        mask = None
        for s in self.snippets:
            m = pc.match_substring(col, s)
            mask = m if mask is None else pc.or_(mask, m)
        if mask is None:
            mask = pa.array([False] * len(batch))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "contaminated": pc.fill_null(mask, False),
        })


def decontaminate_flags(ds: ray.data.Dataset, snippets: list[str],
                        **kw) -> ray.data.Dataset:
    """(id, contaminated) for every row; filter on it to drop, or join
    it back for auditing. Snippets are broadcast ONCE via ``ray.put``."""
    from .stagecache import cached_stage
    ref = ray.put(sorted(set(s for s in snippets if s)))
    return ds.map_batches(cached_stage(ContainsAnyFlagger, snippets_ref=ref,
                                       **kw),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decontamination, scale tier — word n-gram overlap via a bloom filter
# ---------------------------------------------------------------------------
#
# `ContainsAnyFlagger` scans every document against every snippet —
# O(docs × snippets) — fine for benchmark sets of thousands of
# snippets, quadratic death when the benchmark corpus is itself large.
# The standard scale path (the n-gram-overlap decontamination used for
# LLM training sets) replaces the snippet list with a constant-size
# probe: every word n-gram of the benchmark set goes into ONE bloom
# filter (bits, not strings), broadcast once; a document is flagged if
# ANY of its n-grams hits. Cost per doc is O(words), independent of
# benchmark size; false-positive rate is the bloom's (tunable via
# bits_per_gram), false negatives are impossible — the safe direction
# for decontamination (over-dropping, never under-dropping).


_BLOOM_SALTS = (np.arange(1, 5, dtype=np.uint64)
                * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1))


def _gram_strings(text: str, n: int) -> list[str]:
    toks = (text or "").lower().split()
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def gram_hashes_flat(hw: np.ndarray, offsets: np.ndarray,
                     n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word ``n``-gram hashes per doc from a flat token-hash array
    (``ops.textstats.tokenize_lower_hashes`` layout): the vectorized
    replacement for hashing ``_gram_strings`` output — equal grams ⇔
    equal hashes (order-sensitive within the gram, same combine as
    ``ops.dedup.shingle_hashes``), so bloom build/probe built on this
    kernel keep the no-false-negative contract. Docs with fewer than
    ``n`` tokens contribute zero grams (matching ``_gram_strings``,
    NOT ``shingle_hashes``' k-clamp). Returns (flat gram hashes,
    per-doc offsets)."""
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    gcounts = np.maximum(lens - n + 1, 0)
    goffsets = np.concatenate([[0], np.cumsum(gcounts)]).astype(np.int64)
    total = len(hw)
    if total < n:
        return np.empty(0, np.uint64), goffsets
    acc = hw[: total - n + 1].copy()
    for j in range(1, n):
        acc = acc * _SHINGLE_MIX ^ hw[j: total - n + 1 + j]
    doc_of = np.repeat(np.arange(n_docs), lens)
    valid = doc_of[: total - n + 1] == doc_of[n - 1:]
    return acc[valid], goffsets


def _bloom_positions(hashes: np.ndarray, m: int) -> np.ndarray:
    """(k, len) bit positions; reuses the fmix64 avalanche."""
    out = np.empty((len(_BLOOM_SALTS), len(hashes)), dtype=np.int64)
    for j, salt in enumerate(_BLOOM_SALTS):
        out[j] = (HyperLogLog._fmix64(hashes * salt)
                  % np.uint64(m)).astype(np.int64)
    return out


def build_ngram_bloom(texts: list[str], n: int = 8,
                      bits_per_gram: int = 16) -> tuple[bytes, int]:
    """Bloom filter over every word ``n``-gram of ``texts``; returns
    (bit-blob, m). k=4 hash functions; at 16 bits/gram the FP rate is
    ~0.24%. Build is one vectorized hash pass over all grams."""
    hw, offsets = tokenize_lower_hashes(texts)
    gh, _ = gram_hashes_flat(hw, offsets, n)
    m = max(64, 1 << int(np.ceil(np.log2(max(1, len(gh))
                                         * bits_per_gram))))
    bits = np.zeros(m, dtype=bool)
    if len(gh):
        pos = _bloom_positions(gh, m)
        bits[pos.ravel()] = True
    return np.packbits(bits).tobytes(), m


class NgramBloomFlagger:
    """Flag rows sharing any word ``n``-gram with the benchmark bloom.

    The bloom blob resolves from its ``ray.put`` handle once per
    worker; per batch, ALL documents' grams hash in one vectorized
    pass and per-doc verdicts come from a segmented any-reduction —
    no per-row Python in the probe itself.

    Output: id + ``contaminated`` (bool) + ``n_hit_grams``.
    """

    def __init__(self, bloom_ref, m: int, n: int = 8,
                 text_col: str = "text", id_col: str = "doc_id"):
        blob = (ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef)
                else bloom_ref)
        self.bits = np.unpackbits(
            np.frombuffer(blob, dtype=np.uint8)).astype(bool)[:m]
        self.m, self.n = m, n
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_hits = self.hits_per_doc(batch.column(self.text_col))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "contaminated": pa.array(n_hits > 0),
            "n_hit_grams": pa.array(n_hits, pa.int64()),
        })

    def hits_per_doc(self, texts) -> np.ndarray:
        """Bloom-hit gram count per doc, fully vectorized: one Arrow
        tokenize pass, one rolling-combine gram-hash pass, one bloom
        probe, one segmented sum."""
        hw, offsets = tokenize_lower_hashes(texts)
        gh, goff = gram_hashes_flat(hw, offsets, self.n)
        if len(gh) == 0:
            return np.zeros(len(goff) - 1, dtype=np.int64)
        pos = _bloom_positions(gh, self.m)
        hit = self.bits[pos].all(axis=0)              # all k bits set
        cum = np.concatenate([[0], np.cumsum(hit)])
        return (cum[goff[1:]] - cum[goff[:-1]]).astype(np.int64)


def decontaminate_ngram_flags(ds: ray.data.Dataset, bench_texts: list[str],
                              n: int = 8, bits_per_gram: int = 16,
                              **kw) -> ray.data.Dataset:
    """Scale-tier decontamination: constant-size broadcast probe
    (bloom bits) instead of a snippet scan. No false negatives."""
    from .stagecache import cached_stage

    blob, m = build_ngram_bloom(bench_texts, n, bits_per_gram)
    ref = ray.put(blob)
    return ds.map_batches(
        cached_stage(NgramBloomFlagger, bloom_ref=ref, m=m, n=n, **kw),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition statistics — Gopher-style quality signals
# ---------------------------------------------------------------------------


class RepetitionStats:
    """Per-doc repetition signals used by Gopher/C4-style quality
    filters: distinct-token count and the occurrence count of the most
    common 2-gram. Pure per-doc work — a Counter over the token
    stream; no shuffle. Outputs are INTEGER numerators (the caller
    derives ``distinct_ratio = n_distinct/n_words`` and
    ``top_bigram_frac = top_bigram_cnt/(n_words-1)``) so cross-engine
    comparison is exact — no float-rounding-tie hazard.

    Output: id + n_words + n_distinct + top_bigram_cnt (0 when <2
    tokens).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"n_words": [], "n_distinct": [], "top_bigram_cnt": []}
        for t in batch.column(self.text_col).to_pylist():
            toks = (t or "").lower().split()
            n = len(toks)
            rows["n_words"].append(n)
            rows["n_distinct"].append(len(set(toks)))
            if n < 2:
                rows["top_bigram_cnt"].append(0)
                continue
            grams = Counter(zip(toks, toks[1:]))
            rows["top_bigram_cnt"].append(max(grams.values()))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(rows["n_words"], pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
            "top_bigram_cnt": pa.array(rows["top_bigram_cnt"], pa.int64()),
        })


def repetition_stats(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    from .stagecache import cached_stage
    return ds.map_batches(cached_stage(RepetitionStats, **kw),
                          batch_format="pyarrow")


_CTRL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
_WSRUN_RE = re.compile(r"[ \t\n\r\f\x0b]+")


class TextNormalizer:
    """Deterministic text canonicalization for dedup/fingerprint
    pre-passes: NFC unicode normalization → ASCII control-char strip →
    ASCII-whitespace-run collapse → edge trim. Every step is mirrored
    exactly by the DuckDB oracle (nfc_normalize + two regexp_replace;
    the whitespace class is spelled explicitly because RE2's ``\\s``
    and Python's unicode-aware ``\\s`` disagree on e.g. U+00A0, and
    the control class excludes the ASCII whitespace controls so a tab
    between words collapses to a space rather than vanishing).
    Compiled patterns are module-level; the class exists so actor
    pools can host it unchanged."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import unicodedata

        out = []
        for t in batch.column("text").to_pylist():
            t = unicodedata.normalize("NFC", t or "")
            t = _CTRL_RE.sub("", t)
            out.append(_WSRUN_RE.sub(" ", t).strip(" "))
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pa.array(out, pa.string()))


def normalize_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Map-only canonicalization pass (see :class:`TextNormalizer`)."""
    return ds.map_batches(TextNormalizer(), batch_format="pyarrow")


def contamination_attribution(ds: ray.data.Dataset,
                              snippets: list[str],
                              text_col: str = "text") -> pd.DataFrame:
    """Per-snippet contamination attribution: for EACH benchmark
    snippet, how many documents contain it — the report that tells you
    WHICH benchmark leaked into the corpus (the flag tier only says
    that something did).

    Snippets broadcast once (``ray.put``); each batch counts hits per
    snippet vectorized (one ``pc.match_substring`` pass per snippet —
    O(snippets) Arrow kernels per batch, no Python row loop) and emits
    a partial count vector; the driver folds O(blocks × snippets)
    partials. Output: (snippet, n_docs) for snippets with ≥1 hit."""
    import pyarrow.compute as pc

    from .stagecache import cached_stage

    uniq = sorted(set(s for s in snippets if s))
    ref = ray.put(uniq)

    class _Attr:
        def __init__(self):
            self.snippets = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(text_col)
            ns = []
            for s in self.snippets:
                ns.append(int(pc.sum(pc.match_substring(col, s))
                              .as_py() or 0))
            return pa.table({
                "snippet": pa.array(self.snippets, pa.string()),
                "n": pa.array(ns, pa.int64())})

    parts = ds.select_columns([text_col]).map_batches(
        cached_stage(_Attr), batch_format="pyarrow").to_pandas()
    out = parts.groupby("snippet", as_index=False)["n"].sum()
    out = out[out["n"] > 0].rename(columns={"n": "n_docs"})
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("snippet").reset_index(drop=True)
