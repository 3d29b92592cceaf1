"""Character-n-gram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al., LREC 2020) filters web corpora by the perplexity
of a small LM trained on a trusted corpus: low-perplexity documents
read like the reference text, high-perplexity ones are boilerplate,
gibberish or the wrong register. The reference engine has no model-
based quality tier (its quality signals are ratio heuristics —
`ops/textstats.py:QualityScorer`); at 100 TB a trained scorer is the
standard next tier, so this module implements the full train→score
loop on Ray Data with a character n-gram model (no external deps, no
tokenizer):

- **train** (:func:`train_char_lm`): one pass of per-batch n-gram
  Counter partials → driver fold. The model is a (context → next-char
  counts) table over the TOP ``max_contexts`` contexts by count — the
  count table is pruned DISTRIBUTIVELY per batch (only each batch's
  top candidates ship) and exactly on the driver, so the driver never
  holds the unbounded tail. Probabilities are add-k smoothed over the
  observed character vocabulary.
- **score** (:func:`perplexity_scores`): the (small, pruned) model
  broadcasts once via ``ray.put``; each batch scores vectorized-ish
  per doc: mean negative log2 P(c | context) over the doc's n-grams
  (= log2 perplexity). Unseen contexts back off to the unigram char
  distribution; unseen chars get the smoothed floor.

Determinism: counts are integers (order-free), the pruning tie-break
is (count desc, context asc), and scoring is a pure function of the
model — byte-identical across runs and partitionings.

Scale notes: the per-batch partial prune bounds the shuffle at
``O(batches × keep)`` rows; the final model is O(max_contexts · vocab)
and broadcasts once. Training never shuffles the corpus; scoring is
map-only. (The exact top-M by global count may differ from the fold of
per-batch top-M' candidates only for contexts straddling the per-batch
cut — mitigated by keeping ``prune_factor``× more candidates per batch;
the resulting model is still a deterministic function of the corpus +
partitioning, and tests pin both the exact-small case and partition
invariance of scoring through `queries()`.)
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

__all__ = ["train_char_lm", "perplexity_scores", "CharLM"]


def _doc_ngrams(text: str, n: int) -> zip:
    """(context, next_char) pairs with a leading boundary pad."""
    padded = "\x02" * (n - 1) + text
    return zip((padded[i:i + n - 1] for i in range(len(text))), text)


class CharLM:
    """Pruned char-n-gram model: {context: {char: count}} + unigram
    fallback. Plain dicts — pickles small, probes O(1)."""

    def __init__(self, n: int, contexts: dict[str, dict[str, int]],
                 unigram: dict[str, int], add_k: float = 0.1):
        self.n = n
        self.contexts = contexts
        self.unigram = unigram
        self.add_k = add_k
        self.vocab = sorted(unigram)
        self.v = max(1, len(self.vocab))
        self.total_uni = sum(unigram.values())
        # precomputed log2 tables: context → {char: logp} plus the
        # per-context unseen floor; probe is two dict hops per char
        self._logp: dict[str, dict[str, float]] = {}
        self._floor: dict[str, float] = {}
        k, v = self.add_k, self.v
        for ctx, counts in contexts.items():
            tot = sum(counts.values()) + k * v
            self._logp[ctx] = {c: math.log2((cnt + k) / tot)
                               for c, cnt in counts.items()}
            self._floor[ctx] = math.log2(k / tot)
        utot = self.total_uni + k * v
        self._uni_logp = {c: math.log2((cnt + k) / utot)
                          for c, cnt in unigram.items()}
        self._uni_floor = math.log2(k / utot)

    def log2p(self, ctx: str, ch: str) -> float:
        tab = self._logp.get(ctx)
        if tab is None:                      # unseen context → unigram
            return self._uni_logp.get(ch, self._uni_floor)
        return tab.get(ch, self._floor[ctx])

    def doc_log2_ppl(self, text: str) -> float:
        """Mean −log2 P per char (= log2 perplexity); 0.0 for empty."""
        if not text:
            return 0.0
        s = 0.0
        n_chars = 0
        for ctx, ch in _doc_ngrams(text, self.n):
            s -= self.log2p(ctx, ch)
            n_chars += 1
        return s / n_chars


def train_char_lm(ds: ray.data.Dataset, n: int = 3,
                  text_col: str = "text", max_contexts: int = 20_000,
                  prune_factor: int = 4, add_k: float = 0.1) -> CharLM:
    """One-pass distributed training. Each batch emits its (context,
    char, count) partials pruned to the batch's top
    ``prune_factor × max_contexts`` contexts (plus the full char
    unigram — vocab-bounded); the driver folds partials and takes the
    exact global top ``max_contexts`` of the folded counts."""
    keep_per_batch = prune_factor * max_contexts

    def partial(batch: pa.Table) -> pa.Table:
        ctx_counts: dict[str, Counter] = {}
        uni: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            t = t or ""
            uni.update(t)
            for ctx, ch in _doc_ngrams(t, n):
                c = ctx_counts.get(ctx)
                if c is None:
                    c = ctx_counts[ctx] = Counter()
                c[ch] += 1
        if len(ctx_counts) > keep_per_batch:
            by_total = sorted(ctx_counts,
                              key=lambda c: (-sum(ctx_counts[c].values()), c))
            ctx_counts = {c: ctx_counts[c] for c in by_total[:keep_per_batch]}
        ctxs, chars, counts = [], [], []
        for ctx, cc in ctx_counts.items():
            for ch, cnt in cc.items():
                ctxs.append(ctx)
                chars.append(ch)
                counts.append(cnt)
        for ch, cnt in uni.items():          # unigram rows: ctx = ""
            ctxs.append("")
            chars.append(ch)
            counts.append(cnt)
        return pa.table({"ctx": pa.array(ctxs, pa.string()),
                         "ch": pa.array(chars, pa.string()),
                         "cnt": pa.array(counts, pa.int64())})

    folded: dict[str, Counter] = {}
    unigram: Counter = Counter()
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        if row["ctx"] == "":
            unigram[row["ch"]] += row["cnt"]
        else:
            c = folded.get(row["ctx"])
            if c is None:
                c = folded[row["ctx"]] = Counter()
            c[row["ch"]] += row["cnt"]
    if len(folded) > max_contexts:
        by_total = sorted(folded,
                          key=lambda c: (-sum(folded[c].values()), c))
        folded = {c: folded[c] for c in by_total[:max_contexts]}
    return CharLM(n, {k: dict(v) for k, v in folded.items()},
                  dict(unigram), add_k=add_k)


class _PplScorer:
    """map_batches stage: model broadcasts once per worker."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        self.model: CharLM = (ray.get(model_ref)
                              if isinstance(model_ref, ray.ObjectRef)
                              else model_ref)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.model
        ppl = [m.doc_log2_ppl(t or "")
               for t in batch.column(self.text_col).to_pylist()]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "log2_ppl": pa.array(np.asarray(ppl, dtype=np.float64)),
        })


def perplexity_scores(ds: ray.data.Dataset, model: CharLM,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """(id, log2_ppl) per doc — low = reads like the training corpus.
    Filter downstream with a threshold or per-language quantile
    (:func:`ops.corpus.int_quantiles` on the scaled score)."""
    from .stagecache import cached_stage

    mref = ray.put(model)
    return ds.map_batches(
        cached_stage(_PplScorer, model_ref=mref, text_col=text_col,
                     id_col=id_col),
        batch_format="pyarrow")


def lm_heldout_ppl(ds: ray.data.Dataset, holdout_mod: int = 5,
                   add_k: float = 0.5, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_buckets: int = 32) -> pd.DataFrame:
    """Held-out bigram perplexity with add-k smoothing — the honest
    LM-quality read (``lm_quality`` scores the training corpus, where
    smoothing never fires; here train = ``doc_id % holdout_mod ≠ 0``,
    score = the rest, and unseen bigrams/contexts genuinely exercise
    the smoothing path): p(w|prev) = (c₂(prev,w) + k) / (c₁(prev) +
    k·V), V = |train unigram vocab|, both counts 0 for unseen — the
    uniform-floor fallback emerges from the same formula.

    Scale shape: train counts fold from one skinny (prev,w) groupby;
    the count model broadcasts once via ``ray.put`` and every scoring
    batch reads it locally (valid while the model is O(vocab²) ≪
    corpus — true for this synthetic vocabulary and for any pruned
    n-gram model; an open-vocab corpus would route scoring through a
    bigram-key bucketed join instead, the ``decontaminate`` tiering
    pattern). Per-doc log2 partials fold. Output per held-out doc:
    (doc_id,
    n_bigrams, n_unseen_bigrams, logprob_sum, ppl) with
    ppl = 2^(−logprob_sum/n_bigrams); libm log2/exp2 drift vs the SQL
    twin is tolerance-registered."""
    import math
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    def bigrams_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows_d, rows_p, rows_w, rows_t = [], [], [], []
        for did, text in zip(b[id_col].astype("int64"), b[text_col]):
            toks = tok_re.findall(text.lower())
            is_train = did % holdout_mod != 0
            for p, w in zip(toks, toks[1:]):
                rows_d.append(int(did))
                rows_p.append(p)
                rows_w.append(w)
                rows_t.append(is_train)
        return pd.DataFrame({"doc_id": rows_d, "prev": rows_p,
                             "w": rows_w, "is_train": rows_t})

    bg = ds.select_columns([id_col, text_col]).map_batches(
        bigrams_batch, batch_format="pandas").materialize()
    train = bg.filter(lambda r: r["is_train"])
    held = bg.filter(lambda r: not r["is_train"])

    c2 = train.groupby(["prev", "w"]).count().to_pandas() \
        .rename(columns={"count()": "c2"})
    c1 = c2.groupby("prev", as_index=False)["c2"].sum() \
        .rename(columns={"c2": "c1"})
    # vocab = distinct train unigrams (every token position: prevs ∪
    # last words — equivalently distinct over both bigram columns)
    vocab = len(set(c2["prev"]) | set(c2["w"]))
    c2_map = dict(zip(zip(c2["prev"], c2["w"]), c2["c2"].astype(int)))
    c1_map = dict(zip(c1["prev"], c1["c1"].astype(int)))
    c2_ref = None
    import ray as _ray
    c2_ref = _ray.put((c2_map, c1_map, vocab))

    def score_batch(b: pd.DataFrame) -> pd.DataFrame:
        cm2, cm1, V = _ray.get(c2_ref)
        out = {}
        for did, p, w in zip(b["doc_id"], b["prev"], b["w"]):
            c2v = cm2.get((p, w), 0)
            c1v = cm1.get(p, 0)
            lp = math.log2((c2v + add_k) / (c1v + add_k * V))
            agg = out.setdefault(int(did), [0, 0, 0.0])
            agg[0] += 1
            agg[1] += int(c2v == 0)
            agg[2] += lp
        return pd.DataFrame({
            "doc_id": list(out),
            "n_bigrams": [v[0] for v in out.values()],
            "n_unseen_bigrams": [v[1] for v in out.values()],
            "logprob_sum": [v[2] for v in out.values()]})

    parts = held.map_batches(score_batch,
                             batch_format="pandas").to_pandas()
    agg = parts.groupby("doc_id", as_index=False).agg(
        n_bigrams=("n_bigrams", "sum"),
        n_unseen_bigrams=("n_unseen_bigrams", "sum"),
        logprob_sum=("logprob_sum", "sum"))
    agg["ppl"] = [2.0 ** (-s / n) if n else float("nan")
                  for s, n in zip(agg["logprob_sum"],
                                  agg["n_bigrams"])]
    return agg.astype({"doc_id": "int64", "n_bigrams": "int64",
                       "n_unseen_bigrams": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)


def huffman_lengths(ds: ray.data.Dataset,
                    type_col: str = "event_type") -> pd.DataFrame:
    """Huffman code lengths over the symbol frequency table — the
    exact optimal-prefix-code benchmark next to the entropy lower
    bound (how many bits does the BEST symbol code actually need, and
    how far above H is it). Deterministic merge rule (documented so
    the SQL twin's unrolled merge CTEs replay it): repeatedly merge
    the two nodes with smallest (count, min-member-symbol); a
    symbol's code length = number of merges its node participated
    in. Counts fold from one skinny groupby; the merge loop is
    O(|alphabet|) driver work. Output per symbol: (symbol, n,
    code_len, weighted_bits) + exact integer total via summing;
    entropy term emitted per symbol as n·log2(N/n)."""
    import math

    counts = ds.select_columns([type_col]).groupby(type_col) \
        .count().to_pandas()
    syms = list(counts[type_col])
    ns = [int(v) for v in counts["count()"]]
    total = sum(ns)
    # node: (count, min_symbol, member_set)
    nodes = sorted(((n, s, frozenset([s]))
                    for s, n in zip(syms, ns)))
    depth = {s: 0 for s in syms}
    while len(nodes) > 1:
        a = nodes.pop(0)
        b = nodes.pop(0)
        for s in a[2] | b[2]:
            depth[s] += 1
        merged = (a[0] + b[0], min(a[1], b[1]), a[2] | b[2])
        nodes.append(merged)
        nodes.sort()
    rows = []
    for s, n in zip(syms, ns):
        rows.append((s, n, depth[s], n * depth[s],
                     n * math.log2(total / n)))
    out = pd.DataFrame(rows, columns=[
        "symbol", "n", "code_len", "weighted_bits", "entropy_bits"])
    return out.astype({"n": "int64", "code_len": "int64",
                       "weighted_bits": "int64"}) \
        .sort_values("symbol").reset_index(drop=True)
