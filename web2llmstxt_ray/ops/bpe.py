"""Byte-pair-encoding tokenizer training + encoding on Ray Data.

BPE (Sennrich et al., ACL 2016) is THE standard subword tokenizer for
LLM training corpora; a 100 TB pipeline trains one on its own data.
The classic algorithm needs only the corpus WORD HISTOGRAM — not the
corpus — so the distributed/driver split is natural and scale-honest:

- **histogram** (distributed): one map pass; each batch emits its own
  word Counter pruned to the top ``prune_factor × max_words``
  candidates (Zipf makes the tail irrelevant to early merges), the
  driver folds O(batches × keep) rows and keeps the exact top
  ``max_words`` of the fold. The corpus never shuffles.
- **merge loop** (driver): Sennrich's pair-count iteration over the
  bounded {word: count} dict — O(max_words) state, independent of
  corpus size. Deterministic tie-break: (count desc, pair lexical asc).
- **encode** (distributed): the merge ranks broadcast once via
  ``ray.put``; each batch tokenizes with a per-WORD memo (Zipf again:
  the distinct-word count per batch is far below the token count).

Determinism: integer counts fold order-free; the merge loop is a pure
function of the folded histogram; encoding is a pure function of the
merge table — identical across runs, partitionings and cluster shapes
(pruning makes the histogram a function of corpus + partitioning; the
unpruned small-scale case is sequential-oracled in tests/test_bpe.py).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = ["word_histogram", "train_bpe", "bpe_encode"]

_EOW = "▁"          # end-of-word sentinel appended to every word


def word_histogram(ds: ray.data.Dataset, text_col: str = "text",
                   max_words: int = 50_000,
                   prune_factor: int = 4) -> dict[str, int]:
    """Distributed word histogram with per-batch pruning (see module
    docstring). Returns the exact top ``max_words`` of the fold."""
    keep = prune_factor * max_words

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").lower().split())
        if len(c) > keep:
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
            c = dict(top)
        return pa.table({"w": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    folded: Counter = Counter()
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        folded[row["w"]] += row["n"]
    if len(folded) > max_words:
        top = sorted(folded.items(), key=lambda kv: (-kv[1], kv[0]))
        return dict(top[:max_words])
    return dict(folded)


def _pair_counts(vocab: dict[tuple, int]) -> Counter:
    pc: Counter = Counter()
    for sym, n in vocab.items():
        for i in range(len(sym) - 1):
            pc[(sym[i], sym[i + 1])] += n
    return pc


def train_bpe(ds: ray.data.Dataset, num_merges: int,
              text_col: str = "text", max_words: int = 50_000,
              prune_factor: int = 4) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word histogram.
    Returns the ordered merge list (rank = position)."""
    hist = word_histogram(ds, text_col, max_words, prune_factor)
    vocab: dict[tuple, int] = {
        tuple(w) + (_EOW,): n for w, n in hist.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Greedy lowest-rank-first merging (standard BPE inference)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(ds: ray.data.Dataset, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               emit_tokens: bool = False) -> ray.data.Dataset:
    """Tokenize every document with a learned merge table.

    Output: (id, n_tokens_bpe[, tokens]) — counts by default (the
    corpus-prep signal); ``emit_tokens`` adds the token list column.
    The merge table broadcasts once; per-batch distinct words are
    encoded once and reused (memo dict).
    """
    ranks = {m: i for i, m in enumerate(merges)}
    rref = ray.put(ranks)

    def encode(batch: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        memo: dict[str, list[str]] = {}
        counts = np.empty(batch.num_rows, dtype=np.int64)
        toks_out: list[list[str]] = []
        for j, t in enumerate(batch.column(text_col).to_pylist()):
            words = (t or "").lower().split()
            n = 0
            doc_toks: list[str] = []
            for w in words:
                enc = memo.get(w)
                if enc is None:
                    enc = memo[w] = _encode_word(w, rk)
                n += len(enc)
                if emit_tokens:
                    doc_toks.extend(enc)
            counts[j] = n
            if emit_tokens:
                toks_out.append(doc_toks)
        cols = {id_col: batch.column(id_col),
                "n_tokens_bpe": pa.array(counts)}
        if emit_tokens:
            cols["tokens"] = pa.array(toks_out,
                                      pa.list_(pa.string()))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")
