"""BPE training/encoding: sequential oracle (independent reference
loop, no pruning/memoization), partition invariance, round-trip and
monotonicity properties."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.bpe import (
    _EOW, bpe_encode, train_bpe, word_histogram)


def _seq_train(texts, num_merges):
    """Independent reference: full (unpruned) histogram + the textbook
    merge loop written over explicit lists."""
    hist = Counter()
    for t in texts:
        hist.update((t or "").lower().split())
    vocab = {tuple(w) + (_EOW,): n for w, n in hist.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        nv = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def _corpus(n=50, seed=11):
    rng = np.random.RandomState(seed)
    vocab = ["low", "lower", "lowest", "new", "newer", "wider", "wide",
             "render", "rendering"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(4, 15)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})


class TestTrain:
    def test_matches_sequential_oracle(self):
        t = _corpus()
        ds = ray.data.from_arrow(t).repartition(5)
        texts = t.column("text").to_pylist()
        got = train_bpe(ds, num_merges=25)
        assert got == _seq_train(texts, 25)

    def test_partition_invariant(self):
        t = _corpus(n=40, seed=2)
        a = train_bpe(ray.data.from_arrow(t).repartition(1), 15)
        b = train_bpe(ray.data.from_arrow(t).repartition(9), 15)
        assert a == b

    def test_histogram_exact_small(self):
        t = _corpus(n=30)
        ds = ray.data.from_arrow(t).repartition(4)
        want = Counter()
        for txt in t.column("text").to_pylist():
            want.update(txt.lower().split())
        assert word_histogram(ds) == dict(want)


class TestEncode:
    def test_roundtrip_and_counts(self):
        t = _corpus()
        ds = ray.data.from_arrow(t).repartition(4)
        merges = train_bpe(ds, num_merges=20)
        out = bpe_encode(ds, merges, emit_tokens=True).take_all()
        by_id = {r["doc_id"]: r for r in out}
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            r = by_id[did]
            # concatenated tokens reproduce the words (with EOW marks)
            joined = "".join(r["tokens"]).replace(_EOW, " ").strip()
            assert joined == " ".join(txt.lower().split())
            assert r["n_tokens_bpe"] == len(r["tokens"])

    def test_more_merges_fewer_tokens(self):
        t = _corpus(n=60, seed=5)
        ds = ray.data.from_arrow(t).repartition(3)
        m40 = train_bpe(ds, 40)
        tot0 = sum(r["n_tokens_bpe"]
                   for r in bpe_encode(ds, []).take_all())
        tot40 = sum(r["n_tokens_bpe"]
                    for r in bpe_encode(ds, m40).take_all())
        assert tot40 < tot0

    def test_zero_merges_is_chars(self):
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["ab cd"])})
        out = bpe_encode(ray.data.from_arrow(t), []).take_all()
        assert out[0]["n_tokens_bpe"] == 6   # a b ▁ c d ▁
