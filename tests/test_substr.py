"""Shared-substring detection: rolling-hash correctness, winnowing
guarantee vs a brute-force LCS oracle, verified-run exactness."""

import numpy as np
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.substr import (
    _window_hashes, _winnow, excise_shared_substrings,
    shared_substring_pairs, winnow_fingerprints)

_B = 1099511628211
_M = 1 << 64


def _direct_hash(data: bytes, i: int, k: int) -> int:
    h = 0
    for t in range(k):
        h = (h * _B + data[i + t]) % _M
    return h


def _lcs_len(a: bytes, b: bytes) -> int:
    """Brute-force longest common substring (DP)."""
    prev = [0] * (len(b) + 1)
    best = 0
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


class TestRollingHash:
    def test_matches_direct_polynomial(self):
        rng = np.random.RandomState(0)
        data = bytes(rng.randint(0, 256, 100).astype(np.uint8))
        h = _window_hashes(data, 8)
        assert len(h) == 93
        for i in (0, 1, 50, 92):
            assert int(h[i]) == _direct_hash(data, i, 8)

    def test_short_input(self):
        assert len(_window_hashes(b"abc", 8)) == 0
        assert len(_winnow(np.empty(0, np.uint64), 4)) == 0


def _docs(shared: str, n_other: int = 10, seed=4):
    """Two docs embedding `shared` at different offsets + noise docs."""
    rng = np.random.RandomState(seed)

    def noise(n):
        return "".join(chr(rng.randint(97, 123)) for _ in range(n))

    texts = [noise(40) + shared + noise(30),
             noise(75) + shared + noise(15)]
    texts += [noise(rng.randint(80, 160)) for _ in range(n_other)]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


class TestSharedSubstrings:
    def test_planted_match_found_with_exact_length(self):
        shared = "the quick brown fox jumps over the lazy dog repeatedly"
        t = _docs(shared)
        ds = ray.data.from_arrow(t).repartition(4)
        out = shared_substring_pairs(ds, k=16, w=4).to_pandas()
        hit = out[(out.a == 0) & (out.b == 1)]
        assert len(hit) == 1
        texts = t.column("text").to_pylist()
        want = _lcs_len(texts[0].encode(), texts[1].encode())
        assert int(hit["length"].iloc[0]) == want
        # offsets point at a REAL equal run of that length
        oa, ob, ln = (int(hit["off_a"].iloc[0]),
                      int(hit["off_b"].iloc[0]),
                      int(hit["length"].iloc[0]))
        assert (texts[0].encode()[oa:oa + ln]
                == texts[1].encode()[ob:ob + ln])

    def test_no_false_pairs_below_threshold(self):
        # pure noise docs: no pair shares >= w+k-1 bytes
        t = _docs("xyz", n_other=12, seed=9)   # shared too short
        ds = ray.data.from_arrow(t).repartition(3)
        out = shared_substring_pairs(ds, k=16, w=4).to_pandas()
        texts = [s.encode() for s in t.column("text").to_pylist()]
        for _, r in out.iterrows():
            a, b, ln = int(r["a"]), int(r["b"]), int(r["length"])
            oa, ob = int(r["off_a"]), int(r["off_b"])
            assert ln >= 19                     # min_len = w+k-1
            assert texts[a][oa:oa + ln] == texts[b][ob:ob + ln]

    def test_partition_invariant(self):
        shared = "content addressed winnowing selects identical anchors"
        t = _docs(shared, n_other=6, seed=2)
        a = shared_substring_pairs(
            ray.data.from_arrow(t).repartition(1), k=16, w=4).to_pandas()
        b = shared_substring_pairs(
            ray.data.from_arrow(t).repartition(7), k=16, w=4).to_pandas()
        assert a.equals(b)

    def test_fingerprints_shift_invariant_selection(self):
        # the same substring yields at least one identical fp in both
        shared = "winnowing guarantees shared fingerprints inside runs"
        t = _docs(shared, n_other=0)
        ds = ray.data.from_arrow(t)
        fps = winnow_fingerprints(ds, k=16, w=4).take_all()
        s0 = {r["fp"] for r in fps if r["doc_id"] == 0}
        s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
        assert s0 & s1


class TestExcise:
    def test_removes_duplicate_keeps_canonical(self):
        shared = "the quick brown fox jumps over the lazy dog repeatedly"
        t = _docs(shared, n_other=8, seed=6)
        ds = ray.data.from_arrow(t).repartition(3)
        out = (excise_shared_substrings(ds, k=16, w=4)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        texts = t.column("text").to_pylist()
        # canonical doc (lower id) untouched
        assert out.loc[0, "text"] == texts[0]
        assert out.loc[0, "n_removed_bytes"] == 0
        # dup doc had exactly the maximal shared run excised
        want_len = _lcs_len(texts[0].encode(), texts[1].encode())
        assert out.loc[1, "n_removed_bytes"] == want_len
        assert shared not in out.loc[1, "text"]
        assert len(out.loc[1, "text"]) == len(texts[1]) - want_len
        # untouched noise docs pass through byte-identical
        for i in range(2, len(texts)):
            assert out.loc[i, "text"] == texts[i]

    def test_overlapping_intervals_merge(self):
        # one doc duplicating runs from TWO canonical docs with overlap
        import pyarrow as pa

        base = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOP"
        texts = [base[:40] + "~~~1~~~", "###2###" + base[20:] + "!!!",
                 "<<" + base + ">>"]   # doc2 contains both runs, overlapping
        t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                      "text": pa.array(texts)})
        out = (excise_shared_substrings(
            ray.data.from_arrow(t), k=16, w=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # doc 2 loses the union of the two overlapping runs = all of base
        assert base not in out.loc[2, "text"]
        assert out.loc[2, "n_removed_bytes"] == len(base)
        assert out.loc[2, "text"] == "<<>>"


class TestSharedSubstringsDatasetMode:
    def test_dataset_parity(self):
        shared = "the quick brown fox jumps over the lazy dog repeatedly"
        t = _docs(shared)
        ds = ray.data.from_arrow(t).repartition(4)
        tbl = shared_substring_pairs(ds, k=16, w=4)
        dset = shared_substring_pairs(ds, k=16, w=4, as_dataset=True)
        import ray.data as rd

        assert isinstance(dset, rd.Dataset)
        cols = ["a", "b", "length", "off_a", "off_b"]
        got = sorted(map(tuple,
                         dset.to_pandas()[cols].astype("int64")
                         .values.tolist()))
        want = sorted(map(tuple,
                          tbl.to_pandas()[cols].values.tolist()))
        assert got == want and len(want) >= 1
