"""Property-based tests (hypothesis) over the pure kernels — the
reference has none (SURVEY §5); these harden the conformance-critical
primitives against arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web2llmstxt_ray.functions.urls import (
    canonicalize_url, hash64, hash64_batch, score_url, score_urls)
from web2llmstxt_ray.stages.spans import extract_spans, spans_key

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters="-._~/?#&=%"),
    min_size=0, max_size=60)


@st.composite
def urls(draw):
    host = draw(st.sampled_from(["a.test", "B.Test", "www.site.example"]))
    path = draw(url_text)
    return f"https://{host}/{path}"


class TestCanonicalizeProperties:
    @settings(max_examples=100, deadline=None)
    @given(urls())
    def test_idempotent(self, url):
        once = canonicalize_url(url)
        assert canonicalize_url(once) == once

    @settings(max_examples=100, deadline=None)
    @given(urls())
    def test_no_fragment_lowercase_host(self, url):
        c = canonicalize_url(url)
        assert "#" not in c
        host = c.split("//", 1)[-1].split("/", 1)[0]
        assert host == host.lower()


class TestHashProperties:
    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.text(max_size=100), min_size=0, max_size=50))
    def test_batch_equals_scalar(self, strings):
        vec = hash64_batch(strings)
        scalar = np.array([hash64(s) for s in strings], dtype=np.uint64)
        np.testing.assert_array_equal(vec, scalar)


class TestScorerProperties:
    @settings(max_examples=100, deadline=None)
    @given(urls())
    def test_vectorized_equals_scalar(self, url):
        base = "https://a.test"
        assert score_urls([url], base)[0] == score_url(url, base)

    @settings(max_examples=100, deadline=None)
    @given(urls())
    def test_score_bounds(self, url):
        s = score_url(url, "https://a.test")
        assert s == 0.0 or 0.1 <= s <= 8.0


class TestSpanProperties:
    text_blocks = st.text(alphabet=st.characters(
        blacklist_categories=("Cs",)), max_size=400)

    @settings(max_examples=100, deadline=None)
    @given(text_blocks)
    def test_offsets_strictly_increasing_and_in_range(self, text):
        spans = extract_spans(text)
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        assert len(set(offsets)) == len(offsets)
        for o in offsets:
            assert 0 <= o < max(1, len(text))

    @settings(max_examples=100, deadline=None)
    @given(text_blocks)
    def test_deterministic(self, text):
        assert spans_key(extract_spans(text)) == spans_key(extract_spans(text))

    @settings(max_examples=100, deadline=None)
    @given(text_blocks)
    def test_kinds_valid_and_fields_consistent(self, text):
        for s in extract_spans(text):
            assert s["kind"] in ("text", "heading", "code", "image", "link_media")
            if s["kind"] in ("image", "link_media"):
                assert s["media_ref"]
            else:
                assert s["media_ref"] == ""


class TestSkylineKernelProperties:
    """The block-local 2-D skyline kernel (relational._skyline_block)
    against the O(n²) dominance definition, arbitrary integer data —
    duplicates, ties and single-group edge cases included."""

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                    min_size=0, max_size=60))
    def test_matches_bruteforce(self, pts):
        import pandas as pd

        from web2llmstxt_ray.ops.relational import _skyline_block

        df = pd.DataFrame({
            "id": np.arange(len(pts), dtype="int64"),
            "mn": np.array([p[0] for p in pts], dtype="int64"),
            "mx": np.array([p[1] for p in pts], dtype="int64")})
        got = set(_skyline_block(df, "id", "mn", "mx")["id"])
        want = {int(r["id"]) for _, r in df.iterrows()
                if not any(
                    q["mn"] <= r["mn"] and q["mx"] >= r["mx"]
                    and (q["mn"] < r["mn"] or q["mx"] > r["mx"])
                    for _, q in df.iterrows())}
        assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEdLe1Properties:
    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abc", max_size=8),
           st.text(alphabet="abc", max_size=8))
    def test_matches_dp_levenshtein(self, a, b):
        from web2llmstxt_ray.ops.dedup import _ed_le1

        assert _ed_le1(a, b) == (_lev(a, b) <= 1)
