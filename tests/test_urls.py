"""URL canonicalization / scoring / sharding (SURVEY M1, F3, §7.3)."""

import numpy as np
import pytest

from web2llmstxt_ray.functions import urls as U


class TestCanonicalize:
    def test_strips_fragment(self):
        assert U.canonicalize_url("https://a.test/x#frag") == "https://a.test/x"

    def test_strips_trailing_slash_keeps_root(self):
        assert U.canonicalize_url("https://a.test/x/") == "https://a.test/x"
        assert U.canonicalize_url("https://a.test/") == "https://a.test/"
        assert U.canonicalize_url("https://a.test") == "https://a.test/"

    def test_lowercases_netloc(self):
        assert U.canonicalize_url("https://A.Test/Path") == "https://a.test/Path"

    def test_drops_tracking_params_keeps_others(self):
        url = "https://a.test/p?utm_source=x&id=7&fbclid=z&q=hi"
        assert U.canonicalize_url(url) == "https://a.test/p?id=7&q=hi"

    def test_drops_utm_prefix_generally(self):
        assert U.canonicalize_url("https://a.test/p?utm_weird=1") == "https://a.test/p"

    def test_idempotent(self):
        u = "https://A.test/x/?utm_source=a&k=1#f"
        once = U.canonicalize_url(u)
        assert U.canonicalize_url(once) == once


class TestScorer:
    BASE = "https://site0.test"

    def test_asset_urls_zero(self):
        for ext in (".png", ".css", ".js", ".pdf", ".xml"):
            assert U.score_url(f"{self.BASE}/thing{ext}", self.BASE) == 0.0

    def test_high_value_keyword(self):
        # docs: +3 keyword, +2 shallow (1 seg), +1 alpha seg → 7.0
        assert U.score_url(f"{self.BASE}/docs", self.BASE) == 7.0

    def test_medium_value_keyword(self):
        assert U.score_url(f"{self.BASE}/contact", self.BASE) == pytest.approx(5.5)

    def test_low_value_penalty(self):
        # login: -5, +2 shallow, +1 alpha → max(0.1, 1-5+2+1) = 0.1
        assert U.score_url(f"{self.BASE}/login", self.BASE) == 0.1

    def test_pagination_penalty(self):
        s_plain = U.score_url(f"{self.BASE}/deep/one/two/three/four", self.BASE)
        s_page = U.score_url(f"{self.BASE}/deep/one/two/three/page/4", self.BASE)
        assert s_page < s_plain

    def test_long_query_penalty(self):
        short = U.score_url(f"{self.BASE}/x?k=1", self.BASE)
        long_ = U.score_url(f"{self.BASE}/x?k=12345678901234", self.BASE)
        assert long_ == pytest.approx(short - 2.0)

    def test_floor(self):
        u = f"{self.BASE}/login/a/b/c/d/e?page=2&verylongparam=12345"
        assert U.score_url(u, self.BASE) == 0.1

    def test_vectorized_matches_scalar(self, small_site=None):
        import random

        rng = random.Random(7)
        words = ["docs", "login", "blog", "x", "page", "team", "asset.png",
                 "deep", "getting-started", "search"]
        urls = []
        for _ in range(500):
            depth = rng.randint(0, 6)
            path = "/".join(rng.choice(words) for _ in range(depth))
            q = "?page=2" if rng.random() < 0.2 else (
                "?verylongquery=abcdefgh" if rng.random() < 0.2 else "")
            urls.append(f"{self.BASE}/{path}{q}")
        vec = U.score_urls(urls, self.BASE)
        scalar = np.array([U.score_url(u, self.BASE) for u in urls])
        np.testing.assert_array_equal(vec, scalar)


class TestDomains:
    def test_same_domain_www_variants(self):
        assert U.same_domain("https://www.a.test/x", "https://a.test")
        assert U.same_domain("https://a.test/x", "https://www.a.test")
        assert not U.same_domain("https://b.test/x", "https://a.test")

    def test_extract_domain(self):
        assert U.extract_domain_from_url("https://www.example.com/p") == "example.com"
        assert U.extract_domain_from_url("example.com") == "example.com"
        assert U.extract_domain_from_url("not a url") == "unknown_domain"
        assert U.extract_domain_from_url("") == "unknown_domain"

    def test_hash64_stable(self):
        # FNV-1a known vector
        assert U.hash64("") == 0xCBF29CE484222325
        assert U.hash64("a") == 0xAF63DC4C8601EC8C

    def test_shard_routing_covers_all(self):
        shards = {U.shard_of(f"https://a.test/{i}", 8) for i in range(1000)}
        assert shards == set(range(8))


class TestHashBatch:
    def test_matches_scalar(self):
        import random
        rng = random.Random(11)
        urls = ["", "a", "π∆ü", "https://example.com/path?x=1"] + [
            "https://h%d.test/%s" % (rng.randint(0, 99),
                                     "x" * rng.randint(0, 80))
            for _ in range(500)]
        vec = U.hash64_batch(urls)
        scalar = np.array([U.hash64(u) for u in urls], dtype=np.uint64)
        np.testing.assert_array_equal(vec, scalar)

    def test_empty_batch(self):
        assert len(U.hash64_batch([])) == 0


class TestHash64DictionaryPath:
    def test_large_repetitive_batch_equals_scalar(self):
        # >=1024 strings with heavy repetition triggers the
        # dictionary-encode fast path; must stay bit-identical
        import numpy as np

        from web2llmstxt_ray.functions import urls as U

        words = [f"w{i % 37}" for i in range(5000)] + ["", "x", "étude"] * 10
        vec = U.hash64_batch(words)
        scalar = np.array([U.hash64(w) for w in words], dtype=np.uint64)
        assert (vec == scalar).all()

    def test_large_distinct_batch_equals_scalar(self):
        # all-distinct large batch skips the gather (ratio guard) but
        # must still match
        import numpy as np

        from web2llmstxt_ray.functions import urls as U

        words = [f"unique-{i}" for i in range(3000)]
        vec = U.hash64_batch(words)
        scalar = np.array([U.hash64(w) for w in words], dtype=np.uint64)
        assert (vec == scalar).all()
