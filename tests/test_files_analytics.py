"""File utils (M20/K7/S1/S6), analytics (A1-A3/A7), pagination (M4),
politeness pacing, and approximate-seen-mode crawl."""

import time

import pyarrow as pa
import pytest

from web2llmstxt_ray.functions import analytics as AN
from web2llmstxt_ray.functions import files as F
from web2llmstxt_ray.functions.links import synthesize_pagination


class TestFiles:
    def test_clean_filename(self):
        assert F.clean_filename("a/b:c*d?.txt") == "a_b_c_d_.txt"
        assert F.clean_filename("   ") == "unnamed"
        assert len(F.clean_filename("x" * 500)) <= 120

    def test_numbered_availability(self, tmp_path):
        p = str(tmp_path / "out.txt")
        assert F.available_numbered_path(p) == p
        open(p, "w").write("x")
        p1 = F.available_numbered_path(p)
        assert p1.endswith("out (1).txt")
        open(p1, "w").write("x")
        assert F.available_numbered_path(p).endswith("out (2).txt")

    def test_write_safe_file_atomic(self, tmp_path):
        p = str(tmp_path / "sub" / "f.txt")
        F.write_safe_file(p, "hello")
        assert open(p).read() == "hello"
        F.write_safe_file(p, "world")
        assert open(p).read() == "world"

    def test_normalize_seed_url(self):
        assert F.normalize_seed_url(" example.com ") == "https://example.com"
        assert F.normalize_seed_url("http://x.test") == "http://x.test"

    def test_cache_roundtrip(self, tmp_path):
        import web2llmstxt_ray.schema as S

        p = str(tmp_path / "cache.parquet")
        rows = pa.Table.from_pydict(
            {"url": ["u1", "u2"], "content_hash": ["h1", "h2"],
             "description": ["d1", "d2"]}, schema=S.DESCRIPTION_CACHE)
        assert F.append_description_cache(p, rows) == 2
        cache = F.load_description_cache(p)
        assert cache[("u1", "h1")] == "d1"
        # append merges, last write wins
        rows2 = pa.Table.from_pydict(
            {"url": ["u1", "u3"], "content_hash": ["h1", "h3"],
             "description": ["d1-new", "d3"]}, schema=S.DESCRIPTION_CACHE)
        assert F.append_description_cache(p, rows2) == 3
        assert F.load_description_cache(p)[("u1", "h1")] == "d1-new"


class TestAnalytics:
    def _pages(self):
        import web2llmstxt_ray.schema as S

        return pa.Table.from_pydict({
            "url": ["a", "b", "c"], "title": ["A", "B", "C"],
            "content": ["x", "y", "z"],
            "word_count": pa.array([100, 60, 80], pa.int64()),
            "score": pa.array([10.0, 7.0, 4.0], pa.float64()),
            "depth": pa.array([0, 1, 1], pa.int32()),
            "session_id": ["s"] * 3,
            "crawl_timestamp": pa.array([0] * 3, pa.timestamp("us")),
            "discovery_phase": ["main_page", "depth_1", "depth_1"],
            "visit_index": pa.array([0, 1, 2], pa.int64()),
        }, schema=S.PAGE_RECORDS)

    def test_crawl_analytics(self):
        a = AN.crawl_analytics(self._pages())
        assert a["total_pages"] == 3
        assert a["pages_per_depth"] == {"0": 1, "1": 2}
        assert a["mean_score"] == 7.0
        assert a["total_words"] == 240

    def test_empty(self):
        import web2llmstxt_ray.schema as S

        assert AN.crawl_analytics(S.PAGE_RECORDS.empty_table())["total_pages"] == 0

    def test_run_metadata_keys(self):
        from web2llmstxt_ray.pipelines.llms import Describer

        pages = self._pages()
        entries = Describer()(pages)
        md = AN.run_metadata("https://a.test", "a.test", pages, entries,
                             "2025-01-01T00:00:00", "deterministic-fallback",
                             "text", 1.23, "systematic")
        for k in ("source_url", "domain", "total_pages_crawled",
                  "total_entries_processed", "generated_at", "model_used",
                  "export_format", "processing_time_seconds"):
            assert k in md
        assert md["analytics"]["entries"]["total_entries"] == 3


class TestPagination:
    def test_neighbors_for_page_pattern(self):
        out = synthesize_pagination("https://a.test/blog?page=3", span=2)
        assert "https://a.test/blog?page=1" in out
        assert "https://a.test/blog?page=5" in out
        assert "https://a.test/blog?page=3" not in out

    def test_path_style(self):
        out = synthesize_pagination("https://a.test/list/page/2/", span=1)
        assert "https://a.test/list/page/1/" in out
        assert "https://a.test/list/page/3/" in out

    def test_offset_style(self):
        out = synthesize_pagination("https://a.test/x?offset=50", span=1)
        assert any("offset=49" in u or "offset=51" in u for u in out)

    def test_probe_when_no_pattern(self):
        out = synthesize_pagination("https://a.test/blog", probe_pages=4)
        assert out == [f"https://a.test/blog?page={n}" for n in range(2, 6)]

    def test_no_probe_by_default(self):
        assert synthesize_pagination("https://a.test/blog") == []


class TestPolitenessPacing:
    def test_crawl_delay_enforced(self, small_site, disallow_by_host, tmp_path):
        """Same-host fetches must be spaced by crawl_delay; the wave
        fetch pins each host to one worker, so pacing is global."""
        from web2llmstxt_ray.pipelines.crawl import CrawlConfig, DistributedCrawler

        _, _, site_idx = small_site
        delay_ms = 40
        cfg = CrawlConfig(base_url="https://site0.test", max_pages=3,
                          host_delays_ms={"site0.test": delay_ms},
                          run_dir=None)
        c = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
        t0 = time.perf_counter()
        res = c.run()
        elapsed = time.perf_counter() - t0
        site0_fetches = sum(
            1 for m in res.metrics if "wave_size" in m for _ in range(m["wave_size"]))
        # at least (n-1) * delay of pacing for the same-host fetches
        assert res.total_fetches >= 5
        assert elapsed >= (res.total_fetches - 4) * delay_ms / 1000.0 * 0.5
        c.shutdown()


class TestApproximateSeenModes:
    @pytest.mark.parametrize("mode", ["cuckoo", "bloom", "cuckoo-auto",
                                      "cuckoo-spill"])
    def test_crawl_matches_oracle_under_approx_seen(
            self, small_site, disallow_by_host, tmp_path, mode):
        """At small scale the approximate filters have ~no false
        positives, so the crawl should still match the oracle exactly."""
        from web2llmstxt_ray.pipelines.crawl import CrawlConfig, DistributedCrawler
        from web2llmstxt_ray.pipelines.oracle import crawl_oracle

        _, _, site_idx = small_site
        oracle = crawl_oracle(site_idx, "https://site0.test", max_pages=6,
                              disallow_by_host=disallow_by_host)
        cfg = CrawlConfig(base_url="https://site0.test", max_pages=6,
                          seen_mode=mode, run_dir=None)
        c = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
        res = c.run()
        assert res.visit_order == oracle.visit_order
        c.shutdown()


class TestEnvWriter:
    def test_upsert_roundtrip_preserves_other_lines(self, tmp_path):
        from web2llmstxt_ray.functions.files import (read_env_file,
                                                     save_env_var)

        p = str(tmp_path / ".env")
        with open(p, "w") as f:
            f.write("# comment stays\nOTHER_KEY=abc\n"
                    "GEMINI_API_KEY=old\nTRAILING=1\n")
        save_env_var("GEMINI_API_KEY", "new-key-123", p)
        lines = open(p).read().splitlines()
        assert lines[0] == "# comment stays"
        assert "GEMINI_API_KEY=new-key-123" in lines
        assert lines.index("OTHER_KEY=abc") < \
            lines.index("GEMINI_API_KEY=new-key-123") < \
            lines.index("TRAILING=1")
        assert read_env_file(p)["OTHER_KEY"] == "abc"

    def test_append_when_missing_and_fresh_file(self, tmp_path):
        from web2llmstxt_ray.functions.files import (read_env_file,
                                                     save_env_var)

        p = str(tmp_path / "sub" / ".env")   # dir created on demand
        save_env_var("K1", "v1", p)
        save_env_var("K2", "v=with=equals", p)
        env = read_env_file(p)
        assert env == {"K1": "v1", "K2": "v=with=equals"}

    def test_crash_safety_no_torn_file(self, tmp_path, monkeypatch):
        # a failure between tempfile write and rename must leave the
        # original .env byte-identical and no stray temp content at the
        # target path
        import os as _os

        from web2llmstxt_ray.functions.files import save_env_var

        p = str(tmp_path / ".env")
        with open(p, "w") as f:
            f.write("SAFE=yes\n")
        orig_replace = _os.replace

        def boom(src, dst):
            raise OSError("simulated crash at rename")

        monkeypatch.setattr(_os, "replace", boom)
        try:
            save_env_var("SAFE", "clobbered", p)
        except OSError:
            pass
        monkeypatch.setattr(_os, "replace", orig_replace)
        assert open(p).read() == "SAFE=yes\n"
        leftovers = [n for n in _os.listdir(tmp_path)
                     if n.startswith(".env_tmp_")]
        assert leftovers == []

    def test_invalid_key_rejected(self, tmp_path):
        import pytest

        from web2llmstxt_ray.functions.files import save_env_var

        with pytest.raises(ValueError):
            save_env_var("BAD=KEY", "v", str(tmp_path / ".env"))
        with pytest.raises(ValueError):
            save_env_var("K", "multi\nline", str(tmp_path / ".env"))
