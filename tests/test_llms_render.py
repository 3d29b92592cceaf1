"""Description stage, categorization and llms.txt rendering (K2/K3,
A4-A6, T1-T3 deterministic path) + the end-to-end generate pipeline."""

import pyarrow as pa

from web2llmstxt_ray.functions.categorize import categorize_entry, site_summary
from web2llmstxt_ray.pipelines.generate import generate_llmstxt
from web2llmstxt_ray.pipelines.llms import (
    Describer, new_cache_rows, render_llms_full_txt, render_llms_txt)

BASE = "https://site0.test"


def _pages_table():
    return pa.table({
        "url": [f"{BASE}/", f"{BASE}/docs", f"{BASE}/blog/post"],
        "title": ["Site Zero Home", "Docs Overview", "A Blog Post"],
        "content": ["welcome to the api documentation portal and docs",
                    "a tutorial and guide for the engine",
                    "blog news article about releases"],
        "word_count": pa.array([60, 80, 90], pa.int64()),
        "visit_index": pa.array([0, 1, 2], pa.int64()),
    })


class TestDescriber:
    def test_deterministic_fallback(self):
        d = Describer()
        out = d(_pages_table())
        descs = out.column("description").to_pylist()
        assert descs[0] == "API documentation for Site Zero Home. From site0.test."
        assert out.column("from_cache").to_pylist() == [False, False, False]

    def test_cache_hit(self):
        from web2llmstxt_ray.functions.text import content_hash

        url, title, content = f"{BASE}/docs", "Docs Overview", \
            "a tutorial and guide for the engine"
        cache = {(url, content_hash(title, content)): "CACHED DESC"}
        d = Describer(cache_ref=cache)
        out = d(_pages_table())
        by_url = dict(zip(out.column("url").to_pylist(),
                          out.column("description").to_pylist()))
        assert by_url[url] == "CACHED DESC"

    def test_new_cache_rows_excludes_hits(self):
        from web2llmstxt_ray.functions.text import content_hash

        pages = _pages_table()
        url = f"{BASE}/docs"
        cache = {(url, content_hash("Docs Overview",
                                    "a tutorial and guide for the engine")): "X"}
        entries = Describer(cache_ref=cache)(pages)
        rows = new_cache_rows(entries, pages)
        assert url not in rows.column("url").to_pylist()
        assert rows.num_rows == 2


class TestCategorize:
    def test_first_match_wins_api_before_docs(self):
        assert categorize_entry(f"{BASE}/api/docs", "", "") == "API & Technical Reference"
        assert categorize_entry(f"{BASE}/docs/intro", "", "") == "Key Documentation"
        assert categorize_entry(f"{BASE}/blog/x", "", "") == "Blog & Resources"
        assert categorize_entry(f"{BASE}/random", "", "") == "General Information"
        assert categorize_entry(f"{BASE}/weird?page=2", "", "") == "Other Pages"

    def test_summary_rules(self):
        assert site_summary(["api documentation for developers"]) == \
            "Software documentation, API references, and developer resources."
        assert site_summary([""]) == "A website with various content and resources."


class TestRender:
    def test_llms_txt_shape(self):
        pages = _pages_table()
        entries = Describer()(pages)
        text = render_llms_txt(BASE + "/", entries, pages, "2025-06-26")
        lines = text.splitlines()
        assert lines[0] == "# Site Zero Home"
        assert lines[2].startswith("> ")
        assert "Generated from 3 pages on 2025-06-26" in lines[4]
        assert any(line.startswith("## ") for line in lines)
        assert any(line.startswith("- [Docs Overview](") for line in lines)

    def test_llms_full_txt_shape(self):
        pages = _pages_table()
        text = render_llms_full_txt(BASE, pages, "2025-06-26T00:00:00", "m", 1.5)
        assert "## Page 1: Site Zero Home" in text
        assert f"**URL:** {BASE}/docs" in text
        assert text.count("---") == 3

    def test_llms_full_page_limit(self):
        text = render_llms_full_txt(BASE, _pages_table(), max_pages=2)
        assert "## Page 3" not in text
        assert "Displaying 2 of 3" in text


class TestGenerateEndToEnd:
    def test_systematic(self, small_site, disallow_by_host, tmp_path):
        _, _, idx = small_site
        res = generate_llmstxt(
            idx, BASE, str(tmp_path / "out"), str(tmp_path / "run"),
            max_pages=6, crawl_strategy="systematic",
            disallow_by_host=disallow_by_host)
        assert res.pages.num_rows > 0
        assert res.entries.num_rows == res.pages.num_rows
        # entries follow crawl order
        assert res.entries.column("index").to_pylist() == \
            sorted(res.entries.column("index").to_pylist())
        assert len(res.written) == 2
        with open(res.written[0]) as f:
            content = f.read()
        assert content.startswith("# ")
        assert "Generated from" in content

    def test_sitemap_strategy(self, small_site, tmp_path):
        from web2llmstxt_ray.sources.sitemap import make_sitemap_xml

        site, _, idx = small_site
        urls = [u for u in site.column("url").to_pylist()][:30]
        bodies = {f"{BASE}/sitemap.xml": make_sitemap_xml(urls)}
        res = generate_llmstxt(
            idx, BASE, str(tmp_path / "out2"), str(tmp_path / "run2"),
            max_pages=15, crawl_strategy="sitemap", sitemap_bodies=bodies)
        assert 0 < res.pages.num_rows <= 15
        assert res.metadata["crawl_strategy"] == "sitemap"

    def test_json_yaml_formats(self, small_site, disallow_by_host, tmp_path):
        import json

        _, _, idx = small_site
        res = generate_llmstxt(
            idx, BASE, str(tmp_path / "outj"), str(tmp_path / "runj"),
            max_pages=4, export_format="json",
            disallow_by_host=disallow_by_host)
        with open(res.written[0]) as f:
            payload = json.load(f)
        # reference-exact keys (llmsgen/utils/file_utils.py:176-178)
        assert set(payload) == {"metadata", "llms_entries",
                                "full_content_pages"}
        res2 = generate_llmstxt(
            idx, BASE, str(tmp_path / "outy"), str(tmp_path / "runy"),
            max_pages=4, export_format="yaml",
            disallow_by_host=disallow_by_host)
        assert res2.written[0].endswith(".yaml")


class TestStreamingRender:
    def test_streaming_full_text(self, tmp_path):
        import ray.data

        from web2llmstxt_ray.pipelines.llms import write_llms_full_streaming

        pages = _pages_table()
        out = str(tmp_path / "full.txt")
        n = write_llms_full_streaming(
            ray.data.from_arrow(pages), out, BASE, "2025-06-26", "m",
            total_pages=3)
        assert n == 3
        text = open(out).read()
        assert "## Page 1: Site Zero Home" in text
        assert "## Page 3: A Blog Post" in text
        assert text.count("---") == 3


class TestExportPayloadGating:
    def test_include_full_text_gate_and_unicode(self, tmp_path):
        """include_full_text=False drops full_content_pages; non-ASCII
        text survives unescaped (ensure_ascii=False), both mirroring
        llmsgen/utils/file_utils.py:166-183."""
        import json as _json

        import pyarrow as pa

        from web2llmstxt_ray.pipelines.llms import (
            ENTRY_SCHEMA, export_payload, write_outputs)

        entries = pa.Table.from_pylist([{
            "url": "https://x.test/", "title": "Café",
            "description": "déjà vu", "word_count": 60,
            "session_id": "s", "index": 0, "category": "Main",
            "from_cache": False}], schema=ENTRY_SCHEMA)
        pages = pa.table({"url": ["https://x.test/"], "title": ["Café"],
                          "content": ["café content"]})
        assert "full_content_pages" not in export_payload(
            {}, entries, pages, include_full_text=False)
        paths = write_outputs(str(tmp_path), "https://x.test/", entries,
                              pages, {}, export_format="json")
        raw = open(paths[0], encoding="utf-8").read()
        assert "Café" in raw and "\\u00e9" not in raw


def _big_site_index(n_pages=240, page_kb=512, seed=3):
    """Synthetic sitemap site with ~n_pages × page_kb of markdown —
    big enough that any driver materialization of content is visible."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = "https://big.test"
    word_pool = [f"word{i}" for i in range(5000)]
    idx, urls = {}, []
    words_per_page = max(60, (page_kb * 1024) // 8)
    for i in range(n_pages):
        u = f"{base}/p{i:04d}"
        content = " ".join(rng.choice(word_pool, size=words_per_page))
        idx[u] = {"host": "big.test", "status": 200, "html": "",
                  "markdown": content, "title_meta": f"Page {i}",
                  "word_count": words_per_page}
        urls.append(u)
    return base, urls, idx


class TestStreamingGenerateScale:
    def test_driver_never_materializes_content(self, monkeypatch,
                                               tmp_path):
        """The generate path must not collect any content-bearing
        Dataset to the driver: every to_arrow_refs/take_all/to_pandas
        call during generate_llmstxt is asserted content-free (the
        probe pass collects only 30-word snippets under 'text')."""
        import ray.data as rd

        from web2llmstxt_ray.sources.sitemap import make_sitemap_xml

        offenders = []
        orig_refs = rd.Dataset.to_arrow_refs
        orig_take_all = rd.Dataset.take_all
        orig_to_pandas = rd.Dataset.to_pandas

        def check(self, where):
            try:
                names = self.schema().names
            except Exception:
                return
            if "content" in names:
                offenders.append((where, names))

        def spy_refs(self, *a, **kw):
            check(self, "to_arrow_refs")
            return orig_refs(self, *a, **kw)

        def spy_take_all(self, *a, **kw):
            check(self, "take_all")
            return orig_take_all(self, *a, **kw)

        def spy_to_pandas(self, *a, **kw):
            check(self, "to_pandas")
            return orig_to_pandas(self, *a, **kw)

        monkeypatch.setattr(rd.Dataset, "to_arrow_refs", spy_refs)
        monkeypatch.setattr(rd.Dataset, "take_all", spy_take_all)
        monkeypatch.setattr(rd.Dataset, "to_pandas", spy_to_pandas)

        base, urls, idx = _big_site_index(n_pages=40, page_kb=2)
        bodies = {f"{base}/sitemap.xml": make_sitemap_xml(urls)}
        res = generate_llmstxt(
            idx, base, str(tmp_path / "out"), str(tmp_path / "run"),
            max_pages=30, crawl_strategy="sitemap",
            sitemap_bodies=bodies)
        assert not offenders, offenders
        assert res.pages.num_rows == 30
        assert "content" not in res.pages.column_names
        full = open(res.written[1]).read()
        assert full.count("## Page ") == 30

    def test_driver_rss_flat_vs_site_size(self, tmp_path):
        """~120 MB of page content must flow crawl → describe → render
        without the driver's peak RSS growing by more than a fraction
        of it (the round-2 path concatenated all content driver-side,
        a ≥2× content-size peak)."""
        from web2llmstxt_ray.sources.sitemap import make_sitemap_xml

        def hwm_mb():
            for line in open("/proc/self/status"):
                if line.startswith("VmHWM"):
                    return int(line.split()[1]) / 1024.0
            raise RuntimeError("no VmHWM")

        base, urls, idx = _big_site_index(n_pages=240, page_kb=512)
        bodies = {f"{base}/sitemap.xml": make_sitemap_xml(urls)}
        # charge the mock "network" (the site fixture and its one
        # object-store broadcast) to the baseline; the crawl→render
        # machinery under test starts from the ObjectRef
        import gc

        import ray as _ray

        idx_ref = _ray.put(idx)
        del idx
        gc.collect()
        before = hwm_mb()
        res = generate_llmstxt(
            idx_ref, base, str(tmp_path / "out"), str(tmp_path / "run"),
            max_pages=240, crawl_strategy="sitemap",
            sitemap_bodies=bodies)
        after = hwm_mb()
        assert res.pages.num_rows == 240
        full = open(res.written[1]).read()
        assert full.count("## Page ") == 240
        content_mb = 240 * 512 / 1024.0
        growth = after - before
        assert growth < content_mb * 0.5, (
            f"driver peak grew {growth:.0f} MB against {content_mb:.0f} "
            "MB of site content — content is materializing driver-side")
