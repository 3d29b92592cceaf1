"""Multi-site orchestration: concurrent per-site crawls, each exactly
matching its own sequential oracle; failures isolated."""

from web2llmstxt_ray.pipelines.multisite import crawl_sites
from web2llmstxt_ray.pipelines.oracle import crawl_oracle


def test_concurrent_sites_match_oracles(small_site, disallow_by_host, tmp_path):
    _, _, site_idx = small_site
    bases = ["https://site0.test", "https://site1.test", "https://site2.test"]
    specs = [{"base_url": b, "max_pages": 5} for b in bases]
    results = crawl_sites(specs, site_idx, disallow_by_host=disallow_by_host,
                          max_concurrent=3,
                          run_dir_root=str(tmp_path / "multi"))
    assert [r.base_url for r in results] == bases
    for r in results:
        assert r.ok, r.error
        oracle = crawl_oracle(site_idx, r.base_url, max_pages=5,
                              disallow_by_host=disallow_by_host)
        assert r.result.visit_order == oracle.visit_order, r.base_url
        assert r.result.total_pages > 0


def test_site_failure_isolated(small_site, disallow_by_host):
    _, _, site_idx = small_site
    # an unfetchable base URL yields an empty-but-ok crawl, not a crash;
    # a bad config (negative workers) raises and is isolated
    specs = [
        {"base_url": "https://site0.test", "max_pages": 3},
        {"base_url": "https://nonexistent.test", "max_pages": 3},
    ]
    results = crawl_sites(specs, site_idx, disallow_by_host=disallow_by_host,
                          max_concurrent=2)
    assert results[0].ok and results[0].result.total_pages > 0
    assert results[1].ok  # main-page fetch fails → 0 pages, clean result
    assert results[1].result.total_pages == 0
