"""Intra-run fault tolerance: a crawl worker killed mid-crawl is
recovered by rebuilding the pool and replaying from the last committed
wave checkpoint — final results stay oracle-exact."""

import ray

from web2llmstxt_ray.pipelines.crawl import (
    CrawlConfig, DistributedCrawler, run_with_recovery)
from web2llmstxt_ray.pipelines.oracle import crawl_oracle

BASE = "https://site0.test"


def test_worker_death_recovered(small_site, disallow_by_host, tmp_path):
    _, _, site_idx = small_site
    oracle = crawl_oracle(site_idx, BASE, max_pages=8,
                          disallow_by_host=disallow_by_host)

    cfg = CrawlConfig(base_url=BASE, max_pages=8,
                      run_dir=str(tmp_path / "faulty"))
    crawler = DistributedCrawler(cfg, site_idx,
                                 disallow_by_host=disallow_by_host)

    # sabotage: run waves 0-1, then kill a worker; the next run() call
    # fails mid-wave and run_with_recovery must restore + continue
    crawler.run(stop_after_depth=1)
    ray.kill(crawler.workers[0])

    result = run_with_recovery(crawler, max_attempts=3)
    assert result.visit_order == oracle.visit_order
    assert crawler.seen.count() == len(oracle.seen)
    crawler.shutdown()


def test_recovery_from_death_before_any_commit(small_site, disallow_by_host,
                                               tmp_path):
    _, _, site_idx = small_site
    oracle = crawl_oracle(site_idx, BASE, max_pages=5,
                          disallow_by_host=disallow_by_host)
    cfg = CrawlConfig(base_url=BASE, max_pages=5,
                      run_dir=str(tmp_path / "early"))
    crawler = DistributedCrawler(cfg, site_idx,
                                 disallow_by_host=disallow_by_host)
    ray.kill(crawler.workers[0])  # dead before wave 0
    result = run_with_recovery(crawler, max_attempts=3)
    assert result.visit_order == oracle.visit_order
    crawler.shutdown()
