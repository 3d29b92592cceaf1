"""North-star conformance: the distributed crawler must reproduce the
sequential oracle's visit order, URL-seen set, page records and span
documents exactly (SURVEY §7.1.4, BASELINE span-equality target)."""

import pyarrow as pa
import pytest

from web2llmstxt_ray.functions.urls import hash64
from web2llmstxt_ray.pipelines.crawl import (
    CrawlConfig, DistributedCrawler, read_crawl_output)
from web2llmstxt_ray.pipelines.oracle import crawl_oracle
from web2llmstxt_ray.stages.spans import spans_key

BASE = "https://site0.test"


def run_both(site_idx, disallow, tmp_path, **kw):
    oracle = crawl_oracle(site_idx, BASE, disallow_by_host=disallow, **kw)
    cfg = CrawlConfig(base_url=BASE, run_dir=str(tmp_path / "run"), **kw)
    crawler = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow)
    result = crawler.run()
    return oracle, crawler, result


@pytest.mark.parametrize("kw", [
    {"max_pages": 5},
    {"max_pages": 10},
    {"max_pages": 10, "comprehensive": True},
    {"max_pages": 3, "safety_limit": 7},
])
def test_conformance(small_site, disallow_by_host, tmp_path, kw):
    _, _, site_idx = small_site
    oracle, crawler, result = run_both(site_idx, disallow_by_host, tmp_path, **kw)

    # visit order equality (the hard part: distributed waves, same order)
    assert result.visit_order == oracle.visit_order

    # URL-seen set equality (exact mode: no FPs/FNs)
    assert crawler.seen.count() == len(oracle.seen)
    assert crawler.seen.contains(sorted(oracle.seen)).all()

    # page-record equality on every reference field
    pages = read_crawl_output(result.run_dir, "pages")
    assert pages.num_rows == len(oracle.pages)
    got = pages.to_pylist()
    for g, o in zip(got, oracle.pages):
        for key in ("url", "title", "content", "word_count", "score",
                    "depth", "discovery_phase", "visit_index"):
            assert g[key] == o[key], (key, g["url"])

    # span-sequence equality (kind, text, media_ref, order) per doc
    spans = read_crawl_output(result.run_dir, "spans")
    got_spans = dict(zip(spans.column("doc_id").to_pylist(),
                         spans.column("spans").to_pylist()))
    assert set(got_spans) == set(oracle.span_docs)
    for doc_id, ospans in oracle.span_docs.items():
        assert spans_key(got_spans[doc_id]) == spans_key(ospans), doc_id


def test_no_url_fetched_twice(small_site, disallow_by_host, tmp_path):
    import ray

    from web2llmstxt_ray.pipelines.crawl import FetchLog

    _, _, site_idx = small_site
    log = FetchLog.remote()
    cfg = CrawlConfig(base_url=BASE, max_pages=10, run_dir=str(tmp_path / "r"))
    crawler = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host,
                                 fetch_log=log)
    crawler.run()
    fetched = ray.get(log.get.remote())
    # speculative past-cutoff refetches are allowed across waves, but a
    # non-comprehensive run never truncates mid-wave → strict uniqueness
    assert len(fetched) == len(set(fetched))


def test_robots_disallow_respected(small_site, disallow_by_host, tmp_path):
    _, _, site_idx = small_site
    oracle, crawler, result = run_both(site_idx, disallow_by_host, tmp_path,
                                       max_pages=10)
    for u in result.visit_order:
        path = "/" + u.split("//", 1)[-1].split("/", 1)[-1]
        assert not path.startswith(("/admin", "/login"))


def test_mega_host_skew_is_spread(small_site, disallow_by_host):
    """Host-bucket partitioning sanity: the wave fetch splits blocks by
    host bucket, so one mega host cannot serialize the whole wave."""
    from web2llmstxt_ray.functions.urls import host_bucket_of

    site, _, _ = small_site
    hosts = set(site.column("host").to_pylist())
    buckets = {host_bucket_of(h, 8) for h in hosts}
    assert len(buckets) > 1


def test_conformance_with_keyword_scorer(small_site, disallow_by_host, tmp_path):
    """Injectable priority function (F2 / §2.12): the keyword scorer
    replaces the reference scorer in BOTH oracle and engine and the
    visit orders still match."""
    from web2llmstxt_ray.functions.urls import make_keyword_scorer

    _, _, site_idx = small_site
    scorer = make_keyword_scorer(("docs", "blog", "api", "team"), weight=5.0)
    oracle = crawl_oracle(site_idx, BASE, max_pages=6,
                          disallow_by_host=disallow_by_host, score_fn=scorer)
    cfg = CrawlConfig(base_url=BASE, max_pages=6, score_fn=scorer,
                      run_dir=str(tmp_path / "kw"))
    crawler = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
    result = crawler.run()
    assert result.visit_order == oracle.visit_order
    assert len(result.visit_order) > 1
    crawler.shutdown()


def test_conformance_medium_scale(tmp_path):
    """Deeper check on a bigger, more-host site (comprehensive mode →
    5 depth levels, speculative fetch, mid-wave cutoff exercised)."""
    from web2llmstxt_ray.synth import generate_site, site_index

    site, robots = generate_site(num_pages=600, num_hosts=6, seed=7)
    idx = site_index(site)
    cols = robots.to_pydict()
    disallow = dict(zip(cols["host"], cols["disallow"]))

    oracle = crawl_oracle(idx, BASE, max_pages=12, comprehensive=True,
                          safety_limit=150, disallow_by_host=disallow)
    cfg = CrawlConfig(base_url=BASE, max_pages=12, comprehensive=True,
                      safety_limit=150, num_workers=4, num_seen_shards=8,
                      num_frontier_shards=8,
                      run_dir=str(tmp_path / "med"))
    crawler = DistributedCrawler(cfg, idx, disallow_by_host=disallow)
    result = crawler.run()
    assert result.visit_order == oracle.visit_order
    assert crawler.seen.count() == len(oracle.seen)
    spans = read_crawl_output(result.run_dir, "spans")
    got = dict(zip(spans.column("doc_id").to_pylist(),
                   spans.column("spans").to_pylist()))
    for doc_id, ospans in oracle.span_docs.items():
        assert spans_key(got[doc_id]) == spans_key(ospans)
    crawler.shutdown()


def test_comprehensive_overfetch_bounded(tmp_path):
    """Budget-aware chunking: in comprehensive mode the engine's fetch
    count stays within a small factor of the oracle's sequential
    minimum (whole-wave speculation would be several times larger)."""
    from web2llmstxt_ray.synth import generate_site, site_index

    site, robots = generate_site(num_pages=800, num_hosts=6, seed=13)
    idx = site_index(site)
    cols = robots.to_pydict()
    disallow = dict(zip(cols["host"], cols["disallow"]))
    oracle = crawl_oracle(idx, BASE, max_pages=10, comprehensive=True,
                          safety_limit=120, disallow_by_host=disallow)
    cfg = CrawlConfig(base_url=BASE, max_pages=10, comprehensive=True,
                      safety_limit=120, run_dir=str(tmp_path / "of"))
    crawler = DistributedCrawler(cfg, idx, disallow_by_host=disallow)
    result = crawler.run()
    assert result.visit_order == oracle.visit_order
    assert result.total_fetches <= oracle.fetch_attempts * 1.4 + 32
    crawler.shutdown()
