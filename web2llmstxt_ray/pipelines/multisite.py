"""Multi-site crawl orchestration.

The reference processes one site per invocation; a production llms.txt
service crawls MANY sites. Per-site crawls are independent (separate
seen sets, frontiers and visit orders — reference semantics are
per-site), so the orchestration is embarrassingly parallel at the site
level: each site gets its own `DistributedCrawler` (its actors sized
down so ``max_concurrent × per-site actors`` fits the cluster), driven
from a thread pool on the driver (Ray calls are thread-safe; the
threads only coordinate barriers, all heavy work is in actors).

Site-level failures are isolated: one site raising does not abort the
batch; its error is reported in the result row.
"""

from __future__ import annotations

import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from .crawl import CrawlConfig, CrawlResult, DistributedCrawler


@dataclass
class SiteResult:
    base_url: str
    ok: bool
    result: CrawlResult | None = None
    error: str | None = None


def crawl_sites(
    site_specs: list[dict],
    site_index,
    disallow_by_host: dict | None = None,
    max_concurrent: int = 4,
    workers_per_site: int = 2,
    shards_per_site: int = 2,
    run_dir_root: str | None = None,
) -> list[SiteResult]:
    """Crawl many sites concurrently against one (shared, broadcast)
    mock web. ``site_specs``: dicts with at least ``base_url`` plus any
    ``CrawlConfig`` overrides. Results keep input order."""
    import ray

    site_ref = (site_index if isinstance(site_index, ray.ObjectRef)
                else ray.put(site_index))

    def one(spec: dict) -> SiteResult:
        base_url = spec["base_url"]
        overrides = {k: v for k, v in spec.items() if k != "base_url"}
        overrides.setdefault("num_workers", workers_per_site)
        overrides.setdefault("num_seen_shards", shards_per_site)
        overrides.setdefault("num_frontier_shards", shards_per_site)
        if run_dir_root and "run_dir" not in overrides:
            import os

            from ..functions.urls import extract_domain_from_url

            overrides["run_dir"] = os.path.join(
                run_dir_root, extract_domain_from_url(base_url))
        cfg = CrawlConfig(base_url=base_url, **overrides)
        crawler = DistributedCrawler(cfg, site_ref,
                                     disallow_by_host=disallow_by_host)
        try:
            crawler.resume()
            result = crawler.run()
            return SiteResult(base_url=base_url, ok=True, result=result)
        except Exception:
            return SiteResult(base_url=base_url, ok=False,
                              error=traceback.format_exc())
        finally:
            crawler.shutdown()

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        return list(pool.map(one, site_specs))
