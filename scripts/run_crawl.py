#!/usr/bin/env python
"""Cluster entrypoint for the crawl pipeline.

On a real fixed-size multi-node cluster this is the ``ray job submit``
target::

    ray job submit --working-dir . -- python scripts/run_crawl.py \\
        --base-url https://example.com --max-pages 500 \\
        --run-dir /mnt/shared/crawls/run1 --strategy systematic

In this sandbox it runs against the deterministic synthetic web (no
network): ``--synthetic-pages/--synthetic-hosts`` control the fixture.
The run directory carries per-wave Parquet partitions + state snapshots,
so re-running the same command after a kill resumes from the last
committed wave (zero refetches).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from web2llmstxt_ray.bootstrap import ensure_worker_importable  # noqa: E402

ensure_worker_importable()  # PYTHONPATH for Ray workers + pickle-by-value


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base-url", default="https://site0.test")
    p.add_argument("--max-pages", type=int, default=25)
    p.add_argument("--strategy", default="systematic",
                   choices=["systematic", "comprehensive", "sitemap"])
    p.add_argument("--run-dir", required=True)
    p.add_argument("--output-dir", default=None,
                   help="also render llms.txt outputs here")
    p.add_argument("--export-format", default="text",
                   choices=["text", "json", "yaml"])
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--seen-mode", default="exact",
                   choices=["exact", "bloom", "cuckoo"])
    p.add_argument("--synthetic-pages", type=int, default=2000)
    p.add_argument("--synthetic-hosts", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for standalone local runs")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the cluster address comes from the
        # environment; standalone local runs get an explicit session
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from web2llmstxt_ray.pipelines.crawl import (
        CrawlConfig, DistributedCrawler, read_crawl_output)
    from web2llmstxt_ray.sources.robots import policies_from_robots_bodies
    from web2llmstxt_ray.synth import generate_site, site_index

    site, robots = generate_site(num_pages=args.synthetic_pages,
                                 num_hosts=args.synthetic_hosts,
                                 seed=args.seed)
    cols = robots.to_pydict()
    disallow = dict(zip(cols["host"], cols["disallow"]))
    delays = {h: d for h, d in zip(cols["host"], cols["crawl_delay_ms"]) if d}
    _ = policies_from_robots_bodies  # real robots bodies would parse here

    cfg = CrawlConfig(
        base_url=args.base_url,
        max_pages=args.max_pages,
        comprehensive=(args.strategy == "comprehensive"),
        num_workers=args.num_workers,
        seen_mode=args.seen_mode,
        run_dir=args.run_dir,
        host_delays_ms=delays,
    )
    crawler = DistributedCrawler(cfg, site_index(site),
                                 disallow_by_host=disallow)
    resumed = crawler.resume()
    result = crawler.run()

    if args.output_dir:
        import pyarrow.compute as pc

        from web2llmstxt_ray.functions.analytics import run_metadata
        from web2llmstxt_ray.functions.urls import extract_domain_from_url
        from web2llmstxt_ray.pipelines.llms import Describer, write_outputs

        pages = read_crawl_output(args.run_dir, "pages")
        pages = pages.take(pc.sort_indices(pages.column("visit_index")))
        entries = Describer()(pages)
        md = run_metadata(args.base_url,
                          extract_domain_from_url(args.base_url), pages,
                          entries, "1970-01-01T00:00:00",
                          "deterministic-fallback", args.export_format, 0.0,
                          args.strategy)
        write_outputs(args.output_dir, args.base_url, entries, pages, md,
                      args.export_format)

    print(json.dumps({
        "resumed": resumed,
        "total_pages": result.total_pages,
        "total_fetches": result.total_fetches,
        "waves": result.waves,
        "run_dir": result.run_dir,
    }))
    crawler.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
