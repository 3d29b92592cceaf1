#!/usr/bin/env python
"""Conformance soak — distributed crawler vs sequential oracle across
many generator seeds and crawl modes (beyond the fixed-seed pytest
suite). Prints one line per combination and a FAILS summary.

Usage: python scripts/conformance_soak.py [--seeds 1,2,3] [--pages 250]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from web2llmstxt_ray.bootstrap import ensure_worker_importable  # noqa: E402

ensure_worker_importable()  # PYTHONPATH for Ray workers + pickle-by-value


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", default="1,2,3,99,1234,777")
    p.add_argument("--pages", type=int, default=250)
    p.add_argument("--hosts", type=int, default=5)
    p.add_argument("--num-cpus", type=int, default=16)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from web2llmstxt_ray.pipelines.crawl import CrawlConfig, DistributedCrawler
    from web2llmstxt_ray.pipelines.oracle import crawl_oracle
    from web2llmstxt_ray.synth import generate_site, site_index

    modes = (
        {"max_pages": 7},
        {"max_pages": 6, "comprehensive": True, "safety_limit": 60},
    )
    fails = []
    for seed in (int(s) for s in args.seeds.split(",")):
        site, robots = generate_site(num_pages=args.pages,
                                     num_hosts=args.hosts, seed=seed)
        idx = site_index(site)
        cols = robots.to_pydict()
        dis = dict(zip(cols["host"], cols["disallow"]))
        for kw in modes:
            oracle = crawl_oracle(idx, "https://site0.test",
                                  disallow_by_host=dis, **kw)
            cfg = CrawlConfig(base_url="https://site0.test", run_dir=None, **kw)
            c = DistributedCrawler(cfg, idx, disallow_by_host=dis)
            res = c.run()
            ok = (res.visit_order == oracle.visit_order
                  and c.seen.count() == len(oracle.seen))
            print(f"seed={seed} {kw}: {'OK' if ok else 'MISMATCH'} "
                  f"({res.total_pages} pages, {res.total_fetches} fetches)")
            if not ok:
                fails.append({"seed": seed, "mode": kw})
            c.shutdown()
    print(json.dumps({"fails": fails}))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
