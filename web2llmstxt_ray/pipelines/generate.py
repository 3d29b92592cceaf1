"""End-to-end generate pipeline — the ``generate_llmstxt`` equivalent.

Mirrors the reference lifecycle (SURVEY §3.1/§3.3:
``generator/llms_generator.py:675-747``): strategy dispatch
(``systematic`` wave crawl / ``comprehensive`` wave crawl /
``sitemap`` list crawl), then description generation, then output
rendering — re-expressed as: DistributedCrawler or the Ray Data
url-list pipeline → ``describe_pages`` actor stage → driver-side
render of the small ordered entry table.

Scale note: this function targets the reference's per-SITE scale
(llms.txt for one site — at most thousands of pages), so rendering
materializes that site's pages on the driver like the reference does.
For corpus-scale jobs compose the pieces directly: ``crawl_url_list``
/ ``resumable.run_resumable`` for fetching, ``describe_pages`` over
the parquet output, and ``llms.write_llms_full_streaming`` so content
never gathers on the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.urls import extract_domain_from_url
from ..sources.sitemap import collect_sitemap_urls
from .crawl import CrawlConfig, DistributedCrawler, read_crawl_output
from .llms import describe_pages, write_outputs
from .urllist import crawl_url_list


@dataclass
class GenerateResult:
    pages: pa.Table
    entries: pa.Table
    written: list[str]
    metadata: dict


def generate_llmstxt(
    site_index: dict[str, dict],
    base_url: str,
    output_dir: str,
    run_dir: str,
    max_pages: int = 25,
    crawl_strategy: str = "systematic",     # systematic | comprehensive | sitemap
    export_format: str = "text",
    disallow_by_host: dict | None = None,
    sitemap_bodies: dict[str, bytes] | None = None,
    cache: dict | None = None,
    generated_at: str = "2025-01-01T00:00:00",
) -> GenerateResult:
    """Crawl → describe → render, like the reference CLI path
    (``scripts/generate_llms.py`` → ``generate_llmstxt``)."""
    t0 = time.perf_counter()
    site_ref = ray.put(site_index)

    if crawl_strategy == "sitemap":
        # §3.3: sitemap URLs → prioritized list crawl (no BFS)
        urls = collect_sitemap_urls(
            base_url, list(sitemap_bodies or {}),
            (sitemap_bodies or {}).get)
        seeds = ray.data.from_arrow(pa.table({"url": urls or [base_url]}))
        pages_ds = crawl_url_list(seeds, site_ref, max_pages=max_pages)
        pages = pa.concat_tables(
            [ray.get(r) for r in pages_ds.to_arrow_refs()]
        ) if urls else pa.table({"url": [], "title": [], "content": [],
                                 "word_count": []})
        pages = pages.append_column(
            "visit_index", pa.array(range(pages.num_rows), pa.int64()))
        pages_for_describe = ray.data.from_arrow(pages)
    else:
        cfg = CrawlConfig(
            base_url=base_url, max_pages=max_pages,
            comprehensive=(crawl_strategy == "comprehensive"),
            run_dir=run_dir,
        )
        crawler = DistributedCrawler(cfg, site_index,
                                     disallow_by_host=disallow_by_host)
        try:
            crawler.run()
        finally:
            # actors die with the run — repeated invocations in one Ray
            # session must not accumulate worker/shard actors
            crawler.shutdown()
        pages = read_crawl_output(run_dir, "pages")
        pages_for_describe = ray.data.read_parquet(
            [f for f in _wave_files(run_dir, "pages")])

    entries_ds = describe_pages(pages_for_describe, cache=cache)
    entries = pa.concat_tables([ray.get(r) for r in entries_ds.to_arrow_refs()])
    entries = entries.take(pc.sort_indices(entries.column("index")))

    from ..functions.analytics import run_metadata

    metadata = run_metadata(
        base_url, extract_domain_from_url(base_url), pages, entries,
        generated_at, "deterministic-fallback", export_format,
        time.perf_counter() - t0, crawl_strategy)
    written = write_outputs(output_dir, base_url, entries, pages, metadata,
                            export_format)
    return GenerateResult(pages=pages, entries=entries, written=written,
                          metadata=metadata)


def _wave_files(run_dir: str, what: str) -> list[str]:
    import os

    out = []
    for name in sorted(os.listdir(run_dir)):
        wd = os.path.join(run_dir, name)
        if name.startswith("wave_") and os.path.isdir(wd):
            out += [os.path.join(wd, f) for f in sorted(os.listdir(wd))
                    if f.startswith(f"{what}-") and f.endswith(".parquet")]
    return out
