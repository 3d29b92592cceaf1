"""End-to-end generate pipeline — the ``generate_llmstxt`` equivalent.

Mirrors the reference lifecycle (SURVEY §3.1/§3.3:
``generator/llms_generator.py:675-747``): strategy dispatch
(``systematic`` wave crawl / ``comprehensive`` wave crawl /
``sitemap`` list crawl), then description generation, then output
rendering — re-expressed as: DistributedCrawler or the Ray Data
url-list pipeline → ``describe_pages`` actor stage → driver-side
render of the small ordered entry table.

Scale shape: page CONTENT never materializes on the driver — the
renders stream (``write_outputs_streaming`` /
``write_llms_full_streaming``) and llms.txt's content needs (site
summary, description backfill) come from the one-pass
``collect_render_probes`` that collects only skinny snippet rows.
The driver holds the small per-page INDEX (url, title, word_count,
visit_index — ``GenerateResult.pages``) and the entry table, both
O(pages) × tens of bytes, flat in content size.
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
from .crawl import CrawlConfig, DistributedCrawler
from .llms import describe_pages, write_outputs_streaming
from .urllist import crawl_url_list


@dataclass
class GenerateResult:
    pages: pa.Table          # content-pruned per-page index
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
    # accept a pre-put ObjectRef so a large site fixture broadcasts
    # exactly once (a second ray.put would map another full copy of
    # the object-store pages into driver RSS)
    if isinstance(site_index, ray.ObjectRef):
        site_ref = site_index
        site_index_local = None
    else:
        site_ref = ray.put(site_index)
        site_index_local = site_index

    if crawl_strategy == "sitemap":
        # §3.3: sitemap URLs → prioritized list crawl (no BFS)
        urls = collect_sitemap_urls(
            base_url, list(sitemap_bodies or {}),
            (sitemap_bodies or {}).get)
        seeds = ray.data.from_arrow(pa.table({"url": urls or [base_url]}))
        if urls:
            pages_ds = crawl_url_list(seeds, site_ref,
                                      max_pages=max_pages).materialize()
            # visit order = dataset order (the pre-fetch priority sort);
            # stamp it via a SKINNY url→rank broadcast — urls only, the
            # content column never leaves the object store
            ordered_urls = pages_ds.select_columns(["url"]) \
                .to_pandas()["url"].tolist()
            rank_ref = ray.put({u: i for i, u in enumerate(ordered_urls)})

            class StampIndex:
                def __init__(self, ref):
                    self.rank: dict = ray.get(ref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    vi = [self.rank[u]
                          for u in batch.column("url").to_pylist()]
                    return batch.append_column(
                        "visit_index", pa.array(vi, pa.int64()))

            pages_ds = pages_ds.map_batches(
                StampIndex, fn_constructor_kwargs={"ref": rank_ref},
                batch_format="pyarrow", concurrency=(1, 4)).materialize()
        else:
            pages_ds = ray.data.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "title": pa.array([], pa.string()),
                 "content": pa.array([], pa.string()),
                 "word_count": pa.array([], pa.int64()),
                 "visit_index": pa.array([], pa.int64())}))
    else:
        cfg = CrawlConfig(
            base_url=base_url, max_pages=max_pages,
            comprehensive=(crawl_strategy == "comprehensive"),
            run_dir=run_dir,
        )
        if site_index_local is None:
            site_index_local = ray.get(site_ref)
        crawler = DistributedCrawler(cfg, site_index_local,
                                     disallow_by_host=disallow_by_host)
        try:
            crawler.run()
        finally:
            # actors die with the run — repeated invocations in one Ray
            # session must not accumulate worker/shard actors
            crawler.shutdown()
        pages_ds = ray.data.read_parquet(
            [f for f in _wave_files(run_dir, "pages")]).materialize()

    entries_ds = describe_pages(pages_ds, cache=cache)
    entries = pa.concat_tables([ray.get(r) for r in entries_ds.to_arrow_refs()])
    entries = entries.take(pc.sort_indices(entries.column("index")))

    # the driver-side per-page INDEX: every page column EXCEPT content
    # (url/title/word_count/visit_index/depth/score are tens of bytes a
    # row — flat in site content size). Feeds run_metadata and the
    # GenerateResult surface; renders stream from pages_ds instead.
    index_cols = [c for c in pages_ds.schema().names if c != "content"]
    pages_index = pa.concat_tables(
        [ray.get(r) for r in
         pages_ds.select_columns(index_cols).materialize()
         .to_arrow_refs()],
        promote_options="permissive")
    if "visit_index" in index_cols:
        pages_index = pages_index.take(
            pc.sort_indices(pages_index.column("visit_index")))

    from ..functions.analytics import run_metadata

    metadata = run_metadata(
        base_url, extract_domain_from_url(base_url), pages_index, entries,
        generated_at, "deterministic-fallback", export_format,
        time.perf_counter() - t0, crawl_strategy)
    written = write_outputs_streaming(
        output_dir, base_url, entries, metadata,
        pages_ds.sort("visit_index"), export_format)
    return GenerateResult(pages=pages_index, entries=entries,
                          written=written, metadata=metadata)


def _wave_files(run_dir: str, what: str) -> list[str]:
    import os

    out = []
    for name in sorted(os.listdir(run_dir)):
        wd = os.path.join(run_dir, name)
        if name.startswith("wave_") and os.path.isdir(wd):
            out += [os.path.join(wd, f) for f in sorted(os.listdir(wd))
                    if f.startswith(f"{what}-") and f.endswith(".parquet")]
    return out
