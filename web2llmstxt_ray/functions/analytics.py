"""Crawl analytics + run metadata (SURVEY A1-A3, A7, §1.3).

The reference logs per-depth counts and assembles a per-run metadata
dict (``crawler/web_crawler.py:299-358``,
``generator/llms_generator.py:719-764``; pyc metadata keys). Here the
analytics are grouped aggregates over the page-record Dataset/table and
the metadata is a plain dict with the pyc variant's key set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def crawl_analytics(pages: pa.Table) -> dict:
    """Pages-per-depth histogram, mean score, total words (A3 —
    ``crawler/web_crawler.py:299-358``). Input: PAGE_RECORDS table
    (wave outputs are small; at corpus scale run the same aggregates
    via ``ds.groupby('depth').count()``)."""
    if pages.num_rows == 0:
        return {"total_pages": 0, "pages_per_depth": {}, "mean_score": 0.0,
                "total_words": 0, "mean_word_count": 0.0}
    out = {
        "total_pages": pages.num_rows,
        "total_words": pc.sum(pages.column("word_count")).as_py(),
        "mean_word_count": round(
            pc.mean(pages.column("word_count")).as_py(), 6),
    }
    # depth/score exist only on BFS-crawl page records, not list crawls
    names = pages.column_names
    if "depth" in names:
        counts = pc.value_counts(pages.column("depth"))
        per_depth = {str(v["values"]): v["counts"] for v in counts.to_pylist()}
        out["pages_per_depth"] = dict(sorted(per_depth.items()))
    if "score" in names:
        out["mean_score"] = round(pc.mean(pages.column("score")).as_py(), 6)
    return out


def entry_analytics(entries: pa.Table) -> dict:
    """Average description length + per-category counts (A2/A4 —
    ``generator/llms_generator.py:759-761``)."""
    if entries.num_rows == 0:
        return {"total_entries": 0, "avg_description_length": 0.0,
                "per_category": {}}
    desc_len = pc.utf8_length(entries.column("description"))
    cats = pc.value_counts(entries.column("category"))
    return {
        "total_entries": entries.num_rows,
        "avg_description_length": round(pc.mean(desc_len).as_py(), 6),
        "per_category": {v["values"]: v["counts"] for v in cats.to_pylist()},
    }


def run_metadata(source_url: str, domain: str, pages: pa.Table,
                 entries: pa.Table, generated_at: str, model_used: str,
                 export_format: str, processing_time_s: float,
                 crawl_strategy: str, extra: dict | None = None) -> dict:
    """Per-run metadata dict with the pyc variant's key set (SURVEY §1.3:
    source_url, domain, total_pages_crawled, total_entries_processed,
    generated_at, model_used, export_format, processing_time_seconds…)."""
    md = {
        "source_url": source_url,
        "domain": domain,
        "total_pages_crawled": pages.num_rows,
        "total_entries_processed": entries.num_rows,
        "generated_at": generated_at,
        "model_used": model_used,
        "model_display_name": model_used,
        "export_format": export_format,
        "processing_time_seconds": round(processing_time_s, 3),
        "crawl_strategy": crawl_strategy,
        "analytics": {
            "crawl": crawl_analytics(pages),
            "entries": entry_analytics(entries),
        },
    }
    if extra:
        md.update(extra)
    return md
