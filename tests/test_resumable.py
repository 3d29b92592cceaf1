"""Resumable partitioned list-crawl: a crash mid-run resumes by
skipping completed url-hash partitions, with no duplicated or missing
URLs."""

import pyarrow as pa
import pytest
import ray
import ray.data

from web2llmstxt_ray.pipelines import resumable as R
from web2llmstxt_ray.pipelines.urllist import crawl_url_list


def test_partitioning_total_and_disjoint():
    urls = [f"https://h{i%7}.test/p{i}" for i in range(500)]
    parts = R.partition_seeds(urls, 8)
    flat = [u for v in parts.values() for u in v]
    assert sorted(flat) == sorted(urls)


def test_crash_and_resume_skips_completed(small_site, tmp_path):
    site, _, idx = small_site
    idx_ref = ray.put(idx)
    urls = site.column("url").to_pylist()
    out = str(tmp_path / "resumable")

    def pipeline(chunk):
        return crawl_url_list(
            ray.data.from_arrow(pa.table({"url": chunk})), idx_ref,
            fetch_concurrency=2, parallelism=2)

    with pytest.raises(RuntimeError, match="simulated crash"):
        R.run_resumable(urls, out, pipeline, num_partitions=6, fail_after=2)
    assert len(R.load_manifest(out)) == 2

    stats = R.run_resumable(urls, out, pipeline, num_partitions=6)
    assert stats["skipped"] == 2
    assert stats["executed"] == 4

    # completed output equals a clean single run
    clean = str(tmp_path / "clean")
    stats2 = R.run_resumable(urls, clean, pipeline, num_partitions=6)
    got = R.read_all(out)
    want = R.read_all(clean)
    got_urls = got.column("url").to_pylist()
    assert sorted(got_urls) == sorted(want.column("url").to_pylist())
    assert len(got_urls) == len(set(got_urls))  # no duplicated URLs


def test_rerun_all_skipped(small_site, tmp_path):
    site, _, idx = small_site
    idx_ref = ray.put(idx)
    urls = site.column("url").to_pylist()[:40]
    out = str(tmp_path / "rr")

    def pipeline(chunk):
        return crawl_url_list(
            ray.data.from_arrow(pa.table({"url": chunk})), idx_ref,
            fetch_concurrency=2, parallelism=2)

    R.run_resumable(urls, out, pipeline, num_partitions=4)
    stats = R.run_resumable(urls, out, pipeline, num_partitions=4)
    assert stats["executed"] == 0 and stats["skipped"] == 4
