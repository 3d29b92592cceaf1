"""Kill-and-resume: a crawl killed mid-run resumes from its wave
checkpoint with zero refetches and identical final output
(BASELINE resume-correctness target; SURVEY §7.1.8)."""

import ray

from web2llmstxt_ray.functions.urls import hash64
from web2llmstxt_ray.pipelines.crawl import (
    CrawlConfig, DistributedCrawler, FetchLog, read_crawl_output)

BASE = "https://site0.test"


def test_kill_and_resume(small_site, disallow_by_host, tmp_path):
    _, _, site_idx = small_site
    run_dir = str(tmp_path / "resumed")

    # --- uninterrupted reference run ---
    ref_cfg = CrawlConfig(base_url=BASE, max_pages=10,
                          run_dir=str(tmp_path / "full"))
    ref = DistributedCrawler(ref_cfg, site_idx, disallow_by_host=disallow_by_host)
    ref_result = ref.run()
    assert ref_result.total_pages > 5

    # --- killed run: commit through depth 1, then "crash" ---
    cfg1 = CrawlConfig(base_url=BASE, max_pages=10, run_dir=run_dir)
    c1 = DistributedCrawler(cfg1, site_idx, disallow_by_host=disallow_by_host)
    partial = c1.run(stop_after_depth=1)
    assert partial.total_pages < ref_result.total_pages
    seen_at_checkpoint = set(partial.visit_order)  # accepted subset of seen
    fetched_before = partial.total_fetches

    # --- fresh process-equivalent: new crawler, new actors, restore ---
    log = FetchLog.remote()
    cfg2 = CrawlConfig(base_url=BASE, max_pages=10, run_dir=run_dir)
    c2 = DistributedCrawler(cfg2, site_idx, disallow_by_host=disallow_by_host,
                            fetch_log=log)
    assert c2.resume()
    assert c2.pages_so_far == partial.total_pages
    result = c2.run()

    # identical final state vs the uninterrupted run
    assert result.visit_order == ref_result.visit_order
    assert result.total_pages == ref_result.total_pages
    assert c2.seen.count() == ref.seen.count()

    # zero refetches: nothing fetched after resume was already seen
    refetched = set(ray.get(log.get.remote()))
    already_seen = {u for u in refetched if u in seen_at_checkpoint}
    assert not already_seen
    # and total fetch effort is split, not repeated
    assert fetched_before + result.total_fetches - fetched_before == result.total_fetches
    assert result.total_fetches == ref_result.total_fetches

    # committed artifacts identical between full and resumed runs
    full_pages = read_crawl_output(str(tmp_path / "full"), "pages")
    res_pages = read_crawl_output(run_dir, "pages")
    assert full_pages.column("url").to_pylist() == res_pages.column("url").to_pylist()
    assert full_pages.column("visit_index").to_pylist() == res_pages.column("visit_index").to_pylist()

    full_spans = read_crawl_output(str(tmp_path / "full"), "spans")
    res_spans = read_crawl_output(run_dir, "spans")
    assert sorted(full_spans.column("doc_id").to_pylist()) == \
        sorted(res_spans.column("doc_id").to_pylist())


def test_manifest_atomicity(small_site, disallow_by_host, tmp_path):
    """A wave dir without a manifest pointer is invisible to resume."""
    import json
    import os

    _, _, site_idx = small_site
    run_dir = str(tmp_path / "atomic")
    cfg = CrawlConfig(base_url=BASE, max_pages=6, run_dir=run_dir)
    c = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
    c.run(stop_after_depth=1)

    with open(os.path.join(run_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["completed_depth"] == 1

    # simulate a torn write of wave 2 artifacts with NO manifest update
    os.makedirs(os.path.join(run_dir, "wave_2"), exist_ok=True)
    c2 = DistributedCrawler(
        CrawlConfig(base_url=BASE, max_pages=6, run_dir=run_dir),
        site_idx, disallow_by_host=disallow_by_host)
    assert c2.resume()
    assert c2._completed_depth == 1  # torn wave ignored


def test_lineage_records_and_integrity_gate(small_site, disallow_by_host,
                                            tmp_path):
    """Every committed wave carries a lineage.json whose per-partition
    hashes match the state blobs on disk and whose output row counts
    match the parquet footers; a corrupted blob is refused at resume."""
    import hashlib
    import json
    import os

    import pyarrow.parquet as pq
    import pytest

    _, _, site_idx = small_site
    run_dir = str(tmp_path / "lineage")
    cfg = CrawlConfig(base_url=BASE, max_pages=8, run_dir=run_dir)
    c = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
    c.run()
    c.shutdown()

    waves = sorted(n for n in os.listdir(run_dir) if n.startswith("wave_"))
    assert waves
    for w in waves:
        d = os.path.join(run_dir, w)
        with open(os.path.join(d, "lineage.json")) as f:
            lin = json.load(f)
        for kind in ("seen", "frontier"):
            assert lin["partitions"][kind]
            for rec in lin["partitions"][kind]:
                blob = open(os.path.join(d, rec["file"]), "rb").read()
                assert hashlib.sha256(blob).hexdigest() == rec["sha256"]
                assert len(blob) == rec["bytes"]
        for out in lin["outputs"]:
            md = pq.ParquetFile(os.path.join(d, out["file"])).metadata
            assert md.num_rows == out["rows"]
    # parent chain is contiguous
    depths = sorted(json.load(open(os.path.join(run_dir, w, "lineage.json")))
                    ["depth"] for w in waves)
    assert depths == list(range(len(waves)))

    # corrupt one committed seen blob → resume must refuse
    with open(os.path.join(run_dir, "manifest.json")) as f:
        top = json.load(f)["completed_depth"]
    victim = os.path.join(run_dir, f"wave_{top}", "state", "seen_0.bin")
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
    c2 = DistributedCrawler(CrawlConfig(base_url=BASE, max_pages=8,
                                        run_dir=run_dir),
                            site_idx, disallow_by_host=disallow_by_host)
    with pytest.raises(RuntimeError, match="checkpoint corruption"):
        c2.resume()
    c2.shutdown()


def test_lineage_count_mismatch_refused(small_site, disallow_by_host,
                                        tmp_path):
    """A lineage record list shorter than the on-disk blob set (e.g. a
    missing entry) must be refused, not silently zip-truncated — the
    extra partitions would bypass hash verification."""
    import json
    import os

    import pytest

    _, _, site_idx = small_site
    run_dir = str(tmp_path / "lincount")
    cfg = CrawlConfig(base_url=BASE, max_pages=8, run_dir=run_dir)
    c = DistributedCrawler(cfg, site_idx, disallow_by_host=disallow_by_host)
    c.run()
    c.shutdown()

    with open(os.path.join(run_dir, "manifest.json")) as f:
        top = json.load(f)["completed_depth"]
    lpath = os.path.join(run_dir, f"wave_{top}", "lineage.json")
    with open(lpath) as f:
        lin = json.load(f)
    assert len(lin["partitions"]["seen"]) > 1
    lin["partitions"]["seen"] = lin["partitions"]["seen"][:-1]
    with open(lpath, "w") as f:
        json.dump(lin, f)
    c2 = DistributedCrawler(CrawlConfig(base_url=BASE, max_pages=8,
                                        run_dir=run_dir),
                            site_idx, disallow_by_host=disallow_by_host)
    with pytest.raises(RuntimeError,
                       match="count .* != on-disk blob count"):
        c2.resume()
    c2.shutdown()
