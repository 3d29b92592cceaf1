"""Resumable partitioned execution for bulk list-crawls.

The scale contract: output is partitioned Parquet — one directory per
input shard (url-hash bucket) — committed atomically per partition with
a manifest, so a failed/killed run re-executes ONLY the unfinished
partitions (no refetching of completed shards). This is the batch-
pipeline counterpart of the wave crawler's per-wave checkpoints.

Layout::

    out_dir/
      part_00003/ *.parquet     (atomic: written to .tmp-part_00003, renamed)
      _manifest.json            {"completed": ["part_00003", ...]}
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.urls import hash64_batch
from ..sinks import write_span_docs


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def load_manifest(out_dir: str) -> set[str]:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["completed"])


def _commit_partition(out_dir: str, name: str) -> None:
    done = load_manifest(out_dir)
    done.add(name)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"completed": sorted(done)}, f)
    os.replace(tmp, _manifest_path(out_dir))


def partition_seeds(seed_urls: list[str], num_partitions: int) -> dict[int, list[str]]:
    """url-hash partitioning: each URL belongs to exactly one shard, so
    skipping a completed shard can never skip or duplicate a URL."""
    buckets = hash64_batch(seed_urls) % np.uint64(num_partitions)
    out: dict[int, list[str]] = {}
    for url, b in zip(seed_urls, buckets.astype(int)):
        out.setdefault(int(b), []).append(url)
    return out


def run_resumable(
    seed_urls: list[str],
    out_dir: str,
    pipeline_fn,
    num_partitions: int = 16,
    fail_after: int | None = None,
    fmt: str = "auto",
) -> dict:
    """Run ``pipeline_fn(seed_url_list) -> ray.data.Dataset`` once per
    incomplete partition, writing each to its own directory atomically.

    ``fail_after`` (tests): raise after committing that many partitions,
    simulating a mid-run crash. Returns run stats including how many
    partitions were skipped as already complete.
    """
    os.makedirs(out_dir, exist_ok=True)
    parts = partition_seeds(seed_urls, num_partitions)
    done = load_manifest(out_dir)
    stats = {"skipped": 0, "executed": 0, "rows": 0}
    for b in sorted(parts):
        name = f"part_{b:05d}"
        if name in done:
            stats["skipped"] += 1
            continue
        if fail_after is not None and stats["executed"] >= fail_after:
            raise RuntimeError("simulated crash")
        target = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".tmp-{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(target, ignore_errors=True)
        ds = pipeline_fn(parts[b])
        write_span_docs(ds, tmp, fmt=fmt)   # format seam: lance|parquet
        os.replace(tmp, target)
        _commit_partition(out_dir, name)
        stats["executed"] += 1
    stats["rows"] = _count_rows(out_dir)
    return stats


def _count_rows(out_dir: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name.startswith("part_") and os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(d, f)).num_rows
    return total


def read_all(out_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    tables = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name.startswith("part_") and os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(d, f)))
    return pa.concat_tables(tables) if tables else pa.table({})
