#!/usr/bin/env python
"""Seen-filter scale probe — memory + throughput evidence for the
10^10-URL design point (BASELINE.md).

Runs single-process (no Ray): measures per-backend insert/lookup rates,
bits/key and false-positive rates at N keys, plus URL hashing
throughput. Cluster math: 10^10 URLs / S shards × measured bits/key.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from web2llmstxt_ray.bootstrap import ensure_worker_importable  # noqa: E402

ensure_worker_importable()  # PYTHONPATH for Ray workers + pickle-by-value

from web2llmstxt_ray.functions.urls import hash64_batch  # noqa: E402
from web2llmstxt_ray.state.seen import _Bloom, _Cuckoo  # noqa: E402


def main(n: int = 4_000_000, batch: int = 100_000) -> dict:
    rng = np.random.RandomState(1)
    hashes = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    probe = rng.randint(0, 2**63, size=1_000_000, dtype=np.int64).astype(np.uint64)
    out: dict = {"n_keys": n}

    for name, impl in (("cuckoo", _Cuckoo(int(n * 1.25))),
                       ("bloom", _Bloom(int(n * 1.25)))):
        t0 = time.time()
        for s in range(0, n, batch):
            impl.check_and_add(hashes[s:s + batch])
        insert_rate = n / (time.time() - t0)
        t0 = time.time()
        fn = 0
        for s in range(0, n, batch):
            fn += int((~impl.contains(hashes[s:s + batch])).sum())
        lookup_rate = n / (time.time() - t0)
        fp = sum(int(impl.contains(probe[s:s + batch]).sum())
                 for s in range(0, len(probe), batch)) / len(probe)
        mem = impl.table.nbytes if name == "cuckoo" else impl.bits.nbytes
        out[name] = {
            "inserts_per_s": round(insert_rate),
            "lookups_per_s": round(lookup_rate),
            "bits_per_key": round(mem * 8 / n, 1),
            "false_negatives": fn,
            "fp_rate": round(fp, 6),
        }

    urls = [f"https://host{i % 1000}.example/path/to/page-{i}"
            for i in range(200_000)]
    t0 = time.time()
    hash64_batch(urls)
    out["hash64_batch_urls_per_s"] = round(len(urls) / (time.time() - t0))

    # 10^10 design math at the measured cuckoo bits/key
    out["design_10e10"] = {
        "cluster_memory_gb": round(1e10 * out["cuckoo"]["bits_per_key"] / 8 / 1e9, 1),
        "note": "10^10 URLs × measured bits/key across all shards; "
                "spilled/cold partitions degrade to bloom snapshots",
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main(), indent=2))
