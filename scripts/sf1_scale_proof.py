"""sf1 (10×) scale proof — round-4 verdict ask #7.

No sf1 directory exists in /root/testdata, so this script builds a
DETERMINISTIC 10× replica of sf0.1 under /tmp/testdata_sf1: each
scalable table is concatenated 10 times with consistent key offsets
(FK integrity preserved — every replica is a self-contained shard of
the key space), and document/text payloads are mutated per replica
(vectorized ``replace_substring`` with a replica-specific marker) so
the dedup-family work profile stays realistic (cross-replica docs are
NOT near-duplicates; a verbatim 10× copy would inflate LSH candidate
pairs ~45× and measure an artifact, not scale). region/nation are
dimension tables and stay as-is, like TPC-H.

Then the six driver bench queries run at sf0.1 and sf1 in ONE Ray
session (sf0.1 first = warmup + same-session baseline), plus
``prepare_corpus`` at 100k and 1M docs (the bench site's markdown ×10
replicas, same mutation scheme). Prints one JSON line with walls and
sf1/sf0.1 ratios; the streaming claim holds if ratios stay ≤ ~12×.

Run: ``cd /root/repo && python scripts/sf1_scale_proof.py``
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("GRAFT_SF1_DIR", "/tmp/testdata_sf1")
REPLICAS = 10

# per-table (column → per-replica key offset); offsets exceed every
# base-table key range so replica key spaces never collide
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
TEXT_MUT = {"documents": "text"}     # replica-mutated payload columns
PASSTHROUGH = ("region", "nation")   # dimension tables: one copy


def mutate_text(col: pa.ChunkedArray, i: int) -> pa.ChunkedArray:
    """Deterministic replica-i text mutation: every 'e' → 'e<i>'.
    ~60% of English words contain an 'e', so cross-replica word-level
    Jaccard collapses far below any near-dup threshold while
    within-replica duplicate structure is preserved exactly."""
    return pc.replace_substring(col, "e", f"e{i}")


def build_sf1() -> None:
    os.makedirs(SF1, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SF01}/{t}.parquet", f"{SF1}/{t}.parquet")
    for t, offs in OFFSETS.items():
        base = pq.read_table(f"{SF01}/{t}.parquet")
        parts = []
        for i in range(REPLICAS):
            cols = {}
            for name in base.column_names:
                c = base.column(name)
                if name in offs and i:
                    c = pc.add(c, pa.scalar(i * offs[name], type=c.type))
                elif name == TEXT_MUT.get(t) and i:
                    c = mutate_text(c, i)
                cols[name] = c
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{SF1}/{t}.parquet.tmp")
        os.replace(f"{SF1}/{t}.parquet.tmp", f"{SF1}/{t}.parquet")
        print(f"  {t}: {base.num_rows} -> {out.num_rows} rows",
              file=sys.stderr)


def corpus_docs(n_docs: int, num_cpus: int):
    """doc dataset from the cached bench site markdown; >360k docs come
    from replica-mutated copies (same scheme as the documents table)."""
    import ray.data as rd

    site = pq.read_table(
        "/tmp/graft_bench_site_360000_192_42/site.parquet",
        columns=["markdown"])
    md = site.column("markdown").combine_chunks()
    base_n = min(n_docs, len(md))
    parts, made = [], 0
    i = 0
    while made < n_docs:
        take = min(n_docs - made, base_n)
        text = md[:take]
        if i:
            text = mutate_text(pa.chunked_array([text]), i)
        parts.append(pa.table({
            "doc_id": pa.array(
                np.arange(made, made + take, dtype=np.int64)),
            "text": text,
        }))
        made += take
        i += 1
    tbl = pa.concat_tables(parts)
    return rd.from_arrow(tbl).repartition(4 * num_cpus), tbl


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not os.path.exists(f"{SF1}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_sf1()
        print(f"sf1 build: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as E
    from web2llmstxt_ray.pipelines.corpus_prep import prepare_corpus

    queries = E.queries()
    names = ("pricing_summary", "priority_revenue", "token_counts",
             "ann_topk", "events_sessions", "minhash_dedup")
    out = {"sf0.1": {}, "sf1": {}, "ratio": {}, "num_cpus": num_cpus}
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        for name in names:
            t0 = time.perf_counter()
            queries[name](sf_dir)
            out[sf_label][name] = round(time.perf_counter() - t0, 3)
            print(f"  {sf_label} {name}: {out[sf_label][name]}s",
                  file=sys.stderr)

    for label, n in (("sf0.1", 100_000), ("sf1", 1_000_000)):
        ds, tbl = corpus_docs(n, num_cpus)
        bench_texts = tbl.column("text").to_pylist()[::997][:120]
        prep_dir = f"/tmp/sf1_proof_corpus_{n}"
        shutil.rmtree(prep_dir, ignore_errors=True)
        t0 = time.perf_counter()
        prepare_corpus(ds, prep_dir, bench_texts=bench_texts,
                       min_words=20, langs=(), max_bigram_frac=0.5)
        out[label]["corpus_prep"] = round(time.perf_counter() - t0, 3)
        print(f"  {label} corpus_prep({n}): {out[label]['corpus_prep']}s",
              file=sys.stderr)
        shutil.rmtree(prep_dir, ignore_errors=True)

    for name in list(out["sf1"]):
        out["ratio"][name] = round(out["sf1"][name] / out["sf0.1"][name], 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
