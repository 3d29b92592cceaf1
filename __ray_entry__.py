"""Driver contract: entry() smoke pipeline, queries() per operator,
oracle_sql() DuckDB equivalents (run side-by-side at sf=0.01).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.

Query naming convention: every aggregate/computed column is aliased
identically in the Ray implementation and the SQL so the driver's
order-insensitive value-hash matches. Floats are rounded identically on
both sides (sums → 2 d.p., ratios/averages/cosines → 4-6 d.p.).

Queries without an ``oracle_sql`` entry are the genuinely
non-SQL-expressible ones (MinHash-LSH clustering, SimHash, IVF-ANN,
the distributed BFS crawl, media decode) — they get the driver's
rows-only check and are conformance-tested against sequential oracles
in ``tests/`` instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The driver imports this module by file path (importlib.spec_from_file_location)
# from an arbitrary cwd, so the repo root is not necessarily on sys.path and
# ``web2llmstxt_ray`` would not import — this was exactly the round-1 failure
# mode (every query raised ModuleNotFoundError → empty CORRECTNESS artifact).
# And since Ray was initialised by the driver BEFORE this import, workers
# captured their environment without the repo root either; the bootstrap
# registers the package for cloudpickle pickle-by-value so shipped
# closures/actor classes are self-contained (see bootstrap.py).
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from web2llmstxt_ray.bootstrap import ensure_worker_importable  # noqa: E402

ensure_worker_importable()

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

ROUND_SUM = 2
ROUND_RATIO = 6

# Soundex run-collapse as chained per-digit regexp_replace (RE2 has no
# backreferences): shared by the soundex_blocks oracle f-string.
_SOUNDEX_COLLAPSE_SQL = "d1"
for _d in "0123456":
    _SOUNDEX_COLLAPSE_SQL = (
        f"regexp_replace({_SOUNDEX_COLLAPSE_SQL}, "
        f"'{_d}{{2,}}', '{_d}', 'g')")
del _d


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _pdf(ds: rd.Dataset) -> pd.DataFrame:
    return ds.to_pandas()


def _rn(**mapping: str):
    """Batch fn renaming columns BY NAME (old=new), immune to column
    reordering — positional ``rename_columns([...])`` silently depends
    on the read preserving the requested column order (round-3
    ADVICE)."""
    def _fn(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [mapping.get(n, n) for n in b.schema.names])
    return _fn


# ---------------------------------------------------------------------------
# flagship entry: documents → interleaved span documents (flattened)
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: sf0.001 documents through the engine's core per-document
    pipeline — interleaved span extraction (the input_hint data model)
    fused with the extraction suite signals (tokens, language, quality,
    fingerprint, SimHash) in one zero-copy ``map_batches`` pass.
    Output: one flat row per span with the document-level signals
    attached (stable schema, no nested types)."""
    from web2llmstxt_ray.ops.dedup import simhash64
    from web2llmstxt_ray.ops.textstats import (
        canonical_fingerprint, detect_language, tokenize_ws)
    from web2llmstxt_ray.stages.spans import extract_spans

    docs = _t("/root/testdata/sf0.001", "documents", ["doc_id", "text"])

    def process(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "kind": [], "text": [],
               "media_ref": [], "offset": [], "n_tokens": [],
               "predicted_lang": [], "fingerprint": [], "simhash": []}
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            text = text or ""
            n_tokens = len(tokenize_ws(text))
            lang = detect_language(text)
            fp = canonical_fingerprint(text)
            sh = f"{simhash64(text):016x}"
            for i, s in enumerate(extract_spans(text)):
                out["doc_id"].append(did)
                out["span_idx"].append(i)
                out["kind"].append(s["kind"])
                out["text"].append(s["text"])
                out["media_ref"].append(s["media_ref"])
                out["offset"].append(s["offset"])
                out["n_tokens"].append(n_tokens)
                out["predicted_lang"].append(lang)
                out["fingerprint"].append(fp)
                out["simhash"].append(sh)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "kind": pa.array(out["kind"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "offset": pa.array(out["offset"], pa.int32()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "predicted_lang": pa.array(out["predicted_lang"], pa.string()),
            "fingerprint": pa.array(out["fingerprint"], pa.string()),
            "simhash": pa.array(out["simhash"], pa.string()),
        })

    return docs.map_batches(process, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# relational / aggregate queries (SQL-oracled)
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-style grouped aggregate with per-batch partial
    aggregation before the shuffle."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"])
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.less(
            t["l_shipdate"], pa.scalar(pd.Timestamp("1998-01-01")))),
        batch_format="pyarrow")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(disc_price=b.l_extendedprice * (1 - b.l_discount))
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"))

    out = partial_groupby(
        ds, ["l_returnflag", "l_linestatus"], batch_agg,
        ["sum_qty", "sum_base_price", "sum_disc_price", "count_order"])
    out["avg_qty"] = (out.sum_qty / out.count_order).round(ROUND_RATIO)
    out["avg_price"] = (out.sum_base_price / out.count_order).round(ROUND_RATIO)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(ROUND_SUM)
    out["count_order"] = out["count_order"].astype("int64")
    return out


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k by sort: distributed sort + limit."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(20)
    out = _pdf(top)
    out["o_totalprice"] = out["o_totalprice"].round(ROUND_SUM)
    return out


def q_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (small dimension side shipped once via ray.put)."""
    from web2llmstxt_ray.ops.relational import broadcast_join, partial_groupby

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = pa.concat_tables(
        [ray.get(r) for r in
         _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_arrow_refs()])
    customer = customer.rename_columns(
        ["o_custkey" if n == "c_custkey" else n
         for n in customer.schema.names])
    joined = broadcast_join(orders, customer, on="o_custkey")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            revenue=("o_totalprice", "sum"))

    out = partial_groupby(joined, ["c_mktsegment"], batch_agg,
                          ["n_orders", "revenue"])
    out["revenue"] = out["revenue"].round(ROUND_SUM)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Two large sides → explicit bucketed hash join."""
    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    lineitem = _t(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(_rn(o_orderkey="l_orderkey"), batch_format="pyarrow")
    joined = hash_join(lineitem, orders, on="l_orderkey", num_buckets=16)

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(rev=b.l_extendedprice * (1 - b.l_discount))
        return b.groupby("o_orderpriority", as_index=False).agg(
            n_items=("rev", "size"), revenue=("rev", "sum"))

    out = partial_groupby(joined, ["o_orderpriority"], batch_agg,
                          ["n_items", "revenue"])
    out["revenue"] = out["revenue"].round(ROUND_SUM)
    out["n_items"] = out["n_items"].astype("int64")
    return out


def q_region_suppliers(sf_dir: str) -> pd.DataFrame:
    """Chained broadcast joins over the dimension snowflake."""
    from web2llmstxt_ray.ops.relational import broadcast_join, partial_groupby

    supplier = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nation = pa.concat_tables(
        [ray.get(r) for r in
         _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_arrow_refs()])
    region = pa.concat_tables(
        [ray.get(r) for r in
         _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_arrow_refs()])
    nr = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    nr = nr.rename(columns={"n_nationkey": "s_nationkey"})[["s_nationkey", "r_name"]]
    joined = broadcast_join(supplier, nr, on="s_nationkey")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"),
            total_acctbal=("s_acctbal", "sum"))

    out = partial_groupby(joined, ["r_name"], batch_agg,
                          ["n_suppliers", "total_acctbal"])
    out["total_acctbal"] = out["total_acctbal"].round(ROUND_SUM)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out


def q_fulfilled_customers(sf_dir: str) -> pd.DataFrame:
    """Semi-join via broadcast key set (no shuffle)."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    f_orders = _t(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pa.compute.equal(t["o_orderstatus"], "F")),
        batch_format="pyarrow")
    # collect the key column as Arrow blocks (no Python row dicts),
    # distinct it vectorized, broadcast once; probe with pc.is_in
    key_tbl = pa.concat_tables(
        [ray.get(r) for r in
         f_orders.select_columns(["o_custkey"]).to_arrow_refs()])
    key_ref = ray.put(pa.compute.unique(key_tbl.column("o_custkey")))

    class _Semi:
        def __init__(self):
            self.keys = ray.get(key_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            mask = pa.compute.is_in(b.column("c_custkey"),
                                    value_set=self.keys)
            return b.filter(mask)

    customer = _t(sf_dir, "customer",
                  ["c_custkey", "c_mktsegment", "c_acctbal"])
    filtered = customer.map_batches(_Semi, batch_format="pyarrow",
                                    concurrency=(1, 4), num_cpus=0.5)

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("c_acctbal", "size"), sum_acctbal=("c_acctbal", "sum"))

    out = partial_groupby(filtered, ["c_mktsegment"], batch_agg,
                          ["n_customers", "sum_acctbal"])
    out["avg_acctbal"] = (out.sum_acctbal / out.n_customers).round(ROUND_RATIO)
    out["sum_acctbal"] = out["sum_acctbal"].round(ROUND_SUM)
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def q_part_type_stats(sf_dir: str) -> pd.DataFrame:
    """Filter pushdown + grouped aggregate."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ds = _t(sf_dir, "part", ["p_type", "p_size", "p_retailprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["p_size"], 30)),
        batch_format="pyarrow")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("p_type", as_index=False).agg(
            n_parts=("p_retailprice", "size"),
            sum_retail=("p_retailprice", "sum"))

    out = partial_groupby(ds, ["p_type"], batch_agg,
                          ["n_parts", "sum_retail"])
    out["avg_retail"] = (out.sum_retail / out.n_parts).round(ROUND_RATIO)
    out["sum_retail"] = out["sum_retail"].round(ROUND_SUM)
    out["n_parts"] = out["n_parts"].astype("int64")
    return out


def q_idle_customers(sf_dir: str) -> pd.DataFrame:
    """Bucketed ANTI join: customers with no high-value (>300k) order.
    The right side is projected to its key before the shuffle —
    membership semantics, so the order payload never moves. (Every
    customer has SOME order in this synthetic data, so the filter makes
    the anti set non-trivial.)"""
    from web2llmstxt_ray.ops.relational import hash_join

    customer = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    _keep_key = _rn(o_custkey="c_custkey")
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(
            lambda t: _keep_key(t.filter(
                pa.compute.greater(t["o_totalprice"], 300_000.0)).select(
                ["o_custkey"])),
            batch_format="pyarrow")
    out = hash_join(customer, orders, on="c_custkey", num_buckets=16,
                    how="anti").to_pandas()
    out = out.reindex(columns=["c_custkey", "c_acctbal"])
    out["c_acctbal"] = out["c_acctbal"].astype("float64").round(ROUND_SUM)
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_segment_order_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER bucketed hash join: high-balance customers ⟗
    per-customer order counts. Unmatched rows from BOTH sides survive
    (rich customers with no orders; ordering customers below the
    balance cut) — deterministic null fills so the hash compare is
    well-defined."""
    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    customer = _t(sf_dir, "customer",
                  ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
        lambda t: t.filter(pa.compute.greater(t["c_acctbal"], 7500.0))
                   .select(["c_custkey", "c_mktsegment"]),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_custkey"]).map_batches(
        _rn(o_custkey="c_custkey"), batch_format="pyarrow")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_custkey", as_index=False).agg(
            n_orders=("c_custkey", "size"))

    counts = partial_groupby(orders, ["c_custkey"], batch_agg,
                             ["n_orders"], distributed_combine=True)
    out = hash_join(customer, counts, on="c_custkey",
                    num_buckets=16, how="outer").to_pandas()
    out["c_mktsegment"] = out["c_mktsegment"].fillna("NONE")
    out["n_orders"] = out["n_orders"].fillna(-1).astype("int64")
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_customer_order_stats(sf_dir: str) -> pd.DataFrame:
    """Bucketed LEFT OUTER join + per-customer aggregate: customers
    without orders survive with n_orders=0 / total_spent=0 (the rows an
    inner join silently drops)."""
    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    customer = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _rn(o_custkey="c_custkey"), batch_format="pyarrow")
    joined = hash_join(customer, orders, on="c_custkey", num_buckets=16,
                       how="left")

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "count"),      # NaN (no order) → 0
            total_spent=("o_totalprice", "sum"))     # all-NaN group → 0.0

    # per-customer groups: high-cardinality → distributed combine
    out = partial_groupby(joined, ["c_custkey"], batch_agg,
                          ["n_orders", "total_spent"],
                          distributed_combine=True).to_pandas()
    out["total_spent"] = out["total_spent"].round(ROUND_SUM)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_latest_events(sf_dir: str) -> pd.DataFrame:
    """Per-key argmax (latest event per user): per-batch partial winners
    → bucketed distributed combine; only O(batches × keys) rows
    shuffle."""
    from web2llmstxt_ray.ops.relational import argmax_by_key

    events = _t(sf_dir, "events",
                ["event_id", "ts", "user_id", "event_type", "value"])
    out = argmax_by_key(events, key="user_id", order_col="ts",
                        tie_col="event_id", distributed_combine=True,
                        num_buckets=16).to_pandas()
    out["value"] = out["value"].round(ROUND_RATIO)
    out = out[["user_id", "event_id", "ts", "event_type", "value"]]
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# documents: dedup / fingerprints / text stats (SQL-oracled)
# ---------------------------------------------------------------------------


def q_orders_by_month(sf_dir: str) -> pd.DataFrame:
    """Date-bucketed aggregate (month floor both sides)."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(order_month=b.o_orderdate.values.astype("datetime64[M]"))
        return b.groupby("order_month", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            revenue=("o_totalprice", "sum"))

    out = partial_groupby(ds, ["order_month"], batch_agg,
                          ["n_orders", "revenue"])
    out["revenue"] = out["revenue"].round(ROUND_SUM)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["order_month"] = pd.to_datetime(out["order_month"])
    return out


def q_discount_bands(sf_dir: str) -> pd.DataFrame:
    """CASE-style banding + aggregate (band logic mirrored in SQL)."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ds = _t(sf_dir, "lineitem", ["l_discount", "l_extendedprice"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        band = np.where(b.l_discount < 0.03, "low",
                        np.where(b.l_discount < 0.07, "mid", "high"))
        b = b.assign(discount_band=band)
        return b.groupby("discount_band", as_index=False).agg(
            n_items=("l_extendedprice", "size"),
            total_price=("l_extendedprice", "sum"))

    out = partial_groupby(ds, ["discount_band"], batch_agg,
                          ["n_items", "total_price"])
    out["total_price"] = out["total_price"].round(ROUND_SUM)
    out["n_items"] = out["n_items"].astype("int64")
    return out


def q_orders_per_customer_hist(sf_dir: str) -> pd.DataFrame:
    """Two-level aggregate: orders per customer, then histogram of that
    count (distribution shape)."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ds = _t(sf_dir, "orders", ["o_custkey"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).agg(n=("o_custkey", "size"))
        return g

    per_cust = partial_groupby(ds, ["o_custkey"], batch_agg, ["n"])
    hist = per_cust.groupby("n", as_index=False).agg(
        n_customers=("o_custkey", "size"))
    hist = hist.rename(columns={"n": "orders_per_customer"})
    hist["n_customers"] = hist["n_customers"].astype("int64")
    hist["orders_per_customer"] = hist["orders_per_customer"].astype("int64")
    return hist


def q_top_parts_per_type(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k: 3 priciest parts per p_type (groupby →
    sort-within-group; SQL row_number window)."""
    ds = _t(sf_dir, "part", ["p_type", "p_partkey", "p_retailprice"])

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["p_retailprice", "p_partkey"],
                              ascending=[False, True]).head(3)
        g = g.assign(rank=range(1, len(g) + 1))
        return g

    out = ds.groupby("p_type").map_groups(topk, batch_format="pandas")         .to_pandas()
    out["p_retailprice"] = out["p_retailprice"].round(ROUND_SUM)
    out["rank"] = out["rank"].astype("int64")
    return out[["p_type", "rank", "p_partkey", "p_retailprice"]]


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.dedup import exact_dedup

    out = _pdf(exact_dedup(_t(sf_dir, "documents", ["doc_id", "text"])))
    return out[["content_hash", "doc_id"]]


def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Cross-run dedup: flag documents whose content already exists in
    a prior corpus (docs with id % 3 == 0), via a broadcast exact-hash
    digest — the corpus analogue of the crawl's persistent seen filter
    (bloom digest is the constant-size scale tier, pytest-verified)."""
    from web2llmstxt_ray.ops.dedup import (
        dedup_against_prior, prior_corpus_digest)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def third(keep_prior):
        def f(t: pa.Table) -> pa.Table:
            arr = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (arr % 3 == 0) if keep_prior else (arr % 3 != 0)
            return t.filter(pa.array(mask))
        return f

    prior = docs.map_batches(third(True), batch_format="pyarrow")
    new = docs.map_batches(third(False), batch_format="pyarrow")
    digest = prior_corpus_digest(prior, mode="exact")
    out = _pdf(dedup_against_prior(new, digest))
    out["is_dup"] = out["is_dup"].astype("int64")
    return out[["doc_id", "is_dup"]]


def q_fingerprints(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.textstats import fingerprints

    out = _pdf(fingerprints(_t(sf_dir, "documents", ["doc_id", "text"])))
    return out[["doc_id", "fingerprint"]]


def q_token_counts(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.textstats import token_counts

    return _pdf(token_counts(_t(sf_dir, "documents", ["doc_id", "text"])))


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.textstats import quality_scores

    return _pdf(quality_scores(_t(sf_dir, "documents", ["doc_id", "text"])))


def q_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-style composite quality filter: keep documents passing all
    rule thresholds (rules computed with the same SQL-mirrorable
    definitions as doc_quality). Returns the surviving doc ids with
    their signals."""
    from web2llmstxt_ray.ops.textstats import quality_scores

    scored = quality_scores(_t(sf_dir, "documents", ["doc_id", "text"]))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.and_(pc.greater_equal(batch["n_words"], 20),
                    pc.less_equal(batch["punct_ratio"], 0.2)),
            pc.and_(pc.greater_equal(batch["mean_word_len"], 2.0),
                    pc.less_equal(batch["mean_word_len"], 12.0)),
        )
        return batch.filter(mask)

    out = _pdf(scored.map_batches(keep, batch_format="pyarrow"))
    return out[["doc_id", "n_words", "punct_ratio", "mean_word_len"]]


def q_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Vocabulary top-50: per-batch Counter partials -> hash-bucket
    merge -> per-bucket top-k -> driver merge of B*k rows."""
    from web2llmstxt_ray.ops.corpus import top_tokens

    out = top_tokens(_t(sf_dir, "documents", ["text"]), k=50)
    return out


def q_top_tokens_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language vocabulary top-10 (count desc, token asc) —
    bucketed-by-token partial merge, driver holds buckets x langs x k."""
    from web2llmstxt_ray.ops.corpus import top_tokens_by_group

    return top_tokens_by_group(
        _t(sf_dir, "documents", ["lang", "text"]), "lang", k=10)


def q_doc_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic mod-sample: exact, reproducible train/eval split."""
    from web2llmstxt_ray.ops.corpus import sample_mod

    out = _pdf(sample_mod(_t(sf_dir, "documents", ["doc_id", "lang"]),
                          "doc_id", modulus=10, keep_below=3))
    return out[["doc_id", "lang"]]


def q_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Greedy FFD sequence packing over per-doc token counts, in the
    GLOBALLY deterministic ``bucket_mod`` tier (docs grouped by
    ``doc_id % 16``, FFD per bucket) — the pack layout is a pure
    function of the data, so the DuckDB twin replays the exact FFD
    fold per bucket with a recursive CTE and the driver hash-compares
    every pack (round-3 flip from rows-only). pack_id = md5 of the
    sorted member ids. The shuffle-free per-block tier stays
    invariant-tested in tests/test_corpus.py."""
    import hashlib

    from web2llmstxt_ray.ops.corpus import pack_sequences
    from web2llmstxt_ray.ops.textstats import token_counts

    counts = token_counts(_t(sf_dir, "documents", ["doc_id", "text"])) \
        .select_columns(["doc_id", "n_tokens"])
    packs = pack_sequences(counts, max_tokens=2048,
                           bucket_mod=16).to_pandas()
    packs["pack_id"] = packs["doc_ids"].map(
        lambda v: hashlib.md5(
            ",".join(map(str, sorted(v))).encode()).hexdigest())
    packs = packs.drop(columns=["doc_ids"])  # list col: keep schema flat
    packs["n_docs"] = packs["n_docs"].astype("int64")
    packs["total_tokens"] = packs["total_tokens"].astype("int64")
    return packs.sort_values("pack_id").reset_index(drop=True)


def q_lang_hist(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count

    out = _pdf(_t(sf_dir, "documents", ["lang"]).groupby("lang").aggregate(
        Count(alias_name="n_docs")))
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


# scrub patterns for q_redact_terms: one that actually occurs in the
# synthetic corpus (so the oracle exercises real replacement) plus a
# real email pattern (regex-dialect-portable; see ops/scrub.py)
_REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "term": r"value [a-z]+",
}


def q_redact_terms(sf_dir: str) -> pd.DataFrame:
    """Pattern redaction (the PII-scrub stage) over documents; output
    is the redacted text + per-doc replacement count."""
    from web2llmstxt_ray.ops.scrub import redact

    out = _pdf(redact(_t(sf_dir, "documents", ["doc_id", "text"]),
                      patterns=_REDACT_PATTERNS))
    out["n_redactions"] = out["n_redactions"].astype("int64")
    return out[["doc_id", "text", "n_redactions"]]


def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: flag documents containing any snippet
    of the (deterministically chosen) benchmark set — docs whose id is
    divisible by 97 contribute text[10:60]. Snippets broadcast once via
    ray.put; per-batch probe is vectorized pc.match_substring."""
    from web2llmstxt_ray.ops.scrub import decontaminate_flags

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bench_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = [(t or "")[10:60] for i, t in zip(ids, texts)
                if i % 97 == 0 and len(t or "") >= 60]
        return pa.table({"snippet": pa.array(keep, pa.string())})

    snippets = [r["snippet"] for r in
                docs.map_batches(bench_rows, batch_format="pyarrow")
                .take_all()]
    out = _pdf(decontaminate_flags(docs, snippets))
    out["contaminated"] = out["contaminated"].astype("int64")
    return out[["doc_id", "contaminated"]]


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition signals as exact integer numerators
    (n_words, n_distinct, top_bigram_cnt)."""
    from web2llmstxt_ray.ops.scrub import repetition_stats

    out = _pdf(repetition_stats(_t(sf_dir, "documents",
                                   ["doc_id", "text"])))
    return out[["doc_id", "n_words", "n_distinct", "top_bigram_cnt"]]


def q_decontaminate_ngram(sf_dir: str) -> pd.DataFrame:
    """Scale-tier decontamination: word-8-gram bloom probe (constant
    broadcast size, O(words)/doc, no false negatives). Rows-only: the
    bloom verdict is deterministic but not SQL-expressible; the exact
    tier (q_decontaminate) is the SQL-oracled sibling."""
    from web2llmstxt_ray.ops.scrub import decontaminate_ngram_flags

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bench_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = [t or "" for i, t in zip(ids, texts) if i % 97 == 0]
        return pa.table({"text": pa.array(keep, pa.string())})

    bench = [r["text"] for r in
             docs.map_batches(bench_rows, batch_format="pyarrow").take_all()]
    out = _pdf(decontaminate_ngram_flags(docs, bench, n=8))
    out["contaminated"] = out["contaminated"].astype("int64")
    out["n_hit_grams"] = out["n_hit_grams"].astype("int64")
    return out[["doc_id", "contaminated", "n_hit_grams"]]


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Sketch-pruned exact top-10 users by event count (round-3 flip
    from rows-only): the Count-Min pass ranks a candidate superset
    (top-32 by CM estimate, shuffle-free — any global heavy hitter is
    a local heavy hitter in some batch), then ONE broadcast-filtered
    map pass exact-counts just those candidates (partial counters, no
    key shuffle), and the top-10 by (n desc, user_id asc) is reported
    with EXACT counts — so the DuckDB twin is the plain exact top-10
    and hashes bit-for-bit. The CM estimates themselves stay
    conformance-tested in tests/test_sketch.py (upper-bound + error
    envelope), and the 32-candidate margin is far wider than the CM
    overestimate on this width, so the candidate set always covers
    the true top-10."""
    from web2llmstxt_ray.ops.sketch import heavy_hitters

    ev = _t(sf_dir, "events", ["user_id"])
    cand = {v for v, _ in heavy_hitters(ev, "user_id", k=32)}
    cref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        cs = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        vals = [str(v) for v in batch.column("user_id").to_pylist()]
        from collections import Counter

        cnt = Counter(v for v in vals if v in cs)
        return pa.table({
            "user_id": pa.array(list(cnt.keys()), pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64())})

    parts = ev.map_batches(exact_partial,
                           batch_format="pyarrow").to_pandas()
    exact = parts.groupby("user_id", as_index=False)["n"].sum()
    exact["user_id"] = exact["user_id"].astype("int64")
    exact = exact.sort_values(["n", "user_id"],
                              ascending=[False, True]).head(10)
    return exact.reset_index(drop=True)


def q_corpus_prep(sf_dir: str) -> pd.DataFrame:
    """Composition flagship: the full corpus-prep chain (exact dedup →
    MinHash near-dup → fused annotate with lang/repetition/
    decontamination verdicts → packs) over the documents table; returns
    the audit table. Rows-only: the verdict composition (LSH + bloom)
    is not SQL-expressible, but each constituent operator has its own
    SQL-oracled query, and tests/test_corpus_prep.py verifies planted
    defects of every drop class plus stage-checkpoint resume."""
    import tempfile

    from web2llmstxt_ray.pipelines.corpus_prep import prepare_corpus
    from web2llmstxt_ray.sinks import read_span_docs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bench_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = [t or "" for i, t in zip(ids, texts) if i % 97 == 0]
        return pa.table({"text": pa.array(keep, pa.string())})

    bench = [r["text"] for r in
             docs.map_batches(bench_rows, batch_format="pyarrow").take_all()]
    with tempfile.TemporaryDirectory() as wd:
        prepare_corpus(docs, wd, bench_texts=bench, min_words=20,
                       langs=(), max_bigram_frac=0.5)
        out = read_span_docs(f"{wd}/annotated",
                             columns=["doc_id", "predicted_lang", "n_words",
                                      "keep", "drop_reason"]).to_pandas()
    out["keep"] = out["keep"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic 20-per-language sample via per-block partial top-N
    on a multiplicative-hash order key."""
    from web2llmstxt_ray.ops.corpus import stratified_sample

    out = stratified_sample(_t(sf_dir, "documents",
                               ["doc_id", "lang", "source"]),
                            "lang", 20, keep_cols=("source",))
    return out[["doc_id", "lang", "source"]]


_MIX_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25}


def q_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Domain-mixture reweighting: per-language fractional quotas
    (ceil(rate·n) smallest-hash rows; unlisted languages dropped)."""
    from web2llmstxt_ray.ops.corpus import quota_sample

    out = quota_sample(_t(sf_dir, "documents", ["doc_id", "lang"]),
                       "lang", _MIX_RATES)
    return out[["doc_id", "lang"]]


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (class prototypes) via per-block
    partial sum vectors — no shuffle of the vectors."""
    from web2llmstxt_ray.ops.ann import label_centroids

    out = label_centroids(_t(sf_dir, "embeddings", ["label", "embedding"]),
                          round_to=ROUND_RATIO)
    return out[["label", "dim", "mean_v"]]


def q_chars_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-language nearest-rank quantiles of n_chars via the
    distributed value-count histogram (no global sort)."""
    from web2llmstxt_ray.ops.corpus import int_quantiles

    out = int_quantiles(_t(sf_dir, "documents", ["lang", "n_chars"]),
                        "n_chars", (0.25, 0.5, 0.75), group_col="lang")
    out["value"] = out["value"].astype("int64")
    return out[["lang", "q", "value"]]


# ---------------------------------------------------------------------------
# events: windows (SQL-oracled)
# ---------------------------------------------------------------------------


def q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.windows import tumbling_window

    out = tumbling_window(_t(sf_dir, "events", ["event_type", "ts", "value"]))
    out["sum_value"] = out["sum_value"].round(ROUND_SUM)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_running_totals(sf_dir: str) -> pd.DataFrame:
    """Per-event cumulative aggregates (running count / sum / max per
    user ordered by time) — bucketed shuffle + vectorized within-bucket
    cumulatives; integer-cent running sums make it bit-exact vs the SQL
    window oracle."""
    from web2llmstxt_ray.ops.windows import running_totals

    out = _pdf(running_totals(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])))
    for c in ("run_n", "run_sum_cents"):
        out[c] = out[c].astype("int64")
    return out


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.windows import sessionize

    out = _pdf(sessionize(_t(sf_dir, "events", ["user_id", "ts"])))
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_session_stats(sf_dir: str) -> pd.DataFrame:
    """Exploded per-session windows (user_id, session_idx, n_events,
    duration_s, sum_value) — SQL window-function oracle."""
    from web2llmstxt_ray.ops.windows import session_stats

    out = _pdf(session_stats(
        _t(sf_dir, "events", ["user_id", "ts", "value"])))
    out["session_idx"] = out["session_idx"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["duration_s"] = out["duration_s"].round(ROUND_RATIO)
    out["sum_value"] = out["sum_value"].round(ROUND_SUM)
    return out[["user_id", "session_idx", "n_events", "duration_s",
                "sum_value"]]


def _events_of(sf_dir: str, etype: str) -> rd.Dataset:
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return ds.map_batches(
        lambda t, e=etype: t.filter(pa.compute.equal(t["event_type"], e)),
        batch_format="pyarrow")


def q_events_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase gets the latest same-user view at or
    before it (bucketed merge_asof — one shuffle of narrow columns)."""
    from web2llmstxt_ray.ops.joins import asof_join

    out = _pdf(asof_join(_events_of(sf_dir, "purchase"),
                         _events_of(sf_dir, "view")))
    return out[["event_id", "user_id", "ts", "prior_ts"]]


def q_events_range_counts(sf_dir: str) -> pd.DataFrame:
    """Trailing-interval range join: views in the hour before each
    purchase, counted per purchase via two vectorized searchsorted
    probes per user (no pairwise expansion)."""
    from web2llmstxt_ray.ops.joins import range_join_count

    out = _pdf(range_join_count(_events_of(sf_dir, "purchase"),
                                _events_of(sf_dir, "view"),
                                window_s=3600.0))
    out["n_in_window"] = out["n_in_window"].astype("int64")
    return out[["event_id", "user_id", "ts", "n_in_window"]]


def q_events_hopping(sf_dir: str) -> pd.DataFrame:
    """Hopping windows (1 h size / 15 min hop): vectorized 4x event
    expansion inside map_batches, then the partial-agg combine path."""
    from web2llmstxt_ray.ops.windows import hopping_window

    out = hopping_window(_t(sf_dir, "events", ["event_type", "ts", "value"]))
    out["sum_value"] = out["sum_value"].round(ROUND_SUM)
    out["n_events"] = out["n_events"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# embeddings: similarity search (brute-force SQL-oracled; IVF rows-only)
# ---------------------------------------------------------------------------

_NUM_ANN_QUERIES = 5


def _query_vectors(sf_dir: str):
    tbl = pa.concat_tables(
        [ray.get(r) for r in
         _t(sf_dir, "embeddings", ["vec_id", "embedding"]).to_arrow_refs()])
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    by_id = dict(zip(ids, vecs))
    qids = sorted(by_id)[:_NUM_ANN_QUERIES]
    return np.array([by_id[q] for q in qids], dtype=np.float64), qids


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.ann import brute_force_topk

    queries, qids = _query_vectors(sf_dir)
    out = brute_force_topk(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                           queries, qids, k=10)
    return out.to_pandas()


def q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.dedup import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.4)
    df = out.to_pandas()
    df["cosine"] = df["cosine"].round(4)
    return df


def q_embedding_near_dup_ivf(sf_dir: str) -> pd.DataFrame:
    """Approximate (IVF multi-probe) near-dup pairs — the linear-ish
    scale path; deterministic (seeded k-means on a deterministic
    sample), so the rows-only check is repeatable. Recall vs the exact
    path is pytest-gated in tests/test_dedup.py."""
    from web2llmstxt_ray.ops.dedup import embedding_near_dup_pairs_ivf

    out = embedding_near_dup_pairs_ivf(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.4,
        num_lists=8, assign_probes=2)
    df = out.to_pandas()
    df["cosine"] = df["cosine"].round(4)
    return df


def q_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup: k-means partition → within-cluster cosine dup groups →
    keep the member farthest from the centroid. Deterministic (seeded
    sample-init + full-corpus Lloyd), rows-only check (k-means isn't
    SQL-expressible); the grouping/keeper invariants are pytest-gated
    in tests/test_dedup.py::TestSemanticDedup."""
    from web2llmstxt_ray.ops.dedup import semantic_dedup

    out = semantic_dedup(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                         threshold=0.9, k=8).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.ann import ivf_topk, train_centroids

    queries, qids = _query_vectors(sf_dir)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = np.array([r["embedding"] for r in ds.take(256)], dtype=np.float64)
    centroids = train_centroids(sample, num_lists=8)
    return ivf_topk(ds, centroids, queries, qids, k=10, nprobe=4).to_pandas()


def q_events_resample(sf_dir: str) -> pd.DataFrame:
    """Time-series gap fill: every user's irregular event values
    resampled onto a daily grid with forward fill — one bucketed
    shuffle, one vectorized merge_asof per bucket. Hash-exact vs the
    DuckDB ASOF LEFT JOIN oracle (duplicate-ts observations pre-resolve
    to max(value) on both sides)."""
    from web2llmstxt_ray.ops.windows import resample_ffill

    start = int(pd.Timestamp("2024-01-01").value // 1000)
    end = int(pd.Timestamp("2024-01-31").value // 1000)
    day = 86_400_000_000
    ev = _t(sf_dir, "events", ["user_id", "ts", "value"])
    out = _pdf(resample_ffill(ev, start, end, day))
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(["user_id", "grid_ts"]).reset_index(drop=True)


def q_events_zorder_box(sf_dir: str) -> pd.DataFrame:
    """2-D box read over a Z-ORDERED layout (Morton-interleaved
    (value, user_id) key → range partitions): the box touches only the
    partitions inside the corner-bracketed z-range (sound by Morton
    coordinate monotonicity) + exact residual — hash-exact vs the
    two-predicate SQL WHERE scan."""
    import tempfile

    from web2llmstxt_ray.ops.layout import (read_zorder_box,
                                            write_zorder_partitioned)

    ev = _t(sf_dir, "events", ["event_id", "user_id", "value"])
    path = tempfile.mkdtemp(prefix="graft_zorderlay_")
    write_zorder_partitioned(ev, path, "value", "user_id",
                             num_parts=16)
    out = _pdf(read_zorder_box(path, 100.0, 300.0, 10.0, 60.0))
    out = out[["event_id", "user_id", "value"]]
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_recrawl_priorities(sf_dir: str) -> pd.DataFrame:
    """Recrawl scheduling (Cho & Garcia-Molina staleness): per-key
    count/min/max partials (raw events never shuffle) → exact-integer
    staleness ratio with ONE float division → deterministic top-50.
    Hash-exact vs the epoch_us SQL oracle."""
    from web2llmstxt_ray.ops.recrawl import recrawl_priorities

    now_us = int(pd.Timestamp("2025-06-01").value // 1000)
    ev = _t(sf_dir, "events", ["user_id", "ts"])
    out = recrawl_priorities(ev, now_us, top_n=50)
    out["user_id"] = out["user_id"].astype("int64")
    return out.reset_index(drop=True)


def q_events_range_read(sf_dir: str) -> pd.DataFrame:
    """Sorted-layout range read: events write once as range-partitioned
    parquet (t-digest boundary sampling → searchsorted assignment →
    one directory per range), then a [100, 300) range query reads ONLY
    the overlapping partition directories + an exact residual filter —
    hash-exact vs the SQL WHERE scan."""
    import tempfile

    from web2llmstxt_ray.ops.layout import (read_range_partitioned,
                                            write_range_partitioned)

    ev = _t(sf_dir, "events", ["event_id", "value"])
    path = tempfile.mkdtemp(prefix="graft_rangelay_")
    write_range_partitioned(ev, path, "value", num_parts=8)
    out = _pdf(read_range_partitioned(path, 100.0, 300.0))
    out = out[["event_id", "value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_customer_cdc(sf_dir: str) -> pd.DataFrame:
    """Lakehouse MERGE/upsert: a per-order changelog (version =
    orderkey, delete when orderkey % 13 = 0, else upsert with a
    derived balance) applied to the customer base — ONE bucketed
    shuffle co-locates each key's base row + changelog, latest version
    wins per key. Hash-exact vs the row_number()-latest SQL oracle."""
    from web2llmstxt_ray.ops.cdc import cdc_merge

    def chg_prep(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "c_custkey": b["o_custkey"].to_numpy(np.int64),
            "version": ok,
            "op": np.where(ok % 13 == 0, "d", "u"),
            "c_acctbal": (ok * 3 % 50000) / 100.0,
        })

    changes = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                 ).map_batches(chg_prep, batch_format="pandas",
                               batch_size=None)
    base = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = _pdf(cdc_merge(base, changes, "c_custkey", ["c_acctbal"]))
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_value_window_ranks(sf_dir: str) -> pd.DataFrame:
    """The four SQL ranking window functions (row_number / rank /
    dense_rank / cume_dist per user ordered by value-cents) from ONE
    bucketed skinny shuffle + vectorized per-bucket run arithmetic —
    bit-exact vs the SQL window oracle (cume_dist is an exact integer
    ratio cast once)."""
    from web2llmstxt_ray.ops.windows import window_ranks

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "x": pc.cast(pc.round(pc.multiply(
                b.column("value"), 100.0)), pa.int64()),
        })

    ev = _t(sf_dir, "events", ["event_id", "user_id", "value"]
            ).map_batches(to_int, batch_format="pyarrow")
    out = _pdf(window_ranks(ev, key_col="user_id", order_col="x",
                            id_col="event_id"))
    return out.sort_values("event_id").reset_index(drop=True)


def q_top_values_with_ties(sf_dir: str) -> pd.DataFrame:
    """Per-user top-3 event values WITH TIES (the ANSI ``FETCH FIRST 3
    ROWS WITH TIES`` / ``QUALIFY rank() <= 3`` shape): rank comes from
    the one-shuffle window_ranks pass ordered by value descending
    (negate the cents), then a map-only rank filter."""
    from web2llmstxt_ray.ops.windows import window_ranks

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "negx": pc.multiply(pc.cast(pc.round(pc.multiply(
                b.column("value"), 100.0)), pa.int64()),
                pa.scalar(-1, pa.int64())),
        })

    ev = _t(sf_dir, "events", ["event_id", "user_id", "value"]
            ).map_batches(to_int, batch_format="pyarrow")
    ranked = window_ranks(ev, key_col="user_id", order_col="negx",
                          id_col="event_id")

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        k = b[b["rnk"] <= 3]
        return pd.DataFrame({"user_id": k["user_id"],
                             "event_id": k["event_id"],
                             "rnk": k["rnk"]})

    out = _pdf(ranked.map_batches(keep, batch_format="pandas",
                                  batch_size=None))
    for c in ("user_id", "event_id", "rnk"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "rnk", "event_id"]
                           ).reset_index(drop=True)


def q_lineitem_profile(sf_dir: str) -> pd.DataFrame:
    """One-pass ANALYZE over lineitem's numeric columns: count / nulls
    / min / max from additive per-block partials — one scan, no
    shuffle. (The HLL distinct column is pytest-gated separately;
    floating sums are excluded here so the oracle hash is exact.)"""
    from web2llmstxt_ray.ops.profile import table_profile

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = table_profile(_t(sf_dir, "lineitem", cols), cols,
                        approx_distinct=False)
    out = out.rename(columns={"column": "col_name"})
    out["min_v"] = out["min_v"].astype(float)
    out["max_v"] = out["max_v"].astype(float)
    out = out[["col_name", "n_rows", "n_nulls", "min_v", "max_v"]]
    return out.sort_values("col_name").reset_index(drop=True)


def q_value_tdigest(sf_dir: str) -> pd.DataFrame:
    """Approximate event-value quantiles from one t-digest per block
    (rows-only — rank accuracy vs exact quantiles is pytest-gated in
    tests/test_tdigest.py): values never shuffle, the driver merges
    O(blocks·delta) centroids."""
    from web2llmstxt_ray.ops.sketch import tdigest_quantiles

    ev = _t(sf_dir, "events", ["event_type", "value"])
    out = tdigest_quantiles(ev, "value", [0.1, 0.5, 0.9, 0.99],
                            group_col="event_type")
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def q_embedding_pca(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA fit — the driver-oracled surface is the
    DISTRIBUTED pass itself: the additive covariance fold (one GEMM
    per block, O(blocks) driver merge), returned as the upper-triangle
    sample covariance (i ≤ j), which the DuckDB twin recomputes with
    the identical ``(ss − n·(s_i/n)·(s_j/n))/(n−1)`` arithmetic
    (round-3 flip from rows-only). The driver-side eigendecomposition
    + whitening projection (pure LAPACK on the folded d×d matrix, no
    distribution) stays numpy-oracle-gated in
    tests/test_embed_pca.py."""
    from web2llmstxt_ray.ops.embed_pca import fit_pca

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = fit_pca(ds, k=4)
    d = model.cov.shape[0]
    iu = np.triu_indices(d)
    return pd.DataFrame({
        "i": pd.Series(iu[0], dtype="int64"),
        "j": pd.Series(iu[1], dtype="int64"),
        "cov": model.cov[iu],
    })


def q_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-k (rows-only — recall vs the exact
    brute-force scan is pytest-gated in tests/test_pq.py): codebooks
    train driver-side on a sample and broadcast; encoding is map-only
    (64-d float → 8 uint8 codes = 32× compression); the scan reads
    codes only, m table lookups per vector, partial top-k per batch."""
    from web2llmstxt_ray.ops.pq import pq_encode, pq_topk, pq_train

    queries, qids = _query_vectors(sf_dir)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = np.array([r["embedding"] for r in ds.take(512)],
                      dtype=np.float64)
    books = pq_train(sample, m=8, ks=32)
    codes = pq_encode(ds, books)
    return pq_topk(codes, books, queries, qids, k=10).to_pandas()


# ---------------------------------------------------------------------------
# documents: near-dup family (rows-only — verified in tests vs oracles)
# ---------------------------------------------------------------------------


def q_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.dedup import minhash_dedup

    return minhash_dedup(_t(sf_dir, "documents", ["doc_id", "text"]),
                         num_perm=32, num_bands=8).to_pandas()


def q_simhash(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.dedup import add_simhash

    out = _pdf(add_simhash(_t(sf_dir, "documents", ["doc_id", "text"]))
               .select_columns(["doc_id", "simhash"]))
    out["simhash"] = out["simhash"].apply(lambda v: f"{int(v):016x}")
    return out


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash Hamming-ball near-dup pairs via pigeonhole block
    bucketing (signature-only tier; rows-only — SimHash is not
    SQL-expressible; brute-force-oracled in tests/test_dedup.py)."""
    from web2llmstxt_ray.ops.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), max_hamming=8)
    df = out.to_pandas()
    df["hamming"] = df["hamming"].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_graph_components(sf_dir: str) -> pd.DataFrame:
    """Distributed connected components (alternating star contraction,
    Kiveris et al. SoCC'14) over a deterministic chain graph derived
    from documents: edge (doc_id, doc_id-1) unless doc_id % 8 == 0 —
    chains of 8 that need multiple contraction rounds. Oracle: DuckDB
    recursive CTE computing min-reachable label."""
    from web2llmstxt_ray.ops.graph import connected_components

    def chain_edges(batch):
        import numpy as np
        import pyarrow as pa

        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        keep = ids % 8 != 0
        return pa.table({"a": ids[keep], "b": ids[keep] - 1})

    edges = _t(sf_dir, "documents", ["doc_id"]).map_batches(
        chain_edges, batch_format="pyarrow")
    out = connected_components(edges, "a", "b").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_minhash_clusters_scale(sf_dir: str) -> pd.DataFrame:
    """Fully-distributed near-dup clustering (LSH-precision tier: no
    driver-side pair list, star-contraction components). Rows-only —
    equivalence to the exact-verify tier on candidate-precision-1
    corpora is pytest-gated in tests/test_graph.py."""
    from web2llmstxt_ray.ops.dedup import minhash_clusters_scale

    out = minhash_clusters_scale(
        _t(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "lang", "text"]),
        group_col="lang", threshold=0.2).to_pandas()


def q_kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    """Distributed nearest-centroid (cosine) assignment under
    DETERMINISTIC seed centroids — the k-means assignment stage with
    the seeds pinned to the embeddings of the 8 smallest vec_ids
    divisible by 101, so the DuckDB twin recomputes the identical
    cosine argmax and the driver hash-compares every assignment
    (round-3 flip from rows-only: 'oracle the assignment given fixed
    centroids, not the iteration'). The full iterative Lloyd fit
    (shuffle-free partial sums, broadcast centroids) runs the SAME
    ``kmeans_assign`` kernel and stays purity/SSE-gated in
    tests/test_ann_textstats.py::TestKMeans."""
    from web2llmstxt_ray.ops.ann import kmeans_assign

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def seed_rows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("vec_id"), dtype=np.int64)
        return b.filter(pa.array(ids % 101 == 0))

    seeds = (ds.map_batches(seed_rows, batch_format="pyarrow")
             .sort("vec_id").limit(8).take_all())
    cent = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in seeds])
    out = kmeans_assign(ds, cent).to_pandas()[["vec_id", "cluster"]]
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


_BM25_TERMS = ["table", "hash", "merge", "window"]


def q_bm25_scores(sf_dir: str) -> pd.DataFrame:
    """BM25 lexical retrieval: shuffle-free stats pass (only the query
    terms' df reaches the driver) + broadcast scoring pass. Oracle:
    the full Robertson/Lucene formula in SQL over the same whitespace
    tokenization, at (doc, term) granularity so every score is a
    single association-defined arithmetic chain (bit-exact vs DuckDB;
    a per-doc SUM would expose the oracle's unspecified addition
    order). The per-doc sum feeds ``bm25_topk`` and is formula-oracled
    in tests/test_retrieval.py."""
    from web2llmstxt_ray.ops.retrieval import bm25_term_scores

    out = bm25_term_scores(_t(sf_dir, "documents", ["doc_id", "text"]),
                           _BM25_TERMS).to_pandas()
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)


def q_lang_id(sf_dir: str) -> pd.DataFrame:
    """Per-doc language ID (trigram + stopword profile scoring, CJK by
    codepoint range). Round-5 flip from rows-only: the detector IS
    SQL-expressible after all — substr/lower/contains + a distinct-
    stopword membership count per language + a CJK regexp census,
    argmax with the same (score DESC, lang ASC) tie-break. The SQL is
    GENERATED from ``_LANG_PROFILES`` so the two sides cannot drift.
    One caveat: the oracle tokenizes with regex \\s+, which covers
    every whitespace class in this corpus but not Python's exotic
    split classes (\\x1c-\\x1f) — exactness verified 500/500 vs the
    scalar detector on the driver data."""
    from web2llmstxt_ray.ops.textstats import language_id

    return _pdf(language_id(_t(sf_dir, "documents", ["doc_id", "text"])))


def q_epoch_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic epoch shuffle: bijective multiplicative
    permutation key + global range-partitioned sort. The oracle
    reproduces the exact mod-2^64 key arithmetic in HUGEINT, so the
    permutation itself is SQL-verified; global sortedness of the
    output order is pytest-gated (tests/test_corpus.py)."""
    from web2llmstxt_ray.ops.corpus import epoch_shuffle

    out = epoch_shuffle(_t(sf_dir, "documents", ["doc_id"]),
                        seed=3).to_pandas()
    return out


def q_knn_join(sf_dir: str) -> pd.DataFrame:
    """Exact KNN self-join (per-vector top-5 cosine neighbor graph):
    chunked query broadcast over streaming corpus scans — O(N²) work,
    O(chunk·k) driver state. SQL oracle = cross join + row_number."""
    from web2llmstxt_ray.ops.ann import knn_join

    return knn_join(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                    k=5, chunk_size=128).to_pandas()


def q_knn_join_ivf(sf_dir: str) -> pd.DataFrame:
    """Approximate KNN self-join, fully distributed (replicate-to-
    nprobe-lists → per-list GEMM → bucketed per-query merge; no corpus
    broadcast, nothing corpus-sized on the driver). Rows-only driver
    check; recall vs the exact join is pytest-gated
    (tests/test_ann_textstats.py)."""
    from web2llmstxt_ray.ops.ann import knn_join_ivf

    return knn_join_ivf(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                        k=5, num_lists=8, nprobe=4).to_pandas()


def q_bpe_tokens(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer trained on the corpus word histogram (distributed
    pruned-Counter pass, driver merge loop over the bounded vocab),
    then broadcast-encode. Rows-only driver check; training and
    encoding are sequential-oracled in tests/test_bpe.py."""
    from web2llmstxt_ray.ops.bpe import bpe_encode, train_bpe

    docs = _t(sf_dir, "documents", ["doc_id", "text"]).materialize()
    merges = train_bpe(docs, num_merges=40)
    return bpe_encode(docs, merges).to_pandas()


def q_span_flat(sf_dir: str) -> pd.DataFrame:
    """Interleaved span-doc build → zero-copy explode. The nested
    list<struct> table is constructed distributively (vectorized slice
    kernels), exploded via ListArray.flatten + list_parent_indices, and
    hash-compared against a DuckDB UNNEST oracle that regenerates the
    same deterministic spans."""
    from web2llmstxt_ray.ops.nested import build_span_docs, explode_spans

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = explode_spans(build_span_docs(docs)).to_pandas()
    out["span_idx"] = out["span_idx"].astype("int64")
    out["span_offset"] = out["span_offset"].astype("int64")
    return out.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)


def q_span_kind_stats(sf_dir: str) -> pd.DataFrame:
    """Per-kind span aggregates over the exploded interleaved table
    (partial-agg combiner: one skinny row per block per kind)."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_kind_stats)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return span_kind_stats(explode_spans(build_span_docs(docs)))


def q_shared_substrings(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact repeated-substring detection (Lee et al.
    2022 semantics via winnowing fingerprints instead of a suffix
    array): fingerprint map → bucketed candidate shuffle → anchor
    extension joins. Rows-only driver check; exactness (length and
    offsets of the maximal shared run vs a brute-force LCS oracle) is
    pytest-gated in tests/test_substr.py."""
    from web2llmstxt_ray.ops.substr import shared_substring_pairs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return shared_substring_pairs(docs, k=24, w=8).to_pandas()


def q_lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (returnflag, linestatus) from one distributed
    partial-agg pass: subtotals and the grand total re-summed from the
    same partials — integer quantities, exact vs SQL ROLLUP."""
    from web2llmstxt_ray.ops.relational import rollup_agg

    li = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(qty=b["l_quantity"].round().astype("int64"))
        return b.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False).agg(
            n_rows=("qty", "size"), sum_qty=("qty", "sum"))

    out = rollup_agg(li, ["l_returnflag", "l_linestatus"], batch_agg,
                     ["n_rows", "sum_qty"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out


def q_user_event_pivot(sf_dir: str) -> pd.DataFrame:
    """Long→wide pivot: per-user event counts by type. One distributed
    partial-agg pass; the reshape is a driver-side grid over the
    bounded |users| × |types| cells. Fixed column set so absent
    combinations emit 0 (schema-stable vs the conditional-aggregation
    SQL oracle)."""
    from web2llmstxt_ray.ops.relational import pivot_agg

    ev = _t(sf_dir, "events", ["user_id", "event_type"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "event_type"],
                         as_index=False).agg(n=("event_type", "size"))

    return pivot_agg(ev, "user_id", "event_type", batch_agg, ["n"],
                     column_values=["click", "error", "purchase",
                                    "signup", "view"])


def q_value_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-event delta vs the user's previous event (SQL lag window),
    first event coalesced to 0; integer cents ⇒ bit-exact."""
    from web2llmstxt_ray.ops.windows import lag_delta

    out = _pdf(lag_delta(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])))
    out["delta_cents"] = out["delta_cents"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """zlib compression-ratio quality signal per doc (map-only;
    deterministic for fixed zlib level). Rows-only driver check —
    no SQL zlib; pytest gates vs direct zlib."""
    from web2llmstxt_ray.ops.textstats import compression_ratio

    return _pdf(compression_ratio(
        _t(sf_dir, "documents", ["doc_id", "text"]))).sort_values(
        "doc_id").reset_index(drop=True)


def q_winsorized_values(sf_dir: str) -> pd.DataFrame:
    """Per-group winsorization (clip to [p25, p75] per event_type):
    grouped exact quantiles via the distributed value-count histogram,
    bounds broadcast, map-only clip — integer cents end-to-end so the
    SQL quantile_disc oracle matches bit-exact."""
    import numpy as np

    from web2llmstxt_ray.ops.corpus import int_quantiles

    ev = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return t.select(["event_id", "event_type"]).append_column(
            "cents", cents)

    ev = ev.map_batches(add_cents, batch_format="pyarrow").materialize()
    q = int_quantiles(ev, "cents", qs=(0.25, 0.75),
                      group_col="event_type")
    bounds = {g: (int(sub[sub.q == 0.25]["value"].iloc[0]),
                  int(sub[sub.q == 0.75]["value"].iloc[0]))
              for g, sub in q.groupby("event_type")}
    bref = ray.put(bounds)

    class _Clip:
        def __init__(self):
            self.b = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            et = t.column("event_type").to_pylist()
            c = t.column("cents").to_numpy(zero_copy_only=False)
            lo = np.asarray([self.b[e][0] for e in et], np.int64)
            hi = np.asarray([self.b[e][1] for e in et], np.int64)
            return pa.table({
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cents_winsorized": pa.array(
                    np.minimum(np.maximum(c, lo), hi)),
            })

    out = _pdf(ev.map_batches(_Clip, batch_format="pyarrow",
                              concurrency=(1, 4), num_cpus=0.5))
    return out.sort_values("event_id").reset_index(drop=True)


def q_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Global per-row percentile rank of event values without a global
    sort (broadcast value-count CDF + map-only searchsorted probe) —
    bit-exact vs SQL percent_rank()."""
    from web2llmstxt_ray.ops.corpus import global_percent_rank

    return _pdf(global_percent_rank(
        _t(sf_dir, "events", ["event_id", "value"]), "value",
        id_col="event_id")).sort_values("event_id").reset_index(drop=True)


def q_event_type_mode(sf_dir: str) -> pd.DataFrame:
    """Most frequent value per event_type (deterministic smallest-value
    tie-break) via partial (group,value) counts."""
    from web2llmstxt_ray.ops.corpus import grouped_mode

    return grouped_mode(_t(sf_dir, "events", ["event_type", "value"]),
                        "event_type", "value")


def q_spans_media_stats(sf_dir: str) -> pd.DataFrame:
    """Interleaved multimodal composition: span-doc build → zero-copy
    explode → image spans get deterministic synthetic payloads
    (header + seeded body) → actor-pool decode (FakeDecoder — the
    production codec slot's real plumbing) → per-doc media feature
    aggregates via the partial-agg combiner. The DuckDB oracle
    recomputes the decode arithmetic (declared dims round-trip the
    payload header; n_bytes = 17-byte header + 256 body)."""
    from web2llmstxt_ray.ops.multimodal import (extract_media_features,
                                                make_fake_payload)
    from web2llmstxt_ray.ops.nested import build_span_docs, explode_spans
    from web2llmstxt_ray.ops.relational import partial_groupby

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    flat = explode_spans(build_span_docs(docs))

    def synth_payloads(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        img = batch.filter(pc.equal(batch.column("kind"), "image"))
        dids = img.column("doc_id").to_pylist()
        idxs = img.column("span_idx").to_pylist()
        refs = img.column("media_ref").to_pylist()
        payloads = []
        for d, i, r in zip(dids, idxs, refs):
            di = int(d)
            w = 64 + (di * 31 + i) % 256
            h = 48 + (di * 17 + i * 3) % 128
            payloads.append(make_fake_payload(r, "image", w, h, 0))
        return pa.table({
            "media_id": pa.array(refs, pa.string()),
            "doc_id": pa.array(dids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    media = flat.map_batches(synth_payloads, batch_format="pyarrow")
    feats = extract_media_features(media, batch_size=64)

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", as_index=False).agg(
            n_media=("media_id", "size"), sum_width=("width", "sum"),
            sum_height=("height", "sum"), total_bytes=("n_bytes", "sum"))

    out = partial_groupby(feats, ["doc_id"], agg,
                          ["n_media", "sum_width", "sum_height",
                           "total_bytes"])
    for c in ("n_media", "sum_width", "sum_height", "total_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_similarity_join(sf_dir: str) -> pd.DataFrame:
    """Cross-table fuzzy join (entity resolution): even-id documents
    matched to odd-id documents at word-3-gram Jaccard ≥ 0.5. LSH
    banding → cross-side candidates → exact Jaccard verify; the SQL
    oracle computes the exact shingle-set Jaccard for every cross
    pair. Raw-double jaccard column: both engines divide the same two
    integers, so values are bit-identical."""
    from web2llmstxt_ray.ops.dedup import similarity_join

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def side(par: int):
        def _f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.equal(pc.bit_wise_and(t["doc_id"], 1), par)
            return t.filter(mask)
        return _f

    left = docs.map_batches(side(0), batch_format="pyarrow")
    right = docs.map_batches(side(1), batch_format="pyarrow")
    return similarity_join(left, right, threshold=0.5).to_pandas()


def q_normalize_text(sf_dir: str) -> pd.DataFrame:
    """Deterministic text canonicalization (NFC, control strip,
    whitespace-run collapse, trim) — map-only; byte-exact vs the
    DuckDB nfc_normalize + regexp_replace oracle."""
    from web2llmstxt_ray.ops.scrub import normalize_text

    out = _pdf(normalize_text(_t(sf_dir, "documents",
                                 ["doc_id", "text"])))
    out["n_chars_norm"] = out["text"].str.len().astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_segment_dedup(sf_dir: str) -> pd.DataFrame:
    """Segment-level exact dedup (C4/Gopher line-dedup shape over
    fixed 16-char segments): global first-occurrence-wins in
    (doc_id, seg_idx) order, documents reconstructed from kept
    segments. Two bucketed shuffles; hash-compared against a DuckDB
    substr + row_number window oracle including reconstructed text."""
    from web2llmstxt_ray.ops.dedup import segment_dedup

    out = _pdf(segment_dedup(_t(sf_dir, "documents",
                                ["doc_id", "text"]), chunk=16))
    return out.sort_values("doc_id").reset_index(drop=True)


def q_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Distributed inverted index: per-doc tf rows (one per distinct
    token per doc) shuffle once by hash(token) bucket; posting lists
    built vectorized per bucket. Hash-compared against a DuckDB
    string_agg oracle including the doc:tf posting strings."""
    from web2llmstxt_ray.ops.retrieval import inverted_index

    out = _pdf(inverted_index(_t(sf_dir, "documents",
                                 ["doc_id", "text"])))
    out["df"] = out["df"].astype("int64")
    out["cf"] = out["cf"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


def q_substring_dedup(sf_dir: str) -> pd.DataFrame:
    """Substring-level dedup removal (Lee et al. 2022): verified
    cross-doc repeated runs are excised from all but the canonical
    (lowest-id) document via one broadcast + map-only pass. Rows-only
    driver check; interval-merge and exact-removal semantics are
    pytest-gated in tests/test_substr.py."""
    from web2llmstxt_ray.ops.substr import excise_shared_substrings

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = excise_shared_substrings(docs, k=24, w=8).to_pandas()
    out["n_chars_after"] = out["text"].str.len().astype("int64")
    return (out[["doc_id", "n_removed_bytes", "n_chars_after"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Integer fixed-point PageRank (3 damped iterations) over the
    order→part bipartite graph (src=2·l_orderkey, dst=2·l_partkey+1).
    Fixed-point arithmetic makes float-sum order irrelevant, so the
    distributed result is BIT-EXACT against the unrolled SQL oracle."""
    from web2llmstxt_ray.ops.graph import pagerank

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "src": pc.multiply(batch.column("l_orderkey"), 2),
            "dst": pc.add(pc.multiply(batch.column("l_partkey"), 2), 1),
        })

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return pagerank(edges, iters=3).to_pandas()


def q_quantile_filter(sf_dir: str) -> pd.DataFrame:
    """Keep documents at/above the global p75 of n_chars: distributed
    histogram quantile (no global sort) + vectorized threshold filter."""
    from web2llmstxt_ray.ops.corpus import quantile_threshold_filter

    out = quantile_threshold_filter(
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        "n_chars", 0.75, keep="ge")
    return out.to_pandas()


def q_dsir_sample(sf_dir: str) -> pd.DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed-n-gram
    target/raw models, log-ratio doc weights, deterministic Gumbel
    top-k. Target = English docs, raw = whole corpus. Rows-only driver
    check; the weight math is sequential-oracled in tests/test_dsir.py
    (hash-based noise isn't SQL-expressible)."""
    import pyarrow.compute as pc

    from web2llmstxt_ray.ops.dsir import dsir_sample

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def only_en(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), "en"))

    target = docs.map_batches(only_en, batch_format="pyarrow")
    out = dsir_sample(docs.select_columns(["doc_id", "text"]),
                      target.select_columns(["doc_id", "text"]),
                      k=40, num_buckets=4096, seed=7)
    return out.to_pandas()


def q_lm_quality(sf_dir: str) -> pd.DataFrame:
    """CCNet-style model-based quality: train a char-trigram LM on the
    corpus (one partial-Counter pass, no corpus shuffle), score every
    doc's log2 perplexity against the broadcast model. SQL twin
    (round-5 flip from rows-only): at these scales the context space
    is below the pruning bound, so the model is exact global counts,
    and because scoring corpus == training corpus every probe hits a
    seen (ctx, char) — the add-k log2 probability table and the
    per-doc mean replay directly in SQL (pad chr(2) boundary, one
    unnest per char position). The backoff tiers (unseen context →
    unigram, unseen char → floor) never fire here and stay
    pytest-gated in tests/test_lm.py."""
    from web2llmstxt_ray.ops.lm import perplexity_scores, train_char_lm

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    model = train_char_lm(docs, n=3)
    out = perplexity_scores(docs, model).to_pandas()
    out["log2_ppl"] = out["log2_ppl"].round(ROUND_RATIO)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via mergeable HLL
    sketches (shuffle-free; deterministic given the stable hash, so the
    rows-only check is repeatable). Accuracy vs exact is pytest-gated
    in tests/test_sketch.py."""
    from web2llmstxt_ray.ops.sketch import approx_distinct_by_key

    est = approx_distinct_by_key(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id", p=12)
    rows = sorted(est.items())
    return pd.DataFrame({"event_type": [k for k, _ in rows],
                         "approx_users": [round(v, 1) for _, v in rows]})


def q_media_features(sf_dir: str) -> pd.DataFrame:
    from web2llmstxt_ray.ops.multimodal import (
        extract_media_features, synth_media_table)

    doc_ids = [str(r["doc_id"]) for r in
               _t(sf_dir, "documents", ["doc_id"]).take(200)]
    media = synth_media_table(doc_ids, per_doc=2)
    return _pdf(extract_media_features(rd.from_arrow(media)))


def q_media_frames(sf_dir: str) -> pd.DataFrame:
    """Full media-stage chain (rows-only — stage semantics pytest-gated
    in tests/test_media_stages.py): synthetic payloads → actor-pool
    image resize (bounding box, aspect preserved) → actor-pool video
    frame sampling (1→N expansion) → per-doc frame stats."""
    from web2llmstxt_ray.ops.multimodal import (resize_images,
                                                sample_frames,
                                                synth_media_table)

    doc_ids = [str(r["doc_id"]) for r in
               _t(sf_dir, "documents", ["doc_id"]).take(200)]
    media = rd.from_arrow(synth_media_table(doc_ids, per_doc=3))
    frames = sample_frames(resize_images(media.repartition(4)), fps=1.0,
                           max_frames=8)

    def stats(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["frame_bytes"] = df["payload"].map(len)
        return df.groupby("doc_id", as_index=False).agg(
            n_frames=("frame_no", "size"),
            n_videos=("media_id", "nunique"),
            frame_bytes=("frame_bytes", "sum"))

    from web2llmstxt_ray.ops.relational import partial_groupby

    out = partial_groupby(
        frames.map_batches(stats, batch_format="pyarrow"),
        ["doc_id"], lambda b: b, ["n_frames", "n_videos", "frame_bytes"])
    for c in ("n_frames", "n_videos", "frame_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# crawl-domain queries (rows-only; pytest conformance is the real gate)
# ---------------------------------------------------------------------------

_CRAWL_CACHE: dict = {}


def _crawl_once():
    if "result" in _CRAWL_CACHE:
        return _CRAWL_CACHE["result"]
    import tempfile

    from web2llmstxt_ray.pipelines.crawl import (
        CrawlConfig, DistributedCrawler, read_crawl_output)
    from web2llmstxt_ray.synth import generate_site, site_index

    site, robots = generate_site(num_pages=200, num_hosts=4, seed=42)
    cols = robots.to_pydict()
    disallow = dict(zip(cols["host"], cols["disallow"]))
    run_dir = tempfile.mkdtemp(prefix="rayentry_crawl_")
    cfg = CrawlConfig(base_url="https://site0.test", max_pages=12,
                      run_dir=run_dir)
    crawler = DistributedCrawler(cfg, site_index(site),
                                 disallow_by_host=disallow)
    crawler.run()
    pages = read_crawl_output(run_dir, "pages")
    spans = read_crawl_output(run_dir, "spans")
    _CRAWL_CACHE["result"] = (pages, spans, run_dir)
    return _CRAWL_CACHE["result"]


def q_crawl_pages(sf_dir: str) -> pd.DataFrame:
    pages, _, _ = _crawl_once()
    return pages.select(["url", "title", "word_count", "score", "depth",
                         "discovery_phase", "visit_index"]).to_pandas()


def q_crawl_spans(sf_dir: str) -> pd.DataFrame:
    _, spans, _ = _crawl_once()
    out = {"doc_id": [], "span_idx": [], "kind": [], "media_ref": [],
           "offset": []}
    for did, sp in zip(spans.column("doc_id").to_pylist(),
                       spans.column("spans").to_pylist()):
        for i, s in enumerate(sp):
            out["doc_id"].append(did)
            out["span_idx"].append(i)
            out["kind"].append(s["kind"])
            out["media_ref"].append(s["media_ref"])
            out["offset"].append(s["offset"])
    return pd.DataFrame(out)


def q_llms_entries(sf_dir: str) -> pd.DataFrame:
    import pyarrow.compute as pc

    from web2llmstxt_ray.pipelines.llms import Describer

    pages, _, _ = _crawl_once()
    pages = pages.take(pc.sort_indices(pages.column("visit_index")))
    entries = Describer()(pages)
    return entries.select(
        ["url", "title", "description", "index", "category"]).to_pandas()


def q_lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE (returnflag, linestatus) — all 2^k grouping
    subsets re-summed from ONE distributed partial-agg pass (integer
    quantities, exact vs SQL CUBE)."""
    from web2llmstxt_ray.ops.relational import cube_agg

    li = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity"])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(qty=b["l_quantity"].round().astype("int64"))
        return b.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False).agg(
            n_rows=("qty", "size"), sum_qty=("qty", "sum"))

    out = cube_agg(li, ["l_returnflag", "l_linestatus"], batch_agg,
                   ["n_rows", "sum_qty"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out


def q_value_ntile(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) per user ordered by (ts, event_id): exact piecewise
    tile formula, bucketed shuffle — integer-exact vs the SQL window
    oracle."""
    from web2llmstxt_ray.ops.windows import ntile

    out = _pdf(ntile(
        _t(sf_dir, "events", ["event_id", "user_id", "ts"]), n=4))
    return out.sort_values("event_id").reset_index(drop=True)


def q_value_rolling_sum(sf_dir: str) -> pd.DataFrame:
    """Bounded sliding window frame (ROWS 3 PRECEDING..CURRENT) per
    user: integer cents ⇒ bit-exact vs the SQL window oracle."""
    from web2llmstxt_ray.ops.windows import rolling_sum

    out = _pdf(rolling_sum(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        window=4))
    return out.sort_values("event_id").reset_index(drop=True)


def q_salted_brand_revenue(sf_dir: str) -> pd.DataFrame:
    """Skew-salted hash join (lineitem × part on partkey, hot keys
    split across salt sub-buckets, right side replicated ×salt) then
    per-brand partial aggregation. Set-equal to a plain inner join,
    so the SQL oracle is the unsalted join."""
    from web2llmstxt_ray.ops.relational import partial_groupby, salted_join

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    part = _t(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        _rn(p_partkey="l_partkey"), batch_format="pyarrow")
    joined = salted_join(li, part, on="l_partkey", num_buckets=16,
                         salt=4, hot_keys=[1, 2, 3])

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("p_brand", as_index=False).agg(
            n_items=("l_extendedprice", "size"),
            revenue=("l_extendedprice", "sum"))

    out = partial_groupby(joined, ["p_brand"], batch_agg,
                          ["n_items", "revenue"])
    out["revenue"] = out["revenue"].round(ROUND_SUM)
    out["n_items"] = out["n_items"].astype("int64")
    return out


def q_orders_price_bands(sf_dir: str) -> pd.DataFrame:
    """Keyless interval join via grid partitioning: orders (points,
    integer cents) against 20 OVERLAPPING price bands (step 25k,
    width 40k ⇒ most orders match 2 bands). Cells of width = max band
    length bound interval replication at ≤2×; exact int64 predicates."""
    from web2llmstxt_ray.ops.joins import interval_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100.0)), pa.int64())
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "cents": cents})

    pts = orders.map_batches(to_cents, batch_format="pyarrow")
    bands = pd.DataFrame({"band_id": np.arange(20, dtype=np.int64)})
    bands["lo"] = bands["band_id"] * 2_500_000
    bands["hi"] = bands["lo"] + 4_000_000
    pairs = interval_join(
        pts, rd.from_pandas(bands), x_col="cents",
        lo_col="lo", hi_col="hi", point_cols=("o_orderkey",),
        interval_cols=("band_id",), num_buckets=32)

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("band_id", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))

    from web2llmstxt_ray.ops.relational import partial_groupby

    out = partial_groupby(pairs, ["band_id"], batch_agg,
                          ["n_orders", "sum_cents"])
    out["band_id"] = out["band_id"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out.sort_values("band_id").reset_index(drop=True)


def q_part_triangles(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count on the part co-purchase graph (parts
    sharing an order) via degree-ordered orientation — per-node wedge
    volume is O(sqrt(m)) regardless of hub skew; all phases bucketed
    shuffles, driver sees per-bucket counts only. Oracle: three-way
    self-join over the distinct canonical edge set in SQL."""
    from web2llmstxt_ray.ops.graph import triangle_count

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_gb"] = (b["l_orderkey"].to_numpy() % 32).astype("int32")
        return b

    def co_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["l_orderkey", "l_partkey"]]
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"u": m["l_partkey_x"].to_numpy(),
                             "v": m["l_partkey_y"].to_numpy()})

    pairs = (li.map_batches(add_bucket, batch_format="pandas",
                            batch_size=None)
             .groupby("_gb").map_groups(co_pairs, batch_format="pandas"))
    n = triangle_count(pairs, num_buckets=32)
    return pd.DataFrame({"n_triangles": [int(n)]})


def q_qty_discount_corr(sf_dir: str) -> pd.DataFrame:
    """Per-group Pearson correlation + OLS slope from exact integer
    co-moments: ONE map-only pass (six additive sums per group per
    block), driver combine on Python ints — no shuffle of raw rows,
    bit-exact vs the SQL engine evaluating the identical formula over
    HUGEINT sums."""
    from web2llmstxt_ray.ops.stats import grouped_corr_slope

    li = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_quantity", "l_discount"])

    def to_ints(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "qty": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
            "disc_mils": pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 1000.0)), pa.int64()),
        })

    ints = li.map_batches(to_ints, batch_format="pyarrow")
    return grouped_corr_slope(ints, ["l_returnflag"], "qty", "disc_mils")


def q_qty_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """Interpolated percentile_cont per group from the distributed
    value-count histogram (no global sort): ANSI q·(n−1) linear
    interpolation over exact integers."""
    from web2llmstxt_ray.ops.corpus import int_quantiles_cont

    li = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "qty": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
        })

    ints = li.map_batches(to_int, batch_format="pyarrow")
    return int_quantiles_cont(ints, "qty",
                              qs=(0.1, 0.25, 0.5, 0.75, 0.9),
                              group_col="l_returnflag")


def q_building_top_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority): broadcast semi-filter on
    the customer segment, date predicates pushed into the Arrow scan
    batches, ONE bucketed hash join (orders×lineitem), distributed
    per-orderkey combine, global top-10 by exact integer revenue.
    Revenue in integer micro-units (cents × mils) so the top-k
    ordering is deterministic — no float-sum-order ambiguity at the
    rank-10 boundary."""
    from datetime import datetime

    import pyarrow.compute as pc

    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    cutoff = datetime(1995, 3, 15)
    cust = pa.concat_tables(
        [ray.get(r) for r in
         _t(sf_dir, "customer",
            ["c_custkey", "c_mktsegment"]).to_arrow_refs()])
    keyset = cust.filter(pc.equal(cust.column("c_mktsegment"),
                                  "BUILDING")).column("c_custkey")
    key_ref = ray.put(keyset.combine_chunks())

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_orderpriority"])

    def sel_orders(b: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        m = pc.and_(pc.less(b.column("o_orderdate"), pa.scalar(cutoff)),
                    pc.is_in(b.column("o_custkey"), value_set=ks))
        t = b.filter(m)
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "o_orderdate": t.column("o_orderdate"),
                         "o_orderpriority": t.column("o_orderpriority")})

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                 "l_discount", "l_shipdate"])

    def sel_li(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("l_shipdate"),
                                pa.scalar(cutoff)))
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        mils = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 1000.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(
            pa.scalar(1000, pa.int64()), mils))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_micro": rev})

    joined = hash_join(
        li.map_batches(sel_li, batch_format="pyarrow"),
        orders.map_batches(sel_orders, batch_format="pyarrow"),
        on="l_orderkey", num_buckets=16)

    def batch_agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                         as_index=False).agg(
            rev_micro=("rev_micro", "sum"),
            n_items=("rev_micro", "size"))

    agg = partial_groupby(joined,
                          ["l_orderkey", "o_orderdate", "o_orderpriority"],
                          batch_agg, ["rev_micro", "n_items"],
                          distributed_combine=True)
    top = agg.sort(["rev_micro", "o_orderdate", "l_orderkey"],
                   descending=[True, False, False]).limit(10)
    out = _pdf(top)
    out["revenue"] = (out["rev_micro"] / 100000.0).round(ROUND_SUM)
    out["n_items"] = out["n_items"].astype("int64")
    return out.drop(columns=["rev_micro"])


def q_distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped count-distinct: per-block distinct (group, value)
    pairs collapse first, ONE value-bucketed skinny shuffle dedups
    globally — traffic is O(distinct pairs), never O(rows)."""
    from web2llmstxt_ray.ops.stats import grouped_distinct_count

    return grouped_distinct_count(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id")


def q_value_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-group sample-std z-score: one exact integer co-moment pass,
    broadcast (n, Σx, denom) lookup, map-only standardization — raw
    rows never shuffle. Bit-exact vs the identical HUGEINT-sum SQL
    expression."""
    from web2llmstxt_ray.ops.stats import grouped_zscore

    ev = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "x": pc.cast(pc.round(pc.multiply(
                b.column("value"), 100.0)), pa.int64()),
        })

    out = _pdf(grouped_zscore(ev.map_batches(to_int,
                                             batch_format="pyarrow"),
                              ["event_type"], "x"))
    return (out[["event_id", "z"]].sort_values("event_id")
            .reset_index(drop=True))


def q_qty_skew_kurt(sf_dir: str) -> pd.DataFrame:
    """Population skewness + excess kurtosis per group from exact
    integer raw moments Σx..Σx⁴ (one map-only pass, algebraic central-
    moment expansion on Python ints — overflow-proof)."""
    from web2llmstxt_ray.ops.stats import grouped_skew_kurt

    li = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "qty": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
        })

    return grouped_skew_kurt(li.map_batches(to_int,
                                            batch_format="pyarrow"),
                             "l_returnflag", "qty")


def q_priority_status_mi(sf_dir: str) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns from
    the distributed contingency table — one partial-count pass, tiny
    driver-side formula over exact integer counts."""
    from web2llmstxt_ray.ops.stats import mutual_information

    return mutual_information(
        _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        "o_orderpriority", "o_orderstatus")


def q_value_ewma(sf_dir: str) -> pd.DataFrame:
    """Per-key EWMA in event-time order: one bucketed shuffle +
    vectorized pandas groupby-ewm recursion per bucket
    (``adjust=False``: z_t = (1-α)z_{t-1} + αx_t). SQL twin: a
    recursive CTE replays the recursion exactly (row_number per key,
    one join step per rank — the same replay pattern as the FFD /
    MMR / k-center oracles); for α=0.3 pandas' kernel divides by
    (1-α)+α == 1.0 exactly, so the two recursions are bit-identical
    before the 6-d.p. round."""
    from web2llmstxt_ray.ops.windows import ewma

    out = _pdf(ewma(_t(sf_dir, "events",
                       ["event_id", "user_id", "ts", "value"]),
                    alpha=0.3))
    return out.sort_values("event_id").reset_index(drop=True)


def q_orders_validation(sf_dir: str) -> pd.DataFrame:
    """Expectations-lite data-quality gate: every scan rule evaluated
    in ONE additive map pass; the uniqueness rule adds one
    value-bucketed skinny shuffle (duplicate copies meet in their hash
    bucket). Violations intentionally non-zero (accepted set omits
    'P', range max below the true max) to prove the counters count."""
    from web2llmstxt_ray.ops.validate import validate

    rules = [
        {"rule": "not_null", "column": "o_custkey"},
        {"rule": "range", "column": "o_totalprice",
         "min": 0.0, "max": 400000.0},
        {"rule": "accepted_values", "column": "o_orderstatus",
         "values": ["O", "F"]},
        {"rule": "unique", "column": "o_orderkey"},
    ]
    return validate(_t(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderstatus"]), rules)


def q_events_dedup_window(sf_dir: str) -> pd.DataFrame:
    """Stream dedup (client-retry suppression): drop an event whose
    same-(user,type) immediate predecessor is ≤30 s earlier. One
    bucketed shuffle, vectorized sort+groupby-diff per bucket;
    lag-window SQL oracle (microsecond-exact epoch diff)."""
    from web2llmstxt_ray.ops.events import dedup_window

    out = _pdf(dedup_window(_t(sf_dir, "events",
                               ["event_id", "user_id", "event_type",
                                "ts"]), gap_seconds=30.0))
    return out.sort_values("event_id").reset_index(drop=True)


def q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort-retention grid: cohort = user's first active day; count
    distinct users per (cohort_day, day_offset). Bucketed shuffle →
    distinct (user, day) rows tagged with the user's min day →
    additive partial-agg grid (each row is one distinct user by
    construction)."""
    from web2llmstxt_ray.ops.events import cohort_retention

    out = cohort_retention(_t(sf_dir, "events", ["user_id", "ts"]))
    return (out.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


def q_events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel view→click→purchase with strict time ordering:
    per-bucket vectorized step chain (filtered groupby-min + hash
    merge), only len(steps) counters leave each bucket."""
    from web2llmstxt_ray.ops.events import funnel

    return funnel(_t(sf_dir, "events",
                     ["user_id", "event_type", "ts"]),
                  steps=["view", "click", "purchase"])


def q_customer_set_ops(sf_dir: str) -> pd.DataFrame:
    """ANSI INTERSECT / EXCEPT over distinct keys: customers who did /
    never placed an order. Each side dedupes locally per block before
    the single skinny bucket shuffle; per-bucket resolve is two
    vectorized isin masks."""
    from web2llmstxt_ray.ops.relational import set_op

    cust = _t(sf_dir, "customer", ["c_custkey"]).rename_columns(
        {"c_custkey": "key"})
    ords = _t(sf_dir, "orders", ["o_custkey"]).rename_columns(
        {"o_custkey": "key"})
    frames = []
    for op in ("intersect", "except"):
        part = _pdf(set_op(cust, ords, "key", op))
        part.insert(0, "op", op)
        frames.append(part)
    out = pd.concat(frames, ignore_index=True)
    # an empty side upcasts int64→float64 through concat; restore
    out["key"] = out["key"].astype("int64")
    return (out.sort_values(["op", "key"]).reset_index(drop=True))


def q_bloom_orders_building(sf_dir: str) -> pd.DataFrame:
    """Bloom-prefiltered EXACT semi join (orders of BUILDING-segment
    customers): a broadcast Bloom bitmap built distributively from the
    build keys prunes probe rows BEFORE the shuffle (no false
    negatives), the exact bucketed semi join kills the false
    positives, and revenue aggregates ride the additive partial path
    in integer cents."""
    from web2llmstxt_ray.ops.relational import (bloom_semi_join,
                                                partial_groupby)

    bld = (_t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
           .filter(expr="c_mktsegment == 'BUILDING'")
           .select_columns(["c_custkey"])
           .rename_columns({"c_custkey": "custkey"}))
    ords = _t(sf_dir, "orders",
              ["o_custkey", "o_orderstatus", "o_totalprice"]
              ).rename_columns({"o_custkey": "custkey"})
    hit = bloom_semi_join(ords, bld, "custkey")

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(revenue_cents=(b["o_totalprice"] * 100)
                     .round().astype("int64"), n_orders=1)
        return b.groupby("o_orderstatus", as_index=False)[
            ["n_orders", "revenue_cents"]].sum()

    return partial_groupby(hit, ["o_orderstatus"], agg,
                           ["n_orders", "revenue_cents"])


def q_value_minmax_norm(sf_dir: str) -> pd.DataFrame:
    """Per-group min-max normalization over exact integer cents:
    per-block (group, min, max) partials → broadcast bounds → map-only
    normalize; raw rows never shuffle."""
    from web2llmstxt_ray.ops.stats import grouped_minmax_norm

    ev = _events_cents(sf_dir)
    out = _pdf(grouped_minmax_norm(ev, "event_type", "x",
                                   out_col="x_norm"))
    return (out[["event_id", "x_norm"]].sort_values("event_id")
            .reset_index(drop=True))


def q_value_robust_scale(sf_dir: str) -> pd.DataFrame:
    """Per-group robust scaling (x−median)/IQR over exact nearest-rank
    integer quantiles (quantile_disc semantics) — grouped quantiles via
    the distributed value-count histogram, then broadcast map-only
    scale."""
    from web2llmstxt_ray.ops.stats import grouped_robust_scale

    ev = _events_cents(sf_dir)
    out = _pdf(grouped_robust_scale(ev, "event_type", "x",
                                    out_col="x_robust"))
    return (out[["event_id", "x_robust"]].sort_values("event_id")
            .reset_index(drop=True))


def q_sparse_dot_pairs(sf_dir: str) -> pd.DataFrame:
    """Sparse lexical similarity join over the postings decomposition:
    tf rows shuffle once by hash(token), pairs generate inside token
    buckets with the stopword df-cap applied there, partial pair sums
    reduce in hash(pair) buckets — exact integer dot products,
    hash-exact vs the SQL self-join oracle."""
    from web2llmstxt_ray.ops.retrieval import sparse_dot_pairs

    out = _pdf(sparse_dot_pairs(_t(sf_dir, "documents",
                                   ["doc_id", "text"]),
                                max_df=395, min_dot=200))
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_regional_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation for one region and one order
    year, with customer and supplier required to share the nation.
    Composition: the two BIG sides (orders⋈customer, then
    lineitem⋈that) go through the explicit bucketed hash join — one
    shuffle each on the join key; the SMALL dims (supplier, nation,
    region) broadcast once and resolve in a map-only pass; revenue
    aggregates as exact integer price·(100−disc) partials."""
    import numpy as np

    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    # region → nation-name lookup (driver-side, 25+5 rows)
    nat = _t(sf_dir, "nation").to_pandas()
    reg = _t(sf_dir, "region").to_pandas()
    asia = reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nation_name = {int(r["n_nationkey"]): r["n_name"]
                   for _, r in nat.iterrows()
                   if int(r["n_regionkey"]) == int(asia)}
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
              ).to_pandas()
    supp_nation = dict(zip(supp["s_suppkey"].astype(int),
                           supp["s_nationkey"].astype(int)))
    nref = ray.put((nation_name, supp_nation))

    import datetime as _dt

    def ord_prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = pa.scalar(_dt.datetime(1996, 1, 1))
        hi = pa.scalar(_dt.datetime(1997, 1, 1))
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        k = b.filter(m)
        return pa.table({"o_orderkey": k.column("o_orderkey"),
                         "custkey": k.column("o_custkey")})

    ords = _t(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]
              ).map_batches(ord_prep, batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]
              ).rename_columns({"c_custkey": "custkey"})
    oc = hash_join(ords, cust, "custkey", how="inner").map_batches(
        lambda b: b[["o_orderkey", "c_nationkey"]].rename(
            columns={"o_orderkey": "orderkey"}),
        batch_format="pandas", batch_size=None).materialize()

    def li_prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            b.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "rev": pc.multiply(cents, pc.subtract(
                pa.scalar(100, pa.int64()), disc)),
        })

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
            ).map_batches(li_prep, batch_format="pyarrow")
    j = hash_join(li, oc, "orderkey", how="inner")

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        names, s2n = ray.get(nref)
        sn = b["l_suppkey"].map(s2n)
        keep = sn.eq(b["c_nationkey"]) & b["c_nationkey"].isin(names)
        k = b[keep]
        out = pd.DataFrame({
            "n_name": k["c_nationkey"].map(names),
            "revenue_i": k["rev"],
        })
        return out.groupby("n_name", as_index=False)["revenue_i"].sum()

    out = partial_groupby(j, ["n_name"], resolve, ["revenue_i"])
    out["revenue_i"] = out["revenue_i"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def q_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: revenue between two nations by (supp_nation,
    cust_nation, ship year). The two BIG sides (orders⋈customer, then
    lineitem⋈that) take one bucketed hash join each; supplier→nation is
    a broadcast map; the nation-pair predicate and year extraction are
    map-only; revenue partials are exact integer cents."""
    import datetime as _dt

    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    nat = _t(sf_dir, "nation").to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    pair = {k for k, v in names.items()
            if v in ("NATION_3", "NATION_7")}
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
              ).to_pandas()
    s2n = dict(zip(supp["s_suppkey"].astype(int),
                   supp["s_nationkey"].astype(int)))
    bref = ray.put((names, pair, s2n))

    def li_prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = pa.scalar(_dt.datetime(1996, 1, 1))
        hi = pa.scalar(_dt.datetime(1998, 1, 1))
        k = b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi)))
        cents = pc.cast(pc.round(pc.multiply(
            k.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            k.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "orderkey": k.column("l_orderkey"),
            "l_suppkey": k.column("l_suppkey"),
            "l_year": pc.cast(pc.year(k.column("l_shipdate")),
                              pa.int64()),
            "rev": pc.multiply(cents, pc.subtract(
                pa.scalar(100, pa.int64()), disc)),
        })

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount"]
            ).map_batches(li_prep, batch_format="pyarrow")
    ords = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]
              ).rename_columns({"o_custkey": "custkey"})
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]
              ).rename_columns({"c_custkey": "custkey"})
    oc = hash_join(ords, cust, "custkey", how="inner").map_batches(
        lambda b: b[["o_orderkey", "c_nationkey"]].rename(
            columns={"o_orderkey": "orderkey"}),
        batch_format="pandas", batch_size=None).materialize()
    j = hash_join(li, oc, "orderkey", how="inner")

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        nm, pr, sn = ray.get(bref)
        s_nat = b["l_suppkey"].map(sn)
        c_nat = b["c_nationkey"].astype(int)
        keep = (s_nat.isin(pr) & c_nat.isin(pr) & (s_nat != c_nat))
        k = b[keep]
        out = pd.DataFrame({
            "supp_nation": s_nat[keep].map(nm),
            "cust_nation": c_nat[keep].map(nm),
            "l_year": k["l_year"],
            "revenue_i": k["rev"],
        })
        return out.groupby(["supp_nation", "cust_nation", "l_year"],
                           as_index=False)["revenue_i"].sum()

    out = partial_groupby(j, ["supp_nation", "cust_nation", "l_year"],
                          resolve, ["revenue_i"])
    out["revenue_i"] = out["revenue_i"].astype("int64")
    out["l_year"] = out["l_year"].astype("int64")
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]
                           ).reset_index(drop=True)


def q_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    quantity exceeds a threshold, with the owning customer. The
    HAVING subquery is a partial-agg groupby (skinny int partials
    shuffle, never lineitem rows); survivors (~1% of orders) join
    orders then customer through the bucketed hash join."""
    from web2llmstxt_ray.ops.relational import hash_join

    def qty_prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "qty": pc.cast(pc.round(b.column("l_quantity")),
                           pa.int64()),
        })

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
            ).map_batches(qty_prep, batch_format="pyarrow")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderkey", as_index=False)["qty"].sum()
        g["_ob"] = (g["o_orderkey"] % 64).astype("int32")
        return g

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderkey", as_index=False)["qty"].sum()
        return out[out["qty"] > 250].rename(
            columns={"qty": "sum_qty"})

    # partial per block, final per BUCKET (64-group shuffle — a keyed
    # Aggregate over O(orders) keys paid ~18 s of sort machinery for
    # the same result); materialized so the two downstream joins don't
    # re-execute the aggregation per consumer (lazy replay measured
    # 3×: 91 s → ~6 s total at 8 CPUs)
    big = (li.map_batches(partial, batch_format="pandas")
           .groupby("_ob").map_groups(bucket_final,
                                      batch_format="pandas")
           .materialize())
    ords = _t(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    j = hash_join(big, ords, "o_orderkey", how="inner").map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas", batch_size=None).materialize()
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    out = _pdf(hash_join(j, cust, "c_custkey", how="inner"))
    out["price_i"] = (out["o_totalprice"] * 100).round().astype("int64")
    # pandas-merge NaN-alignment upcasts survivors to float — restore ints
    for c in ("c_custkey", "o_orderkey", "sum_qty"):
        out[c] = out[c].astype("int64")
    out = out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "price_i", "sum_qty"]]
    return out.sort_values(["o_orderkey"]).reset_index(drop=True)


def q_interleaved_costs(sf_dir: str) -> pd.DataFrame:
    """Per-document token cost of the interleaved span doc (text spans
    = ws-token count, media spans = fixed 16): map-only — explode keeps
    a doc's spans in one block so the sum completes without a shuffle.
    SQL oracle regenerates the same deterministic spans and mirrors
    the tokenizer."""
    from web2llmstxt_ray.ops.nested import build_span_docs, span_costs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = _pdf(span_costs(build_span_docs(docs), media_cost=16))
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pack_interleaved(sf_dir: str) -> pd.DataFrame:
    """FFD packing of interleaved span docs into ≤1024-token training
    sequences (docs pack atomically so span order survives), in the
    deterministic ``bucket_mod`` tier: docs grouped by
    ``int(doc_id) % 16``, FFD per bucket — replayed exactly by the
    DuckDB twin's recursive-CTE fold over the span-cost CTE (round-3
    flip from rows-only; pack_id = md5 of the sorted member ids).
    Per-block packing invariants stay pytest-gated in
    tests/test_nested_pack.py."""
    import hashlib

    from web2llmstxt_ray.ops.nested import build_span_docs, pack_interleaved

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = _pdf(pack_interleaved(build_span_docs(docs.repartition(4)),
                                max_tokens=1024, bucket_mod=16))
    out["doc_ids"] = out["doc_ids"].map(
        lambda v: ",".join(sorted(v)))
    out["pack_id"] = out["doc_ids"].map(
        lambda s: hashlib.md5(s.encode()).hexdigest())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_cost"] = out["total_cost"].astype("int64")
    return out.sort_values("pack_id").reset_index(drop=True)


def q_user_journeys(sf_dir: str) -> pd.DataFrame:
    """Grouped ordered string_agg: per-user event-type journey in
    (ts, id) order — one bucketed shuffle + per-bucket stable sort +
    vectorized groupby-join."""
    from web2llmstxt_ray.ops.events import user_journeys

    out = _pdf(user_journeys(_t(sf_dir, "events",
                                ["event_id", "user_id", "event_type",
                                 "ts"])))
    return out.sort_values("user_id").reset_index(drop=True)


def _events_cents(sf_dir: str) -> rd.Dataset:
    """events (event_id, event_type, x=value·100 as int64)."""
    ev = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_int(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "x": pc.cast(pc.round(pc.multiply(
                b.column("value"), 100.0)), pa.int64()),
        })

    return ev.map_batches(to_int, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def q_value_rolling_median(sf_dir: str) -> pd.DataFrame:
    """Order-statistic sliding frame (ROWS 4 PRECEDING..CURRENT) per
    user: median of <=5 integer cents is an order statistic / .5-exact
    mean of two ints => bit-exact vs the SQL window oracle."""
    from web2llmstxt_ray.ops.windows import rolling_median

    out = _pdf(rolling_median(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        window=5))
    return out.sort_values("event_id").reset_index(drop=True)


def q_orders_above_median(sf_dir: str) -> pd.DataFrame:
    """Decorrelated-subquery shape: orders strictly above their
    customer's median price (one bucketed shuffle, per-key vectorized
    median transform; comparison in exact integer cents)."""
    from web2llmstxt_ray.ops.windows import above_partition_median

    out = _pdf(above_partition_median(
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        key_col="o_custkey", value_col="o_totalprice",
        id_col="o_orderkey"))
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_weighted_doc_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic A-ES weighted sampling without replacement
    (Efraimidis-Spirakis): per-block partial top-k by ln(u)/w with a
    fixed multiplicative id hash, driver merges O(blocks x k) skinny
    rows — the SQL oracle replays the exact selection."""
    from web2llmstxt_ray.ops.corpus import weighted_sample_aes

    return weighted_sample_aes(
        _t(sf_dir, "documents", ["doc_id", "n_chars"]), k=100)


def q_events_range_hour_sum(sf_dir: str) -> pd.DataFrame:
    """Event-time RANGE frame (INTERVAL 1 HOUR PRECEDING..CURRENT ROW,
    peers included): one bucketed shuffle, all keys windowed at once
    via two searchsorted calls on a composite int64 axis — tie-order
    independent and exact in integer cents."""
    from web2llmstxt_ray.ops.windows import range_window_sum

    out = _pdf(range_window_sum(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        range_seconds=3600))
    return out.sort_values("event_id").reset_index(drop=True)


def q_value_peak_drawdown(sf_dir: str) -> pd.DataFrame:
    """Running partition max + drawdown (ROWS UNBOUNDED PRECEDING):
    one bucketed shuffle, vectorized per-key cummax in integer cents."""
    from web2llmstxt_ray.ops.windows import running_peak_drawdown

    out = _pdf(running_peak_drawdown(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])))
    return out.sort_values("event_id").reset_index(drop=True)


def q_user_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: maximal consecutive-active-day runs per user
    (row_number-difference idiom over the deduped (user, epoch-day)
    set; exact int64 days on both sides)."""
    from web2llmstxt_ray.ops.events import activity_streaks

    out = _pdf(activity_streaks(_t(sf_dir, "events",
                                   ["user_id", "ts"])))
    return out.sort_values(["user_id", "streak_start_day"]) \
        .reset_index(drop=True)


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition counts over per-user (ts, id)
    order — the LAG window shape; per-bucket vectorized groupby-shift
    collapses to O(buckets x |types|^2) partials before the driver
    combine."""
    from web2llmstxt_ray.ops.events import transition_counts

    return transition_counts(_t(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]))


def q_value_mad(sf_dir: str) -> pd.DataFrame:
    """Per-user median + median-absolute-deviation in integer cents
    (order statistics — .0/.5/.25-exact doubles, hash-exact vs the
    nested-median SQL oracle); one bucketed shuffle."""
    from web2llmstxt_ray.ops.stats import grouped_mad

    out = _pdf(grouped_mad(
        _t(sf_dir, "events", ["user_id", "value"]),
        "user_id", "value"))
    return out.sort_values("user_id").reset_index(drop=True)


def q_user_type_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of each user's event-type mix from exact
    per-(user, type) counts — per-block partial histograms, driver
    combine O(users x types)."""
    from web2llmstxt_ray.ops.stats import grouped_entropy

    return grouped_entropy(
        _t(sf_dir, "events", ["user_id", "event_type"]),
        "user_id", "event_type")


def q_late_ship_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join + aggregate): orders with at
    least one lineitem shipped > 60 days after the order date, counted
    per priority. Composition: bucketed hash join -> vectorized late
    filter -> exact value-bucketed distinct count (orderkey is unique
    per order, so distinct-orderkey == EXISTS)."""
    import pyarrow as pa

    from web2llmstxt_ray.ops.relational import hash_join
    from web2llmstxt_ray.ops.stats import grouped_distinct_count

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"])
    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(_rn(l_orderkey="o_orderkey"),
                     batch_format="pyarrow")

    def late_pairs(b: pd.DataFrame) -> pd.DataFrame:
        m = b["l_shipdate"] > b["o_orderdate"] + pd.Timedelta(days=60)
        return b.loc[m, ["o_orderpriority", "o_orderkey"]] \
            .drop_duplicates()

    pairs = hash_join(orders, line, on="o_orderkey").map_batches(
        late_pairs, batch_format="pandas", batch_size=None)
    out = grouped_distinct_count(pairs, "o_orderpriority",
                                 "o_orderkey")
    out = out.rename(columns={"n_distinct": "n_late"})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_dormant_rich_custs(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO recent order (none on/after 2000-06-01), per nation. The
    average test is the exact integer cross-multiplication
    ``cents * n_pos > sum_pos`` (no float boundary); the dormancy test
    is the bucketed exact anti join against the date-filtered orders
    (right side projected to its key before the shuffle)."""
    import pyarrow as pa

    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_stats(b: pa.Table) -> pa.Table:
        import numpy as np
        cents = np.rint(
            np.asarray(b.column("c_acctbal"), dtype=np.float64)
            * 100).astype("int64")
        pos = cents[cents > 0]
        return pa.table({"n": pa.array([len(pos)], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64())})

    parts = cust.map_batches(bal_stats, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    n_pos, s_pos = int(parts["n"].sum()), int(parts["s"].sum())

    def rich_only(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        cents = np.rint(b["c_acctbal"].to_numpy() * 100) \
            .astype("int64")
        b = b.assign(_bal=cents)
        return b.loc[cents * n_pos > s_pos,
                     ["c_custkey", "c_nationkey", "_bal"]]

    rich = cust.map_batches(rich_only, batch_format="pandas",
                            batch_size=None)
    cutoff = pd.Timestamp("2000-06-01")

    def recent_keys(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["o_orderdate"] >= cutoff, ["o_custkey"]] \
            .rename(columns={"o_custkey": "c_custkey"})

    recent = _t(sf_dir, "orders",
                ["o_custkey", "o_orderdate"]).map_batches(
        recent_keys, batch_format="pandas", batch_size=None)
    no_orders = hash_join(rich, recent, on="c_custkey", how="anti")

    def per_nation(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_nationkey", as_index=False).agg(
            n_cust=("_bal", "size"), total_bal_cents=("_bal", "sum"))

    out = partial_groupby(no_orders, ["c_nationkey"], per_nation,
                          ["n_cust", "total_bal_cents"])
    # the anti join's frame union NaN-pads and upcasts ints to float;
    # restore the exact integer dtypes before hashing
    for c in ("c_nationkey", "n_cust", "total_bal_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q_supplier_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Lower weighted median of extended price per supplier, weighted
    by quantity — exact integer 2·cumw ≥ totw rule after per-(key,
    value) weight collapse; one bucketed shuffle."""
    from web2llmstxt_ray.ops.stats import grouped_weighted_median

    out = _pdf(grouped_weighted_median(
        _t(sf_dir, "lineitem",
           ["l_suppkey", "l_extendedprice", "l_quantity"]),
        "l_suppkey", "l_extendedprice", "l_quantity"))
    return out.sort_values("l_suppkey").reset_index(drop=True)


def q_price_histogram(sf_dir: str) -> pd.DataFrame:
    """Exact 20-bin equi-width histogram of order totals: exact
    min/max partials pass, then a map-only pure-integer bin rule with
    additive counts — no shuffle, SQL-replayable."""
    from web2llmstxt_ray.ops.stats import equi_width_histogram

    return equi_width_histogram(
        _t(sf_dir, "orders", ["o_totalprice"]), "o_totalprice",
        nbins=20)


def q_top_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-type top-3 heaviest users (QUALIFY row_number shape,
    deterministic count-desc/user-asc tie-break): two skinny
    shuffles — value-bucketed exact counts, then group-bucketed rank
    filter."""
    from web2llmstxt_ray.ops.stats import grouped_heavy_hitters

    out = _pdf(grouped_heavy_hitters(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id", k=3))
    return out.sort_values(["event_type", "rnk"]).reset_index(
        drop=True)


def q_nation_year_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (profit per supplier-nation per order year,
    part-name LIKE filter; supply cost adapted to p_retailprice since
    the synthetic schema has no partsupp). The two BIG sides
    (lineitem, orders) meet in ONE bucketed hash join on orderkey;
    part — pre-filtered to the matching names, so only a skinny
    partkey→retail-cents map ships — and supplier→nation broadcast
    once via ray.put. Profit accumulates as exact integer
    ``cents·(100−disc) − retail_cents·100·qty`` partials."""
    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    part = _t(sf_dir, "part",
              ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    sel = part.loc[part["p_name"].str.contains("widget")]
    retail = dict(zip(
        sel["p_partkey"].astype(int),
        np.rint(sel["p_retailprice"].to_numpy() * 100)
        .astype("int64")))
    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    s2n = dict(zip(supp["s_suppkey"].astype(int),
                   supp["s_nationkey"].astype(int)))
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    ref = ray.put((retail, s2n, names))

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        retail, s2n, names = ray.get(ref)
        rc = b["l_partkey"].map(retail)
        k = b.loc[rc.notna()]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        qty = np.rint(k["l_quantity"].to_numpy()).astype("int64")
        cost = rc.loc[k.index].to_numpy().astype("int64") * 100 * qty
        return pd.DataFrame({
            "o_orderkey": k["l_orderkey"].to_numpy(),
            "n_name": k["l_suppkey"].map(s2n).map(names).to_numpy(),
            "profit_i": cents * (100 - disc) - cost,
        })

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas", batch_size=None)

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(),
            "o_year": b["o_orderdate"].dt.year.to_numpy()
            .astype("int64"),
        })

    ords = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pandas", batch_size=None)
    j = hash_join(li, ords, "o_orderkey")

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["n_name", "o_year"],
                         as_index=False)["profit_i"].sum()

    out = partial_groupby(j, ["n_name", "o_year"], agg, ["profit_i"])
    out["profit_i"] = out["profit_i"].astype("int64")
    out["o_year"] = out["o_year"].astype("int64")
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


def q_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold to
    EUROPE-region customers, per order year (1996–97). Orders filter +
    customer join resolve the region (orders⋈customer is the ONE
    bucketed hash join on custkey; li⋈that on orderkey is the second);
    the part-type set and supplier→nation broadcast. Numerator and
    denominator are exact integer cents·(100−disc) sums; the share is
    their single float division — bit-exact vs the SQL."""
    import datetime as _dt

    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"]
                .astype(int))
    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = dict(zip(supp["s_suppkey"].astype(int),
                   supp["s_nationkey"].astype(int)))
    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_regionkey"]).to_pandas()
    europe = set(nat.loc[nat["n_regionkey"] == 3, "n_nationkey"]
                 .astype(int))
    ref = ray.put((promo, s2n, europe))

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        yr = b["o_orderdate"].dt.year
        k = b.loc[yr.isin((1996, 1997))]
        return pd.DataFrame({
            "custkey": k["o_custkey"].to_numpy(),
            "o_orderkey": k["o_orderkey"].to_numpy(),
            "o_year": yr.loc[k.index].to_numpy().astype("int64"),
        })

    ords = _t(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pandas", batch_size=None)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .rename_columns({"c_custkey": "custkey"})

    def keep_europe(b: pd.DataFrame) -> pd.DataFrame:
        promo, s2n, europe = ray.get(ref)
        k = b.loc[b["c_nationkey"].isin(europe)]
        return k[["o_orderkey", "o_year"]]

    oc = hash_join(ords, cust, "custkey").map_batches(
        keep_europe, batch_format="pandas",
        batch_size=None).materialize()

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        promo, s2n, europe = ray.get(ref)
        k = b.loc[b["l_partkey"].isin(promo)]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        vol = cents * (100 - disc)
        is3 = (k["l_suppkey"].map(s2n).to_numpy() == 3)
        return pd.DataFrame({
            "o_orderkey": k["l_orderkey"].to_numpy(),
            "vol_i": vol,
            "nat_i": np.where(is3, vol, 0),
        })

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas", batch_size=None)
    j = hash_join(li, oc, "o_orderkey")

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_year", as_index=False)[
            ["vol_i", "nat_i"]].sum()

    out = partial_groupby(j, ["o_year"], agg, ["vol_i", "nat_i"])
    out["vol_i"] = out["vol_i"].astype("int64")
    out["nat_i"] = out["nat_i"].astype("int64")
    out["o_year"] = out["o_year"].astype("int64")
    out["mkt_share"] = out["nat_i"].astype(float) \
        / out["vol_i"].astype(float)
    return out.sort_values("o_year").reset_index(drop=True)


def q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: PROMO-part revenue share of all revenue
    shipped in 1997-03. Map-only: the part→is-promo flag broadcasts,
    the ship-date filter prunes per batch, both sums are exact
    integer cents·(100−disc) partials folded on the driver; the
    percentage is one float expression replicated in the SQL."""
    import datetime as _dt

    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"]
                .astype(int))
    ref = ray.put(promo)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        promo = ray.get(ref)
        m = ((b["l_shipdate"] >= _dt.datetime(1997, 3, 1))
             & (b["l_shipdate"] < _dt.datetime(1997, 4, 1)))
        k = b.loc[m]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        vol = cents * (100 - disc)
        isp = k["l_partkey"].isin(promo).to_numpy()
        return pd.DataFrame({"promo_i": [int(vol[isp].sum())],
                             "total_i": [int(vol.sum())]})

    p = _t(sf_dir, "lineitem",
           ["l_orderkey", "l_partkey", "l_shipdate",
            "l_extendedprice", "l_discount"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None).to_pandas()
    promo_i, total_i = int(p["promo_i"].sum()), int(p["total_i"].sum())
    return pd.DataFrame({
        "promo_i": [promo_i], "total_i": [total_i],
        "promo_pct": [100.0 * promo_i / total_i],
    })


def q_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity lines of one
    brand's parts — lines with ``l_quantity < 0.2 · avg(l_quantity)``
    of their part, tested EXACTLY as the integer cross-multiplication
    ``5·qty·n < sum_qty`` (no float boundary; quantities are
    integers). Two streaming passes over lineitem: (1) per-part
    (sum_qty, n) partials for the broadcast brand-part set, folded on
    the driver (the filtered part set is dim-sized; at larger
    fractions switch partial_groupby to distributed_combine and hash
    join back), (2) map-only filter + exact cents sum."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    part = _t(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand = set(part.loc[part["p_brand"] == "Brand#5", "p_partkey"]
                .astype(int))
    bref = ray.put(brand)

    def qty_partials(b: pd.DataFrame) -> pd.DataFrame:
        brand = ray.get(bref)
        k = b.loc[b["l_partkey"].isin(brand)]
        qty = np.rint(k["l_quantity"].to_numpy()).astype("int64")
        g = pd.DataFrame({"l_partkey": k["l_partkey"].to_numpy(),
                          "sq": qty, "n": 1})
        return g.groupby("l_partkey", as_index=False)[
            ["sq", "n"]].sum()

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"])
    stats = partial_groupby(li, ["l_partkey"], qty_partials,
                            ["sq", "n"])
    sq = dict(zip(stats["l_partkey"].astype(int),
                  stats["sq"].astype(int)))
    nn = dict(zip(stats["l_partkey"].astype(int),
                  stats["n"].astype(int)))
    sref = ray.put((brand, sq, nn))

    def small_rev(b: pd.DataFrame) -> pd.DataFrame:
        brand, sq, nn = ray.get(sref)
        k = b.loc[b["l_partkey"].isin(brand)]
        qty = np.rint(k["l_quantity"].to_numpy()).astype("int64")
        s = k["l_partkey"].map(sq).to_numpy().astype("int64")
        n = k["l_partkey"].map(nn).to_numpy().astype("int64")
        keep = 5 * qty * n < s
        cents = np.rint(
            k["l_extendedprice"].to_numpy()[keep] * 100) \
            .astype("int64")
        return pd.DataFrame({"sum_cents_i": [int(cents.sum())],
                             "n_lines": [int(keep.sum())]})

    p = li.map_batches(small_rev, batch_format="pandas",
                       batch_size=None).to_pandas()
    sum_i, n_lines = int(p["sum_cents_i"].sum()), int(p["n_lines"].sum())
    return pd.DataFrame({
        "sum_cents_i": [sum_i], "n_lines": [n_lines],
        "avg_yearly": [sum_i / 100.0 / 7.0],
    })


def q_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (OR-of-ANDs predicate): revenue from three
    disjunctive (brand, size-range, quantity-range) branches. The
    part (brand, size) map broadcasts once; the predicate evaluates
    vectorized per batch; the sum is exact integer cents·(100−disc)
    partials — one streaming pass, no shuffle."""
    part = _t(sf_dir, "part",
              ["p_partkey", "p_brand", "p_size"]).to_pandas()
    b2 = dict(zip(part["p_partkey"].astype(int), part["p_brand"]))
    sz = dict(zip(part["p_partkey"].astype(int),
                  part["p_size"].astype(int)))
    ref = ray.put((b2, sz))

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b2, sz = ray.get(ref)
        brand = b["l_partkey"].map(b2)
        size = b["l_partkey"].map(sz).to_numpy()
        qty = np.rint(b["l_quantity"].to_numpy()).astype("int64")
        m = (((brand == "Brand#1").to_numpy()
              & (size >= 1) & (size <= 10)
              & (qty >= 1) & (qty <= 15))
             | ((brand == "Brand#2").to_numpy()
                & (size >= 1) & (size <= 20)
                & (qty >= 10) & (qty <= 25))
             | ((brand == "Brand#3").to_numpy()
                & (size >= 1) & (size <= 30)
                & (qty >= 20) & (qty <= 35)))
        k = b.loc[m]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        vol = cents * (100 - disc)
        return pd.DataFrame({"revenue_i": [int(vol.sum())],
                             "n_lines": [int(m.sum())]})

    p = _t(sf_dir, "lineitem",
           ["l_partkey", "l_quantity", "l_extendedprice",
            "l_discount"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None).to_pandas()
    return pd.DataFrame({
        "revenue_i": [int(p["revenue_i"].sum())],
        "n_lines": [int(p["n_lines"].sum())],
    })


def q_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier
    (ship > order date + 60 days) on a finished multi-supplier order.
    lineitem⋈orders(F) is the ONE bucketed hash join; then an
    orderkey-bucketed group pass computes per-(order, supplier)
    any-late flags and per-order distinct/late counts VECTORIZED
    (no per-order loop), emitting the lone late supplier of each
    qualifying order; supplier-name counts fold as skinny partials
    with the deterministic (count desc, name asc) top-20."""
    from web2llmstxt_ray.ops.relational import hash_join
    from web2llmstxt_ray.ops.windows import _add_key_bucket

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    names = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    nref = ray.put(names)

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["o_orderstatus"] == "F"]
        return k[["o_orderkey", "o_orderdate"]]

    ords = _t(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderstatus"]) \
        .map_batches(ord_prep, batch_format="pandas", batch_size=None)
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .rename_columns({"l_orderkey": "o_orderkey"})
    j = hash_join(li, ords, "o_orderkey")

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        late = (b["l_shipdate"]
                > b["o_orderdate"] + pd.Timedelta(days=60))
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(),
            "sk": b["l_suppkey"].to_numpy(),
            "late": late.to_numpy().astype("int64"),
        })

    flagged = j.map_batches(flag, batch_format="pandas",
                            batch_size=None)

    def lone_late(group: pd.DataFrame) -> pd.DataFrame:
        ls = group.groupby(["o_orderkey", "sk"],
                           as_index=False)["late"].max()
        per = ls.groupby("o_orderkey").agg(
            ns=("sk", "size"), nl=("late", "sum"))
        ok = per.index[(per["ns"] >= 2) & (per["nl"] == 1)]
        win = ls.loc[ls["o_orderkey"].isin(ok)
                     & (ls["late"] == 1)]
        out = win.groupby("sk", as_index=False).size() \
            .rename(columns={"size": "numwait"})
        return out

    parts = (_add_key_bucket(flagged, "o_orderkey", 64)
             .groupby("_sbucket").map_groups(
                 lone_late, batch_format="pandas")).to_pandas()
    agg = parts.groupby("sk", as_index=False)["numwait"].sum()
    agg["s_name"] = agg["sk"].astype(int).map(names)
    agg["numwait"] = agg["numwait"].astype("int64")
    out = agg.sort_values(["numwait", "s_name"],
                          ascending=[False, True],
                          kind="stable").head(20)
    return out[["s_name", "numwait"]].reset_index(drop=True)


def q_min_price_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape (argmin + join-back): for every size-10 part,
    the lineitem supplier offering the minimum extended price
    (ties → smallest suppkey), resolved to supplier and nation names.
    argmin is idempotent, so per-block winners reduce first
    (O(blocks×parts) partials) and the driver picks the final row;
    name dims broadcast."""
    from web2llmstxt_ray.ops.relational import argmax_by_key

    part = _t(sf_dir, "part", ["p_partkey", "p_size"]).to_pandas()
    sized = set(part.loc[part["p_size"] == 10, "p_partkey"]
                .astype(int))
    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    sname = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    snat = dict(zip(supp["s_suppkey"].astype(int),
                    supp["s_nationkey"].astype(int)))
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    ref = ray.put(sized)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        sized = ray.get(ref)
        k = b.loc[b["l_partkey"].isin(sized)]
        return pd.DataFrame({
            "p_partkey": k["l_partkey"].to_numpy(),
            "price_cents": np.rint(
                k["l_extendedprice"].to_numpy() * 100)
            .astype("int64"),
            "l_suppkey": k["l_suppkey"].to_numpy(),
        })

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    win = argmax_by_key(li, "p_partkey", "price_cents", "l_suppkey",
                        descending=False)
    win = win.copy()
    win["s_name"] = win["l_suppkey"].astype(int).map(sname)
    win["n_name"] = win["l_suppkey"].astype(int).map(snat).map(nname)
    out = win[["p_partkey", "price_cents", "s_name", "n_name"]]
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_events_frame_values(sf_dir: str) -> pd.DataFrame:
    """Navigation window functions over a trailing 5-row frame:
    first_value and nth_value(2) per user ordered by (ts, event_id) —
    one bucketed shuffle, pure index arithmetic inside the bucket."""
    from web2llmstxt_ray.ops.windows import frame_first_nth

    out = _pdf(frame_first_nth(_t(sf_dir, "events"), window=5))
    return out.sort_values("event_id").reset_index(drop=True)


def q_type_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report (``cents / sum(cents) OVER (PARTITION BY
    event_type)``) WITHOUT a shuffle: per-type exact cents sums fold
    from per-block partials on the driver (5 types), broadcast back,
    and the per-row share is one map-only float division."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    ev = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["value"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "c": cents})
        return g.groupby("event_type", as_index=False)["c"].sum()

    tot = partial_groupby(ev, ["event_type"], partials, ["c"])
    totals = dict(zip(tot["event_type"], tot["c"].astype(int)))
    tref = ray.put(totals)

    def share(b: pd.DataFrame) -> pd.DataFrame:
        totals = ray.get(tref)
        cents = np.rint(b["value"].to_numpy() * 100).astype("int64")
        t = b["event_type"].map(totals).to_numpy().astype("float64")
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "event_type": b["event_type"].to_numpy(),
            "cents": cents,
            "pct": cents.astype("float64") / t,
        })

    out = ev.map_batches(share, batch_format="pandas",
                         batch_size=None).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_part_pair_counts(sf_dir: str) -> pd.DataFrame:
    """Market-basket pair co-occurrence: the top-20 part pairs by the
    number of orders containing both (the classic self-join shape,
    done without a quadratic join — vectorized within-order pair
    explosion in orderkey buckets, exact pair-bucketed counts,
    O(buckets×k) driver merge)."""
    from web2llmstxt_ray.ops.basket import pair_cooccurrence

    return pair_cooccurrence(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        "l_orderkey", "l_partkey", k=20)


def q_supplier_regression(sf_dir: str) -> pd.DataFrame:
    """Per-supplier OLS of extended price (cents) on quantity:
    slope, intercept, R² from exact integer co-moments in one
    map-only pass (Σy² via the overflow-safe split sum)."""
    from web2llmstxt_ray.ops.stats import grouped_regression

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": b["l_suppkey"].to_numpy(),
            "x": np.rint(b["l_quantity"].to_numpy()).astype("int64"),
            "y": np.rint(b["l_extendedprice"].to_numpy() * 100)
            .astype("int64"),
        })

    ds = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    out = grouped_regression(ds, ["l_suppkey"], "x", "y")
    return out.sort_values("l_suppkey").reset_index(drop=True)


def q_value_ks_clicks(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between click and view
    event-value distributions — exact cross-multiplied CDF test, one
    streaming pass."""
    from web2llmstxt_ray.ops.stats import two_sample_ks

    return two_sample_ks(
        _t(sf_dir, "events", ["value", "event_type"]),
        "value", "event_type", "click", "view")


def q_supplier_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """10%-trimmed mean of extended price per supplier (drop
    n·10//100 rows from each value-order tail; exact integer survivor
    sum; tie-safe because tied rows share the summed value)."""
    from web2llmstxt_ray.ops.stats import grouped_trimmed_mean

    out = _pdf(grouped_trimmed_mean(
        _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"]),
        "l_suppkey", "l_extendedprice", trim_pct=10))
    return out.sort_values("l_suppkey").reset_index(drop=True)


def q_orders_mom_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth: the aggregate→window
    composition. Monthly exact cents sums fold from per-block
    partials (the months axis is tiny); LAG + one float division run
    on the driver over the O(months) series."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        month = b["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        cents = np.rint(b["o_totalprice"].to_numpy() * 100) \
            .astype("int64")
        g = pd.DataFrame({"month": month.to_numpy(), "rev_i": cents})
        return g.groupby("month", as_index=False)["rev_i"].sum()

    m = partial_groupby(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
        ["month"], partials, ["rev_i"]).sort_values("month") \
        .reset_index(drop=True)
    m["rev_i"] = m["rev_i"].astype("int64")
    prev = m["rev_i"].shift(1)
    m["mom_growth"] = (m["rev_i"] - prev).astype("float64") \
        / prev.astype("float64")
    return m


def q_lineitem_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUP BY GROUPING SETS with NON-hierarchical sets — the two
    independent single-key marginals plus the grand total — from ONE
    distributed scan (finest partials re-summed per set driver-side;
    absent keys marked 'ALL' like the oracle's coalesce over SQL
    NULLs)."""
    from web2llmstxt_ray.ops.relational import grouping_sets_agg

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        qty = np.rint(b["l_quantity"].to_numpy()).astype("int64")
        g = pd.DataFrame({"l_returnflag": b["l_returnflag"],
                          "l_linestatus": b["l_linestatus"],
                          "sum_qty": qty, "n_rows": 1})
        return g.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False)[["sum_qty", "n_rows"]].sum()

    out = grouping_sets_agg(
        _t(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity"]),
        ["l_returnflag", "l_linestatus"], agg,
        ["sum_qty", "n_rows"],
        sets=[("l_returnflag",), ("l_linestatus",), ()])
    out["sum_qty"] = out["sum_qty"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_props_key_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: parse the integer ``k`` out of the
    JSON ``props`` column (vectorized regex — no per-row json.loads)
    and aggregate per event type: count, exact sum, exact distinct
    count — all derived from ONE skinny (type, k) count-partial pass."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        k = b["props"].str.extract(r'"k"\s*:\s*(-?\d+)',
                                   expand=False).astype("int64")
        g = pd.DataFrame({"event_type": b["event_type"], "k": k,
                          "cnt": 1})
        return g.groupby(["event_type", "k"],
                         as_index=False)["cnt"].sum()

    fine = partial_groupby(
        _t(sf_dir, "events", ["event_type", "props"]),
        ["event_type", "k"], partials, ["cnt"])
    fine["cnt"] = fine["cnt"].astype("int64")
    fine["kc"] = fine["k"].astype("int64") * fine["cnt"]
    out = fine.groupby("event_type", as_index=False).agg(
        n=("cnt", "sum"), sum_k=("kc", "sum"),
        n_distinct_k=("k", "size"))
    for c in ("n", "sum_k", "n_distinct_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_span_transitions(sf_dir: str) -> pd.DataFrame:
    """Kind-adjacency counts over the interleaved span docs
    (prev_kind, next_kind, n_pairs) — shuffle-free: a document's spans
    never leave their block, so adjacent pairs resolve in map-side
    partials and the driver folds O(blocks × kinds²) rows. Oracle:
    LAG(kind) over the regenerated spans."""
    from web2llmstxt_ray.ops.nested import (build_span_docs,
                                            span_transitions)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return span_transitions(build_span_docs(docs))


def q_media_captions(sf_dir: str) -> pd.DataFrame:
    """Image-caption pair mining over the interleaved payload: for each
    media span, the nearest preceding and following text spans in the
    same document (map-only accumulate passes, no shuffle). Oracle:
    LAG/LEAD text over the regenerated spans filtered to media rows
    (neighbours are text spans by construction of the generator, so
    immediate-neighbour SQL equals nearest-text semantics here; the
    generic nearest-text behaviour is unit-tested on consecutive-media
    docs in tests/test_nested.py)."""
    from web2llmstxt_ray.ops.nested import build_span_docs, media_captions

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = media_captions(build_span_docs(docs)).to_pandas()
    out["span_idx"] = out["span_idx"].astype("int64")
    return out.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)


def q_span_doc_profile(sf_dir: str) -> pd.DataFrame:
    """Per-document interleave profile (n_spans, n_media, text_chars,
    n_runs=1+kind changes) — map-only segment arithmetic; the
    alternation signal interleaved-corpus curation filters on."""
    from web2llmstxt_ray.ops.nested import (build_span_docs,
                                            span_doc_profile)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = span_doc_profile(build_span_docs(docs)).to_pandas()
    for c in ("n_spans", "n_media", "text_chars", "n_runs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lineitem_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlation matrix over four lineitem measures
    (quantity, price cents, discount %, tax %) from ONE map-only
    co-moment pass — O(blocks × d²) skinny partials, exact Python-int
    moments (hi/lo split sums), one double expression per pair that the
    SQL oracle replays with HUGEINT sums."""
    from web2llmstxt_ray.ops.stats import correlation_matrix

    li = _t(sf_dir, "lineitem",
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qty": b["l_quantity"].round().astype("int64"),
            "price_c": (b["l_extendedprice"] * 100).round()
            .astype("int64"),
            "disc_pct": (b["l_discount"] * 100).round().astype("int64"),
            "tax_pct": (b["l_tax"] * 100).round().astype("int64"),
        })

    ints = li.map_batches(scale, batch_format="pandas")
    return correlation_matrix(ints,
                              ["qty", "price_c", "disc_pct", "tax_pct"])


def q_source_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-guarded deterministic train/test split of documents BY
    SOURCE (all docs of a source land one side — near-dups inside a
    source can't straddle the split). Map-only; the md5-mod rule is
    replayed verbatim by the DuckDB oracle."""
    from web2llmstxt_ray.ops.corpus import grouped_split

    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    out = grouped_split(docs, "source", train_pct=80).to_pandas()
    return (out[["doc_id", "source", "split"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_span_rechunk(sf_dir: str) -> pd.DataFrame:
    """Interleaved re-segmentation: span docs re-chunked at width 96
    (text runs concatenated and re-sliced, media spans pass through),
    profiled per doc. SQL twin (round-5 flip from rows-only): the
    synthetic span model makes the rechunk pure arithmetic — per
    192-char source group the text run is clamp(L-192k, 0, 128) chars
    → ceil(run/96) output spans, images pass through iff
    L > 192k+128, and the alternation count replays as a lag() run
    census over the simulated (k, pos, kind) sequence. The per-doc
    structural invariants (text-concat equality, media subsequence,
    width bound, idempotence) stay pytest-gated in
    tests/test_nested.py."""
    from web2llmstxt_ray.ops.nested import (build_span_docs,
                                            rechunk_spans,
                                            span_doc_profile)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = span_doc_profile(
        rechunk_spans(build_span_docs(docs), 96)).to_pandas()
    for c in ("n_spans", "n_media", "text_chars", "n_runs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_hybrid_search(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    ranking and the exact-cosine vector ranking over the shared
    doc/vec id space (top-50 each side, rrf_k=60, top-20 fused).
    Both sides run their scale paths (map-only BM25 scoring with
    in-block per-doc sums; per-batch partial-top-k GEMM); fusion
    touches two 50-row lists. The per-doc BM25 total is a sorted-term
    LEFT-FOLD so the SQL oracle replays the identical double chain."""
    from web2llmstxt_ray.ops.retrieval import hybrid_rrf

    qvecs, qids = _query_vectors(sf_dir)
    return hybrid_rrf(_t(sf_dir, "documents", ["doc_id", "text"]),
                      _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      _BM25_TERMS, qvecs[0], qids[0],
                      k_each=50, k_out=20)


def q_mmr_sample(sf_dir: str) -> pd.DataFrame:
    """Diverse subset selection: greedy Maximal Marginal Relevance over
    the embeddings table (k=20, λ=0.7) — each greedy step is one
    map-only pass (broadcast selected set, two GEMMs per block, block
    argmax partials). The DuckDB twin replays the greedy selection
    EXACTLY with a recursive CTE (selected-id list carried in the
    recursion state; per-step argmax via a LATERAL top-1 over
    max-sim-to-selected) — round-4 flip from rows-only; the
    sequential-oracle conformance test stays in
    tests/test_ann_textstats.py."""
    from web2llmstxt_ray.ops.ann import mmr_select

    qvecs, qids = _query_vectors(sf_dir)
    out = mmr_select(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                     qvecs[0], k=20, lam=0.7)
    return out.to_pandas()


def q_qty_disc_spearman(sf_dir: str) -> pd.DataFrame:
    """EXACT Spearman rank correlation (average-rank ties) of quantity
    vs discount: fused distinct-value histograms → broadcast integer
    2×avg-rank maps → map-only attach → exact co-moment fold. The SQL
    oracle replays the identical integer rank construction
    (2·rank − 2 + peer count + 1) and the same double expression over
    HUGEINT sums — hash-exact despite heavy ties on both sides."""
    from web2llmstxt_ray.ops.stats import spearman_corr

    li = _t(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qty": b["l_quantity"].round().astype("int64"),
            "disc": (b["l_discount"] * 100).round().astype("int64")})

    return spearman_corr(li.map_batches(scale, batch_format="pandas"),
                         "qty", "disc")


def q_priority_status_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-square test of independence + Cramér's V over order
    priority × status from one map-only contingency pass (exact
    integer counts; per-cell terms are exact-int numerators over
    exact-int denominators, folded in sorted cell order)."""
    from web2llmstxt_ray.ops.stats import chi2_independence

    return chi2_independence(
        _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        "o_orderpriority", "o_orderstatus")


def q_qty_disc_kendall(sf_dir: str) -> pd.DataFrame:
    """EXACT Kendall tau-b from the joint (qty, disc) count histogram:
    one map-only pass to O(|x|·|y|) exact cells; concordant/discordant
    and tie counts are Python-int suffix sums over the grid, so the
    driver arithmetic is independent of row count. SQL replays the
    same integers via a HUGEINT cell self-join — hash-exact."""
    from web2llmstxt_ray.ops.stats import kendall_tau_b

    li = _t(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qty": b["l_quantity"].round().astype("int64"),
            "disc": (b["l_discount"] * 100).round().astype("int64")})

    return kendall_tau_b(li.map_batches(scale, batch_format="pandas"),
                         "qty", "disc")


def q_value_psi_drift(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index of event value-cents between click
    and non-click events: the SQL-replayable equi-width integer bin
    rule over the global range, Laplace-smoothed bin proportions
    (few-ULP gate on the float SUM over 10 bins)."""
    from web2llmstxt_ray.ops.stats import psi_drift

    ev = _t(sf_dir, "events", ["event_type", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "v": (b["value"] * 100).round().astype("int64"),
            "f": (b["event_type"] != "click").astype("int64")})

    return psi_drift(ev.map_batches(prep, batch_format="pandas"),
                     "v", "f", nbins=10)


def q_lang_jsd(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between the language distributions of
    even- and odd-id documents (exact count histograms; per-category
    term grouped exactly as the SQL oracle's cell expression)."""
    from web2llmstxt_ray.ops.stats import js_divergence

    docs = _t(sf_dir, "documents", ["doc_id", "lang"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": b["lang"],
                             "f": (b["doc_id"] % 2).astype("int64")})

    return js_divergence(docs.map_batches(prep, batch_format="pandas"),
                         "lang", "f")


def q_lineitem_unpivot(sf_dir: str) -> pd.DataFrame:
    """Wide → long UNPIVOT of the four lineitem measures (map-only
    k-way melt per block, streams at any size; sliced to a key range
    to keep the driver compare small). Oracle: UNION-ALL UNPIVOT."""
    from web2llmstxt_ray.ops.relational import unpivot

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax"]).map_batches(
        lambda b: b[b["l_orderkey"] < 2000], batch_format="pandas")
    out = unpivot(li, ["l_orderkey", "l_linenumber"],
                  ["l_quantity", "l_extendedprice", "l_discount",
                   "l_tax"]).to_pandas()
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return out.sort_values(["l_orderkey", "l_linenumber",
                            "measure"]).reset_index(drop=True)


def q_customer_intervals(sf_dir: str) -> pd.DataFrame:
    """Overlapping-interval coalescing per customer (the islands
    idiom, distributed: one hash(key) shuffle + per-bucket vectorized
    grouped cummax — no per-key loop). Intervals are deterministic
    [order-day, order-day + orderkey%25 + 1) windows; output one row
    per merged island. Oracle replays the exact ROWS-frame window
    idiom."""
    from web2llmstxt_ray.ops.relational import merge_intervals

    orders = _t(sf_dir, "orders",
                ["o_custkey", "o_orderkey", "o_orderdate"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["o_orderdate"].astype("int64")
               // (86_400 * 1_000_000)).astype("int64")
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].astype("int64"),
            "start_day": day,
            "end_day": day + (b["o_orderkey"] % 25) + 1})

    out = merge_intervals(orders.map_batches(prep,
                                             batch_format="pandas"),
                          "o_custkey", "start_day",
                          "end_day").to_pandas()
    for c in ("o_custkey", "start_day", "end_day", "n_merged"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_custkey",
                            "start_day"]).reset_index(drop=True)


def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Overlapping RAG-style context chunking (size 256, overlap 64):
    map-only vectorized slicing; SQL oracle regenerates the identical
    chunk grid with unnest(range(1 + ceil((len−size)/step)))."""
    from web2llmstxt_ray.ops.corpus import chunk_text

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = chunk_text(docs, size=256, overlap=64).to_pandas()
    out["chunk_idx"] = out["chunk_idx"].astype("int64")
    out["start"] = out["start"].astype("int64")
    return out.sort_values(["doc_id",
                            "chunk_idx"]).reset_index(drop=True)


def q_doc_word_matches(sf_dir: str) -> pd.DataFrame:
    """Regex extract-all explode: every ≥6-letter word occurrence as a
    row (doc_id, match_idx, match) in document order — one compiled
    findall + explode per block. Oracle: regexp_extract_all +
    LATERAL-unnest with 1-based list indexing."""
    from web2llmstxt_ray.ops.textstats import extract_pattern_all

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = extract_pattern_all(docs, r"[a-z]{6,}").to_pandas()
    out["match_idx"] = out["match_idx"].astype("int64")
    return out.sort_values(["doc_id",
                            "match_idx"]).reset_index(drop=True)


def q_time_since_purchase(sf_dir: str) -> pd.DataFrame:
    """Conditional-frame navigation window: per event, microseconds
    since the user's most recent strictly-earlier purchase (NaN when
    none) — one hash(user) bucket shuffle + positional accumulate, no
    per-user loop. Oracle: conditional MAX over a ROWS … 1 PRECEDING
    frame."""
    from web2llmstxt_ray.ops.events import time_since_event

    ev = _t(sf_dir, "events",
            ["event_id", "user_id", "ts", "event_type"])
    out = time_since_event(ev, "purchase").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_audience_overlap(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap matrix: |users(a) ∩ users(b)| per event-type
    pair, exactly, WITHOUT the quadratic self-join — distinct
    (user, type) pairs shuffle once by user hash, buckets emit
    per-user type-bitmask histograms (≤ 2^k skinny rows), the driver
    reads every pairwise intersection from the mask counts. Oracle:
    the DISTINCT self-join."""
    from web2llmstxt_ray.ops.events import type_overlap_matrix

    return type_overlap_matrix(
        _t(sf_dir, "events", ["user_id", "event_type"]))


def q_bigram_collocations(sf_dir: str) -> pd.DataFrame:
    """Collocation mining: top-50 adjacent-word bigrams by PMI
    (min count 5) — one vectorized pass of bigram+unigram partials,
    bucketed bigram combine, each PMI a single double expression over
    five exact integers (SQL-replayed verbatim; deterministic
    (pmi desc, w1, w2) tie-break)."""
    from web2llmstxt_ray.ops.corpus import bigram_pmi

    return bigram_pmi(_t(sf_dir, "documents", ["text"]),
                      min_count=5, k=50)


def q_doc_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per-document top-3 TF-IDF keywords (tf·ln(N/df), raw counts):
    document frequencies fold once and broadcast; per-doc scoring and
    selection are map-only (a doc's tokens never leave its block).
    Oracle: tf/df CTEs + row_number over (tfidf desc, term)."""
    from web2llmstxt_ray.ops.retrieval import tfidf_top_terms

    out = tfidf_top_terms(_t(sf_dir, "documents", ["doc_id", "text"]),
                          top_m=3).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def q_time_to_purchase(sf_dir: str) -> pd.DataFrame:
    """Forward conditional-frame window: per event, microseconds until
    the user's NEXT strictly-later purchase (NaN = censored, never
    converts) — the survival-analysis label. Reversed accumulate per
    bucket; oracle: conditional MIN over ROWS 1 FOLLOWING …
    UNBOUNDED FOLLOWING."""
    from web2llmstxt_ray.ops.events import time_to_event

    ev = _t(sf_dir, "events",
            ["event_id", "user_id", "ts", "event_type"])
    out = time_to_event(ev, "purchase").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_split_balance(sf_dir: str) -> pd.DataFrame:
    """Split-quality gate: Jensen-Shannon divergence between the
    train and test LANGUAGE distributions produced by the
    leakage-guarded source split — the check that a grouped split
    didn't skew the class balance. Pure composition: grouped_split →
    flag → js_divergence; the oracle replays the md5 split rule inside
    the JSD query."""
    from web2llmstxt_ray.ops.corpus import grouped_split
    from web2llmstxt_ray.ops.stats import js_divergence

    docs = grouped_split(_t(sf_dir, "documents",
                            ["doc_id", "source", "lang"]), "source")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": b["lang"],
                             "f": (b["split"] == "test")
                             .astype("int64")})

    return js_divergence(docs.map_batches(prep,
                                          batch_format="pandas"),
                         "lang", "f")


# ---------------------------------------------------------------------------
# round-3 tail 2: TPC-H completion (Q6/Q10/Q11/Q15/Q20 shapes), skyline,
# BFS hops, SCD2 history, attribution, cross-doc span dedup
# ---------------------------------------------------------------------------


def q_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (forecast revenue change): one map-only pass —
    vectorized filter (1996 ship year, discount 5–7%, qty < 24) and an
    exact-integer ``cents × discount_pct`` partial per block; the
    driver folds O(blocks) two-cell partials. No shuffle at all."""
    li = _t(sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity",
             "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = np.rint(b["l_discount"].to_numpy() * 100).astype("int64")
        q = np.rint(b["l_quantity"].to_numpy()).astype("int64")
        sd = b["l_shipdate"].to_numpy().astype("datetime64[us]")
        m = ((sd >= np.datetime64("1996-01-01"))
             & (sd < np.datetime64("1997-01-01"))
             & (d >= 5) & (d <= 7) & (q < 24))
        cents = np.rint(b["l_extendedprice"].to_numpy()[m] * 100) \
            .astype("int64")
        return pd.DataFrame({"rev": [int((cents * d[m]).sum())],
                             "n": [int(m.sum())]})

    parts = li.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    return pd.DataFrame({"revenue_i": [int(parts["rev"].sum())],
                         "n_items": [int(parts["n"].sum())]})


def q_returned_item_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): lineitems with
    ``l_returnflag = 'R'`` joined to 1996-Q1 orders in ONE bucketed
    hash join on orderkey (both sides pre-filtered and pre-projected
    to skinny columns), per-customer exact integer revenue partials,
    global top-20 with the deterministic (revenue desc, custkey)
    tie-break; customer/nation names broadcast as dicts."""
    from web2llmstxt_ray.ops.relational import hash_join, partial_groupby

    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cname = dict(zip(cust["c_custkey"].astype(int), cust["c_name"]))
    cnat = dict(zip(cust["c_custkey"].astype(int),
                    cust["c_nationkey"].astype(int)))
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy().astype("datetime64[us]")
        k = b.loc[(d >= np.datetime64("1996-01-01"))
                  & (d < np.datetime64("1996-04-01"))]
        return pd.DataFrame({
            "o_orderkey": k["o_orderkey"].to_numpy(),
            "custkey": k["o_custkey"].to_numpy()})

    ords = _t(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pandas", batch_size=None)

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["l_returnflag"] == "R"]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        return pd.DataFrame({"o_orderkey": k["l_orderkey"].to_numpy(),
                             "rev_i": cents * (100 - disc)})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice",
             "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas", batch_size=None)
    j = hash_join(li, ords, "o_orderkey")
    out = partial_groupby(
        j, ["custkey"],
        lambda b: b.groupby("custkey", as_index=False)["rev_i"].sum(),
        ["rev_i"])
    out = out.sort_values(["rev_i", "custkey"],
                          ascending=[False, True],
                          kind="stable").head(20).copy()
    out["c_custkey"] = out["custkey"].astype("int64")
    out["rev_i"] = out["rev_i"].astype("int64")
    out["c_name"] = out["c_custkey"].map(cname)
    out["n_name"] = out["c_custkey"].map(cnat).map(nname)
    return out[["c_custkey", "c_name", "n_name", "rev_i"]] \
        .reset_index(drop=True)


def q_part_revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape (global-fraction HAVING): parts whose exact
    integer revenue exceeds 1.25× the average part share —
    cross-multiplied (``rev·nparts·4 > 5·total``) so the comparison
    stays in integers. One set of per-part partials feeds BOTH the
    per-part totals and the corpus total (no second scan); the
    global scalar folds on the driver and the filter is vectorized.
    At extreme corpus scale the cross-product nears int64 — the
    partials would switch to Python-int objects then (same contract
    as the Q17/Q22 exact-average shapes)."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype("int64")
        return pd.DataFrame({"p_partkey": b["l_partkey"].to_numpy(),
                             "rev_i": cents * (100 - disc)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas", batch_size=None)
    per = partial_groupby(
        li, ["p_partkey"],
        lambda b: b.groupby("p_partkey",
                            as_index=False)["rev_i"].sum(),
        ["rev_i"])
    total = int(per["rev_i"].sum())
    nparts = len(per)
    out = per.loc[per["rev_i"] * (nparts * 4) > 5 * total].copy()
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["rev_i"] = out["rev_i"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier via scalar-subquery max):
    per-supplier exact revenue over 1996-Q1 shipments from map-only
    partials (supplier cardinality is small relative to lineitem —
    the classic pre-aggregate-before-shuffle case, here collapsing
    to a driver fold), then the ``revenue = MAX(revenue)`` filter
    and a broadcast name attach."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sname = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].to_numpy().astype("datetime64[us]")
        k = b.loc[(d >= np.datetime64("1996-01-01"))
                  & (d < np.datetime64("1996-04-01"))]
        cents = np.rint(k["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(k["l_discount"].to_numpy() * 100) \
            .astype("int64")
        return pd.DataFrame({"s_suppkey": k["l_suppkey"].to_numpy(),
                             "total_i": cents * (100 - disc)})

    li = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    per = partial_groupby(
        li, ["s_suppkey"],
        lambda b: b.groupby("s_suppkey",
                            as_index=False)["total_i"].sum(),
        ["total_i"])
    mx = int(per["total_i"].max())
    out = per.loc[per["total_i"] == mx].copy()
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_i"] = out["total_i"].astype("int64")
    out["s_name"] = out["s_suppkey"].map(sname)
    return out[["s_suppkey", "s_name", "total_i"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


def q_promo_part_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in
    region 0 that shipped more than 50 units of any 'widget' part
    during 1996. The widget partkey set broadcasts once via
    ``ray.put``; lineitem prunes map-only to skinny
    (suppkey, partkey, qty) rows; the (supp, part) exact qty sums
    come from the partial-agg combiner; the surviving supplier-id
    set is tiny and resolves names/nation on the driver."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    part = _t(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    widgets = set(part.loc[part["p_name"].str.contains("widget"),
                           "p_partkey"].astype(int))
    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_regionkey"]).to_pandas()
    region0 = set(nat.loc[nat["n_regionkey"] == 0, "n_nationkey"]
                  .astype(int))
    ref = ray.put(widgets)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        d = b["l_shipdate"].to_numpy().astype("datetime64[us]")
        k = b.loc[(d >= np.datetime64("1996-01-01"))
                  & (d < np.datetime64("1997-01-01"))
                  & b["l_partkey"].isin(w).to_numpy()]
        return pd.DataFrame({
            "s_suppkey": k["l_suppkey"].to_numpy(),
            "p_partkey": k["l_partkey"].to_numpy(),
            "qty_i": np.rint(k["l_quantity"].to_numpy())
            .astype("int64")})

    li = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    per = partial_groupby(
        li, ["s_suppkey", "p_partkey"],
        lambda b: b.groupby(["s_suppkey", "p_partkey"],
                            as_index=False)["qty_i"].sum(),
        ["qty_i"])
    hot = set(per.loc[per["qty_i"] > 50, "s_suppkey"].astype(int))
    out = supp.loc[supp["s_suppkey"].isin(hot)
                   & supp["s_nationkey"].isin(region0),
                   ["s_suppkey", "s_name"]].copy()
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q_user_scd2(sf_dir: str) -> pd.DataFrame:
    """SCD-type-2 dimension history from the event log: per-user
    change-compressed validity intervals of ``event_type`` (one row
    per maximal constant run, valid_to = next run's first ts, NaT
    while current). One bucketed shuffle, vectorized island
    construction — see :func:`ops.windows.scd2_intervals`."""
    from web2llmstxt_ray.ops.windows import scd2_intervals

    out = _pdf(scd2_intervals(
        _t(sf_dir, "events",
           ["event_id", "user_id", "ts", "event_type"])))
    return out.sort_values(["user_id", "valid_from", "event_type"]) \
        .reset_index(drop=True)


def q_first_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """First-touch marketing attribution: every purchase's exact
    cents credited to the user's earliest event type in the trailing
    7-day window ('direct' when none). One bucketed shuffle + a
    single composite-axis searchsorted — no per-purchase probe."""
    from web2llmstxt_ray.ops.windows import first_touch_attribution

    return first_touch_attribution(
        _t(sf_dir, "events",
           ["event_id", "user_id", "ts", "event_type", "value"]))


def q_part_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto skyline of parts (min retail price, max size): local
    vectorized skyline per block, final pass over block survivors —
    the NOT-EXISTS anti-self-join without the quadratic join."""
    from web2llmstxt_ray.ops.relational import skyline_2d

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].to_numpy(),
            "price_cents": np.rint(
                b["p_retailprice"].to_numpy() * 100).astype("int64"),
            "p_size": b["p_size"].to_numpy().astype("int64")})

    part = _t(sf_dir, "part",
              ["p_partkey", "p_retailprice", "p_size"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    return skyline_2d(part, "p_partkey", "price_cents", "p_size")


def q_part_bfs_hops(sf_dir: str) -> pd.DataFrame:
    """Minimum hop distance from part 0 over the order co-purchase
    graph, ≤3 hops — the crawl frontier wave loop on an arbitrary
    graph (frontier broadcast ↔ wave, visited set ↔ URL-seen
    filter). Edges build with the basket pair-explosion (one
    orderkey-bucketed shuffle) and stay a materialized Dataset the
    three wave passes stream over; the DuckDB twin is a WITH
    RECURSIVE min-distance walk."""
    from web2llmstxt_ray.ops.basket import _explode_pairs
    from web2llmstxt_ray.ops.graph import bfs_hops
    from web2llmstxt_ray.ops.windows import _add_key_bucket

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        d = (group[["l_orderkey", "l_partkey"]].drop_duplicates()
             .sort_values(["l_orderkey", "l_partkey"], kind="stable"))
        a, b = _explode_pairs(d["l_orderkey"].to_numpy(),
                              d["l_partkey"].to_numpy())
        return pd.DataFrame({"u": a, "v": b}).drop_duplicates()

    edges = (_add_key_bucket(li, "l_orderkey", 64)
             .groupby("_sbucket")
             .map_groups(pairs, batch_format="pandas")
             .materialize())
    return bfs_hops(edges, seed=0, max_hops=3)


def q_span_dedup(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact span dedup over the interleaved corpus
    (first occurrence wins, media spans always kept): per-document
    kept/dropped audit — see :func:`ops.nested.span_dedup_counts`."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_dedup_counts)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return span_dedup_counts(explode_spans(build_span_docs(docs)))


def q_running_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Running distinct cardinality (new vs returning users): per
    day, first-time keys and the cumulative distinct count — exact
    via per-key first-seen MIN partials, not a windowed
    COUNT(DISTINCT); see :func:`ops.windows.running_distinct_counts`."""
    from web2llmstxt_ray.ops.windows import running_distinct_counts

    return running_distinct_counts(
        _t(sf_dir, "events", ["user_id", "ts"]))


def q_linear_attribution(sf_dir: str) -> pd.DataFrame:
    """Linear multi-touch attribution with exact integer credit
    split (floor + remainder-to-earliest, so credits reconcile to
    purchase cents exactly) over the trailing 7-day window."""
    from web2llmstxt_ray.ops.windows import linear_touch_attribution

    return linear_touch_attribution(
        _t(sf_dir, "events",
           ["event_id", "user_id", "ts", "event_type", "value"]))


def q_name_edit_pairs(sf_dir: str) -> pd.DataFrame:
    """Spelling-variant similarity join: distinct part names within
    Levenshtein distance 1 via FastSS deletion-neighborhood blocking
    (candidates from shared single-deletion variants, exact ≤1
    verify) — the quadratic levenshtein cross join without the cross
    join; see :func:`ops.dedup.edit_distance_self_join`."""
    from web2llmstxt_ray.ops.dedup import edit_distance_self_join

    return edit_distance_self_join(
        _t(sf_dir, "part", ["p_name"]), "p_name")


def q_crawl_delta(sf_dir: str) -> pd.DataFrame:
    """Incremental-crawl span delta: simulate a deterministic
    re-crawl (docs ≡0 mod 5 upper-cased, docs ≡0 mod 7 get a trailing
    update marker), rebuild both interleaved span streams, and report
    the per-document exact multiset diff (added / removed / unchanged
    spans) — see :func:`ops.nested.span_delta_counts`. The span-level
    CDC view a 100-TB recrawl pipeline uses to skip unchanged work."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_delta_counts)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def recrawl(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64").to_numpy()
        t = b["text"].copy()
        t = t.mask(did % 5 == 0, t.str.upper())
        t = t.mask(did % 7 == 0, t + " updated content marker")
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "text": t.to_numpy()})

    old_flat = explode_spans(build_span_docs(docs))
    new_flat = explode_spans(build_span_docs(
        docs.map_batches(recrawl, batch_format="pandas")))
    return span_delta_counts(old_flat, new_flat)


def q_funnel_timeout(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel view→click→purchase with a 1-hour per-step
    conversion timeout (next step must follow strictly after AND
    within the hour) — the timeout variant of the funnel chain."""
    from web2llmstxt_ray.ops.events import funnel

    return funnel(_t(sf_dir, "events",
                     ["user_id", "event_type", "ts"]),
                  steps=["view", "click", "purchase"],
                  within_seconds=3600)


def q_host_budget_allocation(sf_dir: str) -> pd.DataFrame:
    """Exact largest-remainder apportionment of a 1000-fetch crawl
    budget across document sources, weighted by corpus chars — the
    per-host fairness rule of a fixed-size fetch fleet; see
    :func:`ops.recrawl.budget_allocation`."""
    from web2llmstxt_ray.ops.recrawl import budget_allocation

    return budget_allocation(
        _t(sf_dir, "documents", ["source", "n_chars"]),
        "source", "n_chars", budget=1000)


def q_repeat_orders_7d(sf_dir: str) -> pd.DataFrame:
    """Temporal band self-join: per customer, ordered order pairs
    within a trailing 7-day band — counted via two searchsorted
    passes on a composite key·K+ts axis instead of the quadratic
    inequality join; see :func:`ops.windows.band_self_join_counts`."""
    from web2llmstxt_ray.ops.windows import band_self_join_counts

    out = band_self_join_counts(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
        "o_custkey", "o_orderdate", band_seconds=7 * 86_400)
    return out.rename(columns={"o_custkey": "c_custkey"})


def q_interleaved_corpus_prep(sf_dir: str) -> pd.DataFrame:
    """Flagship interleaved-corpus build, composed end-to-end as
    Datasets (no driver hop between stages): span docs → cross-doc
    span dedup FILTER (first occurrence wins, media kept) → nested
    regroup → re-chunk at width 96 → FFD pack into ≤1024-token
    interleaved training sequences. Rows-only driver check; the
    stage invariants (dedup uniqueness, text-concat equality, width
    bound, every doc packed exactly once, budget respected) are
    pytest-gated in tests/test_tail3.py and tests/test_nested.py."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, pack_interleaved,
        rechunk_spans, regroup_spans, span_dedup_filter)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    deduped = span_dedup_filter(
        explode_spans(build_span_docs(docs)))
    packed = pack_interleaved(
        rechunk_spans(regroup_spans(deduped), 96), max_tokens=1024,
        bucket_by_doc=16)
    out = _pdf(packed)
    out["doc_ids"] = out["doc_ids"].map(
        lambda v: ",".join(map(str, v)))
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("pack_id").reset_index(drop=True)


def q_part_kcore(sf_dir: str) -> pd.DataFrame:
    """3-core of the repeat co-purchase graph (part pairs sharing ≥2
    orders): iterative distributed degree peel — see
    :func:`ops.graph.k_core`. SQL twin (round-5 flip from rows-only):
    a recursive CTE replays the peel — each recursion step recomputes
    degrees over the previous iteration's edge set (DuckDB allows
    aggregation over the recursive reference through a nested CTE)
    and keeps edges whose endpoints both have degree ≥ k, guarded by
    EXISTS(degree < k) so the first STABLE edge set is the last one
    emitted. The guard makes the oracle exact for non-empty cores
    (this data); an empty core would need a sentinel row to keep the
    recursion observable — documented, not needed here."""
    from web2llmstxt_ray.ops.basket import _explode_pairs
    from web2llmstxt_ray.ops.graph import k_core
    from web2llmstxt_ray.ops.relational import partial_groupby
    from web2llmstxt_ray.ops.windows import _add_key_bucket

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        d = (group[["l_orderkey", "l_partkey"]].drop_duplicates()
             .sort_values(["l_orderkey", "l_partkey"], kind="stable"))
        a, b = _explode_pairs(d["l_orderkey"].to_numpy(),
                              d["l_partkey"].to_numpy())
        return (pd.DataFrame({"u": a, "v": b})
                .groupby(["u", "v"], as_index=False).size()
                .rename(columns={"size": "cnt"}))

    per = partial_groupby(
        _add_key_bucket(li, "l_orderkey", 64)
        .groupby("_sbucket").map_groups(pairs,
                                        batch_format="pandas"),
        ["u", "v"],
        lambda b: b.groupby(["u", "v"], as_index=False)["cnt"].sum(),
        ["cnt"], distributed_combine=True)
    strong = per.filter(expr="cnt >= 2") \
        .select_columns(["u", "v"])
    return k_core(strong, k=3)


def q_peak_concurrency(sf_dir: str) -> pd.DataFrame:
    """Capacity-planning sweep: maximum simultaneously-active
    sessions (30-min-gap sessionization, closed intervals) plus the
    session count — per-key interval build, time-bucketed ±1
    endpoint sweep, O(time-buckets) driver fold; see
    :func:`ops.windows.peak_concurrency`."""
    from web2llmstxt_ray.ops.windows import peak_concurrency

    return peak_concurrency(_t(sf_dir, "events", ["user_id", "ts"]))


def q_nation_share_of_region(sf_dir: str) -> pd.DataFrame:
    """Hierarchical share-of-parent report: each supplier nation's
    exact integer revenue and its share of its REGION's total — the
    two-level rollup shape. One set of per-nation partials feeds both
    levels (the region total is a driver fold over its nations);
    supplier→nation→region maps broadcast once. The share is a single
    float division of two exact integers, bit-comparable to SQL."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region",
             ["r_regionkey", "r_name"]).to_pandas()
    s2n = dict(zip(supp["s_suppkey"].astype(int),
                   supp["s_nationkey"].astype(int)))
    ref = ray.put(s2n)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        s2n = ray.get(ref)
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        disc = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype("int64")
        return pd.DataFrame({
            "nk": b["l_suppkey"].map(s2n).to_numpy(),
            "rev_i": cents * (100 - disc)})

    li = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    per = partial_groupby(
        li, ["nk"],
        lambda b: b.groupby("nk", as_index=False)["rev_i"].sum(),
        ["rev_i"])
    per["nk"] = per["nk"].astype(int)
    n2r = dict(zip(nat["n_nationkey"].astype(int),
                   nat["n_regionkey"].astype(int)))
    n2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    r2name = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))
    per["rk"] = per["nk"].map(n2r)
    region_tot = per.groupby("rk")["rev_i"].transform("sum")
    out = pd.DataFrame({
        "r_name": per["rk"].map(r2name),
        "n_name": per["nk"].map(n2name),
        "rev_i": per["rev_i"].astype("int64"),
        "share": per["rev_i"].to_numpy().astype("float64")
        / region_tot.to_numpy().astype("float64")})
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def q_qty_quantiles_disc(sf_dir: str) -> pd.DataFrame:
    """Exact grouped percentile_disc (p25/p50/p75 of quantity per
    return flag): smallest value whose cumulative count reaches
    ⌈q·n⌉, computed from the distributed per-(group, value) count
    histogram — no global sort; the driver picks from O(groups ×
    distinct-values) rows. SQL replay uses the same windowed
    cumulative rule."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "f": b["l_returnflag"].to_numpy(),
            "v": np.rint(b["l_quantity"].to_numpy()).astype("int64")})

    li = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]) \
        .map_batches(prep, batch_format="pandas", batch_size=None)
    cnt = partial_groupby(
        li, ["f", "v"],
        lambda b: b.groupby(["f", "v"], as_index=False)
        .agg(n=("v", "size")), ["n"])
    cnt = cnt.sort_values(["f", "v"]).reset_index(drop=True)
    cnt["cum"] = cnt.groupby("f")["n"].cumsum()
    tot = cnt.groupby("f")["n"].transform("sum")
    rows = []
    for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
        thr = np.ceil(q * tot.to_numpy())
        hit = cnt.loc[cnt["cum"].to_numpy() >= thr] \
            .groupby("f", as_index=False)["v"].first() \
            .rename(columns={"v": col})
        rows.append(hit)
    out = rows[0].merge(rows[1], on="f").merge(rows[2], on="f")
    out = out.rename(columns={"f": "l_returnflag"})
    for c in ("p25", "p50", "p75"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_ship_latency_hist(sf_dir: str) -> pd.DataFrame:
    """Order-fulfillment latency distribution: days from order date
    to the order's LAST shipment, bucketed into a day histogram.
    max(shipdate) is idempotent, so per-order partials pre-reduce
    block-locally and finish in ONE orderkey-hash bucket shuffle
    (never a driver fold — orderkey is high-cardinality); the
    order-date attach is a bucketed hash join; only the O(distinct
    latency-days) histogram partials reach the driver."""
    from web2llmstxt_ray.ops.relational import hash_join
    from web2llmstxt_ray.ops.windows import _add_key_bucket

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        us = (b["l_shipdate"].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        return (pd.DataFrame({"o_orderkey": b["l_orderkey"].to_numpy(),
                              "ship_us": us})
                .groupby("o_orderkey", as_index=False)["ship_us"]
                .max())

    last_ship = (_add_key_bucket(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pandas",
                     batch_size=None),
        "o_orderkey", 64)
        .groupby("_sbucket")
        .map_groups(lambda g: g.groupby("o_orderkey",
                                        as_index=False)
                    ["ship_us"].max(), batch_format="pandas")
        .materialize())

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        us = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
              .astype("int64"))
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "ord_us": us})

    ords = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pandas",
                     batch_size=None)
    j = hash_join(last_ship, ords, "o_orderkey")

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        days = ((b["ship_us"].to_numpy() - b["ord_us"].to_numpy())
                // 86_400_000_000).astype("int64")
        return (pd.DataFrame({"latency_days": days})
                .groupby("latency_days", as_index=False)
                .agg(n_orders=("latency_days", "size")))

    parts = j.map_batches(hist_partial, batch_format="pandas",
                          batch_size=None).to_pandas()
    out = (parts.groupby("latency_days", as_index=False)
           ["n_orders"].sum())
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("latency_days").reset_index(drop=True)


def q_part_sales_classes(sf_dir: str) -> pd.DataFrame:
    """Sales-frequency classification with the anti-join zero class:
    every part labeled by its lineitem count — 'never' (no sales:
    the LEFT-anti side, the part-table complement of the counted
    keys), 'slow' (<25), 'steady' (25-34), 'hot' (35+) — counted per
    class; empty classes are dropped, matching the SQL GROUP BY.
    Per-part counts pre-reduce in the partial combiner."""
    from web2llmstxt_ray.ops.relational import partial_groupby

    per = partial_groupby(
        _t(sf_dir, "lineitem", ["l_partkey"])
        .map_batches(lambda b: b.groupby("l_partkey", as_index=False)
                     .agg(n=("l_partkey", "size")),
                     batch_format="pandas", batch_size=None),
        ["l_partkey"],
        lambda b: b.groupby("l_partkey", as_index=False)["n"].sum(),
        ["n"])
    n_parts = int(_t(sf_dir, "part", ["p_partkey"]).count())
    sold = per["n"].to_numpy()
    classes = {
        "never": n_parts - len(per),
        "slow": int((sold < 25).sum()),
        "steady": int(((sold >= 25) & (sold < 35)).sum()),
        "hot": int((sold >= 35).sum()),
    }
    out = pd.DataFrame({"sales_class": list(classes.keys()),
                        "n_parts": list(classes.values())})
    out = out.loc[out["n_parts"] > 0].copy()
    out["n_parts"] = out["n_parts"].astype("int64")
    return out.sort_values("sales_class").reset_index(drop=True)


def q_span_render_text(sf_dir: str) -> pd.DataFrame:
    """Text-only LM projection of the interleaved corpus: per doc,
    spans concatenated in order with media spans replaced by the
    '<image>' placeholder token — map-only; string_agg SQL replay.
    See :func:`ops.nested.render_text_with_media_tokens`."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, render_text_with_media_tokens)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = _pdf(render_text_with_media_tokens(
        explode_spans(build_span_docs(docs))))
    return out.sort_values("doc_id").reset_index(drop=True)


def q_user_value_twap(sf_dir: str) -> pd.DataFrame:
    """Duration-weighted average event value per user (TWAP): exact
    integer µs·cents numerator/denominator via a grouped LEAD, one
    float division — see :func:`ops.windows.time_weighted_average`."""
    from web2llmstxt_ray.ops.windows import time_weighted_average

    return time_weighted_average(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]))


def q_crawl_new_tokens(sf_dir: str) -> pd.DataFrame:
    """Token-level novelty between two crawls: distinct lowercased
    words present in the simulated re-crawl (same deterministic
    transformation as ``crawl_delta``) but absent from the base
    crawl — the vocabulary-drift complement of the span-level delta,
    via the distributed EXCEPT machinery (block-local dedup before
    the single bucket shuffle; ``relational.set_op``)."""
    from web2llmstxt_ray.ops.relational import set_op

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def base_tokens(b: pd.DataFrame) -> pd.DataFrame:
        toks = (b["text"].str.lower()
                .str.findall(r"[a-z]+").explode().dropna())
        return pd.DataFrame({"token": toks.unique()})

    def recrawl_tokens(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64").to_numpy()
        t = b["text"].copy()
        t = t.mask(did % 5 == 0, t.str.upper())
        t = t.mask(did % 7 == 0, t + " updated content marker")
        toks = t.str.lower().str.findall(r"[a-z]+").explode().dropna()
        return pd.DataFrame({"token": toks.unique()})

    new = docs.map_batches(recrawl_tokens, batch_format="pandas",
                           batch_size=None)
    old = docs.map_batches(base_tokens, batch_format="pandas",
                           batch_size=None)
    out = set_op(new, old, "token", "except").to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def q_weekly_active_users(sf_dir: str) -> pd.DataFrame:
    """Rolling 7-day distinct active users per event day (the WAU
    dashboard metric): exact windowed COUNT(DISTINCT) without a
    day×events band join — one hash(user) bucket shuffle of the
    deduped (user, day) pairs, a vectorized window explode, and
    additive per-day partials; see
    :func:`ops.windows.rolling_active_users`."""
    from web2llmstxt_ray.ops.windows import rolling_active_users

    return rolling_active_users(
        _t(sf_dir, "events", ["user_id", "ts"]), window_days=7)


def q_value_cusum(sf_dir: str) -> pd.DataFrame:
    """Per-user one-sided CUSUM drift detector (k=$60, h=$250): the
    sequential max(0, s+(x−k)) recurrence via its exact prefix-sum −
    running-min closed form, integer cents throughout, one bucket
    shuffle — see :func:`ops.windows.cusum_stats`."""
    from web2llmstxt_ray.ops.windows import cusum_stats

    return cusum_stats(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        k_cents=6000, h_cents=25000)


def q_doclen_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-language robust length outliers: docs whose |n_chars −
    median| exceeds 2·MAD, with the median and MAD exact discrete
    quantiles derived from ONE per-(lang, value) count histogram —
    see :func:`ops.stats.grouped_median_mad_outliers`."""
    from web2llmstxt_ray.ops.stats import grouped_median_mad_outliers

    return grouped_median_mad_outliers(
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        "lang", "n_chars", "doc_id", thresh=2.0)


def q_price_decile_counts(sf_dir: str) -> pd.DataFrame:
    """Equi-depth decile bucketizer over extendedprice cents: fit 9
    exact discrete-quantile boundaries from the distributed value
    histogram, broadcast them into a vectorized searchsorted
    transform, count rows per bucket (ties land low) — see
    :func:`ops.stats.equi_depth_bucket_counts`."""
    from web2llmstxt_ray.ops.stats import equi_depth_bucket_counts

    cents = _t(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda b: pd.DataFrame(
            {"c": np.rint(b["l_extendedprice"].to_numpy() * 100)
             .astype("int64")}),
        batch_format="pandas", batch_size=None)
    return equi_depth_bucket_counts(cents, "c", num_buckets=10)


def q_kwic_merge(sf_dir: str) -> pd.DataFrame:
    """Keyword-in-context concordance for the token 'merge' (±3 words
    under single-space tokenization, 1-based positions) — map-only
    grouped-shift context assembly, replayed by a LATERAL
    list-slicing oracle; see :func:`ops.retrieval.kwic_contexts`."""
    from web2llmstxt_ray.ops.retrieval import kwic_contexts

    out = kwic_contexts(_t(sf_dir, "documents", ["doc_id", "text"]),
                        "merge", window=3).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def _dup_union(sf_dir: str) -> rd.Dataset:
    """Deterministic duplicate-bearing corpus for the cluster ops: the
    documents table UNION a shifted copy (doc_id + 10000) whose text is
    IDENTICAL for even source ids (an exact duplicate pair) and
    perturbed for odd ids (unique). quality = n_chars + 1 on copies, so
    best-quality dedup must pick the copy inside each duplicate pair."""
    docs = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def orig(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "text": b["text"],
                             "quality": b["n_chars"].astype("int64")})

    def copy(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64")
        t = b["text"].where(did % 2 == 0, b["text"] + " odd variant")
        return pd.DataFrame({"doc_id": did + 10000, "text": t,
                             "quality": (b["n_chars"] + 1)
                             .astype("int64")})

    return (docs.map_batches(orig, batch_format="pandas",
                             batch_size=None)
            .union(docs.map_batches(copy, batch_format="pandas",
                                    batch_size=None)))


def q_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """Directed word-trigram containment near-dup pairs (τ=0.2):
    |grams(a)∩grams(b)|/|grams(a)| — the asymmetric quote/subset
    relation Jaccard misses; gram-bucketed shuffle + skinny pair
    combine, see :func:`ops.dedup.containment_pairs`."""
    from web2llmstxt_ray.ops.dedup import containment_pairs

    out = containment_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]),
        n=3, tau=0.2).to_pandas()
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    out["inter"] = out["inter"].astype("int64")
    out["a_total"] = out["a_total"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_exact_dedup_best(sf_dir: str) -> pd.DataFrame:
    """Quality-aware exact dedup over the deterministic duplicate
    union: per distinct text keep the highest-quality copy (ties →
    lowest id) — only (hash, quality, id) triples shuffle; see
    :func:`ops.dedup.exact_dedup_best`."""
    from web2llmstxt_ray.ops.dedup import exact_dedup_best

    return exact_dedup_best(_dup_union(sf_dir), "quality")


def q_exact_dedup_losers(sf_dir: str) -> pd.DataFrame:
    """LOSER ids of exact dedup over the deterministic duplicate
    union — the scale-preferred delivery tier when the input is
    re-readable: only skinny (content_hash, id) pairs shuffle and the
    O(duplicates) loser-id set comes back for a map-only
    broadcast/anti-join filter (corpus-prep stage 1 runs exactly this
    shape) — see :func:`ops.dedup.exact_dedup_losers`."""
    from web2llmstxt_ray.ops.dedup import exact_dedup_losers

    u = _dup_union(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    out = exact_dedup_losers(u).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_leakage_split(sf_dir: str) -> pd.DataFrame:
    """Duplicate-cluster-aware train/test split over the same union:
    every exact copy of a text lands on one side (md5 of the cluster
    root id), so duplicates can never straddle the split — see
    :func:`ops.corpus.leakage_safe_split`."""
    from web2llmstxt_ray.ops.corpus import leakage_safe_split

    out = leakage_safe_split(_dup_union(sf_dir)).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_span_truncate(sf_dir: str) -> pd.DataFrame:
    """Context-budget prefix truncation of the interleaved span
    stream (200 chars, media spans cost 16): per doc the kept-prefix
    span/char/media counts via one grouped cumsum — see
    :func:`ops.nested.span_truncate_stats`."""
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_truncate_stats)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = span_truncate_stats(
        explode_spans(build_span_docs(docs)),
        budget=200, media_chars=16).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_signature_terms(sf_dir: str) -> pd.DataFrame:
    """Source-distinctive vocabulary: (token, source) cells whose
    observed count exceeds 5/4× the independence expectation (exact
    integer cross-multiply, support ≥ 5) — the crawl-source signature
    monitor; see :func:`ops.textstats.source_signature_terms`."""
    from web2llmstxt_ray.ops.textstats import source_signature_terms

    return source_signature_terms(
        _t(sf_dir, "documents", ["source", "text"]),
        min_count=5, ratio_num=5, ratio_den=4)


def q_centroid_cosine(sf_dir: str) -> pd.DataFrame:
    """Class-separation matrix: pairwise cosine between per-label mean
    embeddings, from the same O(blocks × labels) sum-vector partials
    as label_centroids — vectors never shuffle; see
    :func:`ops.ann.centroid_cosine_matrix`."""
    from web2llmstxt_ray.ops.ann import centroid_cosine_matrix

    return centroid_cosine_matrix(
        _t(sf_dir, "embeddings", ["label", "embedding"]))


def q_interarrival_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-arrival burstiness: exact integer whole-second
    gaps, per-key moment sums in one bucket shuffle, cv = std/mean
    (Poisson ≈ 1) — see :func:`ops.windows.interarrival_stats`."""
    from web2llmstxt_ray.ops.windows import interarrival_stats

    return interarrival_stats(
        _t(sf_dir, "events", ["event_id", "user_id", "ts"]))


def q_benford_orders(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals (cents): map-only
    digit count partials, χ² terms from exact integer counts — see
    :func:`ops.stats.benford_digit_counts`."""
    from web2llmstxt_ray.ops.stats import benford_digit_counts

    cents = _t(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {"c": np.rint(b["o_totalprice"].to_numpy() * 100)
             .astype("int64")}),
        batch_format="pandas", batch_size=None)
    return benford_digit_counts(cents, "c")


def q_open_orders_daily(sf_dir: str) -> pd.DataFrame:
    """Order backlog over time: per calendar day, orders whose
    [orderdate, last shipdate] interval covers it — per-order max
    pre-reduced block-locally + one orderkey bucket shuffle, the date
    attach a bucketed hash join, then the ±1 endpoint-delta fold of
    :func:`ops.windows.daily_open_counts` (O(distinct days) partials,
    one driver cumsum — never a days×orders stabbing join)."""
    from web2llmstxt_ray.ops.relational import hash_join
    from web2llmstxt_ray.ops.windows import (_add_key_bucket,
                                             daily_open_counts)

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"o_orderkey": b["l_orderkey"].to_numpy(),
                              "close": b["l_shipdate"].to_numpy()})
                .groupby("o_orderkey", as_index=False)["close"].max())

    closes = (_add_key_bucket(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pandas", batch_size=None),
        "o_orderkey", 64)
        .groupby("_sbucket")
        .map_groups(lambda g: g.groupby("o_orderkey", as_index=False)
                    ["close"].max(), batch_format="pandas")
        .materialize())
    iv = hash_join(_t(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
                   closes, on="o_orderkey")
    return daily_open_counts(iv, "o_orderdate", "close")


def q_events_asof_tol(sf_dir: str) -> pd.DataFrame:
    """As-of join with a staleness tolerance: each purchase gets the
    latest same-user view at or before it ONLY if within 1 hour (else
    NaT) — the bounded-staleness attach; merge_asof tolerance inside
    the bucketed shuffle, see :func:`ops.joins.asof_join`."""
    from web2llmstxt_ray.ops.joins import asof_join

    out = _pdf(asof_join(_events_of(sf_dir, "purchase"),
                         _events_of(sf_dir, "view"),
                         tolerance_s=3600))
    return out[["event_id", "user_id", "ts", "prior_ts"]]


def q_user_rate_peaks(sf_dir: str) -> pd.DataFrame:
    """Per-user peak trailing-60s event count — the rate-limit /
    politeness-violation audit, O(rows) via two searchsorted probes
    per event on the composite key·K+ts axis; see
    :func:`ops.windows.trailing_peak_counts`."""
    from web2llmstxt_ray.ops.windows import trailing_peak_counts

    return trailing_peak_counts(
        _t(sf_dir, "events", ["user_id", "ts"]), window_s=60)


def q_user_value_locf(sf_dir: str) -> pd.DataFrame:
    """Gap-filled daily value series per user (last observation
    carried forward over each user's active span): one bucket
    shuffle, vectorized day-grid explode, ALL keys filled by a single
    merge_asof — see :func:`ops.windows.locf_daily`."""
    from web2llmstxt_ray.ops.windows import locf_daily

    return locf_daily(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]))


def q_politeness_schedule(sf_dir: str) -> pd.DataFrame:
    """Per-request queueing delay under a 5 s per-host politeness
    spacing (requests = events, host = user): the sequential max-plus
    recurrence via its exact closed form ``rn·d + running_max(arrival
    − rn·d)`` — one bucket shuffle, grouped cummax, exact int64 µs.
    See :func:`ops.windows.politeness_schedule`."""
    from web2llmstxt_ray.ops.windows import politeness_schedule

    return politeness_schedule(
        _t(sf_dir, "events", ["event_id", "user_id", "ts"]), delay_s=5)


def q_daily_ohlc(sf_dir: str) -> pd.DataFrame:
    """Per (user, day) open/high/low/close candles in exact integer
    cents — a true two-phase partial aggregate (argmin/argmax by the
    (ts, id) order key are associative): raw events never shuffle,
    only O(keys·days) candle partials do. See
    :func:`ops.windows.daily_ohlc`."""
    from web2llmstxt_ray.ops.windows import daily_ohlc

    return daily_ohlc(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]))


def q_priority_gini(sf_dir: str) -> pd.DataFrame:
    """Exact Gini concentration of order totals per priority class
    (per-block value-count partials, one group-hash bucket shuffle,
    Python-int rank-block folds — one float division at the end). See
    :func:`ops.stats.grouped_gini`."""
    from web2llmstxt_ray.ops.stats import grouped_gini

    return grouped_gini(
        _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        "o_orderpriority", "o_totalprice")


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law OLS fit over the corpus top-500 token frequencies
    (token-hash bucketed exact histogram top-k, O(k) driver fit with
    fsum). See :func:`ops.corpus.zipf_fit`."""
    from web2llmstxt_ray.ops.corpus import zipf_fit

    return zipf_fit(_t(sf_dir, "documents", ["text"]), k=500)


def q_part_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities over the supplier→part bipartite graph
    from lineitem (the link-authority primitive of a crawl graph) —
    integer fixed-point power iteration, bit-identical at any
    partitioning. SQL twin (round-5 flip from rows-only): the 3
    iterations unroll into 6 chained CTE half-steps — HUGEINT
    contribution sums + the exact integer rescale s·scale // max(s)
    reproduce the engine's arithmetic EXACTLY (that is the point of
    fixed-point scores: no float order-dependence to excuse). Also
    sequential-replay-verified in tests/test_graph.py. See
    :func:`ops.graph.hits_bipartite`."""
    from web2llmstxt_ray.ops.graph import hits_bipartite

    edges = _t(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    return hits_bipartite(edges, iters=3, src_col="l_suppkey",
                          dst_col="l_partkey")


def q_complete_users(sf_dir: str) -> pd.DataFrame:
    """Relational division: users who triggered EVERY distinct event
    type (distinct-pair partials, one bucket combine, the divisor is
    a single driver scalar). See
    :func:`ops.relational.relational_division`."""
    from web2llmstxt_ray.ops.relational import relational_division

    return relational_division(
        _t(sf_dir, "events", ["user_id", "event_type"]),
        "user_id", "event_type")


def q_decayed_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially time-decayed value sum (half-life 6 h,
    referenced to the corpus max timestamp) — recency-weighted
    engagement with NO shuffle: an O(1) global max then map-only
    additive partials. See :func:`ops.windows.decayed_value_sum`."""
    from web2llmstxt_ray.ops.windows import decayed_value_sum

    return decayed_value_sum(
        _t(sf_dir, "events", ["user_id", "ts", "value"]),
        half_life_s=21600.0)


def q_doc_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch-style reading ease per document from exact integer
    regex-run counts (words / sentence marks / vowel groups) —
    map-only, hash-exact vs the regexp_extract_all SQL replay. See
    :func:`ops.textstats.readability_scores`."""
    from web2llmstxt_ray.ops.textstats import readability_scores

    return readability_scores(
        _t(sf_dir, "documents", ["doc_id", "text"])).to_pandas()


def q_label_silhouette(sf_dir: str) -> pd.DataFrame:
    """Simplified centroid silhouette per embedding label (cluster
    separation QA: broadcast 12-decimal centroids, map-only direct
    (X−c)² distances, O(blocks×labels) partials). See
    :func:`ops.ann.centroid_silhouette`."""
    from web2llmstxt_ray.ops.ann import centroid_silhouette

    return centroid_silhouette(
        _t(sf_dir, "embeddings", ["label", "embedding"]))


def _co_purchase_pairs(sf_dir: str) -> rd.Dataset:
    """Part co-purchase edge list (parts sharing an order), generated
    distributed: bucket by orderkey, per-group vectorized self-merge."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_gb"] = (b["l_orderkey"].to_numpy() % 32).astype("int32")
        return b

    def co_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["l_orderkey", "l_partkey"]]
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"u": m["l_partkey_x"].to_numpy(),
                             "v": m["l_partkey_y"].to_numpy()})

    return (li.map_batches(add_bucket, batch_format="pandas",
                           batch_size=None)
            .groupby("_gb").map_groups(co_pairs, batch_format="pandas"))


def q_mutual_top1(sf_dir: str) -> pd.DataFrame:
    """Reciprocal nearest-neighbor pairs over the embedding corpus —
    the high-precision alignment/dedup seed set. Exact integer dot
    products (2^15 quantization), ties to the lower id, hub-free
    block-pair GEMMs; bit-identical at any partitioning and replayed
    integer-for-integer by the SQL twin. See
    :func:`ops.ann.mutual_top1_pairs`."""
    from web2llmstxt_ray.ops.ann import mutual_top1_pairs

    return mutual_top1_pairs(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_graph_assortativity(sf_dir: str) -> pd.DataFrame:
    """Newman degree-assortativity of the part co-purchase graph (the
    hub-connectivity QA of a link graph): exact integer co-moment sums
    over the directed stub list, one float division — the SQL twin
    divides the identical HUGEINT pair. See
    :func:`ops.graph.degree_assortativity`."""
    from web2llmstxt_ray.ops.graph import degree_assortativity

    return degree_assortativity(_co_purchase_pairs(sf_dir),
                                num_buckets=32)


def q_local_clustering(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    part co-purchase graph (spam-farm / link-ring density profile):
    degree-ordered wedges carry their center so each closed wedge
    credits all three corners; O(sqrt(m)) per-node wedge volume
    regardless of hub skew. See :func:`ops.graph.local_clustering`."""
    from web2llmstxt_ray.ops.graph import local_clustering

    return local_clustering(_co_purchase_pairs(sf_dir), num_buckets=32)


def q_late_events(sf_dir: str) -> pd.DataFrame:
    """Per-user late-arrival audit (streaming-watermark QA): events
    arrive in a deterministic pseudo-random permutation of event_id
    (the testdata's event time is monotone in event_id, so the
    permutation models network reordering); an event is late when its
    event-time trails the running per-user watermark. Exact int64 µs.
    See :func:`ops.windows.out_of_order_stats`."""
    from web2llmstxt_ray.ops.windows import out_of_order_stats

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def arrival(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arr = (eid * 48271) % 100003 * 10_000_000_000 + eid
        return pa.table({"arrival_id": pa.array(arr, pa.int64()),
                         "user_id": b.column("user_id"),
                         "ts": b.column("ts")})

    return out_of_order_stats(
        ev.map_batches(arrival, batch_format="pyarrow"),
        id_col="arrival_id")


def q_adamic_adar(sf_dir: str) -> pd.DataFrame:
    """Top-1000 Adamic–Adar link predictions over the part co-purchase
    graph (which parts SHOULD co-occur but don't — the related-content
    / crawl-seed-expansion signal). Ranked by the all-integer
    (common_neighbors DESC, a, b) key so the selected set is
    deterministic; the float score is payload. See
    :func:`ops.graph.adamic_adar_topk`."""
    from web2llmstxt_ray.ops.graph import adamic_adar_topk

    return adamic_adar_topk(_co_purchase_pairs(sf_dir), top_n=1000)


def q_degree_powerlaw(sf_dir: str) -> pd.DataFrame:
    """Hill MLE of the co-purchase degree-distribution power-law tail
    exponent (the scale-free-ness QA of a link graph): one row
    (d_min, n_tail, sum_ln, alpha) from O(blocks) partials. See
    :func:`ops.graph.degree_powerlaw`."""
    from web2llmstxt_ray.ops.graph import degree_powerlaw

    return degree_powerlaw(_co_purchase_pairs(sf_dir), d_min=5)


def q_basket_pairs(sf_dir: str) -> pd.DataFrame:
    """Order pairs sharing ≥2 distinct parts with exact intersection
    counts and Jaccard — the integer set-similarity self-join
    (co-basket mining / entity-set near-dup). See
    :func:`ops.dedup.basket_similarity_pairs`."""
    from web2llmstxt_ray.ops.dedup import basket_similarity_pairs

    return basket_similarity_pairs(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        set_col="l_orderkey", elem_col="l_partkey", min_common=2)


def q_daily_acf(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7
    (the weekly-seasonality probe behind recrawl cadence): exact
    Python-int moment expansion so the single float division is
    bit-identical to the HUGEINT SQL replay. See
    :func:`ops.windows.daily_acf`."""
    from web2llmstxt_ray.ops.windows import daily_acf

    return daily_acf(_t(sf_dir, "events", ["ts"]), max_lag=7)


def q_ppr_promo(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank (3 damped integer fixed-point iterations)
    over the order→part bipartite graph, restart mass pinned to the
    PROMO-part seed set — topic-sensitive crawl prioritization around
    a trusted seed list (Haveliwala WWW'02). Bit-exact vs the unrolled
    SQL replay, like :func:`q_pagerank`. Seeds are the small dimension
    side, collected once and closure-shipped."""
    from web2llmstxt_ray.ops.graph import pagerank

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = _t(sf_dir, "part", ["p_partkey", "p_type"])
    def promo_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.equal(t.column("p_type"), "PROMO")) \
            .select(["p_partkey"])

    seed_pd = part.map_batches(promo_keys,
                               batch_format="pyarrow").to_pandas()
    seed_ids = (seed_pd["p_partkey"].to_numpy("int64") * 2 + 1).tolist()

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "src": _pc.multiply(batch.column("l_orderkey"), 2),
            "dst": _pc.add(
                _pc.multiply(batch.column("l_partkey"), 2), 1),
        })

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return pagerank(edges, iters=3, seeds=seed_ids).to_pandas()


def q_assoc_rules(sf_dir: str) -> pd.DataFrame:
    """Pairwise association rules (support/confidence/lift) over
    (user, calendar-day) activity baskets — market-basket mining with
    every ratio an exact int/int division. See
    :func:`ops.events.association_rules`."""
    from web2llmstxt_ray.ops.events import association_rules

    return association_rules(
        _t(sf_dir, "events", ["user_id", "ts", "event_type"]))


def q_session_entry_exit(sf_dir: str) -> pd.DataFrame:
    """Entry→exit event-type matrix over 30-minute-gap sessions (the
    landing/exit-page distribution), ties on ts broken by event_id.
    See :func:`ops.events.session_entry_exit`."""
    from web2llmstxt_ray.ops.events import session_entry_exit

    return session_entry_exit(
        _t(sf_dir, "events",
           ["user_id", "ts", "event_id", "event_type"]))


def q_ttr_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical diversity (tokens, distinct types, type-token
    ratio) — the boilerplate-vs-organic screen. Tokenization replays
    the SQL twin exactly. See :func:`ops.textstats.type_token_ratio`."""
    from web2llmstxt_ray.ops.textstats import type_token_ratio

    return type_token_ratio(_t(sf_dir, "documents", ["source", "text"]))


def q_sssp_hops(sf_dir: str) -> pd.DataFrame:
    """Bounded Bellman-Ford shortest distances (4 relaxation rounds,
    int64 add/min — bit-exact vs the unrolled SQL) over the UNDIRECTED
    order↔part graph weighted by l_linenumber, from the minimum order
    node — the crawl-latency distance map from a seed host. See
    :func:`ops.graph.sssp_hops`."""
    from web2llmstxt_ray.ops.graph import sssp_hops

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_linenumber"])

    def to_edges(batch: pa.Table) -> pa.Table:
        o = batch.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64) * 2
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64) * 2 + 1
        w = batch.column("l_linenumber") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([o, p]), pa.int64()),
            "dst": pa.array(np.concatenate([p, o]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64()),
        })

    seed = int(li.min("l_orderkey")) * 2
    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return sssp_hops(edges, seed=seed, hops=4)


def q_two_hop_reach(sf_dir: str) -> pd.DataFrame:
    """Per-node distance-exactly-2 neighborhood size over the part
    co-purchase graph (the next-wave frontier-growth estimate). See
    :func:`ops.graph.two_hop_reach`."""
    from web2llmstxt_ray.ops.graph import two_hop_reach

    return two_hop_reach(_co_purchase_pairs(sf_dir), num_buckets=32)


def q_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Per-document out-of-vocabulary rate vs the corpus top-500
    token vocabulary (tokenizer-coverage QA): broadcast vocab set,
    map-only exact counts. See :func:`ops.corpus.oov_rate`."""
    from web2llmstxt_ray.ops.corpus import oov_rate

    return oov_rate(_t(sf_dir, "documents", ["doc_id", "text"]),
                    vocab_k=500)


def q_token_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy + perplexity of the corpus unigram token
    distribution (vocabulary-diversity gauge): additive (Σc, V,
    Σ c·ln c) partials per token-hash bucket. See
    :func:`ops.corpus.token_entropy`."""
    from web2llmstxt_ray.ops.corpus import token_entropy

    return token_entropy(_t(sf_dir, "documents", ["text"]))


def q_km_repeat(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival of days-to-repeat-purchase per user,
    right-censored at the corpus horizon — the retention estimator a
    recrawl scheduler reads. Exact integer day histogram; the KM
    product folds as exp(Σ ln(1−dᵢ/nᵢ)) term-for-term with the SQL
    twin. See :func:`ops.events.km_survival`."""
    from web2llmstxt_ray.ops.events import km_survival

    return km_survival(
        _t(sf_dir, "events", ["user_id", "ts", "event_type"]),
        event_value="purchase")


def q_part_communities(sf_dir: str) -> pd.DataFrame:
    """Synchronous label-propagation communities (4 Jacobi rounds,
    majority label, ties → smallest) over the part co-purchase graph.
    Deterministic at any partitioning BY DESIGN (Jacobi schedule, not
    the order-dependent async one) — which makes it SQL-replayable:
    the round-5 oracle unrolls the 4 rounds into chained CTEs, each a
    neighbor-label vote count + QUALIFY row_number (count DESC, label
    ASC) top-1. Also sequential-replay-verified in tests. See
    :func:`ops.graph.label_propagation`."""
    from web2llmstxt_ray.ops.graph import label_propagation

    return label_propagation(_co_purchase_pairs(sf_dir), rounds=4,
                             num_buckets=32)


def q_source_cosine(sf_dir: str) -> pd.DataFrame:
    """Pairwise cosine similarity between sources' token-count vectors
    (lexical mirror/syndication detector): additive per-bucket Gram
    partials, exact integer dots. See
    :func:`ops.textstats.source_cosine_pairs`."""
    from web2llmstxt_ray.ops.textstats import source_cosine_pairs

    return source_cosine_pairs(
        _t(sf_dir, "documents", ["source", "text"]))


def q_price_power_means(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag geometric/harmonic/quadratic means of the
    extended price — the skew-robust mean family from additive
    (Σ ln, Σ 1/x, Σ x²) partials. See
    :func:`ops.stats.grouped_power_means`."""
    from web2llmstxt_ray.ops.stats import grouped_power_means

    return grouped_power_means(
        _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]),
        "l_returnflag", "l_extendedprice")


def q_lang_emd(sf_dir: str) -> pd.DataFrame:
    """Exact pairwise Wasserstein-1 (earth-mover) distance between
    languages' document-length distributions — bin-free drift that
    respects the value metric, numerator folded in exact Python ints.
    See :func:`ops.stats.grouped_emd_pairs`."""
    from web2llmstxt_ray.ops.stats import grouped_emd_pairs

    return grouped_emd_pairs(
        _t(sf_dir, "documents", ["lang", "n_chars"]),
        "lang", "n_chars")


def q_value_auc(sf_dir: str) -> pd.DataFrame:
    """Exact tie-corrected ROC-AUC of the event value as a predictor
    of the purchase label (Mann-Whitney U from the value histogram —
    2U folds in exact ints). See :func:`ops.stats.binary_auc`."""
    from web2llmstxt_ray.ops.stats import binary_auc

    ev = _t(sf_dir, "events", ["value", "event_type"])

    def mask(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "value": b.column("value"),
            "is_pos": _pc.cast(
                _pc.equal(b.column("event_type"), "purchase"),
                pa.int64()),
        })

    return binary_auc(ev.map_batches(mask, batch_format="pyarrow"),
                      score_col="value", positive_mask_col="is_pos")


def q_gap_expfit(sf_dir: str) -> pd.DataFrame:
    """Poisson-arrival QA: MLE exponential fit to the pooled per-user
    inter-event gaps plus the one-sample KS distance against the fit
    — large D means bursty/scheduled traffic, not Poisson. See
    :func:`ops.windows.gap_expfit_ks`."""
    from web2llmstxt_ray.ops.windows import gap_expfit_ks

    return gap_expfit_ks(
        _t(sf_dir, "events", ["user_id", "ts", "event_id"]))


def q_hrw_shards(sf_dir: str) -> pd.DataFrame:
    """Rendezvous-hash shard assignment audit over customer keys: the
    stateless consistent-placement rule (argmax md5(key|shard)) a
    frontier uses to pin hosts to shards, with the per-shard balance
    histogram. md5 rule replayed verbatim in SQL. See
    :func:`ops.layout.hrw_assignment`."""
    from web2llmstxt_ray.ops.layout import hrw_assignment

    return hrw_assignment(_t(sf_dir, "customer", ["c_name"]),
                          key_col="c_name", num_shards=8)


def q_dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source exact-duplicate exposure (share of docs whose text
    occurs >1 time corpus-wide) — the syndication scoreboard. Only
    (hash, source) pairs shuffle. See
    :func:`ops.dedup.dup_rate_by_group`."""
    from web2llmstxt_ray.ops.dedup import dup_rate_by_group

    return dup_rate_by_group(
        _t(sf_dir, "documents", ["source", "text"]))


def q_heaps_curve(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve (cumulative tokens vs
    cumulative distinct tokens in doc_id order) — the does-more-data-
    still-buy-vocabulary diagnostic. See
    :func:`ops.corpus.heaps_curve`."""
    from web2llmstxt_ray.ops.corpus import heaps_curve

    return heaps_curve(_t(sf_dir, "documents", ["doc_id", "text"]))


def q_batch_novelty(sf_dir: str) -> pd.DataFrame:
    """Crawl-batch novelty curve (fraction of each 100-doc id batch
    whose text is first seen there) — the stop-recrawling signal.
    See :func:`ops.dedup.batch_novelty`."""
    from web2llmstxt_ray.ops.dedup import batch_novelty

    return batch_novelty(_t(sf_dir, "documents", ["doc_id", "text"]),
                         batch_size_ids=100)


def q_event_trigrams(sf_dir: str) -> pd.DataFrame:
    """Top-25 three-event behavior sequences per user in (ts, id)
    order — path mining one step deeper than the transition matrix.
    See :func:`ops.events.top_event_trigrams`."""
    from web2llmstxt_ray.ops.events import top_event_trigrams

    return top_event_trigrams(
        _t(sf_dir, "events",
           ["user_id", "ts", "event_id", "event_type"]), k=25)


def q_demand_classes(sf_dir: str) -> pd.DataFrame:
    """Syntetos-Boylan demand classification per part (smooth /
    intermittent / erratic / lumpy from ADI and CV² of per-ship-day
    quantities) — class boundaries are exact integer comparisons, so
    no float rounding can flip a class. See
    :func:`ops.stats.demand_classification`."""
    from web2llmstxt_ray.ops.stats import demand_classification

    return demand_classification(
        _t(sf_dir, "lineitem",
           ["l_partkey", "l_shipdate", "l_quantity"]),
        key_col="l_partkey", ts_col="l_shipdate",
        qty_col="l_quantity")


def _bag_union(sf_dir: str) -> rd.Dataset:
    """Deterministic bag-duplicate corpus: the documents table UNION a
    shifted copy (doc_id + 10000) whose TOKEN ORDER is reversed for
    even ids (a bag duplicate that is NOT an exact-text duplicate) and
    whose text gains ' odd variant' for odd ids (a genuinely new
    bag)."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def copy(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64")
        rev = b["text"].map(lambda t: " ".join(
            reversed((t if t is not None else "")
                     .strip().lower().split())))
        t = rev.where(did % 2 == 0, b["text"] + " odd variant")
        return pd.DataFrame({"doc_id": did + 10000, "text": t})

    return docs.union(docs.map_batches(copy, batch_format="pandas",
                                       batch_size=None))


def q_bag_dedup(sf_dir: str) -> pd.DataFrame:
    """Order-insensitive exact dedup over the deterministic
    bag-duplicate union: token-permuted copies collapse (min id wins)
    even though their bytes differ. See :func:`ops.dedup.bag_dedup`."""
    from web2llmstxt_ray.ops.dedup import bag_dedup

    return bag_dedup(_bag_union(sf_dir))


def q_dup_cluster_hist(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate cluster-size histogram over the deterministic
    duplicate union — the how-duplicated-is-this-crawl gauge that
    sizes the dedup win. See :func:`ops.dedup.dup_cluster_hist`."""
    from web2llmstxt_ray.ops.dedup import dup_cluster_hist

    return dup_cluster_hist(_dup_union(sf_dir))


def q_value_calibration(sf_dir: str) -> pd.DataFrame:
    """Reliability-diagram table of the event value as a purchase
    predictor (10 equal-width cent bins, exact integer bin rule) —
    the calibration companion to value_auc. See
    :func:`ops.stats.calibration_bins`."""
    from web2llmstxt_ray.ops.stats import calibration_bins

    ev = _t(sf_dir, "events", ["value", "event_type"])

    def mask(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "value": b.column("value"),
            "is_pos": _pc.cast(
                _pc.equal(b.column("event_type"), "purchase"),
                pa.int64()),
        })

    return calibration_bins(
        ev.map_batches(mask, batch_format="pyarrow"),
        score_col="value", positive_mask_col="is_pos", n_bins=10)


def q_bounce_rate(sf_dir: str) -> pd.DataFrame:
    """Bounce rate by landing event type over 30-min-gap sessions
    (share of single-event sessions) — see
    :func:`ops.events.session_bounce_by_entry`."""
    from web2llmstxt_ray.ops.events import session_bounce_by_entry

    return session_bounce_by_entry(
        _t(sf_dir, "events",
           ["user_id", "ts", "event_id", "event_type"]))


def q_lsh_buckets(sf_dir: str) -> pd.DataFrame:
    """Random-hyperplane LSH bucket occupancy over the embedding
    corpus (8 md5-derived integer hyperplanes × quantized integer
    dots — no float can flip a bit) — the bucket-balance pre-flight
    for a signed-projection shuffle. See
    :func:`ops.ann.lsh_bucket_balance`."""
    from web2llmstxt_ray.ops.ann import lsh_bucket_balance

    return lsh_bucket_balance(
        _t(sf_dir, "embeddings", ["embedding"]), n_planes=8)


def q_next_event_pred(sf_dir: str) -> pd.DataFrame:
    """Behavior predictability ceiling: modal next event type per
    current type and the accuracy of the ML bigram model on the
    corpus transitions. See :func:`ops.events.next_event_accuracy`."""
    from web2llmstxt_ray.ops.events import next_event_accuracy

    return next_event_accuracy(
        _t(sf_dir, "events",
           ["user_id", "ts", "event_id", "event_type"]))


def q_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation of customers over their orders (recency /
    frequency / monetary quintile scores from the exact integer-ceil
    quantile rule, ties land low). See
    :func:`ops.stats.rfm_segments`."""
    from web2llmstxt_ray.ops.stats import rfm_segments

    return rfm_segments(
        _t(sf_dir, "orders",
           ["o_custkey", "o_orderdate", "o_totalprice"]),
        key_col="o_custkey", ts_col="o_orderdate",
        value_col="o_totalprice", n_tiles=5)


def q_hapax_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source hapax legomena rate (share of the source's distinct
    tokens occurring exactly once there) — the vocabulary-tail
    boilerplate screen. See :func:`ops.textstats.hapax_rate`."""
    from web2llmstxt_ray.ops.textstats import hapax_rate

    return hapax_rate(_t(sf_dir, "documents", ["source", "text"]))


def q_hourly_peaks(sf_dir: str) -> pd.DataFrame:
    """Diurnal peak hour per event type (ties → smallest hour) with
    its traffic share — the recrawl-scheduling seasonality read. See
    :func:`ops.events.hourly_peak_profile`."""
    from web2llmstxt_ray.ops.events import hourly_peak_profile

    return hourly_peak_profile(
        _t(sf_dir, "events", ["ts", "event_type"]))


def q_short_doc_wilson(sf_dir: str) -> pd.DataFrame:
    """Per-source short-doc rate (<30 tokens) with Wilson 95% bounds
    — junk-source flagging with sample-size-honest intervals. See
    :func:`ops.textstats.short_doc_wilson`."""
    from web2llmstxt_ray.ops.textstats import short_doc_wilson

    return short_doc_wilson(
        _t(sf_dir, "documents", ["source", "text"]), max_tokens=30)


def q_value_top_share(sf_dir: str) -> pd.DataFrame:
    """Whale concentration per event type: share of total value in
    the top 1% of events by value (k = ceil(n/100), tie-proof
    histogram rule). See :func:`ops.stats.grouped_top_share`."""
    from web2llmstxt_ray.ops.stats import grouped_top_share

    return grouped_top_share(
        _t(sf_dir, "events", ["event_type", "value"]),
        group_col="event_type", value_col="value",
        top_denominator=100)


def q_type_supplier_hhi(sf_dir: str) -> pd.DataFrame:
    """Supplier revenue concentration (HHI) within each part type —
    single-supplier-risk per segment; lineitem⋈part rides the
    partitioned hash join, squares fold in exact Python ints. See
    :func:`ops.stats.grouped_hhi`."""
    from web2llmstxt_ray.ops.relational import hash_join
    from web2llmstxt_ray.ops.stats import grouped_hhi

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].astype("int64"),
            "l_suppkey": b["l_suppkey"].astype("int64"),
            "_c": np.rint(b["l_extendedprice"].to_numpy(np.float64)
                          * 100.0).astype(np.int64)})
        return g.groupby(["l_partkey", "l_suppkey"],
                         as_index=False)["_c"].sum()

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(li_partial, batch_format="pandas",
                     batch_size=None)
    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: b.rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas", batch_size=None)
    joined = hash_join(li, part, on="l_partkey")
    return grouped_hhi(joined, group_col="p_type",
                       member_col="l_suppkey", cents_col="_c")


def q_ushape_attribution(sf_dir: str) -> pd.DataFrame:
    """U-shaped (position-based) multi-touch attribution: 40% first /
    40% last / middles split the rest, all exact integer cents so
    credits reconcile to each purchase. See
    :func:`ops.windows.ushape_touch_attribution`."""
    from web2llmstxt_ray.ops.windows import ushape_touch_attribution

    return ushape_touch_attribution(
        _t(sf_dir, "events",
           ["event_id", "user_id", "ts", "event_type", "value"]))


def q_emb_norm_profile(sf_dir: str) -> pd.DataFrame:
    """Per-label exact integer squared-norm quartiles of the
    embeddings (encoder-drift / degenerate-label gauge, no float
    summation anywhere). See :func:`ops.ann.emb_norm_profile`."""
    from web2llmstxt_ray.ops.ann import emb_norm_profile

    return emb_norm_profile(
        _t(sf_dir, "embeddings", ["embedding", "label"]))


def q_blocking_cost(sf_dir: str) -> pd.DataFrame:
    """Blocked-similarity-join cost audit over (lang, n_chars//256)
    blocking keys: exact candidate-pair count, block count, largest
    block per lang. See :func:`ops.dedup.blocking_cost_audit`."""
    from web2llmstxt_ray.ops.dedup import blocking_cost_audit

    return blocking_cost_audit(
        _t(sf_dir, "documents", ["lang", "n_chars"]),
        group_col="lang", size_col="n_chars", block_width=256)


def q_block_skew(sf_dir: str) -> pd.DataFrame:
    """Ray-native physical-layout audit of the documents read:
    per-block row-count balance (no SQL analogue by design — it
    measures the execution layout). See
    :func:`ops.dedup.block_skew_audit`."""
    from web2llmstxt_ray.ops.dedup import block_skew_audit

    return block_skew_audit(_t(sf_dir, "documents", ["doc_id"]))


def q_frequent_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact φ-frequent tokens (count > N/200) via the two-pass
    pigeonhole heavy-hitter scheme — raw tokens never leave their
    block. See :func:`ops.sketch.frequent_items`."""
    from web2llmstxt_ray.ops.sketch import frequent_items

    docs = _t(sf_dir, "documents", ["text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("").str.strip()
        keep = t != ""
        toks = t[keep].str.lower().str.split(r"\s+", regex=True)
        return pd.DataFrame({"token": toks}).explode("token")

    toks = docs.map_batches(explode, batch_format="pandas",
                            batch_size=None)
    return frequent_items(toks, "token", k=200)


def q_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort LTV curve over orders: customers cohorted by first
    order month, exact revenue cents per (cohort, month offset) plus
    the running cumulative. See
    :func:`ops.events.cohort_value_curve`."""
    from web2llmstxt_ray.ops.events import cohort_value_curve

    return cohort_value_curve(
        _t(sf_dir, "orders",
           ["o_custkey", "o_orderdate", "o_totalprice"]),
        key_col="o_custkey", ts_col="o_orderdate",
        value_col="o_totalprice")


def q_discount_qty_profile(sf_dir: str) -> pd.DataFrame:
    """Model-free elasticity read: mean quantity per exact discount
    decile (integer-ceil boundaries, ties low, duplicate deciles
    collapse). See :func:`ops.stats.conditional_decile_profile`."""
    from web2llmstxt_ray.ops.stats import conditional_decile_profile

    return conditional_decile_profile(
        _t(sf_dir, "lineitem", ["l_discount", "l_quantity"]),
        x_col="l_discount", y_col="l_quantity",
        x_scale=10_000, y_scale=100, n_tiles=10)


def q_degree_hist(sf_dir: str) -> pd.DataFrame:
    """Degree-distribution histogram of the part co-purchase graph
    (the shape behind the Hill exponent's one number). See
    :func:`ops.graph.degree_histogram`."""
    from web2llmstxt_ray.ops.graph import degree_histogram

    return degree_histogram(_co_purchase_pairs(sf_dir))


def q_daily_value_bands(sf_dir: str) -> pd.DataFrame:
    """Daily p10/p50/p90 bands of the event value in exact integer
    cents — level-shift vs tail-blowup monitoring. See
    :func:`ops.windows.daily_value_bands`."""
    from web2llmstxt_ray.ops.windows import daily_value_bands

    return daily_value_bands(_t(sf_dir, "events", ["ts", "value"]))


def q_prefix_dups(sf_dir: str) -> pd.DataFrame:
    """Prefix-duplicate groups (shared 128-char normalized prefix —
    the truncation/expansion dup class) over a deterministic
    tail-appended union. See :func:`ops.dedup.prefix_dup_groups`."""
    from web2llmstxt_ray.ops.dedup import prefix_dup_groups

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def copy(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64")
        t = (b["text"]
             + " zz extra tail appended well beyond the prefix "
               "window").where(did % 2 == 0, "odd " + b["text"])
        return pd.DataFrame({"doc_id": did + 10000, "text": t})

    u = docs.union(docs.map_batches(copy, batch_format="pandas",
                                    batch_size=None))
    return prefix_dup_groups(u, prefix_chars=128)


def q_join_size_audit(sf_dir: str) -> pd.DataFrame:
    """Exact lineitem⋈orders cardinality WITHOUT running the join
    (Σ c_L·c_R over the two per-key count histograms) — the
    planner-grade fan-out pre-flight. See
    :func:`ops.relational.join_size_audit`."""
    from web2llmstxt_ray.ops.relational import join_size_audit

    return join_size_audit(
        _t(sf_dir, "lineitem", ["l_orderkey"]),
        _t(sf_dir, "orders", ["o_orderkey"]),
        on_left="l_orderkey", on_right="o_orderkey")


def q_dim_drift(sf_dir: str) -> pd.DataFrame:
    """Per-dimension embedding mean drift between the low- and
    high-id halves (encoder-version-change detector): exact quantized
    integer sums, one float division per mean. See
    :func:`ops.ann.dimension_drift`."""
    from web2llmstxt_ray.ops.ann import dimension_drift

    return dimension_drift(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc character-level Shannon entropy (gibberish/encoding
    junk screen, map-only). See :func:`ops.textstats.char_entropy`."""
    from web2llmstxt_ray.ops.textstats import char_entropy

    out = _pdf(char_entropy(_t(sf_dir, "documents",
                               ["doc_id", "text"])))
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_tail(sf_dir: str) -> pd.DataFrame:
    """Per-source doc-length tail heaviness: exact integer p50/p90/
    p99 of n_chars and the p90/p50 ratio. See
    :func:`ops.textstats.length_tail_ratio`."""
    from web2llmstxt_ray.ops.textstats import length_tail_ratio

    return length_tail_ratio(
        _t(sf_dir, "documents", ["source", "n_chars"]))


def q_sorted_audit(sf_dir: str) -> pd.DataFrame:
    """Ray-native sortedness audit after a distributed sort of events
    by value: per-block (first, last, sorted-within) probes + the
    block-boundary chain — execution-layout invariant, no SQL
    analogue by design. See
    :func:`ops.relational.sorted_run_audit`."""
    from web2llmstxt_ray.ops.relational import sorted_run_audit

    ev = _t(sf_dir, "events", ["event_id", "value"]).sort("value")
    return sorted_run_audit(ev, "value")


def q_source_coverage(sf_dir: str) -> pd.DataFrame:
    """Coverage concentration curve of docs across sources (rank by
    count desc, cum share) — the how-many-sources-cover-90% planning
    read. See :func:`ops.textstats.group_coverage_curve`."""
    from web2llmstxt_ray.ops.textstats import group_coverage_curve

    return group_coverage_curve(
        _t(sf_dir, "documents", ["source"]))


def q_transition_gaps(sf_dir: str) -> pd.DataFrame:
    """Dwell time per behavior transition: exact integer-µs median
    gap for each (cur, next) event-type pair. See
    :func:`ops.events.transition_gap_stats`."""
    from web2llmstxt_ray.ops.events import transition_gap_stats

    return transition_gap_stats(
        _t(sf_dir, "events",
           ["user_id", "ts", "event_id", "event_type"]))


def q_quota_split(sf_dir: str) -> pd.DataFrame:
    """Stratified three-way train/val/test split with exact
    per-source integer quotas over the stateless (md5(id), id)
    ranking. See :func:`ops.corpus.stratified_quota_split`."""
    from web2llmstxt_ray.ops.corpus import stratified_quota_split

    return stratified_quota_split(
        _t(sf_dir, "documents", ["source", "doc_id"]))


def q_dau_overlap(sf_dir: str) -> pd.DataFrame:
    """Day-over-day active-user Jaccard (audience churn velocity) —
    per-user consecutive-day memberships are bucket-local, only
    O(days) count partials fold. See
    :func:`ops.events.dau_overlap`."""
    from web2llmstxt_ray.ops.events import dau_overlap

    return dau_overlap(_t(sf_dir, "events", ["user_id", "ts"]))


def q_new_vs_returning(sf_dir: str) -> pd.DataFrame:
    """Daily new-vs-returning active users (growth vs retention
    decomposition). See :func:`ops.events.new_vs_returning`."""
    from web2llmstxt_ray.ops.events import new_vs_returning

    return new_vs_returning(_t(sf_dir, "events", ["user_id", "ts"]))


def q_source_lang_purity(sf_dir: str) -> pd.DataFrame:
    """Per-source language purity (modal lang with deterministic
    ties + its share) — the is-this-source-monolingual screen. See
    :func:`ops.textstats.group_label_purity`."""
    from web2llmstxt_ray.ops.textstats import group_label_purity

    return group_label_purity(
        _t(sf_dir, "documents", ["source", "lang"]))


def q_knn_label_acc(sf_dir: str) -> pd.DataFrame:
    """Leave-one-out 1-NN label coherence of the embedding space
    (per-label accuracy; exact quantized-integer dots, ties to lower
    id — partitioning-proof). See
    :func:`ops.ann.knn_label_accuracy`."""
    from web2llmstxt_ray.ops.ann import knn_label_accuracy

    return knn_label_accuracy(
        _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"]))


def q_part_substitutes(sf_dir: str) -> pd.DataFrame:
    """Cheapest cross-brand substitute per part within (type, size)
    — the within-group cross-match solved with TWO candidate rows
    per group instead of a quadratic self-join. See
    :func:`ops.relational.cheapest_substitute`."""
    from web2llmstxt_ray.ops.relational import cheapest_substitute

    return cheapest_substitute(
        _t(sf_dir, "part",
           ["p_partkey", "p_brand", "p_type", "p_size",
            "p_retailprice"]),
        key_col="p_partkey", group_cols=["p_type", "p_size"],
        brand_col="p_brand", price_col="p_retailprice")


def q_trend_robust(sf_dir: str) -> pd.DataFrame:
    """Mann–Kendall S/tau + Theil–Sen slope of the daily order-revenue
    series — the outlier-proof trend read (sign statistic + pairwise-
    median slope) over the O(days) driver series from additive
    per-block partials. See :func:`ops.windows.trend_robust`."""
    from web2llmstxt_ray.ops.windows import trend_robust

    return trend_robust(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_change_point(sf_dir: str) -> pd.DataFrame:
    """Exact single change-point (SSE-argmin split) of the daily
    order-revenue series — the level-shift locator, exact integer
    prefix sums with the one float cost expression replayed verbatim
    by the SQL twin. See :func:`ops.windows.change_point`."""
    from web2llmstxt_ray.ops.windows import change_point

    return change_point(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_name_edit2_pairs(sf_dir: str) -> pd.DataFrame:
    """Spelling-variant similarity join at radius 2: distinct part
    names within Levenshtein distance ≤ 2 via FastSS 2-deletion
    neighborhood blocking + banded-DP verify — the typo/OCR variant
    class radius 1 misses. See
    :func:`ops.dedup.edit_distance_self_join` (max_dist=2)."""
    from web2llmstxt_ray.ops.dedup import edit_distance_self_join

    return edit_distance_self_join(
        _t(sf_dir, "part", ["p_name"]), "p_name", max_dist=2)


def q_frequent_triples(sf_dir: str) -> pd.DataFrame:
    """Frequent 3-itemsets over (user, day) activity baskets with
    support ≥ 1/20 — distributed A-priori: item-support pass, broadcast
    anti-monotone prune, then the triple merge only over surviving
    items. Exact integer support rule ``n·20 ≥ N``. See
    :func:`ops.events.frequent_triples`."""
    from web2llmstxt_ray.ops.events import frequent_triples

    return frequent_triples(
        _t(sf_dir, "events", ["user_id", "ts", "event_type"]),
        sup_num=1, sup_den=20)


def q_ivm_groupby(sf_dir: str) -> pd.DataFrame:
    """Incremental view maintenance: per-supplier (count, quantity)
    aggregate updated from a changelog (deletes: orderkey ≡ 0 mod 10;
    inserts: orderkey ≡ 3 mod 7 with quantity+1) WITHOUT rescanning
    the base — bit-equal to the SQL twin's full recompute over the
    post-change table, which IS the IVM correctness claim. See
    :func:`ops.cdc.ivm_groupby_update`."""
    from web2llmstxt_ray.ops.cdc import ivm_groupby_update
    from web2llmstxt_ray.ops.relational import partial_groupby

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_quantity"])

    def base_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_suppkey": b["l_suppkey"],
            "n": np.int64(1),
            "s": np.rint(b["l_quantity"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)})
        return g.groupby("l_suppkey", as_index=False)[["n", "s"]].sum()

    base_agg = partial_groupby(li, ["l_suppkey"], base_partial,
                               ["n", "s"], distributed_combine=True)

    def to_changelog(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["l_orderkey"].to_numpy(np.int64)
        cents = np.rint(b["l_quantity"].to_numpy(np.float64)
                        * 100.0).astype(np.int64)
        dels = ok % 10 == 0
        ins = ok % 7 == 3
        return pd.DataFrame({
            "l_suppkey": np.concatenate([
                b["l_suppkey"].to_numpy(np.int64)[dels],
                b["l_suppkey"].to_numpy(np.int64)[ins]]),
            "value": np.concatenate([cents[dels], cents[ins] + 100]),
            "op": np.concatenate([
                np.repeat("d", int(dels.sum())),
                np.repeat("i", int(ins.sum()))])})

    chg = li.map_batches(to_changelog, batch_format="pandas",
                         batch_size=None)
    out = ivm_groupby_update(base_agg, chg, key_col="l_suppkey",
                             n_col="n", sum_col="s").to_pandas()
    out = out.rename(columns={"n": "n_items", "s": "qty_cents"})
    for c in ("n_items", "qty_cents"):
        out[c] = out[c].astype("int64")
    return out[["l_suppkey", "n_items", "qty_cents"]] \
        .sort_values("l_suppkey").reset_index(drop=True)


def q_dow_anomaly(sf_dir: str) -> pd.DataFrame:
    """Weekday-deseasonalized daily-revenue anomalies — days beating
    their own day-of-week mean by >2σ, the seasonality-aware
    spike/outage read; the anomaly SET is picked by the exact-integer
    cross-multiplied rule (n·x−S)² > 4·(n·Q−S²), so no float
    comparison can flip it. See :func:`ops.windows.dow_anomaly`."""
    from web2llmstxt_ray.ops.windows import dow_anomaly

    return dow_anomaly(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]), z=2)


def q_source_overlap(sf_dir: str) -> pd.DataFrame:
    """Cross-source exact-duplicate overlap matrix (mirror detection)
    over a deterministic union that plants three mirror sources
    (doc_id ≡ 0 mod 5 re-tagged 'mirror_<doc_id mod 3>') — the
    synthetic corpus has no natural cross-source dups, so the planted
    tail makes the oracle non-trivial (same union built by the SQL
    twin). See :func:`ops.dedup.cross_group_dup_matrix`."""
    from web2llmstxt_ray.ops.dedup import cross_group_dup_matrix

    docs = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def base(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"text": b["text"],
                             "source": b["source"]})

    def mirror(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["doc_id"] % 5 == 0]
        return pd.DataFrame({
            "text": sel["text"],
            "source": "mirror_" + (sel["doc_id"] % 3).astype(str)})

    u = docs.map_batches(base, batch_format="pandas",
                         batch_size=None).union(
        docs.map_batches(mirror, batch_format="pandas",
                         batch_size=None))
    return cross_group_dup_matrix(u, text_col="text",
                                  group_col="source")


def q_fd_source_lang(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency audit source → lang: is each source
    monolingual? Exact violation census — O(buckets) summary partials,
    never O(keys) on the driver. See
    :func:`ops.validate.fd_audit`."""
    from web2llmstxt_ray.ops.validate import fd_audit

    return fd_audit(_t(sf_dir, "documents", ["source", "lang"]),
                    lhs_col="source", rhs_col="lang")


def q_cluster_db_index(sf_dir: str) -> pd.DataFrame:
    """Davies–Bouldin components per label over the embeddings —
    worst-confusable-neighbor scatter ratios, the cluster-separation
    QA companion to label_silhouette. See
    :func:`ops.ann.davies_bouldin`."""
    from web2llmstxt_ray.ops.ann import davies_bouldin

    return davies_bouldin(_t(sf_dir, "embeddings",
                             ["vec_id", "embedding", "label"]))


def q_source_fairness(sf_dir: str) -> pd.DataFrame:
    """Jain's fairness index over per-source doc counts — the
    one-number crawl-budget fairness audit, exact ints with Σx²
    carried as decimal strings past int64. See
    :func:`ops.stats.jain_fairness`."""
    from web2llmstxt_ray.ops.stats import jain_fairness

    return jain_fairness(_t(sf_dir, "documents", ["source"]),
                         group_col="source")


def q_mann_whitney(sf_dir: str) -> pd.DataFrame:
    """Exact Mann-Whitney U (rank-sum) test between purchase and
    click event values — midrank ties, tie-corrected z, all integer
    until the final expressions. See
    :func:`ops.stats.mann_whitney_u`."""
    from web2llmstxt_ray.ops.stats import mann_whitney_u

    return mann_whitney_u(
        _t(sf_dir, "events", ["value", "event_type"]),
        "value", "event_type", "purchase", "click")


def q_next_event_entropy(sf_dir: str) -> pd.DataFrame:
    """Conditional next-event entropy per current type — the
    behavioral-predictability read of the Markov transition table,
    with the modal next type under the (n DESC, type ASC) rule. See
    :func:`ops.events.next_event_entropy`."""
    from web2llmstxt_ray.ops.events import next_event_entropy

    return next_event_entropy(
        _t(sf_dir, "events", ["event_id", "user_id", "event_type",
                              "ts"]))


def q_source_lang_kappa(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa of the modal-lang-per-source router against the
    true lang labels — agreement beyond chance from the exact
    confusion matrix, the honest companion to the binary FD audit.
    See :func:`ops.validate.modal_predictor_kappa`."""
    from web2llmstxt_ray.ops.validate import modal_predictor_kappa

    return modal_predictor_kappa(
        _t(sf_dir, "documents", ["source", "lang"]),
        key_col="source", label_col="lang")


def q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Exact phrase-occurrence counts for "merge data" over a
    16-token-chunked corpus — in-chunk vectorized scan + per-doc
    junction stitching, validated against the SQL twin's positional
    self-join over the UNCHUNKED text (the boundary-handling proof).
    See :func:`ops.retrieval.phrase_count`."""
    from web2llmstxt_ray.ops.retrieval import phrase_count

    return phrase_count(_t(sf_dir, "documents", ["doc_id", "text"]),
                        "merge data", chunk_tokens=16)


def q_hits_scores(sf_dir: str) -> pd.DataFrame:
    """HITS hubs & authorities (2 L1-normalized iterations, integer
    fixed-point) over the customer-buys-part bipartite graph —
    bit-exact vs the unrolled HUGEINT SQL replay. See
    :func:`ops.graph.hits_scores`."""
    from web2llmstxt_ray.ops.graph import hits_scores
    from web2llmstxt_ray.ops.relational import hash_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: pa.table({
            "l_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey")}),
            batch_format="pyarrow")
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = hash_join(li, orders, on="l_orderkey", num_buckets=16) \
        .map_batches(lambda b: pa.table({
            "hub": b.column("o_custkey"),
            "auth": b.column("l_partkey")}),
            batch_format="pyarrow")
    out = hits_scores(edges, iters=2, scale=10 ** 9).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["score"] = out["score"].astype("int64")
    return out.sort_values(["kind", "node"]).reset_index(drop=True)



def q_token_budget_sample(sf_dir: str) -> pd.DataFrame:
    """Global token-budget curation cutoff: best docs first
    (n_chars DESC, doc_id ASC) while the inclusive running token total
    stays ≤ 50,000 — computed WITHOUT a global sort via the two-phase
    skinny-histogram threshold find. Exact ints → hash-exact vs the
    window-sum twin. See :func:`ops.corpus.token_budget_sample`."""
    from web2llmstxt_ray.ops.corpus import token_budget_sample

    docs = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = [len(t.split()) if t and t.strip() else 0
                for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars": b.column("n_chars"),
            "n_tokens": pa.array(toks, pa.int64()),
        })

    out = _pdf(token_budget_sample(
        docs.map_batches(with_tokens, batch_format="pyarrow"),
        budget=50_000))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_kcenter_coreset(sf_dir: str) -> pd.DataFrame:
    """Gonzalez farthest-point k-center coreset (k=16) over the
    embeddings table — coverage-radius subset selection, the coreset
    complement to MMR's relevance-diversity blend. Each greedy step is
    one map-only broadcast pass; the DuckDB twin replays the
    traversal exactly with a recursive CTE. See
    :func:`ops.ann.kcenter_select`."""
    from web2llmstxt_ray.ops.ann import kcenter_select

    return kcenter_select(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=16).to_pandas()


def q_shuffle_run_lengths(sf_dir: str) -> pd.DataFrame:
    """Shuffle-quality audit: histogram of consecutive same-LANGUAGE
    run lengths in epoch-shuffle order (seed=3) — the did-the-shuffle-
    interleave check. Lang (not source) on purpose: source is
    id-derived round-robin in this corpus and the multiplicative
    shuffle provably anti-clumps any id-derived class (three-gap
    structure → histogram all 1s — the perfect-interleave demo but a
    trivial oracle); lang is independent of id, so the histogram is
    the chance-clump profile a trainer actually audits. Global
    adjacency WITHOUT a global sort: the bijective key's top bits
    range-partition the order into contiguous segments; interior runs
    fold locally, boundaries stitch on the driver (O(buckets)). See
    :func:`ops.corpus.shuffle_run_lengths`."""
    from web2llmstxt_ray.ops.corpus import shuffle_run_lengths

    return shuffle_run_lengths(
        _t(sf_dir, "documents", ["doc_id", "lang"]),
        group_col="lang", seed=3)


def q_curriculum_schedule(sf_dir: str) -> pd.DataFrame:
    """Deterministic curriculum training order over documents
    (easy→hard by (n_chars, doc_id), 10 difficulty bins by the
    explicit rank·bins//n rule, round-robin interleave across bins) —
    global ranking WITHOUT a global sort via the skinny per-value
    histogram + broadcast offsets. Exact ints, hash-exact vs the
    window twin. See :func:`ops.corpus.curriculum_schedule`."""
    from web2llmstxt_ray.ops.corpus import curriculum_schedule

    out = _pdf(curriculum_schedule(
        _t(sf_dir, "documents", ["doc_id", "n_chars"])))
    return out.sort_values("doc_id").reset_index(drop=True)


def q_padding_waste(sf_dir: str) -> pd.DataFrame:
    """Length-bucketed batching padding audit (64-token buckets,
    16-row batches formed in (tokens desc, id) order, each batch pads
    to its own max): per-bucket pad-token burn. Exact ints →
    hash-exact. See :func:`ops.corpus.padding_waste`."""
    from web2llmstxt_ray.ops.corpus import padding_waste

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = [len(t.split()) if t and t.strip() else 0
                for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(toks, pa.int64()),
        })

    return padding_waste(
        docs.map_batches(with_tokens, batch_format="pyarrow"))


def q_contamination_attribution(sf_dir: str) -> pd.DataFrame:
    """Per-benchmark-snippet contamination attribution: WHICH snippet
    leaked how widely (doc hit counts per snippet; the flag tier
    `decontaminate` only says a doc is dirty). Same deterministic
    benchmark set as q_decontaminate (docs with id % 97 == 0
    contribute text[10:60]). See
    :func:`ops.scrub.contamination_attribution`."""
    from web2llmstxt_ray.ops.scrub import contamination_attribution

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bench_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = [t[10:60] for i, t in zip(ids, texts)
                if i % 97 == 0 and t and len(t) >= 60]
        return pa.table({"s": pa.array(keep, pa.string())})

    snippets = [r["s"] for r in docs.map_batches(
        bench_rows, batch_format="pyarrow").take_all()]
    return contamination_attribution(docs, snippets)


def q_source_set_cover(sf_dir: str) -> pd.DataFrame:
    """Greedy max-coverage source selection (k=5): which sources buy
    the most distinctive content (word-3-gram coverage) — the (1−1/e)
    set-cover heuristic as a data-mixture read. Distinct
    (source, gram) pairs shuffle once;
    each greedy step is a broadcast-covered-set marginal count. The
    DuckDB twin replays the greedy trace exactly with a recursive CTE
    (covered-token list in the recursion state, per-step argmax via a
    LATERAL top-1 with an anti-membership unnest). See
    :func:`ops.corpus.greedy_source_cover`."""
    from web2llmstxt_ray.ops.corpus import greedy_source_cover

    return greedy_source_cover(
        _t(sf_dir, "documents", ["source", "text"]), k=5)


def q_conformal_threshold(sf_dir: str) -> pd.DataFrame:
    """Split-conformal calibration threshold per event_type (α=0.1):
    the exact ceil((n+1)(1−α))-th smallest |value−mean| — two skinny
    passes (partial-agg means broadcast; bucketed np.partition order
    stat). See :func:`ops.validate.conformal_threshold`."""
    from web2llmstxt_ray.ops.validate import conformal_threshold

    return conformal_threshold(
        _t(sf_dir, "events", ["event_type", "value"]), alpha=0.1)


def q_snm_pairs(sf_dir: str) -> pd.DataFrame:
    """Sorted-Neighborhood dedup blocking (Hernández-Stolfo): slide a
    5-record window down the (n_chars, doc_id)-sorted corpus and emit
    window pairs with distinct-token Jaccard ≥ 0.8 — the
    linear-candidate blocking for near-dups with NEARLY equal sort
    keys. Global window without a global sort: skinny histogram ranks
    + chunked exchange with (w−1)-row boundary replication (text
    moves once; every pair meets in exactly one chunk). See
    :func:`ops.dedup.snm_pairs`."""
    from web2llmstxt_ray.ops.dedup import snm_pairs

    return snm_pairs(
        _t(sf_dir, "documents", ["doc_id", "text", "n_chars"]),
        window=5, threshold=0.8)


def q_soundex_blocks(sf_dir: str) -> pd.DataFrame:
    """Phonetic blocking census: American Soundex code of every
    distinct part name → per-code block sizes — the blocking-quality
    audit (a fat block = under-segmentation = quadratic verify blowup,
    visible before it burns a cluster). The SQL twin replays the
    EXACT simplified-standard Soundex the engine documents (RE2 has no
    backreferences, so run-collapse is seven per-digit replacements on
    both sides). See :func:`ops.phonetic.soundex_census`."""
    from web2llmstxt_ray.ops.phonetic import soundex_census

    out = soundex_census(_t(sf_dir, "part", ["p_name"]), "p_name")
    out["n_names"] = out["n_names"].astype("int64")
    return out


def q_jw_catalog_dups(sf_dir: str) -> pd.DataFrame:
    """Dirty-catalog record linkage via blocked Jaro-Winkler: every
    part name gets a deterministic typo variant (p_partkey mod 3
    selects delete / adjacent-swap / duplicate at a key-derived
    position — replayed verbatim by the SQL twin's substr
    arithmetic, the crawl_delta planting pattern), and the clean ∪
    dirty name registry is JW-self-joined at ≥ 0.85 with
    first-char + length±1 blocking. JW bit-matches DuckDB's
    ``jaro_winkler_similarity`` (pair-verified in tests). Pairs whose
    typo hit position 0 fall outside the block — the honest blocking
    recall story, quantified by the census operator. See
    :func:`ops.phonetic.jw_self_join`."""
    from web2llmstxt_ray.ops.phonetic import jw_self_join

    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    from web2llmstxt_ray.ops.phonetic import catalog_corrupt_names

    def registry_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        return pd.DataFrame({"name": pd.concat(
            [cd["clean"], cd["dirty"]], ignore_index=True)})

    registry = part.map_batches(registry_batch, batch_format="pandas")
    return jw_self_join(registry, "name", threshold=0.85)


def q_dbscan_clusters(sf_dir: str) -> pd.DataFrame:
    """DBSCAN over the embedding column (ε=1.2, min_pts=5):
    core/border/noise roles + min-core-id cluster labels — the
    shape-agnostic, outlier-aware complement to k-means. Border
    points take the MIN cluster among core neighbors (order-free
    determinism), so the recursive-CTE transitive-closure twin
    replays it exactly; the ε margin of this dataset (min |d−eps| ≈
    1.2e-5 ≫ the ~1e-13 GEMM-vs-per-dim-loop drift) is
    pytest-asserted. See :func:`ops.density.dbscan`."""
    from web2llmstxt_ray.ops.density import dbscan

    return dbscan(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                  eps=1.2, min_pts=5)


def q_markov_stationary(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain — 4
    synchronous power-iteration steps in EXACT integer fixed point
    (mass moves x·c // rowsum per edge; no float order-dependence),
    over transition counts from one bucketed shuffle. The SQL twin
    unrolls the 4 steps as chained CTEs with the same HUGEINT floor
    divisions. See :func:`ops.events.markov_stationary`."""
    from web2llmstxt_ray.ops.events import markov_stationary

    return markov_stationary(
        _t(sf_dir, "events",
           ["event_id", "user_id", "event_type", "ts"]), iters=4)


def q_medoid_per_label(sf_dir: str) -> pd.DataFrame:
    """Exact per-label medoid (sum-of-squared-L2 argmin) via the
    moment identity n·‖x‖² − 2x·s + q — two LINEAR passes instead of
    the naive O(n²·d): skinny (n, Σx, Σ‖x‖²) partials fold on the
    driver, broadcast once, per-block argmin partials merge. Winner
    margin over the runner-up is pytest-asserted to dwarf the
    float-sum reassociation vs the unnest SQL twin. See
    :func:`ops.ann.label_medoids`."""
    from web2llmstxt_ray.ops.ann import label_medoids

    return label_medoids(
        _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"]))


def q_ndcg_label(sf_dir: str) -> pd.DataFrame:
    """NDCG@10 of cosine retrieval with same-label binary relevance
    (queries = vec_id ≡ 0 mod 50, self excluded) — the standard
    embedding-quality eval. Exact top-k from per-block partial top-k
    (vectors never shuffle); DCG/IDCG replayed by the SQL twin's
    window ranking. See :func:`ops.retrieval.retrieval_ndcg_label`."""
    from web2llmstxt_ray.ops.retrieval import retrieval_ndcg_label

    return retrieval_ndcg_label(
        _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"]),
        k=10, query_mod=50)


def q_rbo_rankings(sf_dir: str) -> pd.DataFrame:
    """Rank-Biased Overlap (p=0.9, depth 10) between each query's
    cosine and raw-dot rankings — the metric-sensitivity audit (low
    RBO = ranking dominated by vector norms, the unnormalized-
    embedding trap). One GEMM feeds both rankings. See
    :func:`ops.retrieval.retrieval_rbo`."""
    from web2llmstxt_ray.ops.retrieval import retrieval_rbo

    return retrieval_rbo(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=10, p=0.9, query_mod=50)


def q_poisson_bootstrap(sf_dir: str) -> pd.DataFrame:
    """Deterministic Poisson bootstrap (B=64) of the mean order price:
    every order joins replicate b with multiplicity from the exact
    integer hash (key·2654435761 + b·40503) mod 2³² against
    hardcoded Poisson(1) CDF thresholds — one streaming pass, all
    replicates at once, no RNG state, no shuffle. Totals are exact
    integer cents; the replicate table IS the output (the CI is an
    order statistic of it). See :func:`ops.stats.poisson_bootstrap`."""
    from web2llmstxt_ray.ops.stats import poisson_bootstrap

    return poisson_bootstrap(
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        "o_orderkey", "o_totalprice", n_replicates=64)


def q_blocking_quality(sf_dir: str) -> pd.DataFrame:
    """Blocking-scheme evaluation over the planted dirty catalog:
    reduction ratio (pair-space pruning) and pairs completeness
    (truth-pair recall) for first-char+length blocking vs Soundex
    blocking. Candidate counts come from block-size histograms —
    O(blocks) arithmetic, never pair enumeration. See
    :func:`ops.phonetic.blocking_quality`."""
    from web2llmstxt_ray.ops.phonetic import blocking_quality

    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    from web2llmstxt_ray.ops.phonetic import catalog_corrupt_names

    def registry_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        return pd.DataFrame({"name": pd.concat(
            [cd["clean"], cd["dirty"]], ignore_index=True)})

    def truth_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        m = cd["clean"] != cd["dirty"]
        lo = cd["clean"].where(cd["clean"] < cd["dirty"], cd["dirty"])
        hi = cd["dirty"].where(cd["clean"] < cd["dirty"], cd["clean"])
        return pd.DataFrame({"a": lo[m].to_numpy(),
                             "b": hi[m].to_numpy()})

    registry = part.map_batches(registry_batch, batch_format="pandas")
    truth = part.map_batches(truth_batch, batch_format="pandas") \
        .groupby(["a", "b"]).map_groups(lambda g: g.head(1),
                                        batch_format="pandas")
    return blocking_quality(registry, truth, col="name")


def q_entity_resolution(sf_dir: str) -> pd.DataFrame:
    """End-to-end entity resolution over the planted dirty catalog:
    blocked JW pairs at 0.92 → transitive closure → canonical =
    lexicographic min member (== min name reachable through match
    edges, which the SQL twin's recursive min-string propagation
    computes directly). Over-merge via chaining is the documented
    failure mode of threshold linkage — blocking_quality is its
    audit. See :func:`ops.phonetic.entity_resolution`."""
    from web2llmstxt_ray.ops.phonetic import (catalog_corrupt_names,
                                              entity_resolution)

    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def registry_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        return pd.DataFrame({"name": pd.concat(
            [cd["clean"], cd["dirty"]], ignore_index=True)})

    registry = part.map_batches(registry_batch, batch_format="pandas")
    return entity_resolution(registry, "name", threshold=0.92)


def q_jump_hash_shards(sf_dir: str) -> pd.DataFrame:
    """Jump-consistent-hash resharding audit (32 → 33 shards) over
    order keys: per-shard counts under both configs + moved_in. The
    minimal-movement property is IN the output — moved_in = 0 for
    every pre-existing shard, ~1/33 of keys land on the new one. The
    IEEE float step replays bit-for-bit in the SQL twin's recursive
    CTE. See :func:`ops.layout.jump_hash_shards`."""
    from web2llmstxt_ray.ops.layout import jump_hash_shards

    return jump_hash_shards(_t(sf_dir, "orders", ["o_orderkey"]),
                            "o_orderkey", n_old=32, n_new=33)


def q_huber_trend(sf_dir: str) -> pd.DataFrame:
    """Huber-IRLS robust trend of the daily order-revenue series —
    exact-int OLS seed, median/MAD scale (order stats, ties by day),
    three unrolled reweighting steps; the weight-branch margins the
    SQL twin leans on are pytest-asserted. See
    :func:`ops.windows.huber_trend`."""
    from web2llmstxt_ray.ops.windows import huber_trend

    return huber_trend(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_dominance_counts(sf_dir: str) -> pd.DataFrame:
    """2-D weak-dominance census over parts (price ↓, size ↓): for
    each part, how many others are at-least-as-good in both
    dimensions — dominance depth, the ranking behind part_skyline.
    Rank-partitioned chunks + cumulative small-domain y-histograms
    replace the O(n²) correlated join; exact ints throughout. See
    :func:`ops.relational.dominance_counts`."""
    from web2llmstxt_ray.ops.relational import dominance_counts

    return dominance_counts(
        _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]),
        "p_partkey", "p_retailprice", "p_size", y_domain=64)


def q_fdr_bh(sf_dir: str) -> pd.DataFrame:
    """One-vs-rest exact-integer KS test per event type + Benjamini-
    Hochberg FDR control across the family — WHICH segments' value
    distributions differ, at a controlled false-discovery rate. One
    streaming pass feeds every group's test. See
    :func:`ops.stats.grouped_ks_fdr`."""
    from web2llmstxt_ray.ops.stats import grouped_ks_fdr

    return grouped_ks_fdr(
        _t(sf_dir, "events", ["value", "event_type"]),
        "value", "event_type", alpha=0.25)


def q_isotonic_calibration(sf_dir: str) -> pd.DataFrame:
    """Isotonic (PAVA) calibration of the purchase rate over event-
    value bins — the monotone step-function fit. The SQL twin skips
    the merge loop and evaluates the equivalent minimax
    characterization max_{j≤i} min_{k≥i} mean(j..k) over the same
    integer prefix sums — bit-equal pooled means. See
    :func:`ops.stats.isotonic_calibration`."""
    from web2llmstxt_ray.ops.stats import isotonic_calibration

    return isotonic_calibration(
        _t(sf_dir, "events", ["value", "event_type"]),
        "value", "event_type", "purchase", bin_width=10.0, n_bins=10)


def q_fs_weights(sf_dir: str) -> pd.DataFrame:
    """Fellegi-Sunter agreement weights over the planted dirty
    catalog: blocked candidate pairs × 3 cheap comparators →
    add-one-smoothed m/u probabilities → log2 likelihood-ratio
    weight per agreement pattern. See
    :func:`ops.phonetic.fs_weights`."""
    from web2llmstxt_ray.ops.phonetic import (catalog_corrupt_names,
                                              fs_weights)

    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def registry_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        return pd.DataFrame({"name": pd.concat(
            [cd["clean"], cd["dirty"]], ignore_index=True)})

    def truth_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        m = cd["clean"] != cd["dirty"]
        lo = cd["clean"].where(cd["clean"] < cd["dirty"], cd["dirty"])
        hi = cd["dirty"].where(cd["clean"] < cd["dirty"], cd["clean"])
        return pd.DataFrame({"a": lo[m].to_numpy(),
                             "b": hi[m].to_numpy()})

    registry = part.map_batches(registry_batch, batch_format="pandas")
    truth = part.map_batches(truth_batch, batch_format="pandas") \
        .groupby(["a", "b"]).map_groups(lambda g: g.head(1),
                                        batch_format="pandas")
    return fs_weights(registry, truth, col="name")


def q_hampel_anomalies(sf_dir: str) -> pd.DataFrame:
    """Hampel filter over daily order revenue: ±3-day rolling median
    + rolling MAD, flag days beyond 3 robust sigmas — local-context
    outliers a global threshold misses. quantile_disc order-statistic
    semantics on both sides. See
    :func:`ops.windows.hampel_anomalies`."""
    from web2llmstxt_ray.ops.windows import hampel_anomalies

    return hampel_anomalies(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
        half_window=3, k_sigma=3.0)


def q_gear_cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """Content-defined chunking (gear rolling hash, FastCDC family)
    of every document — shift-robust dedup segmentation: boundaries
    are functions of local content, so duplicated passages chunk
    identically at any offset. The 2^64-wrapping windowed-sum form
    makes the SQL twin a position×offset join, not a recursion. See
    :func:`ops.substr.gear_cdc_chunks`."""
    from web2llmstxt_ray.ops.substr import gear_cdc_chunks

    return gear_cdc_chunks(
        _t(sf_dir, "documents", ["doc_id", "text"]), mask_bits=6)


def q_max_revenue_run(sf_dir: str) -> pd.DataFrame:
    """Maximum-sum contiguous run of centered daily revenue (Kadane)
    — exact integers via the n·cents−total scaling; the SQL twin
    replays the prefix-min identity with window functions, no scan
    state. See :func:`ops.windows.max_revenue_run`."""
    from web2llmstxt_ray.ops.windows import max_revenue_run

    return max_revenue_run(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_voptimal_histogram(sf_dir: str) -> pd.DataFrame:
    """V-optimal 6-bucket histogram of the daily order-count series —
    the DP-optimal contiguous partition (equi-width/equi-depth are
    heuristics). Exact int64 prefix moments; the DP unrolls as six
    join-min CTEs in the SQL twin, ties to the smallest split. See
    :func:`ops.windows.voptimal_histogram`."""
    from web2llmstxt_ray.ops.windows import voptimal_histogram

    return voptimal_histogram(
        _t(sf_dir, "orders", ["o_orderdate", "o_orderkey"]),
        n_buckets=6)


def q_subsequence_counts(sf_dir: str) -> pd.DataFrame:
    """ALL-subsequence view→click→purchase chain counts per user —
    combinatorial chain mass, not first-journey funnels; the exact
    integer DP that SQL replays with running sums alone. See
    :func:`ops.events.subsequence_counts`."""
    from web2llmstxt_ray.ops.events import subsequence_counts

    return subsequence_counts(
        _t(sf_dir, "events",
           ["event_id", "user_id", "event_type", "ts"]))


def q_hilbert_order(sf_dir: str) -> pd.DataFrame:
    """Hilbert-curve index of parts on the (price, size) grid — the
    locality-preserving storage order complementing the Z-order
    machinery (no Morton diagonal jumps). Integer bit arithmetic per
    step; the SQL twin's recursive CTE replays all 16 rotate steps.
    See :func:`ops.layout.hilbert_order`."""
    from web2llmstxt_ray.ops.layout import hilbert_order

    return hilbert_order(
        _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]),
        "p_partkey", "p_retailprice", "p_size", order=16)


def q_bottomk_jaccard(sf_dir: str) -> pd.DataFrame:
    """Bottom-k (KMV) set-similarity sketch per source with its OWN
    ground truth: md5 bottom-32 sketches, the Ĵ estimator, the exact
    Jaccard, and the error — fully SQL-oracled (md5 is bit-identical
    in DuckDB; the FNV MinHash tier stays rows-only by design). See
    :func:`ops.sketch.bottomk_jaccard`."""
    from web2llmstxt_ray.ops.sketch import bottomk_jaccard

    return bottomk_jaccard(
        _t(sf_dir, "documents", ["source", "text"]), k=32)


def q_merkle_levels(sf_dir: str) -> pd.DataFrame:
    """Merkle-tree top levels over key-ordered orders — the replica-
    divergence fingerprint (equal roots ⇒ identical tables; descend
    on mismatch). Order-preserving range-bucket ranks, four pairing
    levels per distributed round (16×-aligned group-local subtrees ==
    global pairing), odd tail promotes unchanged; the SQL twin's
    recursive CTE replays every md5. See
    :func:`ops.validate.merkle_levels`."""
    from web2llmstxt_ray.ops.validate import merkle_levels

    return merkle_levels(
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]))


def q_lm_heldout_ppl(sf_dir: str) -> pd.DataFrame:
    """Held-out bigram perplexity (add-k): train on doc_id % 5 ≠ 0,
    score the rest — the honest LM eval shape (lm_quality scores its
    own training corpus). On THIS tiny-vocab synthetic every held-out
    bigram happens to be covered; the unseen-bigram smoothing branch
    is proven by a planted test (tests/test_wave41.py). See
    :func:`ops.lm.lm_heldout_ppl`."""
    from web2llmstxt_ray.ops.lm import lm_heldout_ppl

    return lm_heldout_ppl(
        _t(sf_dir, "documents", ["doc_id", "text"]))


def q_interval_scheduling(sf_dir: str) -> pd.DataFrame:
    """Weighted interval scheduling per user over per-type activity
    spans — the classic DP picking non-overlapping phases that cover
    the most events. All-integer µs timestamps, strict compatibility,
    unrolled-CTE SQL twin. See
    :func:`ops.events.interval_scheduling`."""
    from web2llmstxt_ray.ops.events import interval_scheduling

    return interval_scheduling(
        _t(sf_dir, "events", ["user_id", "event_type", "ts"]))


def q_lis_revenue(sf_dir: str) -> pd.DataFrame:
    """Longest strictly-increasing subsequence of daily revenue — the
    maximal monotone-growth chain, exact integer DP; the SQL twin
    carries the DP table through a step-tagged recursion. See
    :func:`ops.windows.lis_revenue`."""
    from web2llmstxt_ray.ops.windows import lis_revenue

    return lis_revenue(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_mase_weekly(sf_dir: str) -> pd.DataFrame:
    """Seasonal accuracy read: MAE of the lag-7 seasonal-naive vs the
    lag-1 naive forecast over daily revenue, and their MASE ratio —
    exact integer cents absolute errors, two float means + one
    ratio. See :func:`ops.windows.mase_weekly`."""
    from web2llmstxt_ray.ops.windows import mase_weekly

    return mase_weekly(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def q_borda_fusion(sf_dir: str) -> pd.DataFrame:
    """Borda-count fusion of three part rankings (exact-integer
    revenue, quantity, line count) — consensus ranking without score
    normalization; top-20 by rank sum. See
    :func:`ops.relational.borda_fusion`."""
    from web2llmstxt_ray.ops.relational import borda_fusion

    return borda_fusion(
        _t(sf_dir, "lineitem",
           ["l_partkey", "l_extendedprice", "l_discount",
            "l_quantity"]), top_n=20)


def q_pareto_layers(sf_dir: str) -> pd.DataFrame:
    """Skyline layers (iterative Pareto peeling == Mirsky longest
    strict-dominance chain) over parts on (price ↓, size ↓) — the
    full multi-criteria ranking behind part_skyline; exact-integer
    DP with an O(n·|size domain|) prefix-max sweep. See
    :func:`ops.relational.pareto_layers`."""
    from web2llmstxt_ray.ops.relational import pareto_layers

    return pareto_layers(
        _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]),
        "p_partkey", "p_retailprice", "p_size", y_domain=64)


def q_dedup_transitivity(sf_dir: str) -> pd.DataFrame:
    """Transitivity audit of the sorted-neighborhood similarity graph
    (3·triangles / wedges) — the statistic that justifies or indicts
    transitive-closure dedup: low transitivity means cluster dedup
    over-merges through chains. Exact integer counts. See
    :func:`ops.dedup.pair_transitivity`."""
    from web2llmstxt_ray.ops.dedup import pair_transitivity, snm_pairs

    pairs = snm_pairs(
        _t(sf_dir, "documents", ["doc_id", "text", "n_chars"]),
        window=5, threshold=0.8)
    return pair_transitivity(pairs)


def q_huffman_lengths(sf_dir: str) -> pd.DataFrame:
    """Huffman code lengths over the event-type alphabet next to the
    entropy lower bound — the optimal-prefix-code benchmark;
    deterministic (count, min-symbol) merge rule replayed by the SQL
    twin's unrolled merges over list-typed member sets. See
    :func:`ops.lm.huffman_lengths`."""
    from web2llmstxt_ray.ops.lm import huffman_lengths

    return huffman_lengths(_t(sf_dir, "events", ["event_type"]))


def q_simpson_flags(sf_dir: str) -> pd.DataFrame:
    """Simpson's-paradox detector: per-brand qty↔discount regression
    slope vs the pooled slope, flip FLAGGED by exact integer sign
    arithmetic (the denominator is a nonnegative variance, so
    sign(slope) = sign(n·Σxy − Σx·Σy) — no float decides). See
    :func:`ops.stats.simpson_flags`."""
    from web2llmstxt_ray.ops.relational import broadcast_join
    from web2llmstxt_ray.ops.stats import simpson_flags

    part = _t(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_discount"]).map_batches(
        _rn(l_partkey="p_partkey"), batch_format="pyarrow")
    joined = broadcast_join(li, part, on="p_partkey")
    return simpson_flags(joined)


def q_cdc_dedup_ratio(sf_dir: str) -> pd.DataFrame:
    """Cross-corpus chunk-level dedup census over the gear CDC
    segmentation — the dedupable-passage fraction a chunk store would
    reclaim; chunks ship only (md5, len), one skinny hash groupby.
    See :func:`ops.substr.cdc_dedup_ratio`."""
    from web2llmstxt_ray.ops.substr import cdc_dedup_ratio

    return cdc_dedup_ratio(
        _t(sf_dir, "documents", ["doc_id", "text"]), mask_bits=6)


def q_rolling_slope_28d(sf_dir: str) -> pd.DataFrame:
    """Trailing 28-calendar-day OLS slope of daily revenue — the
    local-trend dial; exact integer window moments, one
    cast-and-divide per day. See :func:`ops.windows.rolling_slope`."""
    from web2llmstxt_ray.ops.windows import rolling_slope

    return rolling_slope(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
        window_days=28)


def q_hill_tail_index(sf_dir: str) -> pd.DataFrame:
    """Hill estimator of the document-length power-law tail index
    (k=50 upper order statistics, deterministic tie order) — the
    principled heavy-tail read next to zipf_slope's log-log
    regression. See :func:`ops.stats.hill_tail_index`."""
    from web2llmstxt_ray.ops.stats import hill_tail_index

    return hill_tail_index(
        _t(sf_dir, "documents", ["n_chars", "doc_id"]), k=50)


def q_welch_t_sources(sf_dir: str) -> pd.DataFrame:
    """One-vs-rest Welch t per source on document length — the
    parametric mean-shift companion to the KS screen; exact integer
    moments, identical float t/df expressions both sides. See
    :func:`ops.stats.welch_t_by_group`."""
    from web2llmstxt_ray.ops.stats import welch_t_by_group

    return welch_t_by_group(
        _t(sf_dir, "documents", ["n_chars", "source"]),
        "n_chars", "source")


def q_capture_recapture(sf_dir: str) -> pd.DataFrame:
    """Chapman capture-recapture estimate of the true match-pair
    count from two independent blocking samplers (first-char+length
    vs Soundex) over the planted catalog — linkage completeness
    WITHOUT enumerating the matches, compared against the planted
    ground truth. See :func:`ops.phonetic.capture_recapture`."""
    from web2llmstxt_ray.ops.phonetic import (capture_recapture,
                                              catalog_corrupt_names)

    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def registry_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        return pd.DataFrame({"name": pd.concat(
            [cd["clean"], cd["dirty"]], ignore_index=True)})

    def truth_batch(b: pd.DataFrame) -> pd.DataFrame:
        cd = catalog_corrupt_names(b)
        m = cd["clean"] != cd["dirty"]
        lo = cd["clean"].where(cd["clean"] < cd["dirty"], cd["dirty"])
        hi = cd["dirty"].where(cd["clean"] < cd["dirty"], cd["clean"])
        return pd.DataFrame({"a": lo[m].to_numpy(),
                             "b": hi[m].to_numpy()})

    registry = part.map_batches(registry_batch, batch_format="pandas")
    truth = part.map_batches(truth_batch, batch_format="pandas") \
        .groupby(["a", "b"]).map_groups(lambda g: g.head(1),
                                        batch_format="pandas")
    return capture_recapture(registry, truth, col="name")


def q_runs_test_revenue(sf_dir: str) -> pd.DataFrame:
    """Wald-Wolfowitz runs test of daily revenue around its median —
    the distribution-free serial-dependence screen (trend/cycle = too
    few runs). Exact integer run census + closed-form μ/σ; ties at
    the median drop. See :func:`ops.windows.runs_test`."""
    from web2llmstxt_ray.ops.windows import runs_test

    return runs_test(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


# The driver's correctness artifact covers the FIRST 50 entries of
# queries() in dict order. Round-5 window (the round-4 verdict's
# rotation ask): 50 queries NO prior driver artifact (r1-r4) has
# confirmed, drawn from the graph / stats / events / windows / text
# tails -- all SQL-oracled, so every slot is a rows+schema+hash check.
_R5_WINDOW = [
    # graph
    "part_bfs_hops", "sssp_hops", "two_hop_reach", "adamic_adar",
    "graph_assortativity", "local_clustering", "degree_powerlaw",
    "ppr_promo",
    # stats / distribution diagnostics
    "benford_orders", "priority_gini", "zipf_slope", "daily_acf",
    "value_psi_drift", "lang_jsd", "lang_emd", "value_auc",
    "value_calibration", "short_doc_wilson", "qty_skew_kurt",
    "priority_status_chi2", "qty_disc_spearman", "qty_disc_kendall",
    "value_ks_clicks",
    # events / sessions / attribution
    "events_dedup_window", "funnel_timeout", "peak_concurrency",
    "running_distinct_users", "weekly_active_users",
    "session_entry_exit", "bounce_rate", "first_touch_attribution",
    "linear_attribution", "ushape_attribution", "next_event_pred",
    "interarrival_stats", "late_events",
    # windowed / time-series values
    "value_cusum", "user_value_twap", "user_value_locf", "daily_ohlc",
    "value_window_ranks", "value_rolling_sum",
    # text / corpus
    "bigram_collocations", "doc_top_terms", "token_entropy",
    "oov_rate", "heaps_curve", "ttr_by_source", "mmr_sample",
    "containment_pairs",
]


def queries() -> dict[str, Callable[[str], Any]]:
    base = _queries_base()
    out = {k: base[k] for k in _R5_WINDOW}
    out.update(base)          # the rest keep their registry order
    return out


def _queries_base() -> dict[str, Callable[[str], Any]]:
    return {
        # ---- full registry (round-4 window order preserved below;
        # ---- the driver window is now defined by _R5_WINDOW above).
        "crawl_pages": q_crawl_pages,
        "crawl_spans": q_crawl_spans,
        "llms_entries": q_llms_entries,
        "pack_interleaved": q_pack_interleaved,
        "pack_sequences": q_pack_sequences,
        "ngram_jaccard": q_ngram_jaccard,
        "kmeans_clusters": q_kmeans_clusters,
        "embedding_pca": q_embedding_pca,
        "heavy_hitters": q_heavy_hitters,
        "span_flat": q_span_flat,
        "interleaved_costs": q_interleaved_costs,
        "recrawl_priorities": q_recrawl_priorities,
        "pricing_summary": q_pricing_summary,
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "similarity_join": q_similarity_join,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_topk": q_ann_topk,
        "pagerank": q_pagerank,
        "knn_join": q_knn_join,
        "bm25_scores": q_bm25_scores,
        "token_counts": q_token_counts,
        "decontaminate": q_decontaminate,
        "corpus_prep": q_corpus_prep,
        "events_sessions": q_events_sessions,
        "nation_year_profit": q_nation_year_profit,
        "hits_scores": q_hits_scores,
        "mann_whitney": q_mann_whitney,
        "ivm_groupby": q_ivm_groupby,
        "user_scd2": q_user_scd2,
        "part_skyline": q_part_skyline,
        "qty_quantiles_cont": q_qty_quantiles_cont,
        "lineitem_grouping_sets": q_lineitem_grouping_sets,
        "hybrid_search": q_hybrid_search,
        "cohort_retention": q_cohort_retention,
        "events_funnel": q_events_funnel,
        "user_journeys": q_user_journeys,
        "value_rolling_median": q_value_rolling_median,
        "lineitem_cube": q_lineitem_cube,
        "part_triangles": q_part_triangles,
        "customer_set_ops": q_customer_set_ops,
        "events_resample": q_events_resample,
        "supplier_weighted_median": q_supplier_weighted_median,
        "price_histogram": q_price_histogram,
        "market_share": q_market_share,
        "user_streaks": q_user_streaks,
        "phrase_search": q_phrase_search,
        "source_lang_kappa": q_source_lang_kappa,
        "value_peak_drawdown": q_value_peak_drawdown,
        "event_transitions": q_event_transitions,
        # ---- entries beyond the driver's first-50 window ----
        "span_kind_stats": q_span_kind_stats,
        "spans_media_stats": q_spans_media_stats,
        "media_features": q_media_features,
        "top_parts_per_type": q_top_parts_per_type,
        "segment_order_outer": q_segment_order_outer,
        "salted_brand_revenue": q_salted_brand_revenue,
        "regional_revenue": q_regional_revenue,
        "incremental_dedup": q_incremental_dedup,
        "minhash_clusters_scale": q_minhash_clusters_scale,
        "simhash_pairs": q_simhash_pairs,
        "semantic_dedup": q_semantic_dedup,
        "substring_dedup": q_substring_dedup,
        "segment_dedup": q_segment_dedup,
        "pq_topk": q_pq_topk,
        "inverted_index": q_inverted_index,
        "sparse_dot_pairs": q_sparse_dot_pairs,
        "lang_hist": q_lang_hist,
        "doc_quality": q_doc_quality,
        "repetition_stats": q_repetition_stats,
        "mixture_sample": q_mixture_sample,
        "bpe_tokens": q_bpe_tokens,
        "graph_components": q_graph_components,
        "events_asof": q_events_asof,
        "events_zorder_box": q_events_zorder_box,
        "customer_cdc": q_customer_cdc,
        "top_orders": q_top_orders,
        "segment_revenue": q_segment_revenue,
        "priority_revenue": q_priority_revenue,
        "region_suppliers": q_region_suppliers,
        "fulfilled_customers": q_fulfilled_customers,
        "part_type_stats": q_part_type_stats,
        "idle_customers": q_idle_customers,
        "customer_order_stats": q_customer_order_stats,
        "latest_events": q_latest_events,
        "orders_by_month": q_orders_by_month,
        "discount_bands": q_discount_bands,
        "orders_per_customer_hist": q_orders_per_customer_hist,
        "fingerprints": q_fingerprints,
        "quality_filter": q_quality_filter,
        "top_tokens": q_top_tokens,
        "top_tokens_by_lang": q_top_tokens_by_lang,
        "doc_sample": q_doc_sample,
        "lang_id": q_lang_id,
        "redact_terms": q_redact_terms,
        "decontaminate_ngram": q_decontaminate_ngram,
        "stratified_sample": q_stratified_sample,
        "label_centroids": q_label_centroids,
        "chars_quantiles": q_chars_quantiles,
        "events_range_counts": q_events_range_counts,
        "events_hopping": q_events_hopping,
        "events_tumbling": q_events_tumbling,
        "running_totals": q_running_totals,
        "session_stats": q_session_stats,
        "embedding_near_dup_ivf": q_embedding_near_dup_ivf,
        "simhash": q_simhash,
        "lm_quality": q_lm_quality,
        "epoch_shuffle": q_epoch_shuffle,
        "knn_join_ivf": q_knn_join_ivf,
        "dsir_sample": q_dsir_sample,
        "quantile_filter_p75": q_quantile_filter,
        "ann_ivf": q_ann_ivf,
        "shared_substrings": q_shared_substrings,
        "normalize_text": q_normalize_text,
        "value_percent_rank": q_value_percent_rank,
        "winsorized_values": q_winsorized_values,
        "compression_ratio": q_compression_ratio,
        "lineitem_rollup": q_lineitem_rollup,
        "value_lag_delta": q_value_lag_delta,
        "user_event_pivot": q_user_event_pivot,
        "value_ntile": q_value_ntile,
        "value_rolling_sum": q_value_rolling_sum,
        "event_type_mode": q_event_type_mode,
        "orders_price_bands": q_orders_price_bands,
        "qty_discount_corr": q_qty_discount_corr,
        "building_top_orders": q_building_top_orders,
        "distinct_users_by_type": q_distinct_users_by_type,
        "orders_validation": q_orders_validation,
        "value_ewma": q_value_ewma,
        "events_dedup_window": q_events_dedup_window,
        "bloom_orders_building": q_bloom_orders_building,
        "value_minmax_norm": q_value_minmax_norm,
        "value_robust_scale": q_value_robust_scale,
        "value_tdigest": q_value_tdigest,
        "media_frames": q_media_frames,
        "lineitem_profile": q_lineitem_profile,
        "top_values_with_ties": q_top_values_with_ties,
        "value_window_ranks": q_value_window_ranks,
        "events_range_read": q_events_range_read,
        "volume_shipping": q_volume_shipping,
        "large_orders": q_large_orders,
        "value_zscore": q_value_zscore,
        "qty_skew_kurt": q_qty_skew_kurt,
        "priority_status_mi": q_priority_status_mi,
        "distinct_users_hll": q_distinct_users_hll,
        "orders_above_median": q_orders_above_median,
        "weighted_doc_sample": q_weighted_doc_sample,
        "events_range_hour_sum": q_events_range_hour_sum,
        "value_mad": q_value_mad,
        "user_type_entropy": q_user_type_entropy,
        "late_ship_priority": q_late_ship_priority,
        "dormant_rich_custs": q_dormant_rich_custs,
        "top_users_by_type": q_top_users_by_type,
        "promo_revenue": q_promo_revenue,
        "small_qty_revenue": q_small_qty_revenue,
        "disjunctive_revenue": q_disjunctive_revenue,
        "waiting_suppliers": q_waiting_suppliers,
        "min_price_supplier": q_min_price_supplier,
        "events_frame_values": q_events_frame_values,
        "type_revenue_share": q_type_revenue_share,
        "part_pair_counts": q_part_pair_counts,
        "supplier_regression": q_supplier_regression,
        "value_ks_clicks": q_value_ks_clicks,
        "supplier_trimmed_mean": q_supplier_trimmed_mean,
        "orders_mom_growth": q_orders_mom_growth,
        "props_key_stats": q_props_key_stats,
        "span_transitions": q_span_transitions,
        "media_captions": q_media_captions,
        "span_doc_profile": q_span_doc_profile,
        "lineitem_corr_matrix": q_lineitem_corr_matrix,
        "source_split": q_source_split,
        "span_rechunk": q_span_rechunk,
        "mmr_sample": q_mmr_sample,
        "qty_disc_spearman": q_qty_disc_spearman,
        "priority_status_chi2": q_priority_status_chi2,
        "qty_disc_kendall": q_qty_disc_kendall,
        "value_psi_drift": q_value_psi_drift,
        "lang_jsd": q_lang_jsd,
        "lineitem_unpivot": q_lineitem_unpivot,
        "customer_intervals": q_customer_intervals,
        "doc_chunks": q_doc_chunks,
        "doc_word_matches": q_doc_word_matches,
        "time_since_purchase": q_time_since_purchase,
        "audience_overlap": q_audience_overlap,
        "bigram_collocations": q_bigram_collocations,
        "doc_top_terms": q_doc_top_terms,
        "time_to_purchase": q_time_to_purchase,
        "split_balance": q_split_balance,
        "forecast_revenue": q_forecast_revenue,
        "returned_item_revenue": q_returned_item_revenue,
        "part_revenue_concentration": q_part_revenue_concentration,
        "top_supplier": q_top_supplier,
        "promo_part_suppliers": q_promo_part_suppliers,
        "first_touch_attribution": q_first_touch_attribution,
        "part_bfs_hops": q_part_bfs_hops,
        "span_dedup": q_span_dedup,
        "running_distinct_users": q_running_distinct_users,
        "linear_attribution": q_linear_attribution,
        "name_edit_pairs": q_name_edit_pairs,
        "crawl_delta": q_crawl_delta,
        "funnel_timeout": q_funnel_timeout,
        "host_budget_allocation": q_host_budget_allocation,
        "repeat_orders_7d": q_repeat_orders_7d,
        "interleaved_corpus_prep": q_interleaved_corpus_prep,
        "part_kcore": q_part_kcore,
        "peak_concurrency": q_peak_concurrency,
        "nation_share_of_region": q_nation_share_of_region,
        "qty_quantiles_disc": q_qty_quantiles_disc,
        "ship_latency_hist": q_ship_latency_hist,
        "part_sales_classes": q_part_sales_classes,
        "span_render_text": q_span_render_text,
        "user_value_twap": q_user_value_twap,
        "crawl_new_tokens": q_crawl_new_tokens,
        "weekly_active_users": q_weekly_active_users,
        "value_cusum": q_value_cusum,
        "doclen_outliers": q_doclen_outliers,
        "price_decile_counts": q_price_decile_counts,
        "kwic_merge": q_kwic_merge,
        "containment_pairs": q_containment_pairs,
        "exact_dedup_best": q_exact_dedup_best,
        "exact_dedup_losers": q_exact_dedup_losers,
        "leakage_split": q_leakage_split,
        "span_truncate": q_span_truncate,
        "source_signature_terms": q_source_signature_terms,
        "centroid_cosine": q_centroid_cosine,
        "interarrival_stats": q_interarrival_stats,
        "benford_orders": q_benford_orders,
        "open_orders_daily": q_open_orders_daily,
        "events_asof_tol": q_events_asof_tol,
        "user_rate_peaks": q_user_rate_peaks,
        "user_value_locf": q_user_value_locf,
        "politeness_schedule": q_politeness_schedule,
        "daily_ohlc": q_daily_ohlc,
        "priority_gini": q_priority_gini,
        "zipf_slope": q_zipf_slope,
        "part_hits": q_part_hits,
        "complete_users": q_complete_users,
        "decayed_user_value": q_decayed_user_value,
        "doc_readability": q_doc_readability,
        "label_silhouette": q_label_silhouette,
        "mutual_top1": q_mutual_top1,
        "graph_assortativity": q_graph_assortativity,
        "local_clustering": q_local_clustering,
        "late_events": q_late_events,
        "adamic_adar": q_adamic_adar,
        "degree_powerlaw": q_degree_powerlaw,
        "basket_pairs": q_basket_pairs,
        "daily_acf": q_daily_acf,
        "ppr_promo": q_ppr_promo,
        "assoc_rules": q_assoc_rules,
        "session_entry_exit": q_session_entry_exit,
        "ttr_by_source": q_ttr_by_source,
        "sssp_hops": q_sssp_hops,
        "two_hop_reach": q_two_hop_reach,
        "oov_rate": q_oov_rate,
        "token_entropy": q_token_entropy,
        "km_repeat": q_km_repeat,
        "part_communities": q_part_communities,
        "source_cosine": q_source_cosine,
        "price_power_means": q_price_power_means,
        "lang_emd": q_lang_emd,
        "value_auc": q_value_auc,
        "gap_expfit": q_gap_expfit,
        "hrw_shards": q_hrw_shards,
        "dup_rate_by_source": q_dup_rate_by_source,
        "heaps_curve": q_heaps_curve,
        "batch_novelty": q_batch_novelty,
        "event_trigrams": q_event_trigrams,
        "demand_classes": q_demand_classes,
        "bag_dedup": q_bag_dedup,
        "dup_cluster_hist": q_dup_cluster_hist,
        "value_calibration": q_value_calibration,
        "bounce_rate": q_bounce_rate,
        "lsh_buckets": q_lsh_buckets,
        "next_event_pred": q_next_event_pred,
        "rfm_segments": q_rfm_segments,
        "hapax_by_source": q_hapax_by_source,
        "hourly_peaks": q_hourly_peaks,
        "short_doc_wilson": q_short_doc_wilson,
        "value_top_share": q_value_top_share,
        "type_supplier_hhi": q_type_supplier_hhi,
        "ushape_attribution": q_ushape_attribution,
        "emb_norm_profile": q_emb_norm_profile,
        "blocking_cost": q_blocking_cost,
        "block_skew": q_block_skew,
        "frequent_tokens": q_frequent_tokens,
        "cohort_ltv": q_cohort_ltv,
        "discount_qty_profile": q_discount_qty_profile,
        "degree_hist": q_degree_hist,
        "daily_value_bands": q_daily_value_bands,
        "prefix_dups": q_prefix_dups,
        "join_size_audit": q_join_size_audit,
        "dim_drift": q_dim_drift,
        "char_entropy": q_char_entropy,
        "source_tail": q_source_tail,
        "sorted_audit": q_sorted_audit,
        "source_coverage": q_source_coverage,
        "transition_gaps": q_transition_gaps,
        "quota_split": q_quota_split,
        "dau_overlap": q_dau_overlap,
        "new_vs_returning": q_new_vs_returning,
        "source_lang_purity": q_source_lang_purity,
        "knn_label_acc": q_knn_label_acc,
        "part_substitutes": q_part_substitutes,
        "trend_robust": q_trend_robust,
        "change_point": q_change_point,
        "name_edit2_pairs": q_name_edit2_pairs,
        "frequent_triples": q_frequent_triples,
        "dow_anomaly": q_dow_anomaly,
        "source_overlap": q_source_overlap,
        "fd_source_lang": q_fd_source_lang,
        "cluster_db_index": q_cluster_db_index,
        "source_fairness": q_source_fairness,
        "next_event_entropy": q_next_event_entropy,
        # ---- round-4 wave 29 ----
        "token_budget_sample": q_token_budget_sample,
        "conformal_threshold": q_conformal_threshold,
        "source_set_cover": q_source_set_cover,
        "curriculum_schedule": q_curriculum_schedule,
        "padding_waste": q_padding_waste,
        "contamination_attribution": q_contamination_attribution,
        "shuffle_run_lengths": q_shuffle_run_lengths,
        "kcenter_coreset": q_kcenter_coreset,
        # wave 36 (round 5): record linkage + density + chain families
        "snm_pairs": q_snm_pairs,
        "soundex_blocks": q_soundex_blocks,
        "jw_catalog_dups": q_jw_catalog_dups,
        "dbscan_clusters": q_dbscan_clusters,
        "markov_stationary": q_markov_stationary,
        # wave 37: eval + resampling families
        "medoid_per_label": q_medoid_per_label,
        "ndcg_label": q_ndcg_label,
        "rbo_rankings": q_rbo_rankings,
        "poisson_bootstrap": q_poisson_bootstrap,
        "blocking_quality": q_blocking_quality,
        # wave 38: placement + robust-fit + dominance + FDR + ER
        "entity_resolution": q_entity_resolution,
        "jump_hash_shards": q_jump_hash_shards,
        "huber_trend": q_huber_trend,
        "dominance_counts": q_dominance_counts,
        "fdr_bh": q_fdr_bh,
        # wave 39: calibration + FS weights + hampel + CDC chunking
        "isotonic_calibration": q_isotonic_calibration,
        "fs_weights": q_fs_weights,
        "hampel_anomalies": q_hampel_anomalies,
        "gear_cdc_chunks": q_gear_cdc_chunks,
        # wave 40: DP + sequence-mass + layout families
        "max_revenue_run": q_max_revenue_run,
        "voptimal_histogram": q_voptimal_histogram,
        "subsequence_counts": q_subsequence_counts,
        "hilbert_order": q_hilbert_order,
        # wave 41: sketch-with-truth + integrity + held-out LM
        "bottomk_jaccard": q_bottomk_jaccard,
        "merkle_levels": q_merkle_levels,
        "lm_heldout_ppl": q_lm_heldout_ppl,
        # wave 42: DP + forecasting-eval + rank-fusion families
        "interval_scheduling": q_interval_scheduling,
        "lis_revenue": q_lis_revenue,
        "mase_weekly": q_mase_weekly,
        "borda_fusion": q_borda_fusion,
        # wave 43: ranking-depth + audit + info-theory families
        "pareto_layers": q_pareto_layers,
        "dedup_transitivity": q_dedup_transitivity,
        "huffman_lengths": q_huffman_lengths,
        "simpson_flags": q_simpson_flags,
        # wave 44: chunk-dedup census + local trend + tail index
        "cdc_dedup_ratio": q_cdc_dedup_ratio,
        "rolling_slope_28d": q_rolling_slope_28d,
        "hill_tail_index": q_hill_tail_index,
        # wave 45: parametric screen + capture-recapture + runs test
        "welch_t_sources": q_welch_t_sources,
        "capture_recapture": q_capture_recapture,
        "runs_test_revenue": q_runs_test_revenue,
    }


_STOPLIST_SQL = "['the','and','of','to','a','in','is','it','for','on']"
_SUBTOKEN_RE = "[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+"


def _lang_id_oracle() -> str:
    """DuckDB twin of ops.textstats.detect_language, generated from
    _LANG_PROFILES (see q_lang_id docstring)."""
    from web2llmstxt_ray.ops.textstats import _LANG_PROFILES

    def esc(x: str) -> str:
        return x.replace("'", "''")

    parts = []
    for lang in sorted(_LANG_PROFILES):
        tri, stop = _LANG_PROFILES[lang]
        tri_sum = " + ".join(
            f"CASE WHEN contains(low, '{esc(g)}') THEN 1 ELSE 0 END"
            for g in sorted(tri))
        stop_list = ", ".join(f"'{esc(w)}'" for w in sorted(stop))
        parts.append(f"""
          SELECT doc_id, '{lang}' AS lang,
                 2.0 * (SELECT count(DISTINCT tok) FROM toks t
                        WHERE t.doc_id = l.doc_id
                          AND t.tok IN ({stop_list}))
                 + ({tri_sum}) AS score
          FROM l""")
    return f"""
        WITH s AS (SELECT doc_id,
                          substr(coalesce(text, ''), 1, 1000) AS samp
                   FROM documents),
        l AS (SELECT doc_id, samp, lower(samp) AS low FROM s),
        toks AS (SELECT doc_id,
                        unnest(string_split_regex(low, '\\s+')) AS tok
                 FROM l),
        cjk AS (SELECT doc_id,
                       length(regexp_replace(
                           samp, '[^\\x{{4E00}}-\\x{{9FFF}}]', '',
                           'g')) AS nc,
                       length(samp) AS n FROM l),
        scores AS ({" UNION ALL ".join(parts)}),
        best AS (SELECT doc_id, lang, score FROM scores
                 QUALIFY row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, lang) = 1)
        SELECT s.doc_id,
               CASE WHEN c.nc > 0.05 * greatest(c.n, 1) THEN 'zh'
                    WHEN b.score > 0 THEN b.lang
                    ELSE 'unknown' END AS predicted_lang
        FROM s JOIN cjk c USING (doc_id) JOIN best b USING (doc_id)
    """


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), {ROUND_SUM}) AS sum_qty,
                   round(sum(l_extendedprice), {ROUND_SUM}) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), {ROUND_SUM}) AS sum_disc_price,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), {ROUND_RATIO}) AS avg_qty,
                   round(sum(l_extendedprice) / count(*), {ROUND_RATIO}) AS avg_price
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": f"""
            SELECT o_orderkey, round(o_totalprice, {ROUND_SUM}) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "segment_revenue": f"""
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), {ROUND_SUM}) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "priority_revenue": f"""
            SELECT o_orderpriority, count(*) AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), {ROUND_SUM}) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "region_suppliers": f"""
            SELECT r_name, count(*) AS n_suppliers,
                   round(sum(s_acctbal), {ROUND_SUM}) AS total_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "fulfilled_customers": f"""
            SELECT c_mktsegment, count(*) AS n_customers,
                   round(sum(c_acctbal), {ROUND_SUM}) AS sum_acctbal,
                   round(sum(c_acctbal) / count(*), {ROUND_RATIO}) AS avg_acctbal
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F')
            GROUP BY c_mktsegment
        """,
        "part_type_stats": f"""
            SELECT p_type, count(*) AS n_parts,
                   round(sum(p_retailprice), {ROUND_SUM}) AS sum_retail,
                   round(sum(p_retailprice) / count(*), {ROUND_RATIO}) AS avg_retail
            FROM part WHERE p_size < 30 GROUP BY p_type
        """,
        "idle_customers": f"""
            SELECT c_custkey, round(c_acctbal, {ROUND_SUM}) AS c_acctbal
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 300000)
        """,
        "customer_order_stats": f"""
            SELECT c.c_custkey,
                   count(o.o_totalprice) AS n_orders,
                   round(coalesce(sum(o.o_totalprice), 0), {ROUND_SUM})
                       AS total_spent
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        """,
        "latest_events": f"""
            SELECT user_id, event_id, ts, event_type,
                   round(value, {ROUND_RATIO}) AS value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY ts DESC, event_id ASC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "orders_by_month": f"""
            SELECT date_trunc('month', o_orderdate) AS order_month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), {ROUND_SUM}) AS revenue
            FROM orders GROUP BY date_trunc('month', o_orderdate)
        """,
        "discount_bands": f"""
            SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                        WHEN l_discount < 0.07 THEN 'mid'
                        ELSE 'high' END AS discount_band,
                   count(*) AS n_items,
                   round(sum(l_extendedprice), {ROUND_SUM}) AS total_price
            FROM lineitem
            GROUP BY CASE WHEN l_discount < 0.03 THEN 'low'
                          WHEN l_discount < 0.07 THEN 'mid'
                          ELSE 'high' END
        """,
        "orders_per_customer_hist": """
            SELECT n AS orders_per_customer, count(*) AS n_customers
            FROM (SELECT o_custkey, count(*) AS n FROM orders
                  GROUP BY o_custkey)
            GROUP BY n
        """,
        "top_parts_per_type": f"""
            SELECT p_type, rank, p_partkey,
                   round(p_retailprice, {ROUND_SUM}) AS p_retailprice
            FROM (SELECT p_type, p_partkey, p_retailprice,
                         CAST(row_number() OVER (
                             PARTITION BY p_type
                             ORDER BY p_retailprice DESC, p_partkey)
                             AS BIGINT) AS rank
                  FROM part)
            WHERE rank <= 3
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
            FROM documents GROUP BY md5(text)
        """,
        "bm25_scores": """
            WITH dl AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS len
                FROM documents
            ),
            stats AS (
                SELECT count(*) AS n, sum(len) * 1.0 / count(*) AS avgdl
                FROM dl
            ),
            toks AS (
                SELECT doc_id, t.tok
                FROM documents,
                     LATERAL unnest(string_split_regex(trim(text), '\\s+'))
                         AS t(tok)
                WHERE trim(text) <> ''
            ),
            q(term) AS (
                SELECT unnest(['table', 'hash', 'merge', 'window'])
            ),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS df FROM toks
                WHERE tok IN (SELECT term FROM q) GROUP BY tok
            ),
            tf AS (
                SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok IN (SELECT term FROM q) GROUP BY doc_id, tok
            )
            SELECT tf.doc_id, tf.tok AS term,
                   ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * dl.len / stats.avgdl))
                       AS score
            FROM tf
            JOIN df ON tf.tok = df.tok
            JOIN dl ON tf.doc_id = dl.doc_id, stats
        """,
        "graph_components": """
            WITH RECURSIVE
            edges AS (
                SELECT doc_id AS a, doc_id - 1 AS b
                FROM documents WHERE doc_id % 8 <> 0
            ),
            und AS (
                SELECT a, b FROM edges
                UNION
                SELECT b AS a, a AS b FROM edges
            ),
            reach(node, comp) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.a, r.comp FROM und u JOIN reach r ON u.b = r.node
            )
            SELECT node, min(comp) AS component
            FROM reach GROUP BY node ORDER BY node
        """,
        "incremental_dedup": """
            SELECT d.doc_id,
                   CAST(EXISTS (SELECT 1 FROM documents p
                                WHERE p.doc_id % 3 = 0
                                  AND p.text = d.text)
                        AS BIGINT) AS is_dup
            FROM documents d WHERE d.doc_id % 3 <> 0
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "token_counts": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_tokens,
                   len(regexp_extract_all(text, '{_SUBTOKEN_RE}')) AS n_subtokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars2,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_words,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE round((length(text) -
                             length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                             / length(text), {ROUND_RATIO}) END AS punct_ratio,
                   CASE WHEN trim(text) = '' THEN 0.0
                        ELSE round(len(list_filter(
                                 string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> list_contains({_STOPLIST_SQL}, x)))
                             / len(string_split_regex(trim(text), '\\s+')),
                             {ROUND_RATIO}) END AS stop_ratio,
                   CASE WHEN trim(text) = '' THEN 0.0
                        ELSE round(list_aggregate(list_transform(
                                 string_split_regex(trim(text), '\\s+'),
                                 x -> length(x)), 'sum')
                             / len(string_split_regex(trim(text), '\\s+')),
                             {ROUND_RATIO}) END AS mean_word_len
            FROM documents
        """,
        "quality_filter": f"""
            WITH scored AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END
                           AS n_words,
                       CASE WHEN length(text) = 0 THEN 0.0
                            ELSE round((length(text) -
                                 length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                                 / length(text), {ROUND_RATIO}) END AS punct_ratio,
                       CASE WHEN trim(text) = '' THEN 0.0
                            ELSE round(list_aggregate(list_transform(
                                     string_split_regex(trim(text), '\\s+'),
                                     x -> length(x)), 'sum')
                                 / len(string_split_regex(trim(text), '\\s+')),
                                 {ROUND_RATIO}) END AS mean_word_len
                FROM documents)
            SELECT doc_id, n_words, punct_ratio, mean_word_len FROM scored
            WHERE n_words >= 20 AND punct_ratio <= 0.2
              AND mean_word_len BETWEEN 2.0 AND 12.0
        """,
        "lang_hist": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "quantile_filter_p75": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.75)
                              FROM documents)
        """,
        "lineitem_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1
                            ELSE 0 END) AS BIGINT) AS click_n,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1
                            ELSE 0 END) AS BIGINT) AS error_n,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS purchase_n,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1
                            ELSE 0 END) AS BIGINT) AS signup_n,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1
                            ELSE 0 END) AS BIGINT) AS view_n
            FROM events GROUP BY user_id
        """,
        "lineitem_cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "value_ntile": """
            SELECT event_id, user_id,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
                        AS BIGINT) AS tile
            FROM events
        """,
        "value_rolling_median": """
            SELECT event_id, user_id,
                   CAST(median(cents) OVER w AS DOUBLE) AS win_med_cents,
                   CAST(count(*) OVER w AS BIGINT) AS win_n
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "orders_above_median": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                  FROM orders)
            QUALIFY cents > median(cents) OVER (PARTITION BY o_custkey)
        """,
        "weighted_doc_sample": """
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       ln((((doc_id * 2654435761) % 4294967296) + 0.5)
                          / 4294967296.0) / n_chars AS k
                FROM documents WHERE n_chars > 0
                ORDER BY k DESC, doc_id LIMIT 100)
            ORDER BY doc_id
        """,
        "events_range_hour_sum": """
            SELECT event_id, user_id,
                   CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
                   CAST(count(*) OVER w AS BIGINT) AS win_n
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
        """,
        "value_peak_drawdown": """
            SELECT event_id, user_id,
                   CAST(max(cents) OVER w AS BIGINT) AS peak_cents,
                   CAST(max(cents) OVER w - cents AS BIGINT)
                       AS drawdown_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "user_streaks": """
            WITH days AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
            numbered AS (
                SELECT user_id, day,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS rn
                FROM days)
            SELECT user_id,
                   CAST(min(day) AS BIGINT) AS streak_start_day,
                   CAST(max(day) AS BIGINT) AS streak_end_day,
                   CAST(count(*) AS BIGINT) AS n_days
            FROM numbered GROUP BY user_id, day - rn
        """,
        "event_transitions": """
            SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_type
                  FROM events)
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        """,
        "value_mad": """
            WITH c AS (SELECT user_id,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events),
            m AS (SELECT user_id, median(cents) AS med
                  FROM c GROUP BY user_id)
            SELECT c.user_id,
                   CAST(any_value(m.med) AS DOUBLE) AS med_cents,
                   CAST(median(abs(c.cents - m.med)) AS DOUBLE)
                       AS mad_cents
            FROM c JOIN m USING (user_id)
            GROUP BY c.user_id
        """,
        "user_type_entropy": """
            WITH cnt AS (SELECT user_id, event_type,
                                CAST(count(*) AS BIGINT) AS c
                         FROM events GROUP BY user_id, event_type),
            tot AS (SELECT user_id, sum(c) AS t FROM cnt
                    GROUP BY user_id)
            SELECT cnt.user_id,
                   -sum((CAST(c AS DOUBLE) / t)
                        * ln(CAST(c AS DOUBLE) / t)) AS entropy,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM cnt JOIN tot USING (user_id)
            GROUP BY cnt.user_id
        """,
        "late_ship_priority": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate
                                             + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
        """,
        "dormant_rich_custs": """
            WITH cents AS (SELECT c_custkey, c_nationkey,
                                  CAST(round(c_acctbal * 100) AS BIGINT)
                                      AS bal
                           FROM customer),
            pos AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(bal) AS BIGINT) AS s
                    FROM cents WHERE bal > 0)
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
                   CAST(sum(bal) AS BIGINT) AS total_bal_cents
            FROM cents, pos
            WHERE bal * n > s
              AND c_custkey NOT IN (
                  SELECT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '2000-06-01')
            GROUP BY c_nationkey
        """,
        "supplier_weighted_median": """
            WITH g AS (SELECT l_suppkey,
                              CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS v,
                              CAST(sum(CAST(round(l_quantity)
                                            AS BIGINT)) AS BIGINT) AS w
                       FROM lineitem GROUP BY l_suppkey, v),
            c AS (SELECT l_suppkey, v, w,
                         sum(w) OVER (PARTITION BY l_suppkey
                                      ORDER BY v) AS cw,
                         sum(w) OVER (PARTITION BY l_suppkey) AS tw
                  FROM g)
            SELECT l_suppkey,
                   CAST(min(v) FILTER (WHERE 2 * cw >= tw) AS BIGINT)
                       AS wmedian_cents,
                   CAST(any_value(tw) AS BIGINT) AS total_weight
            FROM c GROUP BY l_suppkey
        """,
        "price_histogram": """
            WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents FROM orders),
            mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
            SELECT bin,
                   CAST(lo + bin * (hi - lo + 1) // 20 AS BIGINT)
                       AS bin_lo_cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT least(19, (cents - lo) * 20
                                    // (hi - lo + 1)) AS bin, lo, hi
                  FROM c, mm)
            GROUP BY bin, lo, hi
        """,
        "top_users_by_type": """
            SELECT event_type, user_id, CAST(cnt AS BIGINT) AS cnt,
                   CAST(rnk AS BIGINT) AS rnk
            FROM (SELECT event_type, user_id, count(*) AS cnt,
                         row_number() OVER (PARTITION BY event_type
                             ORDER BY count(*) DESC, user_id) AS rnk
                  FROM events GROUP BY event_type, user_id)
            WHERE rnk <= 3
        """,
        "nation_year_profit": """
            SELECT n_name,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS BIGINT))
                       - CAST(round(p_retailprice * 100) AS BIGINT)
                         * 100 * CAST(round(l_quantity) AS BIGINT))
                       AS BIGINT) AS profit_i
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY n_name, o_year
        """,
        "market_share": """
            WITH v AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS BIGINT)) AS vol,
                       CASE WHEN s_nationkey = 3 THEN 1 ELSE 0 END
                           AS from_nat
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                WHERE cn.n_regionkey = 3 AND p_type = 'PROMO'
                  AND year(o_orderdate) IN (1996, 1997))
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   CAST(sum(vol) AS BIGINT) AS vol_i,
                   CAST(sum(vol * from_nat) AS BIGINT) AS nat_i,
                   CAST(sum(vol * from_nat) AS DOUBLE)
                       / CAST(sum(vol) AS DOUBLE) AS mkt_share
            FROM v GROUP BY o_year
        """,
        "promo_revenue": """
            WITH v AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS BIGINT)) AS vol,
                       CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END
                           AS isp
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01')
            SELECT CAST(sum(vol * isp) AS BIGINT) AS promo_i,
                   CAST(sum(vol) AS BIGINT) AS total_i,
                   100.0 * CAST(sum(vol * isp) AS DOUBLE)
                       / CAST(sum(vol) AS DOUBLE) AS promo_pct
            FROM v
        """,
        "small_qty_revenue": """
            WITH bp AS (SELECT p_partkey FROM part
                        WHERE p_brand = 'Brand#5'),
            st AS (SELECT l_partkey,
                          sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
                          count(*) AS n
                   FROM lineitem
                   JOIN bp ON l_partkey = p_partkey
                   GROUP BY l_partkey),
            sel AS (SELECT CAST(round(l_extendedprice * 100)
                                AS BIGINT) AS cents
                    FROM lineitem JOIN st USING (l_partkey)
                    WHERE 5 * CAST(round(l_quantity) AS BIGINT) * n
                          < sq)
            SELECT CAST(coalesce(sum(cents), 0) AS BIGINT)
                       AS sum_cents_i,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(coalesce(sum(cents), 0) AS DOUBLE)
                       / 100.0 / 7.0 AS avg_yearly
            FROM sel
        """,
        "disjunctive_revenue": """
            SELECT CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS BIGINT))), 0) AS BIGINT)
                       AS revenue_i,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 25)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                   AND l_quantity BETWEEN 20 AND 35)
        """,
        "waiting_suppliers": """
            WITH l AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                              max(CASE WHEN l_shipdate
                                       > o_orderdate
                                         + INTERVAL 60 DAY
                                       THEN 1 ELSE 0 END) AS late
                       FROM lineitem
                       JOIN orders ON l_orderkey = o_orderkey
                       WHERE o_orderstatus = 'F'
                       GROUP BY 1, 2),
            o AS (SELECT ok, count(*) AS ns, sum(late) AS nl
                  FROM l GROUP BY ok)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM l JOIN o USING (ok)
            JOIN supplier ON sk = s_suppkey
            WHERE ns >= 2 AND nl = 1 AND late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        "min_price_supplier": """
            WITH m AS (SELECT l_partkey,
                              CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS pc,
                              l_suppkey,
                              row_number() OVER (
                                  PARTITION BY l_partkey
                                  ORDER BY round(l_extendedprice
                                                 * 100),
                                           l_suppkey) AS rn
                       FROM lineitem
                       JOIN part ON l_partkey = p_partkey
                       WHERE p_size = 10)
            SELECT l_partkey AS p_partkey,
                   CAST(pc AS BIGINT) AS price_cents, s_name, n_name
            FROM m
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE rn = 1
        """,
        "events_frame_values": """
            SELECT event_id, user_id,
                   first_value(cents) OVER w AS first_cents,
                   CAST(nth_value(cents, 2) OVER w AS DOUBLE)
                       AS nth2_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "type_revenue_share": """
            SELECT event_id, event_type, cents,
                   CAST(cents AS DOUBLE) / CAST(total AS DOUBLE)
                       AS pct
            FROM (SELECT event_id, event_type,
                         CAST(round(value * 100) AS BIGINT) AS cents,
                         sum(CAST(round(value * 100) AS BIGINT))
                             OVER (PARTITION BY event_type) AS total
                  FROM events)
        """,
        "part_pair_counts": """
            WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM lineitem)
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM d a JOIN d b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY cnt DESC, item_a, item_b
            LIMIT 20
        """,
        "supplier_regression": """
            WITH i AS (SELECT l_suppkey,
                              CAST(round(l_quantity) AS BIGINT) AS x,
                              CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS y
                       FROM lineitem),
            m AS (SELECT l_suppkey, count(*) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x*x) AS sxx, sum(y*y) AS syy,
                         sum(x*y) AS sxy
                  FROM i GROUP BY l_suppkey)
            SELECT l_suppkey, CAST(n AS BIGINT) AS n,
                   round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(n*sxx - sx*sx AS DOUBLE), 6)
                       AS slope,
                   round((CAST(sy AS DOUBLE)
                          - (CAST(n*sxy - sx*sy AS DOUBLE)
                             / CAST(n*sxx - sx*sx AS DOUBLE))
                            * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 6) AS intercept,
                   round(CAST((n*sxy - sx*sy) * (n*sxy - sx*sy)
                              AS DOUBLE)
                         / CAST((n*sxx - sx*sx) * (n*syy - sy*sy)
                                AS DOUBLE), 6) AS r2
            FROM m
        """,
        "value_ks_clicks": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT)
                           AS cents,
                              count(*) FILTER
                                  (WHERE event_type = 'click') AS ca,
                              count(*) FILTER
                                  (WHERE event_type = 'view') AS cb
                       FROM events
                       WHERE event_type IN ('click', 'view')
                       GROUP BY cents),
            t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
            s AS (SELECT sum(ca) OVER (ORDER BY cents) AS cca,
                         sum(cb) OVER (ORDER BY cents) AS ccb
                  FROM c)
            SELECT CAST(max(abs(cca*nb - ccb*na)) AS BIGINT)
                       AS ks_num,
                   CAST(any_value(na) AS BIGINT) AS n_a,
                   CAST(any_value(nb) AS BIGINT) AS n_b,
                   CAST(max(abs(cca*nb - ccb*na)) AS DOUBLE)
                       / (CAST(any_value(na) AS DOUBLE)
                          * CAST(any_value(nb) AS DOUBLE)) AS ks_d
            FROM s, t
        """,
        "supplier_trimmed_mean": """
            WITH r AS (SELECT l_suppkey,
                              CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS cents,
                              row_number() OVER (
                                  PARTITION BY l_suppkey
                                  ORDER BY round(l_extendedprice
                                                 * 100)) AS rn,
                              count(*) OVER (PARTITION BY l_suppkey)
                                  AS n
                       FROM lineitem)
            SELECT l_suppkey,
                   CAST(sum(cents) AS BIGINT) AS trim_sum_i,
                   CAST(count(*) AS BIGINT) AS trim_n,
                   CAST(sum(cents) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS trim_mean
            FROM r
            WHERE rn > n * 10 // 100 AND rn <= n - n * 10 // 100
            GROUP BY l_suppkey
        """,
        "lineitem_grouping_sets": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                    ())
        """,
        "props_key_stats": """
            WITH e AS (SELECT event_type,
                              CAST(props->>'$.k' AS BIGINT) AS k
                       FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM e GROUP BY event_type
        """,
        "span_transitions": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id, i,
                       CASE WHEN i % 3 = 2 THEN 'image'
                            ELSE 'text' END AS kind
                FROM flat),
            t AS (
                SELECT kind,
                       LAG(kind) OVER (PARTITION BY doc_id
                                       ORDER BY i) AS prev_kind
                FROM spans)
            SELECT prev_kind, kind AS next_kind,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM t WHERE prev_kind IS NOT NULL
            GROUP BY prev_kind, kind
            ORDER BY prev_kind, next_kind
        """,
        "media_captions": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id, i,
                       CASE WHEN i % 3 = 2 THEN 'image'
                            ELSE 'text' END AS kind,
                       CASE WHEN i % 3 = 2 THEN ''
                            ELSE substr(full_text,
                                        CAST(i * 64 + 1 AS INT), 64)
                            END AS text,
                       CASE WHEN i % 3 = 2
                            THEN 'media://' || doc_id || '/'
                                 || CAST(i AS VARCHAR)
                            ELSE '' END AS media_ref
                FROM flat),
            w AS (
                SELECT doc_id, i, kind, media_ref,
                       coalesce(LAG(text) OVER (PARTITION BY doc_id
                                                ORDER BY i),
                                '') AS prev_text,
                       coalesce(LEAD(text) OVER (PARTITION BY doc_id
                                                 ORDER BY i),
                                '') AS next_text
                FROM spans)
            SELECT doc_id, i AS span_idx, media_ref, prev_text,
                   next_text
            FROM w WHERE kind = 'image'
        """,
        "span_doc_profile": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id, i,
                       CASE WHEN i % 3 = 2 THEN 'image'
                            ELSE 'text' END AS kind,
                       CASE WHEN i % 3 = 2 THEN ''
                            ELSE substr(full_text,
                                        CAST(i * 64 + 1 AS INT), 64)
                            END AS text
                FROM flat),
            l AS (
                SELECT doc_id, kind, length(text) AS tc,
                       LAG(kind) OVER (PARTITION BY doc_id
                                       ORDER BY i) AS pk
                FROM spans)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(CASE WHEN kind = 'image' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_media,
                   CAST(sum(tc) AS BIGINT) AS text_chars,
                   CAST(1 + sum(CASE WHEN pk IS NOT NULL
                                      AND pk <> kind THEN 1
                                     ELSE 0 END) AS BIGINT) AS n_runs
            FROM l GROUP BY doc_id
        """,
        "lineitem_corr_matrix": """
            WITH x AS (
                SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
                       CAST(round(l_extendedprice * 100)
                            AS BIGINT) AS price_c,
                       CAST(round(l_discount * 100) AS BIGINT)
                           AS disc_pct,
                       CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
                FROM lineitem),
            m AS (
                SELECT CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(qty) AS HUGEINT) AS s0,
                       CAST(sum(price_c) AS HUGEINT) AS s1,
                       CAST(sum(disc_pct) AS HUGEINT) AS s2,
                       CAST(sum(tax_pct) AS HUGEINT) AS s3,
                       sum(CAST(qty AS HUGEINT) * qty) AS s00,
                       sum(CAST(price_c AS HUGEINT) * price_c) AS s11,
                       sum(CAST(disc_pct AS HUGEINT) * disc_pct) AS s22,
                       sum(CAST(tax_pct AS HUGEINT) * tax_pct) AS s33,
                       sum(CAST(qty AS HUGEINT) * price_c) AS s01,
                       sum(CAST(qty AS HUGEINT) * disc_pct) AS s02,
                       sum(CAST(qty AS HUGEINT) * tax_pct) AS s03,
                       sum(CAST(price_c AS HUGEINT) * disc_pct) AS s12,
                       sum(CAST(price_c AS HUGEINT) * tax_pct) AS s13,
                       sum(CAST(disc_pct AS HUGEINT) * tax_pct) AS s23
                FROM x)
            SELECT col_x, col_y,
                   CAST(num AS DOUBLE)
                   / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
                       AS corr
            FROM (
                SELECT 'qty' AS col_x, 'price_c' AS col_y,
                       n * s01 - s0 * s1 AS num,
                       n * s00 - s0 * s0 AS vx,
                       n * s11 - s1 * s1 AS vy FROM m
                UNION ALL
                SELECT 'qty', 'disc_pct', n * s02 - s0 * s2,
                       n * s00 - s0 * s0, n * s22 - s2 * s2 FROM m
                UNION ALL
                SELECT 'qty', 'tax_pct', n * s03 - s0 * s3,
                       n * s00 - s0 * s0, n * s33 - s3 * s3 FROM m
                UNION ALL
                SELECT 'price_c', 'disc_pct', n * s12 - s1 * s2,
                       n * s11 - s1 * s1, n * s22 - s2 * s2 FROM m
                UNION ALL
                SELECT 'price_c', 'tax_pct', n * s13 - s1 * s3,
                       n * s11 - s1 * s1, n * s33 - s3 * s3 FROM m
                UNION ALL
                SELECT 'disc_pct', 'tax_pct', n * s23 - s2 * s3,
                       n * s22 - s2 * s2, n * s33 - s3 * s3 FROM m)
        """,
        "source_split": """
            SELECT doc_id, source,
                   CASE WHEN CAST(('0x' || substr(md5(source), 1, 8))
                                  AS UBIGINT) % 100 < 80
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        """,
        "hybrid_search": """
            WITH dl AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text),
                                                        '\\s+'))
                       END AS len
                FROM documents),
            stats AS (
                SELECT count(*) AS n, sum(len) * 1.0 / count(*) AS avgdl
                FROM dl),
            toks AS (
                SELECT doc_id, t.tok
                FROM documents,
                     LATERAL unnest(string_split_regex(trim(text),
                                                       '\\s+'))
                         AS t(tok)
                WHERE trim(text) <> ''),
            q(term) AS (
                SELECT unnest(['table', 'hash', 'merge', 'window'])),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS df FROM toks
                WHERE tok IN (SELECT term FROM q) GROUP BY tok),
            tf AS (
                SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok IN (SELECT term FROM q)
                GROUP BY doc_id, tok),
            ts AS (
                SELECT tf.doc_id, tf.tok AS term,
                       ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * (1.2 + 1)
                           / (tf.tf + 1.2 * (1 - 0.75
                                             + 0.75 * dl.len
                                               / stats.avgdl)) AS score
                FROM tf
                JOIN df ON tf.tok = df.tok
                JOIN dl ON tf.doc_id = dl.doc_id, stats),
            pv AS (
                SELECT doc_id,
                       max(CASE WHEN term = 'hash' THEN score END) AS s0,
                       max(CASE WHEN term = 'merge' THEN score END) AS s1,
                       max(CASE WHEN term = 'table' THEN score END) AS s2,
                       max(CASE WHEN term = 'window' THEN score END)
                           AS s3
                FROM ts GROUP BY doc_id),
            bm AS (
                SELECT doc_id,
                       ((coalesce(s0, 0) + coalesce(s1, 0))
                        + coalesce(s2, 0)) + coalesce(s3, 0) AS s
                FROM pv),
            brk AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY s DESC, doc_id) AS r
                FROM bm QUALIFY r <= 50),
            qv AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings
                   WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
            sims AS (
                SELECT e.vec_id,
                       list_cosine_similarity(
                           CAST(qv.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS cos
                FROM embeddings e, qv WHERE e.vec_id != qv.qid),
            vrk AS (
                SELECT vec_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id) AS r
                FROM sims QUALIFY r <= 50),
            f AS (
                SELECT coalesce(b.doc_id, v.vec_id) AS doc_id,
                       (CASE WHEN b.r IS NULL THEN 0
                             ELSE 1.0 / (60 + b.r) END)
                       + (CASE WHEN v.r IS NULL THEN 0
                               ELSE 1.0 / (60 + v.r) END) AS rrf_score,
                       CAST(b.r AS DOUBLE) AS lex_rank,
                       CAST(v.r AS DOUBLE) AS vec_rank
                FROM brk b FULL OUTER JOIN vrk v ON b.doc_id = v.vec_id)
            SELECT doc_id, rrf_score, lex_rank, vec_rank
            FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20
        """,
        "qty_disc_spearman": """
            WITH x AS (
                SELECT CAST(round(l_quantity) AS BIGINT) AS xv,
                       CAST(round(l_discount * 100) AS BIGINT) AS yv
                FROM lineitem),
            r AS (
                SELECT 2 * rank() OVER (ORDER BY xv) - 2
                       + count(*) OVER (PARTITION BY xv) + 1 AS rx,
                       2 * rank() OVER (ORDER BY yv) - 2
                       + count(*) OVER (PARTITION BY yv) + 1 AS ry
                FROM x),
            m AS (
                SELECT CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(rx) AS HUGEINT) AS sx,
                       CAST(sum(ry) AS HUGEINT) AS sy,
                       sum(CAST(rx AS HUGEINT) * rx) AS sxx,
                       sum(CAST(ry AS HUGEINT) * ry) AS syy,
                       sum(CAST(rx AS HUGEINT) * ry) AS sxy
                FROM r)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                       AS spearman
            FROM m
        """,
        "priority_status_chi2": """
            WITH o AS (SELECT o_orderpriority AS a, o_orderstatus AS b
                       FROM orders),
            tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM o),
            obs AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS ob
                    FROM o GROUP BY a, b),
            rs AS (SELECT a, CAST(count(*) AS HUGEINT) AS r
                   FROM o GROUP BY a),
            cs AS (SELECT b, CAST(count(*) AS HUGEINT) AS c
                   FROM o GROUP BY b),
            cells AS (
                SELECT rs.a, cs.b, coalesce(obs.ob, 0) AS ob,
                       rs.r, cs.c
                FROM rs CROSS JOIN cs
                LEFT JOIN obs ON obs.a = rs.a AND obs.b = cs.b),
            agg AS (
                SELECT sum(CAST((tot.n * ob - r * c)
                                * (tot.n * ob - r * c) AS DOUBLE)
                           / CAST(tot.n * r * c AS DOUBLE)) AS chi2
                FROM cells, tot),
            dims AS (SELECT (SELECT count(*) FROM rs) AS ra,
                            (SELECT count(*) FROM cs) AS cb)
            SELECT CAST(tot.n AS BIGINT) AS n,
                   CAST((dims.ra - 1) * (dims.cb - 1) AS BIGINT) AS dof,
                   agg.chi2 AS chi2,
                   sqrt(agg.chi2
                        / CAST(tot.n * (least(dims.ra, dims.cb) - 1)
                               AS DOUBLE)) AS cramers_v
            FROM tot, agg, dims
        """,
        "qty_disc_kendall": """
            WITH x AS (
                SELECT CAST(round(l_quantity) AS BIGINT) AS xv,
                       CAST(round(l_discount * 100) AS BIGINT) AS yv
                FROM lineitem),
            cells AS (SELECT xv, yv, CAST(count(*) AS HUGEINT) AS o
                      FROM x GROUP BY xv, yv),
            tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM x),
            cd AS (
                SELECT sum(CASE WHEN b.xv > a.xv AND b.yv > a.yv
                                THEN a.o * b.o ELSE 0 END) AS c,
                       sum(CASE WHEN b.xv > a.xv AND b.yv < a.yv
                                THEN a.o * b.o ELSE 0 END) AS d
                FROM cells a CROSS JOIN cells b),
            tx AS (SELECT sum(r * (r - 1) // 2) AS nx FROM
                   (SELECT CAST(count(*) AS HUGEINT) AS r
                    FROM x GROUP BY xv)),
            ty AS (SELECT sum(c * (c - 1) // 2) AS ny FROM
                   (SELECT CAST(count(*) AS HUGEINT) AS c
                    FROM x GROUP BY yv))
            SELECT CAST(tot.n AS BIGINT) AS n,
                   CAST(cd.c - cd.d AS DOUBLE)
                   / sqrt(CAST(tot.n * (tot.n - 1) // 2 - tx.nx
                               AS DOUBLE)
                          * CAST(tot.n * (tot.n - 1) // 2 - ty.ny
                                 AS DOUBLE)) AS tau_b
            FROM tot, cd, tx, ty
        """,
        "value_psi_drift": """
            WITH v AS (
                SELECT CAST(round(value * 100) AS BIGINT) AS v,
                       CASE WHEN event_type = 'click' THEN 0
                            ELSE 1 END AS f
                FROM events),
            mm AS (SELECT min(v) AS lo,
                          greatest(max(v) - min(v), 1) AS span FROM v),
            b AS (SELECT least(9, (v.v - mm.lo) * 10 // mm.span) AS bin,
                         f
                  FROM v, mm),
            cnts AS (SELECT bin, f, CAST(count(*) AS BIGINT) AS c
                     FROM b GROUP BY bin, f),
            tot AS (SELECT
                        coalesce(sum(CASE WHEN f = 0 THEN c END), 0)
                            AS ne,
                        coalesce(sum(CASE WHEN f = 1 THEN c END), 0)
                            AS na
                    FROM cnts),
            bins AS (SELECT unnest(range(10)) AS i),
            cell AS (
                SELECT bins.i,
                       coalesce((SELECT c FROM cnts
                                 WHERE bin = bins.i AND f = 0), 0)
                           AS ce,
                       coalesce((SELECT c FROM cnts
                                 WHERE bin = bins.i AND f = 1), 0)
                           AS ca
                FROM bins)
            SELECT CAST(10 AS BIGINT) AS nbins,
                   sum(((ca + 0.5) / (na + 5.0)
                        - (ce + 0.5) / (ne + 5.0))
                       * ln(((ca + 0.5) / (na + 5.0))
                            / ((ce + 0.5) / (ne + 5.0)))) AS psi
            FROM cell, tot
        """,
        "lang_jsd": """
            WITH d AS (SELECT lang AS c,
                              CAST(doc_id % 2 AS BIGINT) AS f
                       FROM documents),
            cnts AS (SELECT c, f, CAST(count(*) AS BIGINT) AS n
                     FROM d GROUP BY c, f),
            tot AS (SELECT
                        coalesce(sum(CASE WHEN f = 0 THEN n END), 0)
                            AS np,
                        coalesce(sum(CASE WHEN f = 1 THEN n END), 0)
                            AS nq
                    FROM cnts),
            cats AS (SELECT DISTINCT c FROM d),
            cell AS (
                SELECT cats.c,
                       coalesce(p.n, 0) AS pc, coalesce(q.n, 0) AS qc
                FROM cats
                LEFT JOIN cnts p ON p.c = cats.c AND p.f = 0
                LEFT JOIN cnts q ON q.c = cats.c AND q.f = 1),
            terms AS (
                SELECT (CASE WHEN pc > 0
                             THEN 0.5 * (pc / np)
                                  * ln((pc / np)
                                       / (0.5 * (pc / np + qc / nq)))
                             ELSE 0 END)
                       + (CASE WHEN qc > 0
                               THEN 0.5 * (qc / nq)
                                    * ln((qc / nq)
                                         / (0.5 * (pc / np
                                                   + qc / nq)))
                               ELSE 0 END) AS t
                FROM cell, tot)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM cats)
                       AS n_cats,
                   sum(t) AS jsd
            FROM terms
        """,
        "lineitem_unpivot": """
            WITH src AS (
                SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
                           AS l_linenumber,
                       l_quantity, l_extendedprice, l_discount, l_tax
                FROM lineitem WHERE l_orderkey < 2000)
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS measure, l_quantity AS value
            FROM src
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   l_extendedprice FROM src
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            FROM src
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        """,
        "customer_intervals": """
            WITH iv AS (
                SELECT o_custkey AS k,
                       CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS s,
                       CAST(epoch(o_orderdate) // 86400
                            + o_orderkey % 25 + 1 AS BIGINT) AS e
                FROM orders),
            w AS (
                SELECT k, s, e,
                       max(e) OVER (PARTITION BY k ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cm,
                       max(e) OVER (PARTITION BY k ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pcm
                FROM iv),
            isl AS (
                SELECT k, s, cm,
                       CASE WHEN pcm IS NULL OR s > pcm THEN 1
                            ELSE 0 END AS brk
                FROM w),
            num AS (
                SELECT k, s, cm,
                       sum(brk) OVER (PARTITION BY k ORDER BY s, cm
                                      ROWS UNBOUNDED PRECEDING) AS iid
                FROM isl)
            SELECT k AS o_custkey,
                   min(s) AS start_day,
                   max(cm) AS end_day,
                   CAST(count(*) AS BIGINT) AS n_merged
            FROM num GROUP BY k, iid
        """,
        "doc_chunks": """
            WITH flat AS (
                SELECT doc_id, text,
                       unnest(range(
                           CASE WHEN length(text) = 0 THEN 0
                                ELSE 1 + CAST(greatest(0,
                                     ceil((length(text) - 256)
                                          / 192.0)) AS BIGINT)
                           END)) AS i
                FROM documents)
            SELECT doc_id, i AS chunk_idx, i * 192 AS start,
                   substr(text, CAST(i * 192 + 1 AS INT), 256) AS chunk
            FROM flat
        """,
        "doc_word_matches": """
            WITH l AS (
                SELECT doc_id,
                       regexp_extract_all(text, '[a-z]{6,}') AS ms
                FROM documents)
            SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS match_idx,
                   ms[t.i] AS match
            FROM l, LATERAL unnest(range(1, len(ms) + 1)) AS t(i)
        """,
        "time_since_purchase": """
            WITH w AS (
                SELECT event_id, ts,
                       max(CASE WHEN event_type = 'purchase'
                                THEN ts END)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS lastp
                FROM events)
            SELECT event_id,
                   CAST(date_diff('microsecond', lastp, ts)
                        AS DOUBLE) AS delta_us
            FROM w
        """,
        "audience_overlap": """
            WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM p a JOIN p b ON a.user_id = b.user_id
                             AND a.event_type <= b.event_type
            GROUP BY 1, 2
        """,
        "bigram_collocations": """
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS l
                FROM documents WHERE trim(text) <> ''),
            toks AS (
                SELECT doc_id, l[x.i] AS tok, x.i
                FROM t, LATERAL unnest(range(1, len(l) + 1)) AS x(i)),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n_tok
                      FROM toks),
            uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM toks GROUP BY tok),
            big AS (
                SELECT a.tok AS w1, b.tok AS w2,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM toks a JOIN toks b
                     ON a.doc_id = b.doc_id AND b.i = a.i + 1
                GROUP BY 1, 2),
            nb AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_big FROM big),
            scored AS (
                SELECT big.w1, big.w2, big.cnt,
                       ln((CAST(big.cnt AS DOUBLE)
                           * stats.n_tok * stats.n_tok)
                          / (CAST(nb.n_big AS DOUBLE)
                             * ua.c * ub.c)) AS pmi
                FROM big
                JOIN uni ua ON ua.tok = big.w1
                JOIN uni ub ON ub.tok = big.w2
                CROSS JOIN stats CROSS JOIN nb
                WHERE big.cnt >= 5)
            SELECT w1, w2, cnt, pmi FROM scored
            ORDER BY pmi DESC, w1, w2 LIMIT 50
        """,
        "doc_top_terms": """
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS l
                FROM documents WHERE trim(text) <> ''),
            toks AS (
                SELECT doc_id, l[x.i] AS term
                FROM t, LATERAL unnest(range(1, len(l) + 1)) AS x(i)),
            tf AS (SELECT doc_id, term,
                          CAST(count(*) AS BIGINT) AS tf
                   FROM toks GROUP BY 1, 2),
            dft AS (SELECT term,
                           CAST(count(DISTINCT doc_id) AS BIGINT)
                               AS df
                    FROM toks GROUP BY term),
            nd AS (SELECT CAST(count(*) AS BIGINT) AS n
                   FROM documents),
            w AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       tf.tf * ln(CAST(nd.n AS DOUBLE) / dft.df)
                           AS tfidf
                FROM tf JOIN dft USING (term), nd),
            r AS (
                SELECT doc_id, term, tf, tfidf,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, term)
                           AS rank
                FROM w)
            SELECT doc_id, rank, term, tf, tfidf
            FROM r WHERE rank <= 3
        """,
        "time_to_purchase": """
            WITH w AS (
                SELECT event_id, ts,
                       min(CASE WHEN event_type = 'purchase'
                                THEN ts END)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 1 FOLLOWING
                                 AND UNBOUNDED FOLLOWING) AS nextp
                FROM events)
            SELECT event_id,
                   CAST(date_diff('microsecond', ts, nextp)
                        AS DOUBLE) AS delta_us
            FROM w
        """,
        "split_balance": """
            WITH d AS (
                SELECT lang AS c,
                       CASE WHEN CAST(('0x' || substr(md5(source),
                                                      1, 8))
                                      AS UBIGINT) % 100 < 80
                            THEN 0 ELSE 1 END AS f
                FROM documents),
            cnts AS (SELECT c, f, CAST(count(*) AS BIGINT) AS n
                     FROM d GROUP BY c, f),
            tot AS (SELECT
                        coalesce(sum(CASE WHEN f = 0 THEN n END), 0)
                            AS np,
                        coalesce(sum(CASE WHEN f = 1 THEN n END), 0)
                            AS nq
                    FROM cnts),
            cats AS (SELECT DISTINCT c FROM d),
            cell AS (
                SELECT cats.c,
                       coalesce(p.n, 0) AS pc, coalesce(q.n, 0) AS qc
                FROM cats
                LEFT JOIN cnts p ON p.c = cats.c AND p.f = 0
                LEFT JOIN cnts q ON q.c = cats.c AND q.f = 1),
            terms AS (
                SELECT (CASE WHEN pc > 0
                             THEN 0.5 * (pc / np)
                                  * ln((pc / np)
                                       / (0.5 * (pc / np + qc / nq)))
                             ELSE 0 END)
                       + (CASE WHEN qc > 0
                               THEN 0.5 * (qc / nq)
                                    * ln((qc / nq)
                                         / (0.5 * (pc / np
                                                   + qc / nq)))
                               ELSE 0 END) AS t
                FROM cell, tot)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM cats)
                       AS n_cats,
                   sum(t) AS jsd
            FROM terms
        """,
        "orders_mom_growth": """
            WITH m AS (SELECT date_trunc('month', o_orderdate)
                           AS month,
                              sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) AS rev_i
                       FROM orders GROUP BY 1)
            SELECT month, CAST(rev_i AS BIGINT) AS rev_i,
                   CAST(rev_i - lag(rev_i) OVER (ORDER BY month)
                        AS DOUBLE)
                       / CAST(lag(rev_i) OVER (ORDER BY month)
                              AS DOUBLE) AS mom_growth
            FROM m
        """,
        "value_rolling_sum": """
            SELECT event_id, user_id,
                   CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
                   CAST(count(*) OVER w AS BIGINT) AS win_n
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "value_lag_delta": """
            SELECT event_id, user_id,
                   CAST(coalesce(
                       cents - lag(cents) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                       0) AS BIGINT) AS delta_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
        """,
        "winsorized_values": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events),
            q AS (SELECT event_type,
                         quantile_disc(cents, 0.25) AS lo,
                         quantile_disc(cents, 0.75) AS hi
                  FROM c GROUP BY event_type)
            SELECT event_id, event_type,
                   least(greatest(cents, lo), hi) AS cents_winsorized
            FROM c JOIN q USING (event_type)
        """,
        "value_percent_rank": """
            SELECT event_id, value,
                   percent_rank() OVER (ORDER BY value) AS pr
            FROM events
        """,
        "event_type_mode": """
            SELECT event_type, mode_value, mode_count FROM (
                SELECT event_type, value AS mode_value,
                       count(*) AS mode_count,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY count(*) DESC, value)
                           AS rn
                FROM events GROUP BY event_type, value)
            WHERE rn = 1
        """,
        "salted_brand_revenue": f"""
            SELECT p_brand, count(*) AS n_items,
                   round(sum(l_extendedprice), {ROUND_SUM}) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "orders_price_bands": """
            SELECT b.band_id, count(*) AS n_orders,
                   CAST(sum(o.cents) AS BIGINT) AS sum_cents
            FROM (SELECT o_orderkey,
                         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                  FROM orders) o
            JOIN (SELECT i AS band_id, i * 2500000 AS lo,
                         i * 2500000 + 4000000 AS hi
                  FROM range(20) t(i)) b
              ON b.lo <= o.cents AND o.cents < b.hi
            GROUP BY b.band_id
            ORDER BY b.band_id
        """,
        "distinct_users_by_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY event_type
        """,
        "interleaved_costs": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id,
                       CASE WHEN i % 3 = 2 THEN 16
                            ELSE len(list_filter(
                                regexp_split_to_array(
                                    trim(substr(full_text,
                                                CAST(i * 64 + 1 AS INT),
                                                64)), '\\s+'),
                                x -> x <> ''))
                       END AS c
                FROM flat)
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS cost
            FROM spans GROUP BY doc_id
        """,
        "user_journeys": """
            SELECT user_id,
                   string_agg(event_type, '>'
                              ORDER BY ts, event_id) AS journey,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "events_zorder_box": """
            SELECT event_id, user_id, value FROM events
            WHERE value >= 100 AND value < 300
              AND user_id >= 10 AND user_id < 60
        """,
        "events_resample": """
            WITH obs AS (
                SELECT user_id, ts, max(value) AS value
                FROM events GROUP BY user_id, ts),
            grid AS (
                SELECT u.user_id, g.ts AS grid_ts
                FROM (SELECT DISTINCT user_id FROM events) u
                CROSS JOIN (
                    SELECT unnest(generate_series(
                        TIMESTAMP '2024-01-01',
                        TIMESTAMP '2024-01-30',
                        INTERVAL 1 DAY)) AS ts) g)
            SELECT gr.user_id, gr.grid_ts, o.value
            FROM grid gr
            ASOF LEFT JOIN obs o
              ON gr.user_id = o.user_id AND gr.grid_ts >= o.ts
        """,
        "recrawl_priorities": """
            WITH a AS (
                SELECT user_id, count(*) AS n_obs,
                       epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx
                FROM events GROUP BY user_id),
            now_c AS (SELECT epoch_us(TIMESTAMP '2025-06-01') AS now_us)
            SELECT user_id, n_obs,
                   (now_us - mx) AS age_us,
                   greatest(mx - mn, 1) AS span_us,
                   CAST((now_us - mx) * (n_obs - 1) AS DOUBLE)
                       / greatest(mx - mn, 1) AS priority
            FROM a, now_c
            ORDER BY priority DESC, user_id
            LIMIT 50
        """,
        "events_range_read": """
            SELECT event_id, value FROM events
            WHERE value >= 100 AND value < 300
        """,
        "customer_cdc": """
            WITH chg AS (
                SELECT o_custkey AS c_custkey,
                       o_orderkey AS version,
                       CASE WHEN o_orderkey % 13 = 0 THEN 'd'
                            ELSE 'u' END AS op,
                       CAST(o_orderkey * 3 % 50000 AS DOUBLE) / 100
                           AS c_acctbal
                FROM orders),
            latest AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY c_custkey
                        ORDER BY version DESC) AS rn
                    FROM chg) WHERE rn = 1)
            SELECT c_custkey,
                   CASE WHEN l.c_custkey IS NOT NULL
                        THEN l.c_acctbal ELSE c.c_acctbal END
                       AS c_acctbal
            FROM customer c
            LEFT JOIN latest l USING (c_custkey)
            WHERE coalesce(l.op, 'u') <> 'd'
        """,
        "value_window_ranks": """
            WITH i AS (SELECT event_id, user_id,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events)
            SELECT event_id, user_id,
                   CAST(row_number() OVER w_id AS BIGINT) AS row_no,
                   CAST(rank() OVER w AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
                   cume_dist() OVER w AS cume_d
            FROM i
            WINDOW w AS (PARTITION BY user_id ORDER BY x),
                   w_id AS (PARTITION BY user_id ORDER BY x, event_id)
        """,
        "top_values_with_ties": """
            WITH i AS (SELECT event_id, user_id,
                              -CAST(round(value * 100) AS BIGINT)
                                  AS negx
                       FROM events),
            r AS (SELECT event_id, user_id,
                         CAST(rank() OVER (PARTITION BY user_id
                                           ORDER BY negx) AS BIGINT)
                             AS rnk
                  FROM i)
            SELECT user_id, event_id, rnk FROM r WHERE rnk <= 3
        """,
        "lineitem_profile": """
            SELECT col_name, n_rows, n_nulls, min_v, max_v FROM (
              SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
                     count(*) - count(l_quantity) AS n_nulls,
                     CAST(min(l_quantity) AS DOUBLE) AS min_v,
                     CAST(max(l_quantity) AS DOUBLE) AS max_v
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', count(*),
                     count(*) - count(l_extendedprice),
                     CAST(min(l_extendedprice) AS DOUBLE),
                     CAST(max(l_extendedprice) AS DOUBLE)
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', count(*),
                     count(*) - count(l_discount),
                     CAST(min(l_discount) AS DOUBLE),
                     CAST(max(l_discount) AS DOUBLE)
              FROM lineitem
              UNION ALL
              SELECT 'l_tax', count(*), count(*) - count(l_tax),
                     CAST(min(l_tax) AS DOUBLE),
                     CAST(max(l_tax) AS DOUBLE)
              FROM lineitem)
        """,
        "volume_shipping": """
            SELECT ns.n_name AS supp_nation,
                   nc.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_i
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
                OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "large_orders": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_i,
                   sum_qty
            FROM (SELECT l_orderkey,
                         CAST(sum(CAST(round(l_quantity) AS BIGINT))
                              AS BIGINT) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "regional_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_i
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND s_nationkey = c_nationkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "sparse_dot_pairs": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM toks GROUP BY doc_id, token),
            keep AS (SELECT token FROM tf GROUP BY token
                     HAVING count(*) <= 395)
            SELECT ta.doc_id AS a, tb.doc_id AS b,
                   CAST(sum(ta.tf * tb.tf) AS BIGINT) AS dot
            FROM tf ta
            JOIN tf tb USING (token)
            JOIN keep USING (token)
            WHERE ta.doc_id < tb.doc_id
            GROUP BY ta.doc_id, tb.doc_id
            HAVING sum(ta.tf * tb.tf) >= 200
        """,
        "customer_set_ops": """
            SELECT 'intersect' AS op, c_custkey AS key FROM
                (SELECT c_custkey FROM customer
                 INTERSECT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'except', c_custkey FROM
                (SELECT c_custkey FROM customer
                 EXCEPT SELECT o_custkey FROM orders)
        """,
        "bloom_orders_building": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderstatus
        """,
        "value_minmax_norm": """
            WITH i AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
            b AS (SELECT event_type, min(x) AS mn, max(x) AS mx
                  FROM i GROUP BY event_type)
            SELECT event_id,
                   (x - mn) / CAST(NULLIF(mx - mn, 0) AS DOUBLE)
                       AS x_norm
            FROM i JOIN b USING (event_type)
        """,
        "value_robust_scale": """
            WITH i AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
            q AS (SELECT event_type,
                         quantile_disc(x, 0.25) AS q1,
                         quantile_disc(x, 0.50) AS med,
                         quantile_disc(x, 0.75) AS q3
                  FROM i GROUP BY event_type)
            SELECT event_id,
                   (x - med) / CAST(NULLIF(q3 - q1, 0) AS DOUBLE)
                       AS x_robust
            FROM i JOIN q USING (event_type)
        """,
        "events_dedup_window": """
            WITH w AS (
                SELECT event_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS d_us
                FROM events)
            SELECT event_id FROM w
            WHERE d_us IS NULL OR d_us > 30000000
        """,
        "cohort_retention": """
            WITH u AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                FROM events),
            c AS (
                SELECT user_id, min(d) AS cohort FROM u GROUP BY user_id)
            SELECT CAST(c.cohort AS VARCHAR) AS cohort_day,
                   date_diff('day', c.cohort, u.d) AS day_offset,
                   count(*) AS n_users
            FROM u JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "events_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t
                GROUP BY e.user_id),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t
                GROUP BY e.user_id)
            SELECT 1 AS step_no, 'view' AS step,
                   count(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', count(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', count(*) FROM s3
        """,
        "orders_validation": """
            SELECT 'not_null' AS rule, 'o_custkey' AS "column",
                   count(*) AS n_rows,
                   CAST(count(*) - count(o_custkey) AS BIGINT)
                       AS n_violations,
                   (count(*) - count(o_custkey)) = 0 AS ok
            FROM orders
            UNION ALL
            SELECT 'range', 'o_totalprice', count(*),
                   CAST(count_if(o_totalprice < 0
                                 OR o_totalprice > 400000) AS BIGINT),
                   count_if(o_totalprice < 0
                            OR o_totalprice > 400000) = 0
            FROM orders
            UNION ALL
            SELECT 'accepted_values', 'o_orderstatus', count(*),
                   CAST(count_if(o_orderstatus NOT IN ('O', 'F'))
                        AS BIGINT),
                   count_if(o_orderstatus NOT IN ('O', 'F')) = 0
            FROM orders
            UNION ALL
            SELECT 'unique', 'o_orderkey', count(*),
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
                   (count(*) - count(DISTINCT o_orderkey)) = 0
            FROM orders
        """,
        "value_zscore": """
            WITH i AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
            m AS (SELECT event_type, count(*) AS n,
                         sum(x) AS sx, sum(x*x) AS sxx
                  FROM i GROUP BY event_type)
            SELECT event_id,
                   round(CAST(n*x - sx AS DOUBLE)
                         / (n * sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                     / CAST(n*(n-1) AS DOUBLE))), 6) AS z
            FROM i JOIN m USING (event_type)
        """,
        "qty_skew_kurt": """
            WITH i AS (SELECT l_returnflag,
                              CAST(round(l_quantity) AS HUGEINT) AS x
                       FROM lineitem),
            m AS (SELECT l_returnflag,
                         CAST(count(*) AS HUGEINT) AS n,
                         sum(x) AS s1, sum(x*x) AS s2,
                         sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
                  FROM i GROUP BY l_returnflag),
            d AS (SELECT l_returnflag, n,
                         n * (n*s2 - s1*s1) AS b,
                         n*n*n*s3 - 3*n*n*s1*s2 + 2*n*s1*s1*s1 AS a,
                         n*n*n*n*s4 - 4*n*n*n*s1*s3
                             + 6*n*n*s1*s1*s2 - 3*n*s1*s1*s1*s1 AS c
                  FROM m)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(CAST(a AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
                         / pow(CAST(b AS DOUBLE), 1.5), 6) AS skew_pop,
                   round(CAST(n AS DOUBLE) * CAST(c AS DOUBLE)
                         / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
                         - 3.0, 6) AS kurt_excess
            FROM d
        """,
        "priority_status_mi": """
            WITH c AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                              count(*) AS cij
                       FROM orders GROUP BY 1, 2),
            t AS (SELECT CAST(sum(cij) AS BIGINT) AS n FROM c),
            ra AS (SELECT a, CAST(sum(cij) AS BIGINT) AS ri
                   FROM c GROUP BY a),
            cb AS (SELECT b, CAST(sum(cij) AS BIGINT) AS cj
                   FROM c GROUP BY b)
            SELECT t.n AS n,
                   round(sum((CAST(cij AS DOUBLE) / t.n)
                             * ln(CAST(t.n * cij AS DOUBLE)
                                  / CAST(ri * cj AS DOUBLE))), 6)
                       AS mi_nats
            FROM c JOIN ra USING (a) JOIN cb USING (b), t
            GROUP BY t.n
        """,
        "qty_discount_corr": """
            WITH i AS (
                SELECT l_returnflag,
                       CAST(round(l_quantity) AS BIGINT) AS x,
                       CAST(round(l_discount * 1000) AS BIGINT) AS y
                FROM lineitem),
            m AS (
                SELECT l_returnflag, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x*x) AS sxx, sum(y*y) AS syy,
                       sum(x*y) AS sxy
                FROM i GROUP BY l_returnflag)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                       AS corr_xy,
                   round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_xy
            FROM m
        """,
        "qty_quantiles_cont": """
            WITH i AS (SELECT l_returnflag,
                              CAST(round(l_quantity) AS BIGINT) AS x
                       FROM lineitem)
            SELECT l_returnflag, 0.1 AS q,
                   round(quantile_cont(x, 0.1), 6) AS value
            FROM i GROUP BY l_returnflag
            UNION ALL SELECT l_returnflag, 0.25,
                   round(quantile_cont(x, 0.25), 6) FROM i
                   GROUP BY l_returnflag
            UNION ALL SELECT l_returnflag, 0.5,
                   round(quantile_cont(x, 0.5), 6) FROM i
                   GROUP BY l_returnflag
            UNION ALL SELECT l_returnflag, 0.75,
                   round(quantile_cont(x, 0.75), 6) FROM i
                   GROUP BY l_returnflag
            UNION ALL SELECT l_returnflag, 0.9,
                   round(quantile_cont(x, 0.9), 6) FROM i
                   GROUP BY l_returnflag
        """,
        "building_top_orders": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   count(*) AS n_items,
                   round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                              * (1000 - CAST(round(l_discount*1000)
                                             AS BIGINT))) AS DOUBLE)
                         / 100000.0, 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (1000 - CAST(round(l_discount*1000) AS BIGINT)))
                         DESC,
                     o_orderdate, l_orderkey
            LIMIT 10
        """,
        "part_triangles": """
            WITH pairs AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            e AS (SELECT DISTINCT u, v FROM pairs)
            SELECT count(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        "spans_media_stats": """
            WITH m AS (
                SELECT doc_id, i
                FROM (SELECT doc_id,
                             unnest(range(CAST(ceil(length(text) / 64.0)
                                               AS BIGINT))) AS i
                      FROM documents)
                WHERE i % 3 = 2)
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   count(*) AS n_media,
                   CAST(sum(64 + (doc_id * 31 + i) % 256)
                        AS BIGINT) AS sum_width,
                   CAST(sum(48 + (doc_id * 17 + i * 3) % 128)
                        AS BIGINT) AS sum_height,
                   CAST(count(*) * 273 AS BIGINT) AS total_bytes
            FROM m GROUP BY doc_id
        """,
        "mmr_sample": """
            WITH RECURSIVE
            u AS (SELECT vec_id, unnest(embedding) AS e,
                         generate_subscripts(embedding, 1) AS dim FROM embeddings),
            norms AS (SELECT vec_id,
                             sqrt(sum(CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS nrm
                      FROM u GROUP BY vec_id),
            x AS (SELECT u.vec_id, u.dim, CAST(u.e AS DOUBLE) / n.nrm AS v
                  FROM u JOIN norms n USING (vec_id)),
            qv AS (SELECT dim, v FROM x
                   WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
            rel AS (SELECT x.vec_id, sum(x.v * q.v) AS rel
                    FROM x JOIN qv q ON x.dim = q.dim GROUP BY 1),
            sims AS (SELECT a.vec_id AS a, b.vec_id AS b, sum(a.v * b.v) AS sim
                     FROM x a JOIN x b ON a.dim = b.dim GROUP BY 1, 2),
            st AS (
              SELECT 1 AS rank, r.vec_id AS picked, [r.vec_id] AS sel,
                     r.rel AS relevance, 0.7 * r.rel AS mmr_score
              FROM (SELECT vec_id, rel,
                           row_number() OVER (ORDER BY 0.7 * rel DESC, vec_id) AS rn
                    FROM rel) r
              WHERE rn = 1
              UNION ALL
              SELECT s.rank + 1, c.vec_id, list_append(s.sel, c.vec_id),
                     c.rel, c.score
              FROM st s JOIN LATERAL (
                  SELECT r.vec_id, r.rel,
                         0.7 * r.rel - (1.0 - 0.7) * (
                             SELECT max(p.sim) FROM sims p
                             WHERE p.a = r.vec_id
                               AND list_contains(s.sel, p.b)) AS score
                  FROM rel r
                  WHERE NOT list_contains(s.sel, r.vec_id)
                  ORDER BY score DESC, r.vec_id
                  LIMIT 1) c ON true
              WHERE s.rank < 20
            )
            SELECT rank, picked AS vec_id, relevance, mmr_score FROM st
        """,
        "kcenter_coreset": """
            WITH RECURSIVE
            u AS (SELECT vec_id, unnest(embedding) AS e,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings),
            norms AS (SELECT vec_id,
                             sqrt(sum(CAST(e AS DOUBLE)
                                      * CAST(e AS DOUBLE))) AS nrm
                      FROM u GROUP BY vec_id),
            x AS (SELECT u.vec_id, u.dim,
                         CAST(u.e AS DOUBLE) / n.nrm AS v
                  FROM u JOIN norms n USING (vec_id)),
            sims AS (SELECT a.vec_id AS a, b.vec_id AS b,
                            sum(a.v * b.v) AS sim
                     FROM x a JOIN x b ON a.dim = b.dim
                     GROUP BY 1, 2),
            st AS (
              SELECT 1 AS rank,
                     (SELECT min(vec_id) FROM embeddings) AS picked,
                     [(SELECT min(vec_id) FROM embeddings)] AS sel,
                     CAST(0.0 AS DOUBLE) AS dist
              UNION ALL
              SELECT s.rank + 1, c.vec_id,
                     list_append(s.sel, c.vec_id), c.dist
              FROM st s JOIN LATERAL (
                  SELECT r.vec_id, 1.0 - max(p.sim) AS dist
                  FROM (SELECT DISTINCT a AS vec_id FROM sims) r
                  JOIN sims p ON p.a = r.vec_id
                             AND list_contains(s.sel, p.b)
                  WHERE NOT list_contains(s.sel, r.vec_id)
                  GROUP BY r.vec_id
                  ORDER BY dist DESC, r.vec_id
                  LIMIT 1) c ON true
              WHERE s.rank < 16
            )
            SELECT rank, picked AS vec_id, dist FROM st
        """,
        "shuffle_run_lengths": """
            WITH k AS (SELECT lang,
                              (((doc_id::HUGEINT + 3)
                                % 18446744073709551616)
                               * 2685821657736338717::HUGEINT
                               % 18446744073709551616)::UBIGINT AS sk
                       FROM documents),
            o AS (SELECT lang, row_number() OVER (ORDER BY sk) AS rn
                  FROM k),
            r AS (SELECT lang, rn,
                         rn - row_number() OVER (
                             PARTITION BY lang ORDER BY rn) AS grp
                  FROM o),
            runs AS (SELECT count(*) AS len FROM r
                     GROUP BY lang, grp)
            SELECT CAST(len AS BIGINT) AS run_length,
                   CAST(count(*) AS BIGINT) AS n_runs
            FROM runs GROUP BY len
        """,
        "curriculum_schedule": """
            WITH r AS (SELECT doc_id, n_chars,
                              row_number() OVER (
                                  ORDER BY n_chars, doc_id) - 1 AS rank,
                              count(*) OVER () AS n
                       FROM documents)
            SELECT doc_id, n_chars,
                   rank * 10 // n AS bin,
                   rank - CAST(ceil((rank * 10 // n) * n / 10.0)
                               AS BIGINT) AS pos_in_bin,
                   (rank - CAST(ceil((rank * 10 // n) * n / 10.0)
                                AS BIGINT)) * 10
                       + rank * 10 // n AS sched_rank
            FROM r
        """,
        "padding_waste": """
            WITH t AS (SELECT doc_id,
                              CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(string_split_regex(
                                       trim(text), '\\s+')) END
                                  AS n_tokens
                       FROM documents),
            b AS (SELECT doc_id, n_tokens,
                         n_tokens // 64 AS bucket,
                         (row_number() OVER (
                              PARTITION BY n_tokens // 64
                              ORDER BY n_tokens DESC, doc_id) - 1)
                             // 16 AS batch_idx
                  FROM t),
            per_batch AS (SELECT bucket, batch_idx,
                                 count(*) AS nr,
                                 max(n_tokens) AS mx,
                                 sum(n_tokens) AS sm
                          FROM b GROUP BY 1, 2)
            SELECT bucket,
                   CAST(sum(nr) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_batches,
                   CAST(sum(sm) AS BIGINT) AS sum_tokens,
                   CAST(sum(mx * nr - sm) AS BIGINT) AS pad_tokens
            FROM per_batch GROUP BY bucket
        """,
        "contamination_attribution": """
            WITH bench AS (
                SELECT DISTINCT substr(text, 11, 50) AS snippet
                FROM documents
                WHERE doc_id % 97 = 0 AND length(text) >= 60)
            SELECT b.snippet,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM bench b JOIN documents d
              ON contains(d.text, b.snippet)
            GROUP BY b.snippet
        """,
        "source_set_cover": """
            WITH RECURSIVE
            w AS (SELECT source,
                         list_filter(string_split_regex(lower(text),
                                                        '\\s+'),
                                     x -> x <> '') AS ws
                  FROM documents),
            p AS (SELECT DISTINCT source,
                         ws[i + 1] || ' ' || ws[i + 2] || ' '
                             || ws[i + 3] AS tok
                  FROM (SELECT source, ws,
                               unnest(range(len(ws) - 2)) AS i
                        FROM w)),
            st AS (
              SELECT 1 AS rank, c.src AS source,
                     CAST(c.n AS BIGINT) AS new_tokens,
                     [c.src] AS sel, c.toks AS cov,
                     CAST(len(c.toks) AS BIGINT) AS total_covered
              FROM (SELECT p.source AS src, count(*) AS n,
                           list(p.tok) AS toks
                    FROM p GROUP BY 1
                    ORDER BY n DESC, src LIMIT 1) c
              UNION ALL
              SELECT s.rank + 1, c.src, CAST(c.n AS BIGINT),
                     list_append(s.sel, c.src), s.cov || c.toks,
                     CAST(len(s.cov) + len(c.toks) AS BIGINT)
              FROM st s JOIN LATERAL (
                  SELECT p.source AS src, count(*) AS n,
                         list(p.tok) AS toks
                  FROM p
                  WHERE NOT list_contains(s.sel, p.source)
                    AND p.tok NOT IN (SELECT unnest(s.cov))
                  GROUP BY 1
                  ORDER BY n DESC, src LIMIT 1) c ON true
              WHERE s.rank < 5
            )
            SELECT rank, source, new_tokens, total_covered FROM st
        """,
        "token_budget_sample": """
            WITH t AS (SELECT doc_id, n_chars,
                              CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(string_split_regex(
                                       trim(text), '\\s+')) END
                                  AS n_tokens
                       FROM documents),
            c AS (SELECT *, sum(n_tokens) OVER (
                          ORDER BY n_chars DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
                         row_number() OVER (
                          ORDER BY n_chars DESC, doc_id) AS rn
                  FROM t)
            SELECT doc_id, n_chars, n_tokens FROM c
            WHERE rn < COALESCE((SELECT min(rn) FROM c
                                 WHERE cum > 50000), 9223372036854775807)
        """,
        "conformal_threshold": """
            WITH m AS (SELECT event_type, sum(value) AS s,
                              count(*) AS n
                       FROM events GROUP BY 1),
            r AS (SELECT e.event_type,
                         abs(e.value - m.s / m.n) AS r, m.n
                  FROM events e JOIN m USING (event_type)),
            rk AS (SELECT event_type, r, n, row_number() OVER (
                       PARTITION BY event_type ORDER BY r) AS rn
                   FROM r)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(least(n, CAST(ceil((n + 1) * 0.9) AS BIGINT))
                        AS BIGINT) AS rank,
                   r AS threshold
            FROM rk
            WHERE rn = least(n, CAST(ceil((n + 1) * 0.9) AS BIGINT))
        """,
        "embedding_pca": """
            WITH x AS (SELECT vec_id,
                              generate_subscripts(embedding, 1) AS dim,
                              CAST(unnest(embedding) AS DOUBLE) AS v
                       FROM embeddings),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n
                   FROM embeddings),
            sums AS (SELECT dim, sum(v) AS s FROM x GROUP BY dim),
            ss AS (SELECT a.dim AS i, b.dim AS j,
                          sum(a.v * b.v) AS ssv
                   FROM x a JOIN x b
                     ON a.vec_id = b.vec_id AND a.dim <= b.dim
                   GROUP BY 1, 2)
            SELECT CAST(ss.i - 1 AS BIGINT) AS i,
                   CAST(ss.j - 1 AS BIGINT) AS j,
                   (ss.ssv - nn.n * ((sa.s / nn.n) * (sb.s / nn.n)))
                       / (nn.n - 1) AS cov
            FROM ss, nn
            JOIN sums sa ON sa.dim = ss.i
            JOIN sums sb ON sb.dim = ss.j
        """,
        "kmeans_clusters": """
            WITH c AS (SELECT vec_id, embedding,
                              row_number() OVER (ORDER BY vec_id) - 1
                                  AS cidx
                       FROM (SELECT * FROM embeddings
                             WHERE vec_id % 101 = 0
                             ORDER BY vec_id LIMIT 8)),
            cn AS (SELECT cidx, i AS dim, CAST(e AS DOUBLE) AS v
                   FROM (SELECT cidx, unnest(embedding) AS e,
                                generate_subscripts(embedding, 1) AS i
                         FROM c)),
            cnorm AS (SELECT cidx, sqrt(sum(v * v)) AS nrm
                      FROM cn GROUP BY cidx),
            x AS (SELECT vec_id,
                         generate_subscripts(embedding, 1) AS dim,
                         CAST(unnest(embedding) AS DOUBLE) AS v
                  FROM embeddings),
            dots AS (SELECT x.vec_id, cn.cidx, sum(x.v * cn.v) AS dp
                     FROM x JOIN cn ON x.dim = cn.dim
                     GROUP BY 1, 2),
            scored AS (SELECT dots.vec_id, dots.cidx,
                              dots.dp / cnorm.nrm AS score
                       FROM dots JOIN cnorm USING (cidx))
            SELECT vec_id, CAST(cidx AS BIGINT) AS cluster
            FROM (SELECT vec_id, cidx,
                         row_number() OVER (
                             PARTITION BY vec_id
                             ORDER BY score DESC, cidx) AS rn
                  FROM scored)
            WHERE rn = 1
        """,
        "heavy_hitters": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
            ORDER BY n DESC, user_id LIMIT 10
        """,
        "ngram_jaccard": """
            WITH w AS (SELECT doc_id, lang,
                              string_split_regex(lower(trim(text)),
                                                 '\\s+') AS ws
                       FROM documents WHERE trim(text) <> ''),
            g AS (SELECT DISTINCT doc_id, lang,
                         CASE WHEN len(ws) >= 3
                              THEN ws[i + 1] || ' ' || ws[i + 2]
                                   || ' ' || ws[i + 3]
                              WHEN len(ws) = 2
                              THEN ws[i + 1] || ' ' || ws[i + 2]
                              ELSE ws[i + 1] END AS gram
                  FROM (SELECT doc_id, lang, ws,
                               unnest(range(len(ws)
                                            - least(len(ws), 3) + 1))
                                   AS i
                        FROM w)),
            s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                             count(*) AS ni
                      FROM g x JOIN g y
                        ON x.gram = y.gram AND x.lang = y.lang
                           AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, ni / (sa.n + sb.n - ni) AS jaccard
            FROM inter
            JOIN s sa ON sa.doc_id = a
            JOIN s sb ON sb.doc_id = b
            WHERE ni / (sa.n + sb.n - ni) >= 0.2
        """,
        "pack_sequences": """
            WITH RECURSIVE
            tc AS (SELECT doc_id,
                          CASE WHEN trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text),
                                                           '\\s+'))
                          END AS t
                   FROM documents),
            ordered AS (SELECT doc_id % 16 AS bucket, doc_id, t,
                               row_number() OVER (
                                   PARTITION BY doc_id % 16
                                   ORDER BY t DESC, doc_id) AS r
                        FROM tc),
            nb AS (SELECT bucket, count(*) AS n FROM ordered
                   GROUP BY bucket),
            st AS (
              SELECT bucket, 0 AS r,
                     CAST([] AS STRUCT(load BIGINT,
                                       ids BIGINT[])[]) AS packs
              FROM nb
              UNION ALL
              SELECT s.bucket, s.r + 1,
                CASE WHEN COALESCE(list_position(
                        list_transform(s.packs,
                                       p -> p.load + d.t <= 2048),
                        true), 0) = 0
                  THEN list_append(s.packs,
                                   {'load': d.t, 'ids': [d.doc_id]})
                  ELSE list_transform(s.packs, (p, i) ->
                    CASE WHEN i = list_position(
                             list_transform(s.packs,
                                 p2 -> p2.load + d.t <= 2048), true)
                         THEN {'load': p.load + d.t,
                               'ids': list_append(p.ids, d.doc_id)}
                         ELSE p END)
                END AS packs
              FROM st s JOIN ordered d
                ON d.bucket = s.bucket AND d.r = s.r + 1)
            SELECT md5(array_to_string(list_sort(u.p.ids), ','))
                       AS pack_id,
                   CAST(len(u.p.ids) AS BIGINT) AS n_docs,
                   CAST(u.p.load AS BIGINT) AS total_tokens
            FROM (SELECT s.* FROM st s
                  JOIN nb ON nb.bucket = s.bucket
                  WHERE s.r = nb.n) f,
                 unnest(f.packs) AS u(p)
        """,
        "pack_interleaved": """
            WITH RECURSIVE
            flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id,
                       CASE WHEN i % 3 = 2 THEN 16
                            ELSE len(list_filter(
                                regexp_split_to_array(
                                    trim(substr(full_text,
                                                CAST(i * 64 + 1 AS INT),
                                                64)), '\\s+'),
                                x -> x <> ''))
                       END AS c
                FROM flat),
            costs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t
                      FROM spans GROUP BY doc_id),
            ordered AS (SELECT CAST(doc_id AS BIGINT) % 16 AS bucket,
                               doc_id, t,
                               row_number() OVER (
                                   PARTITION BY
                                       CAST(doc_id AS BIGINT) % 16
                                   ORDER BY t DESC, doc_id) AS r
                        FROM costs),
            nb AS (SELECT bucket, count(*) AS n FROM ordered
                   GROUP BY bucket),
            st AS (
              SELECT bucket, 0 AS r,
                     CAST([] AS STRUCT(load BIGINT,
                                       ids VARCHAR[])[]) AS packs
              FROM nb
              UNION ALL
              SELECT s.bucket, s.r + 1,
                CASE WHEN COALESCE(list_position(
                        list_transform(s.packs,
                                       p -> p.load + d.t <= 1024),
                        true), 0) = 0
                  THEN list_append(s.packs,
                                   {'load': d.t, 'ids': [d.doc_id]})
                  ELSE list_transform(s.packs, (p, i) ->
                    CASE WHEN i = list_position(
                             list_transform(s.packs,
                                 p2 -> p2.load + d.t <= 1024), true)
                         THEN {'load': p.load + d.t,
                               'ids': list_append(p.ids, d.doc_id)}
                         ELSE p END)
                END AS packs
              FROM st s JOIN ordered d
                ON d.bucket = s.bucket AND d.r = s.r + 1)
            SELECT md5(array_to_string(list_sort(u.p.ids), ','))
                       AS pack_id,
                   array_to_string(list_sort(u.p.ids), ',')
                       AS doc_ids,
                   CAST(len(u.p.ids) AS BIGINT) AS n_docs,
                   CAST(u.p.load AS BIGINT) AS total_cost
            FROM (SELECT s.* FROM st s
                  JOIN nb ON nb.bucket = s.bucket
                  WHERE s.r = nb.n) f,
                 unnest(f.packs) AS u(p)
        """,
        "similarity_join": """
            WITH lw AS (SELECT doc_id,
                               string_split_regex(lower(trim(text)),
                                                  '\\s+') AS ws
                        FROM documents WHERE doc_id % 2 = 0),
            rw AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)),
                                             '\\s+') AS ws
                   FROM documents WHERE doc_id % 2 = 1),
            lg AS (SELECT DISTINCT doc_id,
                          ws[i + 1] || ' ' || ws[i + 2] || ' '
                              || ws[i + 3] AS gram
                   FROM (SELECT doc_id, ws,
                                unnest(range(len(ws) - 2)) AS i
                         FROM lw)),
            rg AS (SELECT DISTINCT doc_id,
                          ws[i + 1] || ' ' || ws[i + 2] || ' '
                              || ws[i + 3] AS gram
                   FROM (SELECT doc_id, ws,
                                unnest(range(len(ws) - 2)) AS i
                         FROM rw)),
            ls AS (SELECT doc_id, count(*) AS n FROM lg GROUP BY doc_id),
            rs AS (SELECT doc_id, count(*) AS n FROM rg GROUP BY doc_id),
            inter AS (SELECT l.doc_id AS a_id, r.doc_id AS b_id,
                             count(*) AS ni
                      FROM lg l JOIN rg r ON l.gram = r.gram
                      GROUP BY a_id, b_id)
            SELECT a_id, b_id,
                   ni / (ls.n + rs.n - ni) AS jaccard
            FROM inter
            JOIN ls ON ls.doc_id = a_id
            JOIN rs ON rs.doc_id = b_id
            WHERE ni / (ls.n + rs.n - ni) >= 0.5
        """,
        "normalize_text": """
            SELECT doc_id, text, length(text) AS n_chars_norm
            FROM (SELECT doc_id,
                         trim(regexp_replace(
                             regexp_replace(nfc_normalize(text),
                                 '[\\x00-\\x08\\x0e-\\x1f\\x7f]',
                                 '', 'g'),
                             '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))
                             AS text
                  FROM documents)
        """,
        "segment_order_outer": """
            WITH lhs AS (SELECT c_custkey, c_mktsegment FROM customer
                         WHERE c_acctbal > 7500.0),
            rhs AS (SELECT o_custkey AS c_custkey,
                           count(*) AS n_orders
                    FROM orders GROUP BY o_custkey)
            SELECT c_custkey,
                   coalesce(l.c_mktsegment, 'NONE') AS c_mktsegment,
                   CAST(coalesce(r.n_orders, -1) AS BIGINT) AS n_orders
            FROM lhs l FULL OUTER JOIN rhs r USING (c_custkey)
        """,
        "segment_dedup": """
            WITH segs AS (
                SELECT doc_id, i AS seg_idx,
                       substr(text, CAST(i * 16 + 1 AS INT), 16) AS seg
                FROM (SELECT doc_id, text,
                             unnest(range(CAST(ceil(length(text) / 16.0)
                                               AS BIGINT))) AS i
                      FROM documents)),
            flag AS (
                SELECT doc_id, seg_idx, seg,
                       row_number() OVER (PARTITION BY seg
                                          ORDER BY doc_id, seg_idx)
                           AS rn
                FROM segs)
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN seg END,
                                       '' ORDER BY seg_idx), '')
                       AS text_dedup,
                   count(*) AS n_segments,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM flag GROUP BY doc_id
        """,
        "inverted_index": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                FROM documents),
            tf AS (SELECT token, doc_id, count(*) AS tf
                   FROM toks GROUP BY token, doc_id)
            SELECT token, count(*) AS df,
                   CAST(sum(tf) AS BIGINT) AS cf,
                   string_agg(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(tf AS VARCHAR),
                              ',' ORDER BY doc_id) AS postings
            FROM tf GROUP BY token
        """,
        "span_flat": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents)
            SELECT doc_id,
                   i AS span_idx,
                   CASE WHEN i % 3 = 2 THEN 'image'
                        ELSE 'text' END AS kind,
                   CASE WHEN i % 3 = 2 THEN ''
                        ELSE substr(full_text,
                                    CAST(i * 64 + 1 AS INT), 64)
                        END AS text,
                   CASE WHEN i % 3 = 2
                        THEN 'media://' || doc_id || '/'
                             || CAST(i AS VARCHAR)
                        ELSE '' END AS media_ref,
                   i * 64 AS span_offset
            FROM flat
        """,
        "span_kind_stats": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT CASE WHEN i % 3 = 2 THEN 'image'
                            ELSE 'text' END AS kind,
                       CASE WHEN i % 3 = 2 THEN ''
                            ELSE substr(full_text,
                                        CAST(i * 64 + 1 AS INT), 64)
                            END AS text
                FROM flat)
            SELECT kind, count(*) AS n_spans,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM spans GROUP BY kind ORDER BY kind
        """,
        "pagerank": """
            WITH edges AS (SELECT DISTINCT 2 * l_orderkey AS src,
                                  2 * l_partkey + 1 AS dst
                           FROM lineitem),
            nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)),
            deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
            p AS (SELECT count(*) AS n FROM nodes),
            r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, p),
            i1 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r0 r ON e.src = r.node
                   GROUP BY e.dst),
            r1 AS (SELECT nd.node,
                          (150000000000 // p.n) + COALESCE(i.s, 0) AS r
                   FROM nodes nd CROSS JOIN p
                   LEFT JOIN i1 i ON nd.node = i.node),
            i2 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r1 r ON e.src = r.node
                   GROUP BY e.dst),
            r2 AS (SELECT nd.node,
                          (150000000000 // p.n) + COALESCE(i.s, 0) AS r
                   FROM nodes nd CROSS JOIN p
                   LEFT JOIN i2 i ON nd.node = i.node),
            i3 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r2 r ON e.src = r.node
                   GROUP BY e.dst),
            r3 AS (SELECT nd.node,
                          (150000000000 // p.n) + COALESCE(i.s, 0) AS r
                   FROM nodes nd CROSS JOIN p
                   LEFT JOIN i3 i ON nd.node = i.node)
            SELECT node, r::BIGINT AS r FROM r3
        """,
        "epoch_shuffle": """
            SELECT doc_id,
                   (((doc_id::HUGEINT + 3) % 18446744073709551616)
                    * 2685821657736338717::HUGEINT
                    % 18446744073709551616)::UBIGINT AS shuffle_key
            FROM documents
        """,
        "top_tokens": """
            SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                      AS token
                  FROM documents WHERE trim(text) != '')
            GROUP BY token ORDER BY n DESC, token LIMIT 50
        """,
        "top_tokens_by_lang": """
            WITH toks AS (
                SELECT lang,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                FROM documents),
            tc AS (SELECT lang, token, count(*) AS n FROM toks
                   GROUP BY lang, token),
            ranked AS (
                SELECT lang, token, n,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n DESC, token) AS rn
                FROM tc)
            SELECT lang, token, n FROM ranked WHERE rn <= 10
        """,
        "doc_sample": """
            SELECT doc_id, lang FROM documents WHERE doc_id % 10 < 3
        """,
        "events_tumbling": f"""
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), {ROUND_SUM}) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "session_stats": f"""
            WITH g AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
            s AS (
                SELECT user_id, ts, value,
                       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS session_idx
                FROM g)
            SELECT user_id, session_idx, count(*) AS n_events,
                   round(epoch(max(ts) - min(ts)), {ROUND_RATIO}) AS duration_s,
                   round(sum(value), {ROUND_SUM}) AS sum_value
            FROM s GROUP BY user_id, session_idx
        """,
        "running_totals": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER w AS BIGINT) AS run_n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS run_sum_cents,
                   max(value) OVER w AS run_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        """,
        "events_sessions": """
            SELECT user_id,
                   CAST(1 + sum(CASE WHEN gap > INTERVAL 30 MINUTE
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM (SELECT user_id,
                         ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             AS gap
                  FROM events)
            GROUP BY user_id
        """,
        "redact_terms": """
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g'),
                       'value [a-z]+', '[TERM]', 'g') AS text,
                   CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                        + len(regexp_extract_all(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                               '[EMAIL]', 'g'),
                           'value [a-z]+'))
                        AS BIGINT) AS n_redactions
            FROM documents
        """,
        "decontaminate": """
            WITH bench AS (
                SELECT DISTINCT substr(text, 11, 50) AS snippet
                FROM documents
                WHERE doc_id % 97 = 0 AND length(text) >= 60)
            SELECT d.doc_id,
                   CAST(EXISTS (SELECT 1 FROM bench b
                                WHERE contains(d.text, b.snippet))
                        AS BIGINT) AS contaminated
            FROM documents d
        """,
        "repetition_stats": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS tk
                FROM documents),
            grams AS (
                SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS g
                FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1))
                     AS t(i)
                WHERE len(tk) >= 2),
            gc AS (SELECT doc_id, max(c) AS mc FROM (
                       SELECT doc_id, g, count(*) AS c FROM grams
                       GROUP BY doc_id, g)
                   GROUP BY doc_id)
            SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(t.tk)) AS BIGINT) AS n_distinct,
                   CAST(coalesce(gc.mc, 0) AS BIGINT) AS top_bigram_cnt
            FROM toks t LEFT JOIN gc ON t.doc_id = gc.doc_id
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
                SELECT doc_id, lang, source,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 20
        """,
        "mixture_sample": """
            WITH totals AS (
                SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            quotas AS (
                SELECT lang,
                       CAST(ceil(n * CASE lang WHEN 'en' THEN 0.5
                                               WHEN 'de' THEN 1.0
                                               WHEN 'fr' THEN 0.25 END)
                            AS BIGINT) AS q
                FROM totals WHERE lang IN ('en', 'de', 'fr')),
            ranked AS (
                SELECT doc_id, d.lang,
                       row_number() OVER (
                           PARTITION BY d.lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn
                FROM documents d WHERE d.lang IN ('en', 'de', 'fr'))
            SELECT r.doc_id, r.lang FROM ranked r
            JOIN quotas USING (lang) WHERE r.rn <= quotas.q
        """,
        "label_centroids": f"""
            SELECT label, i.dim AS dim,
                   round(sum(embedding[i.dim]) / count(*), {ROUND_RATIO})
                       AS mean_v
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(1, len(embedding)))
                          AS dim) i
            GROUP BY label, i.dim
        """,
        "chars_quantiles": """
            SELECT lang, CAST(0.25 AS DOUBLE) AS q,
                   quantile_disc(n_chars, 0.25) AS value
            FROM documents GROUP BY lang
            UNION ALL
            SELECT lang, CAST(0.5 AS DOUBLE) AS q,
                   quantile_disc(n_chars, 0.5) AS value
            FROM documents GROUP BY lang
            UNION ALL
            SELECT lang, CAST(0.75 AS DOUBLE) AS q,
                   quantile_disc(n_chars, 0.75) AS value
            FROM documents GROUP BY lang
        """,
        "events_asof": """
            SELECT p.event_id, p.user_id, p.ts,
                   (SELECT max(v.ts) FROM events v
                    WHERE v.user_id = p.user_id AND v.event_type = 'view'
                      AND v.ts <= p.ts) AS prior_ts
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "events_range_counts": """
            SELECT p.event_id, p.user_id, p.ts,
                   (SELECT count(*) FROM events v
                    WHERE v.user_id = p.user_id AND v.event_type = 'view'
                      AND v.ts > p.ts - INTERVAL 1 HOUR
                      AND v.ts <= p.ts) AS n_in_window
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "events_hopping": f"""
            SELECT event_type,
                   make_timestamp(CAST(
                       (floor(epoch(ts) / 900) - j) * 900 * 1000000
                       AS BIGINT)) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), {ROUND_SUM}) AS sum_value
            FROM events, (SELECT unnest([0, 1, 2, 3]) AS j)
            GROUP BY 1, 2
        """,
        "knn_join": """
            WITH sims AS (
                SELECT a.vec_id AS query_id, b.vec_id AS vid,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[]))
                           AS cos
                FROM embeddings a CROSS JOIN embeddings b
                WHERE a.vec_id != b.vec_id),
            ranked AS (
                SELECT query_id, vid, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vid) AS rank
                FROM sims)
            SELECT query_id, rank, vid AS vec_id, round(cos, 6) AS cosine
            FROM ranked WHERE rank <= 5
        """,
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                       WHERE vec_id IN (SELECT vec_id FROM embeddings
                                        ORDER BY vec_id LIMIT {_NUM_ANN_QUERIES})),
            sims AS (SELECT q.qid, e.vec_id,
                            list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
                     FROM q CROSS JOIN embeddings e
                     WHERE e.vec_id != q.qid),
            ranked AS (SELECT qid AS query_id, vec_id, cos,
                              row_number() OVER (PARTITION BY qid
                                                 ORDER BY cos DESC, vec_id)
                                  AS rank
                       FROM sims)
            SELECT query_id, rank, vec_id, round(cos, 6) AS cosine
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "forecast_revenue": """
            SELECT CAST(sum(CAST(round(l_extendedprice * 100)
                                 AS BIGINT)
                            * CAST(round(l_discount * 100)
                                   AS BIGINT)) AS BIGINT)
                       AS revenue_i,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT)
                  BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "returned_item_revenue": """
            SELECT c_custkey, c_name, n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS rev_i
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY rev_i DESC, c_custkey
            LIMIT 20
        """,
        "part_revenue_concentration": """
            WITH p AS (SELECT l_partkey AS p_partkey,
                              sum(CAST(round(l_extendedprice * 100)
                                       AS BIGINT)
                                  * (100 - CAST(round(l_discount
                                                      * 100)
                                                AS BIGINT)))
                                  AS rev_i
                       FROM lineitem GROUP BY 1)
            SELECT p_partkey, CAST(rev_i AS BIGINT) AS rev_i
            FROM p
            WHERE rev_i * (SELECT count(*) FROM p) * 4
                  > 5 * (SELECT sum(rev_i) FROM p)
        """,
        "top_supplier": """
            WITH r AS (SELECT l_suppkey AS s_suppkey,
                              sum(CAST(round(l_extendedprice * 100)
                                       AS BIGINT)
                                  * (100 - CAST(round(l_discount
                                                      * 100)
                                                AS BIGINT)))
                                  AS total_i
                       FROM lineitem
                       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate < TIMESTAMP '1996-04-01'
                       GROUP BY 1)
            SELECT s_suppkey, s_name, CAST(total_i AS BIGINT)
                       AS total_i
            FROM r JOIN supplier USING (s_suppkey)
            WHERE total_i = (SELECT max(total_i) FROM r)
        """,
        "promo_part_suppliers": """
            WITH q AS (SELECT l_suppkey AS s_suppkey, l_partkey,
                              sum(CAST(round(l_quantity) AS BIGINT))
                                  AS qty_i
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey
                       WHERE p_name LIKE '%widget%'
                         AND l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate < TIMESTAMP '1997-01-01'
                       GROUP BY 1, 2
                       HAVING qty_i > 50)
            SELECT DISTINCT s_suppkey, s_name
            FROM q
            JOIN supplier USING (s_suppkey)
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey = 0
        """,
        "user_scd2": """
            WITH s AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER w
                                 IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)),
            i AS (SELECT user_id, event_type, ts,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING)
                             AS isl
                  FROM s),
            g AS (SELECT user_id, event_type, isl,
                         min(ts) AS valid_from,
                         CAST(count(*) AS BIGINT) AS n_events
                  FROM i GROUP BY user_id, event_type, isl)
            SELECT user_id, event_type, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY isl) AS valid_to,
                   n_events
            FROM g
        """,
        "first_touch_attribution": """
            WITH e AS (SELECT event_id, user_id, ts, event_type,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            p AS (SELECT event_id, user_id, ts, cents FROM e
                  WHERE event_type = 'purchase'),
            cand AS (
                SELECT p.event_id AS pe, e2.event_type,
                       row_number() OVER (
                           PARTITION BY p.event_id
                           ORDER BY e2.ts, e2.event_id) AS rn
                FROM p JOIN e e2 ON e2.user_id = p.user_id
                 AND e2.ts >= p.ts - INTERVAL 7 DAY
                 AND (e2.ts < p.ts
                      OR (e2.ts = p.ts
                          AND e2.event_id < p.event_id))),
            ch AS (SELECT p.event_id, p.cents,
                          coalesce(c.event_type, 'direct') AS channel
                   FROM p LEFT JOIN (SELECT pe, event_type
                                     FROM cand WHERE rn = 1) c
                     ON c.pe = p.event_id)
            SELECT channel, CAST(sum(cents) AS BIGINT) AS revenue_i,
                   CAST(count(*) AS BIGINT) AS n_purchases
            FROM ch GROUP BY channel
        """,
        "part_skyline": """
            WITH t AS (SELECT p_partkey,
                              CAST(round(p_retailprice * 100)
                                   AS BIGINT) AS price_cents,
                              CAST(p_size AS BIGINT) AS p_size
                       FROM part)
            SELECT p_partkey, price_cents, p_size
            FROM t p
            WHERE NOT EXISTS (
                SELECT 1 FROM t q
                WHERE q.price_cents <= p.price_cents
                  AND q.p_size >= p.p_size
                  AND (q.price_cents < p.price_cents
                       OR q.p_size > p.p_size))
        """,
        "part_bfs_hops": """
            WITH RECURSIVE d AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS (SELECT DISTINCT a.p AS x, b.p AS y
                  FROM d a JOIN d b
                    ON a.o = b.o AND a.p <> b.p),
            bfs(node, dist) AS (
                SELECT CAST(0 AS BIGINT) AS node,
                       CAST(0 AS BIGINT) AS dist
                UNION
                SELECT e.y, bfs.dist + 1
                FROM bfs JOIN e ON e.x = bfs.node
                WHERE bfs.dist < 3)
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(min(dist) AS BIGINT) AS dist
            FROM bfs GROUP BY node
        """,
        "span_dedup": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            spans AS (
                SELECT doc_id, i AS span_idx,
                       CASE WHEN i % 3 = 2 THEN 'image'
                            ELSE 'text' END AS kind,
                       CASE WHEN i % 3 = 2 THEN ''
                            ELSE substr(full_text,
                                        CAST(i * 64 + 1 AS INT), 64)
                            END AS text
                FROM flat),
            t AS (SELECT doc_id, span_idx,
                         row_number() OVER (
                             PARTITION BY text
                             ORDER BY CAST(doc_id AS BIGINT),
                                      span_idx) AS rn
                  FROM spans WHERE kind = 'text'),
            perdoc AS (SELECT doc_id,
                              sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                                  AS kept_t,
                              sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                                  AS drop_t
                       FROM t GROUP BY doc_id),
            media AS (SELECT doc_id, count(*) AS m FROM spans
                      WHERE kind = 'image' GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(p.kept_t, 0) + coalesce(m.m, 0)
                        AS BIGINT) AS n_kept,
                   CAST(coalesce(p.drop_t, 0) AS BIGINT)
                       AS n_dropped
            FROM (SELECT DISTINCT doc_id FROM spans) d
            LEFT JOIN perdoc p ON p.doc_id = d.doc_id
            LEFT JOIN media m ON m.doc_id = d.doc_id
        """,
        "running_distinct_users": """
            WITH f AS (SELECT user_id, min(ts) AS fts FROM events
                       GROUP BY user_id),
            d AS (SELECT date_trunc('day', fts) AS day,
                         CAST(count(*) AS BIGINT) AS new_users
                  FROM f GROUP BY 1)
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_users
            FROM d
        """,
        "linear_attribution": """
            WITH e AS (SELECT event_id, user_id, ts, event_type,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            p AS (SELECT event_id, user_id, ts, cents FROM e
                  WHERE event_type = 'purchase'),
            w AS (SELECT p.event_id AS pe, p.cents, e2.event_type,
                         row_number() OVER (
                             PARTITION BY p.event_id
                             ORDER BY e2.ts, e2.event_id) AS rk,
                         count(*) OVER (PARTITION BY p.event_id)
                             AS n
                  FROM p JOIN e e2 ON e2.user_id = p.user_id
                   AND e2.ts >= p.ts - INTERVAL 7 DAY
                   AND (e2.ts < p.ts
                        OR (e2.ts = p.ts
                            AND e2.event_id < p.event_id))),
            c AS (SELECT event_type AS channel,
                         cents // n
                         + CASE WHEN rk <= cents % n
                                THEN 1 ELSE 0 END AS credit
                  FROM w
                  UNION ALL
                  SELECT 'direct', cents
                  FROM p LEFT JOIN (SELECT DISTINCT pe FROM w) t
                    ON t.pe = p.event_id
                  WHERE t.pe IS NULL)
            SELECT channel, CAST(sum(credit) AS BIGINT) AS revenue_i,
                   CAST(count(*) AS BIGINT) AS n_touches
            FROM c GROUP BY channel
        """,
        "name_edit_pairs": """
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                       AS dist
            FROM n a JOIN n b
              ON a.p_name < b.p_name
             AND levenshtein(a.p_name, b.p_name) <= 1
        """,
        "crawl_delta": """
            WITH newd AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 5 = 0 THEN upper(text)
                             ELSE text END)
                       || (CASE WHEN doc_id % 7 = 0
                                THEN ' updated content marker'
                                ELSE '' END) AS text
                FROM documents),
            oldf AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                            text AS full_text,
                            unnest(range(CAST(ceil(length(text)
                                                   / 64.0)
                                              AS BIGINT))) AS i
                     FROM documents),
            newf AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                            text AS full_text,
                            unnest(range(CAST(ceil(length(text)
                                                   / 64.0)
                                              AS BIGINT))) AS i
                     FROM newd),
            so AS (SELECT doc_id,
                          CASE WHEN i % 3 = 2 THEN 'image'
                               ELSE 'text' END AS kind,
                          CASE WHEN i % 3 = 2 THEN ''
                               ELSE substr(full_text,
                                           CAST(i * 64 + 1 AS INT),
                                           64) END AS text,
                          CASE WHEN i % 3 = 2
                               THEN 'media://' || doc_id || '/'
                                    || CAST(i AS VARCHAR)
                               ELSE '' END AS media_ref
                   FROM oldf),
            sn AS (SELECT doc_id,
                          CASE WHEN i % 3 = 2 THEN 'image'
                               ELSE 'text' END AS kind,
                          CASE WHEN i % 3 = 2 THEN ''
                               ELSE substr(full_text,
                                           CAST(i * 64 + 1 AS INT),
                                           64) END AS text,
                          CASE WHEN i % 3 = 2
                               THEN 'media://' || doc_id || '/'
                                    || CAST(i AS VARCHAR)
                               ELSE '' END AS media_ref
                   FROM newf),
            c AS (SELECT doc_id, kind, text, media_ref,
                         sum(o) AS c_old, sum(n) AS c_new
                  FROM (SELECT doc_id, kind, text, media_ref,
                               1 AS o, 0 AS n FROM so
                        UNION ALL
                        SELECT doc_id, kind, text, media_ref,
                               0 AS o, 1 AS n FROM sn)
                  GROUP BY 1, 2, 3, 4)
            SELECT doc_id,
                   CAST(sum(c_new) - sum(least(c_old, c_new))
                        AS BIGINT) AS n_added,
                   CAST(sum(c_old) - sum(least(c_old, c_new))
                        AS BIGINT) AS n_removed,
                   CAST(sum(least(c_old, c_new)) AS BIGINT)
                       AS n_unchanged
            FROM c GROUP BY doc_id
        """,
        "funnel_timeout": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 ON s1.user_id = e.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 1 HOUR
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 ON s2.user_id = e.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s2.t2 + INTERVAL 1 HOUR
                   GROUP BY e.user_id)
            SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step,
                   (SELECT CAST(count(*) AS BIGINT) FROM s1)
                       AS n_users
            UNION ALL
            SELECT 2, 'click',
                   (SELECT CAST(count(*) AS BIGINT) FROM s2)
            UNION ALL
            SELECT 3, 'purchase',
                   (SELECT CAST(count(*) AS BIGINT) FROM s3)
        """,
        "host_budget_allocation": """
            WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT)
                                  AS weight_i
                       FROM documents GROUP BY 1),
            f AS (SELECT source, weight_i,
                         (1000 * weight_i)
                         // (SELECT sum(weight_i) FROM w) AS fl,
                         1000 * weight_i
                         - ((1000 * weight_i)
                            // (SELECT sum(weight_i) FROM w))
                           * (SELECT sum(weight_i) FROM w) AS rem
                  FROM w),
            r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
                                               source) AS rk
                  FROM f)
            SELECT source, weight_i,
                   CAST(fl + CASE WHEN rk <= 1000 - (SELECT sum(fl)
                                                     FROM f)
                             THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM r
        """,
        "repeat_orders_7d": """
            SELECT o1.o_custkey AS c_custkey,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM orders o1 JOIN orders o2
              ON o1.o_custkey = o2.o_custkey
             AND o2.o_orderdate > o1.o_orderdate
             AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
            GROUP BY 1
        """,
        "peak_concurrency": """
            WITH g AS (SELECT user_id, ts,
                              CASE WHEN lag(ts) OVER w IS NULL
                                   OR ts - lag(ts) OVER w
                                      > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts)),
            s AS (SELECT user_id, ts,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                             AS sid
                  FROM g),
            iv AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en
                   FROM s GROUP BY user_id, sid),
            pts AS (SELECT st AS t, 1 AS d FROM iv
                    UNION ALL SELECT en, -1 FROM iv),
            run AS (SELECT sum(d) OVER (ORDER BY t, d DESC
                                        ROWS UNBOUNDED PRECEDING)
                        AS c
                    FROM pts)
            SELECT CAST(max(c) AS BIGINT) AS peak_concurrency,
                   (SELECT CAST(count(*) AS BIGINT) FROM iv)
                       AS n_sessions
            FROM run
        """,
        "nation_share_of_region": """
            WITH per AS (
                SELECT n_regionkey, n_name,
                       sum(CAST(round(l_extendedprice * 100)
                                AS BIGINT)
                           * (100 - CAST(round(l_discount * 100)
                                         AS BIGINT))) AS rev_i
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                GROUP BY 1, 2)
            SELECT r_name, n_name, CAST(rev_i AS BIGINT) AS rev_i,
                   CAST(rev_i AS DOUBLE)
                   / CAST(sum(rev_i) OVER (PARTITION BY n_regionkey)
                          AS DOUBLE) AS share
            FROM per JOIN region ON n_regionkey = r_regionkey
        """,
        "qty_quantiles_disc": """
            WITH c AS (SELECT l_returnflag AS f,
                              CAST(round(l_quantity) AS BIGINT) AS v,
                              count(*) AS n
                       FROM lineitem GROUP BY 1, 2),
            t AS (SELECT f, v,
                         sum(n) OVER (PARTITION BY f ORDER BY v)
                             AS cum,
                         sum(n) OVER (PARTITION BY f) AS tot
                  FROM c)
            SELECT f AS l_returnflag,
                   CAST(min(CASE WHEN cum >= ceil(0.25 * tot)
                                 THEN v END) AS BIGINT) AS p25,
                   CAST(min(CASE WHEN cum >= ceil(0.5 * tot)
                                 THEN v END) AS BIGINT) AS p50,
                   CAST(min(CASE WHEN cum >= ceil(0.75 * tot)
                                 THEN v END) AS BIGINT) AS p75
            FROM t GROUP BY 1
        """,
        "ship_latency_hist": """
            WITH ls AS (SELECT l_orderkey AS o_orderkey,
                               max(l_shipdate) AS ship
                        FROM lineitem GROUP BY 1)
            SELECT CAST(date_diff('day', o_orderdate, ship)
                        AS BIGINT) AS latency_days,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN ls USING (o_orderkey)
            GROUP BY 1
        """,
        "part_sales_classes": """
            WITH per AS (SELECT l_partkey, count(*) AS n
                         FROM lineitem GROUP BY 1),
            lab AS (SELECT p_partkey,
                           CASE WHEN n IS NULL THEN 'never'
                                WHEN n < 25 THEN 'slow'
                                WHEN n < 35 THEN 'steady'
                                ELSE 'hot' END AS sales_class
                    FROM part LEFT JOIN per
                      ON p_partkey = l_partkey)
            SELECT sales_class, CAST(count(*) AS BIGINT) AS n_parts
            FROM lab GROUP BY 1
        """,
        "span_render_text": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents)
            SELECT doc_id,
                   string_agg(CASE WHEN i % 3 = 2 THEN '<image>'
                                   ELSE substr(full_text,
                                               CAST(i * 64 + 1
                                                    AS INT), 64)
                              END, '' ORDER BY i) AS rendered
            FROM flat GROUP BY doc_id
        """,
        "user_value_twap": """
            WITH e AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            w AS (SELECT user_id, cents, ts,
                         lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                             AS nxt
                  FROM e)
            SELECT user_id,
                   CAST(sum(cents * date_diff('microsecond', ts,
                                              nxt)) AS BIGINT)
                       AS num_i,
                   CAST(sum(date_diff('microsecond', ts, nxt))
                        AS BIGINT) AS den_us,
                   CAST(sum(cents * date_diff('microsecond', ts,
                                              nxt)) AS DOUBLE)
                   / CAST(sum(date_diff('microsecond', ts, nxt))
                          AS DOUBLE) AS twap
            FROM w WHERE nxt IS NOT NULL
            GROUP BY user_id
        """,
        "crawl_new_tokens": """
            WITH newd AS (
                SELECT (CASE WHEN doc_id % 5 = 0 THEN upper(text)
                             ELSE text END)
                       || (CASE WHEN doc_id % 7 = 0
                                THEN ' updated content marker'
                                ELSE '' END) AS text
                FROM documents)
            SELECT DISTINCT t.tok AS token
            FROM newd, LATERAL unnest(
                regexp_extract_all(lower(newd.text), '[a-z]+'))
                AS t(tok)
            EXCEPT
            SELECT DISTINCT t.tok
            FROM documents, LATERAL unnest(
                regexp_extract_all(lower(documents.text), '[a-z]+'))
                AS t(tok)
        """,
        "weekly_active_users": """
            WITH ud AS (SELECT DISTINCT user_id,
                               date_trunc('day', ts) AS d
                        FROM events),
            days AS (SELECT DISTINCT d FROM ud)
            SELECT days.d AS day,
                   CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
            FROM days JOIN ud
              ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
            GROUP BY 1
        """,
        "value_cusum": """
            WITH o AS (SELECT user_id, ts, event_id,
                              CAST(round(value * 100) AS BIGINT)
                                  - 6000 AS y
                       FROM events),
            c AS (SELECT user_id, ts, event_id,
                         sum(y) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS c
                  FROM o),
            s AS (SELECT user_id,
                         c - least(0, min(c) OVER (
                                 PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING)) AS s
                  FROM c)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(s) AS BIGINT) AS max_cusum_cents,
                   max(s) >= 25000 AS alarm
            FROM s GROUP BY 1
        """,
        "doclen_outliers": """
            WITH med AS (SELECT lang,
                                CAST(quantile_disc(n_chars, 0.5)
                                     AS BIGINT) AS med
                         FROM documents GROUP BY 1),
            mad AS (SELECT d.lang,
                           CAST(quantile_disc(abs(d.n_chars - med.med),
                                              0.5) AS BIGINT) AS mad,
                           any_value(med.med) AS med
                    FROM documents d JOIN med USING (lang)
                    GROUP BY 1)
            SELECT d.doc_id, d.lang, d.n_chars, m.med, m.mad
            FROM documents d JOIN mad m ON d.lang = m.lang
            WHERE abs(d.n_chars - m.med) > 2.0 * m.mad
        """,
        "price_decile_counts": """
            WITH c AS (SELECT CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS v, count(*) AS n
                       FROM lineitem GROUP BY 1),
            t AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
                         sum(n) OVER () AS tot
                  FROM c),
            b AS (SELECT DISTINCT min(CASE WHEN cum >=
                          (q * tot + 9) // 10 THEN v END) AS bound
                  FROM t, (SELECT unnest(range(1, 10)) AS q)
                  GROUP BY q)
            SELECT CAST((SELECT count(*) FROM b
                         WHERE b.bound < l.v) AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS v FROM lineitem) l
            GROUP BY 1
        """,
        "kwic_merge": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            p AS (SELECT doc_id, ws,
                         unnest(range(1, len(ws) + 1)) AS i
                  FROM w)
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   coalesce(array_to_string(
                       ws[greatest(1, i - 3):i - 1], ' '), '')
                       AS left_ctx,
                   coalesce(array_to_string(
                       ws[i + 1:least(len(ws), i + 3)], ' '), '')
                       AS right_ctx
            FROM p WHERE ws[i] = 'merge'
        """,
        "containment_pairs": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(ws[i:i + 2], ' ') AS gram
                  FROM w, LATERAL (SELECT unnest(
                          range(1, len(ws) - 1)) AS i)),
            tot AS (SELECT doc_id, count(*) AS a_total FROM g
                    GROUP BY 1),
            inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b,
                             count(*) AS inter
                      FROM g ga JOIN g gb ON ga.gram = gb.gram
                       AND ga.doc_id <> gb.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, CAST(inter AS BIGINT) AS inter,
                   CAST(a_total AS BIGINT) AS a_total,
                   CAST(inter AS DOUBLE) / CAST(a_total AS DOUBLE)
                       AS containment
            FROM inter JOIN tot ON inter.a = tot.doc_id
            WHERE CAST(inter AS DOUBLE) / CAST(a_total AS DOUBLE)
                  >= 0.2
        """,
        "lm_quality": """
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t
                       FROM documents),
            pos AS (SELECT doc_id, t,
                           unnest(range(length(t))) AS i FROM d),
            ng AS (SELECT doc_id,
                          substr(chr(2) || chr(2) || t,
                                 CAST(i + 1 AS INT), 2) AS ctx,
                          substr(t, CAST(i + 1 AS INT), 1) AS ch
                   FROM pos),
            cnts AS (SELECT ctx, ch, count(*) AS cnt
                     FROM ng GROUP BY 1, 2),
            ctx_tot AS (SELECT ctx, sum(cnt) AS tot
                        FROM cnts GROUP BY 1),
            vv AS (SELECT count(DISTINCT ch) AS v FROM ng),
            lp AS (SELECT c.ctx, c.ch,
                          log2((c.cnt + 0.1)
                               / (t.tot + 0.1 * (SELECT v FROM vv)))
                              AS logp
                   FROM cnts c JOIN ctx_tot t USING (ctx)),
            scored AS (SELECT n.doc_id, sum(l.logp) AS s,
                              count(*) AS n_chars
                       FROM ng n JOIN lp l
                         ON l.ctx = n.ctx AND l.ch = n.ch
                       GROUP BY 1)
            SELECT d.doc_id,
                   round(coalesce(-s.s / s.n_chars, 0.0),
                         {ROUND_RATIO}) AS log2_ppl
            FROM d LEFT JOIN scored s USING (doc_id)
        """.replace("{ROUND_RATIO}", str(ROUND_RATIO)),
        "span_rechunk": """
            WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                              length(coalesce(text, '')) AS L
                       FROM documents
                       WHERE length(coalesce(text, '')) > 0),
            grp AS (SELECT doc_id, L,
                           unnest(range(CAST(ceil(L / 192.0)
                                             AS BIGINT))) AS k
                    FROM d),
            per AS (SELECT doc_id, k,
                           greatest(0, least(L - 192 * k, 128))
                               AS run_chars,
                           CASE WHEN L > 192 * k + 128
                                THEN 1 ELSE 0 END AS has_image
                    FROM grp),
            sym AS (SELECT doc_id, k, 0 AS pos, 'text' AS kind
                    FROM per WHERE run_chars > 0
                    UNION ALL
                    SELECT doc_id, k, 1, 'image'
                    FROM per WHERE has_image = 1),
            marks AS (SELECT doc_id,
                             CASE WHEN lag(kind) OVER (
                                      PARTITION BY doc_id
                                      ORDER BY k, pos)
                                  IS DISTINCT FROM kind
                                  THEN 1 ELSE 0 END AS st
                      FROM sym)
            SELECT p.doc_id,
                   CAST(sum(CAST(ceil(p.run_chars / 96.0) AS BIGINT)
                            + p.has_image) AS BIGINT) AS n_spans,
                   CAST(sum(p.has_image) AS BIGINT) AS n_media,
                   CAST(sum(p.run_chars) AS BIGINT) AS text_chars,
                   CAST((SELECT sum(st) FROM marks m
                         WHERE m.doc_id = p.doc_id) AS BIGINT)
                       AS n_runs
            FROM per p GROUP BY p.doc_id
        """,
        "lang_id": _lang_id_oracle(),
        "part_communities": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            stubs AS (
                SELECT u AS node, v AS nbr FROM e
                UNION ALL SELECT v, u FROM e),
            l0 AS (SELECT DISTINCT node, node AS label FROM stubs),
            v1 AS (
                SELECT s.node, l.label, count(*) AS c
                FROM stubs s JOIN l0 l ON l.node = s.nbr
                GROUP BY 1, 2),
            l1 AS (
                SELECT node, label FROM v1
                QUALIFY row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label) = 1),
            v2 AS (
                SELECT s.node, l.label, count(*) AS c
                FROM stubs s JOIN l1 l ON l.node = s.nbr
                GROUP BY 1, 2),
            l2 AS (
                SELECT node, label FROM v2
                QUALIFY row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label) = 1),
            v3 AS (
                SELECT s.node, l.label, count(*) AS c
                FROM stubs s JOIN l2 l ON l.node = s.nbr
                GROUP BY 1, 2),
            l3 AS (
                SELECT node, label FROM v3
                QUALIFY row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label) = 1),
            v4 AS (
                SELECT s.node, l.label, count(*) AS c
                FROM stubs s JOIN l3 l ON l.node = s.nbr
                GROUP BY 1, 2),
            l4 AS (
                SELECT node, label FROM v4
                QUALIFY row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label) = 1)
            SELECT node, label FROM l4 ORDER BY node
        """,
        "part_hits": """
            WITH e AS (
                SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                                CAST(l_partkey AS BIGINT) AS dst
                FROM lineitem),
            h0 AS (SELECT DISTINCT src AS node,
                          CAST(1000000000 AS HUGEINT) AS s FROM e),
            a1r AS (
                SELECT e.dst AS node, sum(h.s) AS s
                FROM e JOIN h0 h ON h.node = e.src GROUP BY 1),
            a1 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM a1r) AS s
                FROM a1r),
            h1r AS (
                SELECT e.src AS node, sum(a.s) AS s
                FROM e JOIN a1 a ON a.node = e.dst GROUP BY 1),
            h1 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM h1r) AS s
                FROM h1r),
            a2r AS (
                SELECT e.dst AS node, sum(h.s) AS s
                FROM e JOIN h1 h ON h.node = e.src GROUP BY 1),
            a2 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM a2r) AS s
                FROM a2r),
            h2r AS (
                SELECT e.src AS node, sum(a.s) AS s
                FROM e JOIN a2 a ON a.node = e.dst GROUP BY 1),
            h2 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM h2r) AS s
                FROM h2r),
            a3r AS (
                SELECT e.dst AS node, sum(h.s) AS s
                FROM e JOIN h2 h ON h.node = e.src GROUP BY 1),
            a3 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM a3r) AS s
                FROM a3r),
            h3r AS (
                SELECT e.src AS node, sum(a.s) AS s
                FROM e JOIN a3 a ON a.node = e.dst GROUP BY 1),
            h3 AS (
                SELECT node, s * 1000000000 // (SELECT max(s) FROM h3r) AS s
                FROM h3r)
            SELECT 'hub' AS side, node, CAST(s AS BIGINT) AS score FROM h3
            UNION ALL
            SELECT 'authority', node, CAST(s AS BIGINT) FROM a3
        """,
        "part_kcore": """
            WITH RECURSIVE lp AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            strong AS (
                SELECT u, v FROM (
                    SELECT a.l_partkey AS u, b.l_partkey AS v,
                           count(*) AS cnt
                    FROM lp a JOIN lp b
                      ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
                    GROUP BY 1, 2)
                WHERE cnt >= 2),
            peel AS (
                SELECT 0 AS it, u, v FROM strong
                UNION ALL
                SELECT it + 1, u, v FROM (
                    WITH cur AS (SELECT * FROM peel),
                    deg AS (SELECT n, count(*) AS c FROM (
                                SELECT u AS n FROM cur
                                UNION ALL SELECT v FROM cur)
                            GROUP BY n)
                    SELECT cur.it, cur.u, cur.v FROM cur
                    JOIN deg du ON du.n = cur.u
                    JOIN deg dv ON dv.n = cur.v
                    WHERE du.c >= 3 AND dv.c >= 3
                      AND EXISTS (SELECT 1 FROM deg WHERE c < 3))),
            last AS (
                SELECT u, v FROM peel
                WHERE it = (SELECT max(it) FROM peel))
            SELECT n AS node, count(*) AS degree FROM (
                SELECT u AS n FROM last UNION ALL SELECT v FROM last)
            GROUP BY n ORDER BY node
        """,
        "exact_dedup_losers": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0 THEN text
                            ELSE text || ' odd variant' END
                FROM documents)
            SELECT doc_id FROM u
            QUALIFY row_number() OVER (
                PARTITION BY coalesce(text, '')
                ORDER BY doc_id) > 1
            ORDER BY doc_id
        """,
        "value_ewma": """
            WITH RECURSIVE ev AS (
                SELECT user_id, event_id, CAST(value AS DOUBLE) AS x,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events),
            z AS (
                SELECT user_id, event_id, rn, x AS ewma
                FROM ev WHERE rn = 1
                UNION ALL
                -- exact replay of pandas ewm(adjust=False):
                -- z = (1-a)*z + a*x, then /((1-a)+a) which is
                -- exactly 1.0 for a=0.3 (identity)
                SELECT e.user_id, e.event_id, e.rn,
                       (1 - 0.3) * z.ewma + 0.3 * e.x
                FROM z JOIN ev e
                  ON e.user_id = z.user_id AND e.rn = z.rn + 1)
            SELECT event_id, user_id, round(ewma, 6) AS ewma FROM z
        """,
        "exact_dedup_best": """
            WITH u AS (
                SELECT doc_id, text,
                       CAST(n_chars AS BIGINT) AS quality
                FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0 THEN text
                            ELSE text || ' odd variant' END,
                       CAST(n_chars + 1 AS BIGINT)
                FROM documents)
            SELECT doc_id, quality FROM u
            QUALIFY row_number() OVER (PARTITION BY text
                ORDER BY quality DESC, doc_id) = 1
        """,
        "leakage_split": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0 THEN text
                            ELSE text || ' odd variant' END
                FROM documents),
            r AS (SELECT doc_id,
                         min(doc_id) OVER (PARTITION BY text) AS root
                  FROM u)
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(
                            md5(CAST(root AS VARCHAR)), 1, 8))
                            AS UBIGINT) % 100 < 80
                        THEN 'train' ELSE 'test' END AS split
            FROM r
        """,
        "span_truncate": """
            WITH flat AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text AS full_text,
                       unnest(range(CAST(ceil(length(text) / 64.0)
                                         AS BIGINT))) AS i
                FROM documents),
            cost AS (SELECT doc_id, i,
                            CASE WHEN i % 3 = 2 THEN 'image'
                                 ELSE 'text' END AS kind,
                            CASE WHEN i % 3 = 2 THEN 16
                                 ELSE length(substr(full_text,
                                     CAST(i * 64 + 1 AS INT), 64))
                                 END AS c
                     FROM flat),
            run AS (SELECT doc_id, kind, c,
                           sum(c) OVER (PARTITION BY doc_id
                                        ORDER BY i) AS cum
                    FROM cost)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans_kept,
                   CAST(sum(CASE WHEN kind = 'text' THEN c
                                 ELSE 0 END) AS BIGINT) AS chars_kept,
                   CAST(count(*) FILTER (kind = 'image')
                        AS BIGINT) AS n_media_kept
            FROM run WHERE cum <= 200 GROUP BY 1
        """,
        "source_signature_terms": """
            WITH tok AS (SELECT source,
                                unnest(string_split(text, ' '))
                                    AS token
                         FROM documents),
            ct AS (SELECT source, token, count(*) AS n_tg FROM tok
                   GROUP BY 1, 2),
            m AS (SELECT source, token, n_tg,
                         sum(n_tg) OVER (PARTITION BY token) AS n_t,
                         sum(n_tg) OVER (PARTITION BY source) AS n_g,
                         sum(n_tg) OVER () AS n
                  FROM ct)
            SELECT token, source, CAST(n_tg AS BIGINT) AS n_tg,
                   CAST(n_t AS BIGINT) AS n_t,
                   CAST(n_g AS BIGINT) AS n_g,
                   (CAST(n_tg AS DOUBLE) * CAST(n AS DOUBLE))
                   / (CAST(n_t AS DOUBLE) * CAST(n_g AS DOUBLE))
                       AS lift
            FROM m
            WHERE n_tg * n * 4 > 5 * n_t * n_g AND n_tg >= 5
        """,
        "centroid_cosine": """
            WITH e AS (SELECT label, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS dim
                       FROM embeddings),
            c AS (SELECT label, dim,
                         round(avg(CAST(v AS DOUBLE)), 12) AS m
                  FROM e GROUP BY 1, 2),
            n AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM c
                  GROUP BY 1)
            SELECT a.label AS label_a, b.label AS label_b,
                   round(sum(a.m * b.m)
                         / (any_value(na.nrm) * any_value(nb.nrm)), 6)
                       AS cosine
            FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
            JOIN n na ON na.label = a.label
            JOIN n nb ON nb.label = b.label
            GROUP BY 1, 2
        """,
        "interarrival_stats": """
            WITH o AS (SELECT user_id, event_id,
                              epoch_us(ts) AS us FROM events),
            g AS (SELECT user_id,
                         (us - lag(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id)) // 1000000
                             AS gap
                  FROM o)
            SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
                   CAST(sum(gap) AS BIGINT) AS sum_gap_s,
                   CAST(sum(gap) AS DOUBLE) / count(gap)
                       AS mean_gap_s,
                   CASE WHEN sum(gap) = 0 THEN NULL
                        ELSE sqrt(CAST(count(gap) * sum(gap * gap)
                                       - sum(gap) * sum(gap)
                                       AS DOUBLE))
                             / count(gap)
                             / (CAST(sum(gap) AS DOUBLE) / count(gap))
                        END AS cv_gap
            FROM g WHERE gap IS NOT NULL GROUP BY 1
        """,
        "benford_orders": """
            WITH v AS (SELECT substr(CAST(CAST(round(
                                  o_totalprice * 100) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS d
                       FROM orders),
            c AS (SELECT CAST(d AS BIGINT) AS digit, count(*) AS n
                  FROM v GROUP BY 1),
            t AS (SELECT digit, n, sum(n) OVER () AS tot FROM c)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   CAST(tot AS DOUBLE)
                       * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
                       AS expected,
                   pow(CAST(n AS DOUBLE) - CAST(tot AS DOUBLE)
                       * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
                   / (CAST(tot AS DOUBLE)
                      * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                       AS chi2_part
            FROM t
        """,
        "open_orders_daily": """
            WITH cl AS (SELECT l_orderkey, max(l_shipdate) AS close
                        FROM lineitem GROUP BY 1),
            iv AS (SELECT date_trunc('day', o_orderdate) AS s,
                          date_trunc('day', close) AS e
                   FROM orders JOIN cl ON o_orderkey = l_orderkey
                   WHERE date_trunc('day', o_orderdate)
                         <= date_trunc('day', close)),
            days AS (SELECT unnest(generate_series(
                         (SELECT min(s) FROM iv),
                         (SELECT max(e) FROM iv),
                         INTERVAL 1 DAY)) AS day)
            SELECT days.day,
                   CAST(count(iv.s) AS BIGINT) AS n_open
            FROM days LEFT JOIN iv
              ON iv.s <= days.day AND days.day <= iv.e
            GROUP BY 1
        """,
        "events_asof_tol": """
            SELECT p.event_id, p.user_id, p.ts,
                   (SELECT max(v.ts) FROM events v
                    WHERE v.user_id = p.user_id
                      AND v.event_type = 'view'
                      AND v.ts <= p.ts
                      AND v.ts >= p.ts - INTERVAL 3600 SECOND)
                       AS prior_ts
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "user_rate_peaks": """
            WITH c AS (SELECT a.user_id, a.event_id,
                              count(*) AS n
                       FROM events a JOIN events b
                         ON a.user_id = b.user_id
                        AND b.ts <= a.ts
                        AND b.ts > a.ts - INTERVAL 60 SECOND
                       GROUP BY 1, 2)
            SELECT user_id, CAST(max(n) AS BIGINT) AS peak
            FROM c GROUP BY 1
        """,
        "user_value_locf": """
            WITH span AS (SELECT user_id,
                                 date_trunc('day', min(ts)) AS d0,
                                 date_trunc('day', max(ts)) AS d1
                          FROM events GROUP BY 1),
            grid AS (SELECT user_id,
                            unnest(generate_series(d0, d1,
                                INTERVAL 1 DAY)) AS day
                     FROM span)
            SELECT g.user_id, g.day,
                   (SELECT CAST(round(e.value * 100) AS BIGINT)
                    FROM events e
                    WHERE e.user_id = g.user_id
                      AND e.ts < g.day + INTERVAL 1 DAY
                    ORDER BY e.ts DESC, e.event_id DESC
                    LIMIT 1) AS value_cents
            FROM grid g
        """,
        "politeness_schedule": """
            WITH r AS (SELECT event_id, user_id, epoch_us(ts) AS aus,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) - 1 AS rn
                       FROM events),
            m AS (SELECT event_id, user_id, aus, rn,
                         max(aus - rn * 5000000) OVER (
                             PARTITION BY user_id ORDER BY rn) AS base
                  FROM r)
            SELECT event_id, user_id,
                   CAST(base + rn * 5000000 - aus AS BIGINT) AS wait_us
            FROM m
        """,
        "daily_ohlc": """
            WITH e AS (SELECT user_id, date_trunc('day', ts) AS day,
                              ts, event_id,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events)
            SELECT user_id, day,
                   first(c ORDER BY ts, event_id) AS open_cents,
                   max(c) AS high_cents, min(c) AS low_cents,
                   last(c ORDER BY ts, event_id) AS close_cents,
                   count(*) AS n
            FROM e GROUP BY 1, 2
        """,
        "priority_gini": """
            WITH v AS (SELECT o_orderpriority,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS c
                       FROM orders),
            r AS (SELECT o_orderpriority, c,
                         CAST(row_number() OVER (
                             PARTITION BY o_orderpriority ORDER BY c)
                             AS HUGEINT) AS i
                  FROM v)
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS total_cents,
                   CAST(2 * sum(i * c) - (count(*) + 1) * sum(c)
                        AS DOUBLE)
                       / CAST(count(*) * sum(c) AS DOUBLE) AS gini
            FROM r GROUP BY 1
        """,
        "zipf_slope": """
            WITH h AS (SELECT token, count(*) AS n
                       FROM (SELECT unnest(string_split_regex(
                                 lower(trim(text)), '\\s+')) AS token
                             FROM documents WHERE trim(text) != '')
                       GROUP BY token
                       ORDER BY n DESC, token LIMIT 500),
            r AS (SELECT ln(CAST(row_number() OVER (
                              ORDER BY n DESC, token) AS DOUBLE)) AS x,
                         ln(CAST(n AS DOUBLE)) AS y
                  FROM h),
            s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x * y) AS sxy, sum(x * x) AS sxx
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx)
                       AS zipf_slope,
                   (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                       * sx) / n AS zipf_intercept
            FROM s
        """,
        "complete_users": """
            WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_attrs
            FROM p GROUP BY 1
            HAVING count(*) = (SELECT count(DISTINCT event_type)
                               FROM events)
        """,
        "decayed_user_value": """
            WITH r AS (SELECT max(epoch_us(ts)) AS tref FROM events)
            SELECT user_id,
                   sum(value * pow(0.5,
                       (r.tref - epoch_us(ts)) / 21600000000.0))
                       AS decayed_value
            FROM events, r GROUP BY 1
        """,
        "doc_readability": """
            WITH c AS (SELECT doc_id,
                              CAST(len(regexp_extract_all(text,
                                  '[A-Za-z]+')) AS BIGINT) AS n_words,
                              greatest(CAST(len(regexp_extract_all(
                                  text, '[.!?]+')) AS BIGINT),
                                  1) AS n_sentences,
                              CAST(len(regexp_extract_all(text,
                                  '[aeiouyAEIOUY]+')) AS BIGINT)
                                  AS n_vowel_groups
                       FROM documents)
            SELECT doc_id, n_words, n_sentences, n_vowel_groups,
                   206.835
                       - 1.015 * (CAST(n_words AS DOUBLE)
                                  / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (CAST(n_vowel_groups AS DOUBLE)
                                 / CAST(n_words AS DOUBLE)) AS flesch
            FROM c WHERE n_words > 0
        """,
        "label_silhouette": """
            WITH e AS (SELECT vec_id, label, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS dim
                       FROM embeddings),
            c AS (SELECT label, dim,
                         round(avg(CAST(v AS DOUBLE)), 12) AS m
                  FROM e GROUP BY 1, 2),
            d AS (SELECT e.vec_id, e.label AS vlabel,
                         c.label AS clabel,
                         sum((CAST(e.v AS DOUBLE) - c.m)
                             * (CAST(e.v AS DOUBLE) - c.m)) AS d2
                  FROM e JOIN c ON e.dim = c.dim GROUP BY 1, 2, 3),
            s AS (SELECT vec_id, vlabel,
                         min(CASE WHEN clabel = vlabel THEN d2 END)
                             AS a2,
                         min(CASE WHEN clabel <> vlabel THEN d2 END)
                             AS b2
                  FROM d GROUP BY 1, 2)
            SELECT vlabel AS label, CAST(count(*) AS BIGINT) AS n,
                   round(avg((sqrt(b2) - sqrt(a2))
                             / greatest(sqrt(a2), sqrt(b2))), 6)
                       AS silhouette
            FROM s GROUP BY 1
        """,
        "mutual_top1": """
            WITH q AS (SELECT vec_id,
                              list_transform(
                                  CAST(embedding AS DOUBLE[]),
                                  x -> floor(x * 32768.0 + 0.5))
                                  AS qv
                       FROM embeddings),
            d AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                         list_dot_product(a.qv, b.qv) AS dot
                  FROM q a CROSS JOIN q b
                  WHERE a.vec_id <> b.vec_id),
            best AS (SELECT ai, bi, dot,
                            row_number() OVER (PARTITION BY ai
                                               ORDER BY dot DESC, bi)
                                AS rn
                     FROM d),
            b1 AS (SELECT ai, bi, dot FROM best WHERE rn = 1)
            SELECT x.ai AS a, x.bi AS b,
                   CAST(x.dot AS BIGINT) AS dot
            FROM b1 x JOIN b1 y ON x.bi = y.ai AND y.bi = x.ai
            WHERE x.ai < x.bi
            ORDER BY a, b
        """,
        "graph_assortativity": """
            WITH pairs AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            e AS (SELECT DISTINCT u, v FROM pairs),
            deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                    FROM (SELECT u AS node FROM e
                          UNION ALL SELECT v FROM e)
                    GROUP BY node),
            ed AS (SELECT du.deg AS x, dv.deg AS y
                   FROM e JOIN deg du ON du.node = e.u
                          JOIN deg dv ON dv.node = e.v),
            stubs AS (SELECT x, y FROM ed
                      UNION ALL SELECT y AS x, x AS y FROM ed),
            s AS (SELECT CAST(count(*) AS HUGEINT) AS m2,
                         CAST(sum(x) AS HUGEINT) AS sx,
                         CAST(sum(x * y) AS HUGEINT) AS sxy,
                         CAST(sum(x * x) AS HUGEINT) AS sxx
                  FROM stubs)
            SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
                   CAST(m2 * sxy - sx * sx AS DOUBLE)
                       / CAST(m2 * sxx - sx * sx AS DOUBLE)
                       AS assortativity
            FROM s
        """,
        "local_clustering": """
            WITH pairs AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            e AS (SELECT DISTINCT u, v FROM pairs),
            und AS (SELECT u, v FROM e
                    UNION ALL SELECT v AS u, u AS v FROM e),
            deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
                    FROM und GROUP BY u),
            tri AS (SELECT node, CAST(count(*) AS BIGINT) AS t
                    FROM (SELECT n1.u AS node
                          FROM und n1
                          JOIN und n2 ON n2.u = n1.u AND n1.v < n2.v
                          JOIN e ON e.u = n1.v AND e.v = n2.v)
                    GROUP BY node)
            SELECT d.node AS node, d.deg,
                   CAST(coalesce(tri.t, 0) AS BIGINT) AS n_triangles,
                   round(2.0 * coalesce(tri.t, 0)
                         / (d.deg * (d.deg - 1)), 12) AS clustering
            FROM deg d LEFT JOIN tri ON tri.node = d.node
            WHERE d.deg >= 2
            ORDER BY d.node
        """,
        "late_events": """
            WITH a AS (SELECT user_id,
                              CAST(epoch_us(ts) AS BIGINT) AS us,
                              (event_id * 48271) % 100003
                                  * 10000000000 + event_id AS arr
                       FROM events),
            b AS (SELECT user_id, us,
                         max(us) OVER (PARTITION BY user_id
                                       ORDER BY arr
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS wm
                  FROM a)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN us < wm THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_late,
                   CAST(max(CASE WHEN us < wm THEN wm - us
                            ELSE 0 END) AS BIGINT) AS max_late_us
            FROM b GROUP BY user_id ORDER BY user_id
        """,
        "adamic_adar": """
            WITH pp AS (SELECT DISTINCT a.l_partkey AS u,
                                        b.l_partkey AS v
                        FROM lineitem a JOIN lineitem b
                          ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey),
            st AS (SELECT u AS c, v AS n FROM pp
                   UNION ALL SELECT v, u FROM pp),
            dg AS (SELECT c, count(*) AS deg FROM st GROUP BY c),
            w AS (SELECT s1.n AS a, s2.n AS b, 1.0/ln(dg.deg) AS wt
                  FROM st s1 JOIN st s2
                    ON s1.c = s2.c AND s1.n < s2.n
                  JOIN dg ON dg.c = s1.c),
            cn AS (SELECT a, b, count(*) AS common_neighbors,
                          sum(wt) AS aa_score
                   FROM w GROUP BY a, b),
            na AS (SELECT cn.* FROM cn
                   LEFT JOIN pp ON cn.a = pp.u AND cn.b = pp.v
                   WHERE pp.u IS NULL)
            SELECT a, b, common_neighbors, aa_score
            FROM na ORDER BY common_neighbors DESC, a, b LIMIT 1000
        """,
        "degree_powerlaw": """
            WITH pp AS (SELECT DISTINCT a.l_partkey AS u,
                                        b.l_partkey AS v
                        FROM lineitem a JOIN lineitem b
                          ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey),
            st AS (SELECT u AS c FROM pp UNION ALL SELECT v FROM pp),
            dg AS (SELECT c, count(*) AS deg FROM st GROUP BY c),
            t AS (SELECT deg FROM dg WHERE deg >= 5)
            SELECT CAST(5 AS BIGINT) AS d_min,
                   count(*) AS n_tail,
                   sum(ln(deg / 5.0)) AS sum_ln,
                   1.0 + count(*) / sum(ln(deg / 5.0)) AS alpha
            FROM t
        """,
        "basket_pairs": """
            WITH p AS (SELECT DISTINCT l_orderkey AS o,
                                       l_partkey AS pk
                       FROM lineitem),
            s AS (SELECT o, count(*) AS sz FROM p GROUP BY o),
            j AS (SELECT a.o AS oa, b.o AS ob, count(*) AS c
                  FROM p a JOIN p b ON a.pk = b.pk AND a.o < b.o
                  GROUP BY a.o, b.o)
            SELECT j.oa AS a, j.ob AS b, j.c AS n_common,
                   CAST(j.c AS DOUBLE) / (sa.sz + sb.sz - j.c)
                       AS jaccard
            FROM j JOIN s sa ON sa.o = j.oa
                   JOIN s sb ON sb.o = j.ob
            WHERE j.c >= 2 ORDER BY 1, 2
        """,
        "daily_acf": """
            WITH dc AS (SELECT epoch_us(ts) // 86400000000 AS day,
                               count(*) AS n
                        FROM events GROUP BY 1),
            bnd AS (SELECT min(day) AS lo, max(day) AS hi FROM dc),
            grid AS (SELECT unnest(generate_series(
                         (SELECT lo FROM bnd),
                         (SELECT hi FROM bnd))) AS day),
            x AS (SELECT g.day, COALESCE(dc.n, 0) AS n
                  FROM grid g LEFT JOIN dc USING (day)),
            s AS (SELECT count(*) AS nn, sum(n) AS s1,
                         sum(CAST(n AS HUGEINT) * n) AS q FROM x),
            lagk AS (SELECT unnest(generate_series(1, 7)) AS k),
            pk AS (SELECT l.k,
                          sum(CAST(x1.n AS HUGEINT) * x2.n) AS p,
                          sum(CAST(x1.n AS HUGEINT)) AS t1,
                          sum(CAST(x2.n AS HUGEINT)) AS t2
                   FROM lagk l JOIN x x1 ON TRUE
                   JOIN x x2 ON x2.day = x1.day - l.k
                   GROUP BY l.k)
            SELECT pk.k AS lag,
                   CAST(s.nn*s.nn*pk.p - s.nn*s.s1*(pk.t1 + pk.t2)
                        + (s.nn - pk.k)*s.s1*s.s1 AS DOUBLE)
                   / CAST(s.nn*s.nn*s.q - s.nn*s.s1*s.s1 AS DOUBLE)
                       AS acf
            FROM pk, s ORDER BY lag
        """,
        "ppr_promo": """
            WITH edges AS (SELECT DISTINCT 2 * l_orderkey AS src,
                                  2 * l_partkey + 1 AS dst
                           FROM lineitem),
            nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)),
            deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
            sd AS (SELECT DISTINCT 2 * p_partkey + 1 AS node
                   FROM part WHERE p_type = 'PROMO'),
            seeds AS (SELECT n.node FROM nodes n
                      JOIN sd ON sd.node = n.node),
            sp AS (SELECT count(*) AS s FROM seeds),
            r0 AS (SELECT n.node,
                          CASE WHEN se.node IS NOT NULL
                               THEN 1000000000000 // sp.s
                               ELSE 0 END AS r
                   FROM nodes n CROSS JOIN sp
                   LEFT JOIN seeds se ON n.node = se.node),
            i1 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r0 r ON e.src = r.node
                   GROUP BY e.dst),
            r1 AS (SELECT n.node,
                          (CASE WHEN se.node IS NOT NULL
                                THEN 150000000000 // sp.s
                                ELSE 0 END) + COALESCE(i.s, 0) AS r
                   FROM nodes n CROSS JOIN sp
                   LEFT JOIN seeds se ON n.node = se.node
                   LEFT JOIN i1 i ON n.node = i.node),
            i2 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r1 r ON e.src = r.node
                   GROUP BY e.dst),
            r2 AS (SELECT n.node,
                          (CASE WHEN se.node IS NOT NULL
                                THEN 150000000000 // sp.s
                                ELSE 0 END) + COALESCE(i.s, 0) AS r
                   FROM nodes n CROSS JOIN sp
                   LEFT JOIN seeds se ON n.node = se.node
                   LEFT JOIN i2 i ON n.node = i.node),
            i3 AS (SELECT e.dst AS node,
                          SUM((85 * r.r) // (100 * d.deg)) AS s
                   FROM edges e
                   JOIN deg d ON e.src = d.src
                   JOIN r2 r ON e.src = r.node
                   GROUP BY e.dst),
            r3 AS (SELECT n.node,
                          (CASE WHEN se.node IS NOT NULL
                                THEN 150000000000 // sp.s
                                ELSE 0 END) + COALESCE(i.s, 0) AS r
                   FROM nodes n CROSS JOIN sp
                   LEFT JOIN seeds se ON n.node = se.node
                   LEFT JOIN i3 i ON n.node = i.node)
            SELECT node, r::BIGINT AS r FROM r3
        """,
        "assoc_rules": """
            WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
                                       event_type AS t
                       FROM events),
            nb AS (SELECT count(*) AS n FROM
                   (SELECT DISTINCT user_id, d FROM b)),
            it AS (SELECT t, count(*) AS n FROM b GROUP BY t),
            pr AS (SELECT x.t AS a, y.t AS c, count(*) AS n
                   FROM b x JOIN b y
                     ON x.user_id = y.user_id AND x.d = y.d
                    AND x.t <> y.t
                   GROUP BY x.t, y.t)
            SELECT pr.a AS antecedent, pr.c AS consequent,
                   pr.n AS n_both, ia.n AS n_ante, ic.n AS n_cons,
                   nb.n AS n_baskets,
                   CAST(pr.n AS DOUBLE) / nb.n AS support,
                   CAST(pr.n AS DOUBLE) / ia.n AS confidence,
                   CAST(pr.n * nb.n AS DOUBLE)
                       / CAST(ia.n * ic.n AS DOUBLE) AS lift
            FROM pr JOIN it ia ON ia.t = pr.a
                    JOIN it ic ON ic.t = pr.c
                    CROSS JOIN nb
            ORDER BY 1, 2
        """,
        "session_entry_exit": """
            WITH o AS (SELECT user_id, ts, event_id, event_type,
                              CASE WHEN ts - lag(ts) OVER
                                   (PARTITION BY user_id
                                    ORDER BY ts, event_id)
                                   > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                       FROM events),
            s AS (SELECT user_id, event_type, ts, event_id,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS sid
                  FROM o),
            fe AS (SELECT user_id, sid,
                          first(event_type ORDER BY ts, event_id)
                              AS entry_type,
                          last(event_type ORDER BY ts, event_id)
                              AS exit_type
                   FROM s GROUP BY user_id, sid)
            SELECT entry_type, exit_type,
                   count(*) AS n_sessions
            FROM fe GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "ttr_by_source": """
            WITH tok AS (SELECT source,
                                unnest(string_split_regex(
                                    lower(trim(text)), '\\s+')) AS token
                         FROM documents WHERE trim(text) != '')
            SELECT source, count(*) AS n_tokens,
                   count(DISTINCT token) AS n_types,
                   CAST(count(DISTINCT token) AS DOUBLE) / count(*)
                       AS ttr
            FROM tok GROUP BY source ORDER BY source
        """,
        "sssp_hops": """
            WITH raw AS (SELECT 2 * l_orderkey AS s,
                                2 * l_partkey + 1 AS t,
                                CAST(l_linenumber AS BIGINT) AS w
                         FROM lineitem),
            e AS (SELECT src, dst, min(w) AS w FROM (
                      SELECT s AS src, t AS dst, w FROM raw
                      UNION ALL SELECT t, s, w FROM raw)
                  GROUP BY src, dst),
            sd AS (SELECT 2 * min(l_orderkey) AS n FROM lineitem),
            d0 AS (SELECT n AS node, CAST(0 AS BIGINT) AS d FROM sd),
            c1 AS (SELECT e.dst AS node, min(d0.d + e.w) AS d
                   FROM d0 JOIN e ON e.src = d0.node GROUP BY e.dst),
            d1 AS (SELECT node, min(d) AS d FROM (
                       SELECT * FROM d0 UNION ALL SELECT * FROM c1)
                   GROUP BY node),
            c2 AS (SELECT e.dst AS node, min(d1.d + e.w) AS d
                   FROM d1 JOIN e ON e.src = d1.node GROUP BY e.dst),
            d2 AS (SELECT node, min(d) AS d FROM (
                       SELECT * FROM d1 UNION ALL SELECT * FROM c2)
                   GROUP BY node),
            c3 AS (SELECT e.dst AS node, min(d2.d + e.w) AS d
                   FROM d2 JOIN e ON e.src = d2.node GROUP BY e.dst),
            d3 AS (SELECT node, min(d) AS d FROM (
                       SELECT * FROM d2 UNION ALL SELECT * FROM c3)
                   GROUP BY node),
            c4 AS (SELECT e.dst AS node, min(d3.d + e.w) AS d
                   FROM d3 JOIN e ON e.src = d3.node GROUP BY e.dst),
            d4 AS (SELECT node, min(d) AS d FROM (
                       SELECT * FROM d3 UNION ALL SELECT * FROM c4)
                   GROUP BY node)
            SELECT node, d AS dist FROM d4 ORDER BY node
        """,
        "two_hop_reach": """
            WITH pp AS (SELECT DISTINCT a.l_partkey AS u,
                                        b.l_partkey AS v
                        FROM lineitem a JOIN lineitem b
                          ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey),
            st AS (SELECT u AS c, v AS n FROM pp
                   UNION ALL SELECT v, u FROM pp),
            w AS (SELECT DISTINCT s1.n AS a, s2.n AS b
                  FROM st s1 JOIN st s2
                    ON s1.c = s2.c AND s1.n < s2.n),
            nw AS (SELECT w.a, w.b FROM w
                   LEFT JOIN pp ON w.a = pp.u AND w.b = pp.v
                   WHERE pp.u IS NULL)
            SELECT node, count(*) AS n_two_hop FROM (
                SELECT a AS node FROM nw
                UNION ALL SELECT b FROM nw)
            GROUP BY node ORDER BY node
        """,
        "oov_rate": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split_regex(
                                    lower(trim(text)), '\\s+')) AS token
                         FROM documents WHERE trim(text) != ''),
            v AS (SELECT token FROM (
                      SELECT token, count(*) AS n FROM tok
                      GROUP BY token
                      ORDER BY n DESC, token LIMIT 500))
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN tok.token NOT IN
                                 (SELECT token FROM v)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_oov,
                   CAST(sum(CASE WHEN tok.token NOT IN
                                 (SELECT token FROM v)
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS oov_rate
            FROM tok GROUP BY doc_id ORDER BY doc_id
        """,
        "token_entropy": """
            WITH tok AS (SELECT unnest(string_split_regex(
                             lower(trim(text)), '\\s+')) AS token
                         FROM documents WHERE trim(text) != ''),
            c AS (SELECT token, count(*) AS n FROM tok
                  GROUP BY token),
            s AS (SELECT sum(n) AS nt, count(*) AS v,
                         sum(n * ln(n)) AS h FROM c)
            SELECT CAST(nt AS BIGINT) AS n_tokens,
                   CAST(v AS BIGINT) AS vocab_size,
                   ln(nt) - h / nt AS entropy_nats,
                   exp(ln(nt) - h / nt) AS perplexity
            FROM s
        """,
        "km_repeat": """
            WITH p AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            mx AS (SELECT max(ts) AS m FROM events),
            f AS (SELECT user_id, min(ts) AS t1 FROM p
                  GROUP BY user_id),
            s2 AS (SELECT f.user_id, min(p.ts) AS t2
                   FROM f JOIN p ON p.user_id = f.user_id
                              AND p.ts > f.t1
                   GROUP BY f.user_id),
            d AS (SELECT f.user_id,
                         COALESCE(
                             (epoch_us(s2.t2) - epoch_us(f.t1))
                                 // 86400000000,
                             (epoch_us(mx.m) - epoch_us(f.t1))
                                 // 86400000000) AS t,
                         CASE WHEN s2.t2 IS NOT NULL
                              THEN 1 ELSE 0 END AS e
                  FROM f LEFT JOIN s2 USING (user_id) CROSS JOIN mx),
            ev AS (SELECT t, count(*) AS d_i FROM d WHERE e = 1
                   GROUP BY t),
            risk AS (SELECT ev.t, ev.d_i,
                            (SELECT count(*) FROM d
                             WHERE d.t >= ev.t) AS n_i
                     FROM ev)
            SELECT t AS t_days, n_i AS n_at_risk, d_i AS n_events,
                   product(1 - CAST(d_i AS DOUBLE) / n_i)
                       OVER (ORDER BY t) AS survival
            FROM risk ORDER BY t_days
        """,
        "source_cosine": """
            WITH tok AS (SELECT source,
                                unnest(string_split_regex(
                                    lower(trim(text)), '\\s+')) AS token
                         FROM documents WHERE trim(text) != ''),
            c AS (SELECT source, token, count(*) AS n FROM tok
                  GROUP BY source, token),
            d AS (SELECT a.source AS sa, b.source AS sb,
                         sum(CAST(a.n AS HUGEINT) * b.n) AS dot
                  FROM c a JOIN c b
                    ON a.token = b.token AND a.source < b.source
                  GROUP BY a.source, b.source),
            nm AS (SELECT source,
                          sum(CAST(n AS HUGEINT) * n) AS n2
                   FROM c GROUP BY source)
            SELECT d.sa AS source_a, d.sb AS source_b,
                   CAST(d.dot AS BIGINT) AS dot,
                   CAST(d.dot AS DOUBLE)
                       / sqrt(CAST(na.n2 AS DOUBLE)
                              * CAST(nb.n2 AS DOUBLE)) AS cosine
            FROM d JOIN nm na ON na.source = d.sa
                   JOIN nm nb ON nb.source = d.sb
            ORDER BY 1, 2
        """,
        "price_power_means": """
            SELECT l_returnflag, count(*) AS n,
                   exp(sum(ln(l_extendedprice)) / count(*))
                       AS geo_mean,
                   count(*) / sum(1.0 / l_extendedprice) AS har_mean,
                   sqrt(sum(l_extendedprice * l_extendedprice)
                        / count(*)) AS rms
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "lang_emd": """
            WITH c AS (SELECT lang, n_chars AS v, count(*) AS n
                       FROM documents GROUP BY lang, n_chars),
            t AS (SELECT lang, sum(n) AS nn FROM c GROUP BY lang),
            pr AS (SELECT a.lang AS la, b.lang AS lb
                   FROM t a JOIN t b ON a.lang < b.lang),
            g AS (SELECT DISTINCT pr.la, pr.lb, c.v
                  FROM pr JOIN c
                    ON c.lang = pr.la OR c.lang = pr.lb),
            j AS (SELECT g.la, g.lb, g.v,
                         COALESCE(ca.n, 0) AS na,
                         COALESCE(cb.n, 0) AS nb
                  FROM g
                  LEFT JOIN c ca ON ca.lang = g.la AND ca.v = g.v
                  LEFT JOIN c cb ON cb.lang = g.lb AND cb.v = g.v),
            w AS (SELECT la, lb, v,
                         sum(na) OVER (PARTITION BY la, lb
                                       ORDER BY v) AS cna,
                         sum(nb) OVER (PARTITION BY la, lb
                                       ORDER BY v) AS cnb,
                         lead(v) OVER (PARTITION BY la, lb
                                       ORDER BY v) AS nv
                  FROM j),
            s AS (SELECT w.la, w.lb,
                         sum(CAST(abs(w.cna * tb.nn - w.cnb * ta.nn)
                                  AS HUGEINT) * (w.nv - w.v)) AS num,
                         max(ta.nn) AS na_tot, max(tb.nn) AS nb_tot
                  FROM w JOIN t ta ON ta.lang = w.la
                         JOIN t tb ON tb.lang = w.lb
                  WHERE w.nv IS NOT NULL
                  GROUP BY w.la, w.lb)
            SELECT la AS group_a, lb AS group_b,
                   CAST(num AS DOUBLE)
                       / CAST(na_tot * nb_tot AS DOUBLE) AS emd
            FROM s ORDER BY 1, 2
        """,
        "value_auc": """
            WITH s AS (SELECT value AS v,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS y
                       FROM events),
            c AS (SELECT v, sum(y) AS np, count(*) - sum(y) AS nn
                  FROM s GROUP BY v),
            w AS (SELECT v, np, nn,
                         COALESCE(sum(nn) OVER (
                             ORDER BY v ROWS BETWEEN UNBOUNDED
                             PRECEDING AND 1 PRECEDING), 0) AS below
                  FROM c),
            t AS (SELECT sum(np) AS n1, sum(nn) AS n0 FROM c),
            u AS (SELECT sum(CAST(np AS HUGEINT)
                             * (2 * below + nn)) AS u2 FROM w)
            SELECT CAST(t.n1 AS BIGINT) AS n_pos,
                   CAST(t.n0 AS BIGINT) AS n_neg,
                   CAST(u.u2 AS DOUBLE)
                       / CAST(2 * t.n1 * t.n0 AS DOUBLE) AS auc
            FROM u, t
        """,
        "gap_expfit": """
            WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
                       FROM events),
            g AS (SELECT us - prev AS gap FROM o
                  WHERE prev IS NOT NULL),
            c AS (SELECT gap, count(*) AS n FROM g GROUP BY gap),
            t AS (SELECT sum(n) AS n,
                         sum(CAST(gap AS HUGEINT) * n) AS tot FROM c),
            w AS (SELECT gap, n,
                         sum(n) OVER (ORDER BY gap) AS cum FROM c),
            d AS (SELECT max(greatest(
                      abs(CAST(w.cum AS DOUBLE) / t.n
                          - (1 - exp(-(CAST(t.n AS DOUBLE)
                                       / (CAST(t.tot AS DOUBLE)
                                          / 86400000000.0))
                                     * (w.gap / 86400000000.0)))),
                      abs(CAST(w.cum - w.n AS DOUBLE) / t.n
                          - (1 - exp(-(CAST(t.n AS DOUBLE)
                                       / (CAST(t.tot AS DOUBLE)
                                          / 86400000000.0))
                                     * (w.gap / 86400000000.0))))))
                      AS ks
                  FROM w, t)
            SELECT CAST(t.n AS BIGINT) AS n_gaps,
                   CAST(t.n AS DOUBLE)
                       / (CAST(t.tot AS DOUBLE) / 86400000000.0)
                       AS lambda_per_day,
                   d.ks AS ks_d
            FROM t, d
        """,
        "hrw_shards": """
            WITH k AS (SELECT DISTINCT c_name AS key FROM customer),
            sh AS (SELECT unnest(generate_series(0, 7)) AS shard),
            a AS (SELECT k.key, sh.shard,
                         md5(k.key || '|'
                             || CAST(sh.shard AS VARCHAR)) AS h
                  FROM k CROSS JOIN sh),
            w AS (SELECT key, shard,
                         row_number() OVER (PARTITION BY key
                                            ORDER BY h DESC) AS rn
                  FROM a),
            c AS (SELECT shard, count(*) AS n FROM w
                  WHERE rn = 1 GROUP BY shard)
            SELECT sh.shard, COALESCE(c.n, 0) AS n_keys
            FROM sh LEFT JOIN c USING (shard) ORDER BY sh.shard
        """,
        "dup_rate_by_source": """
            WITH d AS (SELECT source,
                              count(*) OVER (PARTITION BY text) AS c
                       FROM documents)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_docs,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS dup_rate
            FROM d GROUP BY source ORDER BY source
        """,
        "heaps_curve": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split_regex(
                                    lower(trim(text)), '\\s+')) AS token
                         FROM documents WHERE trim(text) != ''),
            p AS (SELECT doc_id, count(*) AS nt FROM tok
                  GROUP BY doc_id),
            f AS (SELECT token, min(doc_id) AS fd FROM tok
                  GROUP BY token),
            nv AS (SELECT fd AS doc_id, count(*) AS nv FROM f
                   GROUP BY fd)
            SELECT p.doc_id,
                   CAST(sum(p.nt) OVER (ORDER BY p.doc_id)
                        AS BIGINT) AS n_tokens_cum,
                   CAST(sum(COALESCE(nv.nv, 0))
                        OVER (ORDER BY p.doc_id)
                        AS BIGINT) AS vocab_cum
            FROM p LEFT JOIN nv USING (doc_id) ORDER BY p.doc_id
        """,
        "batch_novelty": """
            WITH d AS (SELECT doc_id // 100 AS b, text,
                              min(doc_id // 100) OVER
                                  (PARTITION BY text) AS fb
                       FROM documents)
            SELECT b AS batch, count(*) AS n_docs,
                   CAST(sum(CASE WHEN b = fb THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   CAST(sum(CASE WHEN b = fb THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS novelty_rate
            FROM d GROUP BY b ORDER BY batch
        """,
        "event_trigrams": """
            WITH o AS (SELECT user_id, event_type,
                              lag(event_type, 1) OVER w AS p1,
                              lag(event_type, 2) OVER w AS p2
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            t AS (SELECT p2 || '>' || p1 || '>' || event_type
                      AS trigram
                  FROM o WHERE p2 IS NOT NULL)
            SELECT trigram, count(*) AS n FROM t
            GROUP BY trigram ORDER BY n DESC, trigram LIMIT 25
        """,
        "demand_classes": """
            WITH dd AS (SELECT l_partkey AS pk,
                               CAST(l_shipdate AS DATE) AS d,
                               sum(CAST(l_quantity AS BIGINT)) AS z
                        FROM lineitem GROUP BY 1, 2),
            p AS (SELECT count(DISTINCT CAST(l_shipdate AS DATE))
                      AS np FROM lineitem),
            m AS (SELECT pk, count(*) AS dd_n, sum(z) AS s,
                         sum(CAST(z AS HUGEINT) * z) AS s2
                  FROM dd GROUP BY pk)
            SELECT pk AS l_partkey,
                   dd_n AS n_demand_days,
                   CAST(p.np AS DOUBLE) / dd_n AS adi,
                   CAST(dd_n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                       / CAST(CAST(s AS HUGEINT) * s AS DOUBLE)
                       AS cv2,
                   CASE WHEN 100 * p.np >= 132 * dd_n THEN
                            (CASE WHEN 100 * (dd_n * s2
                                  - CAST(s AS HUGEINT) * s)
                                  >= 49 * CAST(s AS HUGEINT) * s
                             THEN 'lumpy' ELSE 'intermittent' END)
                        ELSE
                            (CASE WHEN 100 * (dd_n * s2
                                  - CAST(s AS HUGEINT) * s)
                                  >= 49 * CAST(s AS HUGEINT) * s
                             THEN 'erratic' ELSE 'smooth' END)
                   END AS demand_class
            FROM m, p ORDER BY 1
        """,
        "bag_dedup": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0 THEN
                           array_to_string(list_reverse(
                               string_split_regex(
                                   lower(trim(text)), '\\s+')), ' ')
                       ELSE text || ' odd variant' END
                FROM documents),
            k AS (SELECT doc_id,
                         md5(array_to_string(list_sort(
                             string_split_regex(
                                 lower(trim(text)), '\\s+')), ' '))
                             AS bag
                  FROM u)
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM k GROUP BY bag ORDER BY 1
        """,
        "dup_cluster_hist": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0 THEN text
                            ELSE text || ' odd variant' END
                FROM documents),
            c AS (SELECT count(*) AS cs FROM u GROUP BY text)
            SELECT cs AS cluster_size,
                   count(*) AS n_clusters,
                   CAST(cs * count(*) AS BIGINT) AS n_docs
            FROM c GROUP BY cs ORDER BY 1
        """,
        "value_calibration": """
            WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS c,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS y
                       FROM events),
            m AS (SELECT min(c) AS lo,
                         max(c) - min(c) + 1 AS span FROM s)
            SELECT CAST((c - lo) * 10 // span AS BIGINT) AS bin,
                   count(*) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST(sum(c) AS DOUBLE)
                       / (100.0 * count(*)) AS mean_score,
                   CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
            FROM s, m GROUP BY 1 ORDER BY 1
        """,
        "bounce_rate": """
            WITH o AS (SELECT user_id, ts, event_id, event_type,
                              CASE WHEN ts - lag(ts) OVER
                                   (PARTITION BY user_id
                                    ORDER BY ts, event_id)
                                   > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                       FROM events),
            s AS (SELECT user_id, event_type, ts, event_id,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS sid
                  FROM o),
            fe AS (SELECT user_id, sid,
                          first(event_type ORDER BY ts, event_id)
                              AS entry_type,
                          count(*) AS n_ev
                   FROM s GROUP BY user_id, sid)
            SELECT entry_type,
                   count(*) AS n_sessions,
                   CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bounce,
                   CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS bounce_rate
            FROM fe GROUP BY 1 ORDER BY 1
        """,
        "lsh_buckets": """
            WITH q AS (SELECT list_transform(
                           CAST(embedding AS DOUBLE[]),
                           x -> CAST(floor(x * 32768.0 + 0.5)
                                     AS BIGINT)) AS qv
                       FROM embeddings),
            b AS (SELECT list_sum(list_transform(range(8), p ->
                      CASE WHEN list_sum(list_transform(
                               range(len(qv)), d ->
                          (CAST(CAST(('0x' || substr(md5(
                               CAST(p AS VARCHAR) || ','
                               || CAST(d AS VARCHAR)), 1, 8))
                               AS UBIGINT) % 2001 AS BIGINT)
                           - 1000) * qv[d + 1])) >= 0
                      THEN 1 << p ELSE 0 END)) AS bucket
                  FROM q)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   count(*) AS n_vecs
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "next_event_pred": """
            WITH t AS (SELECT event_type AS cur,
                              lead(event_type) OVER
                                  (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nxt
                       FROM events),
            c AS (SELECT cur, nxt, count(*) AS n FROM t
                  WHERE nxt IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT cur, sum(n) AS nt FROM c GROUP BY 1),
            best AS (SELECT cur, nxt, n FROM c
                     QUALIFY row_number() OVER
                         (PARTITION BY cur
                          ORDER BY n DESC, nxt) = 1)
            SELECT b.cur AS cur_type, b.nxt AS predicted_next,
                   CAST(t.nt AS BIGINT) AS n_transitions,
                   CAST(b.n AS BIGINT) AS n_correct,
                   CAST(b.n AS DOUBLE) / CAST(t.nt AS DOUBLE)
                       AS accuracy
            FROM best b JOIN tot t ON b.cur = t.cur ORDER BY 1
        """,
        "rfm_segments": """
            WITH base AS (
                SELECT o_custkey,
                       date_diff('day', max(o_orderdate),
                                 (SELECT max(o_orderdate)
                                  FROM orders)) AS r_days,
                       count(*) AS n_rows,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS value_cents
                FROM orders GROUP BY 1),
            rb AS (SELECT DISTINCT min(CASE WHEN cum >=
                           (q * tot + 4) // 5 THEN v END) AS bound
                   FROM (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
                                sum(n) OVER () AS tot
                         FROM (SELECT r_days AS v, count(*) AS n
                               FROM base GROUP BY 1)),
                        (SELECT unnest(range(1, 5)) AS q)
                   GROUP BY q),
            fb AS (SELECT DISTINCT min(CASE WHEN cum >=
                           (q * tot + 4) // 5 THEN v END) AS bound
                   FROM (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
                                sum(n) OVER () AS tot
                         FROM (SELECT n_rows AS v, count(*) AS n
                               FROM base GROUP BY 1)),
                        (SELECT unnest(range(1, 5)) AS q)
                   GROUP BY q),
            mb AS (SELECT DISTINCT min(CASE WHEN cum >=
                           (q * tot + 4) // 5 THEN v END) AS bound
                   FROM (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
                                sum(n) OVER () AS tot
                         FROM (SELECT value_cents AS v, count(*) AS n
                               FROM base GROUP BY 1)),
                        (SELECT unnest(range(1, 5)) AS q)
                   GROUP BY q),
            s AS (SELECT o_custkey, r_days, n_rows, value_cents,
                         1 + (SELECT count(*) FROM rb
                              WHERE bound < base.r_days) AS rs,
                         1 + (SELECT count(*) FROM fb
                              WHERE bound < base.n_rows) AS fs,
                         1 + (SELECT count(*) FROM mb
                              WHERE bound < base.value_cents) AS ms
                  FROM base)
            SELECT o_custkey, CAST(r_days AS BIGINT) AS r_days,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(value_cents AS BIGINT) AS value_cents,
                   CAST(rs AS BIGINT) AS r_score,
                   CAST(fs AS BIGINT) AS f_score,
                   CAST(ms AS BIGINT) AS m_score,
                   CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR)
                       || CAST(ms AS VARCHAR) AS rfm
            FROM s ORDER BY 1
        """,
        "hapax_by_source": """
            WITH tok AS (SELECT source,
                                unnest(string_split_regex(
                                    lower(trim(text)), '\\s+'))
                                    AS token
                         FROM documents WHERE trim(text) <> ''),
            pc AS (SELECT source, token, count(*) AS n
                   FROM tok GROUP BY 1, 2)
            SELECT source,
                   count(*) AS n_types,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   CAST(sum(n) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS hapax_rate
            FROM pc GROUP BY 1 ORDER BY 1
        """,
        "hourly_peaks": """
            WITH h AS (SELECT event_type AS t,
                              CAST(hour(ts) AS BIGINT) AS hr,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            tot AS (SELECT t, sum(n) AS nt FROM h GROUP BY 1),
            best AS (SELECT t, hr, n FROM h
                     QUALIFY row_number() OVER
                         (PARTITION BY t
                          ORDER BY n DESC, hr) = 1)
            SELECT b.t AS event_type, b.hr AS peak_hour,
                   CAST(b.n AS BIGINT) AS n_peak,
                   CAST(x.nt AS BIGINT) AS n_total,
                   CAST(b.n AS DOUBLE) / CAST(x.nt AS DOUBLE)
                       AS peak_share
            FROM best b JOIN tot x ON b.t = x.t ORDER BY 1
        """,
        "short_doc_wilson": """
            WITH d AS (SELECT source,
                              CASE WHEN len(string_split_regex(
                                       lower(trim(text)), '\\s+'))
                                   < 30 THEN 1 ELSE 0 END AS s
                       FROM documents),
            a AS (SELECT source, count(*) AS n,
                         CAST(sum(s) AS BIGINT) AS k
                  FROM d GROUP BY 1)
            SELECT source, n AS n_docs, k AS n_short,
                   CAST(k AS DOUBLE) / n AS short_rate,
                   ((CAST(k AS DOUBLE) / n)
                        + (1.96 * 1.96) / (2.0 * n))
                       / (1.0 + (1.96 * 1.96) / n)
                   - (1.96 * sqrt(
                          (CAST(k AS DOUBLE) / n)
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + (1.96 * 1.96) / (4.0 * n * n)))
                       / (1.0 + (1.96 * 1.96) / n) AS wilson_lo,
                   ((CAST(k AS DOUBLE) / n)
                        + (1.96 * 1.96) / (2.0 * n))
                       / (1.0 + (1.96 * 1.96) / n)
                   + (1.96 * sqrt(
                          (CAST(k AS DOUBLE) / n)
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + (1.96 * 1.96) / (4.0 * n * n)))
                       / (1.0 + (1.96 * 1.96) / n) AS wilson_hi
            FROM a ORDER BY 1
        """,
        "value_top_share": """
            WITH s AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            h AS (SELECT g, v, count(*) AS c FROM s GROUP BY 1, 2),
            w AS (SELECT g, v, c,
                         sum(c) OVER (PARTITION BY g
                                      ORDER BY v DESC) AS cum,
                         sum(c) OVER (PARTITION BY g) AS n,
                         sum(CAST(v AS HUGEINT) * c) OVER
                             (PARTITION BY g) AS tot
                  FROM h),
            co AS (SELECT g, max(v) AS cutoff
                   FROM w WHERE cum >= (n + 99) // 100 GROUP BY g),
            ab AS (SELECT w.g,
                          coalesce(sum(CASE WHEN v > cutoff
                               THEN CAST(v AS HUGEINT) * c END), 0)
                              AS sum_above,
                          coalesce(sum(CASE WHEN v > cutoff
                               THEN c END), 0) AS n_above
                   FROM w JOIN co ON w.g = co.g GROUP BY w.g),
            f AS (SELECT DISTINCT w.g, w.n, (w.n + 99) // 100 AS k,
                         w.tot, co.cutoff, ab.sum_above, ab.n_above
                  FROM w JOIN co ON w.g = co.g
                         JOIN ab ON w.g = ab.g)
            SELECT g AS event_type,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(k AS BIGINT) AS k,
                   CAST(sum_above + (k - n_above) * cutoff
                        AS BIGINT) AS top_value_cents,
                   CAST(tot AS BIGINT) AS total_value_cents,
                   CAST(sum_above + (k - n_above) * cutoff
                        AS DOUBLE) / CAST(tot AS DOUBLE)
                       AS top_share
            FROM f ORDER BY 1
        """,
        "type_supplier_hhi": """
            WITH r AS (SELECT p_type, l_suppkey,
                              sum(CAST(round(l_extendedprice * 100)
                                       AS BIGINT)) AS rev
                       FROM lineitem JOIN part
                            ON l_partkey = p_partkey
                       GROUP BY 1, 2)
            SELECT p_type,
                   count(*) AS n_members,
                   CAST(sum(rev) AS BIGINT) AS total_cents,
                   CAST(sum(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
                       / CAST(CAST(sum(rev) AS HUGEINT) * sum(rev)
                              AS DOUBLE) AS hhi
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "ushape_attribution": """
            WITH e AS (SELECT event_id, user_id, ts, event_type,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            p AS (SELECT event_id, user_id, ts, cents FROM e
                  WHERE event_type = 'purchase'),
            w AS (SELECT p.event_id AS pe, p.cents, e2.event_type,
                         row_number() OVER (
                             PARTITION BY p.event_id
                             ORDER BY e2.ts, e2.event_id) AS rk,
                         count(*) OVER (PARTITION BY p.event_id)
                             AS n
                  FROM p JOIN e e2 ON e2.user_id = p.user_id
                   AND e2.ts >= p.ts - INTERVAL 7 DAY
                   AND (e2.ts < p.ts
                        OR (e2.ts = p.ts
                            AND e2.event_id < p.event_id))),
            c AS (SELECT event_type AS channel,
                         CASE WHEN n = 1 THEN cents
                              WHEN n = 2 THEN
                                  CASE WHEN rk = 1
                                       THEN cents - cents // 2
                                       ELSE cents // 2 END
                              WHEN rk = 1 OR rk = n
                                  THEN (cents * 2) // 5
                              ELSE (cents - 2 * ((cents * 2) // 5))
                                       // (n - 2)
                                   + CASE WHEN rk - 1 <=
                                       (cents - 2 * ((cents * 2)
                                        // 5)) % (n - 2)
                                     THEN 1 ELSE 0 END
                         END AS credit
                  FROM w
                  UNION ALL
                  SELECT 'direct', cents
                  FROM p LEFT JOIN (SELECT DISTINCT pe FROM w) t
                    ON t.pe = p.event_id
                  WHERE t.pe IS NULL)
            SELECT channel, CAST(sum(credit) AS BIGINT) AS revenue_i,
                   CAST(count(*) AS BIGINT) AS n_touches
            FROM c GROUP BY channel ORDER BY channel
        """,
        "emb_norm_profile": """
            WITH q AS (SELECT label,
                              list_transform(
                                  CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(x * 32768.0 + 0.5)
                                            AS BIGINT)) AS qv
                       FROM embeddings),
            n AS (SELECT CAST(label AS BIGINT) AS label,
                         CAST(list_dot_product(qv, qv) AS BIGINT)
                             AS n2
                  FROM q),
            h AS (SELECT label, n2, count(*) AS c
                  FROM n GROUP BY 1, 2),
            w AS (SELECT label, n2,
                         sum(c) OVER (PARTITION BY label
                                      ORDER BY n2) AS cum,
                         sum(c) OVER (PARTITION BY label) AS tot
                  FROM h)
            SELECT label,
                   CAST(any_value(tot) AS BIGINT) AS n_vecs,
                   CAST(min(CASE WHEN cum >= (tot + 3) // 4
                                 THEN n2 END) AS BIGINT) AS p25,
                   CAST(min(CASE WHEN cum >= (tot + 1) // 2
                                 THEN n2 END) AS BIGINT) AS p50,
                   CAST(min(CASE WHEN cum >= (3 * tot + 3) // 4
                                 THEN n2 END) AS BIGINT) AS p75
            FROM w GROUP BY label ORDER BY label
        """,
        "blocking_cost": """
            WITH b AS (SELECT lang, n_chars // 256 AS blk,
                              count(*) AS c
                       FROM documents GROUP BY 1, 2)
            SELECT lang,
                   CAST(sum(c) AS BIGINT) AS n_docs,
                   count(*) AS n_blocks,
                   CAST(max(c) AS BIGINT) AS max_block,
                   CAST(sum(CAST(c AS HUGEINT) * (c - 1) // 2)
                        AS BIGINT) AS pair_cost
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "frequent_tokens": """
            WITH tok AS (SELECT unnest(string_split_regex(
                                    lower(trim(text)), '\\s+'))
                                    AS token
                         FROM documents WHERE trim(text) <> ''),
            n AS (SELECT count(*) AS tot FROM tok)
            SELECT token, count(*) AS n,
                   CAST(count(*) AS DOUBLE) / CAST(tot AS DOUBLE)
                       AS share
            FROM tok, n GROUP BY token, tot
            HAVING count(*) * 200 > tot ORDER BY token
        """,
        "cohort_ltv": """
            WITH b AS (SELECT o_custkey AS k,
                              CAST(year(o_orderdate) * 12
                                   + month(o_orderdate) - 1
                                   AS BIGINT) AS m,
                              CAST(round(o_totalprice * 100)
                                   AS BIGINT) AS c
                       FROM orders),
            f AS (SELECT k, min(m) AS cm FROM b GROUP BY 1),
            j AS (SELECT b.k, f.cm, b.m - f.cm AS off, b.c
                  FROM b JOIN f ON b.k = f.k),
            a AS (SELECT cm, off, count(DISTINCT k) AS n_keys,
                         sum(c) AS revenue_cents
                  FROM j GROUP BY 1, 2)
            SELECT printf('%04d-%02d', cm // 12, cm % 12 + 1)
                       AS cohort,
                   CAST(off AS BIGINT) AS month_offset,
                   CAST(n_keys AS BIGINT) AS n_keys,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(sum(revenue_cents) OVER
                            (PARTITION BY cm ORDER BY off)
                        AS BIGINT) AS cum_revenue_cents
            FROM a ORDER BY 1, 2
        """,
        "discount_qty_profile": """
            WITH s AS (SELECT CAST(round(l_discount * 10000)
                                   AS BIGINT) AS x,
                              CAST(round(l_quantity * 100)
                                   AS BIGINT) AS y
                       FROM lineitem),
            h AS (SELECT x AS v, count(*) AS n FROM s GROUP BY 1),
            t AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
                         sum(n) OVER () AS tot
                  FROM h),
            b AS (SELECT DISTINCT min(CASE WHEN cum >=
                          (q * tot + 9) // 10 THEN v END) AS bound
                  FROM t, (SELECT unnest(range(1, 10)) AS q)
                  GROUP BY q)
            SELECT CAST((SELECT count(*) FROM b
                         WHERE b.bound < s.x) + 1 AS BIGINT)
                       AS decile,
                   count(*) AS n,
                   CAST(sum(x) AS DOUBLE)
                       / (10000.0 * count(*)) AS mean_x,
                   CAST(sum(y) AS DOUBLE)
                       / (100.0 * count(*)) AS mean_y
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "degree_hist": """
            WITH pp AS (SELECT DISTINCT a.l_partkey AS u,
                                        b.l_partkey AS v
                        FROM lineitem a JOIN lineitem b
                          ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey),
            st AS (SELECT u AS c FROM pp UNION ALL SELECT v FROM pp),
            dg AS (SELECT c, count(*) AS deg FROM st GROUP BY c)
            SELECT CAST(deg AS BIGINT) AS degree,
                   count(*) AS n_nodes
            FROM dg GROUP BY deg ORDER BY 1
        """,
        "daily_value_bands": """
            WITH s AS (SELECT date_trunc('day', ts) AS day,
                              CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            h AS (SELECT day, v, count(*) AS c FROM s GROUP BY 1, 2),
            w AS (SELECT day, v,
                         sum(c) OVER (PARTITION BY day
                                      ORDER BY v) AS cum,
                         sum(c) OVER (PARTITION BY day) AS n
                  FROM h)
            SELECT day, CAST(any_value(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN cum >= (n + 9) // 10
                                 THEN v END) AS BIGINT) AS p10,
                   CAST(min(CASE WHEN cum >= (n + 1) // 2
                                 THEN v END) AS BIGINT) AS p50,
                   CAST(min(CASE WHEN cum >= (9 * n + 9) // 10
                                 THEN v END) AS BIGINT) AS p90
            FROM w GROUP BY day ORDER BY day
        """,
        "prefix_dups": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000,
                       CASE WHEN doc_id % 2 = 0
                            THEN text || ' zz extra tail appended '
                                 || 'well beyond the prefix window'
                            ELSE 'odd ' || text END
                FROM documents),
            k AS (SELECT doc_id,
                         md5(substr(lower(trim(text)), 1, 128))
                             AS pk
                  FROM u)
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM k GROUP BY pk HAVING count(*) > 1 ORDER BY 1
        """,
        "join_size_audit": """
            WITH l AS (SELECT l_orderkey AS k, count(*) AS c
                       FROM lineitem GROUP BY 1),
            r AS (SELECT o_orderkey AS k, count(*) AS c
                  FROM orders GROUP BY 1),
            j AS (SELECT l.c AS cl, r.c AS cr
                  FROM l JOIN r ON l.k = r.k)
            SELECT (SELECT count(*) FROM l) AS n_keys_left,
                   (SELECT count(*) FROM r) AS n_keys_right,
                   count(*) AS n_matched_keys,
                   (SELECT CAST(sum(c) AS BIGINT) FROM l)
                       AS left_rows,
                   (SELECT CAST(sum(c) AS BIGINT) FROM r)
                       AS right_rows,
                   CAST(sum(CAST(cl AS HUGEINT) * cr) AS BIGINT)
                       AS exact_pairs
            FROM j
        """,
        "dim_drift": """
            WITH q AS (SELECT vec_id,
                              list_transform(
                                  CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(x * 32768.0 + 0.5)
                                            AS BIGINT)) AS qv
                       FROM embeddings),
            m AS (SELECT (min(vec_id) + max(vec_id) + 1) // 2 AS sp
                  FROM embeddings),
            e AS (SELECT CASE WHEN vec_id < sp THEN 'a' ELSE 'b' END
                             AS side,
                         d, qv[d + 1] AS v
                  FROM q, m, unnest(range(len(qv))) AS t(d))
            SELECT CAST(d AS BIGINT) AS dim,
                   CAST(count(*) FILTER (side = 'a') AS BIGINT)
                       AS n_a,
                   CAST(count(*) FILTER (side = 'b') AS BIGINT)
                       AS n_b,
                   CAST(sum(v) FILTER (side = 'a') AS DOUBLE)
                       / (32768.0 * count(*) FILTER (side = 'a'))
                       AS mean_a,
                   CAST(sum(v) FILTER (side = 'b') AS DOUBLE)
                       / (32768.0 * count(*) FILTER (side = 'b'))
                       AS mean_b,
                   CAST(sum(v) FILTER (side = 'b') AS DOUBLE)
                       / (32768.0 * count(*) FILTER (side = 'b'))
                   - CAST(sum(v) FILTER (side = 'a') AS DOUBLE)
                       / (32768.0 * count(*) FILTER (side = 'a'))
                       AS delta
            FROM e GROUP BY d ORDER BY 1
        """,
        "char_entropy": """
            WITH c AS (SELECT doc_id, length(text) AS n,
                              unnest(string_split(text, '')) AS ch
                       FROM documents),
            h AS (SELECT doc_id, any_value(n) AS n, ch,
                         count(*) AS cnt
                  FROM c GROUP BY doc_id, ch)
            SELECT doc_id,
                   CAST(any_value(n) AS BIGINT) AS n_chars_total,
                   count(*) AS n_distinct_chars,
                   ln(any_value(n)) - sum(cnt * ln(cnt))
                       / any_value(n) AS entropy
            FROM h GROUP BY doc_id ORDER BY doc_id
        """,
        "source_tail": """
            WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                              count(*) AS c
                       FROM documents GROUP BY 1, 2),
            w AS (SELECT source, v,
                         sum(c) OVER (PARTITION BY source
                                      ORDER BY v) AS cum,
                         sum(c) OVER (PARTITION BY source) AS n
                  FROM h)
            SELECT source, CAST(any_value(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN cum >= (n + 1) // 2
                                 THEN v END) AS BIGINT) AS p50,
                   CAST(min(CASE WHEN cum >= (9 * n + 9) // 10
                                 THEN v END) AS BIGINT) AS p90,
                   CAST(min(CASE WHEN cum >= (99 * n + 99) // 100
                                 THEN v END) AS BIGINT) AS p99,
                   CAST(min(CASE WHEN cum >= (9 * n + 9) // 10
                                 THEN v END) AS DOUBLE)
                       / CAST(min(CASE WHEN cum >= (n + 1) // 2
                                  THEN v END) AS DOUBLE)
                       AS tail_ratio
            FROM w GROUP BY source ORDER BY source
        """,
        "source_coverage": """
            WITH a AS (SELECT source, count(*) AS n
                       FROM documents GROUP BY 1),
            r AS (SELECT source, n,
                         row_number() OVER
                             (ORDER BY n DESC, source) AS rk,
                         sum(n) OVER () AS tot,
                         sum(n) OVER (ORDER BY n DESC, source)
                             AS cum
                  FROM a)
            SELECT CAST(rk AS BIGINT) AS rank, source,
                   CAST(n AS BIGINT) AS n_docs,
                   CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
                       AS share,
                   CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                       AS cum_share
            FROM r ORDER BY 1
        """,
        "transition_gaps": """
            WITH o AS (SELECT event_type AS cur,
                              lead(event_type) OVER w AS nxt,
                              epoch_us(lead(ts) OVER w)
                                  - epoch_us(ts) AS gap
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            h AS (SELECT cur, nxt, CAST(gap AS BIGINT) AS gap,
                         count(*) AS c
                  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
            w2 AS (SELECT cur, nxt, gap,
                          sum(c) OVER (PARTITION BY cur, nxt
                                       ORDER BY gap) AS cum,
                          sum(c) OVER (PARTITION BY cur, nxt) AS n
                   FROM h)
            SELECT cur AS cur_type, nxt AS next_type,
                   CAST(any_value(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN cum >= (n + 1) // 2
                                 THEN gap END) AS BIGINT)
                       AS median_gap_us
            FROM w2 GROUP BY cur, nxt ORDER BY 1, 2
        """,
        "quota_split": """
            WITH r AS (SELECT doc_id,
                              row_number() OVER
                                  (PARTITION BY source
                                   ORDER BY md5(CAST(doc_id
                                                AS VARCHAR)),
                                            doc_id) AS rk,
                              count(*) OVER (PARTITION BY source)
                                  AS n
                       FROM documents)
            SELECT doc_id,
                   CASE WHEN rk <= n - 2 * (n // 10) THEN 'train'
                        WHEN rk <= n - (n // 10) THEN 'val'
                        ELSE 'test' END AS split
            FROM r ORDER BY 1
        """,
        "dau_overlap": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                                        date_trunc('day', ts) AS d
                        FROM events),
            act AS (SELECT d, count(*) AS n FROM ud GROUP BY 1),
            b AS (SELECT a.d, count(*) AS nb
                  FROM ud a JOIN ud x ON a.u = x.u
                   AND x.d = a.d + INTERVAL 1 DAY
                  GROUP BY 1)
            SELECT a.d AS day, a.d + INTERVAL 1 DAY AS next_day,
                   CAST(a.n AS BIGINT) AS n_a,
                   CAST(c.n AS BIGINT) AS n_b,
                   CAST(coalesce(b.nb, 0) AS BIGINT) AS n_common,
                   CAST(coalesce(b.nb, 0) AS DOUBLE)
                       / (a.n + c.n - coalesce(b.nb, 0)) AS jaccard
            FROM act a JOIN act c ON c.d = a.d + INTERVAL 1 DAY
            LEFT JOIN b ON b.d = a.d
            ORDER BY 1
        """,
        "new_vs_returning": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                                        date_trunc('day', ts) AS d
                        FROM events),
            f AS (SELECT u, min(d) AS fd FROM ud GROUP BY 1)
            SELECT ud.d AS day,
                   CAST(sum(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(sum(CASE WHEN ud.d = f.fd THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_returning,
                   count(*) AS n_active
            FROM ud JOIN f ON ud.u = f.u GROUP BY 1 ORDER BY 1
        """,
        "source_lang_purity": """
            WITH c AS (SELECT source, lang, count(*) AS n
                       FROM documents GROUP BY 1, 2),
            tot AS (SELECT source, sum(n) AS nr FROM c GROUP BY 1),
            best AS (SELECT source, lang, n FROM c
                     QUALIFY row_number() OVER
                         (PARTITION BY source
                          ORDER BY n DESC, lang) = 1)
            SELECT b.source, b.lang AS modal_label,
                   CAST(t.nr AS BIGINT) AS n_rows,
                   CAST(b.n AS BIGINT) AS n_modal,
                   CAST(b.n AS DOUBLE) / CAST(t.nr AS DOUBLE)
                       AS purity
            FROM best b JOIN tot t ON b.source = t.source
            ORDER BY 1
        """,
        "knn_label_acc": """
            WITH q AS (SELECT vec_id, label,
                              list_transform(
                                  CAST(embedding AS DOUBLE[]),
                                  x -> floor(x * 32768.0 + 0.5))
                                  AS qv
                       FROM embeddings),
            d AS (SELECT a.vec_id AS ai, a.label AS la,
                         b.vec_id AS bi, b.label AS lb,
                         list_dot_product(a.qv, b.qv) AS dot
                  FROM q a JOIN q b ON a.vec_id <> b.vec_id),
            best AS (SELECT ai, la, lb FROM d
                     QUALIFY row_number() OVER
                         (PARTITION BY ai
                          ORDER BY dot DESC, bi) = 1)
            SELECT CAST(la AS BIGINT) AS label,
                   count(*) AS n,
                   CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct,
                   CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS accuracy
            FROM best GROUP BY la ORDER BY 1
        """,
        "part_substitutes": """
            WITH p AS (SELECT p_partkey, p_brand, p_type, p_size,
                              CAST(round(p_retailprice * 100)
                                   AS BIGINT) AS pc
                       FROM part),
            j AS (SELECT a.p_partkey,
                         b.p_partkey AS sub_key,
                         b.pc AS sub_price_cents,
                         a.pc - b.pc AS price_delta_cents,
                         row_number() OVER
                             (PARTITION BY a.p_partkey
                              ORDER BY b.pc, b.p_partkey) AS rk
                  FROM p a JOIN p b
                    ON a.p_type = b.p_type
                   AND a.p_size = b.p_size
                   AND a.p_brand <> b.p_brand)
            SELECT p_partkey, sub_key, sub_price_cents,
                   CAST(price_delta_cents AS BIGINT)
                       AS price_delta_cents
            FROM j WHERE rk = 1 ORDER BY 1
        """,
        "trend_robust": """
            WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000
                                  AS day,
                              sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            p AS (SELECT a.day AS xa, a.cents AS ya,
                         b.day AS xb, b.cents AS yb
                  FROM d a JOIN d b ON b.day > a.day),
            s AS (SELECT count(*) AS m,
                         sum(CASE WHEN yb > ya THEN 1
                                  WHEN yb < ya THEN -1
                                  ELSE 0 END) AS s_stat
                  FROM p),
            nd AS (SELECT count(*) AS n_days FROM d),
            r AS (SELECT CAST(yb - ya AS DOUBLE)
                             / CAST(xb - xa AS DOUBLE) AS slope,
                         row_number() OVER (ORDER BY
                             CAST(yb - ya AS DOUBLE)
                                 / CAST(xb - xa AS DOUBLE)) AS rk
                  FROM p)
            SELECT nd.n_days, CAST(s.s_stat AS BIGINT) AS s_stat,
                   CAST(s.s_stat AS DOUBLE) / CAST(s.m AS DOUBLE)
                       AS tau,
                   (SELECT slope FROM r WHERE rk = (s.m + 1) // 2)
                       AS sen_slope_cents_per_day
            FROM s, nd
        """,
        "change_point": """
            WITH dd AS (SELECT epoch_us(o_orderdate) // 86400000000
                                   AS day,
                               sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS cents
                        FROM orders GROUP BY 1),
            o AS (SELECT day, cents,
                         row_number() OVER (ORDER BY day) AS rn
                  FROM dd),
            t AS (SELECT count(*) AS n,
                         sum(CAST(cents AS HUGEINT)) AS sn,
                         sum(CAST(cents AS HUGEINT) * cents) AS qn
                  FROM o),
            p AS (SELECT rn,
                         sum(CAST(cents AS HUGEINT))
                             OVER (ORDER BY rn) AS sk,
                         sum(CAST(cents AS HUGEINT) * cents)
                             OVER (ORDER BY rn) AS qk
                  FROM o),
            c AS (SELECT p.rn AS k, p.sk, p.qk,
                         (CAST(p.qk AS DOUBLE)
                          - CAST(p.sk AS DOUBLE) * CAST(p.sk AS DOUBLE)
                                / CAST(p.rn AS DOUBLE))
                         + (CAST(t.qn - p.qk AS DOUBLE)
                            - CAST(t.sn - p.sk AS DOUBLE)
                                  * CAST(t.sn - p.sk AS DOUBLE)
                                  / CAST(t.n - p.rn AS DOUBLE))
                             AS sse
                  FROM p, t WHERE p.rn < t.n),
            b AS (SELECT k, sk, sse FROM c ORDER BY sse, k LIMIT 1)
            SELECT (SELECT day FROM o WHERE rn = b.k + 1)
                       AS split_day,
                   CAST(b.k AS BIGINT) AS n_left,
                   CAST(t.n - b.k AS BIGINT) AS n_right,
                   CAST(b.sk AS DOUBLE) / CAST(b.k AS DOUBLE)
                       AS mean_left_cents,
                   CAST(t.sn - b.sk AS DOUBLE)
                       / CAST(t.n - b.k AS DOUBLE) AS mean_right_cents,
                   b.sse AS sse_split,
                   CAST(t.qn AS DOUBLE)
                       - CAST(t.sn AS DOUBLE) * CAST(t.sn AS DOUBLE)
                             / CAST(t.n AS DOUBLE) AS sse_total
            FROM b, t
        """,
        "name_edit2_pairs": """
            WITH u AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                       AS dist
            FROM u a JOIN u b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
            ORDER BY 1, 2
        """,
        "frequent_triples": """
            WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
                                       event_type AS t
                       FROM events),
            nb AS (SELECT count(*) AS n FROM
                   (SELECT DISTINCT user_id, d FROM b)),
            tr AS (SELECT b1.t AS t1, b2.t AS t2, b3.t AS t3,
                          count(*) AS n
                   FROM b b1
                   JOIN b b2 ON b1.user_id = b2.user_id
                            AND b1.d = b2.d AND b1.t < b2.t
                   JOIN b b3 ON b2.user_id = b3.user_id
                            AND b2.d = b3.d AND b2.t < b3.t
                   GROUP BY 1, 2, 3)
            SELECT tr.t1, tr.t2, tr.t3,
                   CAST(tr.n AS BIGINT) AS n_both,
                   CAST(nb.n AS BIGINT) AS n_baskets,
                   CAST(tr.n AS DOUBLE) / CAST(nb.n AS DOUBLE)
                       AS support
            FROM tr, nb WHERE tr.n * 20 >= nb.n
            ORDER BY 1, 2, 3
        """,
        "ivm_groupby": """
            WITH post AS (
                SELECT l_suppkey,
                       CAST(round(l_quantity * 100) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey % 10 <> 0
                UNION ALL
                SELECT l_suppkey,
                       CAST(round(l_quantity * 100) AS BIGINT) + 100
                FROM lineitem WHERE l_orderkey % 7 = 3)
            SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(c) AS BIGINT) AS qty_cents
            FROM post GROUP BY 1 ORDER BY 1
        """,
        "dow_anomaly": """
            WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000
                                  AS day,
                              sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            w AS (SELECT day % 7 AS dow, count(*) AS n,
                         sum(CAST(cents AS HUGEINT)) AS s,
                         sum(CAST(cents AS HUGEINT) * cents) AS q
                  FROM d GROUP BY 1),
            j AS (SELECT d.day, w.dow, d.cents,
                         w.n * CAST(d.cents AS HUGEINT) - w.s AS dev,
                         w.n * w.q - w.s * w.s AS var_n2
                  FROM d JOIN w ON d.day % 7 = w.dow
                  WHERE w.n >= 2)
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(dow AS BIGINT) AS dow,
                   CAST(cents AS BIGINT) AS cents,
                   CAST(dev AS DOUBLE) / sqrt(CAST(var_n2 AS DOUBLE))
                       AS z_score
            FROM j WHERE var_n2 > 0 AND dev * dev > 4 * var_n2
            ORDER BY day
        """,
        "source_overlap": """
            WITH u AS (SELECT text, source FROM documents
                       UNION ALL
                       SELECT text,
                              'mirror_' || CAST(doc_id % 3 AS VARCHAR)
                       FROM documents WHERE doc_id % 5 = 0),
            d AS (SELECT DISTINCT md5(text) AS h, source FROM u)
            SELECT a.source AS group_a, b.source AS group_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "fd_source_lang": """
            WITH p AS (SELECT DISTINCT source AS k, lang AS v
                       FROM documents),
            g AS (SELECT k, count(*) AS c FROM p GROUP BY 1),
            t AS (SELECT k, c FROM g ORDER BY c DESC, k LIMIT 1)
            SELECT CAST((SELECT count(*) FROM g) AS BIGINT)
                       AS n_keys,
                   CAST((SELECT count(*) FROM g WHERE c > 1)
                        AS BIGINT) AS n_violating,
                   CAST((SELECT count(*) FROM g WHERE c > 1)
                        AS DOUBLE)
                       / CAST((SELECT count(*) FROM g) AS DOUBLE)
                       AS violation_rate,
                   CAST((SELECT max(c) FROM g) AS BIGINT)
                       AS max_rhs_variants,
                   (SELECT k FROM t) AS top_key,
                   CAST((SELECT c FROM t) AS BIGINT)
                       AS top_key_variants
        """,
        "cluster_db_index": """
            WITH e AS (SELECT vec_id, label, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS dim
                       FROM embeddings),
            c AS (SELECT label, dim,
                         round(avg(CAST(v AS DOUBLE)), 12) AS m
                  FROM e GROUP BY 1, 2),
            d AS (SELECT e.vec_id, e.label,
                         sum((CAST(e.v AS DOUBLE) - c.m)
                             * (CAST(e.v AS DOUBLE) - c.m)) AS d2
                  FROM e JOIN c ON e.dim = c.dim
                                AND e.label = c.label
                  GROUP BY 1, 2),
            sc AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
                          sqrt(sum(d2) / count(*)) AS s
                   FROM d GROUP BY 1),
            cd AS (SELECT a.label AS la, b.label AS lb,
                          sqrt(sum((a.m - b.m) * (a.m - b.m)))
                              AS dist
                   FROM c a JOIN c b ON a.dim = b.dim
                                     AND a.label <> b.label
                   GROUP BY 1, 2),
            db AS (SELECT cd.la AS label,
                          max((sa.s + sb.s) / cd.dist) AS dbc
                   FROM cd JOIN sc sa ON sa.label = cd.la
                           JOIN sc sb ON sb.label = cd.lb
                   WHERE cd.dist > 0 GROUP BY 1)
            SELECT sc.label, sc.n, round(sc.s, 6) AS scatter,
                   round(db.dbc, 6) AS db_component
            FROM sc JOIN db ON db.label = sc.label ORDER BY 1
        """,
        "source_fairness": """
            WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS x
                       FROM documents GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(x) AS BIGINT) AS total_rows,
                   CAST(min(x) AS BIGINT) AS min_n,
                   CAST(max(x) AS BIGINT) AS max_n,
                   CAST(sum(CAST(x AS HUGEINT))
                        * sum(CAST(x AS HUGEINT)) AS DOUBLE)
                       / CAST(count(*)
                              * sum(CAST(x AS HUGEINT) * x)
                              AS DOUBLE) AS jain
            FROM g
        """,
        "mann_whitney": """
            WITH k AS (SELECT CAST(round(value * 100) AS BIGINT)
                                  AS cents,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS isa
                       FROM events
                       WHERE event_type IN ('purchase', 'click')),
            h AS (SELECT cents, CAST(sum(isa) AS HUGEINT) AS ca,
                         CAST(count(*) - sum(isa) AS HUGEINT) AS cb
                  FROM k GROUP BY 1),
            c AS (SELECT cents, ca, cb, ca + cb AS t,
                         COALESCE(sum(ca + cb) OVER (ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS l
                  FROM h),
            agg AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
                           CAST(sum(cb) AS HUGEINT) AS nb,
                           sum(ca * (2 * l + t + 1)) AS r2,
                           sum(t * t * t - t) AS tie_t
                    FROM c)
            SELECT CAST(na AS BIGINT) AS n_a,
                   CAST(nb AS BIGINT) AS n_b,
                   CAST(r2 - na * (na + 1) AS VARCHAR) AS u_a2,
                   CAST(tie_t AS VARCHAR) AS tie_t,
                   CAST(r2 - na * (na + 1) - na * nb AS DOUBLE)
                       / sqrt(CAST(na * nb
                                   * ((na + nb) * (na + nb - 1)
                                      * (na + nb + 1) - tie_t)
                                   AS DOUBLE)
                              / CAST(3 * (na + nb) * (na + nb - 1)
                                     AS DOUBLE)) AS z,
                   CAST(r2 - na * (na + 1) AS DOUBLE)
                       / CAST(2 * na * nb AS DOUBLE) AS cles
            FROM agg
        """,
        "next_event_entropy": """
            WITH tr AS (SELECT prev_type, event_type,
                               CAST(count(*) AS BIGINT) AS n
                        FROM (SELECT event_type,
                                     lag(event_type) OVER (
                                         PARTITION BY user_id
                                         ORDER BY ts, event_id)
                                         AS prev_type
                              FROM events)
                        WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS t,
                           CAST(count(*) AS BIGINT) AS k
                    FROM tr GROUP BY 1),
            ent AS (SELECT tr.prev_type,
                           -sum((CAST(tr.n AS DOUBLE) / tot.t)
                                * ln(CAST(tr.n AS DOUBLE) / tot.t))
                               AS entropy
                    FROM tr JOIN tot USING (prev_type) GROUP BY 1),
            top AS (SELECT prev_type, event_type, n FROM (
                        SELECT *, row_number() OVER (
                            PARTITION BY prev_type
                            ORDER BY n DESC, event_type ASC) AS rn
                        FROM tr) WHERE rn = 1)
            SELECT tot.prev_type AS cur_type, tot.t AS n_transitions,
                   tot.k AS n_next_types, ent.entropy,
                   top.event_type AS top_next,
                   CAST(top.n AS DOUBLE) / CAST(tot.t AS DOUBLE)
                       AS top_share
            FROM tot JOIN ent USING (prev_type)
                     JOIN top USING (prev_type)
            ORDER BY 1
        """,
        "source_lang_kappa": """
            WITH c AS (SELECT source, lang,
                              CAST(count(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
            m AS (SELECT source, lang AS pred FROM (
                      SELECT source, lang, row_number() OVER (
                          PARTITION BY source
                          ORDER BY c DESC, lang ASC) AS rn
                      FROM c) WHERE rn = 1),
            conf AS (SELECT m.pred, c.lang AS t,
                            CAST(sum(c.c) AS HUGEINT) AS c
                     FROM c JOIN m USING (source) GROUP BY 1, 2),
            mm AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                          CAST(sum(CASE WHEN pred = t THEN c
                                        ELSE 0 END) AS HUGEINT)
                              AS agree,
                          (SELECT count(*) FROM m) AS n_keys
                   FROM conf),
            pe AS (SELECT CAST(sum(p.pc * t.tc) AS HUGEINT)
                              AS pe_num
                   FROM (SELECT pred AS l, sum(c) AS pc FROM conf
                         GROUP BY 1) p
                   JOIN (SELECT t AS l, sum(c) AS tc FROM conf
                         GROUP BY 1) t USING (l))
            SELECT CAST(mm.n AS BIGINT) AS n_rows,
                   CAST(mm.n_keys AS BIGINT) AS n_keys,
                   CAST(mm.agree AS BIGINT) AS agree,
                   CAST(mm.agree AS DOUBLE) / CAST(mm.n AS DOUBLE)
                       AS po,
                   CAST(pe.pe_num AS DOUBLE)
                       / (CAST(mm.n AS DOUBLE) * CAST(mm.n AS DOUBLE))
                       AS pe,
                   CASE WHEN CAST(pe.pe_num AS DOUBLE)
                             / (CAST(mm.n AS DOUBLE)
                                * CAST(mm.n AS DOUBLE)) >= 1.0
                        THEN 1.0
                        ELSE
                   ((CAST(mm.agree AS DOUBLE) / CAST(mm.n AS DOUBLE))
                    - (CAST(pe.pe_num AS DOUBLE)
                       / (CAST(mm.n AS DOUBLE)
                          * CAST(mm.n AS DOUBLE))))
                   / (1.0 - (CAST(pe.pe_num AS DOUBLE)
                             / (CAST(mm.n AS DOUBLE)
                                * CAST(mm.n AS DOUBLE))))
                   END AS kappa
            FROM mm, pe
        """,
        "phrase_search": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            u AS (SELECT doc_id, unnest(toks) AS tok,
                         generate_subscripts(toks, 1) AS i FROM t)
            SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
            FROM u a JOIN u b ON a.doc_id = b.doc_id
                              AND b.i = a.i + 1
            WHERE a.tok = 'merge' AND b.tok = 'data'
            GROUP BY 1 ORDER BY 1
        """,
        "hits_scores": """
            WITH e AS (SELECT DISTINCT o_custkey AS hub,
                              l_partkey AS auth
                       FROM orders JOIN lineitem
                            ON l_orderkey = o_orderkey),
            a1r AS (SELECT auth,
                           CAST(count(*) AS HUGEINT) * 1000000000
                               AS s
                    FROM e GROUP BY 1),
            a1 AS (SELECT auth, (1000000000 * s)
                       // (SELECT sum(s) FROM a1r) AS v FROM a1r),
            h1r AS (SELECT hub, CAST(sum(a1.v) AS HUGEINT) AS s
                    FROM e JOIN a1 USING (auth) GROUP BY 1),
            h1 AS (SELECT hub, (1000000000 * s)
                       // (SELECT sum(s) FROM h1r) AS v FROM h1r),
            a2r AS (SELECT auth, CAST(sum(h1.v) AS HUGEINT) AS s
                    FROM e JOIN h1 USING (hub) GROUP BY 1),
            a2 AS (SELECT auth, (1000000000 * s)
                       // (SELECT sum(s) FROM a2r) AS v FROM a2r),
            h2r AS (SELECT hub, CAST(sum(a2.v) AS HUGEINT) AS s
                    FROM e JOIN a2 USING (auth) GROUP BY 1),
            h2 AS (SELECT hub, (1000000000 * s)
                       // (SELECT sum(s) FROM h2r) AS v FROM h2r)
            SELECT 'auth' AS kind, CAST(auth AS BIGINT) AS node,
                   CAST(v AS BIGINT) AS score FROM a2
            UNION ALL
            SELECT 'hub', CAST(hub AS BIGINT), CAST(v AS BIGINT)
            FROM h2
            ORDER BY 1, 2
        """,
        # wave 36: record linkage + density + chain families
        "snm_pairs": """
            WITH d AS (SELECT doc_id, n_chars,
                list_distinct(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS toks
                FROM documents),
            r AS (SELECT *, row_number()
                      OVER (ORDER BY n_chars, doc_id) AS rn FROM d),
            p AS (SELECT a.doc_id AS a, b.doc_id AS b,
                      b.rn - a.rn AS rank_dist,
                      len(list_intersect(a.toks, b.toks)) AS i,
                      len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks)) AS u
                  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4)
            SELECT a, b, CAST(rank_dist AS BIGINT) AS rank_dist,
                   CASE WHEN u = 0 THEN 1.0
                        ELSE CAST(i AS DOUBLE) / u END AS jaccard
            FROM p
            WHERE (CASE WHEN u = 0 THEN 1.0
                        ELSE CAST(i AS DOUBLE) / u END) >= 0.8
        """,
        "soundex_blocks": f"""
            WITH n AS (SELECT DISTINCT p_name FROM part),
            u AS (SELECT p_name, regexp_replace(upper(p_name),
                      '[^A-Z]', '', 'g') AS s FROM n),
            m AS (SELECT p_name, s,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(s,
                    '[BFPV]', '1', 'g'), '[CGJKQSXZ]', '2', 'g'),
                    '[DT]', '3', 'g'), 'L', '4', 'g'),
                    '[MN]', '5', 'g'), 'R', '6', 'g'),
                    '[AEIOUYHW]', '0', 'g') AS d1 FROM u),
            c AS (SELECT p_name, s, {_SOUNDEX_COLLAPSE_SQL} AS coll
                  FROM m),
            coded AS (SELECT p_name AS name,
                CASE WHEN s = '' THEN ''
                     ELSE s[1] || substr(replace(substr(coll, 2),
                          '0', '') || '000', 1, 3) END AS code FROM c)
            SELECT code, count(*) AS n_names, min(name) AS min_name
            FROM coded GROUP BY code
        """,
        "jw_catalog_dups": """
            WITH base AS (SELECT p_partkey AS k, p_name AS n,
                              length(p_name) AS L FROM part),
            dirty AS (SELECT CASE (k % 3)
                WHEN 0 THEN substr(n, 1, k % L) || substr(n, (k % L) + 2)
                WHEN 1 THEN substr(n, 1, k % (L - 1))
                         || substr(n, (k % (L - 1)) + 2, 1)
                         || substr(n, (k % (L - 1)) + 1, 1)
                         || substr(n, (k % (L - 1)) + 3)
                ELSE substr(n, 1, (k % L) + 1) || substr(n, (k % L) + 1, 1)
                         || substr(n, (k % L) + 2)
              END AS name FROM base),
            names AS (SELECT DISTINCT name FROM
                (SELECT p_name AS name FROM part
                 UNION ALL SELECT name FROM dirty)),
            pairs AS (SELECT a.name AS a, b.name AS b
                FROM names a JOIN names b
                ON a.name < b.name
                   AND substr(a.name, 1, 1) = substr(b.name, 1, 1)
                   AND abs(length(a.name) - length(b.name)) <= 1)
            SELECT a, b, jaro_winkler_similarity(a, b) AS jw FROM pairs
            WHERE jaro_winkler_similarity(a, b) >= 0.85
        """,
        "dbscan_clusters": """
            WITH RECURSIVE
            pts AS (SELECT vec_id,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            e AS (SELECT a.vec_id AS a, b.vec_id AS b
                  FROM pts a JOIN pts b ON a.vec_id < b.vec_id
                  WHERE list_distance(a.v, b.v) <= 1.2),
            bi AS (SELECT a AS u, b AS w FROM e
                   UNION ALL SELECT b AS u, a AS w FROM e),
            deg AS (SELECT p.vec_id, count(b.u) + 1 AS n_in_eps
                    FROM pts p LEFT JOIN bi b ON b.u = p.vec_id
                    GROUP BY p.vec_id),
            core AS (SELECT vec_id FROM deg WHERE n_in_eps >= 5),
            ce AS (SELECT u, w FROM bi
                   WHERE u IN (SELECT vec_id FROM core)
                     AND w IN (SELECT vec_id FROM core)),
            reach(node, r) AS (
                SELECT vec_id, vec_id FROM core
                UNION
                SELECT ce.u, reach.r FROM reach
                JOIN ce ON ce.w = reach.node),
            comp AS (SELECT node, min(r) AS cluster FROM reach
                     GROUP BY node),
            border AS (SELECT b.u AS node, min(c.cluster) AS cluster
                       FROM bi b JOIN core co ON co.vec_id = b.w
                                 JOIN comp c ON c.node = b.w
                       WHERE b.u NOT IN (SELECT vec_id FROM core)
                       GROUP BY b.u)
            SELECT d.vec_id,
                   CASE WHEN d.vec_id IN (SELECT vec_id FROM core)
                            THEN 'core'
                        WHEN bo.node IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CAST(COALESCE(cp.cluster, bo.cluster, -1)
                        AS BIGINT) AS cluster,
                   CAST(d.n_in_eps AS BIGINT) AS n_in_eps
            FROM deg d LEFT JOIN comp cp ON cp.node = d.vec_id
                       LEFT JOIN border bo ON bo.node = d.vec_id
        """,
        "markov_stationary": """
            WITH seq AS (SELECT event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev FROM events),
            c AS (SELECT prev AS s, event_type AS t,
                      CAST(count(*) AS HUGEINT) AS n
                  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
            states AS (SELECT DISTINCT event_type AS st FROM events),
            r AS (SELECT st, COALESCE((SELECT sum(n) FROM c
                      WHERE c.s = states.st), 0) AS rs FROM states),
            x0 AS (SELECT st, CAST(1000000000000 AS HUGEINT) AS v
                   FROM states),
            x1 AS (SELECT s2.st,
                       COALESCE((SELECT sum((x.v * c.n) // r2.rs)
                                 FROM c JOIN x0 x ON x.st = c.s
                                      JOIN r r2 ON r2.st = c.s
                                 WHERE c.t = s2.st), 0)
                       + CASE WHEN r0.rs = 0 THEN xv.v ELSE 0 END AS v
                   FROM states s2 JOIN r r0 ON r0.st = s2.st
                        JOIN x0 xv ON xv.st = s2.st),
            x2 AS (SELECT s2.st,
                       COALESCE((SELECT sum((x.v * c.n) // r2.rs)
                                 FROM c JOIN x1 x ON x.st = c.s
                                      JOIN r r2 ON r2.st = c.s
                                 WHERE c.t = s2.st), 0)
                       + CASE WHEN r0.rs = 0 THEN xv.v ELSE 0 END AS v
                   FROM states s2 JOIN r r0 ON r0.st = s2.st
                        JOIN x1 xv ON xv.st = s2.st),
            x3 AS (SELECT s2.st,
                       COALESCE((SELECT sum((x.v * c.n) // r2.rs)
                                 FROM c JOIN x2 x ON x.st = c.s
                                      JOIN r r2 ON r2.st = c.s
                                 WHERE c.t = s2.st), 0)
                       + CASE WHEN r0.rs = 0 THEN xv.v ELSE 0 END AS v
                   FROM states s2 JOIN r r0 ON r0.st = s2.st
                        JOIN x2 xv ON xv.st = s2.st),
            x4 AS (SELECT s2.st,
                       COALESCE((SELECT sum((x.v * c.n) // r2.rs)
                                 FROM c JOIN x3 x ON x.st = c.s
                                      JOIN r r2 ON r2.st = c.s
                                 WHERE c.t = s2.st), 0)
                       + CASE WHEN r0.rs = 0 THEN xv.v ELSE 0 END AS v
                   FROM states s2 JOIN r r0 ON r0.st = s2.st
                        JOIN x3 xv ON xv.st = s2.st),
            tot AS (SELECT sum(v) AS t FROM x4)
            SELECT x4.st AS event_type, CAST(x4.v AS BIGINT) AS mass_fp,
                   CAST(x4.v AS DOUBLE) / CAST(tot.t AS DOUBLE) AS prob
            FROM x4, tot
        """,
        # wave 37: eval + resampling families
        "medoid_per_label": """
            WITH p AS (SELECT label, vec_id,
                           CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            mom AS (SELECT label, count(*) AS n,
                        sum(list_dot_product(v, v)) AS q
                    FROM p GROUP BY label),
            sdim AS (SELECT label, i.dim AS dim, sum(v[i.dim]) AS sv
                     FROM p, LATERAL (SELECT unnest(generate_series(
                         1, len(v))) AS dim) i
                     GROUP BY label, i.dim),
            dotv AS (SELECT p.label, p.vec_id,
                         sum(p.v[s.dim] * s.sv) AS xs
                     FROM p JOIN sdim s ON s.label = p.label
                     GROUP BY p.label, p.vec_id),
            sc AS (SELECT p.label, p.vec_id, m.n,
                       m.n * list_dot_product(p.v, p.v)
                           - 2 * d.xs + m.q AS score
                   FROM p JOIN mom m ON m.label = p.label
                        JOIN dotv d ON d.label = p.label
                                   AND d.vec_id = p.vec_id)
            SELECT label, vec_id AS medoid_id, CAST(n AS BIGINT) AS n,
                   score
            FROM sc
            QUALIFY row_number() OVER (PARTITION BY label
                ORDER BY score, vec_id) = 1
            ORDER BY label
        """,
        "ndcg_label": """
            WITH p AS (SELECT vec_id, label,
                           CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            q AS (SELECT * FROM p WHERE vec_id % 50 = 0),
            sc AS (SELECT q.vec_id AS qid, q.label AS qlab,
                       p.vec_id AS did, p.label AS dlab,
                       list_cosine_similarity(q.v, p.v) AS c
                   FROM q JOIN p ON p.vec_id <> q.vec_id),
            ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
                           ORDER BY c DESC, did) AS rk FROM sc),
            hits AS (SELECT qid, sum(CASE WHEN dlab = qlab
                         THEN 1.0 / log2(rk + 1) ELSE 0.0 END) AS dcg
                     FROM ranked WHERE rk <= 10 GROUP BY qid),
            rel AS (SELECT q.vec_id AS qid,
                        (SELECT count(*) FROM p
                         WHERE p.label = q.label
                           AND p.vec_id <> q.vec_id) AS nrel
                    FROM q),
            iterms AS (SELECT i, 1.0 / log2(i + 1) AS term
                       FROM generate_series(1, 10) t(i)),
            itab AS (SELECT i AS m,
                         sum(term) OVER (ORDER BY i) AS idcg
                     FROM iterms),
            ideal AS (SELECT r.qid, r.nrel,
                          COALESCE(it.idcg, 0.0) AS idcg
                      FROM rel r LEFT JOIN itab it
                          ON it.m = least(10, r.nrel))
            SELECT h.qid AS query_id, CAST(i.nrel AS BIGINT) AS n_rel,
                   h.dcg, i.idcg,
                   CASE WHEN i.idcg > 0 THEN h.dcg / i.idcg
                        ELSE 0.0 END AS ndcg
            FROM hits h JOIN ideal i ON i.qid = h.qid
            ORDER BY query_id
        """,
        "rbo_rankings": """
            WITH p AS (SELECT vec_id,
                           CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            q AS (SELECT * FROM p WHERE vec_id % 50 = 0),
            sc AS (SELECT q.vec_id AS qid, p.vec_id AS did,
                       list_cosine_similarity(q.v, p.v) AS c,
                       list_dot_product(q.v, p.v) AS dp
                   FROM q JOIN p ON p.vec_id <> q.vec_id),
            ra AS (SELECT qid, did, row_number() OVER (PARTITION BY qid
                       ORDER BY c DESC, did) AS rk FROM sc),
            rb AS (SELECT qid, did, row_number() OVER (PARTITION BY qid
                       ORDER BY dp DESC, did) AS rk FROM sc),
            ov AS (SELECT a.qid, g.d, count(*) AS x
                   FROM ra a JOIN rb b ON b.qid = a.qid
                                      AND b.did = a.did,
                        generate_series(1, 10) AS g(d)
                   WHERE a.rk <= g.d AND b.rk <= g.d
                   GROUP BY a.qid, g.d),
            agg AS (SELECT qid,
                        sum(power(0.9, d - 1)
                            * (CAST(x AS DOUBLE) / d)) AS s,
                        max(CASE WHEN d = 10 THEN x ELSE 0 END) AS o10
                    FROM ov GROUP BY qid)
            SELECT q.vec_id AS query_id,
                   CAST(COALESCE(a.o10, 0) AS BIGINT) AS overlap_k,
                   COALESCE(a.s, 0.0) * (1.0 - 0.9) AS rbo
            FROM q LEFT JOIN agg a ON a.qid = q.vec_id
            ORDER BY query_id
        """,
        "poisson_bootstrap": """
            WITH reps AS (SELECT unnest(generate_series(0, 63)) AS b),
            h AS (SELECT r.b,
                      CAST(round(o.o_totalprice * 100) AS BIGINT)
                          AS cents,
                      CAST((CAST(o.o_orderkey AS HUGEINT) * 2654435761
                            + r.b * 40503) % 4294967296 AS BIGINT)
                          AS hv
                  FROM orders o, reps r),
            m AS (SELECT b, cents, CASE
                      WHEN hv < 1580030168 THEN 0
                      WHEN hv < 3160060337 THEN 1
                      WHEN hv < 3950075421 THEN 2
                      WHEN hv < 4213413783 THEN 3
                      WHEN hv < 4279248373 THEN 4
                      WHEN hv < 4292415291 THEN 5
                      WHEN hv < 4294609777 THEN 6
                      WHEN hv < 4294923276 THEN 7
                      ELSE 8 END AS k FROM h)
            SELECT b AS replicate, CAST(sum(k) AS BIGINT) AS n_eff,
                   CAST(sum(k * cents) AS BIGINT) AS total_cents,
                   CAST(sum(k * cents) AS DOUBLE)
                       / (100.0 * sum(k)) AS mean
            FROM m GROUP BY b ORDER BY replicate
        """,
        "blocking_quality": f"""
            WITH base AS (SELECT p_partkey AS k, p_name AS n,
                              length(p_name) AS L FROM part),
            dirty AS (SELECT n, CASE (k % 3)
                WHEN 0 THEN substr(n, 1, k % L) || substr(n, (k % L) + 2)
                WHEN 1 THEN substr(n, 1, k % (L - 1))
                         || substr(n, (k % (L - 1)) + 2, 1)
                         || substr(n, (k % (L - 1)) + 1, 1)
                         || substr(n, (k % (L - 1)) + 3)
                ELSE substr(n, 1, (k % L) + 1)
                         || substr(n, (k % L) + 1, 1)
                         || substr(n, (k % L) + 2)
              END AS d FROM base),
            reg AS (SELECT DISTINCT name FROM
                (SELECT n AS name FROM base
                 UNION ALL SELECT d FROM dirty)),
            u AS (SELECT name, regexp_replace(upper(name), '[^A-Z]',
                      '', 'g') AS s FROM reg),
            mm AS (SELECT name, s,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(s, '[BFPV]', '1', 'g'),
                    '[CGJKQSXZ]', '2', 'g'), '[DT]', '3', 'g'),
                    'L', '4', 'g'), '[MN]', '5', 'g'), 'R', '6', 'g'),
                    '[AEIOUYHW]', '0', 'g') AS d1 FROM u),
            coded AS (SELECT name, s, {_SOUNDEX_COLLAPSE_SQL} AS coll,
                CASE WHEN s = '' THEN ''
                     ELSE s[1] || substr(replace(substr(
                          {_SOUNDEX_COLLAPSE_SQL}, 2), '0', '')
                          || '000', 1, 3) END AS code FROM mm),
            nn AS (SELECT count(*) AS n_names FROM reg),
            tp AS (SELECT count(*) AS total_pairs
                   FROM reg a JOIN reg b ON a.name < b.name),
            cfl AS (SELECT count(*) AS c FROM reg a JOIN reg b
                    ON a.name < b.name
                       AND substr(a.name, 1, 1) = substr(b.name, 1, 1)
                       AND abs(length(a.name) - length(b.name)) <= 1),
            csx AS (SELECT count(*) AS c FROM coded a JOIN coded b
                    ON a.name < b.name AND a.code = b.code),
            truth AS (SELECT DISTINCT least(n, d) AS a,
                          greatest(n, d) AS b FROM dirty WHERE n <> d),
            tc AS (SELECT count(*) AS t FROM truth),
            covfl AS (SELECT count(*) AS c FROM truth
                      WHERE substr(a, 1, 1) = substr(b, 1, 1)
                        AND abs(length(a) - length(b)) <= 1),
            covsx AS (SELECT count(*) AS c FROM truth t
                      JOIN coded ca ON ca.name = t.a
                      JOIN coded cb ON cb.name = t.b
                      WHERE ca.code = cb.code)
            SELECT 'first_len' AS scheme,
                   CAST(nn.n_names AS BIGINT) AS n_names,
                   CAST(tp.total_pairs AS BIGINT) AS total_pairs,
                   CAST(cfl.c AS BIGINT) AS n_candidates,
                   1.0 - CAST(cfl.c AS DOUBLE) / tp.total_pairs
                       AS reduction_ratio,
                   CAST(tc.t AS BIGINT) AS n_truth,
                   CAST(covfl.c AS BIGINT) AS n_covered,
                   CAST(covfl.c AS DOUBLE) / tc.t AS recall
            FROM nn, tp, cfl, tc, covfl
            UNION ALL
            SELECT 'soundex', CAST(nn.n_names AS BIGINT),
                   CAST(tp.total_pairs AS BIGINT),
                   CAST(csx.c AS BIGINT),
                   1.0 - CAST(csx.c AS DOUBLE) / tp.total_pairs,
                   CAST(tc.t AS BIGINT), CAST(covsx.c AS BIGINT),
                   CAST(covsx.c AS DOUBLE) / tc.t
            FROM nn, tp, csx, tc, covsx
        """,
        # wave 38: placement + robust-fit + dominance + FDR + ER
        "entity_resolution": """
            WITH RECURSIVE
            base AS (SELECT p_partkey AS k, p_name AS n,
                         length(p_name) AS L FROM part),
            dirty AS (SELECT CASE (k % 3)
                WHEN 0 THEN substr(n, 1, k % L) || substr(n, (k % L) + 2)
                WHEN 1 THEN substr(n, 1, k % (L - 1))
                         || substr(n, (k % (L - 1)) + 2, 1)
                         || substr(n, (k % (L - 1)) + 1, 1)
                         || substr(n, (k % (L - 1)) + 3)
                ELSE substr(n, 1, (k % L) + 1)
                         || substr(n, (k % L) + 1, 1)
                         || substr(n, (k % L) + 2)
              END AS name FROM base),
            names AS (SELECT DISTINCT name FROM
                (SELECT n AS name FROM base
                 UNION ALL SELECT name FROM dirty)),
            pairs AS (SELECT a.name AS a, b.name AS b
                FROM names a JOIN names b
                ON a.name < b.name
                   AND substr(a.name, 1, 1) = substr(b.name, 1, 1)
                   AND abs(length(a.name) - length(b.name)) <= 1
                   AND jaro_winkler_similarity(a.name, b.name)
                       >= 0.92),
            bi AS (SELECT a AS u, b AS w FROM pairs
                   UNION ALL SELECT b AS u, a AS w FROM pairs),
            reach(node, r) AS (
                SELECT name, name FROM names
                UNION
                SELECT bi.u, reach.r FROM reach
                JOIN bi ON bi.w = reach.node),
            comp AS (SELECT node AS name, min(r) AS canonical
                     FROM reach GROUP BY node),
            sizes AS (SELECT canonical, count(*) AS cs
                      FROM comp GROUP BY canonical)
            SELECT c.name, c.canonical,
                   CAST(s.cs AS BIGINT) AS cluster_size
            FROM comp c JOIN sizes s USING (canonical)
            ORDER BY c.name
        """,
        "jump_hash_shards": """
            WITH RECURSIVE
            seeds AS (SELECT o_orderkey AS k0,
                          CAST(o_orderkey AS HUGEINT) AS key0
                      FROM orders),
            cfg AS (SELECT unnest([32, 33]) AS nb),
            st(k0, nb, key, b, j) AS (
                SELECT k0, nb, key0, CAST(-1 AS BIGINT),
                       CAST(0 AS BIGINT)
                FROM seeds, cfg
                UNION ALL
                SELECT k0, nb,
                    (key * 2862933555777941757 + 1)
                        % 18446744073709551616,
                    j,
                    CAST(floor(CAST(j + 1 AS DOUBLE)
                        * (2147483648.0 / (CAST(
                            ((key * 2862933555777941757 + 1)
                             % 18446744073709551616)
                            // 8589934592 AS DOUBLE) + 1.0)))
                        AS BIGINT)
                FROM st WHERE j < nb),
            asg AS (SELECT k0, nb, b FROM st WHERE j >= nb),
            jj AS (SELECT a32.b AS b32, a33.b AS b33
                   FROM (SELECT k0, b FROM asg WHERE nb = 32) a32
                   JOIN (SELECT k0, b FROM asg WHERE nb = 33) a33
                       USING (k0)),
            shards AS (SELECT unnest(generate_series(0, 32)) AS shard)
            SELECT s.shard,
                   CAST(COALESCE(o.c, 0) AS BIGINT) AS n_old,
                   CAST(COALESCE(nw.c, 0) AS BIGINT) AS n_new,
                   CAST(COALESCE(mv.c, 0) AS BIGINT) AS moved_in
            FROM shards s
            LEFT JOIN (SELECT b32 AS shard, count(*) AS c FROM jj
                       GROUP BY 1) o USING (shard)
            LEFT JOIN (SELECT b33 AS shard, count(*) AS c FROM jj
                       GROUP BY 1) nw USING (shard)
            LEFT JOIN (SELECT b33 AS shard, count(*) AS c FROM jj
                       WHERE b32 <> b33 GROUP BY 1) mv USING (shard)
            ORDER BY s.shard
        """,
        "huber_trend": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, sum(cents) AS cents FROM d GROUP BY day),
            mm AS (SELECT min(day) AS d0, count(*) AS n FROM s),
            xy AS (SELECT day, CAST(day - mm.d0 AS BIGINT) AS x,
                       cents AS y FROM s, mm),
            moms AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         sum(CAST(x AS HUGEINT)) AS sx,
                         sum(CAST(y AS HUGEINT)) AS sy,
                         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                             AS sxx,
                         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                             AS sxy
                     FROM xy),
            ols AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) AS b0,
                        n, sx, sy FROM moms),
            ols2 AS (SELECT b0, (CAST(sy AS DOUBLE)
                         - b0 * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE) AS a0 FROM ols),
            r0 AS (SELECT day, x, y, CAST(y AS DOUBLE)
                       - (a0 + b0 * CAST(x AS DOUBLE)) AS r
                   FROM xy, ols2),
            med AS (SELECT r AS med FROM r0, mm
                    QUALIFY row_number() OVER (ORDER BY r, day)
                        = (n + 1) // 2),
            madt AS (SELECT abs(r - med.med) AS ar, day FROM r0, med),
            mad AS (SELECT ar AS mad FROM madt, mm
                    QUALIFY row_number() OVER (ORDER BY ar, day)
                        = (n + 1) // 2),
            sc AS (SELECT 1.4826 * mad AS scale,
                       1.345 * (1.4826 * mad) AS delta FROM mad),
            w1 AS (SELECT x, y, CASE WHEN abs(CAST(y AS DOUBLE)
                       - (a0 + b0 * CAST(x AS DOUBLE))) <= delta
                       THEN 1.0 ELSE delta / abs(CAST(y AS DOUBLE)
                       - (a0 + b0 * CAST(x AS DOUBLE))) END AS w
                   FROM xy, ols2, sc),
            f1 AS (SELECT sum(w) AS sw,
                       sum(w * CAST(x AS DOUBLE)) AS swx,
                       sum(w * CAST(y AS DOUBLE)) AS swy,
                       sum(w * CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                           AS swxx,
                       sum(w * CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                           AS swxy FROM w1),
            ab1 AS (SELECT (sw * swxy - swx * swy)
                        / (sw * swxx - swx * swx) AS b1,
                        (swy - ((sw * swxy - swx * swy)
                         / (sw * swxx - swx * swx)) * swx) / sw AS a1
                    FROM f1),
            w2 AS (SELECT x, y, CASE WHEN abs(CAST(y AS DOUBLE)
                       - (a1 + b1 * CAST(x AS DOUBLE))) <= delta
                       THEN 1.0 ELSE delta / abs(CAST(y AS DOUBLE)
                       - (a1 + b1 * CAST(x AS DOUBLE))) END AS w
                   FROM xy, ab1, sc),
            f2 AS (SELECT sum(w) AS sw,
                       sum(w * CAST(x AS DOUBLE)) AS swx,
                       sum(w * CAST(y AS DOUBLE)) AS swy,
                       sum(w * CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                           AS swxx,
                       sum(w * CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                           AS swxy FROM w2),
            ab2 AS (SELECT (sw * swxy - swx * swy)
                        / (sw * swxx - swx * swx) AS b2,
                        (swy - ((sw * swxy - swx * swy)
                         / (sw * swxx - swx * swx)) * swx) / sw AS a2
                    FROM f2),
            w3 AS (SELECT x, y, CASE WHEN abs(CAST(y AS DOUBLE)
                       - (a2 + b2 * CAST(x AS DOUBLE))) <= delta
                       THEN 1.0 ELSE delta / abs(CAST(y AS DOUBLE)
                       - (a2 + b2 * CAST(x AS DOUBLE))) END AS w
                   FROM xy, ab2, sc),
            f3 AS (SELECT sum(w) AS sw,
                       sum(w * CAST(x AS DOUBLE)) AS swx,
                       sum(w * CAST(y AS DOUBLE)) AS swy,
                       sum(w * CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                           AS swxx,
                       sum(w * CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                           AS swxy FROM w3),
            ab3 AS (SELECT (sw * swxy - swx * swy)
                        / (sw * swxx - swx * swx) AS b3,
                        (swy - ((sw * swxy - swx * swy)
                         / (sw * swxx - swx * swx)) * swx) / sw AS a3
                    FROM f3),
            nd AS (SELECT count(*) AS ndw FROM xy, ab3, sc
                   WHERE abs(CAST(y AS DOUBLE)
                       - (a3 + b3 * CAST(x AS DOUBLE))) > delta)
            SELECT CAST(mm.n AS BIGINT) AS n_days, ols2.b0 AS ols_slope,
                   ols2.a0 AS ols_intercept, sc.scale, sc.delta,
                   ab3.b3 AS huber_slope, ab3.a3 AS huber_intercept,
                   CAST(nd.ndw AS BIGINT) AS n_downweighted
            FROM mm, ols2, sc, ab3, nd
        """,
        "dominance_counts": """
            SELECT p.p_partkey,
                   CAST((SELECT count(*) FROM part q
                         WHERE q.p_retailprice <= p.p_retailprice
                           AND q.p_size <= p.p_size) - 1 AS BIGINT)
                       AS n_weak_dominators
            FROM part p ORDER BY p.p_partkey
        """,
        "fdr_bh": """
            WITH ev AS (SELECT event_type AS g,
                            CAST(round(value * 100) AS BIGINT) AS cents
                        FROM events),
            tot AS (SELECT count(*) AS nt FROM ev),
            gs AS (SELECT g, count(*) AS ng FROM ev GROUP BY g),
            fam AS (SELECT count(*) AS m FROM gs),
            gc AS (SELECT g, cents, count(*) AS c FROM ev
                   GROUP BY g, cents),
            dom AS (SELECT DISTINCT cents FROM ev),
            tc AS (SELECT cents, count(*) AS ct FROM ev
                   GROUP BY cents),
            allc AS (SELECT gg.g, d.cents, COALESCE(gc.c, 0) AS cg,
                         t.ct
                     FROM (SELECT DISTINCT g FROM ev) gg
                     CROSS JOIN dom d
                     LEFT JOIN gc ON gc.g = gg.g AND gc.cents = d.cents
                     JOIN tc t ON t.cents = d.cents),
            cum AS (SELECT g, cents,
                        sum(cg) OVER (PARTITION BY g ORDER BY cents)
                            AS cumg,
                        sum(ct) OVER (PARTITION BY g ORDER BY cents)
                            AS cumt
                    FROM allc),
            kn AS (SELECT c.g,
                       max(abs(c.cumg * (tot.nt - gs.ng)
                               - (c.cumt - c.cumg) * gs.ng)) AS ks_num
                   FROM cum c, tot
                   JOIN gs ON gs.g = c.g
                   GROUP BY c.g, tot.nt, gs.ng),
            stats AS (SELECT kn.g, gs.ng, tot.nt - gs.ng AS nr,
                          kn.ks_num,
                          CAST(kn.ks_num AS DOUBLE)
                              / (CAST(gs.ng AS DOUBLE)
                                 * CAST(tot.nt - gs.ng AS DOUBLE))
                              AS d_stat
                      FROM kn JOIN gs ON gs.g = kn.g, tot),
            pv AS (SELECT *, least(1.0, 2.0 * exp(
                       -2.0 * ((CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE))
                               / (CAST(ng AS DOUBLE)
                                  + CAST(nr AS DOUBLE)))
                       * d_stat * d_stat)) AS p_value FROM stats),
            ranked AS (SELECT *, row_number() OVER
                           (ORDER BY p_value, g) AS bh_rank FROM pv),
            thr AS (SELECT *, bh_rank * 0.25 / fam.m AS bh_threshold
                    FROM ranked, fam),
            kstar AS (SELECT COALESCE(max(CASE WHEN p_value
                          <= bh_threshold THEN bh_rank END), 0) AS ks
                      FROM thr)
            SELECT t.g AS "group", CAST(t.ng AS BIGINT) AS n_g,
                   CAST(t.nr AS BIGINT) AS n_rest,
                   CAST(t.ks_num AS BIGINT) AS ks_num, t.d_stat,
                   t.p_value, CAST(t.bh_rank AS BIGINT) AS bh_rank,
                   t.bh_threshold, t.bh_rank <= kstar.ks AS rejected
            FROM thr t, kstar ORDER BY t.g
        """,
        # wave 39: calibration + FS weights + hampel + CDC chunking
        "isotonic_calibration": """
            WITH b AS (SELECT least(CAST(floor(value / 10.0)
                           AS BIGINT), 9) AS bin,
                           CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END AS pos
                       FROM events),
            agg AS (SELECT bin, count(*) AS n, sum(pos) AS n_pos
                    FROM b GROUP BY bin),
            pre AS (SELECT bin, n, n_pos,
                        sum(n) OVER (ORDER BY bin) AS cn,
                        sum(n_pos) OVER (ORDER BY bin) AS cp
                    FROM agg),
            ex AS (SELECT bin, n, n_pos, cn, cp, cn - n AS ecn,
                       cp - n_pos AS ecp FROM pre),
            mins AS (SELECT i.bin AS ib, j.bin AS jb,
                         min(CAST(k.cp - j.ecp AS DOUBLE)
                             / (k.cn - j.ecn)) AS mn
                     FROM ex i JOIN ex j ON j.bin <= i.bin
                          JOIN ex k ON k.bin >= i.bin
                     GROUP BY i.bin, j.bin),
            iso AS (SELECT ib AS bin, max(mn) AS iso_rate FROM mins
                    GROUP BY ib)
            SELECT a.bin, CAST(a.n AS BIGINT) AS n,
                   CAST(a.n_pos AS BIGINT) AS n_pos,
                   CAST(a.n_pos AS DOUBLE) / a.n AS rate,
                   i.iso_rate
            FROM agg a JOIN iso i USING (bin) ORDER BY a.bin
        """,
        "fs_weights": f"""
            WITH base AS (SELECT p_partkey AS k, p_name AS n,
                              length(p_name) AS L FROM part),
            dirty AS (SELECT n, CASE (k % 3)
                WHEN 0 THEN substr(n, 1, k % L) || substr(n, (k % L) + 2)
                WHEN 1 THEN substr(n, 1, k % (L - 1))
                         || substr(n, (k % (L - 1)) + 2, 1)
                         || substr(n, (k % (L - 1)) + 1, 1)
                         || substr(n, (k % (L - 1)) + 3)
                ELSE substr(n, 1, (k % L) + 1)
                         || substr(n, (k % L) + 1, 1)
                         || substr(n, (k % L) + 2)
              END AS d FROM base),
            names AS (SELECT DISTINCT name FROM
                (SELECT n AS name FROM base
                 UNION ALL SELECT d FROM dirty)),
            u AS (SELECT name, regexp_replace(upper(name), '[^A-Z]',
                      '', 'g') AS s FROM names),
            mm AS (SELECT name, s,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(s, '[BFPV]', '1', 'g'),
                    '[CGJKQSXZ]', '2', 'g'), '[DT]', '3', 'g'),
                    'L', '4', 'g'), '[MN]', '5', 'g'), 'R', '6', 'g'),
                    '[AEIOUYHW]', '0', 'g') AS d1 FROM u),
            feat AS (SELECT name,
                CASE WHEN s = '' THEN ''
                     ELSE s[1] || substr(replace(substr(
                          {_SOUNDEX_COLLAPSE_SQL}, 2), '0', '')
                          || '000', 1, 3) END AS code,
                length(name) AS ln,
                string_split(name, ' ')[1] AS tok1 FROM mm),
            truth AS (SELECT DISTINCT least(n, d) AS a,
                          greatest(n, d) AS b FROM dirty WHERE n <> d),
            cand AS (SELECT a.name AS a, b.name AS b,
                CASE WHEN ca.code = cb.code THEN 1 ELSE 0 END AS f1,
                CASE WHEN ca.ln = cb.ln THEN 1 ELSE 0 END AS f2,
                CASE WHEN ca.tok1 = cb.tok1 THEN 1 ELSE 0 END AS f3
                FROM names a JOIN names b
                ON a.name < b.name
                   AND substr(a.name, 1, 1) = substr(b.name, 1, 1)
                   AND abs(length(a.name) - length(b.name)) <= 1
                JOIN feat ca ON ca.name = a.name
                JOIN feat cb ON cb.name = b.name),
            pat AS (SELECT 4 * f1 + 2 * f2 + f3 AS pattern,
                        CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END
                            AS ismatch
                    FROM cand LEFT JOIN truth t
                        ON t.a = cand.a AND t.b = cand.b),
            cnt AS (SELECT pattern, sum(ismatch) AS mc,
                        sum(1 - ismatch) AS uc FROM pat
                    GROUP BY pattern),
            pats AS (SELECT unnest(generate_series(0, 7)) AS pattern),
            tots AS (SELECT sum(mc) AS mn, sum(uc) AS un FROM cnt)
            SELECT p.pattern,
                   CAST(p.pattern // 4 AS BIGINT) AS f_soundex,
                   CAST((p.pattern // 2) % 2 AS BIGINT) AS f_len,
                   CAST(p.pattern % 2 AS BIGINT) AS f_first,
                   CAST(COALESCE(c.mc, 0) AS BIGINT) AS n_match,
                   CAST(COALESCE(c.uc, 0) AS BIGINT) AS n_nonmatch,
                   CAST(COALESCE(c.mc, 0) + 1 AS DOUBLE)
                       / CAST(t.mn + 2 AS DOUBLE) AS m_prob,
                   CAST(COALESCE(c.uc, 0) + 1 AS DOUBLE)
                       / CAST(t.un + 2 AS DOUBLE) AS u_prob,
                   log2((CAST(COALESCE(c.mc, 0) + 1 AS DOUBLE)
                         / CAST(t.mn + 2 AS DOUBLE))
                        / (CAST(COALESCE(c.uc, 0) + 1 AS DOUBLE)
                           / CAST(t.un + 2 AS DOUBLE))) AS weight
            FROM pats p LEFT JOIN cnt c ON c.pattern = p.pattern, tots t
            ORDER BY p.pattern
        """,
        "hampel_anomalies": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            m1 AS (SELECT day, cents,
                       CAST((SELECT quantile_disc(s2.cents, 0.5)
                             FROM s s2 WHERE s2.day BETWEEN s.day - 3
                                 AND s.day + 3) AS DOUBLE) AS med
                   FROM s),
            m2 AS (SELECT day, cents, med,
                       (SELECT quantile_disc(abs(CAST(s2.cents
                            AS DOUBLE) - m1.med), 0.5)
                        FROM s s2 WHERE s2.day BETWEEN m1.day - 3
                            AND m1.day + 3) AS mad
                   FROM m1)
            SELECT day, cents, med, mad,
                   3.0 * (1.4826 * mad) AS threshold,
                   abs(CAST(cents AS DOUBLE) - med)
                       > 3.0 * (1.4826 * mad) AS is_anomaly
            FROM m2 ORDER BY day
        """,
        "gear_cdc_chunks": """
            WITH RECURSIVE
            pw(k, v) AS (
                SELECT 0, CAST(1 AS HUGEINT)
                UNION ALL
                SELECT k + 1, v * 2 FROM pw WHERE k < 63),
            pos AS (SELECT doc_id, text,
                        unnest(generate_series(1, length(text))) AS i
                    FROM documents),
            hsum AS (SELECT p.doc_id, p.i,
                         sum(((CAST(unicode(substr(p.text, p.i - pw.k,
                                  1)) AS HUGEINT) + 1)
                              * 11400714819323198485
                              % 18446744073709551616) * pw.v
                             % 18446744073709551616)
                         % 18446744073709551616 AS h
                     FROM pos p JOIN pw ON pw.k <= p.i - 1
                     GROUP BY p.doc_id, p.i),
            hb AS (SELECT doc_id, i FROM hsum WHERE h % 64 = 0),
            -- DISTINCT, not UNION: DuckDB 1.0 degrades a plain UNION
            -- inside a WITH RECURSIVE cte list to UNION ALL
            edges AS (SELECT DISTINCT doc_id, i FROM
                      (SELECT doc_id, i FROM hb
                       UNION ALL
                       SELECT doc_id, length(text) FROM documents
                       WHERE length(text) > 0)),
            ordered AS (SELECT doc_id, i,
                            row_number() OVER (PARTITION BY doc_id
                                ORDER BY i) - 1 AS chunk_idx,
                            COALESCE(lag(i) OVER (PARTITION BY doc_id
                                ORDER BY i), 0) AS prev
                        FROM edges)
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   CAST(prev + 1 AS BIGINT) AS start,
                   CAST(i - prev AS BIGINT) AS len
            FROM ordered ORDER BY doc_id, chunk_idx
        """,
        # wave 40: DP + sequence-mass + layout families
        "max_revenue_run": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            mm AS (SELECT count(*) AS n,
                       CAST(sum(cents) AS BIGINT) AS total FROM s),
            p AS (SELECT day,
                      row_number() OVER (ORDER BY day) AS i,
                      sum(CAST(cents AS HUGEINT) * mm.n - mm.total)
                          OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS pi
                  FROM s, mm),
            scored AS (SELECT p.i, p.pi,
                           least(CAST(0 AS HUGEINT),
                               COALESCE(min(p.pi) OVER (ORDER BY p.i
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING),
                                   CAST(0 AS HUGEINT))) AS m
                       FROM p),
            withj AS (SELECT i, pi, m, pi - m AS score,
                          CASE WHEN m = 0 THEN 0
                               ELSE (SELECT min(p2.i) FROM p p2
                                     WHERE p2.i < scored.i
                                       AND p2.pi = scored.m) END AS j
                      FROM scored),
            best AS (SELECT i AS ei, j AS sj, score FROM withj
                     ORDER BY score DESC, i LIMIT 1)
            SELECT CAST(mm.n AS BIGINT) AS n_days,
                   (SELECT day FROM p WHERE i = best.sj + 1)
                       AS start_day,
                   (SELECT day FROM p WHERE i = best.ei) AS end_day,
                   CAST(best.ei - best.sj AS BIGINT) AS run_days,
                   CAST(best.score AS BIGINT) AS run_sum_scaled
            FROM best, mm
        """,
        "voptimal_histogram": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day FROM orders),
            s AS (SELECT day, count(*) AS v FROM d GROUP BY day),
            idx AS (SELECT day, v,
                        row_number() OVER (ORDER BY day) AS i FROM s),
            pre1 AS (SELECT i, day,
                         sum(v) OVER (ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sv,
                         sum(v * v) OVER (ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS qv
                     FROM idx),
            pre AS (SELECT CAST(0 AS BIGINT) AS i,
                        CAST(NULL AS BIGINT) AS day,
                        CAST(0 AS BIGINT) AS sv, CAST(0 AS BIGINT)
                        AS qv
                    UNION ALL
                    SELECT i, day, CAST(sv AS BIGINT),
                        CAST(qv AS BIGINT) FROM pre1),
            cost AS (SELECT j.i AS j, k.i AS i,
                         CAST(k.qv - j.qv AS DOUBLE)
                             - CAST((k.sv - j.sv) * (k.sv - j.sv)
                                    AS DOUBLE)
                               / CAST(k.i - j.i AS DOUBLE) AS c
                     FROM pre j JOIN pre k ON j.i < k.i),
            dp1 AS (SELECT i, c AS v, j FROM cost WHERE j = 0),
            dp2 AS (SELECT i, v, j FROM (SELECT c.i, d1.v + c.c AS v,
                        c.j, row_number() OVER (PARTITION BY c.i
                            ORDER BY d1.v + c.c, c.j) AS rn
                        FROM cost c JOIN dp1 d1 ON d1.i = c.j)
                    WHERE rn = 1),
            dp3 AS (SELECT i, v, j FROM (SELECT c.i, d2.v + c.c AS v,
                        c.j, row_number() OVER (PARTITION BY c.i
                            ORDER BY d2.v + c.c, c.j) AS rn
                        FROM cost c JOIN dp2 d2 ON d2.i = c.j)
                    WHERE rn = 1),
            dp4 AS (SELECT i, v, j FROM (SELECT c.i, d3.v + c.c AS v,
                        c.j, row_number() OVER (PARTITION BY c.i
                            ORDER BY d3.v + c.c, c.j) AS rn
                        FROM cost c JOIN dp3 d3 ON d3.i = c.j)
                    WHERE rn = 1),
            dp5 AS (SELECT i, v, j FROM (SELECT c.i, d4.v + c.c AS v,
                        c.j, row_number() OVER (PARTITION BY c.i
                            ORDER BY d4.v + c.c, c.j) AS rn
                        FROM cost c JOIN dp4 d4 ON d4.i = c.j)
                    WHERE rn = 1),
            dp6 AS (SELECT i, v, j FROM (SELECT c.i, d5.v + c.c AS v,
                        c.j, row_number() OVER (PARTITION BY c.i
                            ORDER BY d5.v + c.c, c.j) AS rn
                        FROM cost c JOIN dp5 d5 ON d5.i = c.j)
                    WHERE rn = 1),
            nn AS (SELECT max(i) AS n FROM pre),
            b5 AS (SELECT d.j AS b FROM dp6 d, nn WHERE d.i = nn.n),
            b4 AS (SELECT d.j AS b FROM dp5 d, b5 WHERE d.i = b5.b),
            b3 AS (SELECT d.j AS b FROM dp4 d, b4 WHERE d.i = b4.b),
            b2 AS (SELECT d.j AS b FROM dp3 d, b3 WHERE d.i = b3.b),
            b1 AS (SELECT d.j AS b FROM dp2 d, b2 WHERE d.i = b2.b),
            cuts AS (SELECT 0 AS bucket, 0 AS lo, b1.b AS hi FROM b1
                     UNION ALL SELECT 1, b1.b, b2.b FROM b1, b2
                     UNION ALL SELECT 2, b2.b, b3.b FROM b2, b3
                     UNION ALL SELECT 3, b3.b, b4.b FROM b3, b4
                     UNION ALL SELECT 4, b4.b, b5.b FROM b4, b5
                     UNION ALL SELECT 5, b5.b, nn.n FROM b5, nn)
            SELECT CAST(c.bucket AS BIGINT) AS bucket,
                   (SELECT day FROM pre WHERE i = c.lo + 1)
                       AS start_day,
                   (SELECT day FROM pre WHERE i = c.hi) AS end_day,
                   CAST(c.hi - c.lo AS BIGINT) AS n_days,
                   CAST((SELECT sv FROM pre WHERE i = c.hi)
                        - (SELECT sv FROM pre WHERE i = c.lo)
                        AS BIGINT) AS sum_count,
                   CAST((SELECT qv FROM pre WHERE i = c.hi)
                        - (SELECT qv FROM pre WHERE i = c.lo)
                        AS DOUBLE)
                       - CAST(((SELECT sv FROM pre WHERE i = c.hi)
                               - (SELECT sv FROM pre WHERE i = c.lo))
                              * ((SELECT sv FROM pre WHERE i = c.hi)
                                 - (SELECT sv FROM pre WHERE i = c.lo))
                              AS DOUBLE)
                         / CAST(c.hi - c.lo AS DOUBLE) AS sse
            FROM cuts c ORDER BY bucket
        """,
        "subsequence_counts": """
            WITH w1 AS (SELECT user_id, event_type,
                            sum(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END)
                                OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS c1,
                            ts, event_id
                        FROM events),
            w2 AS (SELECT *, sum(CASE WHEN event_type = 'click'
                       THEN c1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c2
                   FROM w1)
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'view'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
                   CAST(sum(CASE WHEN event_type = 'click'
                        THEN c1 ELSE 0 END) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN c2 ELSE 0 END) AS BIGINT) AS n_chains
            FROM w2 GROUP BY user_id ORDER BY user_id
        """,
        "hilbert_order": """
            WITH RECURSIVE
            pts AS (SELECT p_partkey AS id,
                        CAST(floor(p_retailprice + 0.5) AS BIGINT)
                            % 65536 AS hx,
                        CAST(p_size AS BIGINT) % 65536 AS hy
                    FROM part),
            st(id, x, y, d, s) AS (
                SELECT id, hx, hy, CAST(0 AS BIGINT),
                       CAST(32768 AS BIGINT) FROM pts
                UNION ALL
                SELECT id,
                    CASE WHEN (y & s) >= 1 THEN x
                         WHEN (x & s) >= 1 THEN s - 1 - y
                         ELSE y END,
                    CASE WHEN (y & s) >= 1 THEN y
                         WHEN (x & s) >= 1 THEN s - 1 - x
                         ELSE x END,
                    d + s * s * xor(3 * (CASE WHEN (x & s) >= 1
                        THEN 1 ELSE 0 END),
                        CASE WHEN (y & s) >= 1 THEN 1 ELSE 0 END),
                    s // 2
                FROM st WHERE s > 0)
            SELECT p.id AS p_partkey, p.hx, p.hy,
                   st.d AS hilbert_d
            FROM st JOIN pts p ON p.id = st.id
            WHERE st.s = 0 ORDER BY p.id
        """,
        # wave 41: sketch-with-truth + integrity + held-out LM
        "bottomk_jaccard": """
            WITH inc AS (SELECT DISTINCT source, tok FROM
                (SELECT source, unnest(regexp_extract_all(lower(text),
                     '[a-z0-9]+')) AS tok FROM documents)),
            h AS (SELECT source, tok, md5(tok) AS hh FROM inc),
            sk AS (SELECT source, hh FROM h
                   QUALIFY row_number() OVER (PARTITION BY source
                       ORDER BY hh) <= 32),
            cnts AS (SELECT source, count(*) AS n FROM inc
                     GROUP BY source),
            pairs AS (SELECT a.source AS sa, b.source AS sb,
                          a.n AS na, b.n AS nb
                      FROM cnts a JOIN cnts b
                          ON a.source < b.source),
            usk AS (SELECT DISTINCT p.sa, p.sb, s.hh
                    FROM pairs p JOIN sk s
                        ON s.source = p.sa OR s.source = p.sb),
            ubk AS (SELECT sa, sb, hh FROM usk
                    QUALIFY row_number() OVER (PARTITION BY sa, sb
                        ORDER BY hh) <= 32),
            est AS (SELECT u.sa, u.sb,
                        sum(CASE WHEN ea.hh IS NOT NULL
                                  AND eb.hh IS NOT NULL
                                 THEN 1 ELSE 0 END) AS en,
                        count(*) AS kk
                    FROM ubk u
                    LEFT JOIN sk ea ON ea.source = u.sa
                                   AND ea.hh = u.hh
                    LEFT JOIN sk eb ON eb.source = u.sb
                                   AND eb.hh = u.hh
                    GROUP BY u.sa, u.sb),
            exact AS (SELECT a.source AS sa, b.source AS sb,
                          count(*) AS it
                      FROM inc a JOIN inc b ON b.source > a.source
                                           AND b.tok = a.tok
                      GROUP BY 1, 2)
            SELECT p.sa AS group_a, p.sb AS group_b,
                   CAST(p.na AS BIGINT) AS n_a,
                   CAST(p.nb AS BIGINT) AS n_b,
                   CAST(e.en AS BIGINT) AS est_num,
                   CAST(e.en AS DOUBLE) / e.kk AS jaccard_est,
                   CAST(COALESCE(x.it, 0) AS BIGINT) AS inter,
                   CAST(p.na + p.nb - COALESCE(x.it, 0) AS BIGINT)
                       AS uni,
                   CAST(COALESCE(x.it, 0) AS DOUBLE)
                       / (p.na + p.nb - COALESCE(x.it, 0))
                       AS jaccard_exact,
                   abs(CAST(e.en AS DOUBLE) / e.kk
                       - CAST(COALESCE(x.it, 0) AS DOUBLE)
                         / (p.na + p.nb - COALESCE(x.it, 0)))
                       AS abs_err
            FROM pairs p JOIN est e ON e.sa = p.sa AND e.sb = p.sb
            LEFT JOIN exact x ON x.sa = p.sa AND x.sb = p.sb
            ORDER BY group_a, group_b
        """,
        "merkle_levels": """
            WITH RECURSIVE
            pw(l, v) AS (SELECT 0, CAST(1 AS HUGEINT)
                         UNION ALL SELECT l + 1, v * 2 FROM pw
                         WHERE l < 60),
            params AS (SELECT count(*) AS n FROM orders),
            l0 AS (SELECT min(pw.l) AS lv0 FROM pw, params
                   WHERE pw.l % 4 = 0
                     AND (params.n + pw.v - 1) // pw.v <= 16),
            leaves AS (SELECT row_number() OVER (ORDER BY o_orderkey)
                           - 1 AS idx,
                           md5(CAST(o_orderkey AS VARCHAR) || ':'
                               || CAST(CAST(round(o_totalprice * 100)
                                       AS BIGINT) AS VARCHAR)) AS h
                       FROM orders),
            lv(level, idx, h) AS (
                SELECT CAST(0 AS BIGINT), idx, h FROM leaves
                UNION ALL
                SELECT t.level, t.idx, t.h FROM (
                    WITH cur AS (SELECT * FROM lv),
                    cc AS (SELECT count(*) AS c FROM cur)
                    SELECT a.level + 1 AS level, a.idx // 2 AS idx,
                           md5(a.h || b.h) AS h
                    FROM cur a JOIN cur b ON b.idx = a.idx + 1, cc
                    WHERE a.idx % 2 = 0 AND cc.c > 1
                    UNION ALL
                    SELECT a.level + 1, a.idx // 2, a.h
                    FROM cur a, cc
                    WHERE cc.c > 1 AND cc.c % 2 = 1
                      AND a.idx = cc.c - 1
                ) t)
            SELECT lv.level, lv.idx, lv.h AS node_hash
            FROM lv, l0 WHERE lv.level >= l0.lv0
            ORDER BY lv.level, lv.idx
        """,
        "lm_heldout_ppl": """
            WITH toks AS (SELECT doc_id,
                              regexp_extract_all(lower(text),
                                  '[a-z0-9]+') AS ts FROM documents),
            bg AS (SELECT doc_id, ts[g.i] AS prev, ts[g.i + 1] AS w
                   FROM toks, LATERAL (SELECT unnest(generate_series(
                       1, len(ts) - 1)) AS i) g),
            train AS (SELECT prev, w FROM bg WHERE doc_id % 5 <> 0),
            held AS (SELECT * FROM bg WHERE doc_id % 5 = 0),
            c2 AS (SELECT prev, w, count(*) AS c2 FROM train
                   GROUP BY 1, 2),
            c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY prev),
            vv AS (SELECT count(*) AS V FROM (SELECT DISTINCT t FROM
                (SELECT prev AS t FROM c2
                 UNION ALL SELECT w FROM c2))),
            sc AS (SELECT h.doc_id, COALESCE(c2.c2, 0) AS c2v,
                       COALESCE(c1.c1, 0) AS c1v
                   FROM held h
                   LEFT JOIN c2 ON c2.prev = h.prev AND c2.w = h.w
                   LEFT JOIN c1 ON c1.prev = h.prev),
            per AS (SELECT doc_id, count(*) AS nb,
                        sum(CASE WHEN c2v = 0 THEN 1 ELSE 0 END)
                            AS nu,
                        sum(log2((c2v + 0.5) / (c1v + 0.5 * vv.V)))
                            AS lps
                    FROM sc, vv GROUP BY doc_id, vv.V)
            SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
                   CAST(nu AS BIGINT) AS n_unseen_bigrams,
                   lps AS logprob_sum,
                   power(2.0, -lps / nb) AS ppl
            FROM per ORDER BY doc_id
        """,
        # wave 42: DP + forecasting-eval + rank-fusion families
        "interval_scheduling": """
            WITH iv AS (SELECT user_id, event_type,
                            CAST(min(epoch_us(ts)) AS BIGINT) AS s,
                            CAST(max(epoch_us(ts)) AS BIGINT) AS e,
                            count(*) AS w
                        FROM events GROUP BY 1, 2),
            rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY e, s, event_type) AS r FROM iv),
            pj AS (SELECT a.user_id, a.r, a.w,
                       COALESCE((SELECT max(b.r) FROM rk b
                                 WHERE b.user_id = a.user_id
                                   AND b.e < a.s), 0) AS p
                   FROM rk a),
            -- the event-type alphabet has 5 symbols, so ranks ≤ 5
            -- and five unrolled DP levels suffice
            d0 AS (SELECT DISTINCT user_id, 0 AS r,
                       CAST(0 AS BIGINT) AS dp FROM rk),
            d1 AS (SELECT p1.user_id, 1 AS r,
                       greatest(d0.dp, p1.w + pp.dp) AS dp
                   FROM pj p1
                   JOIN d0 ON d0.user_id = p1.user_id
                   JOIN d0 pp ON pp.user_id = p1.user_id
                   WHERE p1.r = 1),
            u1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1),
            d2 AS (SELECT p2.user_id, 2,
                       greatest(prev.dp, p2.w + pp.dp)
                   FROM pj p2
                   JOIN u1 prev ON prev.user_id = p2.user_id
                                AND prev.r = 1
                   JOIN u1 pp ON pp.user_id = p2.user_id
                              AND pp.r = p2.p
                   WHERE p2.r = 2),
            u2 AS (SELECT * FROM u1 UNION ALL SELECT * FROM d2),
            d3 AS (SELECT p3.user_id, 3,
                       greatest(prev.dp, p3.w + pp.dp)
                   FROM pj p3
                   JOIN u2 prev ON prev.user_id = p3.user_id
                                AND prev.r = 2
                   JOIN u2 pp ON pp.user_id = p3.user_id
                              AND pp.r = p3.p
                   WHERE p3.r = 3),
            u3 AS (SELECT * FROM u2 UNION ALL SELECT * FROM d3),
            d4 AS (SELECT p4.user_id, 4,
                       greatest(prev.dp, p4.w + pp.dp)
                   FROM pj p4
                   JOIN u3 prev ON prev.user_id = p4.user_id
                                AND prev.r = 3
                   JOIN u3 pp ON pp.user_id = p4.user_id
                              AND pp.r = p4.p
                   WHERE p4.r = 4),
            u4 AS (SELECT * FROM u3 UNION ALL SELECT * FROM d4),
            d5 AS (SELECT p5.user_id, 5,
                       greatest(prev.dp, p5.w + pp.dp)
                   FROM pj p5
                   JOIN u4 prev ON prev.user_id = p5.user_id
                                AND prev.r = 4
                   JOIN u4 pp ON pp.user_id = p5.user_id
                              AND pp.r = p5.p
                   WHERE p5.r = 5),
            uall AS (SELECT * FROM u4 UNION ALL SELECT * FROM d5),
            mx AS (SELECT user_id, max(r) AS nr, count(*) AS ni,
                       sum(w) AS tw FROM rk GROUP BY user_id)
            SELECT m.user_id, CAST(m.ni AS BIGINT) AS n_intervals,
                   CAST(m.tw AS BIGINT) AS total_events,
                   CAST(u.dp AS BIGINT) AS best_events
            FROM mx m JOIN uall u ON u.user_id = m.user_id
                                  AND u.r = m.nr
            ORDER BY m.user_id
        """,
        "lis_revenue": """
            WITH RECURSIVE
            d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                      // 86400000000 AS day,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                          AS cents
                  FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            seq AS (SELECT row_number() OVER (ORDER BY day) AS i,
                        day, cents FROM s),
            nn AS (SELECT count(*) AS n FROM seq),
            rec(step, i, day, cents, lis) AS (
                SELECT CAST(1 AS BIGINT), i, day, cents,
                       CAST(1 AS BIGINT)
                FROM seq WHERE i = 1
                UNION ALL
                SELECT t.step, t.i, t.day, t.cents, t.lis FROM (
                    WITH cur AS (SELECT * FROM rec),
                    st AS (SELECT max(step) AS k FROM cur)
                    SELECT st.k + 1 AS step, c.i, c.day, c.cents,
                           c.lis
                    FROM cur c, st, nn WHERE st.k < nn.n
                    UNION ALL
                    SELECT st.k + 1, s2.i, s2.day, s2.cents,
                        1 + COALESCE((SELECT max(c2.lis) FROM cur c2
                                      WHERE c2.cents < s2.cents), 0)
                    FROM seq s2, st, nn
                    WHERE st.k < nn.n AND s2.i = st.k + 1
                ) t)
            SELECT day, cents, lis AS lis_len
            FROM rec, nn WHERE step = nn.n ORDER BY day
        """,
        "mase_weekly": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            n1 AS (SELECT CAST(sum(abs(a.cents - b.cents)) AS BIGINT)
                       AS sa, count(*) AS c
                   FROM s a JOIN s b ON b.day = a.day - 1),
            n7 AS (SELECT CAST(sum(abs(a.cents - b.cents)) AS BIGINT)
                       AS sa, count(*) AS c
                   FROM s a JOIN s b ON b.day = a.day - 7)
            SELECT CAST(n1.c AS BIGINT) AS n_naive,
                   CAST(n7.c AS BIGINT) AS n_seasonal,
                   CAST(n1.sa AS DOUBLE) / n1.c AS mae_naive,
                   CAST(n7.sa AS DOUBLE) / n7.c AS mae_seasonal,
                   (CAST(n7.sa AS DOUBLE) / n7.c)
                       / (CAST(n1.sa AS DOUBLE) / n1.c) AS mase
            FROM n1, n7
        """,
        "borda_fusion": """
            WITH g AS (SELECT l_partkey,
                    CAST(sum(CAST(round(l_extendedprice * 100)
                                  AS BIGINT)
                             * (100 - CAST(round(l_discount * 100)
                                           AS BIGINT))) AS BIGINT)
                        AS rev,
                    CAST(sum(CAST(round(l_quantity) AS BIGINT))
                         AS BIGINT) AS qty,
                    count(*) AS n
                FROM lineitem GROUP BY 1),
            r AS (SELECT *,
                      row_number() OVER (ORDER BY rev DESC,
                          l_partkey) AS r_rev,
                      row_number() OVER (ORDER BY qty DESC,
                          l_partkey) AS r_qty,
                      row_number() OVER (ORDER BY n DESC,
                          l_partkey) AS r_cnt
                  FROM g)
            SELECT l_partkey, rev AS revenue_i, qty AS qty_i,
                   CAST(n AS BIGINT) AS n_lines,
                   CAST(r_rev AS BIGINT) AS r_rev,
                   CAST(r_qty AS BIGINT) AS r_qty,
                   CAST(r_cnt AS BIGINT) AS r_cnt,
                   CAST(r_rev + r_qty + r_cnt AS BIGINT) AS borda
            FROM r ORDER BY borda, l_partkey LIMIT 20
        """,
        # wave 43: ranking-depth + audit + info-theory families
        "pareto_layers": """
            WITH RECURSIVE
            seq AS (SELECT row_number() OVER (ORDER BY p_retailprice,
                        p_size DESC, p_partkey) AS i,
                        p_partkey, p_retailprice, p_size
                    FROM part),
            nn AS (SELECT count(*) AS n FROM seq),
            rec(step, i, pk, x, y, layer) AS (
                SELECT CAST(1 AS BIGINT), i, p_partkey,
                       p_retailprice, p_size, CAST(1 AS BIGINT)
                FROM seq WHERE i = 1
                UNION ALL
                SELECT t.step, t.i, t.pk, t.x, t.y, t.layer FROM (
                    WITH cur AS (SELECT * FROM rec),
                    st AS (SELECT max(step) AS k FROM cur)
                    SELECT st.k + 1 AS step, c.i, c.pk, c.x, c.y,
                           c.layer
                    FROM cur c, st, nn WHERE st.k < nn.n
                    UNION ALL
                    SELECT st.k + 1, s2.i, s2.p_partkey,
                        s2.p_retailprice, s2.p_size,
                        1 + COALESCE((SELECT max(c2.layer)
                                      FROM cur c2
                                      WHERE c2.x < s2.p_retailprice
                                        AND c2.y < s2.p_size), 0)
                    FROM seq s2, st, nn
                    WHERE st.k < nn.n AND s2.i = st.k + 1
                ) t)
            SELECT pk AS p_partkey, x AS p_retailprice,
                   CAST(y AS INTEGER) AS p_size, layer
            FROM rec, nn WHERE step = nn.n ORDER BY pk
        """,
        "dedup_transitivity": """
            WITH d AS (SELECT doc_id, n_chars,
                list_distinct(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS toks
                FROM documents),
            r AS (SELECT *, row_number()
                      OVER (ORDER BY n_chars, doc_id) AS rn FROM d),
            p AS (SELECT a.doc_id AS a, b.doc_id AS b,
                      len(list_intersect(a.toks, b.toks)) AS i,
                      len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks)) AS u
                  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4),
            -- snm emits (lower-RANK, higher-rank); normalize to id
            -- order so the ordered triangle join sees each edge once
            pairs AS (SELECT DISTINCT least(a, b) AS a,
                          greatest(a, b) AS b FROM p
                      WHERE (CASE WHEN u = 0 THEN 1.0
                             ELSE CAST(i AS DOUBLE) / u END) >= 0.8),
            deg AS (SELECT node, count(*) AS dg FROM
                    (SELECT a AS node FROM pairs
                     UNION ALL SELECT b FROM pairs) GROUP BY node),
            w AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT)
                      AS wedges, count(*) AS nodes FROM deg),
            tri AS (SELECT count(*) AS t FROM pairs p1
                    JOIN pairs p2 ON p2.a = p1.a AND p2.b > p1.b
                    JOIN pairs p3 ON p3.a = p1.b AND p3.b = p2.b),
            np AS (SELECT count(*) AS e FROM pairs)
            SELECT CAST(w.nodes AS BIGINT) AS n_nodes,
                   CAST(np.e AS BIGINT) AS n_pairs,
                   w.wedges AS n_wedges,
                   CAST(tri.t AS BIGINT) AS n_triangles,
                   CASE WHEN w.wedges > 0
                        THEN 3.0 * tri.t / w.wedges
                        ELSE 0.0 END AS transitivity
            FROM w, tri, np
        """,
        "huffman_lengths": """
            WITH c0 AS (SELECT [event_type] AS members,
                            CAST(count(*) AS BIGINT) AS cnt
                        FROM events GROUP BY event_type),
            tot AS (SELECT sum(cnt) AS t FROM c0),
            r1 AS (SELECT *, row_number() OVER (ORDER BY cnt,
                       members[1]) AS rk FROM c0),
            m1 AS (SELECT list_sort(a.members || b.members) AS members,
                       a.cnt + b.cnt AS cnt
                   FROM r1 a JOIN r1 b ON a.rk = 1 AND b.rk = 2),
            n1 AS (SELECT members, cnt FROM r1 WHERE rk > 2
                   UNION ALL SELECT members, cnt FROM m1),
            r2 AS (SELECT *, row_number() OVER (ORDER BY cnt,
                       members[1]) AS rk FROM n1),
            m2 AS (SELECT list_sort(a.members || b.members) AS members,
                       a.cnt + b.cnt AS cnt
                   FROM r2 a JOIN r2 b ON a.rk = 1 AND b.rk = 2),
            n2 AS (SELECT members, cnt FROM r2 WHERE rk > 2
                   UNION ALL SELECT members, cnt FROM m2),
            r3 AS (SELECT *, row_number() OVER (ORDER BY cnt,
                       members[1]) AS rk FROM n2),
            m3 AS (SELECT list_sort(a.members || b.members) AS members,
                       a.cnt + b.cnt AS cnt
                   FROM r3 a JOIN r3 b ON a.rk = 1 AND b.rk = 2),
            n3 AS (SELECT members, cnt FROM r3 WHERE rk > 2
                   UNION ALL SELECT members, cnt FROM m3),
            r4 AS (SELECT *, row_number() OVER (ORDER BY cnt,
                       members[1]) AS rk FROM n3),
            m4 AS (SELECT list_sort(a.members || b.members) AS members,
                       a.cnt + b.cnt AS cnt
                   FROM r4 a JOIN r4 b ON a.rk = 1 AND b.rk = 2),
            merges AS (SELECT members FROM m1
                       UNION ALL SELECT members FROM m2
                       UNION ALL SELECT members FROM m3
                       UNION ALL SELECT members FROM m4),
            base AS (SELECT event_type AS symbol,
                         CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY event_type)
            SELECT b.symbol, b.n,
                   CAST((SELECT count(*) FROM merges
                         WHERE list_contains(members, b.symbol))
                        AS BIGINT) AS code_len,
                   CAST(b.n * (SELECT count(*) FROM merges
                               WHERE list_contains(members, b.symbol))
                        AS BIGINT) AS weighted_bits,
                   b.n * log2(CAST(tot.t AS DOUBLE) / b.n)
                       AS entropy_bits
            FROM base b, tot ORDER BY b.symbol
        """,
        "simpson_flags": """
            WITH j AS (SELECT p.p_brand,
                           CAST(round(l.l_quantity) AS BIGINT) AS x,
                           CAST(round(l.l_discount * 100) AS BIGINT)
                               AS y
                       FROM lineitem l
                       JOIN part p ON p.p_partkey = l.l_partkey),
            g AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
                      sum(CAST(x AS HUGEINT)) AS sx,
                      sum(CAST(y AS HUGEINT)) AS sy,
                      sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                          AS sxy,
                      sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                          AS sxx
                  FROM j GROUP BY 1),
            tot AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
                        sum(sxy) AS sxy, sum(sxx) AS sxx FROM g),
            pool AS (SELECT n * sxy - sx * sy AS pn,
                         n * sxx - sx * sx AS pdn FROM tot)
            SELECT g.p_brand, CAST(g.n AS BIGINT) AS n,
                   CAST(g.n * g.sxy - g.sx * g.sy AS BIGINT)
                       AS slope_num,
                   CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                       / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                       AS slope,
                   CAST(pool.pn AS DOUBLE) / CAST(pool.pdn AS DOUBLE)
                       AS pooled_slope,
                   ((g.n * g.sxy - g.sx * g.sy > 0 AND pool.pn < 0)
                    OR (g.n * g.sxy - g.sx * g.sy < 0
                        AND pool.pn > 0)) AS flipped
            FROM g, pool ORDER BY g.p_brand
        """,
        # wave 44: chunk-dedup census + local trend + tail index
        "cdc_dedup_ratio": """
            WITH RECURSIVE
            pw(k, v) AS (
                SELECT 0, CAST(1 AS HUGEINT)
                UNION ALL
                SELECT k + 1, v * 2 FROM pw WHERE k < 63),
            pos AS (SELECT doc_id, text,
                        unnest(generate_series(1, length(text))) AS i
                    FROM documents),
            hsum AS (SELECT p.doc_id, p.i,
                         sum(((CAST(unicode(substr(p.text, p.i - pw.k,
                                  1)) AS HUGEINT) + 1)
                              * 11400714819323198485
                              % 18446744073709551616) * pw.v
                             % 18446744073709551616)
                         % 18446744073709551616 AS h
                     FROM pos p JOIN pw ON pw.k <= p.i - 1
                     GROUP BY p.doc_id, p.i),
            hb AS (SELECT doc_id, i FROM hsum WHERE h % 64 = 0),
            edges AS (SELECT DISTINCT doc_id, i FROM
                      (SELECT doc_id, i FROM hb
                       UNION ALL
                       SELECT doc_id, length(text) FROM documents
                       WHERE length(text) > 0)),
            ordered AS (SELECT doc_id, i,
                            COALESCE(lag(i) OVER (PARTITION BY doc_id
                                ORDER BY i), 0) AS prev
                        FROM edges),
            segs AS (SELECT md5(substr(d.text, o.prev + 1,
                         o.i - o.prev)) AS h,
                         o.i - o.prev AS ln
                     FROM ordered o JOIN documents d USING (doc_id)),
            agg AS (SELECT h, count(*) AS n, min(ln) AS ln FROM segs
                    GROUP BY h),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
                        count(*) AS n_distinct,
                        CAST(sum(n * ln) AS BIGINT) AS chars_total,
                        CAST(sum(ln) AS BIGINT) AS chars_distinct
                    FROM agg)
            SELECT n_chunks, CAST(n_distinct AS BIGINT) AS n_distinct,
                   CAST(n_chunks - n_distinct AS DOUBLE) / n_chunks
                       AS dup_chunk_frac,
                   chars_total, chars_distinct,
                   CAST(chars_total - chars_distinct AS DOUBLE)
                       / chars_total AS dup_char_frac
            FROM tot
        """,
        "rolling_slope_28d": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            w AS (SELECT a.day, a.cents,
                      CAST(count(*) AS HUGEINT) AS n,
                      sum(CAST(b.day AS HUGEINT)) AS sx,
                      sum(CAST(b.cents AS HUGEINT)) AS sy,
                      sum(CAST(b.day AS HUGEINT)
                          * CAST(b.cents AS HUGEINT)) AS sxy,
                      sum(CAST(b.day AS HUGEINT)
                          * CAST(b.day AS HUGEINT)) AS sxx
                  FROM s a JOIN s b ON b.day BETWEEN a.day - 27
                      AND a.day
                  GROUP BY a.day, a.cents)
            SELECT day, cents, CAST(n AS BIGINT) AS n_win,
                   CASE WHEN n >= 2 THEN
                       CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                   END AS slope
            FROM w ORDER BY day
        """,
        "hill_tail_index": """
            WITH r AS (SELECT n_chars, row_number() OVER
                           (ORDER BY n_chars DESC, doc_id) AS rn
                       FROM documents),
            xt AS (SELECT n_chars AS x FROM r WHERE rn = 51),
            m AS (SELECT sum(ln(CAST(r.n_chars AS DOUBLE) / xt.x))
                      / 50 AS ml
                  FROM r, xt WHERE rn <= 50)
            SELECT CAST(50 AS BIGINT) AS k,
                   CAST(xt.x AS BIGINT) AS x_tail,
                   m.ml AS mean_log_ratio,
                   CASE WHEN m.ml > 0 THEN 1.0 / m.ml END
                       AS tail_alpha
            FROM xt, m
        """,
        # wave 45: parametric screen + capture-recapture + runs test
        "welch_t_sources": """
            WITH x AS (SELECT source AS g,
                           CAST(n_chars AS BIGINT) AS v
                       FROM documents),
            agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(v) AS BIGINT) AS sx,
                        CAST(sum(v * v) AS BIGINT) AS sxx
                    FROM x GROUP BY g),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                        CAST(sum(sx) AS BIGINT) AS tsx,
                        CAST(sum(sxx) AS BIGINT) AS tsxx FROM agg),
            e AS (SELECT a.g, a.n AS n1, tot.tn - a.n AS n2,
                      CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
                          AS m1,
                      CAST(tot.tsx - a.sx AS DOUBLE)
                          / CAST(tot.tn - a.n AS DOUBLE) AS m2,
                      (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE)
                           * CAST(a.sx AS DOUBLE)
                           / CAST(a.n AS DOUBLE))
                          / CAST(a.n - 1 AS DOUBLE)
                          / CAST(a.n AS DOUBLE) AS se1,
                      (CAST(tot.tsxx - a.sxx AS DOUBLE)
                           - CAST(tot.tsx - a.sx AS DOUBLE)
                             * CAST(tot.tsx - a.sx AS DOUBLE)
                             / CAST(tot.tn - a.n AS DOUBLE))
                          / CAST(tot.tn - a.n - 1 AS DOUBLE)
                          / CAST(tot.tn - a.n AS DOUBLE) AS se2
                  FROM agg a, tot)
            SELECT g AS "group", n1 AS n_g, n2 AS n_rest,
                   m1 AS mean_g, m2 AS mean_rest,
                   (m1 - m2) / sqrt(se1 + se2) AS t_stat,
                   (se1 + se2) * (se1 + se2)
                       / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
                          + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS df
            FROM e ORDER BY g
        """,
        "capture_recapture": f"""
            WITH base AS (SELECT p_partkey AS k, p_name AS n,
                              length(p_name) AS L FROM part),
            dirty AS (SELECT n, CASE (k % 3)
                WHEN 0 THEN substr(n, 1, k % L) || substr(n, (k % L) + 2)
                WHEN 1 THEN substr(n, 1, k % (L - 1))
                         || substr(n, (k % (L - 1)) + 2, 1)
                         || substr(n, (k % (L - 1)) + 1, 1)
                         || substr(n, (k % (L - 1)) + 3)
                ELSE substr(n, 1, (k % L) + 1)
                         || substr(n, (k % L) + 1, 1)
                         || substr(n, (k % L) + 2)
              END AS d FROM base),
            truth AS (SELECT DISTINCT least(n, d) AS a,
                          greatest(n, d) AS b FROM dirty WHERE n <> d),
            tn AS (SELECT DISTINCT name FROM
                (SELECT a AS name FROM truth
                 UNION ALL SELECT b FROM truth)),
            u AS (SELECT name, regexp_replace(upper(name), '[^A-Z]',
                      '', 'g') AS s FROM tn),
            mm AS (SELECT name, s,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(s, '[BFPV]', '1', 'g'),
                    '[CGJKQSXZ]', '2', 'g'), '[DT]', '3', 'g'),
                    'L', '4', 'g'), '[MN]', '5', 'g'), 'R', '6', 'g'),
                    '[AEIOUYHW]', '0', 'g') AS d1 FROM u),
            coded AS (SELECT name,
                CASE WHEN s = '' THEN ''
                     ELSE s[1] || substr(replace(substr(
                          {_SOUNDEX_COLLAPSE_SQL}, 2), '0', '')
                          || '000', 1, 3) END AS code FROM mm),
            fl AS (SELECT t.a, t.b,
                       CASE WHEN substr(t.a, 1, 1) = substr(t.b, 1, 1)
                             AND abs(length(t.a) - length(t.b)) <= 1
                            THEN 1 ELSE 0 END AS fa,
                       CASE WHEN ca.code = cb.code THEN 1 ELSE 0 END
                           AS fb
                   FROM truth t
                   JOIN coded ca ON ca.name = t.a
                   JOIN coded cb ON cb.name = t.b),
            c AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                      CAST(sum(fa) AS BIGINT) AS na,
                      CAST(sum(fb) AS BIGINT) AS nb,
                      CAST(sum(fa * fb) AS BIGINT) AS m FROM fl)
            SELECT nt AS n_truth, na AS n_a, nb AS n_b, m AS n_both,
                   CAST((na + 1) * (nb + 1) AS DOUBLE)
                       / CAST(m + 1 AS DOUBLE) - 1.0 AS chapman_est,
                   (CAST((na + 1) * (nb + 1) AS DOUBLE)
                        / CAST(m + 1 AS DOUBLE) - 1.0)
                       / CAST(nt AS DOUBLE) AS est_over_truth
            FROM c
        """,
        "runs_test_revenue": """
            WITH d AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT)
                           // 86400000000 AS day,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                               AS cents
                       FROM orders),
            s AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
                  FROM d GROUP BY day),
            nn0 AS (SELECT count(*) AS n FROM s),
            med AS (SELECT cents AS m FROM s, nn0
                    QUALIFY row_number() OVER (ORDER BY cents, day)
                        = (nn0.n + 1) // 2),
            f AS (SELECT day, CASE WHEN s.cents > med.m THEN 1
                      ELSE 0 END AS sgn
                  FROM s, med WHERE s.cents <> med.m),
            r AS (SELECT sgn, lag(sgn) OVER (ORDER BY day) AS p
                  FROM f),
            c AS (SELECT CAST(sum(sgn) AS BIGINT) AS n1,
                      CAST(count(*) - sum(sgn) AS BIGINT) AS n2,
                      CAST(1 + sum(CASE WHEN p IS NOT NULL
                               AND sgn <> p THEN 1 ELSE 0 END)
                           AS BIGINT) AS runs
                  FROM r)
            SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
                   2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE) + 1.0
                       AS mu,
                   (CAST(runs AS DOUBLE)
                    - (2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE)
                       + 1.0))
                   / sqrt(2.0 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                          / (CAST(n1 + n2 AS DOUBLE)
                             * CAST(n1 + n2 AS DOUBLE)
                             * CAST(n1 + n2 - 1 AS DOUBLE))) AS z
            FROM c
        """,
    }

