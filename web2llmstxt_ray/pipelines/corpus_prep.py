"""End-to-end training-corpus preparation: the composition flagship.

Chains the engine's LLM-data operators the way a real ingest pipeline
would, with a STAGE-CHECKPOINT layout so a killed run resumes at the
last completed stage (the same resumability contract as the crawl):

    input docs
      → exact dedup            (hash-bucket row shuffle, min-id winner)
      → near-dup drop set      (MinHash LSH → DISTRIBUTED exact-Jaccard
                                verify → connected components; AUTO
                                tier: loser-id broadcast below
                                ``max_broadcast_losers``, bucketed
                                left-join flag above it — the driver
                                only ever holds the loser COUNT)
      → one fused annotate pass  (language ID, token/repetition stats,
                                n-gram-bloom decontamination, near-dup
                                flag, keep/drop_reason verdict)
      → annotated table        (checkpoint: EVERY doc + signals + verdict
                                — the audit artifact)
      → sequence packs         (greedy FFD over kept docs' token counts,
                                column-pruned read of the checkpoint)
      → manifest.json          (per-reason drop counts via partial-agg,
                                never a driver-side row scan)

Scale shape: two heavy passes over the text (dedup shuffle; fused
annotate), both streaming; everything the driver holds is bounded
(near-dup losers, bloom bits, per-reason counters). Stages write
through the storage seam (``sinks.write_span_docs``) so the layout
flips to Lance by installing pylance; a ``.done`` marker per stage
directory makes re-runs skip completed stages.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..ops.dedup import exact_dedup_losers, minhash_components_verified
from ..ops.scrub import (NgramBloomFlagger, _bloom_positions,
                         build_ngram_bloom, gram_hashes_flat)
from ..ops.textstats import (detect_language_batch, tokenize_lower_hashes,
                             top_bigram_counts)

from ..sinks import resolve_format, write_span_docs

DROP_PRECEDENCE = ("near_dup", "short", "lang", "repetitive",
                   "contaminated")


class CorpusAnnotator:
    """One fused per-doc pass producing every quality signal and the
    keep/drop verdict. Broadcast state (near-dup loser ids, bloom bits)
    resolves from ``ray.put`` handles once per actor/worker."""

    def __init__(self, drop_ref, bloom_ref, bloom_m: int, ngram_n: int,
                 min_words: int, langs: tuple[str, ...],
                 max_bigram_frac: float, text_col: str = "text",
                 id_col: str = "doc_id",
                 near_dup_col: str | None = None):
        drop = (ray.get(drop_ref) if isinstance(drop_ref, ray.ObjectRef)
                else drop_ref)
        self.drop = set(drop)
        self.flagger = NgramBloomFlagger(bloom_ref, bloom_m, ngram_n,
                                         text_col, id_col)
        self.min_words = min_words
        self.langs = set(langs)
        self.max_bigram_frac = max_bigram_frac
        self.text_col, self.id_col = text_col, id_col
        self.near_dup_col = near_dup_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One fused VECTORIZED pass per batch: Arrow-side tokenize +
        hash feeds n_words, the top-bigram repetition signal AND the
        bloom gram probe from a single token stream;
        ``detect_language_batch`` and the verdict ladder (``np.select``)
        are batch kernels too — no per-row Python (the scalar
        predecessor profiled at ~8.7k docs/s and dominated the corpus
        prep wall; see ops/textstats.py batch-kernel parity notes for
        the exactness contract)."""
        n_rows = batch.num_rows
        texts = batch.column(self.text_col)
        hw, offsets = tokenize_lower_hashes(texts)
        n_words = np.diff(offsets)
        top_bg = top_bigram_counts(hw, offsets)
        langs = np.asarray(detect_language_batch(texts), dtype=object)
        # bloom probe on the SAME token hashes (flagger tier kept for
        # the standalone decontaminate path; this inlines its kernel)
        gh, goff = gram_hashes_flat(hw, offsets, self.flagger.n)
        if len(gh):
            bpos = _bloom_positions(gh, self.flagger.m)
            ghit = self.flagger.bits[bpos].all(axis=0)
            cum = np.concatenate([[0], np.cumsum(ghit)])
            contaminated = (cum[goff[1:]] - cum[goff[:-1]]) > 0
        else:
            contaminated = np.zeros(n_rows, dtype=bool)
        if self.near_dup_col and self.near_dup_col in batch.schema.names:
            # anti-join tier: the loser flag arrived as a column from
            # the bucketed left join (True for losers, null otherwise)
            nd = pc.fill_null(
                batch.column(self.near_dup_col).cast(pa.bool_()),
                False).to_numpy(zero_copy_only=False)
        else:
            nd = np.zeros(n_rows, dtype=bool)
        if self.drop:
            in_drop = pc.is_in(
                batch.column(self.id_col),
                value_set=pa.array(sorted(self.drop))) \
                .to_numpy(zero_copy_only=False)
            nd = nd | in_drop
        lang_ok = (np.ones(n_rows, dtype=bool) if not self.langs
                   else np.isin(langs.astype(str), sorted(self.langs)))
        # same float form as the scalar ladder (a/b > c, NOT a > c*b —
        # the two can round differently at the threshold)
        repetitive = (n_words >= 2) & (
            top_bg / np.maximum(n_words - 1, 1) > self.max_bigram_frac)
        reasons = np.select(
            [nd, n_words < self.min_words, ~lang_ok, repetitive,
             contaminated],
            ["near_dup", "short", "lang", "repetitive", "contaminated"],
            default="").astype(object)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.text_col: texts,
            "predicted_lang": pa.array(list(langs), pa.string()),
            "n_words": pa.array(n_words, pa.int64()),
            "keep": pa.array(reasons == "", pa.bool_()),
            "drop_reason": pa.array(list(reasons), pa.string()),
        })


class _LoserFilter:
    """Map-only anti-membership filter for the broadcast loser tier:
    the loser-id list resolves from its ``ray.put`` handle ONCE per
    worker process (``cached_stage``), and each batch runs one Arrow
    ``is_in`` probe — deserializing the list per batch would be churn
    proportional to loser-set size."""

    def __init__(self, loser_ref, id_col: str):
        losers = (ray.get(loser_ref)
                  if isinstance(loser_ref, ray.ObjectRef) else loser_ref)
        self.value_set = pa.array(losers)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch.column(self.id_col),
                                  value_set=self.value_set))
        return batch.filter(keep)


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, ".done"))


def _mark_done(path: str, note: str = "ok") -> None:
    with open(os.path.join(path, ".done"), "w") as f:
        f.write(note)


def _done_note(path: str) -> str:
    try:
        with open(os.path.join(path, ".done")) as f:
            return f.read().strip()
    except OSError:
        return ""


def _read_stage(path: str, columns=None) -> rd.Dataset:
    if resolve_format("auto") == "parquet":
        return rd.read_parquet(path, columns=columns)
    from ..sinks import read_span_docs

    return rd.from_arrow(read_span_docs(path, columns=columns))


def prepare_corpus(docs: rd.Dataset, workdir: str, **kw) -> dict:
    """Public entry — the full prep chain under ``chain_execution``
    (linear barriered pipeline: per-op resource reservation only
    throttles the single runnable op; measured 10.8→8.7 s at 32 CPUs
    on the 100k-doc bench corpus). See :func:`_prepare_corpus_impl`
    for stages and parameters."""
    from ..ops.stagecache import chain_execution

    with chain_execution():
        return _prepare_corpus_impl(docs, workdir, **kw)


def _prepare_corpus_impl(docs: rd.Dataset, workdir: str, *,
                   bench_texts: list[str] | None = None,
                   min_words: int = 20,
                   langs: tuple[str, ...] = (),
                   max_bigram_frac: float = 0.2,
                   jaccard_threshold: float = 0.8,
                   ngram_n: int = 8,
                   max_tokens: int = 2048,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   max_broadcast_losers: int = 5_000_000) -> dict:
    """Run the full prep chain; returns the manifest dict (also written
    to ``workdir/manifest.json``). Resumable per stage directory.

    Near-dup tier selection is AUTOMATIC: the verified-components
    Dataset yields the loser COUNT for O(1) driver cost; at or below
    ``max_broadcast_losers`` the id set broadcasts into the fused
    annotator (one ``ray.put``, zero extra shuffles), above it the
    losers stay a Dataset and a bucketed left join attaches the
    near-dup flag instead (one extra payload shuffle — the price of
    not broadcasting billions of ids at a 100-TB dup fraction)."""
    import time as _time

    _t0 = _time.perf_counter()
    _timings: dict[str, float] = {}

    def _lap(stage: str) -> None:
        nonlocal _t0
        _timings[stage] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()

    os.makedirs(workdir, exist_ok=True)
    dedup_dir = os.path.join(workdir, "dedup")
    annotated_dir = os.path.join(workdir, "annotated")
    packs_dir = os.path.join(workdir, "packs")

    # stage 1 — exact dedup keeping rows (checkpointed). SKINNY-SHUFFLE
    # form: only (content_hash, id) pairs take the all-to-all; the
    # O(dup-docs) loser-id set comes back and the text payload is
    # filtered MAP-ONLY from the original dataset (broadcast losers
    # below ``max_broadcast_losers``, bucketed anti-join above — the
    # same delivery tiers as the near-dup stage). Replaces the
    # row-payload shuffle of ops/dedup.exact_dedup_rows: identical
    # min-id winners, but the corpus text never moves.
    if not _stage_done(dedup_dir):
        xl_ds = exact_dedup_losers(docs, text_col=text_col,
                                   id_col=id_col).materialize()
        n_exact_losers = xl_ds.count()
        if n_exact_losers == 0:
            deduped = docs
        elif n_exact_losers <= max_broadcast_losers:
            from ..ops.stagecache import cached_stage

            loser_ref = ray.put(sorted(
                r[id_col] for r in xl_ds.take_all()))
            deduped = docs.map_batches(
                cached_stage(_LoserFilter, loser_ref=loser_ref,
                             id_col=id_col),
                batch_format="pyarrow")
        else:
            from ..ops.relational import hash_join

            marked = xl_ds.map_batches(
                lambda t: t.append_column(
                    "_xl", pa.array([True] * t.num_rows, pa.bool_())),
                batch_format="pyarrow")
            joined = hash_join(docs, marked, on=id_col, how="left")

            def drop_marked(batch: pa.Table) -> pa.Table:
                keep = pc.is_null(batch.column("_xl"))
                return batch.filter(keep).drop_columns(["_xl"])

            deduped = joined.map_batches(drop_marked,
                                         batch_format="pyarrow")
        write_span_docs(deduped, dedup_dir)
        _mark_done(dedup_dir)
    _lap("exact_dedup")

    # stages 2+3 — near-dup losers + fused annotate pass (checkpointed
    # audit table). Skipped entirely on resume: the near-dup verdict
    # is already persisted per doc in the annotated checkpoint.
    tier = None
    if not _stage_done(annotated_dir):
        # stage 2 — near-dup cluster losers (keep=False rows) from the
        # fully-distributed verify tier (LSH pairs → joined
        # exact-Jaccard verify → connected components). The components
        # Dataset is O(dup docs); materialize it once, count losers
        # (driver cost: one int), and pick the delivery tier.
        comp = minhash_components_verified(
            _read_stage(dedup_dir, [id_col, text_col]),
            text_col=text_col, id_col=id_col,
            jaccard_threshold=jaccard_threshold).materialize()

        def _losers_only(batch: pa.Table) -> pa.Table:
            import numpy as np

            node = np.asarray(batch.column("node"), dtype=np.int64)
            root = np.asarray(batch.column("component"), dtype=np.int64)
            return pa.table({id_col: pa.array(node[node != root])})

        losers_ds = comp.map_batches(_losers_only,
                                     batch_format="pyarrow")
        n_losers = losers_ds.count()
        _lap("near_dup")
        tier = ("broadcast" if n_losers <= max_broadcast_losers
                else "anti_join")

        blob, m = build_ngram_bloom(bench_texts or [], n=ngram_n)
        from ..ops.stagecache import cached_stage

        if tier == "broadcast":
            losers = sorted(
                r[id_col] for r in losers_ds.take_all())
            annotate_in = _read_stage(dedup_dir, [id_col, text_col])
            drop_ref = ray.put(losers)
            nd_col = None
        else:
            # loser set too big to broadcast: attach the flag by a
            # bucketed left join (docs payload shuffles once on id;
            # the loser side ships only skinny id+flag rows)
            from ..ops.relational import hash_join

            marked = losers_ds.map_batches(
                lambda t: t.append_column(
                    "_nd", pa.array([True] * t.num_rows, pa.bool_())),
                batch_format="pyarrow")
            annotate_in = hash_join(
                _read_stage(dedup_dir, [id_col, text_col]), marked,
                on=id_col, how="left")
            drop_ref = ray.put([])
            nd_col = "_nd"

        annotated = annotate_in.map_batches(
            cached_stage(CorpusAnnotator, drop_ref=drop_ref,
                         bloom_ref=ray.put(blob), bloom_m=m,
                         ngram_n=ngram_n, min_words=min_words,
                         langs=tuple(langs),
                         max_bigram_frac=max_bigram_frac,
                         text_col=text_col, id_col=id_col,
                         near_dup_col=nd_col),
            batch_format="pyarrow")
        write_span_docs(annotated, annotated_dir)
        _mark_done(annotated_dir, note=tier)
    _lap("annotate")

    # stage 4 — sequence packs over kept docs (column-pruned read)
    if not _stage_done(packs_dir):
        from ..ops.corpus import pack_sequences

        kept = _read_stage(annotated_dir, [id_col, "n_words", "keep"]) \
            .map_batches(
                lambda t: t.filter(t["keep"]).select([id_col, "n_words"]),
                batch_format="pyarrow")
        # bucket_mod tier: pack layout must be a pure function of the
        # DATA, not the blocking — the exact/near-dup delivery tiers
        # legitimately produce different checkpoint orders (broadcast
        # filter preserves input order, anti-join reshuffles), and the
        # tier choice must not change the output. One skinny
        # (id, n_words) key shuffle buys that invariance.
        packs = pack_sequences(kept, max_tokens=max_tokens, id_col=id_col,
                               tokens_col="n_words", bucket_mod=16)
        write_span_docs(packs, packs_dir)
        _mark_done(packs_dir)
    _lap("packs")

    # manifest — per-reason counts via partial aggregation (counter
    # rows shuffle, never documents)
    def count_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(batch.column("drop_reason").to_pylist()) \
            .value_counts()
        return pa.table({"drop_reason": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    partials = _read_stage(annotated_dir, ["drop_reason"]) \
        .map_batches(count_batch, batch_format="pyarrow").to_pandas()
    by_reason = partials.groupby("drop_reason")["n"].sum().to_dict()
    n_packs = _read_stage(packs_dir, ["n_docs"]).count()
    if tier is None:  # resumed past the annotate stage
        tier = _done_note(annotated_dir) or "broadcast"
    manifest = {
        "kept": int(by_reason.get("", 0)),
        "dropped": {k: int(v) for k, v in sorted(by_reason.items()) if k},
        # near_dup precedence is first, so every loser surviving exact
        # dedup carries drop_reason == "near_dup": the counter IS the
        # loser count (lets resume skip the minhash recompute)
        "near_dup_losers": int(by_reason.get("near_dup", 0)),
        "near_dup_tier": tier,
        "n_packs": int(n_packs),
        "params": {"min_words": min_words, "langs": list(langs),
                   "max_bigram_frac": max_bigram_frac,
                   "jaccard_threshold": jaccard_threshold,
                   "ngram_n": ngram_n, "max_tokens": max_tokens},
    }
    _lap("manifest")
    if os.environ.get("GRAFT_PREP_TIMINGS"):
        manifest["stage_seconds"] = _timings
    with open(os.path.join(workdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
