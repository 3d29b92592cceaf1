"""Operators over the nested interleaved span-document table.

The engine's primary payload (``schema.SPAN_DOCUMENTS``) is
``(doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)`` —
the interleaved text+media shape the reference crawler emits one page
at a time (dict-of-lists, ``crawler/web_crawler.py:324-334``). These
operators treat the nested column as a first-class distributed type:

- ``build_span_docs``: deterministically synthesize span docs from a
  flat text table (fixed-width chunking, every ``media_every``-th span
  a media placeholder) — the SQL-mirrorable generator used by the
  driver oracle, built with ≤ max-spans-per-doc vectorized slice
  kernels (no per-row Python).
- ``explode_spans``: nested → flat, zero-copy. ``ListArray.flatten()``
  reuses the child buffers; only the repeated ``doc_id`` is gathered
  (``pc.list_parent_indices`` + take). At 100 TB this is the map-only
  "UNNEST" that feeds any per-span stage without a shuffle.
- ``span_kind_stats``: per-kind counts/char totals via the partial-agg
  combiner (one skinny row per block per kind reaches the shuffle).
- ``regroup_spans``: flat → nested, order restored from ``span_idx``
  inside hash(doc_id) buckets — the inverse map so pipelines can
  explode, transform per-span, and re-nest without ever holding a
  whole document's spans on the driver. Round-trip equality (kind,
  text, media_ref, order) is the engine's per-row invariant
  (pytest-gated in tests/test_nested.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.urls import hash64_batch
from ..schema import SPAN_STRUCT

__all__ = ["build_span_docs", "explode_spans", "span_kind_stats",
           "regroup_spans", "span_costs", "pack_interleaved",
           "span_transitions", "media_captions", "span_doc_profile",
           "rechunk_spans"]

FLAT_COLS = ["doc_id", "span_idx", "kind", "text", "media_ref",
             "span_offset"]


def _flat_spans_batch(batch: pa.Table, chunk: int,
                      media_every: int) -> dict:
    """Vectorized flat span arrays for one batch of (doc_id, text).

    One ``utf8_slice_codeunits`` kernel call per span ordinal (bounded
    by the longest doc's span count), everything else numpy."""
    ids = pc.cast(batch.column("doc_id"), pa.string())
    text = pc.cast(batch.column("text"), pa.string())
    nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    counts = -(-nchars // chunk)            # ceil; len 0 -> 0 spans
    total = int(counts.sum())
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    starts = np.zeros(len(batch), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    span_idx = np.arange(total, dtype=np.int64) - np.repeat(starts,
                                                            counts)
    is_media = (span_idx % media_every) == (media_every - 1)

    # text slices: one vectorized kernel per span ordinal k, gathered
    # onto the rows whose span_idx == k
    flat_text = np.full(total, "", dtype=object)
    max_k = int(counts.max()) if len(counts) else 0
    for k in range(max_k):
        sel = np.flatnonzero((span_idx == k) & ~is_media)
        if len(sel) == 0:
            continue
        sliced = pc.utf8_slice_codeunits(text, k * chunk,
                                         (k + 1) * chunk)
        flat_text[sel] = sliced.take(
            pa.array(parent[sel])).to_numpy(zero_copy_only=False)

    id_np = ids.to_numpy(zero_copy_only=False)
    flat_ids = id_np[parent]
    media_ref = np.full(total, "", dtype=object)
    midx = np.flatnonzero(is_media)
    media_ref[midx] = np.char.add(
        np.char.add("media://", flat_ids[midx].astype(str)),
        np.char.add("/", span_idx[midx].astype(str)))
    return {
        "ids": flat_ids, "counts": counts, "span_idx": span_idx,
        "kind": np.where(is_media, "image", "text"),
        "text": flat_text, "media_ref": media_ref,
        "span_offset": span_idx * chunk,
    }


def build_span_docs(ds: ray.data.Dataset, chunk: int = 64,
                    media_every: int = 3) -> ray.data.Dataset:
    """(doc_id, spans) nested span docs from a flat (doc_id, text)
    table: fixed ``chunk``-character text spans, every
    ``media_every``-th span replaced by an image placeholder whose
    ``media_ref`` is ``media://{doc_id}/{span_idx}``. Deterministic and
    SQL-expressible (the driver oracle regenerates the same rows with
    ``unnest(range(ceil(length(text)/chunk)))``)."""
    def emit(batch: pa.Table) -> pa.Table:
        f = _flat_spans_batch(batch, chunk, media_every)
        struct = pa.StructArray.from_arrays(
            [pa.array(f["kind"], pa.string()),
             pa.array(f["text"], pa.string()),
             pa.array(f["media_ref"], pa.string()),
             pa.array(f["span_offset"], pa.int32())],
            fields=list(SPAN_STRUCT))
        offsets = np.zeros(len(batch) + 1, np.int64)
        np.cumsum(f["counts"], out=offsets[1:])
        spans = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), struct)
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.string()),
            "spans": spans,
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def explode_spans(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Nested → flat (doc_id, span_idx, kind, text, media_ref,
    span_offset). Child columns are zero-copy ``flatten()`` views; only
    doc_id is gathered."""
    def emit(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        # span ordinal inside each list from the list offsets
        lens = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        span_idx = (np.arange(int(lens.sum()), dtype=np.int64)
                    - np.repeat(starts, lens))
        return pa.table({
            "doc_id": batch.column("doc_id").take(parent),
            "span_idx": pa.array(span_idx),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "span_offset": pc.cast(flat.field("offset"), pa.int64()),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def span_kind_stats(flat: ray.data.Dataset) -> pd.DataFrame:
    """(kind, n_spans, total_chars): per-block partials, tiny combine."""
    from .relational import partial_groupby

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(_chars=b["text"].str.len())
        return b.groupby("kind", as_index=False).agg(
            n_spans=("span_idx", "size"), total_chars=("_chars", "sum"))

    out = partial_groupby(flat, ["kind"], agg,
                          ["n_spans", "total_chars"])
    out["n_spans"] = out["n_spans"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out.sort_values("kind").reset_index(drop=True)


def regroup_spans(flat: ray.data.Dataset,
                  num_buckets: int = 32) -> ray.data.Dataset:
    """Flat → nested: hash(doc_id) buckets co-locate each document's
    spans, a within-bucket sort restores (doc_id, span_idx) order, and
    the list<struct> column is rebuilt per bucket. No document's spans
    ever leave worker memory.

    Contract: zero-span documents do not survive an explode → regroup
    cycle (explode emits no row for them, exactly like SQL UNNEST);
    every document with ≥1 span round-trips with span-sequence
    equality (kind, text, media_ref, order)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        h = (hash64_batch(batch.column("doc_id").to_pylist())
             % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_db", pa.array(h))

    def rebuild(group: pd.DataFrame) -> pa.Table:
        if group.empty or "doc_id" not in group.columns:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "spans": pa.array([], pa.list_(SPAN_STRUCT))})
        g = group.sort_values(["doc_id", "span_idx"], kind="stable")
        struct = pa.StructArray.from_arrays(
            [pa.array(g["kind"], pa.string()),
             pa.array(g["text"], pa.string()),
             pa.array(g["media_ref"], pa.string()),
             pa.array(g["span_offset"].to_numpy(), pa.int32())],
            fields=list(SPAN_STRUCT))
        ids = g["doc_id"].to_numpy()
        change = np.flatnonzero(np.concatenate(
            ([True], ids[1:] != ids[:-1])))
        offsets = np.concatenate((change, [len(ids)]))
        spans = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), struct)
        return pa.table({"doc_id": pa.array(ids[change], pa.string()),
                         "spans": spans})

    return (flat.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_db").map_groups(rebuild, batch_format="pandas"))


def span_costs(docs: ray.data.Dataset, media_cost: int = 16,
               text_kind: str = "text") -> ray.data.Dataset:
    """Per-document token cost of an interleaved span doc: text spans
    cost their whitespace-token count, media spans a fixed
    ``media_cost`` (the fixed-patch-budget model multimodal trainers
    use). Map-only: ``explode_spans`` keeps every document's spans in
    one block (the explode is per-row), so the per-doc sum completes
    inside the block — no shuffle. Token semantics mirror
    ``textstats.tokenize_ws`` (SQL: split trimmed text on ``\\s+``).
    Output: (doc_id, cost:int64)."""

    def per_block(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("").str.strip()
        ntok = np.where(t == "", 0, t.str.count(r"\s+") + 1)
        cost = np.where(b["kind"].eq(text_kind), ntok,
                        media_cost).astype("int64")
        g = pd.DataFrame({"doc_id": b["doc_id"], "cost": cost})
        return g.groupby("doc_id", as_index=False)["cost"].sum()

    return explode_spans(docs).map_batches(
        per_block, batch_format="pandas", batch_size=None)


def pack_interleaved(docs: ray.data.Dataset, max_tokens: int,
                     media_cost: int = 16,
                     bucket_by_doc: int | None = None,
                     bucket_mod: int | None = None
                     ) -> ray.data.Dataset:
    """Greedy FFD packing of interleaved span documents into training
    sequences of ≤ ``max_tokens`` (text spans cost ws-tokens, media
    spans ``media_cost``). Documents pack ATOMICALLY — a doc's span
    sequence is never split, so the per-row invariant (kind, text,
    media_ref, order) survives packing by construction; docs larger
    than the budget get singleton packs. Packing is per input block
    (deterministic given block contents — the same contract as
    ``corpus.pack_sequences``); ``pack_id`` is the content hash of the
    member ids. Output: (pack_id, doc_ids:list<string>, n_docs,
    total_cost)."""

    def pack_block(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        costs = batch.column("cost").to_pylist()
        order = sorted(range(len(ids)),
                       key=lambda i: (-costs[i], ids[i]))
        packs: list[list] = []
        for i in order:
            c = costs[i]
            placed = False
            for p in packs:
                if p[1] + c <= max_tokens:
                    p[0].append(ids[i])
                    p[1] += c
                    placed = True
                    break
            if not placed:
                packs.append([[ids[i]], c])
        if not packs:
            return pa.table({
                "pack_id": pa.array([], pa.uint64()),
                "doc_ids": pa.array([], pa.list_(pa.string())),
                "n_docs": pa.array([], pa.int32()),
                "total_cost": pa.array([], pa.int64()),
            })
        pack_ids = hash64_batch([",".join(sorted(p[0])) for p in packs])
        return pa.table({
            "pack_id": pa.array(pack_ids),
            "doc_ids": pa.array([sorted(p[0]) for p in packs],
                                pa.list_(pa.string())),
            "n_docs": pa.array([len(p[0]) for p in packs], pa.int32()),
            "total_cost": pa.array([p[1] for p in packs], pa.int64()),
        })

    costs = span_costs(docs, media_cost)
    if bucket_by_doc is not None:
        def add_b(b: pa.Table) -> pa.Table:
            h = (hash64_batch(b.column("doc_id").to_pylist())
                 % np.uint64(bucket_by_doc)).astype(np.int32)
            return b.append_column("_pb", pa.array(h))

        return (costs.map_batches(add_b, batch_format="pyarrow")
                .groupby("_pb").map_groups(pack_block,
                                           batch_format="pyarrow"))
    if bucket_mod is not None:
        # SQL-replayable deterministic bucketing (numeric-string doc
        # ids): int(doc_id) % mod — the oracle twin's recursive-CTE
        # FFD replay groups by the same modulus
        def add_m(b: pa.Table) -> pa.Table:
            pb = [int(d) % bucket_mod
                  for d in b.column("doc_id").to_pylist()]
            return b.append_column("_pb", pa.array(pb, pa.int32()))

        return (costs.map_batches(add_m, batch_format="pyarrow")
                .groupby("_pb").map_groups(pack_block,
                                           batch_format="pyarrow"))
    return costs.map_batches(
        pack_block, batch_format="pyarrow", batch_size=None)


def _flat_view(batch: pa.Table):
    """(parent, lens, starts, span_idx, flat) numpy/arrow views of one
    nested block — the shared prologue of the map-only span kernels.
    Child buffers stay zero-copy; only the int index arrays are new."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(spans).to_numpy(
        zero_copy_only=False).astype(np.int64)
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(lens.sum())
    span_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    return parent, lens, starts, span_idx, spans.flatten()


def span_transitions(docs: ray.data.Dataset) -> pd.DataFrame:
    """Kind-transition counts over adjacent spans WITHIN each document:
    (prev_kind, next_kind, n_pairs). Shuffle-free — a document's spans
    live in one list element of one block, so every adjacent pair is
    visible to the block that holds it; blocks emit O(kinds²) partial
    rows and the driver folds them (the Markov-shape analogue of
    ``events.event_transitions``, lifted to the nested payload)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        parent, _, _, _, flat = _flat_view(batch)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        if len(kind) < 2:
            return pd.DataFrame({"prev_kind": [], "next_kind": [],
                                 "n_pairs": []})
        same = parent[1:] == parent[:-1]
        g = pd.DataFrame({"prev_kind": kind[:-1][same],
                          "next_kind": kind[1:][same]})
        return g.groupby(["prev_kind", "next_kind"],
                         as_index=False).size().rename(
                             columns={"size": "n_pairs"})

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if partials.empty:
        return pd.DataFrame({"prev_kind": pd.Series([], dtype=str),
                             "next_kind": pd.Series([], dtype=str),
                             "n_pairs": pd.Series([], dtype="int64")})
    out = partials.groupby(["prev_kind", "next_kind"],
                           as_index=False)["n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["prev_kind", "next_kind"]).reset_index(
        drop=True)


def media_captions(docs: ray.data.Dataset, text_kind: str = "text",
                   media_kind: str = "image") -> ray.data.Dataset:
    """Caption-pair mining over the interleaved payload: one row per
    media span with the NEAREST preceding and following text spans in
    the same document — (doc_id, span_idx, media_ref, prev_text,
    next_text), '' when no text span exists on that side. This is the
    image-text-pair extraction a multimodal training corpus needs
    (interleaved doc → (image, caption) candidates). Map-only: nearest
    neighbours are per-document and a document never spans blocks, so
    two accumulate passes over the block resolve every lookup — no
    shuffle, no per-row Python."""

    def emit(batch: pa.Table) -> pa.Table:
        parent, lens, starts, span_idx, flat = _flat_view(batch)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        text = flat.field("text").to_numpy(zero_copy_only=False)
        n = len(kind)
        empty = pa.table({
            "doc_id": pa.array([], pa.string()),
            "span_idx": pa.array([], pa.int64()),
            "media_ref": pa.array([], pa.string()),
            "prev_text": pa.array([], pa.string()),
            "next_text": pa.array([], pa.string())})
        if n == 0:
            return empty
        is_text = kind == text_kind
        idx = np.arange(n, dtype=np.int64)
        doc_start = starts[parent]
        doc_end = doc_start + lens[parent]
        # nearest text at-or-before i (monotone indices ⇒ a carried
        # value ≥ doc_start is inside this doc)
        prev_i = np.maximum.accumulate(np.where(is_text, idx, -1))
        prev_ok = prev_i >= doc_start
        nxt_i = np.minimum.accumulate(
            np.where(is_text, idx, n)[::-1])[::-1]
        next_ok = nxt_i < doc_end
        sel = np.flatnonzero(kind == media_kind)
        if len(sel) == 0:
            return empty
        prev_txt = np.where(prev_ok[sel],
                            text[np.clip(prev_i[sel], 0, n - 1)], "")
        next_txt = np.where(next_ok[sel],
                            text[np.clip(nxt_i[sel], 0, n - 1)], "")
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"),
                              pa.string()).take(pa.array(parent[sel])),
            "span_idx": pa.array(span_idx[sel]),
            "media_ref": flat.field("media_ref").take(pa.array(sel)),
            "prev_text": pa.array(prev_txt, pa.string()),
            "next_text": pa.array(next_txt, pa.string()),
        })

    return docs.map_batches(emit, batch_format="pyarrow")


def span_doc_profile(docs: ray.data.Dataset,
                     media_kind: str = "image") -> ray.data.Dataset:
    """Per-document interleave profile: (doc_id, n_spans, n_media,
    text_chars, n_runs) where ``n_runs`` counts maximal same-kind runs
    (1 + within-doc kind changes) — the alternation signal interleaved-
    corpus curators filter on (pure-text docs have n_runs=1). Map-only
    segment arithmetic per block; zero-span documents drop out exactly
    like SQL UNNEST. Output stays a Dataset (O(docs) rows)."""

    def emit(batch: pa.Table) -> pa.Table:
        parent, lens, _, _, flat = _flat_view(batch)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        ndocs = len(lens)
        tc = pc.utf8_length(flat.field("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_media = np.bincount(parent, weights=(kind == media_kind),
                              minlength=ndocs).astype(np.int64)
        text_chars = np.bincount(parent, weights=tc,
                                 minlength=ndocs).astype(np.int64)
        if len(kind) >= 2:
            chg = (parent[1:] == parent[:-1]) & (kind[1:] != kind[:-1])
            changes = np.bincount(parent[1:][chg],
                                  minlength=ndocs).astype(np.int64)
        else:
            changes = np.zeros(ndocs, np.int64)
        keep = lens > 0
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"),
                              pa.string()).filter(pa.array(keep)),
            "n_spans": pa.array(lens[keep]),
            "n_media": pa.array(n_media[keep]),
            "text_chars": pa.array(text_chars[keep]),
            "n_runs": pa.array((changes + 1)[keep]),
        })

    return docs.map_batches(emit, batch_format="pyarrow")


def rechunk_spans(docs: ray.data.Dataset, chunk: int,
                  text_kind: str = "text") -> ray.data.Dataset:
    """Re-segment the interleaved payload at a new text width: maximal
    runs of consecutive text spans are concatenated and re-sliced into
    ``chunk``-char spans; media spans pass through untouched and keep
    their position between runs. The per-doc invariants (pytest-gated):
    the concatenation of text spans is byte-identical before/after, the
    media (kind, media_ref) subsequence is preserved in order, every
    output text span is ≤ ``chunk`` chars (== ``chunk`` except run
    tails), and the op is idempotent at a fixed width. ``offset`` is
    recomputed as the cumulative text-char position within the doc
    (media contribute 0 — the original hole widths are not recoverable
    generically). Map-only: runs never cross blocks because documents
    don't; the concat and slicing are Arrow kernels (``binary_join``,
    ``utf8_slice_codeunits``) — no per-row Python."""

    def emit(batch: pa.Table) -> pa.Table:
        parent, lens, _, _, flat = _flat_view(batch)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        n = len(kind)
        ndocs = len(lens)
        empty = pa.table({"doc_id": pa.array([], pa.string()),
                          "spans": pa.array([], pa.list_(SPAN_STRUCT))})
        if n == 0:
            return empty
        is_text = kind == text_kind
        new_run = np.ones(n, bool)
        new_run[1:] = ((parent[1:] != parent[:-1])
                       | (is_text[1:] != is_text[:-1])
                       | ~is_text[:-1])
        new_run |= ~is_text            # every non-text span is its own run
        run_starts = np.flatnonzero(new_run)
        nruns = len(run_starts)
        run_parent = parent[run_starts]
        run_is_text = is_text[run_starts]
        offsets = np.concatenate([run_starts,
                                  [n]]).astype(np.int64)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     flat.field("text")),
            pa.scalar("", pa.string()))
        run_chars = pc.utf8_length(joined).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.where(run_is_text, -(-run_chars // chunk), 1)
        total = int(counts.sum())
        if total == 0:
            return empty
        rstart = np.zeros(nruns, np.int64)
        np.cumsum(counts[:-1], out=rstart[1:])
        erun = np.repeat(np.arange(nruns, dtype=np.int64), counts)
        ordinal = np.arange(total, dtype=np.int64) - rstart[erun]
        etext_run = run_is_text[erun]
        out_text = np.full(total, "", dtype=object)
        max_k = int(counts[run_is_text].max()) if run_is_text.any() else 0
        for k in range(max_k):
            sel = np.flatnonzero(etext_run & (ordinal == k))
            if len(sel) == 0:
                continue
            sliced = pc.utf8_slice_codeunits(joined, k * chunk,
                                             (k + 1) * chunk)
            out_text[sel] = sliced.take(
                pa.array(erun[sel])).to_numpy(zero_copy_only=False)
        out_kind = kind[run_starts][erun]
        out_ref = flat.field("media_ref").to_numpy(
            zero_copy_only=False)[run_starts][erun]
        out_ref = np.where(etext_run, "", out_ref)
        # cumulative text-char offset within each doc
        contrib = np.fromiter((len(t) for t in out_text),
                              np.int64, total) if total else np.zeros(
                                  0, np.int64)
        contrib = np.where(etext_run, contrib, 0)
        cum = np.cumsum(contrib) - contrib
        eparent = run_parent[erun]
        doc_counts = np.bincount(eparent, minlength=ndocs)
        dstart = np.zeros(ndocs, np.int64)
        np.cumsum(doc_counts[:-1], out=dstart[1:])
        offset_in_doc = cum - cum[dstart[eparent]]
        struct = pa.StructArray.from_arrays(
            [pa.array(out_kind, pa.string()),
             pa.array(out_text, pa.string()),
             pa.array(out_ref, pa.string()),
             pa.array(offset_in_doc.astype(np.int32))],
            fields=list(SPAN_STRUCT))
        keep = doc_counts > 0
        list_off = np.concatenate(
            [[0], np.cumsum(doc_counts[keep])]).astype(np.int32)
        spans = pa.ListArray.from_arrays(pa.array(list_off), struct)
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"),
                              pa.string()).filter(pa.array(keep)),
            "spans": spans})

    return docs.map_batches(emit, batch_format="pyarrow")


def span_dedup_counts(flat: ray.data.Dataset,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Cross-document exact span dedup over the interleaved corpus
    (CCNet-style paragraph dedup applied to span docs): every TEXT
    span that repeats anywhere in the corpus keeps only its first
    occurrence — winner = lowest ``(doc, span_idx)`` — and media
    spans always survive. Returns the per-document audit table
    (doc_id, n_kept, n_dropped).

    Scale shape: text spans ship as a SKINNY (text, doc, idx) triple
    hash-bucketed by span text (ONE shuffle; same economics as the
    exact-dedup operator — the winner rule is a per-group min, so
    blocks could pre-reduce duplicates first); inside a bucket the
    winner test is one sort + shift, no Python loop. Media counts are
    map-only partials. Both partial streams union into one skinny
    per-doc combine; nothing corpus-sized reaches the driver (the
    result is O(docs) — write-through for a 100-TB corpus).
    """
    from .relational import partial_groupby
    from .windows import _add_key_bucket

    text_spans = flat.filter(expr="kind == 'text'") \
        .select_columns(["doc_id", "span_idx", "text"])

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(_d=group["doc_id"].astype("int64")) \
            .sort_values(["text", "_d", "span_idx"], kind="stable")
        first = g["text"].ne(g["text"].shift())
        out = (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "_k": first.to_numpy()})
               .groupby("doc_id", as_index=False)
               .agg(n_kept=("_k", "sum"), n_all=("_k", "size")))
        out["n_dropped"] = out["n_all"] - out["n_kept"]
        return out[["doc_id", "n_kept", "n_dropped"]]

    text_parts = (_add_key_bucket(text_spans, "text", num_buckets)
                  .groupby("_sbucket")
                  .map_groups(per_bucket, batch_format="pandas"))

    def media_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b.loc[b["kind"] != "text"]
        out = (m.groupby("doc_id", as_index=False)
               .agg(n_kept=("span_idx", "size")))
        out["n_dropped"] = 0
        return out

    media_parts = flat.select_columns(["doc_id", "kind", "span_idx"]) \
        .map_batches(media_partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", as_index=False).agg(
            n_kept=("n_kept", "sum"), n_dropped=("n_dropped", "sum"))

    out = partial_groupby(text_parts.union(media_parts), ["doc_id"],
                          combine, ["n_kept", "n_dropped"],
                          distributed_combine=True).to_pandas()
    out = out.drop(columns=["_pb"], errors="ignore")
    out["n_kept"] = out["n_kept"].astype("int64")
    out["n_dropped"] = out["n_dropped"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def span_delta_counts(old_flat: ray.data.Dataset,
                      new_flat: ray.data.Dataset,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Incremental-crawl delta audit: per document, how many spans the
    re-crawl added / removed / left unchanged — an exact MULTISET diff
    over the span value triple (kind, text, media_ref), the span-level
    analogue of the engine's CDC merge (a page whose text shifted by
    one sentence reports mostly-unchanged spans, not a full rewrite).

    Scale shape: both crawls' exploded span streams union with a
    0/1 side tag and meet in ONE doc-hash bucket shuffle (each
    document's diff is independent); inside the bucket the multiset
    intersection is a single grouped sum over the value triple —
    ``unchanged = Σ min(c_old, c_new)`` — with no pairwise alignment.
    Output: (doc_id, n_added, n_removed, n_unchanged), O(docs) rows.
    """
    from .windows import _add_key_bucket

    def tag(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = b[["doc_id", "kind", "text", "media_ref"]].copy()
            out["_side"] = np.int8(side)
            return out
        return f

    both = (old_flat.map_batches(tag(0), batch_format="pandas")
            .union(new_flat.map_batches(tag(1),
                                        batch_format="pandas")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.assign(_o=(g["_side"] == 0).astype("int64"),
                      _n=(g["_side"] == 1).astype("int64"))
             .groupby(["doc_id", "kind", "text", "media_ref"],
                      as_index=False)[["_o", "_n"]].sum())
        c["_u"] = np.minimum(c["_o"], c["_n"])
        d = c.groupby("doc_id", as_index=False)[["_o", "_n", "_u"]] \
            .sum()
        return pd.DataFrame({
            "doc_id": d["doc_id"],
            "n_added": (d["_n"] - d["_u"]).astype("int64"),
            "n_removed": (d["_o"] - d["_u"]).astype("int64"),
            "n_unchanged": d["_u"].astype("int64")})

    out = (_add_key_bucket(both, "doc_id", num_buckets)
           .groupby("_sbucket")
           .map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def span_dedup_filter(flat: ray.data.Dataset,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """The FILTER form of cross-document span dedup: returns the
    surviving flat spans themselves (first occurrence of every text
    span value by ``(doc, span_idx)``, media spans untouched) instead
    of the audit counts — the stage a training-corpus build actually
    inserts before re-chunking/packing. Same single text-hash bucket
    shuffle as :func:`span_dedup_counts`; the winner test inside a
    bucket is one sort + shift. Output schema = the exploded span
    schema; stays a Dataset end-to-end (no driver hop)."""
    cols = ["doc_id", "span_idx", "kind", "text", "media_ref",
            "span_offset"]
    from .windows import _add_key_bucket

    text_spans = flat.filter(expr="kind == 'text'") \
        .select_columns(cols)

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.assign(_d=g["doc_id"].astype("int64")) \
            .sort_values(["text", "_d", "span_idx"], kind="stable")
        first = g2["text"].ne(g2["text"].shift())
        return g2.loc[first, cols]

    kept_text = (_add_key_bucket(text_spans, "text", num_buckets)
                 .groupby("_sbucket")
                 .map_groups(winners, batch_format="pandas"))
    media = flat.filter(expr="kind != 'text'").select_columns(cols)
    return kept_text.union(media)


def render_text_with_media_tokens(
        flat: ray.data.Dataset,
        media_token: str = "<image>") -> ray.data.Dataset:
    """Project the interleaved payload to a text-only LM view: per
    document, concatenate spans in order with every media span
    replaced by a fixed placeholder token — how multimodal corpora
    feed text-only pretraining. Map-only (explode keeps a document's
    spans in one block): one vectorized selection + a grouped ordered
    join per block; SQL twin is ``string_agg(… ORDER BY span_idx)``.
    Output: (doc_id, rendered)."""
    def per_block(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["doc_id", "span_idx"], kind="stable")
        piece = np.where(g["kind"].to_numpy() == "text",
                         g["text"].to_numpy(), media_token)
        out = (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "_p": piece})
               .groupby("doc_id", sort=False)["_p"]
               .agg("".join).reset_index()
               .rename(columns={"_p": "rendered"}))
        return out

    return flat.map_batches(per_block, batch_format="pandas",
                            batch_size=None)


def span_truncate_stats(flat: ray.data.Dataset, budget: int = 200,
                        media_chars: int = 16) -> ray.data.Dataset:
    """Token-budget prefix truncation of the interleaved span stream:
    keep each document's spans in order while the running cost
    (text-span character length; ``media_chars`` per media span) stays
    ≤ ``budget`` — the context-window packing rule applied per doc.
    Costs are non-negative, so 'cumsum ≤ budget' IS the prefix rule
    (first overflow excludes everything after it, including zero-cost
    spans). Map-only: explode keeps a document's spans in one block;
    one grouped cumsum decides every span in the block at once.

    Output: (doc_id, n_spans_kept, chars_kept, n_media_kept) per doc
    with at least one kept span.
    """
    def per_block(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["doc_id", "span_idx"], kind="stable")
        is_text = g["kind"].to_numpy() == "text"
        cost = np.where(is_text, g["text"].str.len().to_numpy(),
                        media_chars).astype("int64")
        cum = (pd.Series(cost, index=g.index)
               .groupby(g["doc_id"], sort=False).cumsum())
        keep = cum.to_numpy() <= budget
        kept = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[keep],
            "_chars": np.where(is_text, cost, 0)[keep],
            "_media": (~is_text).astype("int64")[keep]})
        out = kept.groupby("doc_id", as_index=False).agg(
            n_spans_kept=("_chars", "size"),
            chars_kept=("_chars", "sum"),
            n_media_kept=("_media", "sum"))
        for c in ("n_spans_kept", "chars_kept", "n_media_kept"):
            out[c] = out[c].astype("int64")
        return out

    return flat.map_batches(per_block, batch_format="pandas",
                            batch_size=None)
