"""Nested interleaved-span operators: build/explode/regroup round-trip
(the span-sequence-equality invariant: kind, text, media_ref, order),
vectorized build vs a sequential oracle, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.nested import (
    build_span_docs, explode_spans, regroup_spans, span_kind_stats)


def _docs_table(n=40, seed=7):
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n):
        ln = int(rng.randint(0, 400))
        texts.append("".join(chr(rng.randint(97, 123))
                             for _ in range(ln)))
    texts[3] = ""                          # zero-span doc
    texts[5] = "héllo wörld ünïcode " * 9  # non-ascii: char semantics
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})


def _oracle_flat(t: pa.Table, chunk=64, media_every=3) -> pd.DataFrame:
    """Sequential per-row reference for the span synthesis."""
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        n = -(-len(text) // chunk)
        for i in range(n):
            media = (i % media_every) == (media_every - 1)
            rows.append({
                "doc_id": str(did), "span_idx": i,
                "kind": "image" if media else "text",
                "text": "" if media else text[i * chunk:(i + 1) * chunk],
                "media_ref": f"media://{did}/{i}" if media else "",
                "span_offset": i * chunk,
            })
    return pd.DataFrame(rows, columns=["doc_id", "span_idx", "kind",
                                       "text", "media_ref",
                                       "span_offset"])


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["doc_id", "span_idx"])
            .reset_index(drop=True))


class TestBuildExplode:
    def test_matches_sequential_oracle(self):
        t = _docs_table()
        ds = ray.data.from_arrow(t).repartition(4)
        flat = _sorted(explode_spans(build_span_docs(ds)).to_pandas())
        want = _sorted(_oracle_flat(t))
        pd.testing.assert_frame_equal(
            flat.astype({"span_idx": "int64", "span_offset": "int64"}),
            want.astype({"span_idx": "int64", "span_offset": "int64"}))

    def test_partition_invariant(self):
        t = _docs_table(seed=11)
        a = _sorted(explode_spans(build_span_docs(
            ray.data.from_arrow(t).repartition(1))).to_pandas())
        b = _sorted(explode_spans(build_span_docs(
            ray.data.from_arrow(t).repartition(7))).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    def test_kind_stats(self):
        t = _docs_table()
        flat = explode_spans(build_span_docs(ray.data.from_arrow(t)))
        got = span_kind_stats(flat)
        want = (_oracle_flat(t).assign(
            _chars=lambda d: d["text"].str.len())
            .groupby("kind", as_index=False)
            .agg(n_spans=("span_idx", "size"),
                 total_chars=("_chars", "sum")))
        got = got.sort_values("kind").reset_index(drop=True)
        want = want.sort_values("kind").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, want.astype({"n_spans": "int64",
                              "total_chars": "int64"}))


class TestRoundTrip:
    def test_explode_regroup_identity(self):
        """Span-sequence equality (kind, text, media_ref, order) after
        a full explode → shuffle → regroup cycle."""
        t = _docs_table(n=60, seed=3)
        nested = build_span_docs(ray.data.from_arrow(t).repartition(5))
        original = {r["doc_id"]: r["spans"]
                    for r in nested.take_all()}
        back = regroup_spans(explode_spans(nested), num_buckets=8)
        got = {r["doc_id"]: r["spans"] for r in back.take_all()}
        # zero-span docs don't survive explode (UNNEST semantics)
        original = {k: v for k, v in original.items() if len(v)}
        assert set(got) == set(original)
        for did, spans in original.items():
            g = got[did]
            assert [s["kind"] for s in g] == [s["kind"] for s in spans]
            assert [s["text"] for s in g] == [s["text"] for s in spans]
            assert ([s["media_ref"] for s in g]
                    == [s["media_ref"] for s in spans])
            assert ([s["offset"] for s in g]
                    == [s["offset"] for s in spans])
