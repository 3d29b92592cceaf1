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


def _hand_docs(rows):
    """Nested span-doc Dataset from [(doc_id, [(kind, text, ref), ...])]
    — arbitrary kind sequences (consecutive media, media at the edges)
    the deterministic builder can't produce."""
    from web2llmstxt_ray.schema import SPAN_STRUCT
    ids, spans = [], []
    for did, sp in rows:
        ids.append(did)
        spans.append([{"kind": k, "text": t, "media_ref": r,
                       "offset": 64 * i}
                      for i, (k, t, r) in enumerate(sp)])
    t = pa.table({"doc_id": pa.array(ids, pa.string()),
                  "spans": pa.array(spans, pa.list_(SPAN_STRUCT))})
    return ray.data.from_arrow(t)


class TestSpanAnalytics:
    def test_transitions_vs_oracle(self):
        from web2llmstxt_ray.ops.nested import span_transitions
        t = _docs_table(n=50, seed=13)
        got = span_transitions(
            build_span_docs(ray.data.from_arrow(t).repartition(6)))
        f = _oracle_flat(t).sort_values(["doc_id", "span_idx"])
        prev = f.groupby("doc_id")["kind"].shift(1)
        w = pd.DataFrame({"prev_kind": prev, "next_kind": f["kind"]})
        want = (w.dropna().groupby(["prev_kind", "next_kind"],
                                   as_index=False).size()
                .rename(columns={"size": "n_pairs"})
                .astype({"n_pairs": "int64"})
                .sort_values(["prev_kind", "next_kind"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_captions_nearest_text_generic(self):
        """Nearest-text (not immediate-neighbour) semantics: media runs
        skip over adjacent media; edge media get '' on the open side;
        a doc with no text spans yields '' both sides. Docs are laid
        out in ONE block to prove per-doc isolation of the accumulate
        passes (no bleed between adjacent docs)."""
        from web2llmstxt_ray.ops.nested import media_captions
        docs = _hand_docs([
            ("a", [("image", "", "m0"),          # leading media
                   ("text", "alpha", ""),
                   ("image", "", "m1"),
                   ("image", "", "m2"),          # consecutive media
                   ("text", "beta", ""),
                   ("image", "", "m3")]),        # trailing media
            ("b", [("image", "", "m4")]),        # media-only doc
            ("c", [("text", "gamma", "")]),      # text-only doc
        ]).repartition(1)
        got = (media_captions(docs).to_pandas()
               .sort_values(["doc_id", "span_idx"])
               .reset_index(drop=True))
        want = pd.DataFrame({
            "doc_id": ["a", "a", "a", "a", "b"],
            "span_idx": [0, 2, 3, 5, 0],
            "media_ref": ["m0", "m1", "m2", "m3", "m4"],
            "prev_text": ["", "alpha", "alpha", "beta", ""],
            "next_text": ["alpha", "beta", "beta", "", ""],
        })
        got["span_idx"] = got["span_idx"].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_captions_builder_docs(self):
        """On builder docs every media span sits between two text spans
        (or at the tail): prev = span i-1's text, next = span i+1's."""
        from web2llmstxt_ray.ops.nested import media_captions
        t = _docs_table(n=40, seed=21)
        got = (media_captions(
            build_span_docs(ray.data.from_arrow(t).repartition(5)))
            .to_pandas().sort_values(["doc_id", "span_idx"])
            .reset_index(drop=True))
        f = _oracle_flat(t).sort_values(["doc_id", "span_idx"])
        g = f.groupby("doc_id")
        w = f.assign(prev_text=g["text"].shift(1).fillna(""),
                     next_text=g["text"].shift(-1).fillna(""))
        want = (w[w["kind"] == "image"]
                [["doc_id", "span_idx", "media_ref", "prev_text",
                  "next_text"]].reset_index(drop=True))
        got["span_idx"] = got["span_idx"].astype("int64")
        want["span_idx"] = want["span_idx"].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_doc_profile(self):
        from web2llmstxt_ray.ops.nested import span_doc_profile
        t = _docs_table(n=45, seed=29)
        got = (span_doc_profile(
            build_span_docs(ray.data.from_arrow(t).repartition(4)))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        f = _oracle_flat(t).sort_values(["doc_id", "span_idx"])
        g = f.groupby("doc_id")
        runs = (f["kind"] != g["kind"].shift(1)).groupby(
            f["doc_id"]).sum()
        want = pd.DataFrame({
            "doc_id": runs.index,
            "n_spans": g.size().values,
            "n_media": (f["kind"] == "image").groupby(
                f["doc_id"]).sum().values,
            "text_chars": f["text"].str.len().groupby(
                f["doc_id"]).sum().values,
            "n_runs": runs.values,
        }).astype({"n_spans": "int64", "n_media": "int64",
                   "text_chars": "int64", "n_runs": "int64"})
        want = want.sort_values("doc_id").reset_index(drop=True)
        for c in ("n_spans", "n_media", "text_chars", "n_runs"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_profile_runs_generic(self):
        from web2llmstxt_ray.ops.nested import span_doc_profile
        docs = _hand_docs([
            ("a", [("text", "x", ""), ("text", "y", ""),
                   ("image", "", "m"), ("image", "", "n"),
                   ("text", "z", "")]),        # runs: tt|ii|t → 3
            ("b", [("text", "only", "")]),      # 1 run
        ])
        got = (span_doc_profile(docs).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["n_runs"].tolist() == [3, 1]
        assert got["n_media"].tolist() == [2, 0]
        assert got["n_spans"].tolist() == [5, 1]
        assert got["text_chars"].tolist() == [3, 4]


class TestRechunk:
    def _concat_and_media(self, nested_rows):
        """Per-doc (joined text, [(kind, media_ref) media subsequence])."""
        out = {}
        for r in nested_rows:
            txt = "".join(s["text"] for s in r["spans"]
                          if s["kind"] == "text")
            med = [(s["kind"], s["media_ref"]) for s in r["spans"]
                   if s["kind"] != "text"]
            out[r["doc_id"]] = (txt, med)
        return out

    def test_invariants(self):
        from web2llmstxt_ray.ops.nested import rechunk_spans
        t = _docs_table(n=60, seed=17)
        nested = build_span_docs(ray.data.from_arrow(t).repartition(5))
        before = self._concat_and_media(nested.take_all())
        re96 = rechunk_spans(nested, 96)
        rows = re96.take_all()
        after = self._concat_and_media(rows)
        before = {k: v for k, v in before.items() if v[0] or v[1]}
        assert set(after) == set(before)
        for did in before:
            assert after[did][0] == before[did][0]      # text concat
            assert after[did][1] == before[did][1]      # media order
        for r in rows:
            offs, cum = [], 0
            for s in r["spans"]:
                if s["kind"] == "text":
                    assert 1 <= len(s["text"]) <= 96
                    assert s["media_ref"] == ""
                offs.append(s["offset"])
                assert s["offset"] == cum
                cum += len(s["text"])
            # run-tail rule: every text span except a run tail is full
            spans = r["spans"]
            for i, s in enumerate(spans):
                if (s["kind"] == "text" and i + 1 < len(spans)
                        and spans[i + 1]["kind"] == "text"):
                    assert len(s["text"]) == 96

    def test_idempotent_and_partition_invariant(self):
        from web2llmstxt_ray.ops.nested import rechunk_spans
        t = _docs_table(n=40, seed=23)
        nested = build_span_docs(ray.data.from_arrow(t))

        def key(ds):
            return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"],
                                   s["offset"]) for s in r["spans"]]
                    for r in ds.take_all()}

        once = rechunk_spans(nested, 80)
        twice = rechunk_spans(once, 80)
        assert key(once) == key(twice)
        a = rechunk_spans(build_span_docs(
            ray.data.from_arrow(t).repartition(1)), 80)
        b = rechunk_spans(build_span_docs(
            ray.data.from_arrow(t).repartition(7)), 80)
        assert key(a) == key(b)

    def test_generic_media_runs(self):
        """Consecutive media and edge media survive in place; text runs
        around them re-slice independently."""
        from web2llmstxt_ray.ops.nested import rechunk_spans
        docs = _hand_docs([
            ("a", [("image", "", "m0"),
                   ("text", "x" * 5, ""), ("text", "y" * 5, ""),
                   ("image", "", "m1"), ("image", "", "m2"),
                   ("text", "z" * 3, "")]),
        ])
        got = rechunk_spans(docs, 4).take_all()[0]
        seq = [(s["kind"], s["text"], s["media_ref"])
               for s in got["spans"]]
        assert seq == [("image", "", "m0"),
                       ("text", "xxxx", ""), ("text", "xyyy", ""),
                       ("text", "yy", ""),
                       ("image", "", "m1"), ("image", "", "m2"),
                       ("text", "zzz", "")]
