"""Edge-case tests for the sixth-wave operators (containment pairs,
quality-aware exact dedup, leakage-safe split, span truncation,
source-signature terms)."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.corpus import leakage_safe_split
from web2llmstxt_ray.ops.dedup import containment_pairs, exact_dedup_best
from web2llmstxt_ray.ops.nested import span_truncate_stats
from web2llmstxt_ray.ops.textstats import source_signature_terms


def _grams(text: str, n: int) -> set:
    ws = text.split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


class TestContainmentPairs:
    def test_quote_has_high_containment_low_jaccard(self):
        quote = "alpha beta gamma delta epsilon"
        long = ("zero one two three four five six seven eight nine "
                + quote + " ten eleven twelve thirteen fourteen")
        df = pd.DataFrame({"doc_id": np.int64([1, 2]),
                           "text": [quote, long]})
        out = (containment_pairs(ray.data.from_pandas(df), n=3,
                                 tau=0.9).to_pandas()
               .sort_values(["a", "b"]).reset_index(drop=True))
        # the quote is fully contained: containment(1 in 2) = 1.0,
        # but the reverse direction is far below tau
        assert out["a"].tolist() == [1]
        assert out["b"].tolist() == [2]
        assert out["containment"].iloc[0] == 1.0

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(17)
        vocab = np.array(list("abcdefghij"))
        texts = [" ".join(rng.choice(vocab, 20)) for _ in range(30)]
        df = pd.DataFrame({"doc_id": np.arange(30, dtype="int64"),
                           "text": texts})
        out = (containment_pairs(
            ray.data.from_pandas(df).repartition(5), n=2,
            tau=0.15).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
        exp = []
        for a in range(30):
            ga = _grams(texts[a], 2)
            for b in range(30):
                if a == b:
                    continue
                inter = len(ga & _grams(texts[b], 2))
                c = inter / len(ga)
                if c >= 0.15:
                    exp.append((a, b, inter, len(ga), c))
        exp_df = pd.DataFrame(exp, columns=["a", "b", "inter",
                                            "a_total", "containment"])
        assert len(out) == len(exp_df) > 0
        got = out.astype({"a": int, "b": int}).round(9)
        exp_r = exp_df.round(9)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            exp_r.astype({"inter": "int64", "a_total": "int64"})
            .reset_index(drop=True), check_dtype=False)

    def test_hot_gram_cap_drops_stopword_grams(self):
        # every doc shares the same bigram; capped run finds nothing
        df = pd.DataFrame({
            "doc_id": np.arange(10, dtype="int64"),
            "text": [f"the same w{i} w{i + 1} w{i + 2}"
                     for i in range(10)]})
        # tau=0.4 needs 2 of a doc's 4 bigrams: neighbors share the
        # hot 'the same' plus one chain bigram; capping the hot gram
        # leaves them at 1/4 < tau
        full = containment_pairs(ray.data.from_pandas(df), n=2,
                                 tau=0.4).to_pandas()
        capped = containment_pairs(ray.data.from_pandas(df), n=2,
                                   tau=0.4,
                                   max_gram_df=3).to_pandas()
        assert len(full) > 0
        assert len(capped) == 0


class TestExactDedupBest:
    def test_highest_quality_wins_ties_lowest_id(self):
        df = pd.DataFrame({
            "doc_id": np.int64([1, 2, 3, 4, 5]),
            "text": ["x", "x", "x", "y", "y"],
            "q": np.int64([5, 9, 9, 7, 7])})
        out = exact_dedup_best(
            ray.data.from_pandas(df).repartition(3), "q")
        # 'x': quality 9 tie between 2 and 3 -> id 2; 'y': tie -> id 4
        assert out["doc_id"].tolist() == [2, 4]
        assert out["q"].tolist() == [9, 7]

    def test_partition_invariant(self):
        rng = np.random.default_rng(23)
        df = pd.DataFrame({
            "doc_id": np.arange(200, dtype="int64"),
            "text": [f"t{v}" for v in rng.integers(0, 40, 200)],
            "q": rng.integers(0, 10, 200).astype("int64")})
        a = exact_dedup_best(ray.data.from_pandas(df).repartition(1),
                             "q")
        b = exact_dedup_best(ray.data.from_pandas(df).repartition(11),
                             "q")
        pd.testing.assert_frame_equal(a, b)


class TestLeakageSafeSplit:
    def test_copies_never_straddle_and_rule_matches(self):
        df = pd.DataFrame({
            "doc_id": np.int64([1, 2, 3, 4, 5, 6]),
            "text": ["a", "b", "a", "c", "b", "a"]})
        out = (leakage_safe_split(
            ray.data.from_pandas(df).repartition(4))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        by_text = df.merge(out, on="doc_id")
        assert (by_text.groupby("text")["split"].nunique() == 1).all()
        # rule replay: root of 'a' cluster is 1
        exp = ("train" if int(hashlib.md5(b"1").hexdigest()[:8], 16)
               % 100 < 80 else "test")
        assert by_text.loc[by_text["text"] == "a", "split"].iloc[0] == exp


class TestSpanTruncate:
    def test_prefix_rule_and_overflow(self):
        flat = pd.DataFrame({
            "doc_id": ["d"] * 4,
            "span_idx": np.int64([0, 1, 2, 3]),
            "kind": ["text", "text", "image", "text"],
            "text": ["x" * 64, "y" * 64, "", "z" * 30],
        })
        # budget 150: 64 + 64 = 128 ok; +16 media = 144 ok; +30 = 174 > 150
        out = span_truncate_stats(ray.data.from_pandas(flat),
                                  budget=150, media_chars=16).to_pandas()
        r = out.iloc[0]
        assert (r["n_spans_kept"], r["chars_kept"],
                r["n_media_kept"]) == (3, 128, 1)

    def test_zero_cost_span_after_overflow_is_dropped(self):
        flat = pd.DataFrame({
            "doc_id": ["d"] * 3,
            "span_idx": np.int64([0, 1, 2]),
            "kind": ["text", "text", "image"],
            "text": ["a" * 64, "b" * 64, ""],
        })
        # budget 100: span 1 overflows; the FREE media span after it
        # must not sneak in (prefix semantics)
        out = span_truncate_stats(ray.data.from_pandas(flat),
                                  budget=100, media_chars=0).to_pandas()
        r = out.iloc[0]
        assert (r["n_spans_kept"], r["n_media_kept"]) == (1, 0)

    def test_doc_with_no_kept_spans_absent(self):
        flat = pd.DataFrame({
            "doc_id": ["big"], "span_idx": np.int64([0]),
            "kind": ["text"], "text": ["w" * 64]})
        out = span_truncate_stats(ray.data.from_pandas(flat),
                                  budget=10).to_pandas()
        assert len(out) == 0


class TestSourceSignatureTerms:
    def test_planted_signature_token(self):
        rows = []
        for i in range(40):
            rows.append(("s1", "common words here plus zebra zebra"))
            rows.append(("s2", "common words here plus filler extra"))
        df = pd.DataFrame(rows, columns=["source", "text"])
        # zebra is exactly 2.0x overrepresented (lift = N/n_g = 2):
        # the strict > at ratio 2/1 excludes the boundary, 3/2 keeps it
        out = source_signature_terms(
            ray.data.from_pandas(df).repartition(6),
            min_count=5, ratio_num=3, ratio_den=2)
        assert ("zebra" in out["token"].tolist())
        z = out[out["token"] == "zebra"].iloc[0]
        assert z["source"] == "s1"
        # zebra appears only in s1: lift = N / n_g
        assert z["n_tg"] == 80 and z["n_t"] == 80

    def test_support_threshold(self):
        df = pd.DataFrame({
            "source": ["s1"] * 3 + ["s2"] * 3,
            "text": ["rare unique"] * 3 + ["other stuff"] * 3})
        out = source_signature_terms(ray.data.from_pandas(df),
                                     min_count=5)
        assert len(out) == 0
