"""Scrub operators (redaction / decontamination / repetition stats),
temporal joins (as-of, range-count), hopping windows, stratified
sampling and histogram quantiles — brute-force oracles + invariants."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from web2llmstxt_ray.ops.corpus import int_quantiles, stratified_sample
from web2llmstxt_ray.ops.joins import asof_join, range_join_count
from web2llmstxt_ray.ops.scrub import (
    PII_PATTERNS, decontaminate_flags, redact, repetition_stats)
from web2llmstxt_ray.ops.windows import hopping_window


def _events(n=600, users=17, seed=11):
    rng = np.random.RandomState(seed)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 6 * 3600, size=n)), unit="s")
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, users, size=n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": pa.array(
            rng.choice(["purchase", "view"], size=n), pa.string()),
        "value": pa.array(rng.uniform(0, 10, size=n), pa.float64()),
    })


def _split(t):
    df = t.to_pandas()
    p = df[df.event_type == "purchase"]
    v = df[df.event_type == "view"]
    mk = lambda d: ray.data.from_pandas(d.reset_index(drop=True)).repartition(5)
    return p, v, mk(p), mk(v)


class TestAsofJoin:
    def test_matches_bruteforce(self):
        p, v, dp, dv = _split(_events())
        got = asof_join(dp, dv, num_buckets=7).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        want = []
        for _, r in p.sort_values("event_id").iterrows():
            prior = v[(v.user_id == r.user_id) & (v.ts <= r.ts)]["ts"]
            want.append(prior.max() if len(prior) else pd.NaT)
        assert len(got) == len(p)
        assert list(got["prior_ts"]) == want

    def test_no_right_rows_at_all(self):
        p, v, dp, _ = _split(_events(80))
        empty = ray.data.from_pandas(v.head(0).reset_index(drop=True))
        got = asof_join(dp, empty, num_buckets=3).to_pandas()
        assert len(got) == len(p)
        assert got["prior_ts"].isna().all()

    def test_bucket_count_invariance(self):
        _, _, dp, dv = _split(_events(300))
        a = asof_join(dp, dv, num_buckets=2).to_pandas()
        b = asof_join(dp, dv, num_buckets=31).to_pandas()
        key = ["event_id", "user_id", "ts", "prior_ts"]
        pd.testing.assert_frame_equal(
            a[key].sort_values("event_id").reset_index(drop=True),
            b[key].sort_values("event_id").reset_index(drop=True))


class TestRangeJoinCount:
    def test_matches_bruteforce(self):
        p, v, dp, dv = _split(_events())
        w = 1800.0
        got = range_join_count(dp, dv, window_s=w, num_buckets=7).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        lo = pd.Timedelta(seconds=w)
        want = [
            int(((v.user_id == r.user_id) & (v.ts <= r.ts)
                 & (v.ts > r.ts - lo)).sum())
            for _, r in p.sort_values("event_id").iterrows()]
        assert list(got["n_in_window"]) == want


class TestHoppingWindow:
    def test_matches_replication_oracle(self):
        t = _events(400)
        ds = ray.data.from_arrow(t).repartition(6)
        got = hopping_window(ds, size_s=3600, hop_s=900,
                             key_col="event_type")
        got = got.sort_values(["event_type", "window_start"]).reset_index(
            drop=True)
        df = t.to_pandas()
        rows = []
        for _, r in df.iterrows():
            sec = int(r.ts.value // 10**9)
            base = (sec // 900) * 900
            for j in range(4):
                rows.append((r.event_type,
                             pd.Timestamp((base - j * 900) * 10**9), r.value))
        rep = pd.DataFrame(rows, columns=["event_type", "window_start",
                                          "value"])
        want = rep.groupby(["event_type", "window_start"],
                           as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        want = want.sort_values(["event_type", "window_start"]).reset_index(
            drop=True)
        assert len(got) == len(want)
        assert (got["n_events"].to_numpy() ==
                want["n_events"].to_numpy()).all()
        assert np.allclose(got["sum_value"], want["sum_value"])

    def test_every_event_in_exactly_k_windows(self):
        t = _events(100)
        got = hopping_window(ray.data.from_arrow(t), size_s=3600, hop_s=900)
        assert got["n_events"].sum() == 4 * len(t)


class TestRedactor:
    def test_pii_patterns(self):
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "mail me at bob.smith+x@example.co.uk today",
                "server 192.168.1.254 and phone +1 555-867-5309x",
                "clean text with nothing to hide",
                None,
            ], pa.string())})
        out = redact(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.loc[0, "text"] == "mail me at [EMAIL] today"
        assert out.loc[0, "n_redactions"] == 1
        assert "[IPV4]" in out.loc[1, "text"]
        assert "[PHONE]" in out.loc[1, "text"]
        assert out.loc[1, "n_redactions"] == 2
        assert out.loc[2, "n_redactions"] == 0
        assert out.loc[3, "text"] == "" and out.loc[3, "n_redactions"] == 0

    def test_patterns_are_portable_to_duckdb(self):
        import duckdb
        s = "a@b.io or 10.0.0.1 or +44 123 456 7890"
        con = duckdb.connect()
        for tag in sorted(PII_PATTERNS):
            py_n = len(__import__("re").findall(PII_PATTERNS[tag], s))
            sql_n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [s, PII_PATTERNS[tag]]).fetchone()[0]
            assert py_n == sql_n, tag


class TestDecontaminate:
    def test_flags_exact_containment(self):
        docs = ["the quick brown fox", "lazy dog sleeps", "quick brown",
                "unrelated text entirely"]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        out = decontaminate_flags(
            ray.data.from_arrow(t).repartition(2),
            ["quick brown", "zzz"]).to_pandas()
        out = out.sort_values("doc_id")
        assert list(out["contaminated"]) == [True, False, True, False]

    def test_empty_snippets_flags_nothing(self):
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["abc"], pa.string())})
        out = decontaminate_flags(ray.data.from_arrow(t), []).to_pandas()
        assert not out["contaminated"].any()


class TestRepetitionStats:
    def test_hand_cases(self):
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b a b a", "x", "", "w w w w"], pa.string())})
        out = repetition_stats(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # "a b a b a": 5 words, 2 distinct, bigrams a-b x2 / b-a x2 -> 2
        assert list(out["n_words"]) == [5, 1, 0, 4]
        assert list(out["n_distinct"]) == [2, 1, 0, 1]
        assert list(out["top_bigram_cnt"]) == [2, 0, 0, 3]

    def test_counter_oracle(self):
        rng = np.random.RandomState(5)
        texts = [" ".join(rng.choice(list("abcde"), size=rng.randint(0, 30)))
                 for _ in range(50)]
        t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = repetition_stats(
            ray.data.from_arrow(t).repartition(4)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for i, txt in enumerate(texts):
            toks = txt.split()
            assert out.loc[i, "n_words"] == len(toks)
            assert out.loc[i, "n_distinct"] == len(set(toks))
            want = (max(Counter(zip(toks, toks[1:])).values())
                    if len(toks) >= 2 else 0)
            assert out.loc[i, "top_bigram_cnt"] == want


class TestStratifiedSample:
    def _docs(self, n=400):
        rng = np.random.RandomState(9)
        return pa.table({
            "doc_id": pa.array(rng.permutation(n * 3)[:n].astype("int64")),
            "lang": pa.array(rng.choice(["en", "de", "fr"], size=n)),
            "source": pa.array(rng.choice(["a", "b"], size=n))})

    def test_exact_counts_and_determinism(self):
        t = self._docs()
        a = stratified_sample(ray.data.from_arrow(t).repartition(8),
                              "lang", 15, keep_cols=("source",))
        b = stratified_sample(ray.data.from_arrow(t).repartition(2),
                              "lang", 15, keep_cols=("source",))
        assert (a.groupby("lang").size() == 15).all()
        pd.testing.assert_frame_equal(a, b)

    def test_matches_global_order_oracle(self):
        t = self._docs(120)
        got = stratified_sample(ray.data.from_arrow(t).repartition(6),
                                "lang", 10)
        df = t.to_pandas()
        df["_ok"] = (df.doc_id.to_numpy(dtype=np.uint64)
                     * np.uint64(2654435761)) % np.uint64(1 << 32)
        want = (df.sort_values(["_ok", "doc_id"]).groupby("lang").head(10))
        assert set(got["doc_id"]) == set(want["doc_id"])

    def test_small_stratum_returns_all(self):
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "lang": pa.array(["en", "xx"], pa.string())})
        out = stratified_sample(ray.data.from_arrow(t), "lang", 5)
        assert len(out) == 2


class TestIntQuantiles:
    def test_nearest_rank_vs_duckdb(self):
        import duckdb
        rng = np.random.RandomState(3)
        vals = rng.randint(0, 50, size=777)
        t = pa.table({"v": pa.array(vals, pa.int64())})
        got = int_quantiles(ray.data.from_arrow(t).repartition(5), "v",
                            (0.1, 0.5, 0.9))
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        for _, r in got.iterrows():
            want = con.execute(
                f"SELECT quantile_disc(v, {r.q}) FROM t").fetchone()[0]
            assert r.value == want, r.q

    def test_grouped(self):
        rng = np.random.RandomState(4)
        t = pa.table({
            "g": pa.array(rng.choice(["x", "y"], size=500)),
            "v": pa.array(rng.randint(0, 30, size=500), pa.int64())})
        got = int_quantiles(ray.data.from_arrow(t).repartition(4), "v",
                            (0.5,), group_col="g")
        df = t.to_pandas()
        for g in ("x", "y"):
            sv = np.sort(df[df.g == g]["v"].to_numpy())
            want = sv[int(np.ceil(0.5 * len(sv))) - 1]
            assert got[(got.g == g)]["value"].iloc[0] == want


class TestNgramBloomDecontamination:
    def _corpus(self):
        rng = np.random.RandomState(21)
        vocab = [f"w{i}" for i in range(120)]
        bench = [" ".join(rng.choice(vocab, size=40)) for _ in range(6)]
        clean = [" ".join(rng.choice(vocab, size=60)) for _ in range(30)]
        # contaminated: clean doc with an 8-gram of a bench doc spliced in
        dirty = []
        for i in range(8):
            b = bench[i % len(bench)].split()
            start = rng.randint(0, len(b) - 8)
            core = " ".join(b[start:start + 8])
            dirty.append(f"{clean[i]} {core} trailing words here")
        return bench, clean, dirty

    def test_no_false_negatives_and_oracle(self):
        from web2llmstxt_ray.ops.scrub import (
            _gram_strings, decontaminate_ngram_flags)

        bench, clean, dirty = self._corpus()
        docs = clean + dirty
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        out = decontaminate_ngram_flags(
            ray.data.from_arrow(t).repartition(4), bench, n=8).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        bench_grams = set()
        for b in bench:
            bench_grams.update(_gram_strings(b, 8))
        for i, d in enumerate(docs):
            truth = any(g in bench_grams for g in _gram_strings(d, 8))
            if truth:                      # bloom may over-flag, never under
                assert out.loc[i, "contaminated"], i
        # every planted dirty doc is flagged
        assert out.loc[len(clean):, "contaminated"].all()
        # over-flagging is the bloom's contract (never under-flagging);
        # at these sizes ~1.6 FPs are expected over 30x~53 probes, and
        # the fixed seed makes the observed count reproducible
        assert out.loc[:len(clean) - 1, "contaminated"].sum() <= 3

    def test_short_and_empty_docs_unflagged(self):
        from web2llmstxt_ray.ops.scrub import decontaminate_ngram_flags

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["too short", None], pa.string())})
        out = decontaminate_ngram_flags(
            ray.data.from_arrow(t), ["a b c d e f g h i j"], n=8).to_pandas()
        assert not out["contaminated"].any()


class TestAsofDirections:
    def test_forward_and_nearest_bruteforce(self):
        p, v, dp, dv = _split(_events(400))
        for direction in ("forward", "nearest"):
            got = asof_join(dp, dv, direction=direction,
                            num_buckets=7).to_pandas()
            got = got.sort_values("event_id").reset_index(drop=True)
            want = []
            for _, r in p.sort_values("event_id").iterrows():
                mine = v[v.user_id == r.user_id]["ts"]
                if direction == "forward":
                    cand = mine[mine >= r.ts]
                    want.append(cand.min() if len(cand) else pd.NaT)
                else:
                    if not len(mine):
                        want.append(pd.NaT)
                        continue
                    d = (mine - r.ts).abs()
                    best = d.min()
                    # earlier wins ties (pandas merge_asof nearest)
                    tied = mine[d == best]
                    want.append(tied.min())
            assert list(got["prior_ts"]) == want, direction

    def test_bad_direction_raises(self):
        _, _, dp, dv = _split(_events(50))
        import pytest as _pt
        with _pt.raises(ValueError):
            asof_join(dp, dv, direction="sideways")


class TestQuotaSample:
    def test_quota_counts_and_membership(self):
        rng = np.random.RandomState(12)
        n = 300
        t = pa.table({
            "doc_id": pa.array(rng.permutation(n * 2)[:n].astype("int64")),
            "lang": pa.array(rng.choice(["en", "de", "fr", "zz"], size=n))})
        from web2llmstxt_ray.ops.corpus import quota_sample

        rates = {"en": 0.5, "de": 1.0, "fr": 0.1}
        out = quota_sample(ray.data.from_arrow(t).repartition(6),
                           "lang", rates)
        df = t.to_pandas()
        for g, rate in rates.items():
            n_g = (df.lang == g).sum()
            assert (out.lang == g).sum() == int(np.ceil(rate * n_g)), g
        assert not (out.lang == "zz").any()
        # deterministic: smallest knuth-hash rows per stratum
        df["_ok"] = (df.doc_id.to_numpy(dtype=np.uint64)
                     * np.uint64(2654435761)) % np.uint64(1 << 32)
        for g, rate in rates.items():
            sub = df[df.lang == g].sort_values(["_ok", "doc_id"])
            want = set(sub.head(int(np.ceil(rate * len(sub))))["doc_id"])
            assert set(out[out.lang == g]["doc_id"]) == want, g

    def test_partition_invariance(self):
        rng = np.random.RandomState(13)
        t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                      "lang": pa.array(rng.choice(["a", "b"], size=120))})
        from web2llmstxt_ray.ops.corpus import quota_sample

        r = {"a": 0.3, "b": 0.7}
        x = quota_sample(ray.data.from_arrow(t).repartition(2), "lang", r)
        y = quota_sample(ray.data.from_arrow(t).repartition(11), "lang", r)
        pd.testing.assert_frame_equal(x, y)


class TestLabelCentroids:
    def test_matches_numpy(self):
        rng = np.random.RandomState(14)
        n, d = 400, 8
        vecs = rng.randn(n, d).astype(np.float32)
        labels = rng.randint(0, 3, size=n).astype(np.int32)
        t = pa.table({
            "label": pa.array(labels),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32()))})
        from web2llmstxt_ray.ops.ann import label_centroids

        out = label_centroids(ray.data.from_arrow(t).repartition(5))
        for lab in range(3):
            want = vecs[labels == lab].astype(np.float64).mean(axis=0)
            got = out[out.label == lab].sort_values("dim")["mean_v"].to_numpy()
            assert np.allclose(got, want, atol=1e-6), lab


class TestHashJoinModes:
    """left / semi / anti modes of the bucketed hash join vs pandas."""

    def _sides(self, seed=21):
        rng = np.random.RandomState(seed)
        left = pd.DataFrame({
            "k": np.arange(40, dtype=np.int64),
            "lv": rng.uniform(0, 1, 40).round(3)})
        # right covers only part of the key space, with duplicates
        right = pd.DataFrame({
            "k": rng.choice(np.arange(25, 55, dtype=np.int64), size=60),
            "rv": rng.uniform(0, 1, 60).round(3)})
        mk = lambda d: ray.data.from_pandas(d).repartition(4)
        return left, right, mk(left), mk(right)

    def test_left_join(self):
        from web2llmstxt_ray.ops.relational import hash_join

        left, right, dl, dr = self._sides()
        got = hash_join(dl, dr, on="k", num_buckets=5, how="left") \
            .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
        want = left.merge(right, on="k", how="left") \
            .sort_values(["k", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])
        # unmatched keys survive with null right columns
        assert got.loc[got.k < 25, "rv"].isna().all()
        assert len(got) >= len(left)

    def test_outer_join(self):
        from web2llmstxt_ray.ops.relational import hash_join

        left, right, dl, dr = self._sides()
        got = hash_join(dl, dr, on="k", num_buckets=5, how="outer") \
            .to_pandas().sort_values(["k", "lv", "rv"]) \
            .reset_index(drop=True)
        want = left.merge(right, on="k", how="outer") \
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]],
            want[["k", "lv", "rv"]].astype({"k": "int64"}))
        # right-only keys survive with null left columns
        assert got.loc[got.k >= 40, "lv"].isna().all()
        assert set(got.k) == set(left.k) | set(right.k)

    def test_semi_and_anti_partition_left(self):
        from web2llmstxt_ray.ops.relational import hash_join

        left, right, dl, dr = self._sides()
        semi = hash_join(dl, dr, on="k", num_buckets=5, how="semi") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        anti = hash_join(dl, dr, on="k", num_buckets=5, how="anti") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        rk = set(right.k)
        assert set(semi.k) == {k for k in left.k if k in rk}
        assert set(anti.k) == {k for k in left.k if k not in rk}
        # exactly-once per left row (no fan-out from right duplicates),
        # payload intact, and together they partition the left side
        both = pd.concat([semi, anti]).sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(both, left.sort_values("k")
                                      .reset_index(drop=True))
        assert list(semi.columns) == ["k", "lv"]

    def test_anti_with_empty_right(self):
        from web2llmstxt_ray.ops.relational import hash_join

        left, _, dl, _ = self._sides()
        empty = ray.data.from_pandas(
            pd.DataFrame({"k": pd.Series([], dtype="int64")}))
        anti = hash_join(dl, empty, on="k", num_buckets=5, how="anti") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            anti, left.sort_values("k").reset_index(drop=True))

    def test_bucket_count_invariance(self):
        from web2llmstxt_ray.ops.relational import hash_join

        _, _, dl, dr = self._sides()
        a = hash_join(dl, dr, on="k", num_buckets=3, how="left") \
            .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
        b = hash_join(dl, dr, on="k", num_buckets=11, how="left") \
            .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestArgmaxByKey:
    def _oracle(self, df):
        d = df.sort_values(["ts", "event_id"], ascending=[False, True],
                           kind="stable")
        return d.drop_duplicates(subset=["user_id"], keep="first") \
            .sort_values("user_id").reset_index(drop=True)

    def test_matches_window_oracle(self):
        from web2llmstxt_ray.ops.relational import argmax_by_key

        t = _events(n=500, users=23, seed=31)
        ds = ray.data.from_arrow(t).repartition(7)
        got = argmax_by_key(ds, key="user_id", order_col="ts",
                            tie_col="event_id") \
            .sort_values("user_id").reset_index(drop=True)
        want = self._oracle(t.to_pandas())
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    def test_distributed_equals_driver(self):
        from web2llmstxt_ray.ops.relational import argmax_by_key

        t = _events(n=500, users=23, seed=31)
        ds = ray.data.from_arrow(t).repartition(7)
        driver = argmax_by_key(ds, key="user_id", order_col="ts",
                               tie_col="event_id") \
            .sort_values("user_id").reset_index(drop=True)
        dist = argmax_by_key(ds, key="user_id", order_col="ts",
                             tie_col="event_id", distributed_combine=True,
                             num_buckets=6).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(dist[driver.columns.tolist()], driver)

    def test_ascending_min(self):
        from web2llmstxt_ray.ops.relational import argmax_by_key

        t = _events(n=300, users=11, seed=5)
        ds = ray.data.from_arrow(t).repartition(4)
        got = argmax_by_key(ds, key="user_id", order_col="ts",
                            tie_col="event_id", descending=False) \
            .sort_values("user_id").reset_index(drop=True)
        df = t.to_pandas().sort_values(["ts", "event_id"],
                                       ascending=[True, True], kind="stable")
        want = df.drop_duplicates(subset=["user_id"], keep="first") \
            .sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


class TestNormalizeText:
    def test_canonicalization(self):
        from web2llmstxt_ray.ops.scrub import normalize_text

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["  a\t\tb\n\nc  ", "x\x07y\x00z",
                              "Café  time"]),  # NFC combining
        })
        out = (normalize_text(ray.data.from_arrow(t)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out.loc[0, "text"] == "a b c"
        assert out.loc[1, "text"] == "xyz"
        assert out.loc[2, "text"] == "Café time"

    def test_nbsp_preserved(self):
        # U+00A0 is NOT ascii whitespace: neither engine collapses it
        from web2llmstxt_ray.ops.scrub import normalize_text

        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["a b"])})
        out = normalize_text(ray.data.from_arrow(t)).to_pandas()
        assert out.loc[0, "text"] == "a b"


class TestUnpivotMergeIntervals:
    def test_unpivot_roundtrip_shape(self):
        from web2llmstxt_ray.ops.relational import unpivot

        df = pd.DataFrame({"id": [1, 2, 3], "a": [1.0, 2.0, 3.0],
                           "b": [9.0, 8.0, 7.0]})
        out = (unpivot(ray.data.from_pandas(df).repartition(2),
                       ["id"], ["a", "b"]).to_pandas()
               .sort_values(["id", "measure"]).reset_index(drop=True))
        assert len(out) == 6
        want = df.melt(id_vars=["id"], value_vars=["a", "b"],
                       var_name="measure", value_name="value") \
            .sort_values(["id", "measure"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out, want)

    def test_merge_intervals_vs_sequential(self):
        from web2llmstxt_ray.ops.relational import merge_intervals

        rng = np.random.RandomState(2)
        n = 3000
        k = rng.randint(0, 80, n).astype("int64")
        s = rng.randint(0, 5000, n).astype("int64")
        e = s + rng.randint(1, 120, n)
        df = pd.DataFrame({"k": k, "s": s, "e": e})
        outs = []
        for parts in (1, 11):
            out = (merge_intervals(
                ray.data.from_pandas(df).repartition(parts),
                "k", "s", "e").to_pandas()
                .sort_values(["k", "s"]).reset_index(drop=True))
            for c in out.columns:
                out[c] = out[c].astype("int64")
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # sequential oracle
        rows = []
        for key, g in df.sort_values(["k", "s", "e"]).groupby("k"):
            cur = None
            cnt = 0
            for _, r in g.iterrows():
                if cur is None or r["s"] > cur[1]:
                    if cur is not None:
                        rows.append((key, cur[0], cur[1], cnt))
                    cur = [r["s"], r["e"]]
                    cnt = 1
                else:
                    cur[1] = max(cur[1], r["e"])
                    cnt += 1
            rows.append((key, cur[0], cur[1], cnt))
        want = pd.DataFrame(rows, columns=["k", "s", "e", "n_merged"]) \
            .sort_values(["k", "s"]).reset_index(drop=True)
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(outs[0], want)

    def test_merge_touching_and_contained(self):
        from web2llmstxt_ray.ops.relational import merge_intervals

        df = pd.DataFrame({
            "k": [1, 1, 1, 1, 2],
            "s": [0, 5, 5, 20, 3],
            "e": [5, 10, 7, 30, 4],   # touching [0,5)+[5,10), contained [5,7)
        })
        out = (merge_intervals(ray.data.from_pandas(df), "k", "s", "e")
               .to_pandas().sort_values(["k", "s"])
               .reset_index(drop=True))
        got = [tuple(int(x) for x in r)
               for r in out.itertuples(index=False)]
        assert got == [(1, 0, 10, 3), (1, 20, 30, 1), (2, 3, 4, 1)]
