"""Wave-29 operators: token_budget_sample (global budget cutoff
without a global sort), conformal_threshold (exact order-stat rank
rule). (politeness_schedule and HRW placement already exist from
earlier waves — ops/windows.py + ops/layout.py, tested in
test_tail6/test_tail13.)"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from web2llmstxt_ray.ops.corpus import token_budget_sample
from web2llmstxt_ray.ops.validate import conformal_threshold


class TestTokenBudgetSample:
    def _docs(self, n, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array(rng.integers(10, 500, n).astype(np.int64)),
            "n_tokens": pa.array(rng.integers(1, 100, n).astype(np.int64)),
        })

    def _oracle(self, t, budget):
        df = t.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True])
        kept, run = [], 0
        for _, r in df.iterrows():
            if run + r["n_tokens"] > budget:
                break  # inclusive prefix: first overflow stops the scan
            run += r["n_tokens"]
            kept.append(int(r["doc_id"]))
        return sorted(kept)

    def test_matches_window_oracle(self):
        t = self._docs(400)
        got = token_budget_sample(
            ray.data.from_arrow(t).repartition(5),
            budget=5000).to_pandas()
        assert sorted(got["doc_id"]) == self._oracle(t, 5000)

    def test_whole_corpus_fits(self):
        t = self._docs(20)
        got = token_budget_sample(
            ray.data.from_arrow(t), budget=10**9).to_pandas()
        assert len(got) == 20

    def test_tie_heavy_boundary(self):
        # every doc same n_chars: cutoff resolved purely by doc_id
        t = pa.table({
            "doc_id": pa.array(np.arange(10, dtype=np.int64)),
            "n_chars": pa.array([100] * 10, pa.int64()),
            "n_tokens": pa.array([10] * 10, pa.int64()),
        })
        got = token_budget_sample(ray.data.from_arrow(t).repartition(3),
                                  budget=35).to_pandas()
        assert sorted(got["doc_id"]) == [0, 1, 2]


class TestConformalThreshold:
    def _run(self, groups, values, alpha=0.1, nparts=4):
        t = pa.table({
            "event_type": pa.array(groups, pa.string()),
            "value": pa.array(values, pa.float64()),
        })
        return conformal_threshold(
            ray.data.from_arrow(t).repartition(nparts), alpha=alpha)

    def test_exact_rank_rule(self):
        rng = np.random.default_rng(5)
        groups = [f"t{i % 3}" for i in range(299)]
        values = rng.normal(50, 10, 299).tolist()
        got = self._run(groups, values)
        df = pd.DataFrame({"g": groups, "v": values})
        for _, row in got.iterrows():
            sub = df[df["g"] == row["event_type"]]
            r = np.abs(sub["v"] - sub["v"].mean()).sort_values()
            n = len(sub)
            k = min(n, math.ceil((n + 1) * 0.9))
            assert row["n"] == n and row["rank"] == k
            assert row["threshold"] == pytest.approx(
                r.iloc[k - 1], rel=1e-12)

    def test_small_group_rank_clamps(self):
        got = self._run(["a"] * 3, [1.0, 2.0, 30.0])
        # n=3: ceil(4*0.9)=4 -> clamped to 3 (the max residual)
        assert got["rank"].tolist() == [3]

    def test_partition_invariant(self):
        rng = np.random.default_rng(11)
        groups = [f"t{i % 5}" for i in range(400)]
        values = rng.normal(0, 1, 400).tolist()
        a = self._run(groups, values, nparts=1)
        b = self._run(groups, values, nparts=9)
        pd.testing.assert_frame_equal(a, b)


class TestGreedySourceCover:
    def _run(self, rows, k=3, nparts=4, gram_k=1):
        from web2llmstxt_ray.ops.corpus import greedy_source_cover

        t = pa.table({
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
        return greedy_source_cover(
            ray.data.from_arrow(t).repartition(nparts), k=k,
            gram_k=gram_k)

    @staticmethod
    def _brute(rows, k):
        from collections import defaultdict

        toks = defaultdict(set)
        for s, t in rows:
            toks[s].update(t.lower().split())
        covered: set = set()
        out = []
        for rank in range(1, k + 1):
            gains = sorted(
                ((len(v - covered), s) for s, v in toks.items()
                 if s not in {o[1] for o in out}),
                key=lambda g: (-g[0], g[1]))
            if not gains or gains[0][0] == 0:
                break
            n, s = gains[0]
            covered |= toks[s] - covered
            out.append((rank, s, n, len(covered)))
        return out

    def test_matches_sequential_greedy(self):
        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(60)]
        rows = []
        for s in range(6):
            for _ in range(10):
                rows.append((f"s{s}", " ".join(
                    rng.choice(vocab, rng.integers(3, 12)))))
        got = self._run(rows, k=4)
        want = self._brute(rows, 4)
        assert list(map(tuple, got.itertuples(index=False))) == want

    def test_zero_gain_sources_stop_early(self):
        rows = [("a", "x y z"), ("b", "x y"), ("c", "z")]
        got = self._run(rows, k=3)
        # after 'a' covers everything, b/c have zero marginal gain
        assert got["source"].tolist() == ["a"]
        assert got["total_covered"].tolist() == [3]

    def test_tie_breaks_by_source_name(self):
        rows = [("b", "p q"), ("a", "r s"), ("c", "t")]
        got = self._run(rows, k=2)
        assert got["source"].tolist() == ["a", "b"]

    def test_partition_invariant(self):
        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(40)]
        rows = [(f"s{i % 5}", " ".join(
            rng.choice(vocab, rng.integers(2, 9))))
            for i in range(120)]
        a = self._run(rows, k=3, nparts=1)
        b = self._run(rows, k=3, nparts=8)
        pd.testing.assert_frame_equal(a, b)


    def test_three_gram_mode_matches_brute(self):
        from collections import defaultdict

        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(15)]
        rows = [(f"s{i % 4}", " ".join(
            rng.choice(vocab, rng.integers(4, 15))))
            for i in range(60)]
        got = self._run(rows, k=3, gram_k=3)
        toks = defaultdict(set)
        for s_, t_ in rows:
            ws = t_.lower().split()
            toks[s_].update(" ".join(ws[i:i + 3])
                            for i in range(len(ws) - 2))
        covered: set = set()
        want = []
        for rank in range(1, 4):
            cand = sorted(((len(v - covered), s_)
                           for s_, v in toks.items()
                           if s_ not in {o[1] for o in want}),
                          key=lambda g: (-g[0], g[1]))
            if not cand or cand[0][0] == 0:
                break
            n, s_ = cand[0]
            covered |= toks[s_]
            want.append((rank, s_, n, len(covered)))
        assert list(map(tuple, got.itertuples(index=False))) == want


class TestCurriculumSchedule:
    def _run(self, keys, nparts=4, n_bins=10):
        from web2llmstxt_ray.ops.corpus import curriculum_schedule

        t = pa.table({
            "doc_id": pa.array(np.arange(len(keys), dtype=np.int64)),
            "n_chars": pa.array(keys, pa.int64()),
        })
        return curriculum_schedule(
            ray.data.from_arrow(t).repartition(nparts),
            n_bins=n_bins).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

    def test_matches_explicit_rank_rule(self):
        rng = np.random.default_rng(4)
        keys = rng.integers(10, 100, 137).tolist()
        got = self._run(keys)
        df = pd.DataFrame({"doc_id": range(len(keys)), "k": keys})
        df = df.sort_values(["k", "doc_id"]).reset_index(drop=True)
        n = len(df)
        df["rank"] = np.arange(n)
        df["bin"] = df["rank"] * 10 // n
        starts = {b: int(np.ceil(b * n / 10)) for b in range(10)}
        df["pos"] = df["rank"] - df["bin"].map(starts)
        by_id = df.set_index("doc_id")
        for _, r in got.iterrows():
            assert r["bin"] == by_id.loc[r["doc_id"], "bin"]
            assert r["pos_in_bin"] == by_id.loc[r["doc_id"], "pos"]
            assert r["sched_rank"] == r["pos_in_bin"] * 10 + r["bin"]

    def test_schedule_interleaves_bins(self):
        # first n_bins schedule slots = one doc from every bin
        keys = list(range(100))
        got = self._run(keys)
        head = got.sort_values("sched_rank").head(10)
        assert sorted(head["bin"]) == list(range(10))

    def test_sched_rank_unique_and_partition_invariant(self):
        rng = np.random.default_rng(8)
        keys = rng.integers(0, 30, 211).tolist()   # heavy ties
        a = self._run(keys, nparts=1)
        b = self._run(keys, nparts=9)
        pd.testing.assert_frame_equal(a, b)
        assert a["sched_rank"].is_unique


class TestPaddingWaste:
    def _run(self, toks, nparts=4):
        from web2llmstxt_ray.ops.corpus import padding_waste

        t = pa.table({
            "doc_id": pa.array(np.arange(len(toks), dtype=np.int64)),
            "n_tokens": pa.array(toks, pa.int64()),
        })
        return padding_waste(ray.data.from_arrow(t).repartition(nparts))

    def test_hand_case(self):
        # one bucket (0..63): toks 10,20,30,40 in one batch ->
        # pad = 4*40 - 100 = 60
        got = self._run([10, 20, 30, 40])
        assert got[["bucket", "n_docs", "n_batches", "sum_tokens",
                    "pad_tokens"]].values.tolist() == [[0, 4, 1, 100, 60]]

    def test_batches_split_at_16(self):
        got = self._run([70] * 17)   # bucket 1, batches of 16+1
        assert got["n_batches"].tolist() == [2]
        assert got["pad_tokens"].tolist() == [0]  # all equal lengths

    def test_partition_invariant(self):
        rng = np.random.default_rng(12)
        toks = rng.integers(0, 400, 500).tolist()
        a = self._run(toks, nparts=1)
        b = self._run(toks, nparts=9)
        pd.testing.assert_frame_equal(a, b)


class TestContaminationAttribution:
    def test_counts_per_snippet(self):
        from web2llmstxt_ray.ops.scrub import contamination_attribution

        texts = ["alpha beta gamma", "beta gamma delta",
                 "unrelated words here", "gamma alpha beta"]
        t = pa.table({"text": pa.array(texts, pa.string())})
        out = contamination_attribution(
            ray.data.from_arrow(t).repartition(2),
            ["beta gamma", "alpha", "missing snippet"])
        d = dict(zip(out["snippet"], out["n_docs"]))
        assert d == {"beta gamma": 2, "alpha": 2}

    def test_duplicate_snippets_dedup(self):
        from web2llmstxt_ray.ops.scrub import contamination_attribution

        t = pa.table({"text": pa.array(["x y z"], pa.string())})
        out = contamination_attribution(
            ray.data.from_arrow(t), ["y", "y", ""])
        assert out["snippet"].tolist() == ["y"]
        assert out["n_docs"].tolist() == [1]


class TestShuffleRunLengths:
    def _run(self, groups, nparts=4, num_buckets=64, seed=0):
        from web2llmstxt_ray.ops.corpus import shuffle_run_lengths

        t = pa.table({
            "doc_id": pa.array(np.arange(len(groups), dtype=np.int64)),
            "source": pa.array(groups, pa.string()),
        })
        return shuffle_run_lengths(
            ray.data.from_arrow(t).repartition(nparts),
            num_buckets=num_buckets, seed=seed)

    @staticmethod
    def _brute(groups, seed=0):
        from collections import Counter

        from web2llmstxt_ray.ops.corpus import _SHUFFLE_MULT

        keys = [((i + seed) * _SHUFFLE_MULT) % (1 << 64)
                for i in range(len(groups))]
        order = sorted(range(len(groups)), key=lambda i: keys[i])
        seq = [groups[i] for i in order]
        hist: Counter = Counter()
        cur, n = seq[0], 1
        for x in seq[1:]:
            if x == cur:
                n += 1
            else:
                hist[n] += 1
                cur, n = x, 1
        hist[n] += 1
        return dict(hist)

    def test_matches_sequential_runs(self):
        rng = np.random.default_rng(6)
        groups = [f"g{v}" for v in rng.integers(0, 3, 400)]
        got = self._run(groups)
        assert dict(zip(got["run_length"], got["n_runs"])) \
            == self._brute(groups)

    def test_cross_segment_stitching(self):
        # ONE group: every segment is single-run; the whole corpus is
        # one run that must survive stitching across ALL boundaries
        groups = ["only"] * 300
        got = self._run(groups, num_buckets=16)
        assert got.values.tolist() == [[300, 1]]

    def test_few_buckets_long_runs(self):
        rng = np.random.default_rng(14)
        groups = [f"g{v}" for v in rng.integers(0, 2, 257)]
        got = self._run(groups, num_buckets=4)
        assert dict(zip(got["run_length"], got["n_runs"])) \
            == self._brute(groups)

    def test_partition_invariant(self):
        rng = np.random.default_rng(2)
        groups = [f"g{v}" for v in rng.integers(0, 4, 300)]
        a = self._run(groups, nparts=1)
        b = self._run(groups, nparts=9)
        pd.testing.assert_frame_equal(a, b)

    def test_total_mass_conserved(self):
        rng = np.random.default_rng(17)
        groups = [f"g{v}" for v in rng.integers(0, 5, 333)]
        got = self._run(groups)
        assert int((got["run_length"] * got["n_runs"]).sum()) == 333


class TestKCenterSelect:
    def _vecs(self, n, d=8, seed=5):
        rng = np.random.default_rng(seed)
        return rng.normal(size=(n, d))

    def _run(self, X, k, nparts=4):
        from web2llmstxt_ray.ops.ann import kcenter_select

        t = pa.table({
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in X]),
        })
        return kcenter_select(
            ray.data.from_arrow(t).repartition(nparts),
            k=k).to_pandas()

    @staticmethod
    def _brute(X, k):
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sel = [0]
        out = [(1, 0, 0.0)]
        for rank in range(2, k + 1):
            d = 1.0 - (Xn @ Xn[sel].T).max(axis=1)
            d[sel] = -np.inf
            best = int(np.lexsort((np.arange(len(d)), -d))[0])
            out.append((rank, best, float(d[best])))
            sel.append(best)
        return out

    def test_matches_sequential_gonzalez(self):
        X = self._vecs(120)
        got = self._run(X, 10)
        want = self._brute(X, 10)
        assert got["vec_id"].tolist() == [w[1] for w in want]
        np.testing.assert_allclose(
            got["dist"], [w[2] for w in want], rtol=1e-12)

    def test_coverage_radius_shrinks(self):
        # each added center's selection distance is the CURRENT
        # coverage radius: the sequence must be non-increasing
        X = self._vecs(200, seed=9)
        got = self._run(X, 12)
        d = got["dist"].to_numpy()
        assert (np.diff(d[1:]) <= 1e-12).all()

    def test_partition_invariant(self):
        X = self._vecs(150, seed=11)
        a = self._run(X, 8, nparts=1)
        b = self._run(X, 8, nparts=9)
        pd.testing.assert_frame_equal(a, b)

    def test_k_exceeds_n(self):
        X = self._vecs(5)
        got = self._run(X, 10)
        assert len(got) == 5
        assert sorted(got["vec_id"]) == [0, 1, 2, 3, 4]
