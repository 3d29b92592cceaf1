"""Edge-case tests for the twenty-ninth-wave operators (Mann-Whitney
U, next-event entropy, modal-predictor kappa, chunked phrase search,
HITS hubs/authorities)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import next_event_entropy
from web2llmstxt_ray.ops.graph import hits_scores
from web2llmstxt_ray.ops.retrieval import phrase_count
from web2llmstxt_ray.ops.stats import mann_whitney_u
from web2llmstxt_ray.ops.validate import modal_predictor_kappa


def _mw(values_a, values_b):
    df = pd.DataFrame({
        "value": list(values_a) + list(values_b),
        "event_type": ["a"] * len(values_a) + ["b"] * len(values_b)})
    return mann_whitney_u(ray.data.from_pandas(df).repartition(3),
                          "value", "event_type", "a", "b")


class TestMannWhitney:
    def test_hand_fixture_no_ties(self):
        # a = {1,2}, b = {3,4}: every b beats every a -> U_a = 0
        got = _mw([0.01, 0.02], [0.03, 0.04])
        assert got["n_a"].tolist() == [2]
        assert got["n_b"].tolist() == [2]
        assert got["u_a2"].tolist() == ["0"]
        assert got["tie_t"].tolist() == ["0"]
        assert got["cles"].tolist() == [0.0]
        # z = (0 - 4) / sqrt(n1 n2 (n+1)/12 * 4) ... via the exact form
        n = 4
        var4 = float(2 * 2 * (n * (n - 1) * (n + 1) - 0)) \
            / float(3 * n * (n - 1))
        assert got["z"].tolist() == [-4.0 / math.sqrt(var4)]

    def test_symmetric_distributions_z_zero(self):
        got = _mw([0.01, 0.03], [0.01, 0.03])
        # identical samples -> U_a = n1*n2/2, z = 0
        assert got["u_a2"].tolist() == ["4"]   # 2U = n1*n2 = 4
        assert got["z"].tolist() == [0.0]
        assert got["cles"].tolist() == [0.5]

    def test_tie_term_matches_formula(self):
        # values: a = {1,1,2}, b = {1,2}; tie groups t=3 (v=1), t=2
        got = _mw([0.01, 0.01, 0.02], [0.01, 0.02])
        want_t = (3 ** 3 - 3) + (2 ** 3 - 2)
        assert got["tie_t"].tolist() == [str(want_t)]
        # midranks: v=1 -> ranks {1,2,3} avg 2; v=2 -> {4,5} avg 4.5
        # R_a = 2 + 2 + 4.5 = 8.5 -> 2R = 17; 2U = 17 - 3*4 = 5
        assert got["u_a2"].tolist() == ["5"]

    def test_all_ties_zero_variance_nan_z(self):
        got = _mw([0.01, 0.01], [0.01, 0.01])
        assert math.isnan(got["z"].iloc[0])
        assert got["cles"].tolist() == [0.5]

    def test_partition_invariant(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 50, 200) / 100.0
        b = rng.integers(10, 60, 150) / 100.0
        df = pd.DataFrame({
            "value": np.concatenate([a, b]),
            "event_type": ["a"] * 200 + ["b"] * 150})
        one = mann_whitney_u(
            ray.data.from_pandas(df).repartition(1),
            "value", "event_type", "a", "b")
        many = mann_whitney_u(
            ray.data.from_pandas(df).repartition(11),
            "value", "event_type", "a", "b")
        pd.testing.assert_frame_equal(one, many)


def _ev(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return ray.data.from_pandas(df).repartition(2)


class TestNextEventEntropy:
    def test_deterministic_chain_entropy_zero(self):
        ds = _ev([(i, 1, t, i) for i, t in
                  enumerate(["a", "b", "a", "b", "a", "b"])])
        got = next_event_entropy(ds)
        assert got["cur_type"].tolist() == ["a", "b"]
        assert got["entropy"].tolist() == [0.0, 0.0]
        assert got["top_share"].tolist() == [1.0, 1.0]
        assert got["top_next"].tolist() == ["b", "a"]

    def test_uniform_next_is_ln_k(self):
        # after 'a': b, c each once -> H = ln 2
        ds = _ev([(0, 1, "a", 0), (1, 1, "b", 1), (2, 2, "a", 0),
                  (3, 2, "c", 1)])
        got = next_event_entropy(ds)
        row = got[got["cur_type"] == "a"].iloc[0]
        assert row["entropy"] == -2 * (0.5 * math.log(0.5))
        assert row["n_transitions"] == 2
        assert row["n_next_types"] == 2
        # tie on counts -> lexicographically smallest next type
        assert row["top_next"] == "b"
        assert row["top_share"] == 0.5

    def test_first_event_excluded(self):
        ds = _ev([(0, 1, "a", 0), (1, 2, "a", 0), (2, 3, "a", 0)])
        got = next_event_entropy(ds)
        assert got.empty


class TestModalPredictorKappa:
    def _run(self, keys, labels, nparts=3):
        df = pd.DataFrame({"k": keys, "l": labels})
        return modal_predictor_kappa(
            ray.data.from_pandas(df).repartition(nparts),
            key_col="k", label_col="l")

    def test_perfect_fd_kappa_one(self):
        got = self._run(["s1"] * 3 + ["s2"] * 3,
                        ["en"] * 3 + ["de"] * 3)
        assert got["kappa"].tolist() == [1.0]
        assert got["agree"].tolist() == [6]
        assert got["n_keys"].tolist() == [2]

    def test_hand_confusion(self):
        # s1: 2 en, 1 de -> pred en; s2: 2 de, 1 en -> pred de
        got = self._run(["s1"] * 3 + ["s2"] * 3,
                        ["en", "en", "de", "de", "de", "en"])
        n, agree = 6, 4
        # pred marginals: en 3, de 3; true: en 3, de 3
        pe_num = 3 * 3 + 3 * 3
        po = agree / n
        pe = pe_num / (n * n)
        assert got["po"].tolist() == [po]
        assert got["pe"].tolist() == [pe]
        assert got["kappa"].tolist() == [(po - pe) / (1 - pe)]

    def test_modal_tie_breaks_lexicographic(self):
        # s1: 1 en, 1 de -> tie -> pred 'de' (label ASC)
        got = self._run(["s1", "s1"], ["en", "de"])
        assert got["agree"].tolist() == [1]

    def test_single_label_kappa_degenerate(self):
        # pe = 1 -> kappa defined as 1.0 (perfect trivially)
        got = self._run(["s1", "s2"], ["en", "en"])
        assert got["po"].tolist() == [1.0]
        assert got["kappa"].tolist() == [1.0]

    def test_single_label_degenerate_matches_sql_twin(self):
        # The oracle SQL guards pe >= 1 with CASE ... THEN 1.0 so a
        # degenerate single-label corpus oracles identically instead
        # of NULL from 0/0 (round-3 ADVICE).
        import duckdb

        import __ray_entry__ as entry
        con = duckdb.connect()
        con.execute("""CREATE VIEW documents AS SELECT * FROM
            (VALUES ('s1','en'), ('s2','en'), ('s1','en'))
            t(source, lang)""")
        sql = entry.oracle_sql()["source_lang_kappa"]
        want = con.execute(sql).fetch_df()
        assert want["kappa"].tolist() == [1.0]
        got = self._run(["s1", "s2", "s1"], ["en", "en", "en"])
        assert got["kappa"].tolist() == want["kappa"].tolist()
        assert got["po"].tolist() == want["po"].tolist()
        assert got["pe"].tolist() == want["pe"].tolist()

    def test_partition_invariant(self):
        rng = np.random.default_rng(5)
        keys = [f"s{i % 13}" for i in range(400)]
        labels = [f"l{v}" for v in rng.integers(0, 4, 400)]
        a = self._run(keys, labels, nparts=1)
        b = self._run(keys, labels, nparts=9)
        pd.testing.assert_frame_equal(a, b)


def _docs(texts):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(2)


def _brute(texts, phrase):
    toks = phrase.split(" ")
    out = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        n = sum(1 for s in range(len(w) - len(toks) + 1)
                if w[s:s + len(toks)] == toks)
        if n:
            out[i] = n
    return out


class TestPhraseCount:
    def test_boundary_crossing_counted_once(self):
        # chunk=4: "x x x merge | data y y y" -> straddles
        text = "x x x merge data y y y"
        got = phrase_count(_docs([text]), "merge data",
                           chunk_tokens=4)
        assert got["n_matches"].tolist() == [1]

    def test_overlapping_occurrences_all_count(self):
        got = phrase_count(_docs(["b b b b"]), "b b",
                           chunk_tokens=2)
        assert got["n_matches"].tolist() == [3]

    def test_three_token_phrase_across_boundary(self):
        # chunk=4 -> boundary after 'a'; phrase spans 2 back, 1 fwd
        text = "p q r a b c s t"
        got = phrase_count(_docs([text]), "a b c", chunk_tokens=4)
        assert got["n_matches"].tolist() == [1]

    def test_no_match_docs_absent(self):
        got = phrase_count(_docs(["x y z", "merge data here"]),
                           "merge data", chunk_tokens=16)
        assert got["doc_id"].tolist() == [1]

    def test_vs_bruteforce_random(self):
        rng = np.random.default_rng(11)
        vocab = ["a", "b", "c"]
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 40)))
                 for _ in range(50)]
        for phrase in ("a b", "b b b", "c a c"):
            got = phrase_count(_docs(texts), phrase, chunk_tokens=5)
            want = _brute(texts, phrase)
            assert dict(zip(got["doc_id"], got["n_matches"])) == want

    def test_empty_and_short_docs(self):
        got = phrase_count(_docs(["", "merge", "merge data"]),
                           "merge data", chunk_tokens=8)
        assert got["doc_id"].tolist() == [2]
        assert got["n_matches"].tolist() == [1]

    def test_double_space_at_chunk_boundary(self):
        # 'x x x merge<SPACE><SPACE>data y y' splits to tokens
        # [x x x merge '' data y y]; chunk=4 puts the empty token
        # first in chunk 2, so the junction is tail=[merge] ++
        # head=['' data ...]. A filtered re-split would drop the
        # empty token and count a phantom 'merge data'; the
        # unfiltered stitch must NOT match (positions shifted).
        text = "x x x merge  data y y"
        got = phrase_count(_docs([text]), "merge data",
                           chunk_tokens=4)
        assert got["doc_id"].tolist() == []
        # And the real occurrence straddling a boundary with an
        # empty token BEFORE it in the tail slice must still count:
        # tokens [a '' merge data b] chunk=3 -> ['a','','merge'] |
        # ['data','b']; junction tail=['','merge'] head=['data','b']
        # with tl=2 -> start at 1 straddles -> one match.
        text2 = "a  merge data b"
        got2 = phrase_count(_docs([text2]), "merge data",
                            chunk_tokens=3)
        assert got2["n_matches"].tolist() == [1]

    def test_double_space_vs_bruteforce_random(self):
        rng = np.random.default_rng(23)
        vocab = ["a", "b", ""]  # '' injects consecutive spaces
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
                 for _ in range(40)]
        for phrase in ("a b", "b a b"):
            got = phrase_count(_docs(texts), phrase, chunk_tokens=4)
            want = _brute(texts, phrase)
            assert dict(zip(got["doc_id"], got["n_matches"])) == want


def _hits_brute(edges, iters=2, scale=10 ** 9):
    hubs = sorted({h for h, _ in edges})
    h = {c: scale for c in hubs}
    a = {}
    for _ in range(iters):
        ar = {}
        for c, p in edges:
            ar[p] = ar.get(p, 0) + h[c]
        tot = sum(ar.values())
        a = {p: (scale * v) // tot for p, v in ar.items()}
        hr = {}
        for c, p in edges:
            hr[c] = hr.get(c, 0) + a[p]
        tot = sum(hr.values())
        h = {c: (scale * v) // tot for c, v in hr.items()}
    return h, a


class TestHitsScores:
    def _run(self, edges, **kw):
        df = pd.DataFrame(edges, columns=["hub", "auth"])
        ds = ray.data.from_pandas(df).repartition(3)
        out = hits_scores(ds, num_buckets=8, **kw).to_pandas()
        return (out[out["kind"] == "hub"]
                .set_index("node")["score"].to_dict(),
                out[out["kind"] == "auth"]
                .set_index("node")["score"].to_dict())

    def test_matches_bruteforce(self):
        edges = [(1, 10), (1, 11), (2, 10), (3, 12), (3, 10),
                 (4, 11), (4, 12), (2, 13)]
        h, a = self._run(edges)
        bh, ba = _hits_brute(edges)
        assert h == bh
        assert a == ba

    def test_duplicate_edges_collapse(self):
        h1, a1 = self._run([(1, 10), (1, 10), (2, 10), (1, 11)])
        h2, a2 = self._run([(1, 10), (2, 10), (1, 11)])
        assert (h1, a1) == (h2, a2)

    def test_symmetric_graph_equal_scores(self):
        # two hubs each pointing at both auths: full symmetry
        h, a = self._run([(1, 10), (1, 11), (2, 10), (2, 11)])
        assert h[1] == h[2]
        assert a[10] == a[11]

    def test_star_authority_dominates(self):
        # auth 10 cited by 3 hubs, auth 11 by 1
        h, a = self._run([(1, 10), (2, 10), (3, 10), (3, 11)])
        assert a[10] > a[11]
        # hub 3 touches both -> top hub
        assert h[3] >= max(h[1], h[2])
