"""Wave-36 conformance: phonetic/JW record linkage, sorted-neighborhood
blocking, DBSCAN, Markov stationary — each distributed operator checked
against an independent sequential oracle, and the two string kernels
additionally pair-verified against DuckDB's implementations (the SQL
twins lean on exact kernel parity)."""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# soundex
# ---------------------------------------------------------------------------

class TestSoundex:
    def test_known_values(self):
        from web2llmstxt_ray.ops.phonetic import soundex

        # canonical examples (incl. the first-letter-participates-in-
        # collapse rule: Pfister → P236, not P123)
        for w, code in [("Robert", "R163"), ("Rupert", "R163"),
                        ("Ashcraft", "A226"), ("Ashcroft", "A226"),
                        ("Tymczak", "T522"), ("Pfister", "P236"),
                        ("Honeyman", "H555"), ("Jackson", "J250"),
                        ("Lloyd", "L300"), ("WWW", "W000"),
                        ("x", "X000"), ("", ""), ("123", "")]:
            assert soundex(w) == code, w

    def test_sql_chain_parity(self):
        """The engine kernel and the oracle's regexp_replace chain are
        the SAME algorithm — verified word-by-word."""
        import __ray_entry__ as E
        from web2llmstxt_ray.ops.phonetic import soundex

        words = ["small ring", "red widget", "blue bolt", "hot gear",
                 "anvil", "plate", "gizmo", "O'Brien", "van der Berg",
                 "Robert", "Pfister", "Tymczak", "a1b2", "", "Z"]
        chain = E._SOUNDEX_COLLAPSE_SQL
        sql = f"""
        WITH w(word) AS (SELECT unnest(?)),
        u AS (SELECT word, regexp_replace(upper(word), '[^A-Z]', '',
                  'g') AS s FROM w),
        m AS (SELECT word, s,
            regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(s, '[BFPV]', '1', 'g'),
                '[CGJKQSXZ]', '2', 'g'), '[DT]', '3', 'g'),
                'L', '4', 'g'), '[MN]', '5', 'g'), 'R', '6', 'g'),
                '[AEIOUYHW]', '0', 'g') AS d1 FROM u),
        c AS (SELECT word, s, {chain} AS coll FROM m)
        SELECT word, CASE WHEN s = '' THEN ''
            ELSE s[1] || substr(replace(substr(coll, 2), '0', '')
                 || '000', 1, 3) END FROM c
        """
        got = dict(duckdb.connect().execute(sql, [words]).fetchall())
        for w in words:
            assert got[w] == soundex(w), w


# ---------------------------------------------------------------------------
# jaro-winkler
# ---------------------------------------------------------------------------

class TestJaroWinkler:
    def test_duckdb_parity_exhaustive(self):
        from web2llmstxt_ray.ops.phonetic import jaro_winkler

        part = pq.read_table(f"{SF}/part.parquet", columns=["p_name"])
        names = sorted(set(part.column("p_name").to_pylist()))
        # add typo shapes: deletions, swaps, duplications, prefixes
        variants = []
        for n in names[:20]:
            variants += [n[1:], n[:-1], n[:3] + n[4:],
                         n[1] + n[0] + n[2:], n[0] * 2 + n[1:]]
        pool = names + variants + ["", "a", "ab", "martha", "marhta",
                                   "dixon", "dicksonx", "duane", "dwayne"]
        con = duckdb.connect()
        checked = 0
        for a, b in itertools.islice(
                itertools.combinations(sorted(set(pool)), 2), 5000):
            d = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert jaro_winkler(a, b) == d, (a, b)
            checked += 1
        assert checked >= 3000

    def test_blocked_join_equals_bruteforce(self, ray_session):
        """jw_self_join == sequential brute force over the SAME
        blocking predicate, each qualifying pair exactly once."""
        from web2llmstxt_ray.ops.phonetic import jaro_winkler, jw_self_join

        part = pq.read_table(f"{SF}/part.parquet", columns=["p_name"])
        names = sorted(set(part.column("p_name").to_pylist()))
        names += [n[:-1] for n in names[:10]] + [n + "s" for n in names[:7]]
        names = sorted(set(names))
        thr = 0.85
        expect = []
        for a, b in itertools.combinations(names, 2):
            if a[:1] == b[:1] and abs(len(a) - len(b)) <= 1:
                j = jaro_winkler(a, b)
                if j >= thr:
                    expect.append((a, b, j))
        expect.sort()
        ds = rd.from_pandas(pd.DataFrame({"name": names}))
        got = jw_self_join(ds, "name", threshold=thr)
        assert [tuple(r) for r in got.itertuples(index=False)] == expect
        assert len(got) == len(got.drop_duplicates(["a", "b"]))


# ---------------------------------------------------------------------------
# sorted-neighborhood
# ---------------------------------------------------------------------------

def _snm_bruteforce(df: pd.DataFrame, window: int, thr: float):
    import re

    tok = re.compile(r"[a-z0-9]+")
    d = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    toks = [set(tok.findall(t.lower())) for t in d["text"]]
    out = []
    for i in range(len(d)):
        for j in range(i + 1, min(i + window, len(d))):
            inter = len(toks[i] & toks[j])
            union = len(toks[i]) + len(toks[j]) - inter
            jac = inter / union if union else 1.0
            if jac >= thr:
                out.append((int(d["doc_id"][i]), int(d["doc_id"][j]),
                            j - i, jac))
    return sorted(out)


class TestSNM:
    @pytest.mark.parametrize("chunk_size", [512, 16])
    def test_equals_bruteforce(self, ray_session, chunk_size):
        """chunk_size=16 forces ~30 boundary replications at 500 docs —
        the every-pair-meets-exactly-once claim under heavy chunking."""
        from web2llmstxt_ray.ops.dedup import snm_pairs

        df = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text", "n_chars"]).to_pandas()
        expect = _snm_bruteforce(df, 5, 0.8)
        got = snm_pairs(rd.from_pandas(df), window=5, threshold=0.8,
                        chunk_size=chunk_size)
        assert [tuple(r) for r in got.itertuples(index=False)] == expect

    def test_no_pairs_below_threshold_window2(self, ray_session):
        from web2llmstxt_ray.ops.dedup import snm_pairs

        df = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text", "n_chars"]).to_pandas()
        got = snm_pairs(rd.from_pandas(df), window=2, threshold=1.01)
        assert len(got) == 0
        assert list(got.columns) == ["a", "b", "rank_dist", "jaccard"]


# ---------------------------------------------------------------------------
# dbscan
# ---------------------------------------------------------------------------

def _dbscan_bruteforce(X: np.ndarray, ids: np.ndarray, eps: float,
                       min_pts: int) -> pd.DataFrame:
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    adj = (d2 <= eps * eps)
    nbr = adj.sum(1)                       # includes self (d=0)
    core = nbr >= min_pts
    # components over core-core edges: min-id labels
    parent = {int(i): int(i) for i in ids[core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    idx_of = {int(v): k for k, v in enumerate(ids)}
    for a, b in zip(*np.nonzero(np.triu(adj, 1))):
        ia, ib = int(ids[a]), int(ids[b])
        if core[a] and core[b]:
            ra, rb = find(ia), find(ib)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    label = {i: find(i) for i in parent}
    rows = []
    for k, i in enumerate(ids):
        ii = int(i)
        if core[k]:
            rows.append((ii, "core", label[ii], int(nbr[k])))
        else:
            neigh = [label[int(ids[m])] for m in np.nonzero(adj[k])[0]
                     if core[m]]
            if neigh:
                rows.append((ii, "border", min(neigh), int(nbr[k])))
            else:
                rows.append((ii, "noise", -1, int(nbr[k])))
    return pd.DataFrame(rows, columns=["vec_id", "role", "cluster",
                                       "n_in_eps"]) \
        .sort_values("vec_id").reset_index(drop=True)


class TestDBSCAN:
    def test_equals_bruteforce_and_margin(self, ray_session):
        from web2llmstxt_ray.ops.density import dbscan

        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        eps, mp = 1.2, 5
        # ε-boundary margin must dwarf kernel drift (GEMM vs per-dim)
        d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        off = np.abs(d[np.triu_indices(len(X), 1)] - eps)
        assert off.min() > 1e-6
        expect = _dbscan_bruteforce(X, ids, eps, mp)
        got = dbscan(rd.from_arrow(t).repartition(8), eps=eps, min_pts=mp)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), expect, check_dtype=False)
        # non-trivial mix at these parameters (sf0.001 has no noise
        # points at ε=1.2 — the all-noise regime is covered below)
        roles = got["role"].value_counts()
        assert roles.get("core", 0) > 0 and roles.get("border", 0) > 0

    def test_all_noise_and_all_core(self, ray_session):
        from web2llmstxt_ray.ops.density import dbscan

        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).slice(0, 64)
        ds = rd.from_arrow(t).repartition(4)
        allnoise = dbscan(ds, eps=1e-6, min_pts=2)
        assert (allnoise["role"] == "noise").all()
        assert (allnoise["cluster"] == -1).all()
        allcore = dbscan(ds, eps=1e9, min_pts=2)
        assert (allcore["role"] == "core").all()
        assert (allcore["cluster"] == allcore["vec_id"].min()).all()


# ---------------------------------------------------------------------------
# markov stationary
# ---------------------------------------------------------------------------

class TestMarkovStationary:
    def test_sequential_replay_with_absorbing_state(self, ray_session):
        from web2llmstxt_ray.ops.events import markov_stationary

        # user 1 bounces a↔b; user 2 walks a→b→c and stops: c has no
        # outgoing transitions (absorbing — keeps its mass)
        rows = []
        ts0 = pd.Timestamp("2024-01-01")
        for i, et in enumerate(["a", "b", "a", "b", "a"]):
            rows.append((i, 1, et, ts0 + pd.Timedelta(minutes=i)))
        for i, et in enumerate(["a", "b", "c"]):
            rows.append((10 + i, 2, et, ts0 + pd.Timedelta(minutes=i)))
        ev = pd.DataFrame(rows, columns=["event_id", "user_id",
                                         "event_type", "ts"])
        got = markov_stationary(rd.from_pandas(ev), iters=4,
                                scale=10 ** 6)
        # sequential fixed-point replay
        counts = {("a", "b"): 3, ("b", "a"): 2, ("b", "c"): 1}
        states = ["a", "b", "c"]
        rs = {"a": 3, "b": 3, "c": 0}
        x = {s: 10 ** 6 for s in states}
        for _ in range(4):
            nxt = {s: 0 for s in states}
            for s in states:
                if rs[s] == 0:
                    nxt[s] += x[s]
                    continue
                for t in states:
                    c = counts.get((s, t), 0)
                    if c:
                        nxt[t] += x[s] * c // rs[s]
            x = nxt
        total = sum(x.values())
        assert list(got["event_type"]) == states
        assert list(got["mass_fp"]) == [x[s] for s in states]
        assert list(got["prob"]) == [x[s] / total for s in states]
        # mass ≈ conserved (floor losses only)
        assert 0 <= 3 * 10 ** 6 - total < 100

    def test_sf_data_mass_and_order(self, ray_session):
        from web2llmstxt_ray.ops.events import markov_stationary

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"])
        out = markov_stationary(rd.from_arrow(ev).repartition(8))
        assert list(out["event_type"]) == sorted(out["event_type"])
        assert abs(out["prob"].sum() - 1.0) < 1e-9
        assert (out["mass_fp"] > 0).all()
