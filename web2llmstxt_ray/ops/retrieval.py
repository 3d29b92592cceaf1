"""BM25 lexical retrieval over a document corpus.

A training-data pipeline needs cheap lexical search (benchmark-overlap
probes, topic slicing, corpus QA) alongside the embedding ANN path
(``ops/ann.py``). BM25 here is shaped for 100 TB:

- **Pass 1 (stats) is shuffle-free.** Only the QUERY TERMS' document
  frequencies matter — not the full vocabulary — so each batch emits a
  single partial row (doc count, token count, per-term df vector) and
  the driver folds a handful of tiny rows. No vocabulary groupby, no
  inverted-index materialization.
- **Pass 2 (scoring) is a broadcast map.** The per-term idf vector and
  ``avgdl`` ship once via ``ray.put``; every batch scores its docs
  locally and emits only matching (doc_id, score) rows.
- ``bm25_topk`` adds the partial-top-k-per-batch → tiny driver merge
  finale (same shape as ``ops/ann.py:brute_force_topk``).

Scoring uses the Lucene/Robertson formulation with definitions mirrored
exactly by the driver's DuckDB oracle (whitespace tokenization from
``ops/textstats.py``):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .ann import _normalize
from .textstats import tokenize_ws
from .veckit import vec_matrix


def bm25_stats(ds: ray.data.Dataset, terms: list[str],
               text_col: str = "text") -> tuple[int, float, np.ndarray]:
    """(N, avgdl, df-per-term) for the corpus — one shuffle-free pass;
    each batch contributes a single partial row."""
    terms = list(terms)
    t_index = {t: i for i, t in enumerate(terms)}

    def partial(batch: pa.Table) -> pa.Table:
        df = np.zeros(len(terms), dtype=np.int64)
        n_docs = 0
        n_toks = 0
        for text in batch.column(text_col).to_pylist():
            toks = tokenize_ws(text or "")
            n_docs += 1
            n_toks += len(toks)
            seen = set(toks) if toks else ()
            for t, i in t_index.items():
                if t in seen:
                    df[i] += 1
        return pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                         "n_toks": pa.array([n_toks], pa.int64()),
                         "df": pa.array([df.tolist()],
                                        pa.list_(pa.int64()))})

    n = 0
    total = 0
    df = np.zeros(len(terms), dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += row["n_docs"]
        total += row["n_toks"]
        df += np.asarray(row["df"], dtype=np.int64)
    avgdl = total / n if n else 0.0
    return n, avgdl, df


class _BM25Scorer:
    """Broadcast-stats scoring stage: tf counting + the BM25 sum per
    doc, emitting only docs that match at least one term."""

    def __init__(self, stats_ref, text_col: str, id_col: str,
                 k1: float, b: float):
        self.terms, self.idf, self.avgdl = ray.get(stats_ref)
        self.t_index = {t: i for i, t in enumerate(self.terms)}
        self.text_col, self.id_col = text_col, id_col
        self.k1, self.b = k1, b

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        out_ids: list = []
        out_scores: list[float] = []
        k1, b, avgdl, idf = self.k1, self.b, self.avgdl, self.idf
        for did, text in zip(ids, batch.column(self.text_col).to_pylist()):
            toks = tokenize_ws(text or "")
            if not toks:
                continue
            tf = np.zeros(len(self.terms), dtype=np.int64)
            t_index = self.t_index
            for tok in toks:
                i = t_index.get(tok)
                if i is not None:
                    tf[i] += 1
            hit = tf > 0
            if not hit.any():
                continue
            dl = len(toks)
            denom = tf[hit] + k1 * (1 - b + b * dl / avgdl)
            score = float(np.sum(idf[hit] * tf[hit] * (k1 + 1) / denom))
            out_ids.append(did)
            out_scores.append(score)
        return pa.table({self.id_col: pa.array(out_ids, pa.int64()),
                         "score": pa.array(out_scores, pa.float64())})


class _BM25TermScorer(_BM25Scorer):
    """Per-(doc, term) granularity — each score is one multiply/divide
    chain with a DEFINED association order, so it is bit-reproducible
    against the SQL oracle (a per-doc SUM is not: the oracle's addition
    order across terms is unspecified, and float addition does not
    associate)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        out_ids: list = []
        out_terms: list[str] = []
        out_scores: list[float] = []
        k1, b, avgdl, idf = self.k1, self.b, self.avgdl, self.idf
        for did, text in zip(ids, batch.column(self.text_col).to_pylist()):
            toks = tokenize_ws(text or "")
            if not toks:
                continue
            dl = len(toks)
            norm = k1 * (1 - b + b * dl / avgdl)
            for i, term in enumerate(self.terms):
                tf = toks.count(term)
                if tf:
                    out_ids.append(did)
                    out_terms.append(term)
                    out_scores.append(idf[i] * tf * (k1 + 1) / (tf + norm))
        return pa.table({self.id_col: pa.array(out_ids, pa.int64()),
                         "term": pa.array(out_terms, pa.string()),
                         "score": pa.array(out_scores, pa.float64())})


def bm25_term_scores(ds: ray.data.Dataset, terms: list[str],
                     text_col: str = "text", id_col: str = "doc_id",
                     k1: float = 1.2, b: float = 0.75) -> ray.data.Dataset:
    """(doc_id, term, score) per matching doc×term — the
    term-attribution form (and the oracle-exact one; see
    ``_BM25TermScorer``). ``bm25_scores`` sums it per doc."""
    if not terms:
        raise ValueError("terms must be non-empty")
    ds = ds.materialize()
    n, avgdl, df = bm25_stats(ds, terms, text_col)
    idf = np.array([math.log(1 + (n - d + 0.5) / (d + 0.5)) for d in df],
                   dtype=np.float64)
    from .stagecache import cached_stage

    stats_ref = ray.put((list(terms), idf, avgdl))
    return ds.map_batches(
        cached_stage(_BM25TermScorer, stats_ref=stats_ref,
                     text_col=text_col, id_col=id_col, k1=k1, b=b),
        batch_format="pyarrow")


def bm25_scores(ds: ray.data.Dataset, terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> ray.data.Dataset:
    """(doc_id, score) for every document matching ≥1 query term.

    Two linear passes (stats, then score); the only driver-held state
    is the per-term stats vector. The input is materialized once so
    the second pass doesn't re-execute the parent lineage.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    ds = ds.materialize()
    n, avgdl, df = bm25_stats(ds, terms, text_col)
    idf = np.array([math.log(1 + (n - d + 0.5) / (d + 0.5)) for d in df],
                   dtype=np.float64)
    from .stagecache import cached_stage

    stats_ref = ray.put((list(terms), idf, avgdl))
    return ds.map_batches(
        cached_stage(_BM25Scorer, stats_ref=stats_ref, text_col=text_col,
                     id_col=id_col, k1=k1, b=b),
        batch_format="pyarrow")


def bm25_topk(ds: ray.data.Dataset, terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> list[dict]:
    """Top-k (doc_id, score), ties broken by doc_id ascending — partial
    top-k per batch, driver merges only ≤k rows per block."""
    scored = bm25_scores(ds, terms, text_col, id_col, k1, b)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sc = np.asarray(batch.column("score"), dtype=np.float64)
        if len(ids) > k:
            # lexsort: primary score desc, secondary id asc
            order = np.lexsort((ids, -sc))[:k]
            ids, sc = ids[order], sc[order]
        return pa.table({id_col: ids, "score": sc})

    rows = scored.map_batches(partial_topk,
                              batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["score"], r[id_col]))
    return rows[:k]


def inverted_index(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id", num_buckets: int = 64,
                   min_df: int = 1) -> ray.data.Dataset:
    """Distributed inverted-index construction: one skinny-row shuffle.

    Map phase emits per-document term frequencies (token, doc_id, tf)
    — already aggregated within the document, so a doc contributes one
    row per DISTINCT token. Rows shuffle by ``hash(token) %
    num_buckets`` (bounded groups — the vocabulary itself is heavy-
    tailed, and grouping by raw token would put a stopword's whole
    posting set in one 1-group block); each bucket then builds every
    posting list it owns with one vectorized pandas pass.

    Output: (token, df, cf, postings) where postings is the
    ``doc:tf`` list sorted by doc_id — comparable against a DuckDB
    ``string_agg(... ORDER BY doc_id)`` oracle. At web scale the
    pathological rows are stopword postings (O(corpus) string); real
    deployments cap or block-split those — ``min_df`` trims the
    hapax tail here and the cap seam is the per-bucket pandas pass.
    """
    import pandas as pd
    from collections import Counter

    from ..functions.urls import hash64_batch

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks, ids, tfs = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            for tok, n in Counter(
                    tokenize_ws((t or "").lower())).items():
                toks.append(tok)
                ids.append(did)
                tfs.append(n)
        buckets = (hash64_batch(toks) % np.uint64(num_buckets)
                   ).astype(np.int32)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            id_col: pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "_tb": pa.array(buckets),
        })

    def build_postings(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty or "token" not in group.columns:
            return pd.DataFrame({
                "token": pd.Series([], dtype="object"),
                "df": pd.Series([], dtype="int64"),
                "cf": pd.Series([], dtype="int64"),
                "postings": pd.Series([], dtype="object")})
        g = group.sort_values(["token", id_col], kind="stable")
        g = g.assign(_p=g[id_col].astype(str) + ":"
                     + g["tf"].astype(str))
        out = g.groupby("token", as_index=False, sort=False).agg(
            df=(id_col, "size"), cf=("tf", "sum"),
            postings=("_p", ",".join))
        if min_df > 1:
            out = out[out["df"] >= min_df]
        return out[["token", "df", "cf", "postings"]]

    return (ds.map_batches(tf_rows, batch_format="pyarrow")
            .groupby("_tb").map_groups(build_postings,
                                       batch_format="pandas"))


def sparse_dot_pairs(ds: ray.data.Dataset, max_df: int = 50,
                     min_dot: int = 1, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Sparse lexical similarity join: every document pair sharing at
    least one (non-stopword) token, scored by the EXACT integer
    term-frequency dot product Σ_t tf_a(t)·tf_b(t) — the raw kernel
    under cosine/TF-IDF rankers, kept integer so the SQL oracle is
    hash-exact and partial sums are order-free.

    Scale shape (the DAAT/postings decomposition):
      1. per-doc tf rows (one per distinct token per doc) shuffle ONCE
         by hash(token) — same exchange as :func:`inverted_index`;
      2. a token's pair contributions are generated inside its bucket
         with one merge per token group, and tokens with
         ``df > max_df`` are dropped THERE (the standard stopword-
         posting cap: an O(corpus)-df token would otherwise emit
         O(df²) pairs — at 100 TB this cap is what keeps the join
         near-linear, and it is mirrored in the oracle);
      3. per-bucket partial pair sums shuffle by hash(pair) so the
         final per-pair reduction is vectorized and skew-free;
      4. ``dot < min_dot`` pairs are cut after the exact sum.
    """
    import pandas as pd
    from collections import Counter

    from ..functions.urls import hash64_batch

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks, ids, tfs = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            for tok, n in Counter(
                    tokenize_ws((t or "").lower())).items():
                toks.append(tok)
                ids.append(did)
                tfs.append(n)
        buckets = (hash64_batch(toks) % np.uint64(num_buckets)
                   ).astype(np.int32)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            id_col: pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "_tb": pa.array(buckets),
        })

    def token_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["token", id_col, "tf"]]
        df_per_tok = g.groupby("token", sort=False)["token"].transform(
            "size")
        g = g[df_per_tok <= max_df]
        if g.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "part": pd.Series([], dtype="int64"),
                                 "_pb": pd.Series([], dtype="int32")})
        m = g.merge(g, on="token", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m = m.assign(part=m["tf_a"] * m["tf_b"])
        out = m.groupby([f"{id_col}_a", f"{id_col}_b"],
                        as_index=False)["part"].sum()
        out.columns = ["a", "b", "part"]
        # route partials to the pair's reduction bucket
        out["_pb"] = ((out["a"] * 1000003 + out["b"])
                      % num_buckets).astype("int32")
        return out

    def pair_sum(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["a", "b"], as_index=False)["part"].sum()
        out = out.rename(columns={"part": "dot"})
        return out[out["dot"] >= min_dot]

    return (ds.map_batches(tf_rows, batch_format="pyarrow")
            .groupby("_tb").map_groups(token_pairs,
                                       batch_format="pandas")
            .groupby("_pb").map_groups(pair_sum, batch_format="pandas"))


def hybrid_rrf(docs: ray.data.Dataset, emb: ray.data.Dataset,
               terms: list[str], query_vec: "np.ndarray",
               query_id: int, k_each: int = 50, k_out: int = 20,
               rrf_k: int = 60, text_col: str = "text",
               id_col: str = "doc_id") -> "pd.DataFrame":
    """Hybrid retrieval: reciprocal-rank fusion of a BM25 lexical
    ranking and an exact-cosine vector ranking over the SAME id space —
    ``rrf = 1/(rrf_k + lexical_rank) + 1/(rrf_k + vector_rank)``
    (absent side contributes 0), top ``k_out`` by (rrf desc, id).

    Distribution shape: both sides are the existing scale paths —
    BM25 term scores are map-only after the skinny stats pass and the
    per-DOC sum completes inside the block that scored the doc (a doc's
    term rows never split), so only O(blocks × k_each) partial-top-k
    rows reach the driver; the vector side is the per-batch partial
    top-k GEMM. The fusion itself touches two ≤k_each-row lists.

    Exactness: the per-doc BM25 total is a LEFT-FOLD over terms in
    sorted-term order (coalesce-0 for absent terms), so it is ONE
    deterministic double expression the SQL oracle replays with the
    same nesting; ranks then agree bit-for-bit, and rrf is a pure
    function of integer ranks."""
    import heapq

    import pandas as pd

    from .ann import brute_force_topk

    tsorted = sorted(terms)
    scored = bm25_term_scores(docs, terms, text_col=text_col,
                              id_col=id_col)

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.to_pandas()
        p = b.pivot_table(index=id_col, columns="term", values="score",
                          aggfunc="first")
        s = None
        for t in tsorted:
            col = (p[t].fillna(0.0).to_numpy() if t in p.columns
                   else np.zeros(len(p)))
            s = col if s is None else s + col
        ids = p.index.to_numpy().astype(np.int64)
        if len(ids) > k_each:
            order = np.lexsort((ids, -s))[:k_each]
            ids, s = ids[order], s[order]
        return pa.table({id_col: pa.array(ids),
                         "score": pa.array(s, pa.float64())})

    parts = scored.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    lex = heapq.nsmallest(
        k_each, zip(-parts["score"].to_numpy(),
                    parts[id_col].to_numpy().astype(np.int64)))
    lex_rank = {int(i): r for r, (_, i) in enumerate(lex, 1)}

    vec = brute_force_topk(emb, np.asarray([query_vec]), [query_id],
                           k=k_each)
    vec_rank = {int(v): int(r) for v, r in
                zip(vec.column("vec_id").to_pylist(),
                    vec.column("rank").to_pylist())}

    rows = []
    for i in sorted(set(lex_rank) | set(vec_rank)):
        lr, vr = lex_rank.get(i), vec_rank.get(i)
        rrf = ((1.0 / (rrf_k + lr) if lr is not None else 0.0)
               + (1.0 / (rrf_k + vr) if vr is not None else 0.0))
        rows.append({id_col: i, "rrf_score": rrf,
                     "lex_rank": float(lr) if lr is not None
                     else float("nan"),
                     "vec_rank": float(vr) if vr is not None
                     else float("nan")})
    rows.sort(key=lambda r: (-r["rrf_score"], r[id_col]))
    out = pd.DataFrame(rows[:k_out])
    out[id_col] = out[id_col].astype("int64")
    return out.reset_index(drop=True)


def tfidf_top_terms(ds: ray.data.Dataset, top_m: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-document top-``m`` terms by TF-IDF weight
    (``tf · ln(N/df)``, raw counts, natural log) — the classic
    keyword-extraction / document-vector step. Two passes: document
    frequencies fold from per-block DISTINCT-term partials (bounded
    vocabulary contract, broadcast once as a (term → df) map with N),
    then a map-only pass computes every doc's term weights and keeps
    its local top-m (ties: weight desc, term asc) — per-doc selection
    never needs a shuffle because a doc's tokens live in its block.
    Output: (id, rank, term, tf, tfidf)."""
    import pandas as pd

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.strip()
        t = t[t != ""].str.split(r"\s+")
        ex = t.explode()
        d = pd.DataFrame({"_d": ex.index, "term": ex.to_numpy()}) \
            .drop_duplicates()
        return d.groupby("term", as_index=False).size() \
            .rename(columns={"size": "df"})

    src = ds.materialize()          # two passes over the same blocks
    parts = src.map_batches(df_partial, batch_format="pandas",
                            batch_size=None).to_pandas()
    dfm = parts.groupby("term", as_index=False)["df"].sum()
    n_docs = src.count()
    df_map = dict(zip(dfm["term"], dfm["df"].astype(int)))
    state = ray.put((df_map, n_docs))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        dfs, n = ray.get(state)
        t = b[text_col].fillna("").str.strip()
        split = t.str.split(r"\s+")
        ex = split[t != ""].explode()
        frame = pd.DataFrame({"_d": ex.index, "term": ex.to_numpy()})
        tf = frame.groupby(["_d", "term"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        dfv = tf["term"].map(dfs).to_numpy(dtype=np.float64)
        tf["w"] = tf["tf"].to_numpy() * np.log(n / dfv)
        tf = tf.sort_values(["_d", "w", "term"],
                            ascending=[True, False, True],
                            kind="stable")
        top = tf.groupby("_d").head(top_m).reset_index(drop=True)
        top["rank"] = top.groupby("_d").cumcount() + 1
        out = pd.DataFrame({
            id_col: b[id_col].reindex(top["_d"]).to_numpy(),
            "rank": top["rank"].astype("int64"),
            "term": top["term"],
            "tf": top["tf"].astype("int64"),
            "tfidf": top["w"],
        })
        return out

    return src.map_batches(score, batch_format="pandas",
                           batch_size=None)


def kwic_contexts(ds: ray.data.Dataset, term: str,
                  window: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Keyword-in-context concordance: every occurrence of ``term``
    (exact token match under single-space tokenization) as a row
    (doc, 1-based position, ``window`` words of left context,
    ``window`` words of right context).

    Map-only — no shuffle, no per-row Python loop: each block splits
    once, explodes to a (doc, pos, word) frame, and builds the
    contexts from ``window`` grouped shift() columns (lags/leads are
    NaN only at document edges, so a fillna + join + edge-strip
    reconstructs exactly the clipped word-slice a SQL
    ``list[max(1,i−w):i−1]`` produces). Output order is deterministic
    per document, so the operator streams at any scale.
    """
    import pandas as pd

    schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64()),
                        ("left_ctx", pa.string()),
                        ("right_ctx", pa.string())])

    def per_block(b: pd.DataFrame) -> pa.Table:
        words = b[text_col].str.split(" ")
        f = pd.DataFrame({id_col: b[id_col]})
        f["_w"] = words
        f = f.explode("_w", ignore_index=True)
        g = f.groupby(id_col, sort=False)["_w"]
        f["_pos"] = g.cumcount() + 1
        hit = f["_w"] == term
        if not hit.any():
            # typed empty table: an all-empty object-dtype pandas
            # block would drop the output schema entirely
            return schema.empty_table()
        lags = [g.shift(k).fillna("") for k in range(window, 0, -1)]
        leads = [g.shift(-k).fillna("") for k in range(1, window + 1)]
        left = lags[0].str.cat(lags[1:], sep=" ").str.lstrip(" ")
        right = leads[0].str.cat(leads[1:], sep=" ").str.rstrip(" ")
        return pa.Table.from_arrays(
            [pa.array(f.loc[hit, id_col].to_numpy(np.int64)),
             pa.array(f.loc[hit, "_pos"].to_numpy(np.int64)),
             pa.array(left[hit].tolist(), pa.string()),
             pa.array(right[hit].tolist(), pa.string())],
            schema=schema)

    return ds.select_columns([id_col, text_col]).map_batches(
        per_block, batch_format="pandas", batch_size=None)


def phrase_count(ds: ray.data.Dataset, phrase: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 32,
                 num_buckets: int = 64) -> "pd.DataFrame":
    """Exact multi-word phrase occurrence counts over a CHUNKED
    corpus — the positional-search primitive behind benchmark-overlap
    probes and quote tracing, shaped for a corpus that is stored as
    token shards rather than whole documents.

    The corpus is split into fixed ``chunk_tokens``-token chunks
    (``flat_map``, whole documents never ship further); each chunk is
    scanned locally for phrase starts (vectorized shifted-equality
    over the token array) and reduced to a SKINNY row — (doc, chunk
    idx, in-chunk count, first/last L−1 tokens). Occurrences that
    straddle a chunk boundary are recovered in the per-doc fold: one
    doc-hash bucket shuffle co-locates a doc's chunk summaries, and
    each junction window ``tail_i ++ head_{i+1}`` is scanned for
    starts that begin in the tail and end in the head (counted once,
    exactly the positions the in-chunk scans cannot see). Overlapping
    occurrences all count (start positions), matching the SQL twin's
    positional self-join over ``string_split`` subscripts.

    A phrase can span at most two chunks (enforced:
    ``chunk_tokens ≥ len(phrase tokens)``; only the final chunk of a
    doc is short). Driver sees only matching (doc, n) rows. Output:
    (doc_id, n_matches) for docs with ≥1 occurrence, by doc id."""
    import pandas as pd

    from .dedup import _id_blocks

    toks = [t for t in phrase.split(" ") if t]
    L = len(toks)
    if L == 0:
        raise ValueError("empty phrase")
    if chunk_tokens < L:
        raise ValueError("chunk_tokens must be >= phrase length")
    tok_arr = np.array(toks, dtype=object)

    def count_starts(words: np.ndarray) -> int:
        n = len(words)
        if n < L:
            return 0
        m = words[: n - L + 1] == tok_arr[0]
        for j in range(1, L):
            m = m & (words[j: n - L + j + 1] == tok_arr[j])
        return int(m.sum())

    def to_chunk_rows(batch: pa.Table) -> pa.Table:
        ids, idxs, nins, heads, tails = [], [], [], [], []
        for did, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            words = np.array((text or "").split(" "), dtype=object)
            for ci in range(0, max(len(words), 1), chunk_tokens):
                w = words[ci: ci + chunk_tokens]
                ids.append(did)
                idxs.append(ci // chunk_tokens)
                nins.append(count_starts(w))
                heads.append(" ".join(w[: L - 1]))
                tails.append(" ".join(w[len(w) - (L - 1):])
                             if L > 1 else "")
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "n_in": pa.array(nins, pa.int64()),
            "head": pa.array(heads, pa.string()),
            "tail": pa.array(tails, pa.string()),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _id_blocks(batch.column(id_col).to_pylist(), num_buckets)
        return batch.append_column(
            "_sbucket", pa.array(b, pa.int32()))

    def per_doc_fold(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([id_col, "chunk_idx"], kind="stable")
        out_ids, out_n = [], []
        for did, d in g.groupby(id_col, sort=False):
            total = int(d["n_in"].sum())
            tails = d["tail"].tolist()
            heads = d["head"].tolist()
            # L == 1: a single-token phrase can't straddle a chunk
            # boundary; the in-chunk scans already count everything.
            for i in range(len(d) - 1 if L > 1 else 0):
                # Unfiltered re-split: ' '.join/split(' ') is lossless
                # for empty tokens (the L-1-token slices are never
                # empty for L > 1), so junction positions reproduce
                # the original word stream exactly — consecutive
                # spaces produce empty tokens here just as they do in
                # the in-chunk scan and the SQL twin's string_split.
                t = np.array(tails[i].split(" "), dtype=object)
                h = np.array(heads[i + 1].split(" "), dtype=object)
                w = np.concatenate([t, h])
                tl, n = len(t), len(w)
                if n < L:
                    continue
                m = w[: n - L + 1] == tok_arr[0]
                for j in range(1, L):
                    m = m & (w[j: n - L + j + 1] == tok_arr[j])
                starts = np.nonzero(m)[0]
                total += int(((starts < tl)
                              & (starts + L > tl)).sum())
            if total > 0:
                out_ids.append(did)
                out_n.append(total)
        return pd.DataFrame({
            id_col: pd.Series(out_ids, dtype="int64"),
            "n_matches": pd.Series(out_n, dtype="int64")})

    folded = (ds.select_columns([id_col, text_col])
              .map_batches(to_chunk_rows, batch_format="pyarrow",
                           batch_size=None)
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_sbucket")
              .map_groups(per_doc_fold, batch_format="pandas")
              .to_pandas())
    if folded.empty:
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "n_matches": pd.Series([], dtype="int64")})
    return folded.sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# retrieval evaluation: NDCG + rank-biased overlap
# ---------------------------------------------------------------------------

class _DualTopK:
    """Partial per-block top-k by BOTH cosine and raw dot product for a
    broadcast query matrix — one pass, one GEMM, two rankings (the
    cosine/dot disagreement IS what RBO measures downstream)."""

    def __init__(self, qref, k: int, vec_col: str, id_col: str):
        self.qn, self.qraw, self.qids = ray.get(qref)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        labels = (np.asarray(batch.column("label").to_pylist(),
                             dtype=np.int64)
                  if "label" in batch.column_names
                  else np.zeros(len(ids), dtype=np.int64))
        mat = vec_matrix(batch, self.vec_col)
        cos = self.qn @ _normalize(mat).T          # (Q, n)
        dot = self.qraw @ mat.T
        out = {"query_id": [], "vec_id": [], "label": [],
               "cosine": [], "dot": []}
        kk = min(self.k + 1, cos.shape[1])         # +1 absorbs self-hit
        for qi, qid in enumerate(self.qids):
            # candidates in either metric's block top-k suffice
            keep = set(np.argpartition(-cos[qi], kk - 1)[:kk].tolist())
            keep |= set(np.argpartition(-dot[qi], kk - 1)[:kk].tolist())
            for j in sorted(keep):
                out["query_id"].append(qid)
                out["vec_id"].append(int(ids[j]))
                out["label"].append(int(labels[j]))
                out["cosine"].append(float(cos[qi, j]))
                out["dot"].append(float(dot[qi, j]))
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "label": pa.array(out["label"], pa.int64()),
            "cosine": pa.array(out["cosine"], pa.float64()),
            "dot": pa.array(out["dot"], pa.float64()),
        })


def _dual_rankings(ds: ray.data.Dataset, k: int, query_mod: int,
                   vec_col: str, id_col: str, label_col: str | None):
    """Shared harness: members with ``id % query_mod == 0`` query the
    corpus; returns per query the exact global top-k lists under
    cosine and under dot (ties → ascending id), plus query labels and
    the global per-label candidate counts. Partial top-(k+1) per block
    → O(blocks·Q·k) driver merge; vectors never shuffle."""
    from .stagecache import cached_stage

    cols = [id_col, vec_col] + ([label_col] if label_col else [])
    slim = ds.select_columns(cols)
    qrows = slim.filter(
        lambda r: r[id_col] % query_mod == 0).to_pandas() \
        .sort_values(id_col)
    qmat = np.stack([np.asarray(v, dtype=np.float64)
                     for v in qrows[vec_col]])
    qids = [int(i) for i in qrows[id_col]]
    qlabels = {int(i): int(l) for i, l in zip(qrows[id_col],
                                              qrows[label_col])} \
        if label_col else {}
    qref = ray.put((_normalize(qmat), qmat, qids))

    parts = slim.map_batches(
        cached_stage(_DualTopK, qref=qref, k=k, vec_col=vec_col,
                     id_col=id_col),
        batch_format="pyarrow", batch_size=4096).to_pandas()
    top_cos: dict[int, list] = {}
    top_dot: dict[int, list] = {}
    rel_count: dict[int, int] = {}
    for qid in qids:
        cand = parts[(parts["query_id"] == qid)
                     & (parts["vec_id"] != qid)]
        oc = cand.sort_values(["cosine", "vec_id"],
                              ascending=[False, True],
                              kind="stable").head(k)
        od = cand.sort_values(["dot", "vec_id"],
                              ascending=[False, True],
                              kind="stable").head(k)
        top_cos[qid] = list(zip(oc["vec_id"].astype(int),
                                oc["label"].astype(int)))
        top_dot[qid] = [int(v) for v in od["vec_id"]]
    if label_col:
        lh = slim.groupby(label_col).count().to_pandas()
        lcounts = dict(zip(lh[label_col].astype(int),
                           lh["count()"].astype(int)))
        rel_count = {q: lcounts.get(qlabels[q], 0) - 1 for q in qids}
    return qids, qlabels, top_cos, top_dot, rel_count


def retrieval_ndcg_label(ds: ray.data.Dataset, k: int = 10,
                         query_mod: int = 50,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         label_col: str = "label"):
    """NDCG@k of cosine retrieval with same-label binary relevance —
    the standard embedding-quality eval over a labeled corpus. For
    each query (corpus members with ``id % query_mod == 0``, self
    excluded): DCG = Σ rel/log2(rank+1) over the exact top-k, IDCG
    over min(k, R) ideal hits where R = same-label corpus count − 1.
    Output (query_id, n_rel, dcg, idcg, ndcg) ordered by query_id.
    Rank boundaries are float-margin-tested (cosine GEMM vs the SQL
    twin's per-dim kernel drift ~1e-15 ≪ adjacent-score gaps)."""
    import pandas as pd

    qids, qlabels, top_cos, _, rel_count = _dual_rankings(
        ds, k, query_mod, vec_col, id_col, label_col)
    rows = []
    for qid in qids:
        dcg = 0.0
        for rank, (vid, lab) in enumerate(top_cos[qid], 1):
            if lab == qlabels[qid]:
                dcg += 1.0 / math.log2(rank + 1)
        r = rel_count[qid]
        idcg = 0.0
        for i in range(1, min(k, r) + 1):
            idcg += 1.0 / math.log2(i + 1)
        rows.append((qid, r, dcg, idcg,
                     dcg / idcg if idcg > 0 else 0.0))
    return pd.DataFrame(rows, columns=[
        "query_id", "n_rel", "dcg", "idcg", "ndcg"]).astype(
            {"query_id": "int64", "n_rel": "int64"})


def retrieval_rbo(ds: ray.data.Dataset, k: int = 10, p: float = 0.9,
                  query_mod: int = 50, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Truncated Rank-Biased Overlap between the cosine and the raw
    dot-product rankings of each query — the metric-sensitivity audit
    (RBO 1.0 = norms don't matter for this query; low RBO = ranking
    is dominated by vector length, the classic unnormalized-embedding
    trap). RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d; prefixes
    beyond depth k never contribute, so the exact top-k lists
    suffice. Output (query_id, overlap_k, rbo)."""
    import pandas as pd

    qids, _, top_cos, top_dot, _ = _dual_rankings(
        ds, k, query_mod, vec_col, id_col, None)
    rows = []
    for qid in qids:
        a = [v for v, _ in top_cos[qid]]
        b = top_dot[qid]
        rbo = 0.0
        for d in range(1, k + 1):
            x = len(set(a[:d]) & set(b[:d]))
            rbo += (p ** (d - 1)) * (x / d)
        rbo *= (1.0 - p)
        rows.append((qid, len(set(a) & set(b)), rbo))
    return pd.DataFrame(rows, columns=["query_id", "overlap_k",
                                       "rbo"]).astype(
        {"query_id": "int64", "overlap_k": "int64"})
