"""Phonetic + string-similarity record-linkage kernels.

American Soundex blocking and Jaro-Winkler similarity — the classic
entity-resolution toolchain the edit-distance family
(``ops/dedup.py:edit_distance_self_join``) doesn't cover: Soundex
groups names that SOUND alike regardless of spelling distance, and
Jaro-Winkler scores transposition-heavy human typos that blow past a
Levenshtein budget. Both kernels are implemented to BIT-MATCH their
SQL twins (Soundex = the exact regexp-replace chain the oracle runs —
RE2 has no backreferences, so run-collapse is seven per-digit
replacements on both sides; Jaro-Winkler = DuckDB's
``jaro_winkler_similarity`` semantics, prefix ≤ 4, scale 0.1, boost
threshold 0.7, verified pairwise in tests).

Scale shape: both operators work over DISTINCT names (a skinny
pre-aggregation — the 100-TB corpus collapses to its name domain
before any quadratic work), blocking bounds the candidate space, and
per-block all-pairs runs inside ``map_groups`` with the documented
assumption that block cardinality ≪ corpus (heavy phonetic blocks
sub-split by a secondary key in production; block-size histogram is
part of the census output so skew is visible, not silent).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_SOUNDEX_MAP = str.maketrans({
    **{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"}, "L": "4", **{c: "5" for c in "MN"},
    "R": "6", **{c: "0" for c in "AEIOUYHW"},
})
_NON_ALPHA_RE = re.compile(r"[^A-Z]")
_RUN_RES = [re.compile(d + "{2,}") for d in "0123456"]


def soundex(word: str) -> str:
    """American Soundex (simplified-standard variant, documented here
    so the SQL twin can replay it EXACTLY): uppercase, strip non A-Z;
    map B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6, vowels
    + H W Y→0; collapse runs of equal digits (the first letter's
    digit participates, so "Pfister"→P236); drop the leading digit
    and every 0; first letter + first three remaining digits, zero-
    padded. Empty after stripping → ``""``."""
    u = _NON_ALPHA_RE.sub("", word.upper())
    if not u:
        return ""
    mapped = u.translate(_SOUNDEX_MAP)
    for rx in _RUN_RES:
        mapped = rx.sub(rx.pattern[0], mapped)
    digits = mapped[1:].replace("0", "")
    return u[0] + (digits + "000")[:3]


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity, DuckDB-parity arithmetic (single float
    expression at the end — no intermediate rounding)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    win = max(l1, l2) // 2 - 1
    if win < 0:
        win = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - win), min(l2, i + win + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler: Jaro boosted by shared prefix (≤ 4 chars) when
    above the boost threshold — ``jaro_winkler_similarity`` parity
    (pair-verified against DuckDB in tests/test_phonetic.py)."""
    j = jaro(s1, s2)
    if j > boost_threshold:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * prefix_scale * (1.0 - j)
    return j


def _distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Distributed distinct over one column: per-batch partial distinct
    (collapses the bulk before the shuffle) then one key groupby."""
    return (ds.select_columns([col])
            .map_batches(lambda t: t.group_by(col).aggregate([]),
                         batch_format="pyarrow")
            .groupby(col)
            .map_groups(lambda g: g.head(1), batch_format="pandas"))


def soundex_census(ds: ray.data.Dataset, col: str) -> pd.DataFrame:
    """Phonetic blocking census: Soundex code of every DISTINCT value
    of ``col`` → per-code block statistics ``(code, n_names,
    min_name)``, ordered by (n_names desc, code). The block-size
    histogram IS the blocking-quality audit: a fat block means the
    phonetic key under-segments and per-block quadratic verify work
    explodes — visible here before it burns a cluster.

    Scale shape: distinct-value pre-aggregation (one skinny shuffle of
    the name domain), then a pure map (soundex) and one O(codes)
    groupby. Nothing corpus-sized moves."""

    def code_batch(b: pd.DataFrame) -> pd.DataFrame:
        names = b[col]
        return pd.DataFrame({
            "code": [soundex(x) for x in names], "name": names.to_numpy()})

    distinct = _distinct(ds, col)
    out = (distinct.map_batches(code_batch, batch_format="pandas")
           .groupby("code")
           .map_groups(lambda g: pd.DataFrame({
               "code": [g["code"].iloc[0]],
               "n_names": [len(g)],
               "min_name": [g["name"].min()]}), batch_format="pandas")
           .to_pandas())
    return out.sort_values(["n_names", "code"],
                           ascending=[False, True]).reset_index(drop=True)


def jw_self_join(ds: ray.data.Dataset, col: str, threshold: float,
                 num_buckets: int = 32) -> pd.DataFrame:
    """Blocked Jaro-Winkler similarity self-join over DISTINCT values
    of ``col``: candidates share a first character and differ in
    length by ≤ 1 (the standard cheap blocking for JW, which decays
    fast without a common prefix — a pair failing BOTH predicates
    cannot reach interesting thresholds for name-length strings);
    emits ``(a, b, jw)`` with ``a < b`` and ``jw ≥ threshold``.

    Scale shape: distinct-name pre-aggregation, then each name is
    replicated to its own length block and its length-1 neighbor
    (so every qualifying pair meets in exactly ONE block: the block
    keyed by the SHORTER length), and per-block all-pairs verify runs
    inside ``map_groups``. Blocks are (first-char × length) — skew
    bounded by the name-length distribution; the census operator is
    the audit for that."""

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        names = b[col].to_numpy()
        first = np.array([n[:1] for n in names])
        ln = np.array([len(n) for n in names], dtype=np.int64)
        # home block (anchor=True verifies same-length pairs) and the
        # (len-1) block as guest (verifies cross-length pairs there)
        home = pd.DataFrame({"name": names, "first": first, "blen": ln,
                             "guest": False})
        guest = pd.DataFrame({"name": names, "first": first,
                              "blen": ln - 1, "guest": True})
        return pd.concat([home, guest], ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        anchors = sorted(g.loc[~g["guest"], "name"])
        guests = sorted(g.loc[g["guest"], "name"])
        rows_a, rows_b, rows_j = [], [], []
        for i, a in enumerate(anchors):
            # same-length pairs: within anchors, each unordered pair once
            for b2 in anchors[i + 1:]:
                j = jaro_winkler(a, b2)
                if j >= threshold:
                    x, y = (a, b2) if a < b2 else (b2, a)
                    rows_a.append(x)
                    rows_b.append(y)
                    rows_j.append(j)
            # cross-length pairs: anchor (len L) × guest (len L+1)
            for b2 in guests:
                j = jaro_winkler(a, b2)
                if j >= threshold:
                    x, y = (a, b2) if a < b2 else (b2, a)
                    rows_a.append(x)
                    rows_b.append(y)
                    rows_j.append(j)
        return pd.DataFrame({"a": rows_a, "b": rows_b, "jw": rows_j})

    pairs = (_distinct(ds, col).map_batches(expand, batch_format="pandas")
             .groupby(["first", "blen"])
             .map_groups(verify, batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="object"),
                             "b": pd.Series([], dtype="object"),
                             "jw": pd.Series([], dtype="float64")})
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def blocking_quality(names_ds: ray.data.Dataset,
                     truth_ds: ray.data.Dataset,
                     col: str = "name") -> pd.DataFrame:
    """Blocking-scheme evaluation — the record-linkage pre-flight: for
    each candidate-generation scheme, how much of the pair space does
    it prune (reduction ratio) and how many TRUE match pairs does it
    still cover (pairs completeness / recall)? Schemes evaluated:

    - ``first_len``: same first character AND length within ±1 (the
      cheap JW blocking of :func:`jw_self_join`);
    - ``soundex``: equal Soundex code (phonetic blocking).

    ``names_ds`` is the registry (one string column ``col``; distinct
    applied here); ``truth_ds`` holds known-match pairs (columns
    ``a``, ``b``). Candidate counts come from BLOCK-SIZE HISTOGRAMS,
    never pair enumeration: same-block pairs = Σ C(n_block, 2) (+ the
    cross-length-neighbor products for first_len) — O(blocks) driver
    arithmetic, so a 10^9-name registry costs one skinny groupby.
    Truth coverage is a pure map over the O(truth) pair list. Output
    per scheme: (scheme, n_names, total_pairs, n_candidates,
    reduction_ratio, n_truth, n_covered, recall).
    """
    distinct = _distinct(names_ds, col).materialize()
    n_names = distinct.count()
    total_pairs = n_names * (n_names - 1) // 2

    def keys_batch(b: pd.DataFrame) -> pd.DataFrame:
        names = b[col]
        return pd.DataFrame({
            "first": [x[:1] for x in names],
            "blen": [len(x) for x in names],
            "code": [soundex(x) for x in names]})

    keyed = distinct.map_batches(keys_batch, batch_format="pandas")
    fl = keyed.groupby(["first", "blen"]).count().to_pandas()
    sx = keyed.groupby("code").count().to_pandas()

    fl_sizes = {(f, int(l)): int(n) for f, l, n in
                zip(fl["first"], fl["blen"], fl["count()"])}
    cand_fl = sum(n * (n - 1) // 2 for n in fl_sizes.values())
    cand_fl += sum(n * fl_sizes.get((f, l + 1), 0)
                   for (f, l), n in fl_sizes.items())
    cand_sx = sum(int(n) * (int(n) - 1) // 2 for n in sx["count()"])

    def truth_flags(b: pd.DataFrame) -> pd.DataFrame:
        fl_hit, sx_hit = [], []
        for a, b2 in zip(b["a"], b["b"]):
            fl_hit.append(a[:1] == b2[:1] and abs(len(a) - len(b2)) <= 1)
            sx_hit.append(soundex(a) == soundex(b2))
        return pd.DataFrame({"fl": np.asarray(fl_hit, dtype=np.int64),
                             "sx": np.asarray(sx_hit, dtype=np.int64),
                             "one": np.ones(len(b), dtype=np.int64)})

    flags = truth_ds.map_batches(truth_flags, batch_format="pandas")
    tf = flags.sum(["fl", "sx", "one"])
    n_truth = int(tf["sum(one)"])
    cov = {"first_len": int(tf["sum(fl)"]), "soundex": int(tf["sum(sx)"])}
    cand = {"first_len": cand_fl, "soundex": cand_sx}
    rows = []
    for scheme in ("first_len", "soundex"):
        rows.append((scheme, n_names, total_pairs, cand[scheme],
                     1.0 - cand[scheme] / total_pairs, n_truth,
                     cov[scheme], cov[scheme] / n_truth))
    return pd.DataFrame(rows, columns=[
        "scheme", "n_names", "total_pairs", "n_candidates",
        "reduction_ratio", "n_truth", "n_covered", "recall"]).astype({
            "n_names": "int64", "total_pairs": "int64",
            "n_candidates": "int64", "n_truth": "int64",
            "n_covered": "int64"})


def catalog_corrupt_names(b: pd.DataFrame, key_col: str = "p_partkey",
                          name_col: str = "p_name") -> pd.DataFrame:
    """Deterministic typo planting for the dirty-catalog linkage
    queries: key mod 3 selects delete / adjacent-swap / duplicate at a
    key-derived position — replayed verbatim by the SQL twins' substr
    arithmetic. Returns (clean, dirty); lives in the package (not the
    entry module) so worker closures referencing it ship by value."""
    dirty = []
    for k, n in zip(b[key_col].astype("int64"), b[name_col]):
        L = len(n)
        if k % 3 == 0:
            d = int(k) % L
            v = n[:d] + n[d + 1:]
        elif k % 3 == 1:
            s = int(k) % (L - 1)
            v = n[:s] + n[s + 1] + n[s] + n[s + 2:]
        else:
            d = int(k) % L
            v = n[:d + 1] + n[d] + n[d + 1:]
        dirty.append(v)
    return pd.DataFrame({"clean": b[name_col].to_numpy(),
                         "dirty": dirty})


def entity_resolution(names_ds: ray.data.Dataset, col: str = "name",
                      threshold: float = 0.92) -> pd.DataFrame:
    """End-to-end deterministic entity resolution over a name
    registry: blocked Jaro-Winkler candidate pairs
    (:func:`jw_self_join`, first-char + length±1 blocking) at
    ``threshold``, transitive closure into entities, canonical name =
    the LEXICOGRAPHICALLY SMALLEST member (which equals the min name
    reachable through match edges — exactly what the SQL twin's
    recursive min-string propagation computes). Every registry name
    maps somewhere; matchless names are their own singleton entity.
    Output: (name, canonical, cluster_size) ordered by name.

    Scale shape: pairs come from the blocked join (distinct-name
    domain, histogram-bounded blocks); the closure runs on
    ``ops/graph.py:connected_components`` over skinny hashed-id
    edges (the distributed star-contraction path above the driver
    threshold), with an explicit collision guard — a 64-bit name-hash
    collision would silently merge entities, so it raises instead.
    Transitive closure is the honest failure mode of threshold
    linkage (chains over-merge); the census/blocking-quality
    operators are the knobs-audit for that."""
    from ..functions.urls import hash64_batch
    from .graph import connected_components

    pairs = jw_self_join(names_ds, col, threshold=threshold)
    distinct = _distinct(names_ds, col).to_pandas()
    names = distinct[col].to_numpy()
    hashes = np.asarray(hash64_batch(list(names)), dtype=np.int64)
    if len(np.unique(hashes)) != len(names):
        raise ValueError("64-bit name-hash collision in registry; "
                         "entity merge would be unsound")
    h_of = dict(zip(names, hashes))
    name_of = dict(zip(hashes, names))

    if len(pairs):
        edges = ray.data.from_pandas(pd.DataFrame({
            "a": [h_of[x] for x in pairs["a"]],
            "b": [h_of[x] for x in pairs["b"]]}))
        comp = connected_components(edges).to_pandas()
        root_h = dict(zip(comp["node"].astype("int64"),
                          comp["component"].astype("int64")))
    else:
        root_h = {}
    # component label is the min HASH — map to the min NAME member
    members: dict[int, list] = {}
    for nm in names:
        r = root_h.get(int(h_of[nm]), int(h_of[nm]))
        members.setdefault(r, []).append(nm)
    rows = []
    for r, ms in members.items():
        canon = min(ms)
        for nm in ms:
            rows.append((nm, canon, len(ms)))
    out = pd.DataFrame(rows, columns=["name", "canonical",
                                      "cluster_size"])
    out["cluster_size"] = out["cluster_size"].astype("int64")
    return out.sort_values("name").reset_index(drop=True)


def fs_weights(names_ds: ray.data.Dataset, truth_ds: ray.data.Dataset,
               col: str = "name") -> pd.DataFrame:
    """Fellegi-Sunter agreement weights — the probabilistic scoring
    layer of record linkage: over the blocked candidate-pair space
    (first-char + length±1, the :func:`jw_self_join` blocking), each
    pair's agreement PATTERN on three cheap comparators
    (Soundex-equal, length-equal, first-token-equal) gets the
    log-likelihood-ratio weight

        w(pattern) = log2( m(pattern) / u(pattern) ),

    m = P(pattern | match) from the truth pairs, u = P(pattern |
    non-match) from the remaining candidates — add-one smoothed
    ((c+1)/(n+2)) so empty cells stay finite. Counts are exact
    integers folded from per-block partials (truth membership checks
    against a broadcast truth set — O(truth) state); the single
    log2-of-a-ratio-of-two-int-divisions float is replayed verbatim
    by the SQL twin. Output one row per pattern 0..7:
    (pattern, f_soundex, f_len, f_first, n_match, n_nonmatch,
    m_prob, u_prob, weight)."""
    import math

    truth_pd = truth_ds.to_pandas()
    truth_set = set(zip(truth_pd["a"], truth_pd["b"]))
    tref = ray.put(truth_set)

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        names = b[col].to_numpy()
        first = np.array([n[:1] for n in names])
        ln = np.array([len(n) for n in names], dtype=np.int64)
        home = pd.DataFrame({"name": names, "first": first,
                             "blen": ln, "guest": False})
        guest = pd.DataFrame({"name": names, "first": first,
                              "blen": ln - 1, "guest": True})
        return pd.concat([home, guest], ignore_index=True)

    def pattern_of(a: str, b: str) -> int:
        f1 = int(soundex(a) == soundex(b))
        f2 = int(len(a) == len(b))
        f3 = int(a.split(" ", 1)[0] == b.split(" ", 1)[0])
        return 4 * f1 + 2 * f2 + f3

    def count_block(g: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(tref)
        anchors = sorted(g.loc[~g["guest"], "name"])
        guests = sorted(g.loc[g["guest"], "name"])
        mc = np.zeros(8, dtype=np.int64)
        uc = np.zeros(8, dtype=np.int64)
        for i, a in enumerate(anchors):
            for b2 in anchors[i + 1:]:
                x, y = (a, b2) if a < b2 else (b2, a)
                (mc if (x, y) in ts else uc)[pattern_of(x, y)] += 1
            for b2 in guests:
                x, y = (a, b2) if a < b2 else (b2, a)
                (mc if (x, y) in ts else uc)[pattern_of(x, y)] += 1
        return pd.DataFrame({"pattern": np.arange(8, dtype=np.int64),
                             "n_match": mc, "n_nonmatch": uc})

    parts = (_distinct(names_ds, col)
             .map_batches(expand, batch_format="pandas")
             .groupby(["first", "blen"])
             .map_groups(count_block, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("pattern", as_index=False)[
        ["n_match", "n_nonmatch"]].sum()
    full = pd.DataFrame({"pattern": np.arange(8, dtype=np.int64)})
    agg = full.merge(agg, on="pattern", how="left").fillna(0)
    mn = int(agg["n_match"].sum())
    un = int(agg["n_nonmatch"].sum())
    rows = []
    for _, r in agg.iterrows():
        pat = int(r["pattern"])
        mc, uc = int(r["n_match"]), int(r["n_nonmatch"])
        m_prob = float(mc + 1) / float(mn + 2)
        u_prob = float(uc + 1) / float(un + 2)
        rows.append((pat, pat // 4, (pat // 2) % 2, pat % 2, mc, uc,
                     m_prob, u_prob, math.log2(m_prob / u_prob)))
    return pd.DataFrame(rows, columns=[
        "pattern", "f_soundex", "f_len", "f_first", "n_match",
        "n_nonmatch", "m_prob", "u_prob", "weight"]).astype({
            "pattern": "int64", "f_soundex": "int64", "f_len": "int64",
            "f_first": "int64", "n_match": "int64",
            "n_nonmatch": "int64"})


def capture_recapture(names_ds: ray.data.Dataset,
                      truth_ds: ray.data.Dataset,
                      col: str = "name") -> pd.DataFrame:
    """Chapman capture-recapture estimate of the TRUE match-pair count
    from two independent blocking "samplers" — the trick ecology uses
    for population size, applied to linkage completeness: scheme A
    (first-char + length±1) catches n_A truth pairs, scheme B
    (Soundex) catches n_B, both catch m; Chapman's
    N̂ = (n_A+1)(n_B+1)/(m+1) − 1 estimates how many matches EXIST —
    including ones neither scheme surfaces — without ever enumerating
    them. Compared here against the planted ground truth (which real
    pipelines don't have — that's the point of the estimator).
    Exact integer counts from a pure map over the truth pairs; one
    float expression. Output one row: (n_truth, n_a, n_b, n_both,
    chapman_est, est_over_truth)."""

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        fa, fb = [], []
        for a, b2 in zip(b["a"], b["b"]):
            fa.append(int(a[:1] == b2[:1]
                          and abs(len(a) - len(b2)) <= 1))
            fb.append(int(soundex(a) == soundex(b2)))
        return pd.DataFrame({
            "fa": np.asarray(fa, dtype=np.int64),
            "fb": np.asarray(fb, dtype=np.int64),
            "fab": np.asarray(fa, dtype=np.int64)
            * np.asarray(fb, dtype=np.int64),
            "one": np.ones(len(b), dtype=np.int64)})

    f = truth_ds.map_batches(flags, batch_format="pandas") \
        .sum(["fa", "fb", "fab", "one"])
    na, nb, m, nt = (int(f["sum(fa)"]), int(f["sum(fb)"]),
                     int(f["sum(fab)"]), int(f["sum(one)"]))
    est = float((na + 1) * (nb + 1)) / float(m + 1) - 1.0
    return pd.DataFrame({
        "n_truth": pd.Series([nt], dtype="int64"),
        "n_a": pd.Series([na], dtype="int64"),
        "n_b": pd.Series([nb], dtype="int64"),
        "n_both": pd.Series([m], dtype="int64"),
        "chapman_est": [est],
        "est_over_truth": [est / float(nt) if nt else float("nan")]})
