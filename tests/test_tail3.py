"""Edge-case conformance for the round-3 second-tail operators:
2-D skyline, BFS hops, SCD2 intervals, first-touch attribution and
cross-doc span dedup. The hash-exact DuckDB comparison for each lives
in test_queries_oracle.py; these pin the corner semantics the synthetic
tables may not exercise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data


# ---------------------------------------------------------------- skyline
def _brute_skyline(df: pd.DataFrame) -> set[int]:
    keep = set()
    rows = df.to_dict("records")
    for p in rows:
        dominated = any(
            q["mn"] <= p["mn"] and q["mx"] >= p["mx"]
            and (q["mn"] < p["mn"] or q["mx"] > p["mx"])
            for q in rows)
        if not dominated:
            keep.add(p["id"])
    return keep


def test_skyline_matches_bruteforce_including_duplicates():
    from web2llmstxt_ray.ops.relational import skyline_2d

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "id": np.arange(300, dtype="int64"),
        "mn": rng.integers(0, 40, 300).astype("int64"),
        "mx": rng.integers(0, 40, 300).astype("int64"),
    })
    # force duplicate points (equal pairs must BOTH survive when
    # they sit on the frontier — strict-dominance semantics)
    df.loc[250:, ["mn", "mx"]] = df.loc[:49, ["mn", "mx"]].to_numpy()
    ds = ray.data.from_pandas(df).repartition(7)
    out = skyline_2d(ds, "id", "mn", "mx")
    assert set(out["id"]) == _brute_skyline(df)


def test_skyline_equal_points_all_survive():
    from web2llmstxt_ray.ops.relational import skyline_2d

    df = pd.DataFrame({"id": [1, 2, 3], "mn": [5, 5, 9],
                       "mx": [7, 7, 2]})
    out = skyline_2d(ray.data.from_pandas(df).repartition(2),
                     "id", "mn", "mx")
    # (9,2) dominated by nothing? 5<=9 and 7>=2 with strict → dominated
    assert set(out["id"]) == {1, 2}


# ---------------------------------------------------------------- bfs
def test_bfs_hops_chain_and_cutoff():
    from web2llmstxt_ray.ops.graph import bfs_hops

    edges = ray.data.from_pandas(pd.DataFrame({
        "u": [0, 1, 2, 3, 10],
        "v": [1, 2, 3, 4, 11]})).repartition(2)
    out = bfs_hops(edges, seed=0, max_hops=3)
    got = dict(zip(out["node"], out["dist"]))
    # node 4 is 4 hops away → cut off; 10/11 disconnected → absent
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_undirected_and_min_dist():
    from web2llmstxt_ray.ops.graph import bfs_hops

    # triangle 0-1-2 plus a long way round to 3: dist(3) must be the
    # minimum (2 via 0-2-3), reverse-direction edges must count
    edges = ray.data.from_pandas(pd.DataFrame({
        "u": [1, 2, 3, 1],
        "v": [0, 0, 2, 2]}))
    out = bfs_hops(edges, seed=0, max_hops=5)
    got = dict(zip(out["node"], out["dist"]))
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_isolated_seed():
    from web2llmstxt_ray.ops.graph import bfs_hops

    edges = ray.data.from_pandas(pd.DataFrame({"u": [5], "v": [6]}))
    out = bfs_hops(edges, seed=99, max_hops=3)
    assert out.to_dict("records") == [{"node": 99, "dist": 0}]


# ---------------------------------------------------------------- scd2
def _ev(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return ray.data.from_pandas(df).repartition(2)


def test_scd2_runs_compress_and_valid_to_chains():
    from web2llmstxt_ray.ops.windows import scd2_intervals

    ds = _ev([
        (1, 7, "2024-01-01 00:00:00", "view"),
        (2, 7, "2024-01-01 00:01:00", "view"),
        (3, 7, "2024-01-01 00:02:00", "click"),
        (4, 7, "2024-01-01 00:03:00", "view"),
        (5, 8, "2024-01-01 00:00:30", "signup"),
    ])
    out = (scd2_intervals(ds).to_pandas()
           .sort_values(["user_id", "valid_from"])
           .reset_index(drop=True))
    u7 = out.loc[out["user_id"] == 7]
    assert list(u7["event_type"]) == ["view", "click", "view"]
    assert list(u7["n_events"]) == [2, 1, 1]
    # valid_to chains exactly onto the next run's valid_from
    assert list(u7["valid_to"].iloc[:-1]) == list(
        u7["valid_from"].iloc[1:])
    assert pd.isna(u7["valid_to"].iloc[-1])
    u8 = out.loc[out["user_id"] == 8]
    assert len(u8) == 1 and pd.isna(u8["valid_to"].iloc[0])


def test_scd2_tie_timestamps_break_on_event_id():
    from web2llmstxt_ray.ops.windows import scd2_intervals

    ds = _ev([
        (2, 1, "2024-01-01", "b"),
        (1, 1, "2024-01-01", "a"),
        (3, 1, "2024-01-01", "b"),
    ])
    out = (scd2_intervals(ds).to_pandas()
           .sort_values("valid_from").reset_index(drop=True))
    # order by (ts, event_id): a(1), b(2), b(3) → runs a, bb
    assert list(out["event_type"]) == ["a", "b"]
    assert list(out["n_events"]) == [1, 2]


# ----------------------------------------------------- first touch
def _ev_val(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"], format="mixed") \
        .astype("datetime64[us]")
    return ray.data.from_pandas(df).repartition(2)


def test_first_touch_window_boundary_and_direct():
    from web2llmstxt_ray.ops.windows import first_touch_attribution

    ds = _ev_val([
        # u1: click exactly 7 days before → INSIDE the window
        (1, 1, "2024-01-01 00:00:00", "click", 0.0),
        (2, 1, "2024-01-08 00:00:00", "purchase", 10.0),
        # u2: view 7 days + 1 µs before → OUTSIDE → direct
        (3, 2, "2024-01-01 00:00:00", "view", 0.0),
        (4, 2, "2024-01-08 00:00:00.000001", "purchase", 5.0),
        # u3: no prior events at all → direct
        (5, 3, "2024-01-05 00:00:00", "purchase", 2.5),
    ])
    out = first_touch_attribution(ds, lookback_days=7)
    got = {r["channel"]: (r["revenue_i"], r["n_purchases"])
           for r in out.to_dict("records")}
    assert got == {"click": (1000, 1), "direct": (750, 2)}


def test_first_touch_earliest_in_window_not_latest():
    from web2llmstxt_ray.ops.windows import first_touch_attribution

    ds = _ev_val([
        (1, 1, "2024-01-02", "signup", 0.0),
        (2, 1, "2024-01-03", "click", 0.0),
        (3, 1, "2024-01-04", "purchase", 1.0),
    ])
    out = first_touch_attribution(ds, lookback_days=7)
    assert out.loc[out["channel"] == "signup",
                   "revenue_i"].iloc[0] == 100


def test_first_touch_same_ts_earlier_event_id_counts():
    from web2llmstxt_ray.ops.windows import first_touch_attribution

    ds = _ev_val([
        (1, 1, "2024-01-04 12:00:00", "view", 0.0),
        (2, 1, "2024-01-04 12:00:00", "purchase", 3.0),
    ])
    out = first_touch_attribution(ds, lookback_days=7)
    got = dict(zip(out["channel"], out["revenue_i"]))
    assert got == {"view": 300}


# ----------------------------------------------------- span dedup
def test_span_dedup_first_doc_wins_media_kept():
    from web2llmstxt_ray.ops.nested import span_dedup_counts

    flat = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["10", "10", "2", "2", "2"],
        "span_idx": [0, 1, 0, 1, 2],
        "kind": ["text", "image", "text", "text", "image"],
        "text": ["dup", "", "dup", "uniq", ""],
        "media_ref": ["", "m1", "", "", "m2"],
        "span_offset": [0, 64, 0, 64, 128],
    })).repartition(2)
    out = span_dedup_counts(flat).set_index("doc_id")
    # doc "2" wins "dup" (int order 2 < 10, NOT string order)
    assert out.loc["2", "n_kept"] == 3 and out.loc["2", "n_dropped"] == 0
    assert out.loc["10", "n_kept"] == 1     # the image span
    assert out.loc["10", "n_dropped"] == 1  # its "dup" text lost


# ------------------------------------------- running distinct users
def test_running_distinct_counts_first_seen_only():
    from web2llmstxt_ray.ops.windows import running_distinct_counts

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 1, 3, 2],
        "ts": pd.to_datetime([
            "2024-01-01 05:00", "2024-01-02 06:00",
            "2024-01-01 07:00", "2024-01-03 08:00",
            "2024-01-03 09:00", "2024-01-03 10:00"]),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = running_distinct_counts(
        ray.data.from_pandas(df).repartition(3))
    assert list(out["new_users"]) == [2, 1]   # day1: u1,u2; day3: u3
    assert list(out["cum_users"]) == [2, 3]
    assert out["day"].iloc[0] == pd.Timestamp("2024-01-01")


# ------------------------------------------- linear attribution
def test_linear_attribution_exact_remainder_split():
    from web2llmstxt_ray.ops.windows import linear_touch_attribution

    ds = _ev_val([
        (1, 1, "2024-01-02", "signup", 0.0),
        (2, 1, "2024-01-03", "click", 0.0),
        (3, 1, "2024-01-04", "view", 0.0),
        # 1.00 → 100 cents over 3 touches: 34/33/33, earliest +1
        (4, 1, "2024-01-05", "purchase", 1.0),
        # no window → direct in full
        (5, 2, "2024-01-05", "purchase", 2.0),
    ])
    out = linear_touch_attribution(ds, lookback_days=7)
    got = {r["channel"]: r["revenue_i"] for r in out.to_dict("records")}
    assert got == {"signup": 34, "click": 33, "view": 33,
                   "direct": 200}
    # credits reconcile exactly to the purchase totals
    assert out["revenue_i"].sum() == 300


# ------------------------------------------- edit-distance join
def test_edit_distance_join_matches_bruteforce():
    from web2llmstxt_ray.ops.dedup import _ed_le1, edit_distance_self_join

    names = ["widget", "widgets",          # insertion
             "wodget",                     # substitution vs widget
             "idget",                      # deletion vs widget
             "gadget",                     # ed 3 from widget
             "xa", "ay",                   # ed-2 false-positive cands
             "bolt", "bolt"]               # duplicate value → one node
    ds = ray.data.from_pandas(
        pd.DataFrame({"s": names})).repartition(3)
    out = edit_distance_self_join(ds, "s")
    got = set(zip(out["name_a"], out["name_b"]))
    uniq = sorted(set(names))
    want = {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1:]
            if _ed_le1(a, b)}
    assert got == want
    assert ("widget", "widgets") in got and ("idget", "widget") in got
    assert ("ay", "xa") not in got        # shared variant, ed 2
    assert (out["dist"] == 1).all()


def test_ed_le1_kernel():
    from web2llmstxt_ray.ops.dedup import _ed_le1

    assert _ed_le1("abc", "abc") and _ed_le1("abc", "abd")
    assert _ed_le1("abc", "abcd") and _ed_le1("abc", "bc")
    assert not _ed_le1("abc", "adc" + "x") and not _ed_le1("ab", "ba")
    assert not _ed_le1("abcd", "cdab")


# ------------------------------------------- span delta (crawl CDC)
def test_span_delta_multiset_semantics():
    from web2llmstxt_ray.ops.nested import span_delta_counts

    def flat(rows):
        df = pd.DataFrame(rows, columns=["doc_id", "kind", "text",
                                         "media_ref"])
        df["span_idx"] = range(len(df))
        df["span_offset"] = 0
        return ray.data.from_pandas(df).repartition(2)

    old = flat([("1", "text", "A", ""), ("1", "text", "A", ""),
                ("1", "text", "B", ""), ("1", "image", "", "m1")])
    new = flat([("1", "text", "A", ""), ("1", "text", "B", ""),
                ("1", "text", "B", ""), ("1", "image", "", "m1"),
                ("1", "image", "", "m2")])
    out = span_delta_counts(old, new)
    r = out.iloc[0]
    # unchanged = min-counts: A×1 + B×1 + m1×1 = 3
    assert (r["n_unchanged"], r["n_added"], r["n_removed"]) == (3, 2, 1)


def test_span_delta_identical_crawls_all_unchanged():
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_delta_counts)

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["x" * 200, "y" * 130]}))
    flat_a = explode_spans(build_span_docs(docs))
    flat_b = explode_spans(build_span_docs(docs))
    out = span_delta_counts(flat_a, flat_b)
    assert (out["n_added"] == 0).all() and (out["n_removed"] == 0).all()
    assert out["n_unchanged"].sum() == flat_a.count()


# ------------------------------------------- funnel timeout
def test_funnel_within_seconds_gates_conversion():
    from web2llmstxt_ray.ops.events import funnel

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_type": ["view", "click", "view", "click"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:30",   # in the hour
            "2024-01-01 00:00", "2024-01-01 02:00"]),  # too late
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    ds = ray.data.from_pandas(df).repartition(2)
    strict = funnel(ds, ["view", "click"], within_seconds=3600)
    loose = funnel(ds, ["view", "click"])
    assert list(strict["n_users"]) == [2, 1]
    assert list(loose["n_users"]) == [2, 2]   # default unchanged


# ------------------------------------------- budget allocation
def test_budget_allocation_largest_remainder_exact():
    from web2llmstxt_ray.ops.recrawl import budget_allocation

    df = pd.DataFrame({"host": ["a", "b", "c"],
                       "pages": [5, 3, 2]})
    ds = ray.data.from_pandas(df).repartition(2)
    out = budget_allocation(ds, "host", "pages", budget=7)
    # floors: 3.5→3, 2.1→2, 1.4→1 (sum 6); leftover 1 → largest
    # remainder a (.5) over c (.4) over b (.1)
    assert dict(zip(out["host"], out["alloc"])) == \
        {"a": 4, "b": 2, "c": 1}
    assert out["alloc"].sum() == 7


def test_budget_allocation_tie_breaks_on_key_and_overflow_path():
    from web2llmstxt_ray.ops.recrawl import budget_allocation

    # equal remainders → earlier key wins the leftover slot
    df = pd.DataFrame({"host": ["x", "y"], "pages": [1, 1]})
    out = budget_allocation(ray.data.from_pandas(df), "host",
                            "pages", budget=3)
    assert dict(zip(out["host"], out["alloc"])) == {"x": 2, "y": 1}
    # weights big enough that budget·W overflows int64 → exact
    # Python-int path must produce the same proportional answer
    big = 2**60
    df2 = pd.DataFrame({"host": ["p", "q"], "pages": [big, 3 * big]})
    out2 = budget_allocation(ray.data.from_pandas(df2), "host",
                             "pages", budget=100)
    assert dict(zip(out2["host"], out2["alloc"])) == {"p": 25, "q": 75}


# ------------------------------------------- band self-join
def test_band_self_join_boundaries():
    from web2llmstxt_ray.ops.windows import band_self_join_counts

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([
            "2024-01-01",          # a
            "2024-01-01",          # a' (same instant → no pair)
            "2024-01-08",          # exactly +7d from a/a' → counts
            "2024-01-20",          # isolated
            "2024-01-01", "2024-01-02"]),   # other key: one pair
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = band_self_join_counts(
        ray.data.from_pandas(df).repartition(3), "k", "ts",
        band_seconds=7 * 86_400)
    got = dict(zip(out["k"], out["n_pairs"]))
    assert got == {1: 2, 2: 1}


# ------------------------------------------- k-core
def _brute_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    import collections
    live = set(edges)
    while True:
        deg = collections.Counter()
        for a, b in live:
            deg[a] += 1
            deg[b] += 1
        weak = {n for n, d in deg.items() if d < k}
        if not weak:
            return dict(deg)
        live = {(a, b) for a, b in live
                if a not in weak and b not in weak}


def test_kcore_triangle_with_tail():
    from web2llmstxt_ray.ops.graph import k_core

    # triangle 0-1-2 plus a tail 2-3-4: 2-core = the triangle only
    e = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    ds = ray.data.from_pandas(pd.DataFrame(e, columns=["u", "v"])) \
        .repartition(2)
    out = k_core(ds, k=2)
    assert dict(zip(out["node"], out["degree"])) == {0: 2, 1: 2, 2: 2}


def test_kcore_chain_empty_and_random_parity():
    from web2llmstxt_ray.ops.graph import k_core

    chain = [(i, i + 1) for i in range(6)]
    out = k_core(ray.data.from_pandas(
        pd.DataFrame(chain, columns=["u", "v"])), k=2)
    assert len(out) == 0

    rng = np.random.default_rng(11)
    e = sorted({(int(a), int(b)) for a, b in
                rng.integers(0, 30, (120, 2)) if a < b})
    ds = ray.data.from_pandas(
        pd.DataFrame(e, columns=["u", "v"])).repartition(3)
    for k in (2, 3, 4):
        got = dict(zip(*(k_core(ds, k=k)[c]
                         for c in ("node", "degree"))))
        assert got == _brute_kcore(e, k), k


# ------------------------------------------- span dedup filter
def test_span_dedup_filter_unique_and_media_preserved():
    from web2llmstxt_ray.ops.nested import (
        build_span_docs, explode_spans, span_dedup_filter)

    # doc 2 and doc 10 share identical text → doc 2 wins every span
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [2, 10, 3],
        "text": ["abc" * 100, "abc" * 100, "zz" * 80]}))
    flat = explode_spans(build_span_docs(docs))
    kept = span_dedup_filter(flat).to_pandas()
    txt = kept.loc[kept["kind"] == "text"]
    assert txt["text"].is_unique
    assert set(txt["doc_id"]) == {"2", "3"}     # doc 10 lost all text
    # media spans all survive
    n_media_in = flat.filter(expr="kind != 'text'").count()
    assert (kept["kind"] != "text").sum() == n_media_in


def test_interleaved_corpus_prep_invariants():
    import __ray_entry__ as E

    out = E.queries()["interleaved_corpus_prep"](
        "/root/testdata/sf0.001")
    assert len(out) > 0
    # every pack respects the budget unless it is a singleton doc
    over = out.loc[out["total_cost"] > 1024]
    assert (over["n_docs"] == 1).all()
    # every doc appears exactly once across packs
    ids = [d for s in out["doc_ids"] for d in s.split(",")]
    assert len(ids) == len(set(ids))


# ------------------------------------------- peak concurrency
def test_peak_concurrency_closed_intervals_and_offsets():
    from web2llmstxt_ray.ops.windows import peak_concurrency

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:10",   # s1 10:00-10:10
            "2024-01-01 10:10", "2024-01-01 10:20",   # s2 touches s1
            "2024-01-05 00:00"]),                     # far singleton
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = peak_concurrency(ray.data.from_pandas(df).repartition(2))
    # closed intervals: s2 starts the instant s1 ends → concurrent
    assert out["peak_concurrency"].iloc[0] == 2
    assert out["n_sessions"].iloc[0] == 3


def test_peak_concurrency_gap_splits_sessions():
    from web2llmstxt_ray.ops.windows import peak_concurrency

    # one user, two events 31 min apart → two sessions, peak 1
    df = pd.DataFrame({
        "user_id": [9, 9],
        "ts": pd.to_datetime(["2024-01-01 00:00",
                              "2024-01-01 00:31"]),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = peak_concurrency(ray.data.from_pandas(df))
    assert (out["peak_concurrency"].iloc[0],
            out["n_sessions"].iloc[0]) == (1, 2)


# ------------------------------------------- batch G edge cases
def test_qty_quantiles_disc_exact_rule():
    import __ray_entry__ as E

    out = E.queries()["qty_quantiles_disc"]("/root/testdata/sf0.001")
    # discrete quantiles are actual data values and ordered
    assert (out["p25"] <= out["p50"]).all()
    assert (out["p50"] <= out["p75"]).all()


def test_nation_share_sums_to_one_per_region():
    import __ray_entry__ as E

    out = E.queries()["nation_share_of_region"](
        "/root/testdata/sf0.001")
    s = out.groupby("r_name")["share"].sum()
    assert np.allclose(s.to_numpy(), 1.0, atol=1e-12)


# ------------------------------------------- batch I edge cases
def test_render_text_media_tokens_order():
    from web2llmstxt_ray.ops.nested import render_text_with_media_tokens

    flat = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["1", "1", "1"],
        "span_idx": [0, 1, 2],
        "kind": ["text", "image", "text"],
        "text": ["hello ", "", "world"],
        "media_ref": ["", "m", ""],
        "span_offset": [0, 64, 128],
    }))
    out = render_text_with_media_tokens(flat).to_pandas()
    assert out["rendered"].iloc[0] == "hello <image>world"


def test_twap_duration_weighting_and_last_drop():
    from web2llmstxt_ray.ops.windows import time_weighted_average

    # value 1.00 held 3 s, then 4.00 held 1 s → twap = 175 cents;
    # the final observation (9.00) has no duration and drops
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [5, 5, 5],
        "ts": pd.to_datetime(["2024-01-01 00:00:00",
                              "2024-01-01 00:00:03",
                              "2024-01-01 00:00:04"]),
        "value": [1.0, 4.0, 9.0],
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = time_weighted_average(ray.data.from_pandas(df)
                                .repartition(2))
    r = out.iloc[0]
    assert r["den_us"] == 4_000_000
    assert r["num_i"] == 100 * 3_000_000 + 400 * 1_000_000
    assert abs(r["twap"] - 175.0) < 1e-12
