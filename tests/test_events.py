"""Planted-data oracles for the event-analytics tier: stream dedup,
cohort retention, ordered funnels (sequential pandas oracles +
partition invariance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from web2llmstxt_ray.ops.events import cohort_retention, dedup_window, funnel


def _events(n: int = 3000, n_users: int = 80, seed: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = (pd.Timestamp("2024-03-01")
          + pd.to_timedelta(rng.integers(0, 21 * 86400_000_000, n), unit="us"))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase"], n,
                                 p=[0.6, 0.3, 0.1]),
        "ts": ts,
    })
    # plant bursts: 200 near-duplicate retries 0–10 s after a base event
    base = df.sample(200, random_state=1)
    dup = base.copy()
    dup["event_id"] = np.arange(n, n + 200, dtype=np.int64)
    dup["ts"] = dup["ts"] + pd.to_timedelta(
        rng.integers(0, 10_000_000, 200), unit="us")
    return pd.concat([df, dup], ignore_index=True)


def _seq_dedup(df: pd.DataFrame, gap_s: float) -> set[int]:
    keep: set[int] = set()
    for (_, _), g in df.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("datetime64[ns]").astype("int64") // 1000
        prev = None
        for eid, t in zip(g["event_id"], us):
            if prev is None or t - prev > gap_s * 1e6:
                keep.add(int(eid))
            prev = t
    return keep


class TestDedupWindow:
    def test_matches_sequential_oracle(self):
        df = _events()
        out = dedup_window(ray.data.from_pandas(df).repartition(7),
                           gap_seconds=30.0).to_pandas()
        assert set(out["event_id"]) == _seq_dedup(df, 30.0)

    def test_partition_invariant(self):
        df = _events(800, 20, seed=9)
        a = dedup_window(ray.data.from_pandas(df).repartition(1),
                         gap_seconds=60.0).to_pandas()
        b = dedup_window(ray.data.from_pandas(df).repartition(13),
                         gap_seconds=60.0).to_pandas()
        assert sorted(a["event_id"]) == sorted(b["event_id"])

    def test_zero_gap_drops_exact_ties_only(self):
        df = pd.DataFrame({
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "event_type": ["view"] * 3,
            "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                  "2024-01-01 00:00:00",
                                  "2024-01-01 00:00:01"]),
        })
        out = dedup_window(ray.data.from_pandas(df),
                           gap_seconds=0.0).to_pandas()
        assert sorted(out["event_id"]) == [1, 3]


class TestCohortRetention:
    def test_matches_pandas_oracle(self):
        df = _events()
        out = cohort_retention(ray.data.from_pandas(df).repartition(5))
        u = df.assign(d=df["ts"].dt.normalize()).drop_duplicates(
            ["user_id", "d"])[["user_id", "d"]]
        first = u.groupby("user_id")["d"].transform("min")
        want = (pd.DataFrame({
            "cohort_day": first.dt.strftime("%Y-%m-%d"),
            "day_offset": (u["d"] - first).dt.days.astype("int64"),
        }).groupby(["cohort_day", "day_offset"], as_index=False)
            .size().rename(columns={"size": "n_users"}))
        merged = out.merge(want, on=["cohort_day", "day_offset"],
                           suffixes=("", "_want"), how="outer",
                           indicator=True)
        assert (merged["_merge"] == "both").all()
        assert (merged["n_users"] == merged["n_users_want"]).all()

    def test_offset_zero_counts_every_user(self):
        df = _events(500, 30, seed=3)
        out = cohort_retention(ray.data.from_pandas(df))
        assert out[out["day_offset"] == 0]["n_users"].sum() == \
            df["user_id"].nunique()


class TestFunnel:
    def test_matches_sequential_oracle(self):
        df = _events()
        steps = ["view", "click", "purchase"]
        out = funnel(ray.data.from_pandas(df).repartition(6), steps)
        want = []
        reached = {u: pd.Timestamp.min for u in df["user_id"].unique()}
        for s in steps:
            nxt = {}
            for u, t0 in reached.items():
                ev = df[(df["user_id"] == u) & (df["event_type"] == s)
                        & (df["ts"] > t0)]
                if len(ev):
                    nxt[u] = ev["ts"].min()
            want.append(len(nxt))
            reached = nxt
        assert out["n_users"].tolist() == want
        assert out["step"].tolist() == steps

    def test_monotone_nonincreasing(self):
        out = funnel(ray.data.from_pandas(_events(seed=13)),
                     ["view", "click", "purchase"])
        n = out["n_users"].tolist()
        assert n == sorted(n, reverse=True)


class TestStreaksAndTransitions:
    def _events(self, n=2000, seed=7, users=25):
        rng = np.random.RandomState(seed)
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "buy", "error"], n),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 40 * 86400, n), unit="s"),
        })

    def test_streaks_sequential_oracle_and_partition_invariance(self):
        from web2llmstxt_ray.ops.events import activity_streaks

        df = self._events()
        outs = []
        for parts in (1, 7):
            out = activity_streaks(
                ray.data.from_pandas(df).repartition(parts)) \
                .to_pandas() \
                .sort_values(["user_id", "streak_start_day"]) \
                .reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # sequential oracle: row_number-difference idiom in pandas
        day = (df["ts"].astype("datetime64[ns]").astype("int64")
               // 1000 // 86_400_000_000)
        d = (pd.DataFrame({"u": df["user_id"], "d": day})
             .drop_duplicates().sort_values(["u", "d"]))
        rn = d.groupby("u").cumcount()
        d["anchor"] = d["d"] - rn
        ref = d.groupby(["u", "anchor"], as_index=False).agg(
            streak_start_day=("d", "min"), streak_end_day=("d", "max"),
            n_days=("d", "size")) \
            .sort_values(["u", "streak_start_day"]) \
            .reset_index(drop=True)
        assert len(outs[0]) == len(ref)
        assert (outs[0]["streak_start_day"].to_numpy()
                == ref["streak_start_day"].to_numpy()).all()
        assert (outs[0]["n_days"].to_numpy()
                == ref["n_days"].to_numpy()).all()
        # streaks of one user never overlap and are separated by gaps
        for _, grp in outs[0].groupby("user_id"):
            s = grp.sort_values("streak_start_day")
            assert (s["streak_end_day"] - s["streak_start_day"] + 1
                    == s["n_days"]).all()
            assert (s["streak_start_day"].to_numpy()[1:]
                    > s["streak_end_day"].to_numpy()[:-1] + 1).all()

    def test_transitions_sequential_oracle(self):
        from web2llmstxt_ray.ops.events import transition_counts

        df = self._events(1500, seed=12)
        outs = []
        for parts in (1, 6):
            outs.append(transition_counts(
                ray.data.from_pandas(df).repartition(parts)))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        g = df.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift(1)
        ref = (pd.DataFrame({"prev_type": prev,
                             "event_type": g["event_type"]})
               .dropna().groupby(["prev_type", "event_type"],
                                 as_index=False).size()
               .rename(columns={"size": "n"})
               .sort_values(["prev_type", "event_type"])
               .reset_index(drop=True))
        ref["n"] = ref["n"].astype("int64")
        pd.testing.assert_frame_equal(outs[0], ref)
        # total transitions = events minus one per active user
        assert outs[0]["n"].sum() == len(df) - df["user_id"].nunique()


class TestTimeSinceEvent:
    def test_vs_sequential_oracle(self):
        from web2llmstxt_ray.ops.events import time_since_event

        rng = np.random.RandomState(7)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.randint(0, 50, n).astype("int64"),
            "ts": pd.Timestamp("2024-03-01")
                  + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"],
                                     n, p=[0.6, 0.3, 0.1]),
        })
        outs = []
        for parts in (1, 9):
            out = (time_since_event(
                ray.data.from_pandas(df).repartition(parts), "purchase")
                .to_pandas().sort_values("event_id")
                .reset_index(drop=True))
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = dict(zip(outs[0]["event_id"], outs[0]["delta_us"]))
        # sequential oracle per user
        for uid, g in df.sort_values(["ts", "event_id"]).groupby(
                "user_id"):
            last = None
            for _, r in g.iterrows():
                want = (float((r["ts"] - last).value // 1000)
                        if last is not None else np.nan)
                have = got[r["event_id"]]
                if np.isnan(want):
                    assert np.isnan(have), r["event_id"]
                else:
                    assert have == want, r["event_id"]
                if r["event_type"] == "purchase":
                    last = r["ts"]

    def test_same_ts_tie_counts_earlier_id(self):
        from web2llmstxt_ray.ops.events import time_since_event

        t0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "ts": [t0, t0, t0 + pd.Timedelta(seconds=5)],
            "event_type": ["purchase", "view", "view"],
        })
        out = (time_since_event(ray.data.from_pandas(df), "purchase")
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        d = dict(zip(out["event_id"], out["delta_us"]))
        assert np.isnan(d[1])           # no purchase strictly earlier
        assert d[2] == 0.0              # same-ts earlier-id purchase
        assert d[3] == 5_000_000.0


class TestTypeOverlapMatrix:
    def test_vs_bruteforce_and_partitions(self):
        from web2llmstxt_ray.ops.events import type_overlap_matrix

        rng = np.random.RandomState(5)
        n = 4000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 300, n).astype("int64"),
            "event_type": rng.choice(["a", "b", "c", "d"], n,
                                     p=[0.5, 0.3, 0.15, 0.05]),
        })
        outs = []
        for parts in (1, 9):
            outs.append(type_overlap_matrix(
                ray.data.from_pandas(df).repartition(parts)))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        sets = {t: set(df.loc[df["event_type"] == t, "user_id"])
                for t in "abcd"}
        got = {(r["type_a"], r["type_b"]): r["n_users"]
               for _, r in outs[0].iterrows()}
        for a in "abcd":
            for b in "abcd":
                if a <= b:
                    assert got[(a, b)] == len(sets[a] & sets[b]), (a, b)
        # diagonal = per-type distinct users
        assert got[("a", "a")] == len(sets["a"])


class TestTimeToEvent:
    def test_vs_sequential_oracle(self):
        from web2llmstxt_ray.ops.events import time_to_event

        rng = np.random.RandomState(11)
        n = 1500
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.randint(0, 40, n).astype("int64"),
            "ts": pd.Timestamp("2024-05-01")
                  + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"],
                                     n, p=[0.6, 0.3, 0.1]),
        })
        outs = []
        for parts in (1, 8):
            out = (time_to_event(
                ray.data.from_pandas(df).repartition(parts), "purchase")
                .to_pandas().sort_values("event_id")
                .reset_index(drop=True))
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = dict(zip(outs[0]["event_id"], outs[0]["delta_us"]))
        for uid, g in df.sort_values(["ts", "event_id"]).groupby(
                "user_id"):
            rows = list(g.itertuples())
            for i, r in enumerate(rows):
                nxt = next((x.ts for x in rows[i + 1:]
                            if x.event_type == "purchase"), None)
                want = (float((nxt - r.ts).value // 1000)
                        if nxt is not None else np.nan)
                have = got[r.event_id]
                if np.isnan(want):
                    assert np.isnan(have), r.event_id
                else:
                    assert have == want, r.event_id
