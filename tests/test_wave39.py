"""Wave-39 conformance: isotonic calibration (PAVA ≡ minimax),
Fellegi-Sunter weights, Hampel filter, gear content-defined chunking
— sequential oracles + the shift-robustness property CDC exists for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestIsotonic:
    def test_pava_equals_minimax_and_monotone(self, ray_session):
        from web2llmstxt_ray.ops.stats import isotonic_calibration

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["value", "event_type"])
        out = isotonic_calibration(rd.from_arrow(ev).repartition(8),
                                   "value", "event_type", "purchase")
        # monotone non-decreasing
        iso = out["iso_rate"].to_numpy()
        assert (np.diff(iso) >= 0).all()
        # minimax characterization over the same integer prefix sums
        n = out["n"].to_numpy()
        p = out["n_pos"].to_numpy()
        cn = np.concatenate([[0], np.cumsum(n)])
        cp = np.concatenate([[0], np.cumsum(p)])
        m = len(n)
        for i in range(m):
            best = -np.inf
            for j in range(i + 1):
                mn = min((cp[k + 1] - cp[j]) / (cn[k + 1] - cn[j])
                         for k in range(i, m))
                best = max(best, mn)
            assert iso[i] == best, i
        # distinct mean margins dwarf double rounding
        means = sorted(set(float(a) / b for a, b in zip(p, n)))
        gaps = np.diff(means)
        assert (gaps > 1e-9).all()
        # weighted L2: isotonic fit is at least as close as any
        # constant (sanity, not a full optimality proof)
        rate = out["rate"].to_numpy()
        const = cp[-1] / cn[-1]
        assert (n * (rate - iso) ** 2).sum() \
            <= (n * (rate - const) ** 2).sum() + 1e-12

    def test_planted_violation_pools(self, ray_session):
        from web2llmstxt_ray.ops.stats import isotonic_calibration

        # bin0 rate 0.9, bin1 rate 0.1 → must pool to 0.5
        ev = pd.DataFrame({
            "value": [5.0] * 10 + [15.0] * 10,
            "event_type": ["purchase"] * 9 + ["view"]
            + ["purchase"] + ["view"] * 9})
        out = isotonic_calibration(rd.from_pandas(ev), "value",
                                   "event_type", "purchase")
        assert out["iso_rate"].tolist() == [0.5, 0.5]


class TestFsWeights:
    def test_counts_and_weights_sequential(self, ray_session):
        import itertools
        import math

        from web2llmstxt_ray.ops.phonetic import (catalog_corrupt_names,
                                                  fs_weights, soundex)

        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_name"]).to_pandas()
        cd = catalog_corrupt_names(part)
        names = sorted(set(cd["clean"]) | set(cd["dirty"]))
        truth = {(min(a, b), max(a, b))
                 for a, b in zip(cd["clean"], cd["dirty"]) if a != b}
        mc = np.zeros(8, dtype=np.int64)
        uc = np.zeros(8, dtype=np.int64)
        for a, b in itertools.combinations(names, 2):
            if not (a[:1] == b[:1] and abs(len(a) - len(b)) <= 1):
                continue
            pat = 4 * int(soundex(a) == soundex(b)) \
                + 2 * int(len(a) == len(b)) \
                + int(a.split(" ", 1)[0] == b.split(" ", 1)[0])
            (mc if (a, b) in truth else uc)[pat] += 1
        reg = rd.from_pandas(pd.DataFrame({
            "name": pd.concat([cd["clean"], cd["dirty"]],
                              ignore_index=True)}))
        tds = rd.from_pandas(pd.DataFrame(sorted(truth),
                                          columns=["a", "b"]))
        out = fs_weights(reg, tds, col="name")
        assert out["n_match"].tolist() == mc.tolist()
        assert out["n_nonmatch"].tolist() == uc.tolist()
        mn, un = mc.sum(), uc.sum()
        for _, r in out.iterrows():
            pat = int(r["pattern"])
            m_p = (mc[pat] + 1) / (mn + 2)
            u_p = (uc[pat] + 1) / (un + 2)
            assert r["m_prob"] == m_p and r["u_prob"] == u_p
            assert abs(r["weight"] - math.log2(m_p / u_p)) < 1e-12
        # full-agreement pattern (7) must outscore full disagreement
        w = dict(zip(out["pattern"], out["weight"]))
        assert w[7] > w[0]


class TestHampel:
    def test_flags_planted_spike_not_level_shift(self, ray_session):
        from web2llmstxt_ray.ops.windows import hampel_anomalies

        days = pd.date_range("2024-01-01", periods=40)
        vals = [100.0] * 20 + [500.0] * 20     # level shift at 20
        vals[10] = 10000.0                     # spike
        ev = pd.DataFrame({"o_orderdate": days, "o_totalprice": vals})
        out = hampel_anomalies(rd.from_pandas(ev), half_window=3)
        flagged = out[out["is_anomaly"]]["day"].to_numpy() \
            - out["day"].min()
        assert 10 in flagged
        # the level shift itself is NOT flagged wholesale (a global
        # threshold would flag half the series)
        assert len(flagged) <= 4

    def test_sequential_replay(self, ray_session):
        from web2llmstxt_ray.ops.windows import (_daily_cents_series,
                                                 hampel_anomalies)

        orders = pq.read_table(f"{SF}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
        ds = rd.from_arrow(orders).repartition(4)
        out = hampel_anomalies(ds, half_window=3, k_sigma=3.0)
        days, cents = _daily_cents_series(ds, "o_orderdate",
                                          "o_totalprice")
        dset = dict(zip(days.tolist(), cents.tolist()))
        for _, r in out.iterrows():
            w = sorted(dset[d] for d in range(int(r["day"]) - 3,
                                              int(r["day"]) + 4)
                       if d in dset)
            med = w[(len(w) - 1) // 2]
            assert r["med"] == med
            aw = sorted(abs(v - med) for v in w)
            assert r["mad"] == aw[(len(aw) - 1) // 2]
            # flag-boundary margin ≫ float drift (an EXACT 0 margin —
            # dev == threshold == 0 on a flat window — is bit-equal on
            # both sides, so only near-misses are parity risks)
            gap = abs(abs(r["cents"] - r["med"]) - r["threshold"])
            assert gap == 0.0 or gap > 1e-6


class TestGearCDC:
    def test_shift_robustness(self):
        """THE property fixed-width shingles lack: inserting a prefix
        leaves interior boundaries at the same content positions."""
        from web2llmstxt_ray.ops.substr import gear_hash_boundaries

        base = ("the quick brown fox jumps over the lazy dog " * 30)
        b1 = set(gear_hash_boundaries(base, 6).tolist())
        shifted = "INSERTED PREFIX CONTENT " + base
        off = len("INSERTED PREFIX CONTENT ")
        b2 = set(gear_hash_boundaries(shifted, 6).tolist())
        # boundaries deep enough that the 64-char window has washed
        # out the prefix must align exactly (mod the offset)
        deep1 = {x for x in b1 if x > 64}
        realigned = {x - off for x in b2 if x - off > 64}
        assert deep1 == realigned

    def test_chunks_partition_text(self, ray_session):
        from web2llmstxt_ray.ops.substr import gear_cdc_chunks

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        out = gear_cdc_chunks(rd.from_arrow(docs).repartition(8))
        lens = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        lens["L"] = lens["text"].str.len()
        per_doc = out.groupby("doc_id").agg(
            total=("len", "sum"), first=("start", "min"),
            nchunks=("chunk_idx", "count"))
        m = per_doc.join(lens.set_index("doc_id"))
        assert (m["total"] == m["L"]).all()      # chunks tile the doc
        assert (m["first"] == 1).all()
        assert (out["len"] > 0).all()
        # contiguity: start_{i+1} = start_i + len_i
        g = out.sort_values(["doc_id", "chunk_idx"])
        nxt = g.groupby("doc_id")["start"].shift(-1)
        inner = nxt.notna()
        assert ((g["start"] + g["len"])[inner]
                == nxt[inner]).all()
