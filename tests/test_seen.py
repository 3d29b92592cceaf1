"""Seen-filter shards: exact / bloom / cuckoo membership semantics."""

import numpy as np
import pytest

from web2llmstxt_ray.state.seen import (SeenFilter, _Bloom, _Cuckoo,
                                         _CuckooChain, _CuckooSpill,
                                         _ExactSet, _hash_batch)


def _urls(n, prefix="https://h.test/p"):
    return [f"{prefix}{i}" for i in range(n)]


class TestBackendsDirect:
    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo, _CuckooChain,
                                     _CuckooSpill])
    def test_no_false_negatives(self, cls):
        impl = cls(1 << 14)
        hashes = _hash_batch(_urls(5000))
        impl.check_and_add(hashes)
        assert impl.contains(hashes).all()

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo, _CuckooChain,
                                     _CuckooSpill])
    def test_check_and_add_reports_new_once(self, cls):
        impl = cls(1 << 14)
        h = _hash_batch(_urls(1000))
        first = impl.check_and_add(h)
        second = impl.check_and_add(h)
        assert first.sum() >= 990  # approx modes may have a few FPs
        assert not second.any()

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo, _CuckooChain,
                                     _CuckooSpill])
    def test_intra_batch_duplicates_detected(self, cls):
        impl = cls(1 << 12)
        urls = ["https://h.test/a", "https://h.test/b", "https://h.test/a"]
        mask = impl.check_and_add(_hash_batch(urls))
        assert mask[2] == False  # noqa: E712  (dup within the same batch)

    def test_exact_mode_is_exact(self):
        impl = _ExactSet(0)
        added = impl.check_and_add(_hash_batch(_urls(20000)))
        assert added.all()
        other = impl.contains(_hash_batch(_urls(5000, prefix="https://x.test/q")))
        assert not other.any()

    @pytest.mark.parametrize("cls,limit", [(_Bloom, 0.03), (_Cuckoo, 0.02),
                                           (_CuckooChain, 0.02),
                                           (_CuckooSpill, 0.03)])
    def test_false_positive_rate_within_design(self, cls, limit):
        impl = cls(1 << 16)
        impl.check_and_add(_hash_batch(_urls(40000)))
        probe = _hash_batch(_urls(20000, prefix="https://other.test/z"))
        fp = impl.contains(probe).sum() / len(probe)
        assert fp < limit

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo, _CuckooChain,
                                     _CuckooSpill])
    def test_snapshot_restore_roundtrip(self, cls):
        impl = cls(1 << 14)
        h = _hash_batch(_urls(3000))
        impl.check_and_add(h)
        restored = cls.load(impl.dump())
        assert restored.contains(h).all()
        assert len(restored) == len(impl)

    def test_cuckoo_handles_overfill_via_overflow(self):
        impl = _Cuckoo(64)  # tiny → forced eviction failures
        h = _hash_batch(_urls(2000))
        impl.check_and_add(h)
        assert impl.contains(h).all()  # still no false negatives


class TestCuckooAuto:
    def test_grows_generations_under_overfill(self):
        impl = _CuckooChain(256)  # tiny initial capacity
        h = _hash_batch(_urls(20000))
        for i in range(0, len(h), 1000):       # batched inserts
            impl.check_and_add(h[i:i + 1000])
        assert len(impl.gens) > 1              # it actually grew
        assert impl.contains(h).all()          # no false negatives
        # overflow stays bounded (growth absorbs pressure, unlike the
        # fixed-size filter whose overflow set balloons)
        assert sum(len(g.overflow) for g in impl.gens) <= \
            len(impl.gens) * _CuckooChain.OVERFLOW_LIMIT + 64
        # geometric chain: generations stay few even at 78× overfill
        assert len(impl.gens) <= 10

    def test_rejects_across_generations(self):
        impl = _CuckooChain(128)
        urls = _urls(5000)
        h = _hash_batch(urls)
        first = impl.check_and_add(h)
        again = impl.check_and_add(h)          # spans many generations
        assert not again.any()
        assert first.sum() == len(urls)

    def test_chain_snapshot_roundtrip_preserves_generations(self):
        impl = _CuckooChain(128)
        h = _hash_batch(_urls(4000))
        impl.check_and_add(h)
        restored = _CuckooChain.load(impl.dump())
        assert len(restored.gens) == len(impl.gens)
        assert restored.contains(h).all()

    def test_shard_pressure_reports_generations(self):
        f = SeenFilter(num_shards=2, mode="cuckoo-auto",
                       capacity_per_shard=256)
        f.check_and_add(_urls(6000))
        for s in f.pressure():
            assert s["mode"] == "cuckoo-auto"
            assert s["generations"] >= 1
            assert s["slot_load"] < 1.0


class TestCuckooSpill:
    def test_spills_to_bloom_partitions(self):
        impl = _CuckooSpill(256)
        h = _hash_batch(_urls(20000))
        for i in range(0, len(h), 1000):
            impl.check_and_add(h[i:i + 1000])
        assert isinstance(impl.gens[0], _Cuckoo)
        blooms = [g for g in impl.gens[1:] if isinstance(g, _Bloom)]
        assert blooms                          # growth went to bloom
        assert all(isinstance(g, _Bloom) for g in impl.gens[1:])
        assert impl.contains(h).all()          # no false negatives
        assert len(impl.gens) <= 10            # geometric partitions

    def test_rejects_across_cuckoo_and_bloom_tiers(self):
        impl = _CuckooSpill(128)
        h = _hash_batch(_urls(5000))
        first = impl.check_and_add(h)
        again = impl.check_and_add(h)
        assert first.sum() == 5000
        assert not again.any()

    def test_spill_snapshot_roundtrip_preserves_tiers(self):
        impl = _CuckooSpill(128)
        h = _hash_batch(_urls(6000))
        impl.check_and_add(h)
        restored = _CuckooSpill.load(impl.dump())
        assert [type(g) for g in restored.gens] == \
            [type(g) for g in impl.gens]
        assert restored.contains(h).all()
        assert len(restored) == len(impl)

    def test_shard_pressure_reports_spill(self):
        f = SeenFilter(num_shards=2, mode="cuckoo-spill",
                       capacity_per_shard=256)
        f.check_and_add(_urls(6000))
        ps = f.pressure()
        assert any(s["spill_partitions"] >= 1 for s in ps)
        for s in ps:
            assert s["mode"] == "cuckoo-spill"
            assert s["spilled_n"] <= s["n"]  # spilled subset of total


class TestShardedFilter:
    def test_scatter_gather_order_preserved(self):
        f = SeenFilter(num_shards=4, mode="exact")
        urls = _urls(500)
        first = f.check_and_add(urls)
        assert first.all()
        again = f.check_and_add(urls)
        assert not again.any()
        assert f.count() == 500

    def test_contains_routes_correctly(self):
        f = SeenFilter(num_shards=3, mode="exact")
        f.check_and_add(["https://a.test/1", "https://a.test/2"])
        mask = f.contains(["https://a.test/1", "https://a.test/3", "https://a.test/2"])
        assert mask.tolist() == [True, False, True]

    def test_snapshot_restore_across_instances(self):
        f1 = SeenFilter(num_shards=2, mode="cuckoo", capacity_per_shard=1 << 12)
        urls = _urls(1000)
        f1.check_and_add(urls)
        blobs = f1.snapshot()
        f2 = SeenFilter(num_shards=2, mode="cuckoo", capacity_per_shard=1 << 12)
        f2.restore(blobs)
        assert f2.contains(urls).all()
        assert f2.count() == f1.count()


class TestPressure:
    def test_pressure_telemetry(self):
        f = SeenFilter(num_shards=2, mode="cuckoo", capacity_per_shard=1 << 12)
        f.check_and_add(_urls(3000))
        stats = f.pressure()
        assert len(stats) == 2
        for s in stats:
            assert s["mode"] == "cuckoo"
            assert 0 < s["load"]
            assert "overflow" in s and "slot_load" in s
        assert sum(s["n"] for s in stats) == 3000


class TestFrontierPaging:
    """Shard-side wave freeze + exact-global-order paging
    (comprehensive-mode selection without O(frontier) driver memory)."""

    def _mk(self, n=200, shards=4):
        from web2llmstxt_ray.state.frontier import Frontier

        f = Frontier(num_shards=shards)
        urls = [f"https://x.test/p{i:04d}" for i in range(n)]
        scores = [float((i * 37) % 100) / 10.0 for i in range(n)]
        f.add(urls, scores)
        return f, urls, scores

    def test_paged_equals_select_wave(self):
        f1, urls, scores = self._mk()
        whole = f1.select_wave(None, 0.5)
        f1.shutdown()

        f2, _, _ = self._mk()
        total = f2.begin_wave(0.5)
        paged = []
        while True:
            chunk = f2.next_wave_chunk(17)
            if not chunk:
                break
            paged.append(chunk)
        f2.end_wave()
        flat = [x for c in paged for x in c]
        assert total == len(whole)
        assert flat == whole  # exact global (-score, url) order
        f2.shutdown()

    def test_unconsumed_stay_pending(self):
        f, urls, scores = self._mk(n=100)
        total = f.begin_wave(0.5)
        first = f.next_wave_chunk(10)
        f.end_wave()
        assert len(first) == 10
        # consumed ones are gone from pending; everything else stays
        assert f.count() == len(urls) - 10
        nxt = f.select_wave(5, 0.5)
        assert len(nxt) == 5
        assert not set(u for u, _ in nxt) & set(u for u, _ in first)
        f.shutdown()

    def test_mid_wave_adds_not_in_frozen_wave(self):
        f, urls, scores = self._mk(n=50)
        total = f.begin_wave(0.5)
        f.add(["https://x.test/new-high"], [99.0])  # discovered mid-wave
        seen_urls = []
        while True:
            chunk = f.next_wave_chunk(16)
            if not chunk:
                break
            seen_urls.extend(u for u, _ in chunk)
        f.end_wave()
        assert "https://x.test/new-high" not in seen_urls  # next wave only
        assert len(seen_urls) == total
        nxt = f.select_wave(1, 0.5)
        assert nxt[0][0] == "https://x.test/new-high"
        f.shutdown()
