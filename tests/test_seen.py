"""Seen-filter shards: exact / bloom / cuckoo membership semantics."""

import numpy as np
import pytest

from web2llmstxt_ray.state.seen import SeenFilter, _Bloom, _Cuckoo, _ExactSet, _hash_batch


def _urls(n, prefix="https://h.test/p"):
    return [f"{prefix}{i}" for i in range(n)]


class TestBackendsDirect:
    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo])
    def test_no_false_negatives(self, cls):
        impl = cls(1 << 14)
        hashes = _hash_batch(_urls(5000))
        impl.check_and_add(hashes)
        assert impl.contains(hashes).all()

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo])
    def test_check_and_add_reports_new_once(self, cls):
        impl = cls(1 << 14)
        h = _hash_batch(_urls(1000))
        first = impl.check_and_add(h)
        second = impl.check_and_add(h)
        assert first.sum() >= 990  # approx modes may have a few FPs
        assert not second.any()

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo])
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

    @pytest.mark.parametrize("cls,limit", [(_Bloom, 0.03), (_Cuckoo, 0.02)])
    def test_false_positive_rate_within_design(self, cls, limit):
        impl = cls(1 << 16)
        impl.check_and_add(_hash_batch(_urls(40000)))
        probe = _hash_batch(_urls(20000, prefix="https://other.test/z"))
        fp = impl.contains(probe).sum() / len(probe)
        assert fp < limit

    @pytest.mark.parametrize("cls", [_ExactSet, _Bloom, _Cuckoo])
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
