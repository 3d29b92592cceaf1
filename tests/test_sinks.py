"""Format seam (sinks.write_span_docs/read_span_docs): parquet fallback
always works; the lance branch activates only when pylance imports
(VERDICT round-1 item 9)."""

import pyarrow as pa
import pytest
import ray.data

from web2llmstxt_ray import sinks


def _tbl():
    return pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["text", "image", "text"]),
        "text": pa.array(["a b", "", "c d e"]),
    })


class TestFormatSeam:
    def test_auto_resolves_by_availability(self):
        expected = "lance" if sinks._lance_module() else "parquet"
        assert sinks.resolve_format("auto") == expected

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError):
            sinks.resolve_format("orc")

    def test_table_roundtrip_auto(self, tmp_path):
        fmt = sinks.write_span_docs(_tbl(), str(tmp_path / "docs"))
        assert fmt in ("parquet", "lance")
        back = sinks.read_span_docs(str(tmp_path / "docs"))
        assert back.sort_by("doc_id").equals(_tbl())

    def test_dataset_roundtrip_auto(self, tmp_path):
        ds = ray.data.from_arrow(_tbl())
        sinks.write_span_docs(ds, str(tmp_path / "dsdocs"))
        back = sinks.read_span_docs(str(tmp_path / "dsdocs"))
        assert back.num_rows == 3
        assert set(back.column_names) == {"doc_id", "kind", "text"}

    def test_column_pruned_read(self, tmp_path):
        sinks.write_span_docs(_tbl(), str(tmp_path / "p"))
        back = sinks.read_span_docs(str(tmp_path / "p"), columns=["doc_id"])
        assert back.column_names == ["doc_id"]

    def test_explicit_lance_without_pylance_raises(self, tmp_path):
        if sinks._lance_module() is not None:
            pytest.skip("pylance installed: explicit branch active")
        with pytest.raises(ImportError):
            sinks.write_span_docs(_tbl(), str(tmp_path / "l"), fmt="lance")

    def test_resumable_uses_seam(self, tmp_path):
        from web2llmstxt_ray.pipelines.resumable import run_resumable

        def fn(urls):
            return ray.data.from_items([{"url": u, "n": len(u)} for u in urls])

        stats = run_resumable([f"https://x.test/{i}" for i in range(20)],
                              str(tmp_path / "out"), fn, num_partitions=4)
        assert stats["rows"] == 20
