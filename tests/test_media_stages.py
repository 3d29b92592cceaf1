"""Resize + frame-sample media stages: determinism, accounting,
pass-through semantics, Ray actor-pool plumbing."""

from __future__ import annotations

import pytest
import ray.data

from web2llmstxt_ray.ops.multimodal import (FakeDecoder, FakeTranscoder,
                                            FrameSampler, ImageResizer,
                                            StubTranscoder,
                                            make_fake_payload,
                                            resize_images, sample_frames,
                                            synth_media_table)


def _media(n_docs: int = 20):
    return synth_media_table([f"d{i}" for i in range(n_docs)], per_doc=3)


class TestFakeTranscoder:
    def test_resize_rewrites_header_and_scales_body(self):
        p = make_fake_payload("m1", "image", 400, 200, body_len=4000)
        out = FakeTranscoder().resize(p, 100, 50)
        meta = FakeDecoder().decode(out)
        assert (meta["width"], meta["height"]) == (100, 50)
        # area ratio 1/16 → body ~250 bytes (+17 header)
        assert abs((meta["n_bytes"] - 17) - 4000 / 16) <= 1

    def test_resize_deterministic(self):
        p = make_fake_payload("m2", "image", 300, 300)
        t = FakeTranscoder()
        assert t.resize(p, 64, 64) == t.resize(p, 64, 64)

    def test_frame_deterministic_and_ts_sensitive(self):
        p = make_fake_payload("v1", "video", duration_ms=5000)
        t = FakeTranscoder()
        assert t.frame(p, 0) == t.frame(p, 0)
        assert t.frame(p, 0) != t.frame(p, 1000)
        assert FakeDecoder().decode(t.frame(p, 0))["kind"] == "image"

    def test_kind_guards(self):
        img = make_fake_payload("m3", "image", 10, 10)
        vid = make_fake_payload("v3", "video", duration_ms=1000)
        t = FakeTranscoder()
        with pytest.raises(ValueError):
            t.resize(vid, 5, 5)
        with pytest.raises(ValueError):
            t.frame(img, 0)

    def test_stub_is_marked_slot(self):
        with pytest.raises(NotImplementedError):
            StubTranscoder().resize(b"", 1, 1)


class TestResizeStage:
    def test_bounding_box_and_passthrough(self):
        t = _media()
        out = resize_images(ray.data.from_arrow(t).repartition(4),
                            max_w=64, max_h=64).to_pandas()
        src = t.to_pandas().set_index("media_id")
        assert len(out) == len(src)
        for _, r in out.iterrows():
            orig = src.loc[r["media_id"]]
            if r["kind"] == "image":
                assert r["declared_width"] <= 64
                assert r["declared_height"] <= 64
                # aspect ratio preserved up to integer truncation:
                # a target side of d carries up to 1/d relative error
                if orig["declared_width"] > 64 or \
                        orig["declared_height"] > 64:
                    ar0 = orig["declared_width"] / orig["declared_height"]
                    ar1 = r["declared_width"] / r["declared_height"]
                    tol = 1.0 / min(r["declared_width"],
                                    r["declared_height"]) + 0.02
                    assert abs(ar0 - ar1) / ar0 <= tol
            else:
                assert bytes(r["payload"]) == bytes(orig["payload"])

    def test_no_upscale(self):
        t = synth_media_table(["tiny"], per_doc=1, seed=2)
        out = ImageResizer(max_w=10_000, max_h=10_000)(t).to_pandas()
        src = t.to_pandas()
        assert (out["declared_width"] == src["declared_width"]).all()
        assert [bytes(p) for p in out["payload"]] == \
            [bytes(p) for p in src["payload"]]


class TestFrameSampleStage:
    def test_frame_math_and_expansion(self):
        t = _media(30)
        fps = 2.0
        out = sample_frames(ray.data.from_arrow(t).repartition(3),
                            fps=fps, max_frames=8).to_pandas()
        vids = t.to_pandas().query("kind == 'video'")
        expect = int(sum(min(8, max(1, int(ms / 1000.0 * fps)))
                         for ms in vids["declared_ms"]))
        assert len(out) == expect
        # per-video frame numbering is 0..n-1 with fps-spaced timestamps
        for mid, grp in out.groupby("media_id"):
            assert sorted(grp["frame_no"]) == list(range(len(grp)))
            assert set(grp["ts_ms"]) == {int(i * 1000 / fps)
                                         for i in range(len(grp))}

    def test_deterministic_across_batchings(self):
        t = _media(12)
        outs = []
        for parts in (1, 6):
            out = sample_frames(ray.data.from_arrow(t).repartition(parts),
                                fps=1.0).to_pandas()
            out["payload"] = out["payload"].map(bytes)
            outs.append(out.sort_values(["media_id", "frame_no"])
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


class TestPILBackedPath:
    def test_stub_contract_without_pil(self):
        import pytest

        from web2llmstxt_ray.ops.multimodal import (PILDecoder,
                                                    PILTranscoder)

        if _pil_available():
            pytest.skip("PIL installed — stub contract not applicable")
        with pytest.raises(NotImplementedError, match="Pillow"):
            PILDecoder()
        with pytest.raises(NotImplementedError, match="Pillow"):
            PILTranscoder()

    def test_real_image_resize_when_pil_installed(self, tmp_path):
        import pytest

        if not _pil_available():
            pytest.skip("PIL not installed in this environment")
        import io

        import ray.data
        from PIL import Image

        from web2llmstxt_ray.ops.multimodal import (MEDIA_SCHEMA,
                                                    PILDecoder,
                                                    PILTranscoder,
                                                    resize_images)

        def png_bytes(w, h):
            buf = io.BytesIO()
            Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
            return buf.getvalue()

        rows = {
            "media_id": ["m0", "m1"], "doc_id": ["d", "d"],
            "kind": ["image", "image"],
            "payload": [png_bytes(800, 400), png_bytes(100, 50)],
            "declared_width": [800, 100],
            "declared_height": [400, 50],
            "declared_ms": [0, 0],
        }
        t = pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
        out = resize_images(ray.data.from_arrow(t), max_w=256, max_h=256,
                            transcoder_cls=PILTranscoder).take_all()
        by_id = {r["media_id"]: r for r in out}
        # 800x400 → bounded to 256x128; 100x50 already fits, untouched
        d = PILDecoder()
        big = d.decode(by_id["m0"]["payload"])
        assert (big["width"], big["height"]) == (256, 128)
        assert by_id["m1"]["payload"] == rows["payload"][1]


def _ffmpeg_available() -> bool:
    import shutil

    return bool(shutil.which("ffmpeg") and shutil.which("ffprobe"))


class TestFFmpegBackedPath:
    def test_stub_contract_without_ffmpeg(self):
        import pytest

        from web2llmstxt_ray.ops.multimodal import (FFmpegDecoder,
                                                    FFmpegTranscoder)

        if _ffmpeg_available():
            pytest.skip("ffmpeg installed — stub contract not applicable")
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            FFmpegDecoder()
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            FFmpegTranscoder()

    def test_real_video_frame_sample_when_ffmpeg_installed(self, tmp_path):
        """Generate a 3-second test video with ffmpeg itself, probe it
        with FFmpegDecoder, and run the FrameSampler actor stage with
        FFmpegTranscoder — each sampled frame must decode as an image
        of the video's dimensions."""
        import pytest

        if not _ffmpeg_available():
            pytest.skip("ffmpeg not installed in this environment")
        import shutil
        import subprocess

        import ray.data

        from web2llmstxt_ray.ops.multimodal import (MEDIA_SCHEMA,
                                                    FFmpegDecoder,
                                                    FFmpegTranscoder,
                                                    sample_frames)

        vid = tmp_path / "clip.mp4"
        subprocess.run(
            [shutil.which("ffmpeg"), "-v", "error", "-y",
             "-f", "lavfi", "-i", "testsrc=duration=3:size=64x48:rate=5",
             str(vid)], check=True)
        payload = vid.read_bytes()

        d = FFmpegDecoder()
        meta = d.decode(payload)
        assert meta["kind"] == "video"
        assert (meta["width"], meta["height"]) == (64, 48)
        assert 2500 <= meta["duration_ms"] <= 3500

        t = pa.Table.from_pydict({
            "media_id": ["v0"], "doc_id": ["d"], "kind": ["video"],
            "payload": [payload],
            "declared_width": [64], "declared_height": [48],
            "declared_ms": [meta["duration_ms"]],
        }, schema=MEDIA_SCHEMA)
        frames = sample_frames(ray.data.from_arrow(t), fps=1.0,
                               transcoder_cls=FFmpegTranscoder).take_all()
        assert len(frames) == 3
        for fr in frames:
            fmeta = d.decode(fr["payload"])
            assert fmeta["kind"] == "image"
            assert (fmeta["width"], fmeta["height"]) == (64, 48)
