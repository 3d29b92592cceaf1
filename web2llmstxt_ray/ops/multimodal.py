"""Multimodal column plumbing — opaque binary payloads with typed
metadata, processed by actor-pool stages.

The span documents carry media as references (``media_ref``); a
production pipeline also moves the *bytes* (image/audio/video) through
the engine as Arrow ``binary`` columns. The decode/resize/feature
kernels need codec libraries absent from this container, so the codec
layer is explicitly split out behind ``Decoder`` implementations:

- :class:`StubDecoder` — raises ``NotImplementedError`` (the marked
  production slot for PIL/ffmpeg-backed decoders).
- :class:`FakeDecoder` — deterministic pure-python "decode" (parses a
  tiny self-describing header from the synthetic payload) so the
  Ray-side plumbing — schema, batch sizing, actor lifecycle, output
  layout — is real and tested end to end.
- :class:`PILDecoder`/:class:`PILTranscoder` and
  :class:`FFmpegDecoder`/:class:`FFmpegTranscoder` — the REAL codec
  classes for the two dependencies, each gated by an availability
  probe that raises the same ``NotImplementedError`` contract when
  the library/binary is absent; their end-to-end tests
  (tests/test_media_stages.py) skip-gate on the same probe.

Scale notes encoded here: binary batches are kept SMALL
(``batch_size=32`` default — payload bytes × batch_size × concurrency
must fit a worker heap), payloads stay in Arrow buffers (no
row-by-row Python copies of the bytes beyond the codec call), and
outputs drop the payload column as early as possible.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("doc_id", pa.string()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.large_binary()),
        ("declared_width", pa.int32()),   # typed metadata columns
        ("declared_height", pa.int32()),
        ("declared_ms", pa.int32()),
    ]
)

_MAGIC = b"SYNM"


def make_fake_payload(media_id: str, kind: str, width: int = 0,
                      height: int = 0, duration_ms: int = 0,
                      body_len: int = 256) -> bytes:
    """Deterministic synthetic media payload: a 20-byte header
    (magic, kind byte, width, height, ms) + seeded pseudo-random body."""
    kind_b = {"image": 1, "audio": 2, "video": 3}[kind]
    header = _MAGIC + struct.pack("<BiiI", kind_b, width, height, duration_ms)
    seed = int.from_bytes(hashlib.md5(media_id.encode()).digest()[:4], "little")
    body = np.random.RandomState(seed).bytes(body_len)
    return header + body


class StubDecoder:
    """Production codec slot — unavailable in this sandbox."""

    def decode(self, payload: bytes) -> dict:  # pragma: no cover - stub
        raise NotImplementedError(
            "Real media decoding needs PIL/ffmpeg, which are not in this "
            "container. Use FakeDecoder for tests/benchmarks; swap this "
            "class for a real codec in production."
        )


class FakeDecoder:
    """Deterministic decode of :func:`make_fake_payload` outputs."""

    def decode(self, payload: bytes) -> dict:
        if payload[:4] != _MAGIC:
            raise ValueError("bad media payload")
        kind_b, w, h, ms = struct.unpack("<BiiI", payload[4:17])
        body = payload[17:]
        return {
            "kind": {1: "image", 2: "audio", 3: "video"}[kind_b],
            "width": w,
            "height": h,
            "duration_ms": ms,
            "n_bytes": len(payload),
            "body_checksum": hashlib.md5(body).hexdigest(),
        }


def _import_pil():
    """Import Pillow or raise the same NotImplementedError contract as
    the stub slots — callers choose the decoder class, the error tells
    them why the real one is unavailable here."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "PIL (Pillow) is not installed in this environment; use "
            "FakeDecoder/FakeTranscoder, or install Pillow for the "
            "real image path.") from e
    return Image


class PILDecoder:
    """Real image decode via Pillow (the production slot StubDecoder
    marks). Image payloads are any PIL-readable bytes (PNG/JPEG/…);
    audio/video still need ffmpeg and raise. Constructed once per
    actor, like every codec stage."""

    def __init__(self):
        self._image = _import_pil()

    def decode(self, payload: bytes) -> dict:
        import io

        with self._image.open(io.BytesIO(payload)) as img:
            w, h = img.size
        return {
            "kind": "image",
            "width": int(w),
            "height": int(h),
            "duration_ms": 0,
            "n_bytes": len(payload),
            "body_checksum": hashlib.md5(payload).hexdigest(),
        }


class PILTranscoder:
    """Real aspect-preserving image resize via Pillow; ``frame``
    (video) still requires ffmpeg and raises — the honest split of the
    two codec dependencies."""

    def __init__(self):
        self._image = _import_pil()

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        import io

        with self._image.open(io.BytesIO(payload)) as img:
            fmt = img.format or "PNG"
            out = img.resize((max(1, w), max(1, h)))
            buf = io.BytesIO()
            out.save(buf, format=fmt)
            return buf.getvalue()

    def frame(self, payload: bytes, ts_ms: int) -> bytes:
        raise NotImplementedError("real frame extraction needs ffmpeg")


def _ffmpeg_paths() -> tuple[str, str]:
    """Locate ffmpeg/ffprobe or raise the same NotImplementedError
    contract as the stub slots (mirrors :func:`_import_pil` — the
    caller chose the real codec class; the error says why this
    environment can't honor it)."""
    import shutil

    ffmpeg = shutil.which("ffmpeg")
    ffprobe = shutil.which("ffprobe")
    if not ffmpeg or not ffprobe:
        raise NotImplementedError(
            "ffmpeg/ffprobe are not installed in this environment; use "
            "FakeDecoder/FakeTranscoder, or install ffmpeg for the real "
            "audio/video path.")
    return ffmpeg, ffprobe


class FFmpegDecoder:
    """Real audio/video metadata decode via ffprobe (the production
    slot StubDecoder marks for non-image media). Payloads are any
    ffprobe-readable container bytes; probing runs on a tempfile (many
    demuxers need seekable input). Constructed once per actor."""

    def __init__(self):
        self._ffmpeg, self._ffprobe = _ffmpeg_paths()

    def decode(self, payload: bytes) -> dict:
        import json as _json
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin") as f:
            f.write(payload)
            f.flush()
            out = subprocess.run(
                [self._ffprobe, "-v", "error", "-print_format", "json",
                 "-show_format", "-show_streams", f.name],
                capture_output=True, check=True).stdout
        meta = _json.loads(out)
        streams = meta.get("streams", [])
        video = next((s for s in streams
                      if s.get("codec_type") == "video"), None)
        dur = float(meta.get("format", {}).get("duration", 0) or 0)
        # a video stream with no timeline is a still image (PNG/JPEG
        # demux as single-frame video in ffprobe's model)
        kind = ("video" if video and dur > 0
                else "image" if video else "audio")
        return {
            "kind": kind,
            "width": int(video["width"]) if video else 0,
            "height": int(video["height"]) if video else 0,
            "duration_ms": int(round(dur * 1000)),
            "n_bytes": len(payload),
            "body_checksum": hashlib.md5(payload).hexdigest(),
        }


class FFmpegTranscoder:
    """Real resize / frame-extract via the ffmpeg CLI — the production
    slot StubTranscoder marks. ``resize`` scales any image payload
    (PNG in/out); ``frame`` seeks ``ts_ms`` into a video payload and
    emits one PNG frame. Both shell out once per call on tempfiles
    (container formats need seekable IO); actor-pool placement
    amortizes process startup across a batch, and the stage contract
    (pure function of payload+args, reproducible on task retry) holds
    because ffmpeg runs with fixed flags and no wall-clock inputs."""

    def __init__(self):
        self._ffmpeg, self._ffprobe = _ffmpeg_paths()

    def _run(self, args: list[str], payload: bytes,
             out_suffix: str) -> bytes:
        import os as _os
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin") as src:
            src.write(payload)
            src.flush()
            fd, out_path = tempfile.mkstemp(suffix=out_suffix)
            _os.close(fd)
            try:
                subprocess.run(
                    [self._ffmpeg, "-v", "error", "-y", "-i", src.name,
                     *args, out_path],
                    capture_output=True, check=True)
                with open(out_path, "rb") as f:
                    return f.read()
            finally:
                _os.unlink(out_path)

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        return self._run(
            ["-vf", f"scale={max(1, w)}:{max(1, h)}",
             "-frames:v", "1"], payload, ".png")

    def frame(self, payload: bytes, ts_ms: int) -> bytes:
        return self._run(
            ["-ss", f"{ts_ms / 1000.0:.3f}", "-frames:v", "1"],
            payload, ".png")


class MediaFeatureExtractor:
    """Actor-pool stage: decode each payload, emit typed features and
    DROP the payload (the narrow output is what flows downstream).

    The decoder is constructed once per actor (the expensive part for a
    real codec: codec contexts, GPU handles). Batches must stay small —
    size with ``batch_size`` at call sites, not inside.
    """

    def __init__(self, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self.decoder.decode(p) for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "doc_id": batch.column("doc_id"),
            "kind": pa.array([f["kind"] for f in feats], pa.string()),
            "width": pa.array([f["width"] for f in feats], pa.int32()),
            "height": pa.array([f["height"] for f in feats], pa.int32()),
            "duration_ms": pa.array([f["duration_ms"] for f in feats], pa.int32()),
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
            "body_checksum": pa.array([f["body_checksum"] for f in feats],
                                      pa.string()),
        })


def extract_media_features(ds: ray.data.Dataset, decoder_cls=FakeDecoder,
                           batch_size: int = 32,
                           concurrency=(1, 8)) -> ray.data.Dataset:
    """media table → per-media feature rows (payloads dropped)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder_cls": decoder_cls},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def synth_media_table(doc_ids: list[str], per_doc: int = 2,
                      seed: int = 5) -> pa.Table:
    """Deterministic media fixture attached to span documents."""
    rng = np.random.RandomState(seed)
    rows = {k: [] for k in ("media_id", "doc_id", "kind", "payload",
                            "declared_width", "declared_height", "declared_ms")}
    kinds = ["image", "audio", "video"]
    for d in doc_ids:
        for j in range(per_doc):
            kind = kinds[int(rng.randint(3))]
            mid = f"{d}#m{j}"
            w, h, ms = 0, 0, 0
            if kind == "image":
                w, h = int(rng.randint(16, 512)), int(rng.randint(16, 512))
            else:
                ms = int(rng.randint(1000, 60000))
            rows["media_id"].append(mid)
            rows["doc_id"].append(d)
            rows["kind"].append(kind)
            rows["payload"].append(make_fake_payload(mid, kind, w, h, ms))
            rows["declared_width"].append(w)
            rows["declared_height"].append(h)
            rows["declared_ms"].append(ms)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame-sample — the other two actor-pool media stages
# ---------------------------------------------------------------------------


class StubTranscoder:
    """Production resize/frame-extract slot (PIL/ffmpeg) — the sandbox
    has neither, so this raises; :class:`FakeTranscoder` carries the
    tested contract."""

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError("real image resize needs PIL")

    def frame(self, payload: bytes, ts_ms: int) -> bytes:
        raise NotImplementedError("real frame extraction needs ffmpeg")


class FakeTranscoder:
    """Deterministic transcode over :func:`make_fake_payload` payloads:
    `resize` re-emits a payload with the new header dims and a body
    whose length scales with the pixel-area ratio (the byte-size
    accounting a real codec shows); `frame` derives a per-timestamp
    image payload from the video body. Both are pure functions of
    (payload, args) — re-running a failed task reproduces bytes."""

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        meta = FakeDecoder().decode(payload)
        if meta["kind"] != "image":
            raise ValueError("resize: not an image payload")
        old_area = max(1, meta["width"] * meta["height"])
        new_len = max(16, int((len(payload) - 17) * (w * h) / old_area))
        header = _MAGIC + struct.pack("<BiiI", 1, w, h, 0)
        seed_src = payload[17:] + struct.pack("<ii", w, h)
        seed = int.from_bytes(hashlib.md5(seed_src).digest()[:4], "little")
        return header + np.random.RandomState(seed).bytes(new_len)

    def frame(self, payload: bytes, ts_ms: int) -> bytes:
        meta = FakeDecoder().decode(payload)
        if meta["kind"] != "video":
            raise ValueError("frame: not a video payload")
        header = _MAGIC + struct.pack("<BiiI", 1, 64, 64, 0)
        seed_src = payload[17:] + struct.pack("<I", ts_ms)
        seed = int.from_bytes(hashlib.md5(seed_src).digest()[:4], "little")
        return header + np.random.RandomState(seed).bytes(64)


class ImageResizer:
    """Actor-pool stage: payload→payload image resize to a bounding
    box, preserving aspect ratio (the standard thumbnail contract).
    Non-image rows pass through untouched. Transcoder built once per
    actor; batches stay payload-small."""

    def __init__(self, max_w: int = 256, max_h: int = 256,
                 transcoder_cls=FakeTranscoder):
        self.max_w, self.max_h = max_w, max_h
        self.t = transcoder_cls()

    def _target(self, w: int, h: int) -> tuple[int, int]:
        if w <= 0 or h <= 0:
            return w, h
        scale = min(self.max_w / w, self.max_h / h, 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        ws = batch.column("declared_width").to_pylist()
        hs = batch.column("declared_height").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_p, out_w, out_h = [], [], []
        for kind, w, h, p in zip(kinds, ws, hs, payloads):
            if kind != "image":
                out_p.append(p)
                out_w.append(w)
                out_h.append(h)
                continue
            tw, th = self._target(w, h)
            out_p.append(p if (tw, th) == (w, h)
                         else self.t.resize(p, tw, th))
            out_w.append(tw)
            out_h.append(th)
        return pa.table({
            "media_id": batch.column("media_id"),
            "doc_id": batch.column("doc_id"),
            "kind": batch.column("kind"),
            "payload": pa.array(out_p, pa.large_binary()),
            "declared_width": pa.array(out_w, pa.int32()),
            "declared_height": pa.array(out_h, pa.int32()),
            "declared_ms": batch.column("declared_ms"),
        })


class FrameSampler:
    """Actor-pool stage: video payload → one IMAGE payload row per
    sampled frame at ``fps`` (row-expanding map_batches — the Ray-Data
    shape for 1→N media stages). Output rows are independent of input
    batching: (media_id, doc_id, frame_no, ts_ms, payload)."""

    def __init__(self, fps: float = 1.0, max_frames: int = 32,
                 transcoder_cls=FakeTranscoder):
        self.fps, self.max_frames = fps, max_frames
        self.t = transcoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "doc_id": [], "frame_no": [],
               "ts_ms": [], "payload": []}
        for mid, did, kind, ms, p in zip(
                batch.column("media_id").to_pylist(),
                batch.column("doc_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("declared_ms").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            n = min(self.max_frames,
                    max(1, int(ms / 1000.0 * self.fps)))
            for i in range(n):
                ts = int(i * 1000.0 / self.fps)
                out["media_id"].append(mid)
                out["doc_id"].append(did)
                out["frame_no"].append(i)
                out["ts_ms"].append(ts)
                out["payload"].append(self.t.frame(p, ts))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "frame_no": pa.array(out["frame_no"], pa.int32()),
            "ts_ms": pa.array(out["ts_ms"], pa.int32()),
            "payload": pa.array(out["payload"], pa.large_binary()),
        })


def resize_images(ds: ray.data.Dataset, max_w: int = 256,
                  max_h: int = 256, transcoder_cls=FakeTranscoder,
                  batch_size: int = 32,
                  concurrency=(1, 8)) -> ray.data.Dataset:
    """media table → media table with images bounded to (max_w, max_h)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h,
                               "transcoder_cls": transcoder_cls},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5)


def sample_frames(ds: ray.data.Dataset, fps: float = 1.0,
                  max_frames: int = 32, transcoder_cls=FakeTranscoder,
                  batch_size: int = 16,
                  concurrency=(1, 8)) -> ray.data.Dataset:
    """media table → frame rows (videos only; 1→N expansion)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps, "max_frames": max_frames,
                               "transcoder_cls": transcoder_cls},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5)
