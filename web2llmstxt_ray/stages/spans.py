"""Markdown → interleaved text+media span extraction.

The reference's "extractor" keeps a page as one markdown string
(content = ``fit_markdown or raw_markdown or cleaned_html``,
``crawler/web_crawler.py:108-111,313-316,1133-1137``), collapsing media
into markdown image/link syntax. This engine explodes that string into
the typed interleaved span representation the driver's input_hint
mandates::

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

``kind ∈ {text, heading, code, image, link_media}``; ``offset`` is the
character offset of the span in the source markdown, strictly
increasing. ``extract_spans`` is THE definition of span semantics — the
sequential conformance oracle (``pipelines/oracle.py``) and the
distributed pipeline share it, so row-level span-sequence equality
``(kind, text, media_ref, order)`` tests the *pipeline* (ordering,
dedup, distribution), not two divergent parsers.

Deterministic, pure, no wall clock.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .. import schema as S

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)\)")
_LINK_RE = re.compile(r"(?<!\!)\[([^\]]*)\]\(([^)\s]+)\)")

MEDIA_EXTENSIONS = (
    ".png", ".jpg", ".jpeg", ".gif", ".svg", ".webp", ".ico",
    ".mp4", ".webm", ".mov", ".avi",
    ".mp3", ".wav", ".ogg", ".flac",
    ".pdf",
)


def _is_media_ref(ref: str) -> bool:
    return ref.split("?", 1)[0].lower().endswith(MEDIA_EXTENSIONS)


def extract_spans(markdown: str) -> list[dict]:
    """Parse one markdown document into its ordered span list.

    Scan rules (applied top-to-bottom, offsets are absolute char
    positions in ``markdown``):

    - fenced code blocks (``` ... ```) → one ``code`` span holding the
      inner text; the fence lines themselves are not emitted;
    - heading lines (``# ...`` .. ``###### ...``) → ``heading`` span
      with the heading text (hashes stripped);
    - inline images ``![alt](ref)`` → ``image`` span (text=alt,
      media_ref=ref);
    - markdown links whose target has a media extension → ``link_media``
      span (text=link text, media_ref=target); non-media links stay
      inside the surrounding text span verbatim;
    - everything else accumulates into ``text`` spans, flushed at blank
      lines / special elements; a text span's offset is the offset of
      its first character and its text is the accumulated lines joined
      with ``\\n`` and stripped.
    """
    spans: list[dict] = []
    buf: list[str] = []
    buf_offset = -1

    def flush() -> None:
        nonlocal buf, buf_offset
        if buf:
            text = "\n".join(buf).strip()
            if text:
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": buf_offset})
        buf = []
        buf_offset = -1

    pos = 0
    in_code = False
    code_lines: list[str] = []
    code_offset = -1

    for line in markdown.splitlines(keepends=True):
        raw = line.rstrip("\n")
        line_start = pos
        pos += len(line)

        if raw.startswith("```"):
            if in_code:
                spans.append({"kind": "code", "text": "\n".join(code_lines),
                              "media_ref": "", "offset": code_offset})
                in_code = False
                code_lines = []
            else:
                flush()
                in_code = True
                code_offset = line_start
            continue
        if in_code:
            code_lines.append(raw)
            continue

        m = _HEADING_RE.match(raw)
        if m:
            flush()
            spans.append({"kind": "heading", "text": m.group(2).strip(),
                          "media_ref": "", "offset": line_start})
            continue

        if not raw.strip():
            flush()
            continue

        # split the line around inline media elements
        cursor = 0
        events: list[tuple[int, int, str, str, str]] = []  # (start, end, kind, text, ref)
        for im in _IMAGE_RE.finditer(raw):
            events.append((im.start(), im.end(), "image", im.group(1), im.group(2)))
        for lm in _LINK_RE.finditer(raw):
            if _is_media_ref(lm.group(2)):
                events.append((lm.start(), lm.end(), "link_media",
                               lm.group(1), lm.group(2)))
        events.sort(key=lambda e: e[0])

        for start, end, kind, text, ref in events:
            piece = raw[cursor:start]
            if piece.strip():
                if buf_offset < 0:
                    buf_offset = line_start + cursor
                buf.append(piece)
            flush()
            spans.append({"kind": kind, "text": text, "media_ref": ref,
                          "offset": line_start + start})
            cursor = end
        tail = raw[cursor:]
        if tail.strip():
            if buf_offset < 0:
                buf_offset = line_start + cursor
            buf.append(tail)

    if in_code:  # unterminated fence: emit what we have
        spans.append({"kind": "code", "text": "\n".join(code_lines),
                      "media_ref": "", "offset": code_offset})
    flush()
    return spans


def spans_key(spans: list[dict]) -> tuple:
    """Order-sensitive comparison key implementing the per-row invariant
    ``(kind, text, media_ref, order)``."""
    return tuple((s["kind"], s["text"], s["media_ref"]) for s in spans)


class SpanExtractor:
    """``map_batches`` stage: page batches in, span-document batches out.

    Input columns: ``url`` (→ doc_id) and ``content`` (markdown). Output
    is the ``SPAN_DOCUMENTS`` schema. Stateless and cheap per row but
    kept as a callable class so the compiled regex state and schema are
    constructed once per worker, not per batch.
    """

    def __init__(self, id_col: str = "url", content_col: str = "content"):
        self.id_col = id_col
        self.content_col = content_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.content_col).to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "spans": [extract_spans(t or "") for t in texts],
            },
            schema=S.SPAN_DOCUMENTS,
        )


def render_markdown_from_spans(spans: list[dict]) -> str:
    """Best-effort inverse used by renderers/tests: reassemble a
    markdown-ish text from spans (one block per span)."""
    blocks = []
    for s in spans:
        if s["kind"] == "heading":
            blocks.append(f"# {s['text']}")
        elif s["kind"] == "code":
            blocks.append(f"```\n{s['text']}\n```")
        elif s["kind"] == "image":
            blocks.append(f"![{s['text']}]({s['media_ref']})")
        elif s["kind"] == "link_media":
            blocks.append(f"[{s['text']}]({s['media_ref']})")
        else:
            blocks.append(s["text"])
    return "\n\n".join(blocks)
