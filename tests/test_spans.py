"""Span extraction: the interleaved text+media representation."""

import pyarrow as pa

from web2llmstxt_ray import schema as S
from web2llmstxt_ray.stages.spans import SpanExtractor, extract_spans, spans_key

DOC = """# Title Here

Intro paragraph with a [normal link](https://a.test/docs) inline.

## Section

Some text before ![alt text](https://a.test/img.png) and after.

```python
print(1)
```

[download sample](https://a.test/file.pdf)

Final words.
"""


class TestExtractSpans:
    def test_kinds_and_order(self):
        spans = extract_spans(DOC)
        kinds = [s["kind"] for s in spans]
        assert kinds == [
            "heading", "text", "heading", "text", "image", "text",
            "code", "link_media", "text",
        ]

    def test_offsets_strictly_increasing(self):
        spans = extract_spans(DOC)
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)

    def test_offsets_point_into_source(self):
        spans = extract_spans(DOC)
        for s in spans:
            if s["kind"] == "heading":
                assert DOC[s["offset"]] == "#"
            elif s["kind"] == "image":
                assert DOC[s["offset"]] == "!"

    def test_media_refs(self):
        spans = extract_spans(DOC)
        img = [s for s in spans if s["kind"] == "image"][0]
        assert img["media_ref"] == "https://a.test/img.png"
        assert img["text"] == "alt text"
        lm = [s for s in spans if s["kind"] == "link_media"][0]
        assert lm["media_ref"] == "https://a.test/file.pdf"

    def test_normal_links_stay_in_text(self):
        spans = extract_spans(DOC)
        intro = [s for s in spans if s["kind"] == "text"][0]
        assert "[normal link](https://a.test/docs)" in intro["text"]

    def test_code_block_content(self):
        spans = extract_spans(DOC)
        code = [s for s in spans if s["kind"] == "code"][0]
        assert code["text"] == "print(1)"

    def test_empty_doc(self):
        assert extract_spans("") == []

    def test_unterminated_fence(self):
        spans = extract_spans("```\ncode without end")
        assert spans[-1]["kind"] == "code"

    def test_deterministic(self):
        assert spans_key(extract_spans(DOC)) == spans_key(extract_spans(DOC))


class TestSpanExtractorStage:
    def test_batch_shape(self):
        batch = pa.table({"url": ["u1", "u2"], "content": [DOC, "plain text only"]})
        out = SpanExtractor()(batch)
        assert out.schema.equals(S.SPAN_DOCUMENTS)
        assert out.num_rows == 2
        spans2 = out.column("spans").to_pylist()[1]
        assert spans2[0]["kind"] == "text"
