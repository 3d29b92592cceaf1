"""Arrow schemas for every table the engine produces or consumes.

The reference keeps its data as Python dicts in lists (schema implied by
dict keys, e.g. page records at ``crawler/web_crawler.py:324-334``); here
every stage boundary is a typed ``pyarrow`` schema so blocks flow
zero-copy through Ray Data's object store.
"""

from __future__ import annotations

import pyarrow as pa

# --- span documents: the engine's primary interleaved text+media table ---
# (driver input_hint: doc_id:string,
#  spans:list<struct<kind:string,text:string,media_ref:string,offset:int32>>)
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # text | heading | code | image | link_media
        ("text", pa.string()),       # textual content, or alt/caption for media
        ("media_ref", pa.string()),  # URL/ref for media kinds, "" for text kinds
        ("offset", pa.int32()),      # char offset in the rendered markdown
    ]
)

SPAN_DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# --- page records: crawl output (reference dict shape,
#     crawler/web_crawler.py:324-334 + discovery_phase at :116-127) ---
PAGE_RECORDS = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("content", pa.large_string()),
        ("word_count", pa.int64()),
        ("score", pa.float64()),
        ("depth", pa.int32()),
        ("session_id", pa.string()),
        ("crawl_timestamp", pa.timestamp("us")),
        ("discovery_phase", pa.string()),  # main_page | depth_{d} | sitemap
        ("visit_index", pa.int64()),       # engine-added: total crawl order
    ]
)

# --- seed URLs: crawl input ---
SEED_URLS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority_hint", pa.float64()),
    ]
)

# --- synthetic site: the mock web served to the fetch stage in tests ---
SYNTHETIC_SITE = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("html", pa.large_string()),
        ("markdown", pa.large_string()),
        ("title_meta", pa.string()),
        ("word_count", pa.int32()),
        ("out_links", pa.list_(pa.string())),
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("disallow", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int32()),
        ("sitemap_urls", pa.list_(pa.string())),
    ]
)

# --- llms entries: description-stage output
#     (generator/llms_generator.py:659-666 + pyc const-key tuple) ---
LLMS_ENTRIES = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("word_count", pa.int64()),
        ("session_id", pa.string()),
        ("index", pa.int64()),
        ("category", pa.string()),  # engine-added (A4 categories)
    ]
)

# --- description cache (models/client.py:68-92) ---
DESCRIPTION_CACHE = pa.schema(
    [
        ("url", pa.string()),
        ("content_hash", pa.string()),
        ("description", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty pyarrow table with the given schema."""
    return schema.empty_table()
