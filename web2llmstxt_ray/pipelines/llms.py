"""Description generation + llms.txt assembly (SURVEY T1-T3, A4-A6, K1-K5).

The description stage mirrors the reference's *testing-instrumented*
path: the pyc ``generate_description_with_fallbacks`` docstring reads
"FOR TESTING: Always uses fallback description logic" — it bypasses AI
and calls the deterministic ``create_smart_fallback_description``
(``llmsgen/utils/text_utils.py:214-221``). That deterministic path is
this engine's default and test mode; a real model client would slot
into :class:`Describer` the same way (actor pool, model loaded in
``__init__`` — reference T1/T2, ``llmsgen/models/client.py:16-139``).

The description cache (J2, ``models/client.py:68-92``) is a broadcast
join: the cache table is small relative to the corpus, so it ships once
via ``ray.put`` and probes happen dict-side inside ``map_batches`` — no
shuffle. Misses come back as new cache rows to append.

Rendering (K2/K3 — the llmsgen conformance formats,
``llmsgen/utils/file_utils.py:107-160``) is driver-side over the small
ordered entry list; full-text rendering streams per-page blocks.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray
import ray.data

from .. import schema as S
from ..functions.categorize import CATEGORY_ORDER, categorize_entry, site_name, site_summary
from ..functions.text import content_hash
from ..functions.urls import extract_domain_from_url
from ..models import DEFAULT_MODELS, generate_description, make_client

ENTRY_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("word_count", pa.int64()),
        ("session_id", pa.string()),
        ("index", pa.int64()),
        ("category", pa.string()),
        ("from_cache", pa.bool_()),
    ]
)


class Describer:
    """``map_batches`` stage: page records → llms entries.

    One instance per actor: the broadcast description cache is resolved
    once in ``__init__``; each batch is a pure projection after that.
    ``index`` carries the crawl order through (O4).
    """

    def __init__(self, cache_ref=None, session_id: str = "ray_crawl",
                 model=None):
        cache = (ray.get(cache_ref) if isinstance(cache_ref, ray.ObjectRef)
                 else cache_ref)
        self.cache: dict[tuple[str, str], str] = cache or {}
        self.session_id = session_id
        # model client is constructed ONCE per actor (T1/T2: session +
        # warm-up amortized across batches); defaults to the
        # deterministic always-fallback test path
        self.client = make_client(model or DEFAULT_MODELS[0])

    def describe_one(self, url: str, title: str, content: str) -> tuple[str, bool]:
        key = (url, content_hash(title, content))
        hit = self.cache.get(key)
        if hit is not None:
            return hit, True
        desc, _ = generate_description(self.client, title, content, url)
        return desc, False

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        titles = batch.column("title").to_pylist()
        contents = batch.column("content").to_pylist()
        wcs = batch.column("word_count").to_pylist()
        idxs = (batch.column("visit_index").to_pylist()
                if "visit_index" in batch.column_names else list(range(len(urls))))
        descs, cached, cats = [], [], []
        for u, t, c in zip(urls, titles, contents):
            d, was_cached = self.describe_one(u, t, c or "")
            descs.append(d)
            cached.append(was_cached)
            cats.append(categorize_entry(u, t, c or ""))
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()), pa.array(titles, pa.string()),
                pa.array(descs, pa.string()), pa.array(wcs, pa.int64()),
                pa.array([self.session_id] * len(urls), pa.string()),
                pa.array(idxs, pa.int64()), pa.array(cats, pa.string()),
                pa.array(cached, pa.bool_()),
            ],
            schema=ENTRY_SCHEMA,
        )


def describe_pages(pages: ray.data.Dataset,
                   cache: dict[tuple[str, str], str] | None = None,
                   session_id: str = "ray_crawl",
                   concurrency: int | tuple = (1, 8),
                   batch_size: int = 256) -> ray.data.Dataset:
    """Page records → llms entries (description + category attached).

    The actor pool autoscales from 1 and reserves half a CPU per actor
    so it can never starve the upstream read stage of CPUs (a fixed
    pool of num_cpus=1 actors on a small node deadlocks the pipeline).
    """
    cache_ref = ray.put(cache) if cache else None
    return pages.map_batches(
        Describer,
        fn_constructor_kwargs={"cache_ref": cache_ref, "session_id": session_id},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def new_cache_rows(entries: pa.Table, pages: pa.Table) -> pa.Table:
    """Cache rows to append for entries generated this run (K6 —
    batched append, unlike the reference's per-insert JSON flush)."""
    by_url = dict(zip(pages.column("url").to_pylist(),
                      zip(pages.column("title").to_pylist(),
                          pages.column("content").to_pylist())))
    rows = {"url": [], "content_hash": [], "description": []}
    for url, desc, cached in zip(entries.column("url").to_pylist(),
                                 entries.column("description").to_pylist(),
                                 entries.column("from_cache").to_pylist()):
        if cached or url not in by_url:
            continue
        title, content = by_url[url]
        rows["url"].append(url)
        rows["content_hash"].append(content_hash(title, content or ""))
        rows["description"].append(desc)
    return pa.Table.from_pydict(rows, schema=S.DESCRIPTION_CACHE)


# --- renderers (llmsgen conformance formats) ---

def _backfill_snippet(content: str | None) -> str:
    """The J1 description backfill text for a page's content
    (``llmsgen/utils/file_utils.py:122-133``)."""
    return (" ".join(content.split()[:30]) + "..."
            if content else "No content available.")


def _render_llms_txt_core(name: str, summary: str, n_pages: int,
                          entries: pa.Table, backfill: dict[str, str],
                          generated_date: str) -> str:
    """Shared K2 renderer over the SMALL inputs: the site name/summary,
    the entry index, and per-url backfill snippets for entries with no
    description — both the driver-table and the streaming path delegate
    here, so their output is byte-identical."""
    lines = [f"# {name}", "", f"> {summary}", "",
             f"Generated from {n_pages} pages on {generated_date} "
             "using automated crawling.", ""]
    by_cat: dict[str, list[tuple[str, str, str]]] = {}
    for url, title, desc, cat in zip(entries.column("url").to_pylist(),
                                     entries.column("title").to_pylist(),
                                     entries.column("description").to_pylist(),
                                     entries.column("category").to_pylist()):
        if not desc:
            desc = backfill.get(url, "No content available.")
        by_cat.setdefault(cat, []).append((title, url, desc))
    for cat in CATEGORY_ORDER:
        if cat not in by_cat:
            continue
        lines.append(f"## {cat}")
        lines.append("")
        for title, url, desc in by_cat[cat]:
            lines.append(f"- [{title}]({url}): {desc}")
        lines.append("")
    return "\n".join(lines)


def render_llms_txt(base_url: str, entries: pa.Table, pages: pa.Table,
                    generated_date: str = "2025-01-01") -> str:
    """K2: ``# site`` / ``> summary`` / categorized bullet sections
    (``llmsgen/utils/file_utils.py:107-136``). ``entries``/``pages``
    must be in crawl order (sort by ``index``/``visit_index`` first)."""
    page_urls = pages.column("url").to_pylist()
    page_titles = pages.column("title").to_pylist()
    page_contents = pages.column("content").to_pylist()

    main_title = None
    canon_base = base_url.rstrip("/")
    for u, t in zip(page_urls, page_titles):
        if u == base_url or u.rstrip("/") == canon_base:
            main_title = t
            break
    name = site_name(base_url, main_title)
    summary = site_summary(page_contents[:5])
    # J1: url → content map probed for description backfill
    backfill = {u: _backfill_snippet(c)
                for u, c in zip(page_urls, page_contents)}
    return _render_llms_txt_core(name, summary, len(page_urls), entries,
                                 backfill, generated_date)


def collect_render_probes(pages_ds: ray.data.Dataset, base_url: str,
                          empty_desc_urls: set[str]
                          ) -> tuple[str | None, list[str], dict[str, str]]:
    """ONE content-pruning pass over a page Dataset collecting only the
    tiny driver-side bits llms.txt needs: the base-url page's title,
    the first-5-page contents (summary input), and 30-word backfill
    snippets for ``empty_desc_urls``. Full page content never reaches
    the driver — each batch emits at most a handful of skinny rows."""
    canon_base = base_url.rstrip("/")
    empties = ray.put(set(empty_desc_urls))

    class Probe:
        def __init__(self, empties_ref):
            self.empties: set = ray.get(empties_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            kinds, urls, vis, texts = [], [], [], []
            has_vi = "visit_index" in batch.column_names
            vi = (batch.column("visit_index").to_pylist() if has_vi
                  else [None] * batch.num_rows)
            for u, t, c, v in zip(batch.column("url").to_pylist(),
                                  batch.column("title").to_pylist(),
                                  batch.column("content").to_pylist(),
                                  vi):
                if u == base_url or u.rstrip("/") == canon_base:
                    kinds.append("title")
                    urls.append(u)
                    vis.append(v if v is not None else 0)
                    texts.append(t)
                if v is not None and v < 5:
                    kinds.append("head")
                    urls.append(u)
                    vis.append(v)
                    texts.append(c or "")
                if u in self.empties:
                    kinds.append("backfill")
                    urls.append(u)
                    vis.append(v if v is not None else 0)
                    texts.append(_backfill_snippet(c))
            return pa.table({"kind": pa.array(kinds, pa.string()),
                             "url": pa.array(urls, pa.string()),
                             "visit_index": pa.array(vis, pa.int64()),
                             "text": pa.array(texts, pa.string())})

    pdf = pages_ds.map_batches(
        Probe, fn_constructor_kwargs={"empties_ref": empties},
        batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    main_title = None
    heads: list[tuple[int, str]] = []
    backfill: dict[str, str] = {}
    best_vi = None
    if "kind" not in pdf.columns:        # empty → schema-less frame
        pdf = pdf.reindex(columns=["kind", "url", "visit_index", "text"])
    for kind, url, vi, text in zip(pdf["kind"], pdf["url"],
                                   pdf["visit_index"], pdf["text"]):
        if kind == "title":
            if best_vi is None or vi < best_vi:
                best_vi = vi
                main_title = text
        elif kind == "head":
            heads.append((vi, text))
        else:
            backfill[url] = text
    summary_contents = [t for _, t in sorted(heads)]
    return main_title, summary_contents, backfill


def render_llms_txt_live(base_url: str, entries: pa.Table) -> str:
    """K1: the live-tree format (``generator/llms_generator.py:782-802``):
    ``# {DOMAIN} - LLMs.txt`` header + flat per-entry ``## title`` blocks
    with URL/Description lines, in crawl order."""
    domain = extract_domain_from_url(base_url).upper()
    lines = [f"# {domain} - LLMs.txt", ""]
    for url, title, desc in zip(entries.column("url").to_pylist(),
                                entries.column("title").to_pylist(),
                                entries.column("description").to_pylist()):
        lines.append(f"## {title}")
        lines.append(f"URL: {url}")
        lines.append(f"Description: {desc}")
        lines.append("")
    return "\n".join(lines)


def render_llms_full_txt(base_url: str, pages: pa.Table,
                         generated_at: str = "", model_used: str = "fallback",
                         processing_time_s: float | None = None,
                         max_pages: int | None = None) -> str:
    """K3: per-page ``## Page i: title`` blocks in crawl order
    (``llmsgen/utils/file_utils.py:138-160``)."""
    urls = pages.column("url").to_pylist()
    titles = pages.column("title").to_pylist()
    contents = pages.column("content").to_pylist()
    lines = [
        f"# {base_url} llms-full.txt",
        f"# Generated on {generated_at} using {model_used}",
        f"# Total pages crawled: {len(urls)}",
        f"# Processing time: {processing_time_s if processing_time_s is not None else 'N/A'}s",
    ]
    n = len(urls)
    if max_pages is not None and n > max_pages:
        urls, titles, contents = urls[:max_pages], titles[:max_pages], contents[:max_pages]
        lines.append(f"# Displaying {len(urls)} of {n} crawled pages due to limit.")
    lines.append("")
    for i, (u, t, c) in enumerate(zip(urls, titles, contents), 1):
        lines.append(f"## Page {i}: {t}")
        lines.append(f"**URL:** {u}")
        lines.append("")
        lines.append(c or "No content available.")
        lines.append("")
        lines.append("---")
        lines.append("")
    return "\n".join(lines)


def write_llms_full_streaming(pages_ds: ray.data.Dataset, out_path: str,
                              base_url: str, generated_at: str = "",
                              model_used: str = "fallback",
                              total_pages: int | None = None,
                              batch_size: int = 32,
                              processing_time_s: float | None = None
                              ) -> int:
    """K3 at scale: stream page batches (sorted by ``visit_index``
    upstream) straight to the output file — the full corpus never
    materializes on the driver (a 1M-page llms-full.txt renders in
    O(batch) memory). Returns pages written."""
    import os

    d = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(d, exist_ok=True)
    tmp = out_path + ".tmp"
    i = 0
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"# {base_url} llms-full.txt\n")
        f.write(f"# Generated on {generated_at} using {model_used}\n")
        if total_pages is not None:
            f.write(f"# Total pages crawled: {total_pages}\n")
        if processing_time_s is not None:
            f.write(f"# Processing time: {processing_time_s}s\n")
        f.write("\n")
        for batch in pages_ds.iter_batches(batch_size=batch_size,
                                           batch_format="pyarrow"):
            for u, t, c in zip(batch.column("url").to_pylist(),
                               batch.column("title").to_pylist(),
                               batch.column("content").to_pylist()):
                i += 1
                f.write(f"## Page {i}: {t}\n**URL:** {u}\n\n")
                f.write(c or "No content available.")
                f.write("\n\n---\n\n")
    import os as _os

    _os.replace(tmp, out_path)
    return i


def export_payload(metadata: dict, entries: pa.Table, pages: pa.Table,
                   include_full_text: bool = True) -> dict:
    """K4/K5 payload: {metadata, llms_entries[, full_content_pages]} —
    reference-exact keys and gating
    (``llmsgen/utils/file_utils.py:166-202``: the pages list appears
    under ``full_content_pages`` and only when ``include_full_text``)."""
    payload = {
        "metadata": metadata,
        "llms_entries": entries.drop_columns(["from_cache"]).to_pylist(),
    }
    if include_full_text:
        payload["full_content_pages"] = [
            {"url": u, "title": t, "content": c}
            for u, t, c in zip(pages.column("url").to_pylist(),
                               pages.column("title").to_pylist(),
                               pages.column("content").to_pylist())
        ]
    return payload


def write_outputs(output_dir: str, base_url: str, entries: pa.Table,
                  pages: pa.Table, metadata: dict,
                  export_format: str = "text",
                  include_full_text: bool = True) -> list[str]:
    """K1-K5 dispatch (``generator/llms_generator.py:766-780``):
    text → llms.txt + llms-full.txt; json/yaml → single payload file."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    domain = extract_domain_from_url(base_url)
    written = []
    if export_format == "text":
        p1 = os.path.join(output_dir, f"{domain}-llms.txt")
        with open(p1, "w", encoding="utf-8") as f:
            f.write(render_llms_txt(
                base_url, entries, pages,
                generated_date=metadata.get("generated_at", "").split("T")[0]))
        p2 = os.path.join(output_dir, f"{domain}-llms-full.txt")
        with open(p2, "w", encoding="utf-8") as f:
            f.write(render_llms_full_txt(
                base_url, pages, metadata.get("generated_at", ""),
                metadata.get("model_used", "fallback"),
                metadata.get("processing_time_seconds")))
        written += [p1, p2]
    elif export_format == "json":
        p = os.path.join(output_dir, f"{domain}-llms.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump(export_payload(metadata, entries, pages,
                                     include_full_text),
                      f, indent=2, ensure_ascii=False)
        written.append(p)
    elif export_format == "yaml":
        import yaml

        p = os.path.join(output_dir, f"{domain}-llms.yaml")
        with open(p, "w", encoding="utf-8") as f:
            yaml.safe_dump(export_payload(metadata, entries, pages,
                                          include_full_text),
                           f, sort_keys=False, allow_unicode=True)
        written.append(p)
    else:
        raise ValueError(f"unknown export format: {export_format}")
    return written


def _iter_page_dicts(pages_ds: ray.data.Dataset, batch_size: int = 32):
    # 32 pages/batch bounds driver transients to ~MBs even for
    # 100s-of-KB pages; the writer is file-I/O-bound either way
    for batch in pages_ds.iter_batches(batch_size=batch_size,
                                       batch_format="pyarrow"):
        for u, t, c in zip(batch.column("url").to_pylist(),
                           batch.column("title").to_pylist(),
                           batch.column("content").to_pylist()):
            yield {"url": u, "title": t, "content": c}


def write_payload_json_streaming(path: str, metadata: dict,
                                 entries: pa.Table,
                                 pages_ds: ray.data.Dataset,
                                 include_full_text: bool = True) -> None:
    """K4 at scale: the ``export_payload`` JSON document written with
    ``full_content_pages`` streamed batch-by-batch — page content is
    O(batch) on the driver. Key set and unicode handling are
    reference-exact (``llmsgen/utils/file_utils.py:166-183``)."""
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write('{\n"metadata": ')
        f.write(json.dumps(metadata, indent=2, ensure_ascii=False))
        f.write(',\n"llms_entries": ')
        f.write(json.dumps(entries.drop_columns(["from_cache"]).to_pylist(),
                           indent=2, ensure_ascii=False))
        if include_full_text:
            f.write(',\n"full_content_pages": [')
            first = True
            for item in _iter_page_dicts(pages_ds):
                f.write(("" if first else ",") + "\n")
                f.write(json.dumps(item, ensure_ascii=False))
                first = False
            f.write("\n]" if not first else "]")
        f.write("\n}\n")
    import os

    os.replace(tmp, path)


def write_payload_yaml_streaming(path: str, metadata: dict,
                                 entries: pa.Table,
                                 pages_ds: ray.data.Dataset,
                                 include_full_text: bool = True) -> None:
    """K5 at scale: YAML payload with ``full_content_pages`` streamed
    as list items batch-by-batch (each batch rendered as a YAML list
    fragment — concatenated fragments form one valid sequence)."""
    import yaml

    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        yaml.safe_dump({"metadata": metadata}, f, sort_keys=False,
                       allow_unicode=True)
        yaml.safe_dump(
            {"llms_entries": entries.drop_columns(["from_cache"])
             .to_pylist()}, f, sort_keys=False, allow_unicode=True)
        if include_full_text:
            f.write("full_content_pages:\n")
            wrote_any = False
            for item in _iter_page_dicts(pages_ds):
                f.write(yaml.safe_dump([item], sort_keys=False,
                                       allow_unicode=True,
                                       default_flow_style=False))
                wrote_any = True
            if not wrote_any:
                f.write("  []\n")
    import os

    os.replace(tmp, path)


def write_outputs_streaming(output_dir: str, base_url: str,
                            entries: pa.Table, metadata: dict,
                            pages_ds: ray.data.Dataset,
                            export_format: str = "text",
                            include_full_text: bool = True) -> list[str]:
    """K1-K5 dispatch at corpus scale: the renders consume the page
    Dataset (sorted by ``visit_index`` by the caller) via streaming
    batches and the one-pass :func:`collect_render_probes`; full page
    content NEVER materializes on the driver — only the small entry
    index, the probe snippets, and metadata do. Output is
    byte-compatible with :func:`write_outputs` (both K2 paths share
    ``_render_llms_txt_core``)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    domain = extract_domain_from_url(base_url)
    n_pages = metadata.get("total_pages_crawled",
                           metadata.get("analytics", {})
                           .get("crawl", {}).get("total_pages", 0))
    written = []
    if export_format == "text":
        empty_desc = {u for u, d in zip(entries.column("url").to_pylist(),
                                        entries.column("description")
                                        .to_pylist()) if not d}
        main_title, head_contents, backfill = collect_render_probes(
            pages_ds, base_url, empty_desc)
        name = site_name(base_url, main_title)
        summary = site_summary(head_contents)
        p1 = os.path.join(output_dir, f"{domain}-llms.txt")
        with open(p1, "w", encoding="utf-8") as f:
            f.write(_render_llms_txt_core(
                name, summary, n_pages, entries, backfill,
                metadata.get("generated_at", "").split("T")[0]))
        p2 = os.path.join(output_dir, f"{domain}-llms-full.txt")
        write_llms_full_streaming(
            pages_ds, p2, base_url, metadata.get("generated_at", ""),
            metadata.get("model_used", "fallback"),
            total_pages=n_pages,
            processing_time_s=metadata.get("processing_time_seconds"))
        written += [p1, p2]
    elif export_format == "json":
        p = os.path.join(output_dir, f"{domain}-llms.json")
        write_payload_json_streaming(p, metadata, entries, pages_ds,
                                     include_full_text)
        written.append(p)
    elif export_format == "yaml":
        p = os.path.join(output_dir, f"{domain}-llms.yaml")
        write_payload_yaml_streaming(p, metadata, entries, pages_ds,
                                     include_full_text)
        written.append(p)
    else:
        raise ValueError(f"unknown export format: {export_format}")
    return written
