"""Crawl4AI-fidelity HTML → markdown rendering for the raw-HTML parse
path (SURVEY §2 M6; round-3 verdict item 5).

The reference consumes Crawl4AI's ``markdown.fit_markdown or
markdown.raw_markdown`` (``/root/reference/crawler/web_crawler.py:
108-110``): a full markdown rendering of the page with a
readability-style content filter in front of it. This module
reproduces both tiers from scratch on the stdlib ``HTMLParser`` —
no external dependency, deterministic output:

- :func:`raw_markdown` — full-fidelity render: headings, paragraphs,
  nested/ordered lists, tables, blockquotes, fenced code, images,
  links, emphasis, rules.
- :func:`fit_markdown` — the same render over a PRUNED tree:
  structural boilerplate (nav/footer/aside/form + id/class patterns)
  is dropped, then link-dense low-text blocks are removed by the
  classic readability link-density heuristic.

Both are pure functions of the HTML string — safe to call from any
``map_batches`` stage, no per-call state. The fetchers use
``fit_markdown(html) or raw_markdown(html)`` — exactly the
reference's selection chain: a page whose *entire* content is pruned
as boilerplate falls back to the raw render rather than vanishing.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# tags whose subtree never contributes content
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head",
              "iframe", "object", "embed"}
# tags that terminate an open <p>/<li> implicitly (HTML5 optional
# end-tag handling — enough for real-world pages)
_AUTOCLOSE_P = {"p", "div", "section", "article", "ul", "ol", "table",
                "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
                "header", "footer", "nav", "aside", "main", "figure",
                "hr", "form"}
_VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "source",
              "wbr", "area", "base", "col", "embed", "track", "param"}

# structural boilerplate: always pruned in fit mode
_FIT_DROP_TAGS = {"nav", "footer", "aside", "form", "button"}
# id/class markers of boilerplate containers (Crawl4AI/readability's
# negative-pattern list, trimmed to the high-precision core)
_FIT_DROP_PAT = re.compile(
    r"(?:^|[-_ ])(?:nav|menu|footer|sidebar|side-bar|breadcrumbs?|"
    r"banner|cookie|consent|promo|advert|ads?|share|social|comments?|"
    r"related|widget|popup|modal|subscribe|newsletter)(?:$|[-_ ])",
    re.IGNORECASE)
# link-density prune (readability): a candidate block whose anchor
# text dominates and which carries little prose is navigation chrome
_FIT_DENSITY_TAGS = {"div", "section", "ul", "ol", "table", "header"}
_FIT_LINK_DENSITY = 0.5
_FIT_MIN_WORDS = 40


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or ())
        self.children: list = []          # _Node | str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.cur = self.root
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in _SKIP_TAGS:
                self._skip_depth += 1
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = 1
            return
        if tag in _VOID_TAGS:
            self.cur.children.append(_Node(tag, attrs, self.cur))
            return
        # implicit close of <p>/<li> when a block opens
        if tag in _AUTOCLOSE_P:
            n = self.cur
            while n is not self.root and n.tag in ("p", "li") \
                    and not (tag == "li" and n.tag == "li"):
                if tag == "p" and n.tag == "li":
                    break
                n = n.parent
                self.cur = n
        if tag == "li":
            # close a dangling open <li> at the same list level
            if self.cur.tag == "li":
                self.cur = self.cur.parent
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag not in _SKIP_TAGS:
            self.cur.children.append(_Node(tag, attrs, self.cur))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in _SKIP_TAGS:
                self._skip_depth -= 1
            return
        if tag in _VOID_TAGS:
            return
        n = self.cur
        while n is not self.root:
            if n.tag == tag:
                self.cur = n.parent
                return
            n = n.parent
        # unmatched close tag: ignore

    def handle_data(self, data):
        if self._skip_depth:
            return
        if data:
            self.cur.children.append(data)


def _parse(html: str) -> _Node:
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass  # salvage whatever parsed; renderer handles any tree
    return b.root


# ---------------------------------------------------------------------------
# fit pruning
# ---------------------------------------------------------------------------


def _text_stats(node) -> tuple[int, int]:
    """(total_text_chars, anchor_text_chars) of a subtree."""
    if isinstance(node, str):
        return sum(len(w) for w in node.split()), 0
    total = anchor = 0
    for c in node.children:
        t, a = _text_stats(c)
        total += t
        anchor += a
    if node.tag == "a":
        anchor = total
    return total, anchor


def _word_count(node) -> int:
    if isinstance(node, str):
        return len(node.split())
    return sum(_word_count(c) for c in node.children)


def _marker_match(node: _Node) -> bool:
    blob = " ".join(
        str(node.attrs.get(k, "")) for k in ("id", "class", "role"))
    if node.attrs.get("role") in ("navigation", "banner", "contentinfo",
                                  "complementary"):
        return True
    return bool(blob and _FIT_DROP_PAT.search(blob))


def _prune(node: _Node) -> None:
    kept = []
    for c in node.children:
        if isinstance(c, str):
            kept.append(c)
            continue
        if c.tag in _FIT_DROP_TAGS or _marker_match(c):
            continue
        if c.tag in _FIT_DENSITY_TAGS:
            total, anchor = _text_stats(c)
            words = _word_count(c)
            if (total > 0 and anchor / total > _FIT_LINK_DENSITY
                    and words < _FIT_MIN_WORDS):
                continue
        _prune(c)
        kept.append(c)
    node.children = kept


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCKS = {"p", "div", "section", "article", "main", "header", "footer",
           "nav", "aside", "figure", "figcaption", "details", "summary",
           "address", "dl", "dt", "dd"}
# everything the container branch must recurse into (vs render inline)
_BLOCKLIKE = (set(_HEADINGS) | _BLOCKS
              | {"ul", "ol", "table", "pre", "blockquote", "hr", "p",
                 "html", "body", "#root", "li", "tr"})


def _inline_text(node) -> str:
    """Render a subtree as ONE inline markdown string (whitespace
    collapsed) — used inside headings, paragraphs, cells, list items."""
    if isinstance(node, str):
        return re.sub(r"\s+", " ", node)
    tag = node.tag
    inner = "".join(_inline_text(c) for c in node.children)
    if tag == "a":
        href = node.attrs.get("href", "")
        label = inner.strip()
        if not label and not href:
            return ""
        return f"[{label}]({href})"
    if tag == "img":
        alt = node.attrs.get("alt", "")
        src = node.attrs.get("src", "")
        return f"![{alt}]({src})"
    if tag in ("strong", "b"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if tag in ("em", "i"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if tag == "code":
        s = inner.strip()
        return f"`{s}`" if s else ""
    if tag == "br":
        return "\n"
    return inner


def _render_table(node: _Node, out: list) -> None:
    rows: list[list[str]] = []
    header_rows = 0

    def walk_rows(n, in_thead):
        nonlocal header_rows
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag in ("thead", "tbody", "tfoot"):
                walk_rows(c, c.tag == "thead")
            elif c.tag == "tr":
                cells = [" ".join(_inline_text(x).split())
                         for x in c.children
                         if not isinstance(x, str)
                         and x.tag in ("td", "th")]
                if cells:
                    rows.append(cells)
                    if in_thead or all(
                            not isinstance(x, str) and x.tag == "th"
                            for x in c.children
                            if not isinstance(x, str)
                            and x.tag in ("td", "th")):
                        if len(rows) - 1 == header_rows:
                            header_rows += 1

    walk_rows(node, False)
    if not rows:
        return
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out.append("| " + " | ".join(rows[0]) + " |")
    out.append("|" + "|".join([" --- "] * width) + "|")
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    out.append("")


def _render_list(node: _Node, out: list, depth: int,
                 ordered: bool) -> None:
    idx = 1
    for c in node.children:
        if isinstance(c, str):
            continue
        if c.tag == "li":
            marker = f"{idx}." if ordered else "-"
            idx += 1
            # inline part of the li (text before nested lists)
            inline_parts, sublists = [], []
            for x in c.children:
                if not isinstance(x, str) and x.tag in ("ul", "ol"):
                    sublists.append(x)
                else:
                    inline_parts.append(_inline_text(x))
            text = " ".join("".join(inline_parts).split())
            out.append("  " * depth + f"{marker} {text}".rstrip())
            for s in sublists:
                _render_list(s, out, depth + 1, s.tag == "ol")
        elif c.tag in ("ul", "ol"):   # list directly nested in list
            _render_list(c, out, depth + 1, c.tag == "ol")
    if depth == 0:
        out.append("")


def _render_block(node, out: list) -> None:
    if isinstance(node, str):
        s = " ".join(node.split())
        if s:
            out.append(s)
        return
    tag = node.tag
    if tag in _HEADINGS:
        text = " ".join(_inline_text(node).split())
        out.append("#" * _HEADINGS[tag] + " " + text)
        out.append("")
        return
    if tag in ("ul", "ol"):
        _render_list(node, out, 0, tag == "ol")
        return
    if tag == "table":
        _render_table(node, out)
        return
    if tag == "pre":
        code = _plain_text(node)
        out.append("```")
        out.extend(code.rstrip("\n").split("\n"))
        out.append("```")
        out.append("")
        return
    if tag == "blockquote":
        sub: list = []
        for c in node.children:
            _render_block(c, sub)
        while sub and sub[-1] == "":
            sub.pop()
        out.extend("> " + l if l else ">" for l in sub)
        out.append("")
        return
    if tag == "hr":
        out.append("---")
        out.append("")
        return
    if tag == "p":
        text = " ".join(_inline_text(node).split())
        if text:
            out.append(text)
            out.append("")
        return
    if tag in _BLOCKS or tag in ("#root", "html", "body",
                                 "li", "tr", "td", "th"):
        # container: group consecutive inline children into implicit
        # paragraphs, recurse into block children
        run: list = []

        def flush():
            if run:
                text = " ".join("".join(run).split())
                if text:
                    out.append(text)
                    out.append("")
                run.clear()

        for c in node.children:
            if isinstance(c, str) or c.tag not in _BLOCKLIKE:
                run.append(_inline_text(c))
            else:
                flush()
                _render_block(c, out)
        flush()
        return
    # unknown tag: treat as container of blocks
    for c in node.children:
        _render_block(c, out)


def _plain_text(node) -> str:
    if isinstance(node, str):
        return node
    return "".join(_plain_text(c) for c in node.children)


def _render(root: _Node) -> str:
    out: list = []
    _render_block(root, out)
    # collapse runs of blank lines, strip edges
    lines: list = []
    for l in out:
        if l == "" and (not lines or lines[-1] == ""):
            continue
        lines.append(l)
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def raw_markdown(html: str) -> str:
    """Full-fidelity markdown render of the page (Crawl4AI
    ``raw_markdown`` tier)."""
    if not html:
        return ""
    return _render(_parse(html))


def fit_markdown(html: str) -> str:
    """Readability-filtered markdown (Crawl4AI ``fit_markdown`` tier):
    structural boilerplate and link-dense low-prose blocks pruned
    before rendering. Empty when the filter leaves nothing — callers
    chain ``fit_markdown(h) or raw_markdown(h)`` like the reference."""
    if not html:
        return ""
    root = _parse(html)
    _prune(root)
    return _render(root)
