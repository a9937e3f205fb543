"""HTML plain-text extraction + heading-aware token-sized chunking.

Reimplements the reference's ``core/html_chunker.py`` (HtmlHeadingChunker)
on the stdlib ``html.parser`` (BeautifulSoup/lxml are not available in this
environment, and a from-scratch engine should not depend on them for the hot
path anyway — this code runs inside Arrow-batched UDFs on executors).

Semantics replicated (reference cites):
- DROP_TAGS / DROP_SELECTORS noise stripping    html_chunker.py:30-68,126-131
- extract_plain_text = strip noise + get_text(" ", strip=True) + collapse-ws
                                                html_chunker.py:88-91,338-339
- main-container selection by max text length over CONTENT_SELECTORS
                                                html_chunker.py:133-144
- heading stack -> "A > B > C" heading_path     html_chunker.py:146-174
- block rendering: li -> "- x", pre -> fenced, code -> `x`,
  table -> "a | b" rows, blockquote -> "> x"    html_chunker.py:192-213
- token-aware packing with tail overlap, oversize sentence/char split,
  trailing small-chunk merge                    html_chunker.py:244-336
- token counting uses the tiktoken-less fallback (see tokens.py)

The per-document invariant "byte-identical text per url" (BASELINE.json
input_hint) is defined by ``extract_plain_text`` here: the synthetic pages
table freezes its output in the ``text`` column and tests assert the UDF
reproduces it exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .tokens import count_tokens, split_by_tokens, tail_text

DROP_TAGS = {
    "script", "style", "nav", "footer", "header", "aside", "form", "button",
    "svg", "canvas", "noscript",
}
# html_chunker.py:42-53 — all are class selectors
DROP_CLASSES = {
    "toc", "table-of-contents", "breadcrumb", "breadcrumbs", "nav", "sidebar",
    "related", "article-meta", "article__meta", "article-info",
}
# html_chunker.py:54-67 — (tag, class_or_None, id_or_None)
CONTENT_SELECTORS = [
    ("article", None, None),
    ("main", None, None),
    ("div", "article-body", None),
    ("div", "article-content", None),
    ("div", "article__body", None),
    ("div", None, "article-body"),
    ("div", None, "article-content"),
    ("div", "wiki-content", None),
    ("div", None, "main-content"),
    ("div", None, "content"),
    ("div", None, "content-body"),
    ("div", "markdown-body", None),
]
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
BLOCK_TAGS = {"p", "li", "pre", "code", "table", "blockquote", "dt", "dd"}

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

_WS_RE = re.compile(r"\s+")
_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")
_PARA_SPLIT_RE = re.compile(r"\n\s*\n")


def clean_text(text: str) -> str:
    """html_chunker.py:338-339 (_clean_text)."""
    return _WS_RE.sub(" ", text).strip()


# --- minimal DOM ------------------------------------------------------------


@dataclass
class Node:
    tag: str  # "" for text nodes
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text: str = ""
    parent: "Node | None" = None

    @property
    def is_text(self) -> bool:
        return self.tag == ""

    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def iter_elements(self):
        """Pre-order document-order traversal over element nodes."""
        for child in self.children:
            if not child.is_text:
                yield child
                yield from child.iter_elements()

    def find_all(self, tags: set[str]) -> list["Node"]:
        return [el for el in self.iter_elements() if el.tag in tags]

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """BeautifulSoup-compatible get_text over descendant text nodes."""
        parts: list[str] = []
        self._collect_text(parts)
        if strip:
            parts = [p.strip() for p in parts]
            parts = [p for p in parts if p]
        return separator.join(parts)

    def _collect_text(self, out: list[str]) -> None:
        for child in self.children:
            if child.is_text:
                out.append(child.text)
            else:
                child._collect_text(out)

    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="[document]")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag=tag, attrs={k: (v or "") for k, v in attrs}, parent=self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag=tag, attrs={k: (v or "") for k, v in attrs}, parent=self._stack[-1])
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # tolerant close: pop to the nearest matching open tag
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(
                Node(tag="", text=data, parent=self._stack[-1])
            )


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# --- noise stripping + container selection ----------------------------------


def strip_noise(root: Node) -> None:
    """html_chunker.py:126-131 (_strip_noise)."""
    for el in list(root.find_all(DROP_TAGS)):
        el.decompose()
    for el in [e for e in root.iter_elements() if e.classes() & DROP_CLASSES]:
        el.decompose()


def _find_first(root: Node, tag: str) -> Node | None:
    for el in root.iter_elements():
        if el.tag == tag:
            return el
    return None


def select_main_container(root: Node) -> Node:
    """html_chunker.py:133-144 (_select_main_container)."""
    best: Node | None = None
    best_len = 0
    for tag, cls, id_ in CONTENT_SELECTORS:
        for el in root.iter_elements():
            if el.tag != tag:
                continue
            if cls is not None and cls not in el.classes():
                continue
            if id_ is not None and el.attrs.get("id") != id_:
                continue
            text_len = len(el.get_text(" ", strip=True))
            if text_len > best_len:
                best = el
                best_len = text_len
    if best is not None and best_len > 0:
        return best
    body = _find_first(root, "body")
    return body if body is not None else root


def extract_plain_text(html: str) -> str:
    """html_chunker.py:88-91 (extract_plain_text)."""
    root = parse_html(html)
    strip_noise(root)
    return clean_text(root.get_text(" ", strip=True))


# --- section walking + block rendering --------------------------------------


@dataclass
class HtmlSection:
    heading_path: str
    section_title: str | None
    anchor: str | None
    blocks: list[str]


def _has_block_ancestor(element: Node, container: Node) -> bool:
    parent = element.parent
    while parent is not None and parent is not container:
        if parent.tag in BLOCK_TAGS:
            return True
        parent = parent.parent
    return False


def _table_to_text(table: Node) -> str:
    """html_chunker.py:207-215 (_table_to_text)."""
    rows = []
    for row in table.find_all({"tr"}):
        cells = [
            clean_text(cell.get_text(" ", strip=True))
            for cell in row.find_all({"th", "td"})
        ]
        cells = [cell for cell in cells if cell]
        if cells:
            rows.append(" | ".join(cells))
    return "\n".join(rows)


def _extract_block_text(element: Node) -> str:
    """html_chunker.py:192-205 (_extract_block_text)."""
    if element.tag == "li":
        return f"- {clean_text(element.get_text(' ', strip=True))}"
    if element.tag == "pre":
        return f"```\n{element.get_text()}\n```".strip()
    if element.tag == "code":
        return f"`{element.get_text(strip=True)}`"
    if element.tag == "table":
        return _table_to_text(element)
    if element.tag == "blockquote":
        text = clean_text(element.get_text(" ", strip=True))
        return f"> {text}" if text else ""
    return clean_text(element.get_text(" ", strip=True))


def _extract_anchor(element: Node) -> str | None:
    """html_chunker.py:217-224 (_extract_anchor)."""
    anchor = element.attrs.get("id") or element.attrs.get("name")
    if anchor:
        return str(anchor)
    for link in element.find_all({"a"}):
        if link.attrs.get("id"):
            return str(link.attrs["id"])
    return None


def extract_document_url(root: Node) -> str | None:
    """html_chunker.py:226-236 (_extract_document_url)."""
    for el in root.iter_elements():
        if el.tag == "link" and "canonical" in (el.attrs.get("rel") or "") and el.attrs.get("href"):
            return el.attrs["href"]
    for el in root.iter_elements():
        if el.tag == "meta" and el.attrs.get("property") == "og:url" and el.attrs.get("content"):
            return el.attrs["content"]
    for el in root.iter_elements():
        if el.tag == "meta" and el.attrs.get("name") == "twitter:url" and el.attrs.get("content"):
            return el.attrs["content"]
    return None


def extract_document_title(root: Node) -> str | None:
    """html_chunker.py:238-245 (_extract_document_title)."""
    title = _find_first(root, "title")
    if title is not None and title.get_text(strip=True):
        return clean_text(title.get_text(strip=True))
    h1 = _find_first(root, "h1")
    if h1 is not None and h1.get_text(strip=True):
        return clean_text(h1.get_text(" ", strip=True))
    return None


def extract_sections(container: Node) -> list[HtmlSection]:
    """html_chunker.py:146-174 (_extract_sections)."""
    sections: list[HtmlSection] = []
    heading_stack: list[dict] = []
    current = HtmlSection("", None, None, [])

    for element in container.find_all(HEADING_TAGS | BLOCK_TAGS):
        if _has_block_ancestor(element, container):
            continue
        if element.tag in HEADING_TAGS:
            heading_text = clean_text(element.get_text(" ", strip=True))
            if not heading_text:
                continue
            if current.blocks or current.heading_path:
                sections.append(current)
            level = int(element.tag[1])
            while heading_stack and heading_stack[-1]["level"] >= level:
                heading_stack.pop()
            anchor = _extract_anchor(element)
            heading_stack.append({"level": level, "text": heading_text, "anchor": anchor})
            heading_path = " > ".join(h["text"] for h in heading_stack)
            current = HtmlSection(heading_path, heading_text, anchor, [])
            continue
        block_text = _extract_block_text(element)
        if block_text:
            current.blocks.append(block_text)

    if current.blocks or current.heading_path:
        sections.append(current)
    return sections


# --- token-aware packing -----------------------------------------------------


class HtmlHeadingChunker:
    """Heading-aware chunker; parameter defaults from config/settings.py:140-157."""

    def __init__(
        self,
        target_tokens: int = 800,
        min_tokens: int = 180,
        max_tokens: int = 1000,
        overlap_tokens: int = 100,
        include_heading_path: bool = True,
    ) -> None:
        self.target_tokens = target_tokens
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.overlap_tokens = overlap_tokens
        self.include_heading_path = include_heading_path

    def chunk_html(self, html: str) -> list[dict]:
        """html_chunker.py:93-124 (chunk_html)."""
        root = parse_html(html)
        strip_noise(root)
        document_url = extract_document_url(root)
        document_title = extract_document_title(root)
        container = select_main_container(root)

        chunks: list[dict] = []
        for section in extract_sections(container):
            section_text = "\n\n".join(section.blocks).strip()
            if not section_text and not section.heading_path:
                continue
            if self.include_heading_path and section.heading_path:
                section_text = f"{section.heading_path}\n\n{section_text}".strip()
            for chunk_text in self._split_text(section_text):
                chunk_text = chunk_text.strip()
                if not chunk_text:
                    continue
                chunks.append(
                    {
                        "text": chunk_text,
                        "metadata": {
                            "section_title": section.section_title,
                            "heading_path": section.heading_path,
                            "section_anchor": section.anchor,
                            "document_url": document_url,
                            "document_title": document_title,
                            "token_count": count_tokens(chunk_text),
                        },
                    }
                )
        return chunks

    def _split_text(self, text: str) -> list[str]:
        """html_chunker.py:247-281 (_split_text)."""
        units = [u.strip() for u in _PARA_SPLIT_RE.split(text) if u.strip()]
        expanded_units: list[str] = []
        for unit in units:
            if count_tokens(unit) > self.max_tokens:
                expanded_units.extend(self._split_long_unit(unit))
            else:
                expanded_units.append(unit)

        chunks: list[str] = []
        current_parts: list[str] = []
        current_tokens = 0

        for unit in expanded_units:
            unit_tokens = count_tokens(unit)
            if current_parts and current_tokens + unit_tokens > self.max_tokens:
                chunks.append("\n\n".join(current_parts))
                overlap = tail_text(chunks[-1], self.overlap_tokens)
                current_parts = [overlap] if overlap else []
                current_tokens = count_tokens(overlap)

            if (
                current_parts
                and current_tokens + unit_tokens > self.target_tokens
                and current_tokens >= self.min_tokens
            ):
                chunks.append("\n\n".join(current_parts))
                overlap = tail_text(chunks[-1], self.overlap_tokens)
                current_parts = [overlap] if overlap else []
                current_tokens = count_tokens(overlap)

            current_parts.append(unit)
            current_tokens += unit_tokens

        if current_parts:
            chunks.append("\n\n".join(current_parts))
        return self._merge_small_chunks(chunks)

    def _split_long_unit(self, text: str) -> list[str]:
        """html_chunker.py:283-316 (_split_long_unit)."""
        sentences = [s.strip() for s in _SENTENCE_RE.split(text.strip()) if s.strip()]
        if not sentences:
            return split_by_tokens(text, self.max_tokens, self.overlap_tokens)

        chunks: list[str] = []
        current: list[str] = []
        current_tokens = 0
        for sentence in sentences:
            tokens = count_tokens(sentence)
            if current_tokens + tokens > self.max_tokens and current:
                chunks.append(" ".join(current))
                current = []
                current_tokens = 0
            current.append(sentence)
            current_tokens += tokens
        if current:
            chunks.append(" ".join(current))

        if any(count_tokens(c) > self.max_tokens for c in chunks):
            final: list[str] = []
            for chunk in chunks:
                if count_tokens(chunk) > self.max_tokens:
                    final.extend(split_by_tokens(chunk, self.max_tokens, self.overlap_tokens))
                else:
                    final.append(chunk)
            return [c for c in final if c.strip()]
        return chunks

    def _merge_small_chunks(self, chunks: list[str]) -> list[str]:
        """html_chunker.py:331-336 (_merge_small_chunks)."""
        merged: list[str] = []
        for chunk in chunks:
            chunk_tokens = count_tokens(chunk)
            if merged:
                prev_tokens = count_tokens(merged[-1])
                if chunk_tokens < self.min_tokens and prev_tokens + chunk_tokens <= self.max_tokens:
                    merged[-1] = f"{merged[-1]}\n\n{chunk}".strip()
                    continue
            merged.append(chunk)
        return merged
