"""Legacy recursive character chunking + TextUnit id/offset assignment.

Reimplements:
- the recursive character splitter the reference delegates to LangChain for
  (core/chunking.py:260-264: RecursiveCharacterTextSplitter(chunk_size=1200,
  chunk_overlap=150, separators=["\\n\\n", "\\n", " ", ""]); defaults from
  config/settings.py:138-139). The algorithm below is the standard public
  LangChain recursive-split/greedy-merge algorithm, written from scratch.
- offset/page/hash/id assignment: core/chunking.py:160-235 (running
  ``text.find(chunk, offset)``), page boundaries from "## Page N" markers
  (:464-501), ``content_hash = sha1(content)`` (:503-506), stable TextUnit id
  ``{doc_id}_tu_{start}_{end}_{sha1[:8]}`` (:508-513).
"""

from __future__ import annotations

import hashlib
import re

_PAGE_RE = re.compile(r"^## Page (\d+)", re.MULTILINE)


class RecursiveCharacterSplitter:
    """Recursive split on ["\\n\\n", "\\n", " ", ""] with greedy overlap merge."""

    def __init__(
        self,
        chunk_size: int = 1200,
        chunk_overlap: int = 150,
        separators: tuple[str, ...] = ("\n\n", "\n", " ", ""),
    ) -> None:
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators)

    def split_text(self, text: str) -> list[str]:
        return self._split(text, self.separators)

    def _split(self, text: str, separators: list[str]) -> list[str]:
        final_chunks: list[str] = []
        separator = separators[-1]
        new_separators: list[str] = []
        for i, sep in enumerate(separators):
            if sep == "":
                separator = sep
                break
            if sep in text:
                separator = sep
                new_separators = separators[i + 1 :]
                break

        splits = list(text) if separator == "" else text.split(separator)
        splits = [s for s in splits if s != ""]

        good_splits: list[str] = []
        for s in splits:
            if len(s) < self.chunk_size:
                good_splits.append(s)
            else:
                if good_splits:
                    final_chunks.extend(self._merge(good_splits, separator))
                    good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split(s, new_separators))
        if good_splits:
            final_chunks.extend(self._merge(good_splits, separator))
        return final_chunks

    def _merge(self, splits: list[str], separator: str) -> list[str]:
        sep_len = len(separator)
        docs: list[str] = []
        current: list[str] = []
        total = 0
        for s in splits:
            s_len = len(s)
            if current and total + s_len + sep_len > self.chunk_size:
                doc = separator.join(current).strip()
                if doc:
                    docs.append(doc)
                # slide window: drop from the front until within overlap budget
                while total > self.chunk_overlap or (
                    current and total + s_len + sep_len > self.chunk_size
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current.pop(0)
            current.append(s)
            total += s_len + (sep_len if len(current) > 1 else 0)
        doc = separator.join(current).strip()
        if doc:
            docs.append(doc)
        return docs


def build_page_boundaries(text: str) -> list[dict]:
    """core/chunking.py:464-501 (_build_page_boundaries)."""
    matches = list(_PAGE_RE.finditer(text))
    if not matches:
        return [{"page": 1, "start": 0, "end": len(text)}]
    boundaries = []
    for idx, match in enumerate(matches):
        start = match.start()
        end = matches[idx + 1].start() if idx + 1 < len(matches) else len(text)
        boundaries.append({"page": int(match.group(1)), "start": start, "end": end})
    return boundaries


def page_for_offset(offset: int, boundaries: list[dict]) -> int:
    """core/chunking.py:495-501 (_get_page_for_offset)."""
    for boundary in boundaries:
        if boundary["start"] <= offset < boundary["end"]:
            return boundary["page"]
    return boundaries[-1]["page"] if boundaries else 1


def content_hash(content: str) -> str:
    """core/chunking.py:503-506 — sha1 hex of the chunk text."""
    return hashlib.sha1(content.encode("utf-8")).hexdigest()


def text_unit_id(document_id: str, start: int, end: int, chash: str) -> str:
    """core/chunking.py:508-513 — {doc}_tu_{start}_{end}_{sha1[:8]}."""
    return f"{document_id}_tu_{start}_{end}_{chash[:8]}"


def assign_text_units(document_id: str, text: str, chunks: list[str]) -> list[dict]:
    """Offset/page/hash/id assignment over raw chunk strings.

    core/chunking.py:160-235: running ``text.find(chunk, offset)`` for char
    offsets (fallback to the running offset when not found), page lookup,
    sha1 hash, stable id.
    """
    boundaries = build_page_boundaries(text)
    out: list[dict] = []
    current_offset = 0
    for i, chunk in enumerate(chunks):
        chunk_offset = text.find(chunk, current_offset)
        if chunk_offset == -1:
            chunk_offset = current_offset
        current_offset = chunk_offset + len(chunk)
        start, end = chunk_offset, chunk_offset + len(chunk)
        chash = content_hash(chunk)
        out.append(
            {
                "chunk_id": text_unit_id(document_id, start, end, chash),
                "document_id": document_id,
                "content": chunk,
                "page": page_for_offset(start, boundaries),
                "start_offset": start,
                "end_offset": end,
                "chunk_index": i,
                "content_hash": chash,
            }
        )
    return out


def chunk_document(document_id: str, text: str, chunk_size: int = 1200, chunk_overlap: int = 150) -> list[dict]:
    """Full legacy path: recursive split + TextUnit assignment."""
    splitter = RecursiveCharacterSplitter(chunk_size=chunk_size, chunk_overlap=chunk_overlap)
    return assign_text_units(document_id, text, splitter.split_text(text))
