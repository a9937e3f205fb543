"""Token counting for chunk sizing.

Reimplements the reference's ``core/token_counter.py`` in its
tiktoken-unavailable fallback mode (token_counter.py:41-80): tiktoken is not
installed in this environment, and the reference degrades deterministically to
character-based approximations — ``count = max(1, len(text)//4)`` and
``tail_text = text[-overlap_tokens*4:]``. We implement exactly that fallback,
so both engines agree byte-for-byte on chunk boundaries when run side by side
here. A real cl100k tokenizer can be injected at the same seam when the
dependency is available.
"""

from __future__ import annotations


def count_tokens(text: str) -> int:
    """token_counter.py:41-49 fallback branch."""
    if not text:
        return 0
    return max(1, len(text) // 4)


def tail_text(text: str, overlap_tokens: int) -> str:
    """token_counter.py:68-80 fallback branch (approximate char overlap)."""
    if overlap_tokens <= 0 or not text:
        return ""
    char_count = max(1, overlap_tokens * 4)
    return text[-char_count:]


def split_by_chars(text: str, max_tokens: int) -> list[str]:
    """html_chunker.py:318-329 (_split_by_tokens) when encode() returns [].

    With no tokenizer the reference slices by ``max_tokens * 4`` characters.
    """
    step = max(1, max_tokens * 4)
    return [text[i : i + step] for i in range(0, len(text), step)]
