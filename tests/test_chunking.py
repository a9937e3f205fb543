"""Chunker semantics: HTML heading chunker + legacy recursive splitter."""

from graphrag_mrkr_2_spark.functions.chunking import (
    RecursiveCharacterSplitter,
    assign_text_units,
    chunk_document,
    content_hash,
)
from graphrag_mrkr_2_spark.functions.html_text import (
    HtmlHeadingChunker,
    extract_plain_text,
)
from graphrag_mrkr_2_spark.functions.tokens import count_tokens
from graphrag_mrkr_2_spark.sources.pages import make_page

HTML = """<html><head><title>T</title></head><body>
<nav>NOISE NAV</nav>
<div class="toc">NOISE TOC</div>
<article>
<h1 id="top">Main Title</h1>
<p>First paragraph text.</p>
<h2>Sub Section</h2>
<p>Second paragraph text.</p>
<ul><li>item one</li><li>item two</li></ul>
<pre>code line</pre>
<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>
<blockquote>a quote</blockquote>
</article>
<footer>NOISE FOOTER</footer>
</body></html>"""


def test_extract_plain_text_strips_noise():
    text = extract_plain_text(HTML)
    assert "NOISE" not in text
    assert "Main Title" in text and "First paragraph text." in text
    # collapse-ws invariant (html_chunker.py:338-339)
    assert "  " not in text


def test_heading_paths_and_block_rendering():
    chunks = HtmlHeadingChunker().chunk_html(HTML)
    text_all = "\n\n".join(c["text"] for c in chunks)
    assert "Main Title > Sub Section" in text_all  # heading stack (:146-174)
    assert "- item one" in text_all  # li rendering (:193-194)
    assert "```\ncode line\n```" in text_all  # pre fencing (:195-196)
    assert "A | B" in text_all and "1 | 2" in text_all  # table rows (:207-215)
    assert "> a quote" in text_all  # blockquote (:201-203)
    assert all("NOISE" not in c["text"] for c in chunks)


def test_oversized_section_splits_with_overlap():
    long_para = " ".join(f"Sentence number {i} is here." for i in range(800))
    html = f"<html><body><article><h1>T Long</h1><p>{long_para}</p></article></body></html>"
    ck = HtmlHeadingChunker()
    chunks = ck.chunk_html(html)
    assert len(chunks) > 1
    # reference bound: a packed chunk may carry the overlap tail on top of
    # max_tokens (html_chunker.py:259-266 closes only when the NEXT unit
    # would overflow), so the true invariant is max + overlap
    assert all(
        count_tokens(c["text"]) <= ck.max_tokens + ck.overlap_tokens for c in chunks
    )


def test_small_trailing_chunk_merged():
    html = "<html><body><article><h1>Tt</h1><p>short one.</p></article></body></html>"
    chunks = HtmlHeadingChunker().chunk_html(html)
    assert len(chunks) == 1


def test_recursive_splitter_bounds_and_overlap():
    text = "\n\n".join(
        " ".join(f"word{i}_{j}" for j in range(40)) for i in range(30)
    )
    splitter = RecursiveCharacterSplitter(chunk_size=300, chunk_overlap=50)
    chunks = splitter.split_text(text)
    assert all(len(c) <= 300 for c in chunks)
    joined = " ".join(chunks)
    assert all(f"word{i}_0" in joined for i in range(30))  # nothing lost


def test_assign_text_units_offsets_and_ids():
    text = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    chunks = ["alpha beta gamma.", "delta epsilon zeta.", "eta theta iota."]
    units = assign_text_units("doc1", text, chunks)
    for u in units:
        assert text[u["start_offset"] : u["end_offset"]] == u["content"]
        h = content_hash(u["content"])
        assert u["chunk_id"] == f"doc1_tu_{u['start_offset']}_{u['end_offset']}_{h[:8]}"
    assert [u["chunk_index"] for u in units] == [0, 1, 2]
    assert all(u["page"] == 1 for u in units)


def test_page_markers():
    text = "## Page 1\nsome content here\n## Page 2\nlater content here"
    units = assign_text_units("d", text, ["some content here", "later content here"])
    assert units[0]["page"] == 1 and units[1]["page"] == 2


def test_chunk_document_deterministic():
    text = "para one words here.\n\npara two words here.\n\n" * 50
    a = chunk_document("d", text)
    b = chunk_document("d", text)
    assert [u["chunk_id"] for u in a] == [u["chunk_id"] for u in b]


def test_generated_page_text_is_frozen_extraction():
    """The pages table's text column IS extract_plain_text(html) — the
    byte-identical-per-url invariant (BASELINE.json input_hint)."""
    for i in (0, 7, 23):
        p = make_page(i)
        assert p["text"] == extract_plain_text(p["html"].decode("utf-8"))
        assert "SKIPPED" not in p["text"]
