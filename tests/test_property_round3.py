"""Hypothesis property tests for the round-3 pure-Python kernels:
BPE encode/decode, binary-document round-trips, Leiden invariants, and the
expansion-response parser. All driver-side pure functions — no Spark."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# XML 1.0-legal text (control chars other than \t\n\r are unrepresentable
# in the OOXML documents these kernels target)
xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        blacklist_characters="".join(
            chr(c) for c in range(0x20) if chr(c) not in "\t\n\r"
        ),
    ),
    max_size=80,
)

ascii_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=60
)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _full_byte_ranks() -> dict[bytes, int]:
    """Complete byte-level table (like real BPE vocabularies): every single
    byte has a rank, plus a few merges."""
    ranks = {bytes([b]): b for b in range(256)}
    nxt = 256
    for merge in (b"th", b"he", b"the", b"in", b"er", b" t", b" th"):
        ranks[merge] = nxt
        nxt += 1
    return ranks


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_bpe_roundtrip_any_unicode(t):
    from graphrag_mrkr_2_spark.functions.bpe import BytePairEncoder

    enc = BytePairEncoder(_full_byte_ranks())
    toks = enc.encode(t)
    assert enc.decode(toks) == t  # byte-complete table -> lossless
    assert enc.count(t) == len(toks)
    assert toks == enc.encode(t)  # deterministic


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_bpe_partial_table_never_raises(t):
    from graphrag_mrkr_2_spark.functions.bpe import BytePairEncoder

    enc = BytePairEncoder({b"a": 0, b"b": 1, b"ab": 2})
    toks = enc.encode(t)  # must not raise on unknown bytes
    assert all(isinstance(x, int) for x in toks)
    assert len(enc.decode(toks)) >= 0


# ---------------------------------------------------------------------------
# Binary document round-trips
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(xml_text, min_size=0, max_size=8))
def test_docx_roundtrip_any_xml_legal_paragraphs(paras):
    from graphrag_mrkr_2_spark.functions.docformats import docx_text, encode_docx

    decoded = docx_text(encode_docx(paras))
    kept = [p for p in paras if p.strip()]
    if not kept:
        assert decoded is None  # docx_loader.py:47-49 empty contract
    else:
        # \r\n and \r normalize to \n through the XML parser (XML 1.0
        # §2.11) — PER TEXT NODE, so normalize each paragraph before
        # joining (a trailing \r must not merge with the join separator)
        expect = "\n\n".join(
            p.replace("\r\n", "\n").replace("\r", "\n") for p in kept
        )
        assert decoded == expect


@settings(max_examples=60, deadline=None)
@given(st.lists(ascii_line, min_size=0, max_size=6))
def test_pdf_roundtrip_any_ascii_lines(lines):
    from graphrag_mrkr_2_spark.functions.docformats import encode_pdf, pdf_pages_text

    pages = pdf_pages_text(encode_pdf([lines]))
    expect = "\n".join(x.strip() for x in lines if x.strip())
    assert pages == [expect]


# ---------------------------------------------------------------------------
# Leiden invariants
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
        st.floats(min_value=0.1, max_value=5.0, allow_nan=False),
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=80, deadline=None)
@given(edge_lists, st.integers(min_value=0, max_value=3))
def test_leiden_total_assignment_and_connectivity(edges, seed):
    from graphrag_mrkr_2_spark.functions.leiden import leiden_communities

    mem = leiden_communities(edges, seed=seed)
    nodes = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    assert set(mem) == nodes  # every node assigned, none invented
    assert mem == leiden_communities(edges, seed=seed)  # deterministic
    # connectivity guarantee on non-self-loop structure
    adj: dict = {}
    for u, v, _ in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    comms: dict = {}
    for n, c in mem.items():
        comms.setdefault(c, set()).add(n)
    for members in comms.values():
        start = next(iter(members))
        seen, frontier = {start}, [start]
        while frontier:
            x = frontier.pop()
            for y in adj.get(x, ()):
                if y in members and y not in seen:
                    seen.add(y)
                    frontier.append(y)
        assert seen == members


# ---------------------------------------------------------------------------
# Expansion-response parser
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_expansion_parse_never_raises_and_caps(raw):
    from graphrag_mrkr_2_spark.operators.query import _parse_expansion

    out = _parse_expansion(raw)
    assert isinstance(out, list) and len(out) <= 5
    assert all(isinstance(x, str) for x in out)


# ---------------------------------------------------------------------------
# WARC parser round-trip
# ---------------------------------------------------------------------------


def _build_warc(pages: list[tuple[str, bytes]]) -> bytes:
    """ISO-28500 response records (the shape parse_warc_bytes consumes)."""
    out = bytearray()
    for url, body in pages:
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        out += hdr + payload + b"\r\n\r\n"
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"https?://[a-z]{1,8}\.example/[a-z0-9]{0,12}", fullmatch=True),
            st.binary(max_size=200),
        ),
        min_size=0,
        max_size=5,
    )
)
def test_warc_roundtrip_any_binary_bodies(pages):
    from graphrag_mrkr_2_spark.sources.loaders import parse_warc_bytes

    parsed = parse_warc_bytes(_build_warc(pages))
    assert [(p["url"], p["html"]) for p in parsed] == pages


# ---------------------------------------------------------------------------
# decoder quarantine contract: arbitrary bytes never raise
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.binary(max_size=400),
    st.sampled_from(["pdf", "docx", "xlsx", "pptx", "x.unknown"]),
)
def test_decode_document_never_raises_on_garbage(data, fmt):
    from graphrag_mrkr_2_spark.functions.docformats import decode_document

    out = decode_document(data, fmt)
    assert out is None or isinstance(out, str)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_text_survives_zip_and_pdf_prefixes(data):
    """Garbage wearing a valid magic prefix is the adversarial case —
    the parsers must quarantine, not crash."""
    from graphrag_mrkr_2_spark.functions.docformats import decode_document

    for payload, fmt in ((b"%PDF-1.4\n" + data, "pdf"), (b"PK\x03\x04" + data, "docx")):
        out = decode_document(payload, fmt)  # must not raise
        assert out is None or isinstance(out, str)
