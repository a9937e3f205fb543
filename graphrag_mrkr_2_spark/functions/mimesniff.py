"""MIME sniffing for crawled payloads — the router that ties the decode
stack together.

A WARC body arrives as bytes with an often-missing or lying Content-Type;
this implements the practical core of the WHATWG MIME Sniffing Standard's
"identifying a resource" algorithm: magic-byte patterns first (servers
mislabel constantly — the standard exists because ~1% of the web is
mislabeled), the declared type only as a tie-break when the bytes are
inconclusive. The result routes each payload to the right decoder family
in this repo: html/xml/text → charsets + html_text, pdf/docx/xlsx/pptx →
docformats, image/audio/video → multimodal (probe_media), subtitles →
functions/subtitles, archives → the loaders' decompression layer. The
reference (danve93/graphrag-mrkr-2) routes by file EXTENSION only
(ingestion/loaders/document_loader.py) — extensions don't exist on crawl
payloads.

Returns (kind, subtype): kind ∈ {document, image, audio, video, text,
archive, subtitle, data} with subtype the concrete format ("html",
"pdf", "png", "mp3", "zip", "json", ...), or (None, None) for bytes
nothing claims (quarantine upstream).
"""

from __future__ import annotations

import re
import zipfile

# ASCII-case-insensitive HTML tag prefixes from the WHATWG table; each is
# checked after stripping leading whitespace and must be followed by a
# tag-terminating byte (space or '>')
_HTML_TAGS = (b"<!doctype html", b"<html", b"<head", b"<script", b"<iframe",
              b"<h1", b"<div", b"<font", b"<table", b"<a", b"<style",
              b"<title", b"<b", b"<body", b"<br", b"<p", b"<!--")

_WS = b"\t\n\x0c\r "


def _office_subtype(data: bytes) -> str:
    """OOXML containers are all zip — route by the content-types manifest
    or the first part directory, like docformats' own dispatch."""
    try:
        import io

        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if any(n.startswith("word/") for n in names):
                return "docx"
            if any(n.startswith("xl/") for n in names):
                return "xlsx"
            if any(n.startswith("ppt/") for n in names):
                return "pptx"
    except Exception:
        pass
    return "zip"


def _looks_json(head: bytes) -> bool:
    head = head.lstrip(_WS)
    if not head or head[:1] not in (b"{", b"["):
        return False
    # cheap structural check on the prefix: a quote or closing bracket
    # must follow; avoids classifying '[citation needed]' prose as JSON
    rest = head[1:].lstrip(_WS)
    return rest[:1] in (b'"', b"}", b"]", b"{", b"[") or \
        bool(re.match(rb"[-0-9tfn]", rest[:1] or b""))


def sniff_web_payload(data: bytes, content_type: str | None = None):
    """(kind, subtype) per the module docstring; magic bytes beat the
    declared type, the declared type breaks text/binary ties."""
    if not data:
        return None, None

    # ---- unambiguous binary magics (WHATWG pattern table) ----
    if data.startswith(b"%PDF-"):
        return "document", "pdf"
    if data.startswith(b"%!PS-Adobe-"):
        return "document", "ps"
    if data.startswith(b"\x1f\x8b"):
        return "archive", "gzip"
    if data.startswith(b"\x28\xb5\x2f\xfd"):
        return "archive", "zstd"
    if data.startswith(b"PK\x03\x04"):
        return "document" if (st := _office_subtype(data)) != "zip" \
            else "archive", st
    if data.startswith(b"Rar!\x1a\x07"):
        return "archive", "rar"
    if data.startswith(b"\x37\x7a\xbc\xaf\x27\x1c"):
        return "archive", "7z"
    if data.startswith(b"BZh"):
        return "archive", "bzip2"

    # ---- media: the repo's own container sniffers ----
    from graphrag_mrkr_2_spark.operators.multimodal import probe_media

    probe = probe_media(data)
    if probe.get("kind"):
        # probe_media reports raw container fourccs (mp4a, fLaC, Opus);
        # the routing subtype uses canonical codec names
        fourcc_names = {"mp4a": "aac", "fLaC": "flac", "Opus": "opus",
                        "samr": "amr", "sawb": "amr-wb"}
        codec = probe.get("codec")
        return probe["kind"], fourcc_names.get(codec, codec)

    from graphrag_mrkr_2_spark.functions.subtitles import sniff_subtitle

    sub = sniff_subtitle(data)
    if sub:
        return "subtitle", sub

    # ---- text family: decode a bounded prefix with the charset sniffer
    # (a UTF-16 HTML page's tags are invisible in raw bytes) ----
    from graphrag_mrkr_2_spark.functions.charsets import decode_html_bytes

    head_text, _ = decode_html_bytes(data[:2048], content_type)
    head = head_text.encode("utf-8", "replace")[:1024]
    stripped = head.lstrip(_WS)
    low = stripped[:16].lower()
    for tag in _HTML_TAGS:
        if low.startswith(tag) and \
                stripped[len(tag):len(tag) + 1] in (b" ", b">", b"\t", b"",
                                                    b"\n", b"\r", b"/"):
            return "text", "html"
    if stripped.startswith(b"<?xml") or stripped.startswith(b"<rss") \
            or stripped.startswith(b"<feed"):
        return "text", "xml"
    if _looks_json(head):
        return "text", "json"

    # ---- declared type as the tie-break for remaining text ----
    declared = (content_type or "").split(";")[0].strip().lower()
    if declared in ("text/html", "application/xhtml+xml"):
        return "text", "html"
    if declared.endswith(("/xml", "+xml")):
        return "text", "xml"
    if declared in ("application/json",) or declared.endswith("+json"):
        return "text", "json"
    if declared.startswith("text/") or declared in ("", "text/plain"):
        # binary-data scan per WHATWG: any byte the standard calls
        # "binary data" in the prefix demotes to unknown
        if not re.search(rb"[\x00-\x08\x0b\x0e-\x1a\x1c-\x1f]", head):
            return "text", "plain"
    return None, None
