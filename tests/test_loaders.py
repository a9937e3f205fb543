"""S1 loaders: JSONL / CSV / WARC → pages schema → KG pipeline composes."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.sources.loaders import (
    PAGES_SCHEMA,
    parse_warc_bytes,
    read_csv_pages,
    read_jsonl_pages,
    read_warc_pages,
)


def _warc_record(url: str, ts: str, html: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Length: {len(http)}\r\n"
        f"\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


def _warcinfo_record() -> bytes:
    payload = b"software: test\r\n"
    return (
        f"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


HTML1 = b"<html><body><h1>Admin Panel</h1><p>The Admin Panel depends on the User Database.</p></body></html>"
HTML2 = b"<html><body><p>Mailstore content here.</p></body></html>"


def test_parse_warc_bytes_responses_only():
    blob = _warcinfo_record() + _warc_record(
        "https://a.example/x", "2024-01-01T00:00:00Z", HTML1
    ) + _warc_record("https://b.example/y", "2024-01-02T00:00:00Z", HTML2)
    pages = parse_warc_bytes(blob)
    assert [p["url"] for p in pages] == ["https://a.example/x", "https://b.example/y"]
    assert pages[0]["html"] == HTML1  # HTTP headers stripped
    assert pages[0]["warc_ts"] == "2024-01-01T00:00:00Z"
    # gzipped variant parses identically
    assert parse_warc_bytes(gzip.compress(blob)) == pages


@pytest.mark.spark
def test_warc_loader_to_kg_pipeline(spark, tmp_path):
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "part1.warc").write_bytes(
        _warc_record("https://a.example/x", "2024-01-01T00:00:00Z", HTML1)
    )
    (warc_dir / "part2.warc.gz").write_bytes(
        gzip.compress(_warc_record("https://b.example/y", "2024-01-02T00:00:00Z", HTML2))
    )
    pages = read_warc_pages(spark, str(warc_dir))
    assert pages.schema == PAGES_SCHEMA
    rows = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    assert rows == {"https://a.example/x": HTML1, "https://b.example/y": HTML2}

    # the loader output composes straight into the KG pipeline
    from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline

    triples = run_kg_pipeline(pages, num_partitions=2).triples.collect()
    assert {(t["subj"], t["obj"]) for t in triples} == {("ADMIN PANEL", "USER DATABASE")}


@pytest.mark.spark
def test_jsonl_loader_quarantines_bad_lines(spark, tmp_path):
    p = tmp_path / "pages.jsonl"
    lines = [
        json.dumps({"url": "https://a/1", "text": "alpha text", "lang": "en"}),
        "{this is not json",
        json.dumps({"no_url": True}),
        json.dumps({"url": "https://a/2", "text": "beta text"}),
    ]
    p.write_text("\n".join(lines))
    got = read_jsonl_pages(spark, str(p))
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in PAGES_SCHEMA.fields
    ]
    assert {r["url"] for r in got.collect()} == {"https://a/1", "https://a/2"}


@pytest.mark.spark
def test_csv_loader(spark, tmp_path):
    p = tmp_path / "pages.csv"
    p.write_text(
        "url,warc_ts,html,text,lang\n"
        "https://c/1,2024-01-01T00:00:00Z,<p>hi</p>,hi there,en\n"
        ",,,missing url row,\n"
    )
    got = read_csv_pages(spark, str(p))
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in PAGES_SCHEMA.fields
    ]
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["url"] == "https://c/1"
    assert bytes(rows[0]["html"]) == b"<p>hi</p>"


# ---------------------------------------------------------------------------
# r8 hardening: hostile record headers + file-level gzip quarantine
# (VERDICT r7 'What's wrong' #2) and the transport-charset binary gate
# (ADVICE r7 #1)
# ---------------------------------------------------------------------------

def _hostile_record(url: str, body: bytes = b"HTTP/1.1 200 OK\r\n\r\nok",
                 length: str | None = None) -> bytes:
    n = length if length is not None else str(len(body))
    return (f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\nContent-Length: {n}\r\n\r\n"
            ).encode() + body + b"\r\n\r\n"


def test_nonnumeric_content_length_quarantines_record_only():
    data = (_hostile_record("https://bad.example/", length="banana")
            + _hostile_record("https://good.example/")
            + _hostile_record("https://neg.example/", length="-5")
            + _hostile_record("https://good2.example/"))
    urls = [p["url"] for p in parse_warc_bytes(data)]
    assert "https://good.example/" in urls and "https://good2.example/" in urls
    assert "https://bad.example/" not in urls and "https://neg.example/" not in urls


def test_corrupt_whole_file_gzip_quarantines_file():
    assert parse_warc_bytes(b"\x1f\x8b" + b"not really gzip") == []


def test_truncated_final_record_keeps_siblings():
    data = _hostile_record("https://ok.example/") + (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://trunc.example/\r\n"
        b"Content-Length: 999999\r\n\r\nHTTP/1.1 200 OK\r\n\r\nshort")
    urls = [p["url"] for p in parse_warc_bytes(data)]
    assert "https://ok.example/" in urls


def test_transport_charset_skips_binary_payloads():
    from graphrag_mrkr_2_spark.sources.loaders import _apply_transport_charset

    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    # PNG served as text/html with a legacy charset: verbatim passthrough
    assert _apply_transport_charset(png, "text/html; charset=iso-8859-1") == png
    # non-text declared type: charset param is meaningless, passthrough
    assert _apply_transport_charset(png, "image/png; charset=utf-8") == png
    mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16
    assert _apply_transport_charset(mp4, "text/plain; charset=utf-8") == mp4
    # control bytes in a declared single-byte-charset body: not text
    blob = b"ab\x00\x01cd" * 20
    assert _apply_transport_charset(blob, "text/html; charset=windows-1252") == blob
    # real legacy text still transcodes to BOM'd UTF-8
    legacy = "caffè".encode("cp1252")
    out = _apply_transport_charset(legacy, "text/html; charset=windows-1252")
    assert out.startswith(b"\xef\xbb\xbf") and out[3:].decode("utf-8") == "caffè"
    # utf-16 declared by header keeps transcoding despite its NUL bytes
    u16 = "hello".encode("utf-16-le")
    out16 = _apply_transport_charset(u16, "text/html; charset=utf-16le")
    assert out16.startswith(b"\xef\xbb\xbf") and out16[3:].decode("utf-8") == "hello"


def test_transport_charset_short_ascii_magics_do_not_block_text():
    """Review r8: text beginning with the WORDS 'BMW'/'ID3'/'RIFF' must
    still transcode; real BMP/ID3v2/RIFF structures must not."""
    from graphrag_mrkr_2_spark.sources.loaders import (
        _apply_transport_charset,
        _binary_magic,
    )

    for s in ("BMW für alle", "ID3 tags sind überall", "RIFF ist ein Format"):
        out = _apply_transport_charset(
            s.encode("cp1252"), "text/html; charset=windows-1252")
        assert out.startswith(b"\xef\xbb\xbf") and out[3:].decode("utf-8") == s
    bmp = b"BM" + (100).to_bytes(4, "little") + b"\x00" * 4 + b"\x28" + b"\x00" * 40
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x21" + b"\x00" * 16
    riff = b"RIFF" + (100).to_bytes(4, "little") + b"WAVEfmt " + b"\x00" * 16
    for payload in (bmp, id3, riff):
        assert _binary_magic(payload)
        assert _apply_transport_charset(
            payload, "text/html; charset=windows-1252") == payload
