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
