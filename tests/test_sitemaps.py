"""Sitemap parsing (functions/sitemaps.py): protocol fixtures, the
namespace/gzip/text variants served in the wild, and the hostile-input
contract (entity bombs rejected at the parser, size caps, ValueError
only)."""

from __future__ import annotations

import gzip

import pytest

from graphrag_mrkr_2_spark.functions.sitemaps import parse_sitemap

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://example.com/</loc>
    <lastmod>2026-01-15</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.com/about</loc></url>
</urlset>
"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://example.com/s1.xml.gz</loc>
  <lastmod>2026-02-01T10:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://example.com/s2.xml</loc></sitemap>
</sitemapindex>
"""


class TestParse:
    def test_urlset(self):
        kind, entries = parse_sitemap(URLSET)
        assert kind == "urlset"
        assert entries[0] == {"loc": "https://example.com/",
                              "lastmod": "2026-01-15",
                              "changefreq": "daily", "priority": "0.8"}
        assert entries[1]["loc"] == "https://example.com/about"
        assert entries[1]["lastmod"] is None

    def test_sitemapindex(self):
        kind, entries = parse_sitemap(INDEX)
        assert kind == "sitemapindex"
        assert [e["loc"] for e in entries] == [
            "https://example.com/s1.xml.gz", "https://example.com/s2.xml"]
        assert entries[0]["lastmod"] == "2026-02-01T10:00:00Z"

    def test_no_namespace_variant(self):
        raw = b"<urlset><url><loc>https://x/</loc></url></urlset>"
        assert parse_sitemap(raw)[1][0]["loc"] == "https://x/"

    def test_gzipped(self):
        kind, entries = parse_sitemap(gzip.compress(URLSET))
        assert kind == "urlset" and len(entries) == 2

    def test_text_sitemap(self):
        raw = b"https://a/1\n\nhttps://a/2\r\n"
        kind, entries = parse_sitemap(raw)
        assert kind == "text"
        assert [e["loc"] for e in entries] == ["https://a/1", "https://a/2"]

    def test_bom_variants(self):
        # BOM'd XML, BOM+whitespace XML, and BOM'd text sitemaps (common
        # from Windows tooling) must all route correctly (review r7)
        assert parse_sitemap(b"\xef\xbb\xbf" + URLSET)[0] == "urlset"
        raw = (b"\xef\xbb\xbf\n<urlset><url><loc>https://x/</loc></url>"
               b"</urlset>")
        assert parse_sitemap(raw)[0] == "urlset"
        kind, entries = parse_sitemap(b"\xef\xbb\xbfhttps://a/1\n")
        assert kind == "text" and entries[0]["loc"] == "https://a/1"

    def test_entry_without_loc_dropped(self):
        raw = b"<urlset><url><lastmod>2026-01-01</lastmod></url>" \
              b"<url><loc>https://x/</loc></url></urlset>"
        assert len(parse_sitemap(raw)[1]) == 1


class TestHostile:
    def test_entity_bomb_rejected(self):
        bomb = (b"<?xml version='1.0'?><!DOCTYPE urlset ["
                b"<!ENTITY a 'aaaaaaaaaa'><!ENTITY b '&a;&a;&a;&a;&a;'>"
                b"<!ENTITY c '&b;&b;&b;&b;&b;'>]>"
                b"<urlset><url><loc>https://x/&c;</loc></url></urlset>")
        with pytest.raises(ValueError, match="entity"):
            parse_sitemap(bomb)

    def test_bad_gzip(self):
        with pytest.raises(ValueError):
            parse_sitemap(b"\x1f\x8b\x00broken")
        # valid gzip header, corrupt deflate body: zlib.error must
        # surface as ValueError (quarantine contract — review r7)
        good = gzip.compress(b"https://a/1\n")
        broken = good[:12] + b"\xff\xfe\xfd\xfc" + good[16:]
        with pytest.raises(ValueError):
            parse_sitemap(broken)

    def test_gzip_bomb_capped_without_expansion(self):
        # ~60 MB of zeros compresses to ~60 KB; the cap must fire from
        # the streaming read, not after full materialization
        bomb = gzip.compress(b"\x00" * (60 << 20))
        assert len(bomb) < 200_000
        with pytest.raises(ValueError, match="50 MB"):
            parse_sitemap(bomb)

    def test_malformed_xml(self):
        with pytest.raises(ValueError):
            parse_sitemap(b"<urlset><url></urlset>")

    def test_wrong_root(self):
        with pytest.raises(ValueError, match="root"):
            parse_sitemap(b"<rss><channel/></rss>")

    def test_non_url_text_line(self):
        with pytest.raises(ValueError):
            parse_sitemap(b"https://ok/\njavascript:alert(1)\n")

    def test_url_cap(self):
        raw = b"<urlset>" + b"".join(
            b"<url><loc>https://x/%d</loc></url>" % i
            for i in range(50_100)) + b"</urlset>"
        with pytest.raises(ValueError, match="50k"):
            parse_sitemap(raw)

    def test_fuzz_valueerror_only(self):
        import random

        rng = random.Random(5)
        for _ in range(200):
            blob = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(0, 120)))
            try:
                parse_sitemap(b"<" + blob)
            except ValueError:
                pass
            try:
                parse_sitemap(blob)
            except ValueError:
                pass
