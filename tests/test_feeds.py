"""RSS/Atom feed parsing (functions/feeds.py): format fixtures from the
two specs plus the hostile-input quarantine contract."""

from __future__ import annotations

import pytest

from graphrag_mrkr_2_spark.functions.feeds import parse_feed

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site</title>
  <item>
    <title>First post</title>
    <link>https://x.example/1</link>
    <pubDate>Mon, 05 Jan 2026 10:00:00 GMT</pubDate>
    <description>Summary one</description>
  </item>
  <item><title>Second</title><link>https://x.example/2</link></item>
</channel></rss>
"""

ATOM = b"""<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Site</title>
  <entry>
    <title>Hello</title>
    <link rel="self" href="https://x.example/e1.atom"/>
    <link rel="alternate" href="https://x.example/e1"/>
    <published>2026-01-05T10:00:00Z</published>
    <updated>2026-01-06T10:00:00Z</updated>
    <summary>Sum</summary>
  </entry>
  <entry>
    <title>Updated only</title>
    <link href="https://x.example/e2"/>
    <updated>2026-02-01T00:00:00Z</updated>
  </entry>
</feed>
"""


class TestParse:
    def test_rss(self):
        kind, entries = parse_feed(RSS)
        assert kind == "rss"
        assert entries[0] == {
            "title": "First post", "link": "https://x.example/1",
            "published": "Mon, 05 Jan 2026 10:00:00 GMT",
            "summary": "Summary one"}
        assert entries[1]["link"] == "https://x.example/2"
        assert entries[1]["published"] is None

    def test_atom(self):
        kind, entries = parse_feed(ATOM)
        assert kind == "atom"
        # rel=alternate beats rel=self; published beats updated
        assert entries[0]["link"] == "https://x.example/e1"
        assert entries[0]["published"] == "2026-01-05T10:00:00Z"
        assert entries[0]["summary"] == "Sum"
        # rel-less link accepted; updated fills missing published
        assert entries[1]["link"] == "https://x.example/e2"
        assert entries[1]["published"] == "2026-02-01T00:00:00Z"

    def test_channel_title_not_leaked_into_items(self):
        _, entries = parse_feed(RSS)
        assert all(e["title"] != "Site" for e in entries)

    def test_bom(self):
        assert parse_feed(b"\xef\xbb\xbf" + RSS)[0] == "rss"


class TestHostile:
    def test_entity_bomb_rejected(self):
        bomb = (b"<?xml version='1.0'?><!DOCTYPE rss ["
                b"<!ENTITY a 'aaaa'>]>"
                b"<rss><channel><item><title>&a;</title></item>"
                b"</channel></rss>")
        with pytest.raises(ValueError, match="entity"):
            parse_feed(bomb)

    def test_wrong_root(self):
        with pytest.raises(ValueError, match="root"):
            parse_feed(b"<urlset/>")

    def test_malformed(self):
        with pytest.raises(ValueError):
            parse_feed(b"<rss><channel><item></rss>")

    def test_fuzz_valueerror_only(self):
        import random

        rng = random.Random(9)
        for _ in range(200):
            blob = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(0, 150)))
            try:
                parse_feed(blob)
            except ValueError:
                pass


@pytest.mark.spark
class TestDiscoveryOperator:
    def test_expand_discovery_payloads(self, spark):
        import gzip

        from graphrag_mrkr_2_spark.operators.urlops import (
            expand_discovery_payloads,
        )

        rows = [
            ("https://a/sm.xml",
             b"<urlset><url><loc>https://a/1</loc>"
             b"<lastmod>2026-01-01</lastmod></url></urlset>"),
            ("https://a/sm.txt", b"https://a/2\n"),
            ("https://a/sm.gz", gzip.compress(
                b"<urlset><url><loc>https://a/3</loc></url></urlset>")),
            ("https://a/feed", RSS),
            ("https://a/atom", ATOM),
            ("https://a/junk", b"\x00not a discovery doc"),  # quarantined
        ]
        df = spark.createDataFrame(rows, "url string, payload binary")
        got = expand_discovery_payloads(df).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r.id, []).append((r.doc_kind, r.loc, r.lastmod))
        assert by_id["https://a/sm.xml"] == [
            ("urlset", "https://a/1", "2026-01-01")]
        assert by_id["https://a/sm.txt"] == [("text", "https://a/2", None)]
        assert by_id["https://a/sm.gz"] == [("urlset", "https://a/3", None)]
        assert [x[1] for x in by_id["https://a/feed"]] == [
            "https://x.example/1", "https://x.example/2"]
        assert by_id["https://a/atom"][0] == (
            "atom", "https://x.example/e1", "2026-01-05T10:00:00Z")
        assert "https://a/junk" not in by_id


def test_atom_first_alternate_link_wins():
    """ADVICE r7: a second rel=alternate must not overwrite the first."""
    from graphrag_mrkr_2_spark.functions.feeds import parse_feed

    feed = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>t</title>
  <entry>
    <title>e1</title>
    <link rel="self" href="https://x.example/self"/>
    <link rel="alternate" href="https://x.example/first"/>
    <link rel="alternate" href="https://x.example/second"/>
  </entry>
  <entry>
    <title>e2</title>
    <link rel="self" href="https://x.example/self2"/>
  </entry>
</feed>"""
    kind, entries = parse_feed(feed)
    assert kind == "atom"
    assert entries[0]["link"] == "https://x.example/first"
    # self-only entry still falls back to the non-alternate placeholder
    assert entries[1]["link"] == "https://x.example/self2"


def test_gzipped_feed_expands_through_discovery(spark):
    """ADVICE r7: .xml.gz feeds must survive expand_discovery_payloads."""
    import gzip

    from graphrag_mrkr_2_spark.operators.urlops import expand_discovery_payloads

    feed = (b'<?xml version="1.0"?><rss version="2.0"><channel><title>c</title>'
            b"<item><title>i1</title><link>https://g.example/a</link></item>"
            b"</channel></rss>")
    df = spark.createDataFrame(
        [("https://g.example/feed.xml.gz", bytearray(gzip.compress(feed)))],
        "url string, payload binary",
    )
    rows = expand_discovery_payloads(df).collect()
    assert len(rows) == 1 and rows[0]["loc"] == "https://g.example/a"
    assert rows[0]["doc_kind"] == "rss"


def test_corrupt_gzip_discovery_payload_quarantines_row(spark):
    """Review r8: a gzip header with a corrupt deflate body raises
    zlib.error from GzipFile — the expansion operator must quarantine the
    row, not fail the task."""
    from graphrag_mrkr_2_spark.operators.urlops import expand_discovery_payloads

    import gzip

    good = (b'<?xml version="1.0"?><rss version="2.0"><channel><title>c</title>'
            b"<item><title>i</title><link>https://ok.example/a</link></item>"
            b"</channel></rss>")
    df = spark.createDataFrame(
        [("https://bad.example/f.xml.gz", bytearray(b"\x1f\x8b\x08\x00" + b"corrupt!")),
         ("https://ok.example/feed.xml.gz", bytearray(gzip.compress(good)))],
        "url string, payload binary",
    )
    rows = expand_discovery_payloads(df).collect()
    assert [r["loc"] for r in rows] == ["https://ok.example/a"]
