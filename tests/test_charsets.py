"""WHATWG-style charset sniffing (functions/charsets.py).

Python's codec registry is the decode oracle; the cases pin the
browser-behavior deltas (latin-1 label → windows-1252, gb2312 → GBK,
generic utf-16 → LE, the cp1252 C1-control bytes) that a flat
utf-8/replace pipeline mojibakes."""

from __future__ import annotations

import pytest

from graphrag_mrkr_2_spark.functions.charsets import (
    decode_html_bytes,
    resolve_encoding,
    sniff_html_encoding,
    to_text,
)


class TestResolve:
    @pytest.mark.parametrize("label,expected", [
        ("UTF-8", "utf-8"),
        ("utf8", "utf-8"),
        ("ISO-8859-1", "cp1252"),        # the web's latin-1 IS cp1252
        ("latin1", "cp1252"),
        ("ascii", "cp1252"),
        ("US-ASCII", "cp1252"),
        ("gb2312", "gbk"),
        ("GB_2312-80", "gbk"),
        ("euc-kr", "cp949"),
        ("shift_jis", "shift_jis"),
        ("Shift-JIS", "shift_jis"),
        ("windows-1251", "cp1251"),
        ("tis-620", "cp874"),
        ("utf-16", "utf-16-le"),          # generic label decodes as LE
        ("macintosh", "mac-roman"),
        ("big5", "big5"),
    ])
    def test_labels(self, label, expected):
        assert resolve_encoding(label) == expected

    def test_unknown_label(self):
        assert resolve_encoding("no-such-charset-xyz") is None
        assert resolve_encoding("") is None
        assert resolve_encoding(None) is None


class TestSniff:
    def test_boms_win_over_everything(self):
        assert sniff_html_encoding(b"\xef\xbb\xbfhello") == ("utf-8", 3)
        assert sniff_html_encoding(b"\xff\xfeh\x00") == ("utf-16-le", 2)
        assert sniff_html_encoding(b"\xfe\xff\x00h") == ("utf-16-be", 2)
        assert sniff_html_encoding(
            b"\xef\xbb\xbf<meta charset='koi8-r'>") == ("utf-8", 3)

    def test_content_type_beats_meta(self):
        raw = b"<meta charset='shift_jis'>"
        assert sniff_html_encoding(
            raw, "text/html; charset=windows-1251") == ("cp1251", 0)

    @pytest.mark.parametrize("html,enc", [
        (b"<meta charset=utf-8>", "utf-8"),
        (b'<META CHARSET="Windows-1251">', "cp1251"),
        (b"<meta charset = 'gb2312' >", "gbk"),
        (b'<meta http-equiv="Content-Type" '
         b'content="text/html; charset=iso-8859-1">', "cp1252"),
    ])
    def test_meta_forms(self, html, enc):
        page = b"<html><head>" + html + b"</head><body>x</body></html>"
        assert sniff_html_encoding(page)[0] == enc

    def test_xml_declaration_at_document_start(self):
        page = b"<?xml version='1.0' encoding='EUC-JP'?><root>x</root>"
        assert sniff_html_encoding(page)[0] == "euc_jp"
        # an xml decl buried mid-document is not a declaration
        assert sniff_html_encoding(
            b"<html><body><?xml encoding='koi8-r'?></body>") == (None, 0)

    def test_meta_outside_prescan_window_ignored(self):
        page = b"<html>" + b" " * 2000 + b"<meta charset='koi8-r'>"
        assert sniff_html_encoding(page) == (None, 0)

    def test_meta_utf16_coerced_to_utf8(self):
        # an ASCII-readable meta claiming UTF-16 is self-contradictory
        assert sniff_html_encoding(b"<meta charset='utf-16'>x")[0] == "utf-8"

    def test_forbidden_encodings_rejected(self):
        """Review r7: labels outside the WHATWG encoding set must be
        unknown — honoring utf-7 reopens '+ADw-script+AD4-' smuggling."""
        for label in ("utf-7", "hz-gb-2312", "utf-32", "utf-32-le",
                      "cp500", "ebcdic-cp-be"):
            assert resolve_encoding(label) is None, label
        raw = b"<meta charset='utf-7'>+ADw-script+AD4-alert(1)"
        text, enc = decode_html_bytes(raw)
        assert "<script>" not in text

    def test_charset_in_comment_ignored(self):
        """Review r7: the prescan must not read charset= out of comments
        or unrelated content= attributes."""
        page = (b"<!-- <meta charset=big5> -->"
                b"<meta charset='utf-8'><body>x</body>")
        assert sniff_html_encoding(page)[0] == "utf-8"
        page2 = (b'<meta name=description content="about charset=koi8-r">'
                 b"<p>plain</p>")
        assert sniff_html_encoding(page2) == (None, 0)

    def test_http_equiv_content_form(self):
        page = (b'<meta http-equiv="Content-Type" '
                b'content="text/html; charset=windows-1251"><p>x</p>')
        assert sniff_html_encoding(page)[0] == "cp1251"

    def test_x_user_defined(self):
        # WHATWG: ASCII passthrough, 0x80+b -> U+F780+b
        text, enc = decode_html_bytes(
            b"<meta charset='x-user-defined'>ab\x80\xff")
        assert enc == "x-user-defined"
        assert text.endswith("ab")

    def test_c1_holes_other_windows_codepages(self):
        # cp1251 leaves 0x98 undefined; WHATWG maps it to U+0098
        text, enc = decode_html_bytes(b"<meta charset='windows-1251'>a\x98b")
        assert enc == "cp1251" and "a\x98b" in text


class TestDecode:
    def test_declared_windows_1252(self):
        raw = b"<meta charset='iso-8859-1'>Smart \x93quotes\x94 caf\xe9"
        text, enc = decode_html_bytes(raw)
        assert enc == "cp1252"
        assert "“quotes” café" in text

    def test_c1_bytes_follow_whatwg_not_python(self):
        # Python cp1252 leaves 0x81 undefined; WHATWG maps it to U+0081
        text, enc = decode_html_bytes(b"<meta charset='windows-1252'>a\x81b")
        assert enc == "cp1252"
        assert "a\x81b" in text and "�" not in text

    def test_shift_jis_meta(self):
        body = "日本語のテキスト"
        raw = ("<meta charset='shift_jis'><p>" + body + "</p>").encode(
            "shift_jis")
        text, enc = decode_html_bytes(raw)
        assert enc == "shift_jis" and body in text

    def test_utf16le_bom(self):
        raw = "﻿<html>Ünïcødé</html>".encode("utf-16-le")
        text, enc = decode_html_bytes(raw)
        assert enc == "utf-16-le" and "Ünïcødé" in text

    def test_undeclared_valid_utf8_stays_utf8(self):
        text, enc = decode_html_bytes("café 中文".encode())
        assert (enc, text) == ("utf-8", "café 中文")

    def test_undeclared_invalid_utf8_falls_back_1252(self):
        text, enc = decode_html_bytes(b"caf\xe9 \x93ok\x94")
        assert enc == "cp1252"
        assert text == "café “ok”"

    def test_bad_bytes_in_declared_encoding_replace_not_drop(self):
        raw = b"<meta charset='shift_jis'>ok \x85\x40 end"
        text, enc = decode_html_bytes(raw)
        assert enc == "shift_jis" and text.startswith("<meta")

    def test_empty(self):
        assert decode_html_bytes(b"") == ("", "utf-8")

    def test_to_text_passthrough(self):
        assert to_text("already str") == "already str"
        assert to_text(None) == ""
        assert to_text("café".encode()) == "café"
        assert to_text(b"\x93x\x94") == "“x”"


@pytest.mark.spark
class TestPipeline:
    def test_extract_text_handles_legacy_pages(self, spark):
        from graphrag_mrkr_2_spark.operators.extract import extract_text

        pages = spark.createDataFrame(
            [
                ("https://a/", "<html><body><p>plain café</p></body></html>"
                 .encode()),
                ("https://b/", ("<html><head><meta charset='iso-8859-1'>"
                                "</head><body><p>Bj\xf6rk \x93ok\x94</p>"
                                "</body></html>").encode("latin-1")),
                ("https://c/", ("<html><head><meta charset='shift_jis'>"
                                "</head><body><p>日本語ページ</p></body>"
                                "</html>").encode("shift_jis")),
            ],
            "url string, html binary",
        )
        rows = {r.url: r.text for r in extract_text(pages).collect()}
        assert "café" in rows["https://a/"]
        assert "Björk “ok”" in rows["https://b/"]
        assert "日本語ページ" in rows["https://c/"]

    def test_fused_and_modular_paths_agree_on_legacy_pages(self, spark):
        """Review r7: the fused chunk+extract pass must decode exactly
        like the modular chunk_pages path, or chunk ids diverge on
        legacy-encoded pages."""
        from graphrag_mrkr_2_spark.operators.extract import chunk_pages
        from graphrag_mrkr_2_spark.operators.triples import (
            extract_mentions_fused,
        )

        html = ("<html><head><meta charset='shift_jis'></head><body>"
                + "".join(f"<p>日本語の文章その{i}。データ処理の話。</p>"
                          for i in range(30))
                + "</body></html>").encode("shift_jis")
        pages = spark.createDataFrame([("https://jp.example/", html)],
                                      "url string, html binary")
        chunks = chunk_pages(pages).select("chunk_id", "content").collect()
        assert chunks and all("日本語" in c.content for c in chunks)
        fused = extract_mentions_fused(pages)
        # the fused pass re-chunks internally; mention provenance must
        # reference the SAME chunk ids the modular path produced
        fused_chunk_ids = {
            cid for r in fused.select("source_chunks").collect()
            for cid in (r.source_chunks or [])
        }
        assert fused_chunk_ids <= {c.chunk_id for c in chunks}

    def test_warc_transport_charset_reaches_downstream(self):
        """Review r7: a header-only charset declaration (no meta, no BOM)
        must survive the pages schema — the loader transcodes to BOM'd
        UTF-8 so the sniffer downstream sees the right text."""
        from graphrag_mrkr_2_spark.sources.loaders import parse_warc_bytes

        body = "<html><body>Русский текст</body></html>".encode("cp1251")
        payload = (b"HTTP/1.1 200 OK\r\n"
                   b"Content-Type: text/html; charset=windows-1251\r\n"
                   b"\r\n" + body)
        rec = ((f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: https://ru.example/\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n").encode()
               + payload + b"\r\n\r\n")
        page = parse_warc_bytes(rec)[0]
        assert to_text(page["html"]) == "<html><body>Русский текст</body></html>"
        # and a body with no transport charset passes through verbatim
        plain = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                 b"\x00raw\xffbytes")
        rec2 = ((f"WARC/1.0\r\nWARC-Type: response\r\n"
                 f"WARC-Target-URI: https://x/\r\n"
                 f"Content-Length: {len(plain)}\r\n\r\n").encode()
                + plain + b"\r\n\r\n")
        assert parse_warc_bytes(rec2)[0]["html"] == b"\x00raw\xffbytes"
