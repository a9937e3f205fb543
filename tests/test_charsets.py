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
        (b"<?xml version='1.0' encoding='EUC-JP'?><root/>", "euc_jp"),
    ])
    def test_meta_forms(self, html, enc):
        page = b"<html><head>" + html + b"</head><body>x</body></html>"
        assert sniff_html_encoding(page)[0] == enc

    def test_meta_outside_prescan_window_ignored(self):
        page = b"<html>" + b" " * 2000 + b"<meta charset='koi8-r'>"
        assert sniff_html_encoding(page) == (None, 0)

    def test_meta_utf16_coerced_to_utf8(self):
        # an ASCII-readable meta claiming UTF-16 is self-contradictory
        assert sniff_html_encoding(b"<meta charset='utf-16'>x")[0] == "utf-8"


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
