"""WHATWG-style MIME sniffing (functions/mimesniff.py) and the payload
router operator. Every positive fixture is a REAL payload built by this
repo's own encoders (so the sniffers run against format-valid bytes), plus
the mislabeled/hostile cases the standard exists for."""

from __future__ import annotations

import gzip
import io
import json
import zipfile

import numpy as np
import pytest

from graphrag_mrkr_2_spark.functions.mimesniff import sniff_web_payload


def _zip_with(prefix: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"{prefix}/x.xml", "<x/>")
        zf.writestr("[Content_Types].xml", "<Types/>")
    return buf.getvalue()


class TestMagicBytes:
    def test_pdf_docx_and_friends(self):
        from graphrag_mrkr_2_spark.functions.docformats import (
            encode_docx,
            encode_pdf,
        )

        assert sniff_web_payload(encode_pdf([["hello"]])) == \
            ("document", "pdf")
        assert sniff_web_payload(encode_docx(["para"])) == \
            ("document", "docx")
        assert sniff_web_payload(_zip_with("xl")) == ("document", "xlsx")
        assert sniff_web_payload(_zip_with("ppt")) == ("document", "pptx")
        assert sniff_web_payload(_zip_with("junk")) == ("archive", "zip")

    def test_archives(self):
        assert sniff_web_payload(gzip.compress(b"x")) == ("archive", "gzip")
        assert sniff_web_payload(b"\x28\xb5\x2f\xfdrest") == \
            ("archive", "zstd")
        assert sniff_web_payload(b"Rar!\x1a\x07\x00rest") == \
            ("archive", "rar")
        assert sniff_web_payload(b"BZh91AY&SY") == ("archive", "bzip2")

    def test_media_via_real_encoders(self):
        from graphrag_mrkr_2_spark.functions.imagecodecs import (
            encode_gif,
            encode_png,
        )
        from graphrag_mrkr_2_spark.functions.jpegcodec import encode_jpeg
        from graphrag_mrkr_2_spark.functions.mp4mux import mux_mp4_audio

        px = np.zeros((4, 4, 3), np.uint8)
        assert sniff_web_payload(encode_png(px)) == ("image", "png")
        assert sniff_web_payload(encode_jpeg(px)) == ("image", "jpeg")
        assert sniff_web_payload(encode_gif(px)) == ("image", "gif")
        mp4 = mux_mp4_audio([b"\x01" * 8] * 3, "fLaC", 48000, 2)
        kind, subtype = sniff_web_payload(mp4)
        assert kind == "audio" and subtype == "flac"
        mp3 = b"".join(b"\xff\xfb\x90\x00" + b"\x00" * 413
                       for _ in range(3))
        assert sniff_web_payload(mp3)[0] == "audio"

    def test_subtitles(self):
        srt = b"1\n00:00:01,000 --> 00:00:02,000\nHello there\n\n"
        assert sniff_web_payload(srt)[0] == "subtitle"
        vtt = b"WEBVTT\n\n00:01.000 --> 00:02.000\nHi\n"
        assert sniff_web_payload(vtt)[0] == "subtitle"


class TestTextFamily:
    def test_html_tags(self):
        for page in (b"<!DOCTYPE html><html></html>",
                     b"  \n<HTML><body>x</body>",
                     b"<h1>Title</h1>",
                     b"<!-- c --><p>x</p>"):
            assert sniff_web_payload(page) == ("text", "html"), page

    def test_html_tag_needs_boundary(self):
        # '<authorized>' must not match the '<a>' pattern
        assert sniff_web_payload(b"<authorized>stuff") != ("text", "html")

    def test_utf16_html_detected_via_charset_layer(self):
        page = ("﻿<html><body>wide</body></html>").encode("utf-16-le")
        assert sniff_web_payload(page) == ("text", "html")

    def test_xml_and_feeds(self):
        assert sniff_web_payload(b"<?xml version='1.0'?><r/>") == \
            ("text", "xml")
        assert sniff_web_payload(b"<rss version='2.0'><channel/></rss>") == \
            ("text", "xml")

    def test_json(self):
        assert sniff_web_payload(
            json.dumps({"a": [1, 2]}).encode()) == ("text", "json")
        assert sniff_web_payload(b'[{"k": 1}]') == ("text", "json")
        # prose starting with a bracket is not JSON
        assert sniff_web_payload(b"[citation needed] more text") != \
            ("text", "json")

    def test_plain_text_via_declared_type(self):
        assert sniff_web_payload(b"just words here",
                                 "text/plain; charset=utf-8") == \
            ("text", "plain")
        assert sniff_web_payload(b"bare undeclared words") == \
            ("text", "plain")

    def test_mislabeled_binary_beats_declared(self):
        # a PNG served as text/html must still route as an image
        from graphrag_mrkr_2_spark.functions.imagecodecs import encode_png

        png = encode_png(np.zeros((2, 2, 3), np.uint8))
        assert sniff_web_payload(png, "text/html") == ("image", "png")

    def test_binary_garbage_unknown(self):
        assert sniff_web_payload(b"\x00\x01\x02\x03 binary") == (None, None)
        assert sniff_web_payload(b"") == (None, None)


@pytest.mark.spark
class TestRouter:
    def test_route_web_payloads(self, spark):
        from graphrag_mrkr_2_spark.functions.docformats import encode_pdf
        from graphrag_mrkr_2_spark.functions.imagecodecs import encode_png
        from graphrag_mrkr_2_spark.operators.multimodal import (
            route_web_payloads,
        )

        rows = [
            ("a", b"<html><body>x</body></html>", "text/html"),
            ("b", encode_pdf([["doc"]]), "application/octet-stream"),
            ("c", encode_png(np.zeros((2, 2, 3), np.uint8)), "text/html"),
            ("d", b"\x00\xff garbage", None),
            ("e", b'{"k": [1]}', None),
        ]
        df = spark.createDataFrame(
            rows, "id string, payload binary, content_type string")
        got = {r.id: (r.kind, r.subtype)
               for r in route_web_payloads(
                   df, content_type_col="content_type").collect()}
        assert got == {
            "a": ("text", "html"),
            "b": ("document", "pdf"),
            "c": ("image", "png"),   # magic beats the lying header
            "d": (None, None),
            "e": ("text", "json"),
        }
