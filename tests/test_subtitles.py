"""Subtitle/caption extraction (functions/subtitles.py +
operators/multimodal.extract_subtitle_text).

The parsers are pure text kernels; conformance is round-trip (format_srt
/ mux_mkv_subtitles → parse back) plus crawl-hardening cases: BOM, CRLF,
index-less SRT, malformed cue blocks, WebVTT NOTE/STYLE blocks, voice
and styling tags, hour-less VTT timestamps, the cue cap.
"""

from __future__ import annotations

import pytest

from graphrag_mrkr_2_spark.functions.subtitles import (
    MAX_CUES,
    format_srt,
    mkv_subtitle_cues,
    mux_mkv_subtitles,
    parse_srt,
    parse_webvtt,
    sniff_subtitle,
)

CUES = [
    (0, 1500, "Hello world."),
    (1600, 3000, "Second cue,\nwith a newline."),
    (3100, 4000, "Third."),
]


class TestSrt:
    def test_roundtrip(self):
        assert parse_srt(format_srt(CUES)) == CUES

    def test_crlf_and_bom(self):
        srt = "﻿" + format_srt(CUES).replace("\n", "\r\n")
        assert parse_srt(srt) == CUES

    def test_indexless_blocks(self):
        srt = "00:00:00,000 --> 00:00:01,500\nHello.\n\n" \
              "00:00:02,000 --> 00:00:03,000\nBye.\n"
        assert parse_srt(srt) == [(0, 1500, "Hello."), (2000, 3000, "Bye.")]

    def test_malformed_block_skipped_not_fatal(self):
        srt = "1\nnot a timestamp\ngarbage\n\n" \
              "2\n00:00:02,000 --> 00:00:03,000\nKept.\n"
        assert parse_srt(srt) == [(2000, 3000, "Kept.")]

    def test_dot_millis_variant(self):
        # crawls contain SRT with '.' millisecond separators
        srt = "1\n00:00:00.500 --> 00:00:01.000\nDots.\n"
        assert parse_srt(srt) == [(500, 1000, "Dots.")]

    def test_sniff(self):
        assert sniff_subtitle(format_srt(CUES).encode()) == "srt"
        assert sniff_subtitle(b"just some text\nlines\n") is None


class TestWebVtt:
    def test_basic_with_notes_ids_settings_tags(self):
        vtt = (
            "WEBVTT - some metadata\n\n"
            "NOTE a comment\nspanning lines\n\n"
            "STYLE\n::cue { color: red }\n\n"
            "cue-1\n00:00:00.000 --> 00:00:01.500 align:start line:0\n"
            "<v Bob>Hello world.\n\n"
            "00:01.600 --> 00:03.000\nSecond <i>cue</i>.\n"
        )
        assert parse_webvtt(vtt) == [
            (0, 1500, "Hello world."),
            (1600, 3000, "Second cue."),
        ]

    def test_hours_timestamps(self):
        vtt = "WEBVTT\n\n01:02:03.004 --> 01:02:04.000\nLate cue.\n"
        start = ((1 * 60 + 2) * 60 + 3) * 1000 + 4
        assert parse_webvtt(vtt) == [(start, start + 996, "Late cue.")]

    def test_missing_header_raises(self):
        with pytest.raises(ValueError):
            parse_webvtt("00:00.000 --> 00:01.000\nNo header.\n")

    def test_tags_kept_when_asked(self):
        vtt = "WEBVTT\n\n00:00.000 --> 00:01.000\n<v Amy>Hi.\n"
        assert parse_webvtt(vtt, strip_tags=False) == [(0, 1000, "<v Amy>Hi.")]

    def test_sniff_with_bom(self):
        assert sniff_subtitle("﻿WEBVTT\n".encode()) == "webvtt"


class TestMkvSubtitles:
    def test_roundtrip(self):
        assert mkv_subtitle_cues(mux_mkv_subtitles(CUES)) == CUES

    def test_webvtt_codec_strips_tags(self):
        cues = [(0, 1000, "<b>Bold</b> text")]
        mkv = mux_mkv_subtitles(cues, codec=b"S_TEXT/WEBVTT")
        assert mkv_subtitle_cues(mkv) == [(0, 1000, "Bold text")]

    def test_no_subtitle_track_raises(self):
        from graphrag_mrkr_2_spark.functions.av1codec import mux_mkv_video

        mkv = mux_mkv_video([b"frame"], 16, 12, codec_id=b"V_VP8")
        with pytest.raises(ValueError):
            mkv_subtitle_cues(mkv)

    def test_not_mkv_raises(self):
        with pytest.raises(ValueError):
            mkv_subtitle_cues(b"RIFFxxxxWEBP")

    def test_probe_does_not_misroute(self):
        """A subtitle-only MKV must not be classified as decodable video
        by probe_mkv (codec comes back as the subtitle codec)."""
        from graphrag_mrkr_2_spark.functions.mediaprobe import probe_mkv

        meta = probe_mkv(mux_mkv_subtitles(CUES))
        assert meta["width"] is None


class TestCueCap:
    def test_srt_cap(self, monkeypatch):
        import graphrag_mrkr_2_spark.functions.subtitles as subs

        monkeypatch.setattr(subs, "MAX_CUES", 5)
        many = [(i * 1000, i * 1000 + 500, f"cue {i}") for i in range(20)]
        assert len(subs.parse_srt(format_srt(many))) == 5


class TestSparkOperator:
    def test_extract_all_three_paths(self, spark):
        from graphrag_mrkr_2_spark.operators.multimodal import (
            extract_subtitle_text,
        )

        vtt = ("WEBVTT\n\n00:00.000 --> 00:01.500\nHello world.\n\n"
               "00:01.600 --> 00:03.000\nSecond cue,\nwith a newline.\n\n"
               "00:03.100 --> 00:04.000\nThird.\n")
        df = spark.createDataFrame(
            [
                ("srt0", format_srt(CUES).encode()),
                ("vtt0", vtt.encode()),
                ("mkv0", mux_mkv_subtitles(CUES)),
                ("bad0", b"\x00\x01 not a subtitle"),
            ],
            "media_id string, payload binary",
        )
        rows = extract_subtitle_text(df).collect()
        by_id: dict = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(
                (r["start_ms"], r["end_ms"], r["text"]))
        assert by_id["srt0"] == CUES
        assert by_id["vtt0"] == CUES
        assert by_id["mkv0"] == CUES
        assert "bad0" not in by_id  # quarantined, zero rows

    def test_strict_raises_on_garbage(self, spark):
        from graphrag_mrkr_2_spark.operators.multimodal import (
            extract_subtitle_text,
        )

        df = spark.createDataFrame(
            [("bad0", b"\x00\x01 not a subtitle")],
            "media_id string, payload binary",
        )
        with pytest.raises(Exception):
            extract_subtitle_text(df, strict=True).collect()
