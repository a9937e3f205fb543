"""AVIF/HEIC decode via libheif (functions/heifcodec.py).

The host's libheif ships BOTH directions (aom/x265 encoders, dav1d/de265
decoders), so the conformance contract is round-trip BIT-EXACTNESS: encode
known pixels losslessly (identity-matrix YCbCr 4:4:4), decode through our
ctypes binding, require equality. Also conformance-checks the pure-Python
metadata probe (mediaprobe.probe_heif) against REAL encoder output — the
hand-built box fixtures in test_mediaprobe.py prove the parser logic, these
prove it against what an actual encoder emits.
"""

from __future__ import annotations

import numpy as np
import pytest

from graphrag_mrkr_2_spark.functions.heifcodec import (
    decode_heif_native,
    encode_heif_lossless,
    heif_available,
    heif_encoder_available,
)


def _require(fmt: str):
    if not (heif_available(fmt) and heif_encoder_available(fmt)):
        pytest.skip(f"libheif {fmt} encode+decode not available on this host")


def _corpus(seed: int = 11):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8),  # noise
        np.tile(np.arange(64, dtype=np.uint8) * 4, (33, 1))[:, :, None]
        .repeat(3, axis=2),  # gradient, odd height
        np.full((16, 16, 3), 200, dtype=np.uint8),  # flat
        rng.integers(0, 256, size=(31, 17, 3), dtype=np.uint8),  # odd dims
    ]


class TestRoundTrip:
    @pytest.mark.parametrize("fmt", ["avif", "heic"])
    def test_lossless_bit_exact(self, fmt):
        _require(fmt)
        for px in _corpus():
            data = encode_heif_lossless(px, fmt=fmt)
            out = decode_heif_native(data)
            assert out.shape == px.shape
            assert np.array_equal(out, px), f"{fmt} round trip not bit-exact"

    def test_alpha_roundtrip(self):
        _require("avif")
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(24, 24, 4), dtype=np.uint8)
        out = decode_heif_native(encode_heif_lossless(px, fmt="avif"))
        assert out.shape == (24, 24, 4)
        assert np.array_equal(out[:, :, :3], px[:, :, :3])
        assert np.array_equal(out[:, :, 3], px[:, :, 3])

    def test_grayscale_input_promotes(self):
        _require("avif")
        px = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = decode_heif_native(encode_heif_lossless(px, fmt="avif"))
        assert np.array_equal(out, np.repeat(px[:, :, None], 3, axis=2))

    def test_corrupt_payload_raises_valueerror(self):
        if not heif_available("avif"):
            pytest.skip("libheif not available")
        with pytest.raises(ValueError):
            decode_heif_native(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 40)


class TestProbeConformance:
    """probe_heif (pure header parse, no codec) vs real encoder output."""

    @pytest.mark.parametrize("fmt,codec", [("avif", "av1"), ("heic", "hevc")])
    def test_dims_and_codec(self, fmt, codec):
        _require(fmt)
        from graphrag_mrkr_2_spark.functions.mediaprobe import (
            probe_heif,
            sniff_heif,
        )

        px = np.zeros((37, 53, 3), dtype=np.uint8)
        data = encode_heif_lossless(px, fmt=fmt)
        assert sniff_heif(data)
        out = probe_heif(data)
        assert out["kind"] == "image" and out["codec"] == codec
        assert (out["width"], out["height"]) == (53, 37)

    def test_alpha_file_reports_primary_dims(self):
        # alpha adds an auxiliary item with its own ispe — the pitm→ipma
        # walk must still report the PRIMARY item's extent
        _require("avif")
        from graphrag_mrkr_2_spark.functions.mediaprobe import probe_heif

        px = np.zeros((21, 45, 4), dtype=np.uint8)
        out = probe_heif(encode_heif_lossless(px, fmt="avif"))
        assert (out["width"], out["height"]) == (45, 21)

    def test_sniff_image_and_probe_media(self):
        _require("avif")
        from graphrag_mrkr_2_spark.functions.imagecodecs import sniff_image
        from graphrag_mrkr_2_spark.operators.multimodal import probe_media

        data = encode_heif_lossless(np.zeros((10, 12, 3), np.uint8), fmt="avif")
        assert sniff_image(data) == "avif"
        out = probe_media(data)
        assert out["kind"] == "image" and out["codec"] == "av1"
        assert (out["width"], out["height"]) == (12, 10)


class TestOperatorIntegration:
    def test_native_decoder_object(self):
        _require("avif")
        from graphrag_mrkr_2_spark.functions.nativecodecs import (
            NativeImageDecoder,
        )

        dec = NativeImageDecoder()
        assert "avif" in dec.available_formats()
        px = np.random.default_rng(5).integers(
            0, 256, size=(20, 30, 3), dtype=np.uint8)
        out = dec(encode_heif_lossless(px, fmt="avif"), "avif")
        assert np.array_equal(out, px)

    def test_native_decoder_rejects_garbage(self):
        _require("avif")
        from graphrag_mrkr_2_spark.functions.nativecodecs import (
            NativeImageDecoder,
        )

        with pytest.raises(ValueError):
            NativeImageDecoder()(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 64,
                                 "avif")

    def test_image_features_strict_with_injection(self, spark):
        """With the decoder injected, strict-mode image_features decodes a
        REAL AVIF end-to-end (pre-injection it quarantines/raises)."""
        _require("avif")
        from graphrag_mrkr_2_spark.functions.nativecodecs import (
            NativeImageDecoder,
        )
        from graphrag_mrkr_2_spark.operators.multimodal import image_features

        rng = np.random.default_rng(9)
        rows = []
        for i in range(6):
            px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            lum = px.astype(np.float64).mean(axis=2)
            hist, _ = np.histogram(lum, bins=16, range=(0, 255))
            expect = (hist / max(1, hist.sum())).astype(np.float32)
            rows.append((f"img{i}", encode_heif_lossless(px), expect))
        df = spark.createDataFrame(
            [(mid, "image", payload, {}) for mid, payload, _ in rows],
            "media_id string, kind string, payload binary, "
            "meta map<string,string>",
        )
        feats = {
            r["media_id"]: np.array(r["feature"], dtype=np.float32)
            for r in image_features(
                df, strict=True, decoder=NativeImageDecoder()).collect()
        }
        assert len(feats) == 6
        for mid, _, expect in rows:
            # decode is bit-exact, so the histograms must match exactly
            assert np.array_equal(feats[mid], expect)
